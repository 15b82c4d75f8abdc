from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from local_llm_iceberg_cdw_spark.session import build_session  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = build_session(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


def assert_halftie_ladder_parity(
    spark,
    spark_ladder,
    duck_ladder_sql: str,
    *,
    magnitude: float = 1.5e6,
    digits: int = 4,
    n_probes: int = 2000,
):
    """Pre-commit half-tie sweep for any float-emitting op (VERDICT r11
    stretch): push a dense grid of doubles straddling x.…5 half-ties at
    ``magnitude`` through the op's OWN quantization ladder on both
    engines and require bit-identical (repr) results on every probe.

    ``spark_ladder``: callable Column -> Column applying the op's exact
    rounding/decimal ladder.  ``duck_ladder_sql``: the same ladder as a
    DuckDB SQL expression over column ``v``.  A ladder that does its
    adds and final round in DECIMAL (determinism rule) passes; a ladder
    that rounds double-typed sums fails on some probe of this grid —
    which is exactly how the r10 `revenue_anomaly_days` red row would
    have been caught pre-commit.  Use for every new op that emits
    rounded floats; pair with the op's own quantization step size via
    ``digits``.
    """
    import duckdb as _duckdb

    from pyspark.sql import functions as F

    step = 10.0 ** (-digits)
    probes = [magnitude + k * step + step / 2 for k in range(n_probes)]
    sdf = spark.createDataFrame([(v,) for v in probes], "v double").select(
        "v", spark_ladder(F.col("v")).alias("r")
    )
    srows = {repr(r.v): repr(r.r) for r in sdf.collect()}
    con = _duckdb.connect()
    con.execute("CREATE TABLE probes(v DOUBLE)")
    con.executemany("INSERT INTO probes VALUES (?)", [(v,) for v in probes])
    drows = {
        repr(v): repr(r)
        for v, r in con.execute(
            f"SELECT v, {duck_ladder_sql} FROM probes"
        ).fetchall()
    }
    diverged = [k for k in srows if srows[k] != drows[k]]
    assert not diverged, (
        f"{len(diverged)}/{n_probes} half-tie probes diverge across engines "
        f"(first: v={diverged[0]} spark={srows[diverged[0]]} "
        f"duckdb={drows[diverged[0]]}) — the ladder must do its adds and "
        "final round in DECIMAL (see determinism rules)"
    )
