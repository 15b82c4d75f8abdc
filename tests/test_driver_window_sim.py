"""Opt-in simulation of the external driver's correctness gate.

The driver adjudicates the FIRST 50 registry entries at sf0.01 — a
different scale than the default pytest gate (the full registry —
``len(all_queries())`` ops — at sf0.001).
This test mirrors the driver's inputs and compare:
``__spark_entry__.queries()`` order, sf0.01 fixtures, oracle SQL in
DuckDB, order-insensitive value compare.  (It reuses the suite's
SparkSession; the driver's is vanilla — every op's result is designed
to be session/partitioning-independent, which the fold-exactness rules
and a manual vanilla-session sweep this round both back.)

Gated behind ``SPARK_GRAFT_DRIVER_SIM=1`` (~7 min) — run it before any
round ends, and after any change to window ordering or a windowed op.

VERDICT r12 #7 (stretch): ``SPARK_GRAFT_FULL_SIM_SF01=1`` extends the
sim to the ENTIRE registry at sf0.01 (~25 min) — the r12 late-addition
gap existed precisely because ops outside the frozen window were never
replayed under driver conditions; this gate makes that replay a single
opt-in job.

NB on NULL normalization: compare against ``fetchall`` (SQL NULL →
Python None, matching Spark), never ``fetchdf`` — pandas turns NULL into
NaN/NaT and manufactures false mismatches on ops with NULL-bearing
windows (lag/lead frames).
"""

from __future__ import annotations

import os

import pytest

from dtype_lint import dtype_mismatches
from test_oracle_parity import canonical, duck_con

SF01 = "/root/testdata/sf0.01"

_WINDOW_SIM = os.environ.get("SPARK_GRAFT_DRIVER_SIM") == "1"
_FULL_SIM = os.environ.get("SPARK_GRAFT_FULL_SIM_SF01") == "1"

pytestmark = pytest.mark.skipif(
    not (_WINDOW_SIM or _FULL_SIM),
    reason="driver simulation is opt-in: SPARK_GRAFT_DRIVER_SIM=1 "
    "(window) or SPARK_GRAFT_FULL_SIM_SF01=1 (full registry)",
)


def _window_names() -> list[str]:
    import __spark_entry__ as entry

    return list(entry.queries())[:50]


def _registry_names() -> list[str]:
    import __spark_entry__ as entry

    return list(entry.queries())


def _check_against_oracle(spark, name: str) -> None:
    import __spark_entry__ as entry

    builder = entry.queries()[name]
    oracle = entry.oracle_sql().get(name)
    if oracle is None:  # rows-only op: the driver records a weaker check
        rows = builder(spark, SF01).collect()
        assert rows is not None
        return
    sdf = builder(spark, SF01)
    srows = [tuple(r) for r in sdf.collect()]
    con = duck_con(SF01)  # hold the connection — the relation borrows it
    rel = con.sql(oracle)
    ocols = list(rel.columns)
    otypes = dict(zip(ocols, (str(t) for t in rel.types)))
    orows = rel.fetchall()
    assert sorted(sdf.columns) == sorted(ocols)
    # dtype-aware, like the driver's hash: Python value equality alone is
    # blind to e.g. DuckDB HUGEINT vs Spark bigint (the r6-r8 red-row class)
    bad = dtype_mismatches(otypes, dict(sdf.dtypes))
    assert not bad, f"{name}: oracle/Spark output dtype mismatch: {bad}"
    assert canonical(srows, sdf.columns) == canonical(orows, ocols)


@pytest.mark.skipif(not _WINDOW_SIM, reason="SPARK_GRAFT_DRIVER_SIM=1 only")
@pytest.mark.parametrize("name", _window_names())
def test_driver_window_op_matches_oracle_at_sf001(spark, name):
    _check_against_oracle(spark, name)


@pytest.mark.skipif(not _FULL_SIM, reason="SPARK_GRAFT_FULL_SIM_SF01=1 only")
@pytest.mark.parametrize("name", _registry_names())
def test_full_registry_op_matches_oracle_at_sf001(spark, name):
    _check_against_oracle(spark, name)
