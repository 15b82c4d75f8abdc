"""Oracle parity: every query with an oracle must match DuckDB exactly
(row count, column names, order-insensitive value hash, AND per-column
output dtype class) — a local replica of the driver's t2 correctness
gate, run at sf0.001 for speed.

The dtype assertion exists because the driver's hash is dtype-aware while
Python ``fetchall`` comparison is not: DuckDB types a bare ``sum(BIGINT)``
as HUGEINT (int128), which hashes differently from Spark's bigint even
when every value is identical (the 3-round `curriculum_stages` red row).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from local_llm_iceberg_cdw_spark.catalog import FIXTURE_TABLES
from local_llm_iceberg_cdw_spark.operators import all_queries

from conftest import SF_SMOKE
from dtype_lint import dtype_mismatches

QUERY_SPECS = all_queries()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canonical(rows, colnames):
    """Order-insensitive canonical form with EXACT float comparison.

    Floats render via ``repr`` (shortest round-trip — bit-exact), matching
    the driver's exact value hash.  The earlier ``%.6g`` canonicalization
    was strictly weaker than the driver: for magnitudes above ~1e6 the
    last ~5 digits were invisible, which let `revenue_anomaly_days`'
    round-half-tie divergence ship "green" in r10.  The determinism rules
    (DECIMAL quantization before folds, rounded outputs) are designed to
    make floats bit-identical across engines, so the gate demands it.
    """
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return repr(v)
        return repr(v)

    out = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return out


@pytest.mark.parametrize("name", sorted(QUERY_SPECS))
def test_query_matches_oracle(spark, name):
    spec = QUERY_SPECS[name]
    sdf = spec.builder(spark, SF_SMOKE)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    if spec.oracle is None:
        # rows-only check (driver does the same for non-SQL-expressible ops)
        assert len(srows) >= 0
        return

    con = duck_con(SF_SMOKE)
    rel = con.sql(spec.oracle)
    ocols = list(rel.columns)
    otypes = dict(zip(ocols, (str(t) for t in rel.types)))
    orows = [tuple(r) for r in rel.fetchall()]

    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    bad = dtype_mismatches(otypes, dict(sdf.dtypes))
    assert not bad, f"{name}: oracle/Spark output dtype class mismatch: {bad}"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} vs oracle {len(orows)}"
    assert canonical(srows, scols) == canonical(orows, ocols), f"{name}: values differ"
