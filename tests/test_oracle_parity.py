"""Oracle parity: every query with an oracle must match DuckDB exactly
(row count, column names, order-insensitive value hash) — a local replica
of the driver's t2 correctness gate, run at sf0.001 for speed.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from local_llm_iceberg_cdw_spark.catalog import FIXTURE_TABLES
from local_llm_iceberg_cdw_spark.operators import all_queries

from conftest import SF_SMOKE

QUERY_SPECS = all_queries()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canonical(rows, colnames):
    """Order-insensitive canonical form with float rounding."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return f"{v:.6g}"
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
    res = con.execute(spec.oracle)
    ocols = [d[0] for d in res.description]
    orows = [tuple(r) for r in res.fetchall()]

    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} vs oracle {len(orows)}"
    assert canonical(srows, scols) == canonical(orows, ocols), f"{name}: values differ"
