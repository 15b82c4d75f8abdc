"""Spark-free oracle output-type lint.

Plans (does not execute) every registry oracle in DuckDB against the
sf0.001 fixtures and asserts no final output column is HUGEINT/int128 —
the exact defect class that kept `curriculum_stages` hash-red for three
rounds (DuckDB types a bare ``sum(BIGINT)`` as int128; the driver's
value hash is dtype-aware, so identical values still mismatch Spark's
bigint).  Runs in seconds because only the DuckDB binder is involved;
the full per-column Spark↔oracle class comparison lives in
tests/test_oracle_parity.py.
"""

from __future__ import annotations

import duckdb
import pytest

from local_llm_iceberg_cdw_spark.catalog import FIXTURE_TABLES
from local_llm_iceberg_cdw_spark.operators import all_queries

from conftest import SF_SMOKE
from dtype_lint import dtype_class

QUERY_SPECS = all_queries()


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    return con


def test_no_oracle_emits_hugeint(con):
    offenders = {}
    for name, spec in QUERY_SPECS.items():
        if spec.oracle is None:
            continue
        rel = con.sql(spec.oracle)
        bad = {
            c: str(t)
            for c, t in zip(rel.columns, rel.types)
            if "INT128" in dtype_class(str(t))
        }
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracle(s) emit HUGEINT/int128 in their final output — the driver's "
        "dtype-aware hash will mismatch Spark's bigint even on identical "
        f"values; wrap with CAST(... AS BIGINT): {offenders}"
    )


def test_hugeint_lint_catches_bare_sum(con):
    """The lint must trip on the exact shape that burned rounds 6-8."""
    rel = con.sql("SELECT sum(CAST(1 AS BIGINT)) AS s")
    assert any("INT128" in dtype_class(str(t)) for t in rel.types)
