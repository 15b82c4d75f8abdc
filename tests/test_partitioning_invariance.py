"""Partitioning invariance: every registry op must return IDENTICAL
results under different shuffle-partition counts.

This directly tests the repo's fold-exactness discipline (DECIMAL
quantization before every float sum, rounded scores before every
ordering cut, RNG-free sampling): changing
``spark.sql.shuffle.partitions`` changes how partial aggregates and
join partitions re-associate, so any operator whose result depends on
float fold order, partition-local tie-breaks, or partition counts
diverges here — the exact defect class behind the project's historical
red rows (`trend_seasonality_decompose` r8, the bigram-LM folds).
The DuckDB oracle can't catch a fold hazard that happens to agree at
ONE partitioning; this gate varies the partitioning itself.

Gated behind ``SPARK_GRAFT_FOLD_SWEEP=1`` (~2× the sf0.001 parity suite,
several minutes) — run it with the driver sim before each snapshot:

    SPARK_GRAFT_FOLD_SWEEP=1 python -m pytest tests/test_partitioning_invariance.py -q

``spark.sql.shuffle.partitions`` is a runtime conf, so one session
serves both sides; AQE partition coalescing is left ON (the production
setting) — the point is result-identity under whatever physical
partitioning results.
"""

from __future__ import annotations

import math
import os

import pytest

from local_llm_iceberg_cdw_spark.operators import all_queries

from conftest import SF_SMOKE

QUERY_SPECS = all_queries()

PARTS_A = "3"
PARTS_B = "17"  # coprime, non-default — maximally different fold trees


def canonical(rows, colnames):
    """Exact-compare canonical form (repr floats — bit-exact), matching
    the driver's value hash; see test_oracle_parity.canonical for why
    %.6g was retired."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return repr(v)
        return repr(v)

    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_FOLD_SWEEP") != "1",
    reason="partitioning-invariance sweep is opt-in: SPARK_GRAFT_FOLD_SWEEP=1",
)
@pytest.mark.parametrize("name", sorted(QUERY_SPECS))
def test_result_is_partitioning_invariant(spark, name):
    spec = QUERY_SPECS[name]
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", PARTS_A)
        df_a = spec.builder(spark, SF_SMOKE)
        rows_a = canonical([tuple(r) for r in df_a.collect()], df_a.columns)

        spark.conf.set("spark.sql.shuffle.partitions", PARTS_B)
        df_b = spec.builder(spark, SF_SMOKE)
        rows_b = canonical([tuple(r) for r in df_b.collect()], df_b.columns)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)

    assert len(rows_a) == len(rows_b), (
        f"{name}: row count changed with shuffle partitioning "
        f"({len(rows_a)} at {PARTS_A} vs {len(rows_b)} at {PARTS_B})"
    )
    if rows_a != rows_b:
        diff = [
            (a, b) for a, b in zip(rows_a, rows_b) if a != b
        ][:5]
        raise AssertionError(
            f"{name}: result depends on shuffle partitioning; first "
            f"differing canonical rows (at {PARTS_A} vs {PARTS_B}): {diff}"
        )
