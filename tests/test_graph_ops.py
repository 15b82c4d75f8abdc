"""Late-r12 op invariants: k-core peeling, local clustering coefficient,
and the exact-state streaming drains.

The oracle-parity and fold-sweep gates cover end-to-end correctness
(tests/test_oracle_parity.py, tests/test_partitioning_invariance.py);
these tests pin the algorithmic invariants those gates can't see —
peel-order independence on crafted graphs, the unrolled-oracle round
margin, and the Decimal micro-unit snapping the custom stateful
operator's state relies on.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE
from local_llm_iceberg_cdw_spark.operators.analytics import (
    KCORE_K,
    KCORE_ORACLE_ROUNDS,
    _kcore_sql,
    kcore_peel,
)

SF_DRIVER = "/root/testdata/sf0.01"  # the driver's adjudication scale


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "p1 long, p2 long")


def test_kcore_peel_path_graph_empties(spark):
    """A path graph has no 2-core: peeling endpoints cascades the whole
    chain away (worst-case round count = ceil(n/2), the deep-peel shape
    that motivates the oracle's unrolled-stage margin)."""
    path = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert kcore_peel(path, 2).isEmpty()


def test_kcore_peel_cycle_is_its_own_2core(spark):
    cycle = _edges(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])
    got = sorted(tuple(r) for r in kcore_peel(cycle, 2).collect())
    assert got == [(1, 2), (1, 4), (2, 3), (3, 4)]


def test_kcore_peel_clique_with_pendant(spark):
    """4-clique + pendant vertex at K=3: the pendant (degree 1) and
    nothing else peels — the clique is the maximal 3-core."""
    clique = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    g = _edges(spark, clique + [(4, 5)])
    got = sorted(tuple(r) for r in kcore_peel(g, 3).collect())
    assert got == sorted(clique)


def test_kcore_peel_guard_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore_peel(_edges(spark, [(i, i + 1) for i in range(1, 9)]), 2, max_rounds=2)


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_DRIVER])
def test_kcore_oracle_rounds_margin(sf_dir):
    """The unrolled oracle must already be at fixpoint two stages early:
    extra stages are idempotent no-ops, so KCORE_ORACLE_ROUNDS carries a
    real margin over the observed peel depth (10 rounds at sf0.01) at
    both pytest- and driver-adjudicated scales."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    full = con.execute(_kcore_sql()).fetchall()
    early = con.execute(_kcore_sql(KCORE_K, KCORE_ORACLE_ROUNDS - 2)).fetchall()
    assert full == early
    assert len(full) > 0


# doubles chosen to straddle decimal(18,6) rounding boundaries — both
# engines cast double→decimal through the SHORTEST round-trip string
# (Spark: BigDecimal.valueOf/Double.toString; DuckDB likewise), NOT the
# exact binary expansion: for -5e-07 the exact expansion rounds to 0 but
# the shortest string "-5e-07" rounds HALF_UP to -1 micro, and both
# engines say -1.  The state snap must follow repr(), not Decimal(float).
_TRICKY_VALUES = [
    0.0,
    1.0000005,       # binary expansion just above the half-tie
    2.6749995,
    -3.1234565,
    123456.789012,
    -0.0000005,      # exact-expansion vs shortest-string divergence case
    9999.9999995,    # ditto
    0.1 + 0.2,       # 0.30000000000000004
    1e-7,
    -1e-7,
    1.5e-6,
    -2.5e-6,
]


def test_streaming_state_micro_snapping_matches_decimal_cast(spark):
    """The custom stateful operator's per-row snap (Decimal HALF_UP on
    the shortest round-trip string, held as int64 micro-units) must equal
    Spark's cast(value as decimal(18,6)) — the `_money_sum` ladder — or
    the drained result would drift from the batch oracle."""
    micro_q = Decimal("0.000001")

    def snap(v: float) -> int:
        return int(Decimal(repr(v)).quantize(micro_q, rounding=ROUND_HALF_UP).scaleb(6))

    df = spark.createDataFrame([(v,) for v in _TRICKY_VALUES], "value double")
    spark_micro = [
        r[0]
        for r in df.select(
            (F.col("value").cast("decimal(18,6)") * 1000000).cast("long")
        ).collect()
    ]
    assert spark_micro == [snap(v) for v in _TRICKY_VALUES]
    # and DuckDB's CAST agrees (the oracle side of the same ladder)
    con = duckdb.connect()
    duck_micro = [
        con.execute(
            "SELECT CAST(CAST(? AS DECIMAL(18,6)) * 1000000 AS BIGINT)", [v]
        ).fetchone()[0]
        for v in _TRICKY_VALUES
    ]
    assert duck_micro == spark_micro


def test_psi_ladder_halftie_parity(spark):
    """snapshot_drift_psi's total ladder (per-term cast DECIMAL(30,12) →
    exact sum → round 8) through the pre-commit half-tie sweep, at the
    PSI term magnitude (~1e-2)."""
    from conftest import assert_halftie_ladder_parity
    from pyspark.sql import functions as F

    assert_halftie_ladder_parity(
        spark,
        lambda c: F.round(c.cast("decimal(30,12)"), 8).cast("double"),
        "CAST(round(CAST(v AS DECIMAL(30,12)), 8) AS DOUBLE)",
        magnitude=0.01,
        digits=8,
    )


def test_stream_dedup_drained_actually_deduplicates(spark):
    """The judged dedup drain must be adjudicating real work: the landing
    dir holds 2× the events, the drained sink exactly 1×."""
    from local_llm_iceberg_cdw_spark.catalog import load_table
    from local_llm_iceberg_cdw_spark.operators.events import q_stream_dedup_drained

    n_events = load_table(spark, SF_SMOKE, "events").count()
    agg = q_stream_dedup_drained(spark, SF_SMOKE)
    total = agg.agg(F.sum("n_events")).collect()[0][0]
    assert total == n_events
