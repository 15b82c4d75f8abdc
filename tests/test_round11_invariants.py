"""Round-11 invariants: the degenerate-entropy flag fix and the
round-half-tie defect class that produced the r10 red driver row.

- word_entropy_quality must flag the MAXIMALLY degenerate document (one
  token repeated dl>1 times — true entropy 0) as low_entropy: r10's
  ``n_distinct > 1`` guard exempted exactly the doc the repetitiveness
  filter is motivated by.  A single-token doc (dl == 1) carries no
  repetition evidence and stays unflagged.
- Spark and DuckDB must agree on round(x, n) when x is an EXACT DECIMAL
  (half-away-from-zero on both engines) — the quantization ladder every
  float-folding op here relies on.  On raw DOUBLES near a half-tie the
  engines genuinely disagree (Spark rounds the exact BigDecimal binary
  expansion, DuckDB multiplies by 10^n in double), which is WHY the
  ladder must run through the final additions: the test pins one such
  divergent double so the defect class is a lint, not tribal knowledge.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


def _write_docs(spark, tmp_path, rows):
    (
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{tmp_path}/documents.parquet")
    )
    return str(tmp_path)


def test_word_entropy_flags_degenerate_single_type_doc(spark, tmp_path):
    from local_llm_iceberg_cdw_spark.operators.text import q_word_entropy_quality

    sf_dir = _write_docs(
        spark,
        tmp_path,
        [
            (1, "spam spam spam spam spam", "en", "web", 24),  # 1 type x 5 → flag
            (2, "word", "en", "web", 4),  # dl == 1 → no repetition evidence
            (3, "the quick brown fox jumps", "en", "web", 25),  # max entropy
            (4, "ha ha ha ha ho", "en", "web", 14),  # low but n_distinct > 1
        ],
    )
    out = {r.doc_id: r for r in q_word_entropy_quality(spark, sf_dir).collect()}
    assert out[1].low_entropy == 1 and out[1].h_norm == 0.0 and out[1].n_distinct == 1
    assert out[2].low_entropy == 0 and out[2].dl == 1
    assert out[3].low_entropy == 0 and out[3].h_norm == 1.0
    # 4/5 "ha" + 1/5 "ho": H ≈ 0.5004 nats, h_norm ≈ 0.722 → above the 0.5 floor
    assert out[4].low_entropy == 0 and out[4].n_distinct == 2


@pytest.mark.parametrize(
    "value_str",
    [
        # exact decimal half-ties across the magnitudes the fixtures produce
        "1.00005",
        "1536848.19675",
        "-1536848.19675",
        "999999999.00005",
        "123456789012.55555",
    ],
)
def test_decimal_round_half_agrees_across_engines(spark, value_str):
    """round(DECIMAL, 4): both engines resolve the half-tie away from
    zero — the property the r11 fitted/residual ladder rests on."""
    s_val = (
        spark.range(1)
        .select(
            F.round(F.lit(value_str).cast("decimal(30,8)"), 4)
            .cast("double")
            .alias("v")
        )
        .collect()[0][0]
    )
    d_val = duckdb.sql(
        f"SELECT CAST(round(CAST('{value_str}' AS DECIMAL(30,8)), 4) AS DOUBLE)"
    ).fetchall()[0][0]
    assert repr(s_val) == repr(d_val), (value_str, s_val, d_val)


def test_double_round_half_tie_divergence_is_real(spark):
    """The defect class behind the r10 red row, pinned: round(double, 4)
    on a magnitude-1e6 value whose exact binary expansion straddles a
    half-tie differs between Spark (exact BigDecimal HALF_UP) and DuckDB
    (multiply-by-1e4 in double).  If this test ever starts failing
    because the engines AGREE on every probe, the DECIMAL ladder is no
    longer load-bearing — relax it consciously, don't delete it."""
    # sweep a dense grid of doubles near x.xxxx5 half-ties at ~1.5e6; the
    # class needs only ONE divergent sample to be demonstrated
    probes = [1536848.0 + k * 1e-4 + 5e-5 for k in range(2000)]
    sdf = spark.createDataFrame([(v,) for v in probes], "v double").select(
        F.col("v"), F.round("v", 4).alias("r")
    )
    srows = {repr(r.v): repr(r.r) for r in sdf.collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE p(v DOUBLE)")
    con.executemany("INSERT INTO p VALUES (?)", [(v,) for v in probes])
    drows = {
        repr(v): repr(r) for v, r in con.execute("SELECT v, round(v, 4) FROM p").fetchall()
    }
    diverged = [k for k in srows if srows[k] != drows[k]]
    # exact count is platform-dependent; the CLASS existing is the point
    assert diverged, "engines agreed on all 2000 half-tie probes — ladder may be relaxable"


def test_dense_shortlist_ivf_path_engages_and_recalls(spark, monkeypatch):
    """The brute-force→IVF swap in dense_shortlist is a real code path,
    not a docstring promise: forcing the threshold to 0 must (a) still
    return a full shortlist, (b) recall ≥ IVF_RECALL_MIN of the exact
    top-k, and (c) keep both consumers (hybrid RRF, MMR) runnable."""
    from local_llm_iceberg_cdw_spark.operators import similarity as sim
    from local_llm_iceberg_cdw_spark.operators.text import q_hybrid_rrf_search

    from conftest import SF_SMOKE

    k = 15
    exact = {r.vec_id for r in sim.dense_shortlist(spark, SF_SMOKE, 0, k).collect()}
    assert len(exact) == k
    monkeypatch.setattr(sim, "DENSE_SHORTLIST_BRUTE_MAX_ROWS", 0)
    approx_rows = sim.dense_shortlist(spark, SF_SMOKE, 0, k).collect()
    approx = {r.vec_id for r in approx_rows}
    assert len(approx) == k  # probed cells hold enough candidates at sf0.001
    recall = len(exact & approx) / k
    assert recall >= sim.IVF_RECALL_MIN, f"IVF shortlist recall {recall}"
    # consumers still produce their full frames on the IVF path
    assert q_hybrid_rrf_search(spark, SF_SMOKE).count() > 0
    assert sim.q_mmr_diversified_topk(spark, SF_SMOKE).count() == sim.MMR_K
