"""Opt-in oracle parity at sf0.1 — 10× the driver gate's scale.

The standard gate (``test_oracle_parity.py``) runs at sf0.001; this sweep
re-verifies a float-sensitive / heavy subset at sf0.1, where accumulated
summation error, bigger pair spaces, and larger shuffles would surface
any fold-order or threshold-boundary divergence the small fixtures hide.
Gated behind ``SPARK_GRAFT_SWEEP_SF01=1`` (~4 min) so the default suite
stays fast; the full 30-op sweep was green when last run (round 6).
"""

from __future__ import annotations

import os

import pytest

from local_llm_iceberg_cdw_spark.operators import all_queries

from dtype_lint import dtype_mismatches
from test_oracle_parity import canonical, duck_con

SF01 = "/root/testdata/sf0.1"

# float-fold-heavy, threshold-bearing, or scale-sensitive ops
SWEEP = [
    "pq_encode",
    "pq_adc_topk",
    "pq_rerank_topk",
    "zorder_locality",
    "semantic_dedup",
    "semantic_mixture_weights",
    "kmeans_converged",
    "kmeans_assignments",
    "cosine_topk",
    "hard_negative_mining",
    "segment_dedup_rewrite",
    "curriculum_stages",
    "unigram_logprob_quality",
    "bigram_pmi",
    "decontamination_check",
    "incremental_rollup_maintenance",
    # round-8 float-fold additions (ln terms / weights quantized to
    # DECIMAL(30,12); the Bloom path's fp-prune must stay exact)
    "bigram_logprob_quality",
    "dsir_importance_weights",
    "bloom_decontamination",
    "gopher_quality_rules",
    "cms_heavy_hitters",
    "weighted_sample_es",  # ln/round boundary class; cheap at sf0.1
    "pagerank_supplier_part",  # decimal-fold supersteps
    "trend_seasonality_decompose",  # OLS rounding boundary class
    "incremental_quality_gate",  # CDC deltas x rounded gopher signals
    # round-10 float-fold additions (idf ln terms, OLS moments, NB
    # log-likelihood argmax, JL/MMR cosine folds, entropy c*ln c)
    "bm25_topk",
    "hybrid_rrf_search",
    "word_entropy_quality",
    "jl_projection_audit",
    "zipf_slope_fit",
    "nb_lang_classifier",
    "mmr_diversified_topk",
    "robust_outliers_mad",
    "dup_span_coverage",  # ratio-rounding + digest-join at 10x pairs
    "revenue_anomaly_days",  # OLS + seasonal + median/MAD boundary class
    "rag_context_pack",  # rides the BM25 idf ln folds; budget cutoff must bind identically
    # round-11 float-fold additions (decimal running sums, kernel-weight
    # folds, percentile clamps, cross-split cosine folds)
    "revenue_changepoint_cusum",
    "ewma_revenue_smooth",
    "winsorized_stats",
    "semantic_decontamination",
    "containment_dedup",  # digest-vs-string asymmetry at 10x gram counts
    "ngram_novelty_curve",
    "bigram_llr_collocations",  # exact-integer ln ratios at 10x counts
    # round-12 float-fold additions (PSI decimal ladder + ln ratios,
    # SQ8 score folds at 10x corpus, lcc ratio rounding at 10x nodes)
    "snapshot_drift_psi",
    "sq8_adc_topk",
    "local_clustering_coefficient",
    # round-13 float-fold additions: the persisted-index audit's cell
    # argmax + decimal scale sums at 10x corpus (codes checksums are
    # integer-exact but ride the same fold), and the append-mode drain's
    # watermark cutoffs + DECIMAL money folds at 10x events
    "ann_index_maintenance",
    "stream_append_watermark_drained",
]

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SWEEP_SF01") != "1",
    reason="sf0.1 sweep is opt-in: SPARK_GRAFT_SWEEP_SF01=1",
)


@pytest.mark.parametrize("name", SWEEP)
def test_query_matches_oracle_at_sf01(spark, name):
    spec = all_queries()[name]
    sdf = spec.builder(spark, SF01)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    con = duck_con(SF01)  # hold the connection — the relation borrows it
    rel = con.sql(spec.oracle)
    ocols = list(rel.columns)
    otypes = dict(zip(ocols, (str(t) for t in rel.types)))
    ores = rel.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert not dtype_mismatches(otypes, dict(sdf.dtypes))
    assert canonical(srows, scols) == canonical(ores, ocols)
