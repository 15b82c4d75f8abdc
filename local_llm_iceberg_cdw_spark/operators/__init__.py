"""Operator library — the judged query surface.

Each module exposes ``QUERIES: dict[str, QuerySpec]``.  A ``QuerySpec``
bundles the Spark builder ``(spark, sf_dir) -> DataFrame`` with the
equivalent ANSI SQL for the DuckDB oracle (``None`` for ops that are not
SQL-expressible — the driver then records a weaker rows-only check).

``all_queries()`` merges every module's registry; ``__spark_entry__.py``
re-exports it in the driver's contract shape.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check
    doc: str = ""


# The external driver records correctness rows for the FIRST 50 registry
# entries only, so ordering is part of the verification contract.
# ROUND-11 WINDOW (per the r10 rotation note + VERDICT r10 #3):
#   (a) ops whose engine code or oracle changed in round 11
#       (revenue_anomaly_days — the r10 red row, fitted/residual adds
#       now exact DECIMAL on both engines; word_entropy_quality — the
#       n_distinct==1 degenerate doc is now flagged) plus
#       rag_context_pack, the one registry entry with NO driver row ever
#       (added after the r10 window froze), and any op NEW in r11;
#   (b) the packing family displaced from the r9 window
#       (curriculum_stages … corpus_pipeline_e2e);
#   (c) the quantization/layout family (pq_*, ivf*, zorder,
#       segment_dedup_rewrite, media_frame_sample,
#       partitioned_write_prune, jsonl_ingest_audit);
#   (d) the r8-new rows (bigram_logprob_quality … weighted_sample_es);
#   (e) the fifteen r1/r4 relational/set rows the r10 window displaced;
#   (f) the eight r4/r5 dedup/text rows the late-r10 ops displaced.
# Everything NOT in the window is pytest-oracle-gated at sf0.001 on every
# suite run (tests/test_oracle_parity.py, dtype-aware, EXACT float
# compare since r11 — repr(), not %.6g), and the window is sim-checked
# at sf0.01 via SPARK_GRAFT_DRIVER_SIM=1 before each snapshot (full
# registry: 192 entries as of r11 end — 182 at r11 start + ten NEW r11
# ops, all oracled) — the window chooses which 50 get a DRIVER row this
# round, not which are verified.
# ROUND-12 ROTATION NOTE: front-load any r12-changed ops (they have no
# driver row on their new code), then the nine rows the r11 NEW ops
# displaced from this window's tail (token_count, prefix_dedup,
# dedup_clusters, exact_dedup_docs, lang_id, above_customer_avg,
# ngram_jaccard_dedup, embedding_near_dup, doc_fingerprint,
# scalar_aggregates, tumbling_window_daily, distinct_count,
# cube_status_priority, event_type_pivot, grouping_sets, set_except —
# all last adjudicated r4/r5/r1), then the remaining r1 rows never
# re-adjudicated since round 1 (collect_set_agg, correlation_stats,
# customer_order_distribution, disjunctive_part_filter,
# filter_date_range_count, forecast_revenue, group_sum_by_priority,
# having_filter, idle_rich_customers, large_volume_orders,
# nation_min_acctbal_suppliers, order_priority_exists,
# percentile_stats, priority_class_counts, projection_limit,
# promo_revenue_ratio, returned_item_revenue, shipping_priority,
# top_supplier_revenue, word_count) and the r4 rows
# (apply_in_pandas_zscore, click_purchase_attribution, doc_chunking,
# embedding_norms, hash_sample_per_source, label_centroids,
# media_features, retention_cohorts, training_manifest,
# unpivot_returnflag_metrics).  The r11-window rows green in
# CORRECTNESS_r11 are safe to rest.
# The |window| == 50 invariant is test-pinned
# (tests/test_operators.py::test_driver_window_priority_is_exactly_the_window).
_DRIVER_WINDOW_PRIORITY = [
    # (a) first-ever driver row + r11-changed ops
    "rag_context_pack",  # NEW in late r10 — first driver adjudication
    "revenue_anomaly_days",  # r10 RED row; fitted/residual now exact DECIMAL
    "word_entropy_quality",  # r11: n_distinct==1 degenerate doc now flagged
    "revenue_changepoint_cusum",  # NEW in r11 (CUSUM mean-shift scan)
    "ewma_revenue_smooth",  # NEW in r11 (bounded-kernel exponential smoothing)
    "winsorized_stats",  # NEW in r11 (exact-percentile clamp + robust mean)
    "semantic_decontamination",  # NEW in r11 (embedding train/test leakage)
    "containment_dedup",  # NEW in r11 (directed |A∩B|/|A| subset dedup)
    "ngram_novelty_curve",  # NEW in r11 (per-arrival marginal novelty)
    "record_linkage_blocked",  # NEW in r11 (ER blocking join + Levenshtein)
    "k_anonymity_audit",  # NEW in r11 (privacy QI group-size audit)
    "table_profile_orders",  # NEW in r11 (one-pass unpivot profiling)
    "snapshot_rollback_read",  # NEW in r11 (rollback_to_snapshot judged)
    "pagerank_supplier_part",  # CHANGED in r11: fixed-point int64 loop
    "approx_distinct",  # CHANGED in r11: Expand-free two-agg plan
    "bigram_llr_collocations",  # NEW in r11 (Dunning G² collocations)
    "tokenizer_fertility_by_lang",  # NEW in r11 (BPE pieces per word)
    "mor_equality_delete_read",  # NEW in r11 (merge-on-read DELETE judged)
    "partition_spec_evolution_read",  # NEW in r11 (spec evolution judged)
    # (b) packing family, displaced from the r9 window
    "curriculum_stages",
    "sequence_packing",
    "vocab_coverage",
    "unigram_logprob_quality",
    "bpe_merge_step",
    "packing_efficiency",
    "corpus_pipeline_e2e",
    # (c) quantization / layout family (last driver rows r9)
    "pq_encode",
    "pq_adc_topk",
    "pq_rerank_topk",
    "ivfpq_topk",
    "ivf_topk",
    "zorder_locality",
    "segment_dedup_rewrite",
    "media_frame_sample",
    "partitioned_write_prune",
    "jsonl_ingest_audit",
    # (d) r8-new rows
    "bigram_logprob_quality",
    "dsir_importance_weights",
    "gopher_quality_rules",
    "cms_heavy_hitters",
    "ppjoin_set_similarity",
    "weighted_sample_es",
    # (e) the fifteen r1/r4 rows the r10 window displaced
    "like_between",
    "case_bucketing",
    "date_trunc_monthly",
    "string_functions",
    "full_outer_nation_counts",
    "set_intersect",
    "theta_join_acctbal",
    "set_union",
    # (f) emptied: the fourteen r11 NEW ops + two r11-CHANGED ops displaced
    # token_count, prefix_dedup, dedup_clusters, exact_dedup_docs,
    # lang_id, above_customer_avg, ngram_jaccard_dedup,
    # embedding_near_dup, doc_fingerprint, scalar_aggregates,
    # tumbling_window_daily, distinct_count, cube_status_priority,
    # event_type_pivot, grouping_sets, set_except to the r12 note
]


def all_queries() -> dict[str, QuerySpec]:
    from . import (
        analytics,
        corpus,
        corpus_ext,
        curation,
        dedup,
        events,
        layout,
        multimodal,
        packing,
        pipeline,
        python_udf,
        quantization,
        relational,
        relational_ext,
        similarity,
        snapshots_op,
        text,
        timeseries,
        tpch_deep,
    )

    merged: dict[str, QuerySpec] = {}
    for mod in (
        relational,
        relational_ext,
        events,
        text,
        dedup,
        similarity,
        quantization,
        curation,
        corpus,
        corpus_ext,
        packing,
        analytics,
        layout,
        multimodal,
        pipeline,
        python_udf,
        snapshots_op,
        timeseries,
        tpch_deep,
    ):
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)

    missing = [n for n in _DRIVER_WINDOW_PRIORITY if n not in merged]
    if missing:
        raise ValueError(f"priority list names unknown queries: {missing}")
    ordered = {n: merged[n] for n in _DRIVER_WINDOW_PRIORITY}
    ordered.update({n: s for n, s in merged.items() if n not in ordered})
    return ordered
