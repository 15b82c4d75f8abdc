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
# ROUND-16 WINDOW (exactly the r15 rotation note + VERDICT r15 #3):
#   (0) the THREE NEW r16 ops — never adjudicated, so they MUST be in
#       the window (hidden-partition transforms with inclusive-
#       projection pruning; table-as-a-stream-source subscription; the
#       subscription's ANN-index-maintainer composition);
#   (a) the FIFTEEN r16-CHANGED judged ops whose implementation moved
#       this round: partition_spec_evolution_read (third spec stage —
#       hidden months() transform, five stages); stream_user_totals_
#       drained (micro-unit snap moved JVM-side, vectorized state
#       update); orphan_cleanup_recovery (pdelete-snap-* dirs now
#       reclaimed); time_travel_via_sql_entry (backslash-escape-aware
#       literal scanner); stats_pruned_scan + rename_evolution_read
#       (plan_files gained partition-path pruning and the rename-aware
#       bounds miss); the five sink-backed drains (run-id resolution
#       now fails fast instead of committing unscoped); the four
#       ANN-index ops whose partitioned writes/compacts now route
#       through the transform-aware layout helpers;
#   (b) the deferred r10 row (zipf_slope_fit);
#   (c) 31 of the 47-row r11 stratum — the oldest standing
#       (alphabetical from approx_distinct; the last 16 rows —
#       revenue_changepoint_cusum … word_entropy_quality — defer to
#       r17).
# 3 + 15 + 1 + 31 = 50.
# Everything NOT in the window is pytest-oracle-gated at sf0.001 on
# every suite run (tests/test_oracle_parity.py, dtype-aware, EXACT
# float compare — repr(), not %.6g), and the window is sim-checked at
# sf0.01 via SPARK_GRAFT_DRIVER_SIM=1 before each snapshot.  Do NOT
# hand-claim adjudication strata in this note: FRESHNESS.md is the
# generated source of truth, pinned by tests/test_freshness_claims.py
# (which also asserts the never-adjudicated stratum fits the window).
# ROUND-17 ROTATION NOTE: front-load any r17-new/changed ops, then the
# 16 deferred r11 rows (alphabetical from revenue_changepoint_cusum),
# then the r12 stratum — strata are computed, not remembered:
# `python -m local_llm_iceberg_cdw_spark.freshness`.
# The |window| == 50 invariant is test-pinned
# (tests/test_operators.py::test_driver_window_priority_is_exactly_the_window).
_DRIVER_WINDOW_PRIORITY = [
    "hidden_partition_prune",  # NEW r16: days()/bucket() hidden partitioning
    "stream_table_source_drained",  # NEW r16: table-as-a-stream-source
    "stream_table_to_ann_index_drained",  # NEW r16: subscription → ANN index
    "partition_spec_evolution_read",  # CHANGED r16: hidden-transform third spec
    "stream_user_totals_drained",  # CHANGED r16: JVM-side micro snap
    "orphan_cleanup_recovery",  # CHANGED r16: pdelete-snap-* reclaim
    "time_travel_via_sql_entry",  # CHANGED r16: backslash-escape literal scan
    "stats_pruned_scan",  # CHANGED r16: plan_files partition/rename levers
    "rename_evolution_read",  # CHANGED r16: rename-aware plan_files miss
    "stream_replay_idempotent_drained",  # CHANGED r16: fail-fast run id
    "stream_resume_drain_incremental",  # CHANGED r16: fail-fast run id
    "stream_snapshot_ingest_drained",  # CHANGED r16: fail-fast run id
    "stream_ann_index_ingest_drained",  # CHANGED r16: fail-fast run id
    "stream_merge_upsert_drained",  # CHANGED r16: fail-fast run id
    "ann_index_maintenance",  # CHANGED r16: transform-aware layout helpers
    "ann_index_partitioned_probe",  # CHANGED r16: transform-aware layout helpers
    "ann_index_compact",  # CHANGED r16: expr-clustered partitioned compact
    "ann_index_refresh",  # CHANGED r16: transform-aware layout helpers
    "zipf_slope_fit",  # deferred r10 row (last of its stratum)
    # (c) 31 of the 47-row r11 stratum — oldest standing, alphabetical
    "approx_distinct",
    "bigram_llr_collocations",
    "bigram_logprob_quality",
    "bpe_merge_step",
    "case_bucketing",
    "cms_heavy_hitters",
    "containment_dedup",
    "corpus_pipeline_e2e",
    "curriculum_stages",
    "date_trunc_monthly",
    "dsir_importance_weights",
    "ewma_revenue_smooth",
    "full_outer_nation_counts",
    "gopher_quality_rules",
    "ivf_topk",
    "ivfpq_topk",
    "jsonl_ingest_audit",
    "k_anonymity_audit",
    "like_between",
    "media_frame_sample",
    "ngram_novelty_curve",
    "packing_efficiency",
    "pagerank_supplier_part",
    "partitioned_write_prune",
    "ppjoin_set_similarity",
    "pq_adc_topk",
    "pq_encode",
    "pq_rerank_topk",
    "rag_context_pack",
    "record_linkage_blocked",
    "revenue_anomaly_days",
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
