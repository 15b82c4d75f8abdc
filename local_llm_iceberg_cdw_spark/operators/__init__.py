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
# ROUND-15 WINDOW (exactly the r14 rotation note + VERDICT r14 #2):
#   (0) the FIVE NEW r15 ops — never adjudicated, so they MUST be in
#       the window (ANN index-file compaction, the NL loop over a
#       scripted model, streaming MERGE-upsert ingestion, orphan-file
#       cleanup as crash recovery, metadata-only column-rename
#       evolution);
#   (a) the NINE r15-CHANGED judged ops whose implementation moved this
#       round (the four sink-backed drains — the replay ledger is now
#       RUN-scoped, and the replay drain gained a _new_run_not_skipped
#       column; ann_index_maintenance — build/search extracted into
#       shared helpers; ann_index_partitioned_probe — rendering-robust
#       partition-filter assert; time_travel_via_sql_entry —
#       bind_time_travel rewritten for qualified names and string
#       literals; snapshot_expire_maintenance — expiration now folds
#       the streaming ledger into retained props;
#       partition_spec_evolution_read — compact() on partitioned specs
#       bin-packs per partition);
#   (b) 36 of the 37-row r10 stratum — the oldest standing
#       (alphabetical from customer_order_percentile; the window is
#       over-full by one, so the LAST row — zipf_slope_fit — defers to
#       r16).
# 5 + 9 + 36 = 50.
# Everything NOT in the window is pytest-oracle-gated at sf0.001 on
# every suite run (tests/test_oracle_parity.py, dtype-aware, EXACT
# float compare — repr(), not %.6g), and the window is sim-checked at
# sf0.01 via SPARK_GRAFT_DRIVER_SIM=1 before each snapshot.  Do NOT
# hand-claim adjudication strata in this note: FRESHNESS.md is the
# generated source of truth, pinned by tests/test_freshness_claims.py
# (which also asserts the never-adjudicated stratum fits the window).
# ROUND-16 ROTATION NOTE: front-load any r16-new/changed ops, then the
# deferred r10 row (zipf_slope_fit), then the r11 stratum (48 rows —
# alphabetical from approx_distinct), then r12 — strata are computed, not remembered:
# `python -m local_llm_iceberg_cdw_spark.freshness`.
# The |window| == 50 invariant is test-pinned
# (tests/test_operators.py::test_driver_window_priority_is_exactly_the_window).
_DRIVER_WINDOW_PRIORITY = [
    "ann_index_compact",  # NEW r15: per-partition bin-pack of the ANN index
    "nl_answer_via_mock_entry",  # NEW r15: NL loop judged with a scripted model
    "stream_merge_upsert_drained",  # NEW r15: foreachBatch MERGE-upsert CDC loop
    "orphan_cleanup_recovery",  # NEW r15: remove_orphan_files crash recovery
    "rename_evolution_read",  # NEW r15: metadata-only column-rename evolution
    "stream_replay_idempotent_drained",  # CHANGED r15: run-scoped ledger + new column
    "stream_resume_drain_incremental",  # CHANGED r15: checkpoint-scoped sink
    "stream_snapshot_ingest_drained",  # CHANGED r15: run-scoped sink
    "stream_ann_index_ingest_drained",  # CHANGED r15: checkpoint-scoped two-table sink
    "ann_index_maintenance",  # CHANGED r15: shared build/search helpers
    "ann_index_partitioned_probe",  # CHANGED r15: robust partition-filter assert
    "time_travel_via_sql_entry",  # CHANGED r15: quote/qualified-aware binding
    "snapshot_expire_maintenance",  # CHANGED r15: ledger-retaining expiration
    "partition_spec_evolution_read",  # CHANGED r15: per-partition bin-pack compact
    # (b) the entire 37-row r10 stratum — oldest standing, alphabetical
    "customer_order_percentile",
    "daily_revenue_gapfill",
    "delete_compact_state",
    "dup_span_coverage",
    "flagship_via_sql_entry",
    "hybrid_rrf_search",
    "incremental_dedup_index",
    "incremental_quality_gate",
    "incremental_rollup_maintenance",
    "jl_projection_audit",
    "kmeans_step",
    "length_bucket_stats",
    "minhash_lsh_dedup",
    "mmr_diversified_topk",
    "nb_lang_classifier",
    "pii_redaction",
    "robust_outliers_mad",
    "salted_hot_key_agg",
    "salted_skew_join",
    "scd2_point_in_time",
    "schema_evolution_read",
    "sessionize",
    "simhash_dedup",
    "snapshot_branch_read",
    "snapshot_incremental_read",
    "snapshot_time_travel",
    "source_vocab_overlap",
    "token_length_histogram",
    "trend_seasonality_decompose",
    "wap_publish_state",
    "window_first_last",
    "window_lag_gap",
    "window_ntile_quartiles",
    "window_range_7day",
    "window_rank_funcs",
    "window_running_sum",
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
