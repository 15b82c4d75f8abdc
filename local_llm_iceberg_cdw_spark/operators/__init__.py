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
# ROUND-14 WINDOW (exactly the r13 rotation note + VERDICT r13 #2):
#   (0) the SIX NEW r14 ops — never adjudicated, so they MUST be in the
#       window (restart-recovery replay drain, checkpoint-resume drain,
#       partition-pruned ANN probe, quantizer-refresh re-index, the
#       time-travel dialect through the SQL entry, MOR MERGE schema
#       evolution);
#   (a) the SIX r14-CHANGED judged ops whose implementation moved this
#       round (ann_index_maintenance — index now cell-partitioned;
#       stream_ann_index_ingest_drained + stream_snapshot_ingest_drained
#       — idempotent batch-id sinks; positional_delete_dedup_read —
#       dedup ranks over the effective scan; mor_merge_upsert_read +
#       merge_upsert_state — NULL-safe MERGE guards);
#   (b) the TEN deferred r7 rows (pandas_udf_token_count ...
#       winnowing_fingerprint) — the oldest stratum standing;
#   (c) the NINETEEN-row r9 stratum (approx_percentile_sketch ...
#       window_latest_order);
#   (d) NINE fill rows from the oldest remaining stratum (r10),
#       alphabetical (asof_join_last_order ... cosine_topk).
# 6 + 6 + 10 + 19 + 9 = 50.
# Everything NOT in the window is pytest-oracle-gated at sf0.001 on
# every suite run (tests/test_oracle_parity.py, dtype-aware, EXACT
# float compare — repr(), not %.6g), and the window is sim-checked at
# sf0.01 via SPARK_GRAFT_DRIVER_SIM=1 before each snapshot.  Do NOT
# hand-claim adjudication strata in this note: FRESHNESS.md is the
# generated source of truth, pinned by tests/test_freshness_claims.py
# (which also asserts the never-adjudicated stratum fits the window).
# ROUND-15 ROTATION NOTE: front-load any r15-new/changed ops, then the
# remaining r10 stratum (38 rows after this window's 9 fills — more
# than one window can hold, so continue alphabetically where (d) left
# off: customer_order_percentile onward), then r11 — strata are
# computed, not remembered:
# `python -m local_llm_iceberg_cdw_spark.freshness`.
# The |window| == 50 invariant is test-pinned
# (tests/test_operators.py::test_driver_window_priority_is_exactly_the_window).
_DRIVER_WINDOW_PRIORITY = [
    "stream_replay_idempotent_drained",  # NEW r14: foreachBatch restart recovery
    "stream_resume_drain_incremental",  # NEW r14: checkpoint resume, no re-ingest
    "ann_index_partitioned_probe",  # NEW r14: partition-pruned ANN probe
    "ann_index_refresh",  # NEW r14: quantizer refresh as REPLACE re-index
    "time_travel_via_sql_entry",  # NEW r14: Impala AS-OF dialect end-to-end
    "mor_merge_evolve_read",  # NEW r14: MERGE schema evolution under MOR
    "ann_index_maintenance",  # CHANGED r14: index now PARTITIONED BY cell
    "stream_ann_index_ingest_drained",  # CHANGED r14: idempotent two-table sink
    "stream_snapshot_ingest_drained",  # CHANGED r14: idempotent batch-id sink
    "positional_delete_dedup_read",  # CHANGED r14: dedup over effective scan
    "mor_merge_upsert_read",  # CHANGED r14: NULL-safe duplicate-source guard
    "merge_upsert_state",  # CHANGED r14: NULL-safe duplicate-source guard (COW)
    # (b) the ten deferred r7 rows — oldest stratum standing
    "pandas_udf_token_count",
    "pricing_summary",
    "quality_filter_decision",
    "rollup_lineitem",
    "semantic_mixture_weights",
    "semantic_search_docs",
    "semi_join_in_subquery",
    "text_quality",
    "token_count_bpe",
    "winnowing_fingerprint",
    # (c) the nineteen-row r9 stratum
    "approx_percentile_sketch",
    "bigram_pmi",
    "doc_length_histogram",
    "error_rate_windows",
    "event_funnel",
    "market_share",
    "min_cost_supplier",
    "part_value_concentration",
    "product_type_profit",
    "quality_topk_per_source",
    "seeded_sample",
    "small_quantity_revenue",
    "source_divergence",
    "stratified_sample",
    "supplier_part_diversity",
    "tfidf_top_terms",
    "vocab_stats_by_source",
    "waiting_orders_suppliers",
    "window_latest_order",
    # (d) nine fills from the oldest remaining stratum (r10), alphabetical
    "asof_join_last_order",
    "bigram_top_terms",
    "bloom_decontamination",
    "bm25_topk",
    "bpe_train_merges",
    "bucketed_colocated_join",
    "bulk_part_suppliers",
    "copurchase_triangles",
    "cosine_topk",
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
