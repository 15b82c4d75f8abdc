"""Benchmark runner — the driver's per-round feedback loop.

Runs the headline query library at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {name: sec},
 "sf": ...}.

Each query is fully materialized through the `noop` sink (JVM-side, no
driver collect) so timings measure the whole plan, not just the limit.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from local_llm_iceberg_cdw_spark.operators import all_queries  # noqa: E402
from local_llm_iceberg_cdw_spark.session import build_session  # noqa: E402

# Headline set: every operator family, weighted toward the scaling tables.
BENCH_QUERIES = [
    "flagship_revenue_by_segment",
    "pricing_summary",
    "forecast_revenue",
    "shipping_priority",
    "star_join_revenue_by_nation",
    "semi_join_in_subquery",
    "group_sum_by_priority",
    "distinct_count",
    "rollup_lineitem",
    "window_latest_order",
    "window_running_sum",
    "topk_orders",
    "anti_join_customers_without_orders",
    "json_extract_props",
    "tumbling_window_daily",
    "sessionize",
    "asof_join_last_order",
    "interval_range_join",
    "event_type_pivot",
    "token_count",
    "text_quality",
    "winnowing_fingerprint",
    "doc_stats_by_source",
    "exact_dedup_docs",
    "minhash_lsh_verdicts",
    "simhash_pairs",
    "cosine_topk",
    "ivf_topk_results",
    "lsh_near_dup_pairs",
    "pandas_udf_token_count",
    "apply_in_pandas_zscore",
    "snapshot_time_travel",
    # extended relational batch (TPC-H shapes)
    "order_priority_exists",
    "customer_order_distribution",
    "returned_item_revenue",
    "bilateral_trade_volume",
    "disjunctive_part_filter",
    # deep TPC-H shapes (round 2)
    "min_cost_supplier",
    "market_share",
    "product_type_profit",
    "part_value_concentration",
    "supplier_part_diversity",
    "small_quantity_revenue",
    "bulk_part_suppliers",
    "waiting_orders_suppliers",
    # curation / training-pipeline ops
    "word_count",
    "tfidf_top_terms",
    "hash_split_train_test",
    "quality_topk_per_source",
    # round-2 corpus-pipeline ops
    "pii_redaction",
    "decontamination_check",
    "token_length_histogram",
    "bigram_top_terms",
    "vocab_stats_by_source",
    "hash_sample_per_source",
    "retention_cohorts",
    "training_manifest",
    # corpus batch 3
    "doc_chunking",
    "dedup_clusters",
    "vocab_coverage",
    # corpus batch 4 (packing / mixture / LM quality / prefix dedup)
    "sequence_packing",
    "mixture_weights",
    "unigram_logprob_quality",
    "prefix_dedup",
    # analytics batch 5 (PMI collocations / KL divergence / funnel)
    "bigram_pmi",
    "source_divergence",
    "event_funnel",
    # snapshot incremental append scan (CDC primitive)
    "snapshot_incremental_read",
    # windowed error-rate monitor (batch twin of the streaming job)
    "error_rate_windows",
]
# Deliberately excluded: the O(n²) brute-force baselines
# (ngram_jaccard_dedup, embedding_near_dup, theta_join_acctbal) — they exist
# as correctness oracles for the LSH/IVF scale paths, not as operators one
# would run at scale.  The judged registry forms minhash_lsh_dedup /
# simhash_dedup wrap the production operators benched here
# (minhash_lsh_verdicts / simhash_pairs) in an in-query brute-force
# validation harness, so they are baselines too.

# Production operators benched directly (library functions, not registry
# entries — their judged counterparts carry the validation harness).
from local_llm_iceberg_cdw_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_verdicts,
    simhash_pairs,
)
from local_llm_iceberg_cdw_spark.operators.similarity import (  # noqa: E402
    ivf_topk_results,
    lsh_near_dup_pairs,
)

EXTRA_BENCH_OPS = {
    "minhash_lsh_verdicts": minhash_lsh_verdicts,
    "simhash_pairs": simhash_pairs,
    "ivf_topk_results": ivf_topk_results,
    "lsh_near_dup_pairs": lsh_near_dup_pairs,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = build_session(app_name="bench")

    specs = all_queries()
    # Warm-up so the first timed query isn't charged for boot: a bare
    # spark.range leaves file-listing/footer-decode/parquet-codegen cold
    # (measured: flagship 6.0 s cold vs ~1.4 s for the same shape warm), so
    # touch every fixture table and run the flagship's join+agg shape once.
    from local_llm_iceberg_cdw_spark.catalog import FIXTURE_TABLES, load_table  # noqa: E402

    for t in FIXTURE_TABLES:
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()
    specs["flagship_revenue_by_segment"].builder(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    # parquet WRITE path is separately cold (costs ~3.5 s on the first
    # snapshot op otherwise); warm it with a throwaway round-trip
    import shutil
    import tempfile

    wdir = tempfile.mkdtemp(prefix="bench_warm_")
    try:
        spark.range(1000).write.mode("overwrite").parquet(f"{wdir}/w")
        spark.read.parquet(f"{wdir}/w").write.format("noop").mode("overwrite").save()
    finally:
        shutil.rmtree(wdir, ignore_errors=True)

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        # time builder + materialization: for most queries the builder is
        # pure plan construction (ms), but snapshot/e2e ops do real work
        # there — timing only the sink under-reported them
        t0 = time.perf_counter()
        builder = EXTRA_BENCH_OPS.get(name) or specs[name].builder
        df = builder(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "query_library_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
