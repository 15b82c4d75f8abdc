"""Dump .explain('formatted') before/after plans for r20-touched ops.

Usage: python tools/r20_dump_plans.py <op> [<op> ...]
Each op maps to a (builder, force_brute?) pair; 'before' = the brute
expression form (tier forced via _EMB_COUNT_CACHE), 'after' = the tier
the sf0.1 bench runs."""

import os
import sys

sys.path.insert(0, "/root/repo")

from local_llm_iceberg_cdw_spark.session import build_session  # noqa: E402

SF = "/root/testdata/sf0.1"
OUT = "/root/repo/plans/r20"


def main():
    spark = build_session(app_name="r20_plans")
    from local_llm_iceberg_cdw_spark.operators import quantization as qz
    from local_llm_iceberg_cdw_spark.operators import similarity as sim

    builders = {
        "ivf_topk_results": sim.ivf_topk_results,
        "ivfsq8_results": qz.ivfsq8_results,
        "ivfpq_results": qz.ivfpq_results,
        "pq_adc_topk": qz.q_pq_adc_topk,
        "pq_rerank_topk": qz.q_pq_rerank_topk,
    }
    os.makedirs(OUT, exist_ok=True)
    for name in sys.argv[1:]:
        fn = builders[name]
        for tier, count in (("before", 500), ("after", 2000)):
            sim._EMB_COUNT_CACHE[SF] = count
            df = fn(spark, SF)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(f"{OUT}/{name}_{tier}.txt", "w") as fh:
                fh.write(plan)
            print(f"wrote {name}_{tier}.txt ({len(plan)} chars)")
        sim._EMB_COUNT_CACHE.pop(SF, None)
    spark.stop()


if __name__ == "__main__":
    main()
