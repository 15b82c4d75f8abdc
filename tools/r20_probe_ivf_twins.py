"""r20 probe: collect-compare the IVF fold-exact twins vs the brute
expression-join forms at sf0.1 (2000 rows — the bench surface), plus
min-of-2 warm timings for both tiers.  Run AFTER the suite is idle."""

import sys
import time

sys.path.insert(0, "/root/repo")

from local_llm_iceberg_cdw_spark.session import build_session  # noqa: E402

SF = "/root/testdata/sf0.1"


def rows(df):
    return sorted(
        (tuple(tuple(v) if isinstance(v, list) else v for v in r) for r in df.collect()),
        key=repr,
    )


def timed(fn, reps=2):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    spark = build_session(app_name="r20_probe")
    from local_llm_iceberg_cdw_spark.operators import quantization as qz
    from local_llm_iceberg_cdw_spark.operators import similarity as sim

    # warm scan + python workers
    from local_llm_iceberg_cdw_spark.catalog import load_table

    load_table(spark, SF, "embeddings").write.format("noop").mode("overwrite").save()

    for name, fn in (
        ("ivf_topk_results", sim.ivf_topk_results),
        ("ivfsq8_results", qz.ivfsq8_results),
    ):
        # twin tier (the real count at sf0.1 is 2000 > 500)
        sim._EMB_COUNT_CACHE[SF] = 2000
        t_twin = timed(lambda: fn(spark, SF))
        twin = rows(fn(spark, SF))
        # brute tier forced
        sim._EMB_COUNT_CACHE[SF] = 500
        t_brute = timed(lambda: fn(spark, SF))
        brute = rows(fn(spark, SF))
        sim._EMB_COUNT_CACHE.pop(SF, None)
        eq = twin == brute
        print(
            f"{name}: EQUAL={eq} rows={len(twin)}/{len(brute)} "
            f"twin={t_twin:.2f}s brute={t_brute:.2f}s"
        )
        if not eq:
            tw, br = set(twin), set(brute)
            print("  only-twin:", list(tw - br)[:3])
            print("  only-brute:", list(br - tw)[:3])
    spark.stop()


if __name__ == "__main__":
    main()
