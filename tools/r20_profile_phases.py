"""Phase profiler for the r20 optimization round (measurement only).

Wraps the shared mutation/audit/drain primitives with wall-clock timers,
runs one op at a time, and prints a per-phase cost breakdown — the
guide-§1 "where is the time actually going" step for the judged
streaming/ANN chains whose cost is many small Spark jobs rather than one
big stage.

Usage: python tools/r20_profile_phases.py <query_name> [<query_name> ...]
"""

from __future__ import annotations

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

PHASES: dict[str, list[float]] = defaultdict(list)
_STACK: list[str] = []


def _wrap(obj, name, label=None):
    fn = getattr(obj, name)
    lab = label or f"{getattr(obj, '__name__', obj.__class__.__name__)}.{name}"

    def wrapped(*a, **k):
        _STACK.append(lab)
        t0 = time.perf_counter()
        try:
            return fn(*a, **k)
        finally:
            _STACK.pop()
            el = time.perf_counter() - t0
            # charge only the OUTERMOST wrapped frame to avoid double counts
            if not any(s for s in _STACK):
                PHASES[lab].append(el)
            else:
                PHASES[f"{_STACK[-1]} > {lab}"].append(el)

    setattr(obj, name, wrapped)


def install():
    from pyspark.sql import DataFrame
    from pyspark.sql.streaming import readwriter as srw

    from local_llm_iceberg_cdw_spark.formats.snapshot_parquet import (
        SnapshotParquetTable,
    )
    from local_llm_iceberg_cdw_spark.operators import snapshots_op
    from local_llm_iceberg_cdw_spark.streaming import jobs as sjobs

    for m in ("create", "append", "compact", "replace", "delete_where_mor",
              "fast_forward", "create_branch", "_load"):
        if hasattr(SnapshotParquetTable, m):
            _wrap(SnapshotParquetTable, m, f"tbl.{m}")
    _wrap(snapshots_op, "_multiset_equal", "multiset_equal")
    _wrap(snapshots_op, "_ann_encode", "ann_encode(lazy)")
    _wrap(snapshots_op, "ann_probe_topk", "probe_topk(lazy)")
    _wrap(sjobs, "stream_table_changes", "loop_drain")
    _wrap(DataFrame, "localCheckpoint", "df.localCheckpoint")
    _wrap(DataFrame, "collect", "df.collect")
    _wrap(DataFrame, "count", "df.count")

    # time each streaming query start→awaitTermination as one "drain"
    orig_start = srw.DataStreamWriter.start

    def start(self, *a, **k):
        t0 = time.perf_counter()
        q = orig_start(self, *a, **k)
        orig_await = q.awaitTermination

        def await_t(*aa, **kk):
            try:
                return orig_await(*aa, **kk)
            finally:
                PHASES["availableNow_drain"].append(time.perf_counter() - t0)

        q.awaitTermination = await_t
        return q

    srw.DataStreamWriter.start = start


def main():
    names = sys.argv[1:]
    from local_llm_iceberg_cdw_spark.operators import all_queries
    from local_llm_iceberg_cdw_spark.session import build_session

    spark = build_session("profile")
    qs = all_queries()
    install()
    for name in names:
        PHASES.clear()
        t0 = time.perf_counter()
        df = qs[name].builder(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        total = time.perf_counter() - t0
        print(f"\n=== {name}: total {total:.2f}s ===")
        acc = 0.0
        for lab, xs in sorted(PHASES.items(), key=lambda t: -sum(t[1])):
            print(f"  {sum(xs):7.2f}s  n={len(xs):3d}  {lab}")
            if " > " not in lab:
                acc += sum(xs)
        print(f"  {acc:7.2f}s  accounted (top-level)  |  {total - acc:.2f}s other")
    spark.stop()


if __name__ == "__main__":
    main()
