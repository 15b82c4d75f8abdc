"""SCD2 refresh-cost-vs-history-length probe (VERDICT r18 #1 done
criterion: "refresh cost flat in history length").

The r19 fold (``scd2_apply_changes``) writes O(delta) per refresh —
one merge_mor snapshot — so the axis that could still hurt is not
history ROW COUNT but the MOR read amplification: every fold adds one
equality-delete file, and the open-slice read pays one anti-join per
pending delete file until ``compact()`` materializes them away.  This
probe measures ONE fixed-delta fold at increasing accumulated history
lengths, with and without a compaction cadence, so the operating line
and the maintenance knob are both on record.

Usage::

    python tools/probe_scd2_history.py            # default lengths
    python tools/probe_scd2_history.py 20 80      # custom version counts

Output: one JSON line per configuration:
``{"versions": N, "history_rows": R, "compacted": bool, "fold_s": t}``.
Run UNCONTENDED (same protocol as the bench probes).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def build_session():
    return (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def run_probe(spark, n_versions: int, compact_every: int | None, n_keys: int = 20000):
    """Fold ``n_versions`` synthetic CDC batches (each churns the same
    fixed 1% key slice: delete + reinsert = one SCD2 transition per key
    per version), then time ONE more fixed-size fold."""
    import shutil

    from local_llm_iceberg_cdw_spark.formats.snapshot_parquet import (
        SnapshotParquetTable,
    )
    from local_llm_iceberg_cdw_spark.operators.snapshots_op import scd2_apply_changes

    workdir = tempfile.mkdtemp(prefix="scd2_hist_probe_")
    try:
        hist = SnapshotParquetTable(spark, f"{workdir}/hist")
        hist.create(
            spark.createDataFrame(
                [], "k long, val double, valid_from long, valid_to long"
            )
        )
        churn = max(n_keys // 100, 100)  # fixed delta: 1% of keys

        def batch_df(version: int, keys_from: int, keys_to: int, with_deletes: bool):
            ins = spark.range(keys_from, keys_to).select(
                F.col("id").alias("k"),
                (F.col("id") * 1.0 + version).alias("val"),
                F.lit("insert").alias("_change_type"),
                F.lit(version).cast("long").alias("_commit_version"),
            )
            if not with_deletes:
                return ins
            dels = spark.range(keys_from, keys_to).select(
                F.col("id").alias("k"),
                F.lit(None).cast("double").alias("val"),
                F.lit("delete").alias("_change_type"),
                F.lit(version).cast("long").alias("_commit_version"),
            )
            return dels.unionByName(ins)

        # v1 bootstrap: open every key
        scd2_apply_changes(
            hist, batch_df(1, 0, n_keys, False), 1,
            key_col="k", attr_cols=["val"], query_id="probe",
        )
        for v in range(2, n_versions + 1):
            scd2_apply_changes(
                hist, batch_df(v, 0, churn, True), v,
                key_col="k", attr_cols=["val"], query_id="probe",
            )
            if compact_every and v % compact_every == 0:
                hist.compact()
        rows = hist.read().count()
        t0 = time.time()
        scd2_apply_changes(
            hist, batch_df(n_versions + 1, 0, churn, True), n_versions + 1,
            key_col="k", attr_cols=["val"], query_id="probe",
        )
        dt = time.time() - t0
        return {
            "versions": n_versions,
            "history_rows": rows,
            "churn_rows": churn * 2,
            "compact_every": compact_every,
            "fold_s": round(dt, 3),
        }
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def main():
    lengths = [int(a) for a in sys.argv[1:]] or [10, 40]
    spark = build_session()
    # warm-up so the first timed fold isn't charged for JVM boot
    run_probe(spark, 2, None, n_keys=2000)
    for n in lengths:
        for compact_every in (None, 10):
            print(json.dumps(run_probe(spark, n, compact_every)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
