"""Native Iceberg runtime integration — skip-if-absent.

The sandbox ships no iceberg-spark-runtime jar, so this module is
normally skipped; the moment one appears on the classpath
(``session.iceberg_runtime_available``), the real ``formats.iceberg``
surface runs end to end — create / append-per-snapshot / snapshot-id
time travel / row-level DELETE / drop — instead of staying a
perpetually-unexecuted SQL generator.  The identical contract is
exercised every run against the parquet+manifest fallback
(tests/test_snapshots.py), so a green run here means the two formats are
interchangeable behind ``resolve_format``.
"""

from __future__ import annotations

import pytest

from local_llm_iceberg_cdw_spark.session import iceberg_runtime_available

pytestmark = pytest.mark.skipif(
    not iceberg_runtime_available(),
    reason="iceberg-spark-runtime jar not on classpath (expected in this sandbox)",
)


def test_iceberg_native_snapshot_lifecycle(spark):
    from pyspark.sql import functions as F

    from local_llm_iceberg_cdw_spark.formats.iceberg import IcebergTable

    spark.sql("CREATE NAMESPACE IF NOT EXISTS local.itest")
    t = IcebergTable(spark, "itest", "orders_v")
    t.drop()

    t.create(spark.range(0, 10).withColumn("v", F.col("id") * 2))
    t.append(spark.range(10, 15).withColumn("v", F.col("id") * 2))
    try:
        assert t.read().count() == 15

        snaps = t.snapshots().orderBy("committed_at").collect()
        assert len(snaps) == 2  # create + append = two snapshots
        first_id = snaps[0].snapshot_id
        assert t.read(version=first_id).count() == 10
        assert t.history().count() == 2

        t.delete_where("id >= 12")
        assert t.read().count() == 12
        # the delete is its own snapshot; the old id still time-travels
        assert t.read(version=first_id).count() == 10
    finally:
        t.drop()


def test_iceberg_native_merge_upsert(spark):
    from pyspark.sql import functions as F

    from local_llm_iceberg_cdw_spark.formats.iceberg import IcebergTable

    spark.sql("CREATE NAMESPACE IF NOT EXISTS local.itest")
    t = IcebergTable(spark, "itest", "merge_v")
    t.drop()
    t.create(spark.range(0, 5).withColumn("v", F.lit(1)))
    try:
        # update ids 3-4, insert 5-6
        t.merge(spark.range(3, 7).withColumn("v", F.lit(99)), ["id"])
        rows = {r.id: r.v for r in t.read().collect()}
        assert rows == {0: 1, 1: 1, 2: 1, 3: 99, 4: 99, 5: 99, 6: 99}
    finally:
        t.drop()
