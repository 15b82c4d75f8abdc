"""Table formats — snapshot-versioned storage behind one seam.

The reference's storage layer is Apache Iceberg via Impala DDL
(``/root/reference/create_iceberg.py:119-148``) and via a Spark catalog
(``append_telco_spark_iceberg.py:20-26``), exercising: CREATE/DROP,
batched-append-as-one-snapshot, snapshot history, and wall-clock time
travel (``README.md:94-108``).

``resolve_format(spark)`` returns the best available implementation:

- :class:`IcebergTableFormat` when an iceberg-spark-runtime jar is on the
  classpath (native ``writeTo().append()``, ``TIMESTAMP AS OF``,
  ``t.history``/``t.snapshots``, ``rewrite_data_files`` compaction).
- :class:`SnapshotParquetTable` otherwise: plain parquet data files plus a
  driver-side JSON manifest per table — the same snapshot/append/time-travel
  semantics, so every operator and test is format-agnostic.
"""

from .snapshot_parquet import SnapshotParquetTable, resolve_format

__all__ = ["SnapshotParquetTable", "resolve_format"]
