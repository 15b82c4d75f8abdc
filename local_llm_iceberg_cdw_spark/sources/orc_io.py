"""ORC source/sink — the columnar interchange format beside parquet.

The reference's warehouse is format-agnostic behind Impala/Iceberg
(tables there can be backed by parquet OR orc); this module keeps the
engine symmetric: any table the catalog serves from parquet can be
dropped to / ingested from ORC with the same schema guarantees.  Spark
ships the native vectorized ORC reader/writer (no extra packages), so
the path is JVM-side end to end.

Scale notes:
- ORC stripes split like parquet row groups — a single large file
  parallelizes across executors, and predicate pushdown reaches the
  stripe/row-group level through the same DataSource V2 scan machinery
  (``PushedFilters`` appears in `.explain` exactly as for parquet).
- Always pass the schema when reading untrusted drops: schema-on-read
  is a footer read for ORC (cheap, unlike JSONL inference), but an
  explicit schema pins column TYPES against writer drift — the
  manifest-owns-the-schema rule the snapshot format follows.
- Compression defaults to snappy (matching the parquet side); zlib
  trades ~15% size for CPU — set via ``compression`` for cold tiers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Read ORC; pass ``schema`` to pin types against writer drift."""
    reader = spark.read if schema is None else spark.read.schema(schema)
    return reader.orc(path)


def write_orc(
    df: DataFrame, path: str, mode: str = "overwrite", compression: str = "snappy"
) -> None:
    """Write ORC with stripe-splittable files (vectorized JVM writer)."""
    df.write.mode(mode).option("compression", compression).orc(path)
