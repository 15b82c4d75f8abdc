"""Line-delimited JSON source/sink.

The reference interchanges batches as CSV files on HDFS
(``/root/reference/telco_spark/create_data.py:98-102``); JSONL is the
same role for document corpora (one JSON object per line — the de-facto
format for LLM training data drops).

Scale notes:
- Always pass an explicit schema: ``spark.read.json`` without one runs a
  full inference pass over the data (a second scan of 100 TB).  Schema
  inference is for notebooks, not pipelines.
- JSONL splits by line, so a single large file still parallelizes across
  executors (unlike multiline JSON, which is one-task-per-file).
- Readers tolerate corrupt lines via the PERMISSIVE mode default; pass
  ``columnNameOfCorruptRecord`` explicitly when auditing bad records.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_column: str | None = None,
) -> DataFrame:
    """Read line-delimited JSON with a mandatory explicit schema."""
    reader = spark.read.schema(
        schema
        if corrupt_column is None
        else T.StructType(schema.fields + [T.StructField(corrupt_column, T.StringType())])
    )
    if corrupt_column is not None:
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", corrupt_column
        )
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write one JSON object per line; splittable on read."""
    df.write.mode(mode).json(path)
