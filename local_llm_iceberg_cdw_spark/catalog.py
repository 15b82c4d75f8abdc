"""Table registry + readers.

The reference's data access is (a) Iceberg tables resolved through a
catalog (``/root/reference/append_telco_spark_iceberg.py:20-26,34``) and
(b) staged CSVs read with header+inferSchema then corrected by explicit
casts (``append_telco_spark_iceberg.py:40-58``).  Here:

- ``load_table(spark, sf_dir, name)`` reads one of the driver's parquet
  fixture tables.  Scans stay fully declarative so Catalyst pushes filters
  and prunes columns into the parquet reader.
- ``register_views`` exposes all fixture tables as temp views so the SQL
  surface (plans/sql.py) can serve arbitrary statements over them.
- ``read_csv_with_casts`` reproduces the reference's CSV ingestion idiom
  (S4/P7 in SURVEY.md §2) as a reusable helper.
"""

from __future__ import annotations

import os

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Plain parquet scan → full pushdown/pruning.

    `events.ts` has shipped with two physical layouts across fixture
    generations: TIMESTAMP(NANOS) (which Spark's parquet reader only accepts
    as a raw long via the legacy conf) and plain ``timestamp[us]`` (read as
    TIMESTAMP_NTZ).  We branch on the *observed* Spark type so either layout
    yields the same session-tz TimestampType column:

    - LongType (nanos-as-long): integer ``div 1000`` → ``timestamp_micros``.
      Integer division is load-bearing — epoch-ns values (~1.7e18) exceed
      double's 2^53 exact range, so float division would corrupt microseconds.
    - TIMESTAMP_NTZ: plain cast to timestamp.  Session tz is UTC
      (session.py), so wall-clock instants are preserved and match the
      DuckDB oracle's naive-timestamp semantics.

    Any other observed ts type is schema drift and raises TypeError loudly
    rather than silently miscasting (a string or double-epoch layout would
    otherwise yield nulls / wrong instants).

    The ``nanosAsLong`` legacy conf is set ONLY when the plain read rejects
    the footer (i.e. the layout really is TIMESTAMP(NANOS)).  It then stays
    set for the session: the parquet reader consults it again at execution
    time, so restoring it here would break the returned (lazy) DataFrame.
    """
    if name not in FIXTURE_TABLES:
        raise KeyError(f"unknown fixture table {name!r}; expected one of {FIXTURE_TABLES}")
    if name == "events":
        path = os.path.join(sf_dir, "events.parquet")
        try:
            df = spark.read.parquet(path)
        except Exception as exc:
            # Opt into the legacy conf ONLY for the TIMESTAMP(NANOS)
            # footer rejection ("Illegal Parquet type: INT64
            # (TIMESTAMP(NANOS,..))").  Matching the signature keeps a
            # missing file / corrupt footer / permissions error from both
            # (a) pointlessly retrying and (b) leaving a session-wide
            # legacy conf flipped for an unrelated failure.
            msg = str(exc)
            if "NANOS" not in msg and "Illegal Parquet type" not in msg:
                raise
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast(TimestampType()))
        elif not isinstance(ts_type, TimestampType):
            raise TypeError(
                f"events.ts has unexpected type {ts_type.simpleString()}; "
                "expected TIMESTAMP, TIMESTAMP_NTZ, or nanos-as-LONG — "
                "refusing to cast blindly (schema drift should fail loudly)"
            )
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(
    spark: SparkSession, sf_dir: str, tables=FIXTURE_TABLES, strict: bool = False
) -> dict[str, Exception]:
    """Register fixture tables as temp views (mirrors the DuckDB oracle's
    pre-registered views, and the reference's catalog-resolved names).

    Fault-tolerant by default: one broken/missing table degrades that one
    view instead of failing the whole registration (a full round of bench
    evidence was once lost to exactly that).  Failures are returned (and
    warned to stderr); pass ``strict=True`` to re-raise the first one.
    """
    failed: dict[str, Exception] = {}
    for name in tables:
        try:
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
        except Exception as exc:
            if strict:
                raise
            failed[name] = exc
            print(f"register_views: skipping {name!r}: {exc}", file=sys.stderr)
    return failed


def read_csv_with_casts(
    spark: SparkSession,
    path: str,
    date_cols: dict[str, str] | None = None,
    timestamp_cols: dict[str, str] | None = None,
) -> DataFrame:
    """CSV source with header + schema inference, then explicit casts.

    Reference behavior: ``spark.read.option("header","true")
    .option("inferSchema","true").csv(path)`` followed by per-column
    ``to_date``/``to_timestamp`` casts
    (``/root/reference/telco_spark/append_telco_spark_iceberg.py:40-58``).
    ``date_cols``/``timestamp_cols`` map column name → format pattern.
    """
    df = spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    for col, fmt in (date_cols or {}).items():
        df = df.withColumn(col, F.to_date(F.col(col), fmt))
    for col, fmt in (timestamp_cols or {}).items():
        df = df.withColumn(col, F.to_timestamp(F.col(col), fmt))
    return df


def table_info(spark: SparkSession, names, sample_rows: int = 10) -> str:
    """Schema introspection: DDL-ish schema + N sample rows per table,
    rendered to text — the reference feeds exactly this to its NL layer
    (``sample_rows_in_table_info=10`` at ``/root/reference/app-gradio.py:87``,
    ``DESCRIBE`` loop at ``all_in_one_PC.py:160-167``).
    """
    chunks: list[str] = []
    for name in names:
        df = spark.table(name)
        cols = ",\n  ".join(f"{f.name} {f.dataType.simpleString().upper()}" for f in df.schema.fields)
        sample = df.limit(sample_rows).toPandas().to_string(index=False)
        chunks.append(f"CREATE TABLE {name} (\n  {cols}\n);\n/*\n{sample_rows} rows from {name}:\n{sample}\n*/")
    return "\n\n".join(chunks)
