"""Arrow-vectorized Python operators (U5) — the *disciplined* slow path.

The reference defines no database-side UDFs (SURVEY §2.10); its extension
mechanism is driver-side LLM chains.  For the north-star pipeline we still
need the Python escape hatch — and it must be Arrow-batched, never
row-at-a-time.  Two canonical shapes, each with an exact SQL oracle so the
UDF path is held to the same hash-parity bar as the built-ins:

- scalar ``pandas_udf``: BPE-ish token counting via regex over a string
  Series (vectorized `str.count`); oracle = DuckDB `regexp_extract_all`.
- grouped ``applyInPandas``: per-user z-score normalization of event
  values; oracle = window-function SQL.  At scale this shape shuffles
  once on the group key — parallelism = group cardinality — and each
  group is processed as one pandas frame (watch group size; for unbounded
  groups prefer window functions, which is exactly what the oracle shows).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from . import QuerySpec

# \w+ runs or single non-space symbols — a BPE-ish pre-tokenizer split,
# same semantics in Python `re` and DuckDB's RE2 on ASCII text.
BPE_ISH_PATTERN = r"\w+|[^\w\s]"


@F.pandas_udf(T.IntegerType())
def bpe_ish_token_count(texts: pd.Series) -> pd.Series:
    """Vectorized regex token counter (Arrow in, Arrow out)."""
    return texts.str.count(BPE_ISH_PATTERN).astype("int32")


def q_pandas_udf_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens"))


ZSCORE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("zscore", T.DoubleType()),
    ]
)


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    mean = pdf["value"].mean()
    # sample stddev (ddof=1) to match SQL stddev_samp
    std = pdf["value"].std(ddof=1)
    z = (pdf["value"] - mean) / std if pd.notna(std) and std != 0 else pdf["value"] * 0.0
    return pd.DataFrame(
        {
            "event_id": pdf["event_id"],
            "user_id": pdf["user_id"],
            "value": pdf["value"],
            "zscore": z.round(6),
        }
    )


def q_apply_in_pandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return events.groupBy("user_id").applyInPandas(_zscore_group, schema=ZSCORE_SCHEMA)


QUERIES: dict[str, QuerySpec] = {
    "pandas_udf_token_count": QuerySpec(
        q_pandas_udf_token_count,
        r"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS INT) AS n_bpe_tokens
        FROM documents
        """,
        "scalar pandas_udf (Arrow) with exact oracle",
    ),
    "apply_in_pandas_zscore": QuerySpec(
        q_apply_in_pandas_zscore,
        """
        SELECT event_id, user_id, value,
               CASE WHEN count(*) OVER u < 2 OR stddev_samp(value) OVER u = 0 THEN 0.0
                    ELSE round((value - avg(value) OVER u) / stddev_samp(value) OVER u, 6)
               END AS zscore
        FROM events
        WINDOW u AS (PARTITION BY user_id)
        """,
        "grouped applyInPandas z-score vs window-function oracle",
    ),
}
