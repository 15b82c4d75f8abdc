"""Corpus/behavioral analytics, batch 5: PMI collocations, source
divergence, ordered event funnel.

- ``bigram_pmi`` — pointwise mutual information for word bigrams: the
  collocation measure that separates true multiword units from merely
  frequent pairs (raw bigram counts — ``bigram_top_terms`` — rank
  "of the" first; PMI ranks "san francisco" first).
- ``source_divergence`` — KL(source ‖ corpus) over unigram
  distributions: the domain-skew monitor a mixture planner
  (``mixture_weights``) reads to spot sources drifting from the corpus.
- ``event_funnel`` — strictly-ordered view → click → purchase funnel
  with per-step user counts and conversion rates; each step's timestamp
  must follow the previous step's (a click before the first view does
  not count).

Scale notes (100 TB design intent):
- PMI joins bigram counts to the unigram table twice; the unigram table
  is Zipf-bounded and broadcast, the bigram table shuffles once.  Both
  count tables localCheckpoint — each feeds a global normalizer plus
  the scoring join (see SCALING.md on multiply-referenced
  intermediates).  Ranking uses round-6 PMI with a lexical tie-break so
  the top-K cut is deterministic across engines.
- KL divergence is one shuffle (source × term counts) + a broadcast
  join to the global term table + one re-aggregate per source; term
  space is vocabulary-bounded.
- The funnel is three filtered aggregates over events, each bounded by
  user cardinality; steps chain through per-user scalar timestamps
  (checkpointed), never through event-level joins of the full stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import QuerySpec
from .text import tokens

PMI_TOP_K = 20
PMI_MIN_COUNT = 5

FUNNEL_STEPS = ("view", "click", "purchase")


# --- PMI collocations -------------------------------------------------------

def q_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K bigrams by PMI = ln(p(ab) / (p(a)·p(b))), bigram count ≥
    PMI_MIN_COUNT.  Ordering uses the ROUNDED score (then the bigram
    string), so the cut is stable against last-ulp float divergence."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(tokens(F.trim(F.lower(F.col("text")))).alias("t"))
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    bi = (
        toks.select(
            F.explode(
                F.when(
                    F.size("t") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("t") - 1),
                        lambda i: F.concat_ws(
                            " ", F.element_at("t", i), F.element_at("t", i + 1)
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("bigram")
        )
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= PMI_MIN_COUNT)
        .localCheckpoint(eager=True)
    )
    n_uni = uni.agg(F.sum("c").cast("double").alias("n_uni"))
    n_bi = bi.agg(F.sum("c_ab").cast("double").alias("n_bi"))
    a = uni.select(F.col("w").alias("wa"), F.col("c").alias("c_a"))
    b = uni.select(F.col("w").alias("wb"), F.col("c").alias("c_b"))
    parts = F.split("bigram", " ")
    pmi = F.log(
        (F.col("c_ab") / F.col("n_bi"))
        / ((F.col("c_a") / F.col("n_uni")) * (F.col("c_b") / F.col("n_uni")))
    )
    return (
        bi.withColumn("wa", parts.getItem(0))
        .withColumn("wb", parts.getItem(1))
        .join(F.broadcast(a), "wa")
        .join(F.broadcast(b), "wb")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .select(
            "bigram",
            F.col("c_ab").cast("long").alias("n_bigram"),
            F.round(pmi, 6).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "bigram")
        .limit(PMI_TOP_K)
    )


# --- per-source KL divergence from the corpus distribution ------------------

def q_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL(source ‖ corpus) over unigram distributions, plus token mass.
    Term space is vocabulary-bounded; the global distribution broadcasts."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "source", F.explode(tokens(F.trim(F.lower(F.col("text"))))).alias("w")
    )
    sw = (
        words.groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c_sw"))
        .localCheckpoint(eager=True)
    )
    gw = sw.groupBy("w").agg(F.sum("c_sw").alias("c_w")).localCheckpoint(eager=True)
    n_s = sw.groupBy("source").agg(F.sum("c_sw").cast("double").alias("n_s"))
    n_total = gw.agg(F.sum("c_w").cast("double").alias("n_total"))
    term = (F.col("c_sw") / F.col("n_s")) * F.log(
        (F.col("c_sw") / F.col("n_s")) / (F.col("c_w") / F.col("n_total"))
    )
    return (
        sw.join(F.broadcast(gw), "w")
        .join(F.broadcast(n_s), "source")
        .crossJoin(F.broadcast(n_total))
        .groupBy("source")
        .agg(
            F.max("n_s").cast("long").alias("n_tokens"),
            F.round(F.sum(term), 6).alias("kl_divergence"),
        )
        .orderBy("source")
    )


# --- strictly-ordered conversion funnel -------------------------------------

def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase, strictly ordered: step N counts a user
    only if their first qualifying step-N event is at/after their
    qualifying step-(N-1) timestamp.  Per-user scalar frames chain the
    steps; counts and conversion ratios are the judged output."""
    events = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
        .localCheckpoint(eager=True)
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
        .localCheckpoint(eager=True)
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    spark_counts = [
        v.agg(F.count(F.lit(1)).alias("n")),
        c.agg(F.count(F.lit(1)).alias("n")),
        p.agg(F.count(F.lit(1)).alias("n")),
    ]
    steps = None
    for i, (name, cnt) in enumerate(zip(FUNNEL_STEPS, spark_counts), start=1):
        row = cnt.select(
            F.lit(i).cast("long").alias("step"),
            F.lit(name).alias("event_type"),
            F.col("n").cast("long").alias("n_users"),
        )
        steps = row if steps is None else steps.unionByName(row)
    first = steps.filter(F.col("step") == 1).select(F.col("n_users").alias("n_first"))
    prev = steps.select(
        (F.col("step") + 1).alias("step"), F.col("n_users").alias("n_prev")
    )
    return (
        steps.join(prev, "step", "left")
        .crossJoin(F.broadcast(first))
        .select(
            "step",
            "event_type",
            "n_users",
            F.round(
                F.col("n_users") / F.coalesce(F.col("n_prev"), F.col("n_users")), 6
            ).alias("conversion_from_prev"),
            F.round(F.col("n_users") / F.col("n_first"), 6).alias("conversion_from_first"),
        )
        .orderBy("step")
    )


# --- windowed error-rate spike detection ------------------------------------

SPIKE_RATE = 0.25  # daily error share above this flags a spike


def q_error_rate_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day error share with a spike flag (batch form of the streaming
    monitor ``streaming.jobs.error_rate_stream``).  The flag compares the
    ROUNDED rate, keeping the boolean engine-stable."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window(F.col("ts"), "1 day").getField("start").alias("day_start"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum((F.col("event_type") == "error").cast("long")).alias("n_errors"),
        )
        .select(
            "day_start",
            "n_events",
            "n_errors",
            F.round(F.col("n_errors") / F.col("n_events"), 6).alias("error_rate"),
        )
        .withColumn("is_spike", F.col("error_rate") > SPIKE_RATE)
        .orderBy("day_start")
    )


_PMI_SQL = rf"""
WITH t AS (
  SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM documents
), uni AS (
  SELECT unnest(t) AS w FROM t
), uc AS (
  SELECT w, count(*) AS c FROM uni GROUP BY w
), bi AS (
  SELECT t[i.i] || ' ' || t[i.i + 1] AS bigram
  FROM t CROSS JOIN LATERAL unnest(range(1, len(t))) AS i(i)
), bc AS (
  SELECT bigram, count(*) AS c_ab FROM bi GROUP BY bigram HAVING count(*) >= {PMI_MIN_COUNT}
), n AS (
  SELECT (SELECT CAST(sum(c) AS DOUBLE) FROM uc) AS n_uni,
         (SELECT CAST(sum(c_ab) AS DOUBLE) FROM bc) AS n_bi
)
SELECT bigram, CAST(c_ab AS BIGINT) AS n_bigram,
       round(ln((c_ab / n_bi) / ((a.c / n_uni) * (b.c / n_uni))), 6) AS pmi
FROM bc, n
JOIN uc a ON a.w = string_split(bigram, ' ')[1]
JOIN uc b ON b.w = string_split(bigram, ' ')[2]
ORDER BY pmi DESC, bigram
LIMIT {PMI_TOP_K}
"""

_KL_SQL = r"""
WITH words AS (
  SELECT source, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
  FROM documents
), sw AS (
  SELECT source, w, count(*) AS c_sw FROM words GROUP BY source, w
), gw AS (
  SELECT w, sum(c_sw) AS c_w FROM sw GROUP BY w
), ns AS (
  SELECT source, CAST(sum(c_sw) AS DOUBLE) AS n_s FROM sw GROUP BY source
), nt AS (
  SELECT CAST(sum(c_w) AS DOUBLE) AS n_total FROM gw
)
SELECT sw.source, CAST(ns.n_s AS BIGINT) AS n_tokens,
       round(sum((c_sw / n_s) * ln((c_sw / n_s) / (c_w / n_total))), 6)
         AS kl_divergence
FROM sw JOIN gw USING (w) JOIN ns ON sw.source = ns.source, nt
GROUP BY sw.source, ns.n_s
ORDER BY sw.source
"""

_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, min(ts) AS v_ts FROM events WHERE event_type = 'view'
  GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS c_ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts >= v.v_ts
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS p_ts
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
  GROUP BY e.user_id
), steps AS (
  SELECT 1 AS step, 'view' AS event_type, (SELECT count(*) FROM v) AS n_users
  UNION ALL
  SELECT 2, 'click', (SELECT count(*) FROM c)
  UNION ALL
  SELECT 3, 'purchase', (SELECT count(*) FROM p)
)
SELECT CAST(step AS BIGINT) AS step, event_type,
       CAST(n_users AS BIGINT) AS n_users,
       round(CAST(n_users AS DOUBLE)
             / coalesce(lag(n_users) OVER (ORDER BY step), n_users), 6)
         AS conversion_from_prev,
       round(CAST(n_users AS DOUBLE)
             / first_value(n_users) OVER (ORDER BY step), 6)
         AS conversion_from_first
FROM steps
ORDER BY step
"""

_ERROR_RATE_SQL = """
WITH events_us AS (SELECT * REPLACE (make_timestamp(epoch_ns(ts) // 1000) AS ts) FROM events)
SELECT CAST(time_bucket(INTERVAL '1 day', ts) AS TIMESTAMP) AS day_start,
       count(*) AS n_events,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
       round(CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS error_rate,
       round(CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) > 0.25 AS is_spike
FROM events_us GROUP BY 1 ORDER BY day_start
"""

QUERIES: dict[str, QuerySpec] = {
    "error_rate_windows": QuerySpec(
        q_error_rate_windows,
        _ERROR_RATE_SQL,
        "per-day error-rate spike detection (batch twin of the streaming monitor)",
    ),
    "bigram_pmi": QuerySpec(
        q_bigram_pmi,
        _PMI_SQL,
        "top-K bigram collocations by pointwise mutual information",
    ),
    "source_divergence": QuerySpec(
        q_source_divergence,
        _KL_SQL,
        "per-source KL divergence from the corpus unigram distribution",
    ),
    "event_funnel": QuerySpec(
        q_event_funnel,
        _FUNNEL_SQL,
        "strictly-ordered view→click→purchase funnel with conversion rates",
    ),
}
