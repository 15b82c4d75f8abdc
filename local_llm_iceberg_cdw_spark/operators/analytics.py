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


# --- Dunning log-likelihood-ratio collocations -------------------------------

LLR_TOP_K = 20
LLR_MIN_COUNT = 5


def q_bigram_llr_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K bigram collocations by Dunning's log-likelihood ratio
    (Dunning 1993) — the statistically sound companion to `bigram_pmi`:
    PMI overweights RARE pairs (two words seen once together score
    maximal PMI), LLR weighs the evidence, so frequent-but-dependent
    pairs rank where a lexicographer would put them.  LLR is the G²
    statistic of the 2×2 contingency table (bigram ab vs margins of a·
    and ·b): ``2·Σ k·ln(k·N / (R·C))`` over the four cells.

    Determinism: every cell count and margin is an EXACT integer from
    one bigram count table (margins computed from the unfiltered
    table); each ln argument is a single division of exact-integer
    products (k·N and R·C ≤ N² ≈ 1.6e11 at sf0.1 — exactly
    representable doubles; at corpus scales beyond 9e15 cast the
    products to DECIMAL first), the four ln terms combine in one fixed
    left-associated expression (never a row fold), and the cut orders
    by the ROUNDED score with a lexical tiebreak.

    Scale shape: one bigram explode + count (map-side combined,
    vocabulary²-bounded output), two margin aggregations over the
    count table (vocabulary-bounded, broadcast back), one 1-row N
    broadcast — all joins dimension-sized; TakeOrdered cuts the top-K."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(tokens(F.trim(F.lower(F.col("text")))).alias("t"))
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
        .withColumn("wa", F.split("bigram", " ").getItem(0))
        .withColumn("wb", F.split("bigram", " ").getItem(1))
        # feeds both margins, N, and the scored join
        .localCheckpoint(eager=True)
    )
    row_m = bi.groupBy("wa").agg(F.sum("c_ab").alias("c_a_star"))
    col_m = bi.groupBy("wb").agg(F.sum("c_ab").alias("c_star_b"))
    n_tot = bi.agg(F.sum("c_ab").alias("n_bi"))

    def term(k, r, c):
        kn = k.cast("double") * F.col("n_bi").cast("double")
        rc = r.cast("double") * c.cast("double")
        return F.when(k > 0, k.cast("double") * F.log(kn / rc)).otherwise(
            F.lit(0.0)
        )

    k11 = F.col("c_ab")
    k12 = F.col("c_a_star") - F.col("c_ab")
    k21 = F.col("c_star_b") - F.col("c_ab")
    k22 = F.col("n_bi") - F.col("c_a_star") - F.col("c_star_b") + F.col("c_ab")
    r1, r2 = F.col("c_a_star"), F.col("n_bi") - F.col("c_a_star")
    c1, c2 = F.col("c_star_b"), F.col("n_bi") - F.col("c_star_b")
    llr = F.lit(2.0) * (
        term(k11, r1, c1) + term(k12, r1, c2) + term(k21, r2, c1) + term(k22, r2, c2)
    )
    return (
        bi.filter(F.col("c_ab") >= LLR_MIN_COUNT)
        .join(F.broadcast(row_m), "wa")
        .join(F.broadcast(col_m), "wb")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "bigram",
            F.col("c_ab").cast("long").alias("n_bigram"),
            F.round(llr, 4).alias("llr"),
        )
        .orderBy(F.desc("llr"), "bigram")
        .limit(LLR_TOP_K)
    )


def _llr_sql() -> str:
    def term(k, r, c):
        return (
            f"CASE WHEN {k} > 0 THEN CAST({k} AS DOUBLE) * "
            f"ln((CAST({k} AS DOUBLE) * CAST(n_bi AS DOUBLE)) / "
            f"(CAST({r} AS DOUBLE) * CAST({c} AS DOUBLE))) ELSE 0.0 END"
        )

    k11, k12 = "c_ab", "(c_a_star - c_ab)"
    k21 = "(c_star_b - c_ab)"
    k22 = "(n_bi - c_a_star - c_star_b + c_ab)"
    r1, r2 = "c_a_star", "(n_bi - c_a_star)"
    c1, c2 = "c_star_b", "(n_bi - c_star_b)"
    llr = (
        f"2.0 * ({term(k11, r1, c1)} + {term(k12, r1, c2)} + "
        f"{term(k21, r2, c1)} + {term(k22, r2, c2)})"
    )
    return rf"""
WITH toks AS (
  SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM documents
), bi AS (
  SELECT t[i.i] || ' ' || t[i.i + 1] AS bigram,
         t[i.i] AS wa, t[i.i + 1] AS wb, count(*) AS c_ab
  FROM toks CROSS JOIN LATERAL unnest(range(1, len(t))) AS i(i)
  GROUP BY 1, 2, 3
), row_m AS (
  SELECT wa, sum(c_ab) AS c_a_star FROM bi GROUP BY wa
), col_m AS (
  SELECT wb, sum(c_ab) AS c_star_b FROM bi GROUP BY wb
), n_tot AS (
  SELECT sum(c_ab) AS n_bi FROM bi
)
SELECT bigram,
       CAST(c_ab AS BIGINT) AS n_bigram,
       round({llr}, 4) AS llr
FROM bi JOIN row_m USING (wa) JOIN col_m USING (wb), n_tot
WHERE c_ab >= {LLR_MIN_COUNT}
ORDER BY llr DESC, bigram LIMIT {LLR_TOP_K}
"""


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



# --- Iterative graph analytics: PageRank over warehouse tables -------------

PAGERANK_DAMPING = 0.85
PAGERANK_BASE_NUM = 0.15  # 1 - damping, spelled as ONE literal in both engines
# fixed-point form: damping = 85/100, base = 15/100, ranks scaled by 10^12
# — the whole iteration is exact int64 arithmetic (see the op docstring)
PAGERANK_DAMP_NUM = 85
PAGERANK_DAMP_DEN = 100
PAGERANK_BASE_NUM_INT = 15
PAGERANK_SCALE = 10**12
PAGERANK_ITERS = 3
PAGERANK_TOP = 20
# rank/deg are node-dimension tables; broadcast them only while the
# estimated size (node-id string + double + row overhead ≈ 64 B/node)
# fits comfortably in an executor — past that, drop the hints and let
# AQE plan the shuffle join.  256 MiB ≈ 4M nodes.
PAGERANK_BROADCAST_MAX_BYTES = 256 << 20
PAGERANK_BYTES_PER_NODE = 64


def q_pagerank_supplier_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three synchronous PageRank iterations over the supplier↔part
    bipartite graph induced by lineitem (edge ⟺ the supplier ever
    shipped the part; symmetrized) — the iterative-graph family on
    warehouse tables, Pregel-free: each superstep is one edge⋈rank join
    + one destination-keyed aggregation, the exact shape GraphX/Pregel
    lowers to, expressed directly in DataFrames so Catalyst/AQE plan it.

    Determinism: the whole loop is FIXED-POINT INT64 — ranks are
    integers scaled by 10^12, per-edge contributions are the exact
    integer division ``(prs·85) div (100·deg)`` (damping 0.85 as the
    ratio 85/100), sums and the base re-injection are exact integer
    adds, and only the FINAL projection divides by 10^12 in double
    (both engines convert the same ≤10^12 integer — exact in binary).
    The r10-era float loop rounded each iteration to 12 decimals in
    double, and the r11 exact-compare sweep caught both of its failure
    modes: ``round(double, 12)`` half-ties split between Spark (exact
    BigDecimal) and DuckDB (multiply-by-10^12 in double), and the
    double→DECIMAL(30,12) contribution casts carry the same
    multiply-rounding boundary class (~1 hit per few million casts at
    sf0.1).  Integer arithmetic has no rounding decisions at all —
    bit-exact at any scale by construction; per-edge truncation loses
    ≤10^-12 rank mass, identically on both engines.  The loop lives in
    the driver (the `kmeans_converged` pattern) with each iteration
    eagerly checkpointed — lineage stays O(1), and at scale each
    superstep is one shuffle keyed on dst.

    The node count is a driver-side scalar (catalog-statistic-sized
    model state, like the k-means centroids)."""
    # distinct on the INT key pair first (8-byte shuffle keys), then
    # build node-id strings on the deduped edge set
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_suppkey", "l_partkey")
        .distinct()
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
            F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst"),
        )
    )
    edges = li.union(
        li.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)  # reused every superstep
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = edges.select(F.col("src").alias("node")).distinct().localCheckpoint(
        eager=True
    )
    n_nodes = nodes.count()
    # rank + degree are NODE-dimension tables (entity graphs on a
    # warehouse are supplier/part/customer-sized, not web-sized) —
    # broadcasting both makes the superstep a NARROW pass over the
    # checkpointed edges; only the dst-keyed aggregation shuffles,
    # map-side combined to |nodes| groups.  Measured 10 -> 5 s at
    # sf0.1.  The choice is an actual size threshold on the node count
    # we already hold as a driver scalar: a graph whose rank table
    # outgrows PAGERANK_BROADCAST_MAX_BYTES drops the hints and AQE
    # plans the shuffle join — same values either way (the threshold
    # only picks the physical join strategy).
    node_hint = (
        F.broadcast
        if n_nodes * PAGERANK_BYTES_PER_NODE <= PAGERANK_BROADCAST_MAX_BYTES
        else (lambda df: df)
    )
    base_s = (PAGERANK_BASE_NUM_INT * PAGERANK_SCALE) // (
        PAGERANK_DAMP_DEN * n_nodes
    )
    pr = nodes.select(
        "node", F.lit(PAGERANK_SCALE // n_nodes).cast("long").alias("prs")
    )
    for _ in range(PAGERANK_ITERS):
        contrib = (
            edges.join(node_hint(pr), edges["src"] == pr["node"])
            .join(node_hint(deg), "src")
            .select(
                F.col("dst").alias("node"),
                # exact int64: prs ≤ 10^12, ×85 ≤ 8.5e13 — far from overflow
                F.expr(
                    f"(prs * {PAGERANK_DAMP_NUM}) div ({PAGERANK_DAMP_DEN} * deg)"
                ).alias("c"),
            )
        )
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        pr = (
            nodes.join(sums, "node", "left")
            .select(
                "node",
                (F.lit(base_s) + F.coalesce(F.col("s"), F.lit(0)))
                .cast("long")
                .alias("prs"),
            )
            .localCheckpoint(eager=True)  # O(1) lineage per superstep
        )
    return (
        pr.orderBy(F.desc("prs"), F.asc("node"))
        .limit(PAGERANK_TOP)
        .select(
            "node",
            (F.col("prs").cast("double") / F.lit(float(PAGERANK_SCALE))).alias(
                "pagerank"
            ),
        )
    )


def _pagerank_iter_sql(prev: str, out: str) -> str:
    return f"""
c{out} AS (
  SELECT e.dst AS node,
         ({prev}.prs * {PAGERANK_DAMP_NUM}) // ({PAGERANK_DAMP_DEN} * deg.deg) AS c
  FROM e JOIN {prev} ON {prev}.node = e.src JOIN deg ON deg.src = e.src
), s{out} AS (
  SELECT node, CAST(sum(c) AS BIGINT) AS s FROM c{out} GROUP BY node
), {out} AS (
  SELECT nodes.node,
         ({PAGERANK_BASE_NUM_INT} * {PAGERANK_SCALE})
           // ({PAGERANK_DAMP_DEN} * (SELECT n FROM nn))
           + coalesce(s, 0) AS prs
  FROM nodes LEFT JOIN s{out} USING (node)
)"""


_PAGERANK_SQL = f"""
WITH e0 AS (
  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                  'p' || CAST(l_partkey AS VARCHAR) AS dst
  FROM lineitem
), e AS (
  SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0
), deg AS (
  SELECT src, count(*) AS deg FROM e GROUP BY src
), nodes AS (
  SELECT DISTINCT src AS node FROM e
), nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM nodes
), pr0 AS (
  SELECT node, {PAGERANK_SCALE} // (SELECT n FROM nn) AS prs FROM nodes
),{_pagerank_iter_sql("pr0", "pr1")},{_pagerank_iter_sql("pr1", "pr2")},{_pagerank_iter_sql("pr2", "pr3")}
SELECT node, CAST(prs AS DOUBLE) / {float(PAGERANK_SCALE)} AS pagerank
FROM pr3 ORDER BY prs DESC, node ASC LIMIT {PAGERANK_TOP}
"""




# --- Time-series: closed-form OLS trend + phase seasonality ----------------

SEASON_PERIOD = 7  # weekly phase, computed as day-index mod 7 (calendar-free)


def q_trend_seasonality_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decompose daily order revenue into a linear trend and a
    7-day-phase seasonal profile — the warehouse time-series workload,
    with NO iterative solver and NO driver-side math: the OLS slope and
    intercept come from the closed form
    ``b = (nΣty − ΣtΣy) / (nΣt² − (Σt)²)`` over five scalar aggregates,
    and the seasonal term is the mean residual per ``t mod 7`` phase.

    Determinism: t is an integer day index (datediff from the min date —
    phase = t mod 7 is pure arithmetic, immune to the engines'
    disagreeing dayofweek conventions).  ``o_totalprice`` is DOUBLE in
    the fixture, so every revenue value is quantized to DECIMAL(18,6)
    BEFORE any fold (per-row prices are ~1e5 — far from the 1e12 bound);
    the daily SUM is kept at DECIMAL(28,6) in both engines because a
    (18,6) narrowing overflows at ~1e12/day — plausible at extreme SF —
    where Spark (non-ANSI) silently NULLs while DuckDB raises, a
    silent-divergence class: the daily sums, Σy, and Σty are then exact decimal
    arithmetic in both engines (decimal×int products stay exact), and
    the only doubles are the final closed-form divisions, with
    slope/intercept rounded to 6 before the residual pass so both
    engines subtract identical trend values.  The per-phase residual
    mean likewise quantizes each residual to DECIMAL(30,12) and divides
    the exact sum once, so no order-dependent double fold exists
    anywhere in the query (the failure class behind the r6
    `curriculum_stages` red row).

    Scale shape: one date-keyed hash aggregation (map-side combined),
    one 5-scalar aggregate over the ~thousands-of-days series, one
    broadcast of the 1-row model, and one 7-group aggregation — all
    linear, no window, no collect."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("decimal(28,6)")
            .alias("rev")
        )
    )
    base = daily.crossJoin(
        F.broadcast(daily.agg(F.min("o_orderdate").alias("d0")))
    ).select(
        F.datediff("o_orderdate", "d0").cast("long").alias("t"), "rev"
    ).localCheckpoint(eager=True)  # feeds the fit AND the residual pass
    fit = base.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("t").cast("double").alias("st"),
        F.sum("rev").cast("double").alias("sy"),
        F.sum(F.col("rev") * F.col("t").cast("decimal(10,0)"))
        .cast("double")
        .alias("sty"),
        F.sum(F.col("t") * F.col("t")).cast("double").alias("stt"),
    ).select(
        F.round(
            (F.col("n") * F.col("sty") - F.col("st") * F.col("sy"))
            / (F.col("n") * F.col("stt") - F.col("st") * F.col("st")),
            6,
        ).alias("slope"),
        "n",
        "st",
        "sy",
    )
    fit = fit.select(
        "slope",
        F.round((F.col("sy") - F.col("slope") * F.col("st")) / F.col("n"), 6).alias(
            "intercept"
        ),
    )
    return (
        base.crossJoin(F.broadcast(fit))
        .select(
            (F.col("t") % SEASON_PERIOD).alias("phase"),
            (
                F.col("rev").cast("double")
                - (F.col("intercept") + F.col("slope") * F.col("t"))
            ).alias("resid"),
            "slope",
            "intercept",
        )
        .groupBy("phase", "slope", "intercept")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.round(
                F.sum(F.col("resid").cast("decimal(30,12)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("seasonal"),
        )
        .select("phase", "n_days", "seasonal", "slope", "intercept")
        .orderBy("phase")
    )


_TREND_SEASON_SQL = f"""
WITH daily AS (
  SELECT o_orderdate,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS rev
  FROM orders GROUP BY o_orderdate
), base AS (
  SELECT CAST(date_diff('day', (SELECT min(o_orderdate) FROM daily),
                        o_orderdate) AS BIGINT) AS t,
         rev
  FROM daily
), agg AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(t) AS DOUBLE) AS st,
         CAST(sum(rev) AS DOUBLE) AS sy,
         CAST(sum(rev * CAST(t AS DECIMAL(10,0))) AS DOUBLE) AS sty,
         CAST(sum(t * t) AS DOUBLE) AS stt
  FROM base
), fit0 AS (
  SELECT round((n * sty - st * sy) / (n * stt - st * st), 6) AS slope, n, st, sy
  FROM agg
), fit AS (
  SELECT slope, round((sy - slope * st) / n, 6) AS intercept FROM fit0
)
SELECT CAST(t % {SEASON_PERIOD} AS BIGINT) AS phase,
       CAST(count(*) AS BIGINT) AS n_days,
       round(CAST(sum(CAST(CAST(rev AS DOUBLE) - (intercept + slope * t)
                           AS DECIMAL(30,12))) AS DOUBLE) / count(*),
             4) AS seasonal,
       slope, intercept
FROM base, fit
GROUP BY phase, slope, intercept
ORDER BY phase
"""


COPURCHASE_MIN_ORDERS = 2  # market-basket support threshold for an edge


def q_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the part co-purchase graph — the third graph
    primitive next to PageRank (`pagerank_supplier_part`) and connected
    components (`dedup_clusters`).  Parts are linked when they appear in
    the same order in ≥ ``COPURCHASE_MIN_ORDERS`` distinct orders (the
    market-basket support threshold that turns raw co-occurrence into an
    affinity graph); output is one row: nodes, edges, wedges (open
    2-paths, Σ d·(d−1)/2), triangles, and the global clustering
    coefficient ``3·T / W`` — the graph-health summary a taxonomy /
    recommendation pipeline monitors.

    Triangle enumeration uses the ordered orientation: every edge is
    stored once as (lo, hi); a wedge chains e₁=(a,b)⋈e₂=(b,c) (so
    a<b<c by construction) and closes against e₃=(a,c) — each triangle
    is counted exactly once, no permutation dedup.  At 100 TB scale the
    refinement is degree-ordered orientation (orient each edge toward
    the higher-degree endpoint), which bounds per-vertex wedge fan-out
    by the graph arboricity; id order suffices at fixture scale and
    keeps the oracle exact.

    Scale shape: the (order, part) incidence list is DISTINCT-reduced
    before the per-order pair join; the support threshold collapses the
    pair stream map-side (count ≥ 2) so the surviving edge set is
    orders of magnitude smaller than raw co-occurrence (measured 1.2 M
    raw pairs → 3.6 k edges at sf0.1); the edge set localCheckpoints
    once (it feeds the degree agg and both sides of the wedge join) and
    is broadcast-joined while it fits.  Nothing downstream of the
    support filter is ∝ |lineitem|."""
    inc = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    b = inc.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p2")
    )
    edges = (
        inc.join(b, (inc["l_orderkey"] == b["o"]) & (inc["l_partkey"] < b["p2"]))
        .groupBy(inc["l_partkey"].alias("p1"), "p2")
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= COPURCHASE_MIN_ORDERS)
        .select("p1", "p2")
        # feeds the degree agg + three legs of the triangle join
        .localCheckpoint(eager=True)
    )
    deg = (
        edges.select(F.col("p1").alias("p"))
        .unionAll(edges.select(F.col("p2").alias("p")))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    counts = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum((F.col("d") * (F.col("d") - 1) / 2).cast("long")).alias("n_wedges"),
    )
    e1 = edges.select(F.col("p1").alias("a"), F.col("p2").alias("b"))
    e2 = edges.select(F.col("p1").alias("b"), F.col("p2").alias("c"))
    e3 = edges.select(F.col("p1").alias("a"), F.col("p2").alias("c"))
    tri = (
        e1.join(e2, "b")
        .join(e3, ["a", "c"])
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    n_edges = edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return (
        counts.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.round(
                F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6
            ).alias("global_clustering"),
        )
    )


_TRIANGLES_SQL = f"""
WITH inc AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), e AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2
  FROM inc a JOIN inc b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= {COPURCHASE_MIN_ORDERS}
), deg AS (
  SELECT p, count(*) AS d
  FROM (SELECT p1 AS p FROM e UNION ALL SELECT p2 AS p FROM e)
  GROUP BY p
), tri AS (
  SELECT count(*) AS t
  FROM e e1 JOIN e e2 ON e1.p2 = e2.p1
            JOIN e e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
       (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
       (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
       (SELECT CAST(t AS BIGINT) FROM tri) AS n_triangles,
       (SELECT round(3.0 * t / (SELECT sum(d * (d - 1) // 2) FROM deg), 6)
        FROM tri) AS global_clustering
"""


KCORE_K = 3             # coreness threshold for the judged k-core query
KCORE_MAX_ROUNDS = 60   # Spark fixpoint guard (10 rounds at sf0.01, K=3)
KCORE_ORACLE_ROUNDS = 16  # unrolled SQL peel stages; idempotent past fixpoint


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The support-thresholded part co-purchase edge set, one row per
    undirected edge in (lo, hi) orientation — the shared graph input of
    `copurchase_triangles`, `k_core_decomposition`, and
    `local_clustering_coefficient`.  (Kept textually in sync with the
    inline construction in `q_copurchase_triangles`, which stays
    untouched because it is a driver-adjudicated op.)"""
    inc = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    b = inc.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p2"))
    return (
        inc.join(b, (inc["l_orderkey"] == b["o"]) & (inc["l_partkey"] < b["p2"]))
        .groupBy(inc["l_partkey"].alias("p1"), "p2")
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= COPURCHASE_MIN_ORDERS)
        .select("p1", "p2")
    )


def kcore_peel(edges: DataFrame, k: int, max_rounds: int = KCORE_MAX_ROUNDS) -> DataFrame:
    """Iteratively delete vertices of degree < k (with their edges) until
    none remain; returns the surviving edge set — the maximal k-core.

    Pure-integer fixpoint iteration (determinism-rules preferred class:
    no float fold anywhere, so no quantization ladder is needed).  Each
    round is one degree aggregation plus two anti-joins against the
    sub-threshold vertex set; the edge frame localCheckpoints per round
    so lineage stays O(1) across supersteps (same pattern as
    `q_pagerank_supplier_part`).  At 100 TB the peel runs over the
    support-thresholded edge set — orders of magnitude smaller than the
    raw incidence — and the `bad` side shrinks geometrically after the
    first round, so AQE broadcasts it; rounds are bounded by the
    degeneracy ordering depth (10 at sf0.01), not by |V|."""
    cur = edges.localCheckpoint(eager=True)
    for _ in range(max_rounds):
        deg = (
            cur.select(F.col("p1").alias("p"))
            .unionAll(cur.select(F.col("p2").alias("p")))
            .groupBy("p")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        bad = deg.filter(F.col("d") < k).select("p").localCheckpoint(eager=True)
        if bad.isEmpty():
            return cur
        cur = (
            cur.join(bad.withColumnRenamed("p", "p1"), "p1", "left_anti")
            .join(bad.withColumnRenamed("p", "p2"), "p2", "left_anti")
            .select("p1", "p2")
            .localCheckpoint(eager=True)
        )
    raise RuntimeError(f"k-core peel did not converge in {max_rounds} rounds")


def q_k_core_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal K-core (K = KCORE_K) of the part co-purchase graph: the vertices
    that survive iterative peeling of degree-<K nodes, with their
    within-core degree — the fourth graph primitive (after PageRank,
    connected components, triangles), and the standard dense-subgraph
    filter a recommendation / taxonomy pipeline applies before community
    detection.  The k-core is unique (independent of peel order), so the
    result is deterministic even though the algorithm is iterative.

    Oracle: the peel unrolled as KCORE_ORACLE_ROUNDS chained SQL stages
    (fixpoint is reached in 10 rounds at the adjudicated sf0.01; extra
    stages are idempotent no-ops, asserted by
    tests/test_graph_ops.py::test_kcore_oracle_rounds_margin)."""
    survivors = kcore_peel(_copurchase_edges(spark, sf_dir), KCORE_K)
    return (
        survivors.select(F.col("p1").alias("p"))
        .unionAll(survivors.select(F.col("p2").alias("p")))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("core_degree"))
        .orderBy("p")
    )


def _kcore_sql(k: int = KCORE_K, rounds: int = KCORE_ORACLE_ROUNDS) -> str:
    # Every chained stage is AS MATERIALIZED: each e{i} is referenced ~3×,
    # and DuckDB's default CTE inlining would expand the 16-stage chain to
    # ~3^16 scans of lineitem (observed as EMFILE — millions of file opens).
    stages = [
        f"""e0 AS MATERIALIZED (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2
  FROM inc a JOIN inc b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= {COPURCHASE_MIN_ORDERS})"""
    ]
    for i in range(rounds):
        stages.append(
            f"""d{i} AS MATERIALIZED (
  SELECT p, count(*) AS d
  FROM (SELECT p1 AS p FROM e{i} UNION ALL SELECT p2 FROM e{i}) GROUP BY p),
g{i} AS MATERIALIZED (SELECT p FROM d{i} WHERE d >= {k}),
e{i + 1} AS MATERIALIZED (
  SELECT p1, p2 FROM e{i}
  WHERE p1 IN (SELECT p FROM g{i}) AND p2 IN (SELECT p FROM g{i}))"""
        )
    joined = ",\n".join(stages)
    return f"""
WITH inc AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
{joined}
SELECT p, CAST(count(*) AS BIGINT) AS core_degree
FROM (SELECT p1 AS p FROM e{rounds} UNION ALL SELECT p2 FROM e{rounds})
GROUP BY p
ORDER BY p
"""


KHOP_MAX_DIST = 3  # BFS horizon for the judged reachability query


def q_khop_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-hop BFS over the co-purchase graph from a deterministic seed
    (the minimum part id in the edge set): every vertex within
    KHOP_MAX_DIST hops, with its exact hop distance — the fifth graph
    primitive (after PageRank, connected components, triangles, k-core),
    and the recommendation-radius / blast-radius query a catalog
    pipeline runs around an item.

    Pure-integer frontier expansion: each superstep joins the current
    frontier against the (bidirectional) adjacency, anti-joins the
    visited set, and localCheckpoints — lineage stays O(1), shuffles are
    keyed on vertex id, and per-superstep cost ∝ frontier × avg degree,
    never |V|².  BFS layering is deterministic (a vertex's distance is
    the superstep that first reaches it, independent of visit order).

    Oracle: the expansion unrolled as KHOP_MAX_DIST materialized SQL
    stages (same AS MATERIALIZED requirement as the k-core oracle)."""
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    adj = edges.select(F.col("p1").alias("src"), F.col("p2").alias("dst")).unionAll(
        edges.select(F.col("p2").alias("src"), F.col("p1").alias("dst"))
    )
    seed = edges.agg(
        F.least(F.min("p1"), F.min("p2")).alias("p")
    ).withColumn("dist", F.lit(0).cast("int"))
    dist = seed.localCheckpoint(eager=True)
    frontier = dist.select("p")
    for i in range(1, KHOP_MAX_DIST + 1):
        nxt = (
            frontier.join(adj, frontier["p"] == adj["src"])
            .select(F.col("dst").alias("p"))
            .distinct()
            .join(dist.select("p"), "p", "left_anti")
            .withColumn("dist", F.lit(i).cast("int"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        dist = dist.unionAll(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("p")
    return dist.orderBy("p")


def _khop_sql(max_dist: int = KHOP_MAX_DIST) -> str:
    stages = [
        f"""e AS MATERIALIZED (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2
  FROM inc a JOIN inc b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= {COPURCHASE_MIN_ORDERS}),
adj AS MATERIALIZED (
  SELECT p1 AS src, p2 AS dst FROM e UNION ALL SELECT p2, p1 FROM e),
v0 AS MATERIALIZED (
  SELECT least(min(p1), min(p2)) AS p, 0 AS dist FROM e)"""
    ]
    for i in range(1, max_dist + 1):
        stages.append(
            f"""f{i} AS MATERIALIZED (
  SELECT DISTINCT adj.dst AS p, {i} AS dist
  FROM v{i - 1} JOIN adj ON v{i - 1}.p = adj.src AND v{i - 1}.dist = {i - 1}
  WHERE adj.dst NOT IN (SELECT p FROM v{i - 1})),
v{i} AS MATERIALIZED (
  SELECT p, dist FROM v{i - 1} UNION ALL SELECT p, dist FROM f{i})"""
        )
    joined = ",\n".join(stages)
    return f"""
WITH inc AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
{joined}
SELECT p, CAST(dist AS INT) AS dist FROM v{max_dist} ORDER BY p
"""


def q_local_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex local clustering coefficient of the co-purchase graph:
    lcc(v) = 2·t(v) / (d(v)·(d(v)−1)) — the node-level refinement of
    `copurchase_triangles`' single global figure, and the standard
    ego-density feature for spam/template detection in link graphs
    (boilerplate hubs have high degree and near-zero lcc).

    Triangles are enumerated once in the ordered orientation (a<b<c,
    each triangle exactly one row) and credited to all three corners via
    a 3-way unionAll + count — no per-vertex neighborhood materialization.
    Determinism: degree and triangle counts are pure integers; lcc is a
    single ROUND of a raw double quotient (the tie-portable class per the
    determinism rules — no sum-of-rounded-terms ladder involved).

    Scale shape: everything downstream of the support threshold is on
    the reduced edge set (the triangle census documented 1.2 M raw pairs
    → 3.6 k edges at sf0.1); the wedge join is the same bounded fan-out
    join the triangle census uses."""
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    deg = (
        edges.select(F.col("p1").alias("p"))
        .unionAll(edges.select(F.col("p2").alias("p")))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    e1 = edges.select(F.col("p1").alias("a"), F.col("p2").alias("b"))
    e2 = edges.select(F.col("p1").alias("b"), F.col("p2").alias("c"))
    e3 = edges.select(F.col("p1").alias("a"), F.col("p2").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    tcount = (
        tri.select(F.col("a").alias("p"))
        .unionAll(tri.select(F.col("b").alias("p")))
        .unionAll(tri.select(F.col("c").alias("p")))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    t = F.coalesce(F.col("n_triangles"), F.lit(0))
    return (
        deg.join(tcount, "p", "left")
        .select(
            "p",
            "degree",
            t.cast("long").alias("n_triangles"),
            F.when(
                F.col("degree") >= 2,
                F.round(
                    F.lit(2.0) * t / (F.col("degree") * (F.col("degree") - 1)), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("lcc"),
        )
        .orderBy("p")
    )


_LCC_SQL = f"""
WITH inc AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2
  FROM inc a JOIN inc b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= {COPURCHASE_MIN_ORDERS}
), deg AS (
  SELECT p, count(*) AS degree
  FROM (SELECT p1 AS p FROM e UNION ALL SELECT p2 AS p FROM e) GROUP BY p
), tri AS (
  SELECT e1.p1 AS a, e1.p2 AS b, e2.p2 AS c
  FROM e e1 JOIN e e2 ON e1.p2 = e2.p1
            JOIN e e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2
), t AS (
  SELECT p, count(*) AS n_triangles
  FROM (SELECT a AS p FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
  GROUP BY p
)
SELECT deg.p,
       CAST(degree AS BIGINT) AS degree,
       CAST(coalesce(n_triangles, 0) AS BIGINT) AS n_triangles,
       CASE WHEN degree >= 2
            THEN round(2.0 * coalesce(n_triangles, 0) / (degree * (degree - 1)), 6)
            ELSE 0.0 END AS lcc
FROM deg LEFT JOIN t ON deg.p = t.p
ORDER BY deg.p
"""


ANOM_MAD_CUTOFF = 3.5   # modified z-score threshold (Iglewicz & Hoaglin)
ANOM_MAD_SCALE = 0.6745  # Φ⁻¹(0.75): MAD → σ-consistent scale


def q_revenue_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-residual anomaly detection over the daily revenue series
    — the monitoring composition of `trend_seasonality_decompose` (the
    model) and `robust_outliers_mad` (the detector): fit the closed-form
    OLS trend + 7-phase seasonal profile, then flag days whose residual
    exceeds the modified z-score cutoff ``|0.6745·(r − med)| >
    3.5·MAD`` — the robust rule that keeps the anomalies themselves
    from inflating the spread they are measured against.  Output: one
    row per day with the fitted value, residual, modified z, and the
    flag (11 anomalous days at sf0.001, 3 at sf0.01 — exercised at the
    adjudicated scales).

    Determinism: the same DECIMAL-quantization ladder as the decompose
    op (daily sums DECIMAL(28,6), OLS moments exact) — and, unlike the
    r10 version, the ladder now runs THROUGH the final additions.
    ``slope``/``intercept`` snap to DECIMAL(18,6) and ``seasonal`` to
    DECIMAL(18,4) right after their round (the rounded double is within
    half an ulp of the decimal grid, so the cast lands both engines on
    the same exact decimal); ``slope*t`` is then exact decimal
    multiplication and ``fitted``/``residual`` are exact scale-6 decimal
    sums, quantized to 4 decimals by DECIMAL rounding (half away from
    zero on both engines — probed).  The r10 red row came from doing
    those adds in double: ``round(double, 4)`` at ~1.5e6 magnitude
    resolves half-ties differently between Spark (exact BigDecimal
    HALF_UP) and DuckDB (multiply-by-1e4 in double) — 13/2399 rows off
    in the 4th decimal.  The exact medians/MAD and the z threshold then
    compare rounded values only.

    Scale shape: one date-keyed aggregation over the fact table, then
    everything runs on the ~thousands-of-days series: a 5-scalar fit, a
    7-row seasonal profile (broadcast back), two exact medians over the
    day series, and a narrow flag projection.  At 100 TB the series is
    still only O(days); nothing downstream of the daily agg touches the
    fact table."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("decimal(28,6)")
            .alias("rev")
        )
    )
    base = (
        daily.crossJoin(F.broadcast(daily.agg(F.min("o_orderdate").alias("d0"))))
        .select(
            F.datediff("o_orderdate", "d0").cast("long").alias("t"),
            "o_orderdate",
            "rev",
        )
        .localCheckpoint(eager=True)  # feeds fit, seasonal, and residuals
    )
    fit = (
        base.agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("t").cast("double").alias("st"),
            F.sum("rev").cast("double").alias("sy"),
            F.sum(F.col("rev") * F.col("t").cast("decimal(10,0)"))
            .cast("double")
            .alias("sty"),
            F.sum(F.col("t") * F.col("t")).cast("double").alias("stt"),
        )
        .select(
            # round(..,6) lands within half an ulp of the 6-decimal grid,
            # so the DECIMAL(18,6) cast snaps BOTH engines to the exact
            # grid value — slope/intercept/seasonal are exact decimals
            # from here on, and slope*t is exact decimal multiplication
            # (never a raw double whose 12th-decimal cast could tie-split).
            F.round(
                (F.col("n") * F.col("sty") - F.col("st") * F.col("sy"))
                / (F.col("n") * F.col("stt") - F.col("st") * F.col("st")),
                6,
            )
            .cast("decimal(18,6)")
            .alias("slope"),
            "n",
            "st",
            "sy",
        )
        .select(
            "slope",
            F.round(
                (F.col("sy") - F.col("slope").cast("double") * F.col("st"))
                / F.col("n"),
                6,
            )
            .cast("decimal(18,6)")
            .alias("intercept"),
        )
    )
    trended = base.crossJoin(F.broadcast(fit))
    trend_d = F.col("intercept") + F.col("slope") * F.col("t").cast("decimal(10,0)")
    seas = (
        trended.groupBy((F.col("t") % SEASON_PERIOD).alias("phase"))
        .agg(
            F.round(
                F.sum(
                    (F.col("rev").cast("double") - trend_d.cast("double"))
                    .cast("decimal(30,12)")
                ).cast("double")
                / F.count(F.lit(1)),
                4,
            )
            .cast("decimal(18,4)")
            .alias("seasonal")
        )
    )
    # fitted/residual are now EXACT decimal sums (scale 6): the final
    # round(..,4) is decimal rounding with one well-defined tie rule
    # (half away from zero on both engines — probed), so the r10
    # double-round half-tie class cannot occur.
    fitted_d = trend_d + F.col("seasonal")
    resid = trended.join(
        F.broadcast(seas), (F.col("t") % SEASON_PERIOD) == F.col("phase")
    ).select(
        "t",
        "o_orderdate",
        F.round(F.col("rev"), 2).cast("double").alias("rev"),
        F.round(fitted_d, 4).cast("double").alias("fitted"),
        F.round(F.col("rev") - fitted_d, 4).cast("double").alias("residual"),
    ).localCheckpoint(eager=True)  # feeds med, mad, and the flag pass
    med = resid.agg(F.round(F.median("residual"), 4).alias("med"))
    mad = (
        resid.crossJoin(F.broadcast(med))
        .agg(
            F.round(
                F.median(F.abs(F.col("residual") - F.col("med"))), 4
            ).alias("mad")
        )
    )
    mz = F.when(
        F.col("mad") > 0,
        F.round(
            F.lit(ANOM_MAD_SCALE)
            * (F.col("residual") - F.col("med"))
            / F.col("mad"),
            4,
        ),
    ).otherwise(F.lit(0.0))
    return (
        resid.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(mad))
        .select(
            "t",
            "o_orderdate",
            "rev",
            "fitted",
            "residual",
            mz.alias("mod_z"),
            (F.abs(mz) > F.lit(ANOM_MAD_CUTOFF)).cast("int").alias("is_anomaly"),
        )
        .orderBy("t")
    )


_ANOMALY_SQL = f"""
WITH daily AS (
  SELECT o_orderdate,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS rev
  FROM orders GROUP BY o_orderdate
), base AS (
  SELECT CAST(date_diff('day', (SELECT min(o_orderdate) FROM daily),
                        o_orderdate) AS BIGINT) AS t,
         o_orderdate, rev
  FROM daily
), agg AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(t) AS DOUBLE) AS st,
         CAST(sum(rev) AS DOUBLE) AS sy,
         CAST(sum(rev * CAST(t AS DECIMAL(10,0))) AS DOUBLE) AS sty,
         CAST(sum(t * t) AS DOUBLE) AS stt
  FROM base
), fit0 AS (
  SELECT CAST(round((n * sty - st * sy) / (n * stt - st * st), 6)
              AS DECIMAL(18,6)) AS slope,
         n, st, sy
  FROM agg
), fit AS (
  SELECT slope,
         CAST(round((sy - CAST(slope AS DOUBLE) * st) / n, 6)
              AS DECIMAL(18,6)) AS intercept
  FROM fit0
), seas AS (
  SELECT t % {SEASON_PERIOD} AS phase,
         CAST(round(CAST(sum(CAST(CAST(rev AS DOUBLE)
                                  - CAST(intercept
                                         + slope * CAST(t AS DECIMAL(10,0))
                                         AS DOUBLE)
                             AS DECIMAL(30,12))) AS DOUBLE) / count(*),
               4) AS DECIMAL(18,4)) AS seasonal
  FROM base, fit GROUP BY phase, slope, intercept
), resid AS (
  SELECT t, o_orderdate,
         CAST(round(rev, 2) AS DOUBLE) AS rev,
         CAST(round(intercept + slope * CAST(t AS DECIMAL(10,0)) + seasonal, 4)
              AS DOUBLE) AS fitted,
         CAST(round(rev - (intercept + slope * CAST(t AS DECIMAL(10,0))
                           + seasonal), 4)
              AS DOUBLE) AS residual
  FROM base, fit JOIN seas ON (t % {SEASON_PERIOD}) = seas.phase
), med AS (
  SELECT round(median(residual), 4) AS med FROM resid
), mad AS (
  SELECT round(median(abs(residual - med)), 4) AS mad FROM resid, med
)
SELECT t, o_orderdate, rev, fitted, residual,
       CASE WHEN mad > 0
            THEN round({ANOM_MAD_SCALE} * (residual - med) / mad, 4)
            ELSE 0.0 END AS mod_z,
       CAST(abs(CASE WHEN mad > 0
                     THEN round({ANOM_MAD_SCALE} * (residual - med) / mad, 4)
                     ELSE 0.0 END) > {ANOM_MAD_CUTOFF} AS INT) AS is_anomaly
FROM resid, med, mad
ORDER BY t
"""


QUERIES: dict[str, QuerySpec] = {
    "revenue_anomaly_days": QuerySpec(
        q_revenue_anomaly_days,
        _ANOMALY_SQL,
        "seasonal-residual anomaly days: OLS trend + 7-phase profile, "
        "modified z-score on exact medians/MAD (robust monitor)",
    ),
    "copurchase_triangles": QuerySpec(
        q_copurchase_triangles,
        _TRIANGLES_SQL,
        "triangle census + clustering coefficient of the support-"
        "thresholded part co-purchase graph (ordered orientation)",
    ),
    "k_core_decomposition": QuerySpec(
        q_k_core_decomposition,
        _kcore_sql(),
        "maximal 3-core of the co-purchase graph via iterative integer "
        "peeling (unique fixpoint; oracle = unrolled peel stages)",
    ),
    "local_clustering_coefficient": QuerySpec(
        q_local_clustering_coefficient,
        _LCC_SQL,
        "per-vertex clustering coefficient: ordered-orientation triangle "
        "credit over the co-purchase graph (ego-density feature)",
    ),
    "khop_reachability": QuerySpec(
        q_khop_reachability,
        _khop_sql(),
        "3-hop BFS from the min-id part over the co-purchase graph "
        "(frontier expansion supersteps; unrolled materialized oracle)",
    ),
    "trend_seasonality_decompose": QuerySpec(
        q_trend_seasonality_decompose,
        _TREND_SEASON_SQL,
        "closed-form OLS trend + 7-phase seasonal decomposition of daily "
        "revenue (pure aggregates, no solver)",
    ),
    "pagerank_supplier_part": QuerySpec(
        q_pagerank_supplier_part,
        _PAGERANK_SQL,
        "3-superstep PageRank over the lineitem supplier<->part graph "
        "(iterative graph analytics, checkpointed supersteps)",
    ),
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
    "bigram_llr_collocations": QuerySpec(
        q_bigram_llr_collocations,
        _llr_sql(),
        "top-K bigram collocations by Dunning log-likelihood ratio (G² "
        "over the exact 2×2 contingency — the evidence-weighted PMI fix)",
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
