"""Corpus-pipeline operators, batch 4: packing, mixture planning, LM
quality scoring, prefix dedup.

The last mile between a curated corpus and a training run:

- ``sequence_packing`` — concatenate-and-split packing: lay each
  source's documents end-to-end (ordered by doc_id) and cut the stream
  into fixed token-budget packs.  This is the packing scheme LLM
  pretraining actually uses (concat corpus, split into context-length
  sequences), and unlike bin-packing it is expressible as a pure window
  cumsum — deterministic and oracle-checkable.
- ``mixture_weights`` — temperature-scaled source sampling weights
  (w_i ∝ p_i^α, the multilingual-sampling standard): given per-source
  token mass, compute each source's natural share, α-scaled sampling
  weight, and the implied up/down-sampling factor.
- ``unigram_logprob_quality`` — two-pass LM quality score: fit the
  corpus unigram distribution, then score every document by mean token
  log-probability; docs far below the corpus-typical score are
  rare-token soup (mojibake, hash dumps, wordlists).
- ``prefix_dedup`` — exact-prefix duplicate groups (md5 of the first
  ``PREFIX_TOKENS`` tokens): catches template/boilerplate families and
  truncation-variant duplicates that full-document hashing misses.

Scale notes (100 TB design intent):
- Packing is one shuffle (window partitioned by source, ordered by
  doc_id) followed by a partial-aggregated groupBy on the same key
  prefix; pack membership never materializes token text.
- Mixture weights aggregate to one row per source (~tens of rows); the
  two global normalizers are broadcast scalars, not shuffles.
- Unigram scoring joins exploded tokens to the term-frequency table on
  the term key.  The vocabulary is Zipf-bounded (millions of rows at
  corpus scale, << data scale), so the join side is broadcast; the
  per-doc re-aggregation shuffles on doc_id once.  No smoothing term is
  needed: scores use the same corpus the LM was fit on, so every token
  has count ≥ 1.
- Prefix dedup shuffles md5 digests (16 bytes/doc), not text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Constants FIRST, before any sibling import: `.text` can (transitively)
# pull in `similarity`, whose module-level oracle building reads
# MIXTURE_ALPHA back from this half-initialized module — importing
# packing first (e.g. a standalone tests/test_plans.py run) raised
# ImportError until these moved above the import.
PACK_BUDGET = 256  # tokens per training sequence

PACK_SHARDS = 32  # ordered doc_id-range shards per source (prefix-sum parallelism)

MIXTURE_ALPHA = 0.3  # temperature-scaling exponent (w_i ∝ p_i^0.3)

LOGPROB_FLOOR = -3.5  # mean token log-prob below this ⇒ rare-token soup

from ..catalog import load_table  # noqa: E402
from . import QuerySpec  # noqa: E402
from .text import token_count, tokens  # noqa: E402

PREFIX_TOKENS = 12


def _tokenized(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NO spread here: every consumer shuffles into a keyed aggregation
    # almost immediately (parallelism recovers at the first exchange),
    # and an A/B at sf0.1 measured the extra text-row exchange a net
    # LOSS for this family (bigram_logprob 1.7 -> 2.6 s) — contrast the
    # corpus/curation ops whose heavy narrow stage has no early shuffle
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.trim(F.lower(F.col("text"))))
    return docs.select("doc_id", "source", toks.alias("toks"))


# --- concatenate-and-split sequence packing ---------------------------------

def sharded_start_offsets(base: DataFrame, value_col: str = "n") -> DataFrame:
    """Two-phase per-source running offsets — the scale-safe prefix sum.

    ``Window.partitionBy("source")`` routes each source's ENTIRE token
    stream through one task (parallelism = |sources|, the cumulative-sum
    scale-killer at 100 TB).  Instead:

    0. derive an ORDERED shard id from pure doc_id arithmetic
       (``floor((doc_id - min) * SHARDS / span)`` over the PER-SOURCE
       id range) — deterministic, no sampling, no partition-id capture,
       order-preserving within each source.  Per-source bounds (not
       global) so a source whose ids cluster in a narrow slice of the
       global range still spreads across all PACK_SHARDS shards;
    1. cumulative-sum WITHIN each (source, shard) — parallelism is
       |sources| x PACK_SHARDS;
    2. add each shard's carry-in: per-(source, shard) totals are a tiny
       aggregate (<= |sources| x PACK_SHARDS rows), the carry window is
       partitioned by source over <= PACK_SHARDS rows, and the result
       broadcast-joins back.

    Integer sums are exact, so the offsets are bit-identical to the
    single-window form.  ``base`` must carry (doc_id, source, value_col)
    and should be localCheckpointed by the caller when its lineage is
    expensive (it is read three times: bounds, totals, local cumsum).

    Overflow bound: ``(doc_id - mn) * PACK_SHARDS`` stays in int64 while
    a source's id span is < 2^63/PACK_SHARDS (~2.9e17 at 32 shards);
    beyond that the multiply wraps.  The ``least`` clamp guards the
    double-division rounding edge where an extreme span could otherwise
    yield shard == PACK_SHARDS.
    """
    v = F.col(value_col)
    bounds = base.groupBy("source").agg(
        F.min("doc_id").alias("_mn"), F.max("doc_id").alias("_mx")
    )
    sharded = base.join(F.broadcast(bounds), "source").withColumn(
        "_shard",
        F.least(
            F.floor(
                (F.col("doc_id") - F.col("_mn"))
                * F.lit(PACK_SHARDS)
                / (F.col("_mx") - F.col("_mn") + 1)
            ),
            F.lit(PACK_SHARDS - 1),
        ),
    ).drop("_mn", "_mx")
    w_in = Window.partitionBy("source", "_shard").orderBy("doc_id")
    local = sharded.withColumn(
        "_cum", F.sum(v).over(w_in.rowsBetween(Window.unboundedPreceding, 0))
    )
    # totals re-aggregate the (checkpoint-backed) sharded base — measured
    # FASTER than aggregating the window output, which forces the
    # broadcast branch to recompute the window's sort; the carry window
    # runs over <= PACK_SHARDS rows per source, a bounded stage (a
    # triangular-join variant was measured 0.5 s slower at sf0.1)
    totals = sharded.groupBy("source", "_shard").agg(F.sum(v).alias("_tot"))
    w_carry = (
        Window.partitionBy("source")
        .orderBy("_shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carries = totals.select(
        "source",
        "_shard",
        F.coalesce(F.sum("_tot").over(w_carry), F.lit(0)).alias("_carry"),
    )
    return (
        local.join(F.broadcast(carries), ["source", "_shard"])
        .withColumn("start_offset", F.col("_carry") + F.col("_cum") - v)
        .drop("_shard", "_cum", "_carry")
    )


def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack each source's token stream into PACK_BUDGET-token sequences.

    A document belongs to the pack its first token lands in
    (``floor(start_offset / budget)``) — the concat-and-split rule.
    Offsets come from the two-phase sharded prefix sum
    (``sharded_start_offsets``), so no single task ever sees a whole
    source's stream; the checkpoint pins the narrow (doc_id, source, n)
    projection the three offset phases share."""
    base = (
        _tokenized(spark, sf_dir)
        .select("doc_id", "source", F.size("toks").alias("n"))
        .localCheckpoint(eager=True)
    )
    offsets = sharded_start_offsets(base, "n")
    return (
        offsets.withColumn(
            "pack_id", F.floor(F.col("start_offset") / PACK_BUDGET).cast("long")
        )
        .groupBy("source", "pack_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n").cast("long").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
        )
        .orderBy("source", "pack_id")
    )


def q_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packer audit: per source, how close the concat-and-split packing
    runs to the theoretical minimum — n_packs vs ceil(total/budget), and
    the fill ratio of the budgeted capacity.  The number a pipeline
    watches to catch budget/tokenizer drift silently inflating training
    step counts.  One tiny (|sources|-row) aggregate over the packing
    output; same shuffles as `sequence_packing` itself."""
    packs = q_sequence_packing(spark, sf_dir)
    return (
        packs.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_packs"),
            F.sum("pack_tokens").cast("long").alias("total_tokens"),
            F.sum("n_docs").cast("long").alias("n_docs"),
        )
        .select(
            "source",
            "n_packs",
            "total_tokens",
            "n_docs",
            F.ceil(F.col("total_tokens") / F.lit(PACK_BUDGET)).cast("long").alias("ideal_packs"),
            F.round(
                F.col("total_tokens") / (F.col("n_packs") * F.lit(PACK_BUDGET)), 6
            ).alias("fill_ratio"),
        )
        .orderBy("source")
    )




# --- temperature-scaled mixture weights -------------------------------------

def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling plan: natural token share p_i, α-scaled weight
    w_i = p_i^α / Σ p_j^α, and the up/down-sampling factor w_i / p_i.
    The per-source table is tiny (one row per source); both normalizers
    (total tokens, Σ p^α) are broadcast single-row aggregates."""
    # localCheckpoint the per-source table (one row per source): the two
    # global normalizers below each re-derive their input otherwise, and
    # Spark re-runs the full scan+tokenize chain per reference — measured
    # 8 parquet scans in the un-checkpointed plan vs 1 after.
    counts = (
        _tokenized(spark, sf_dir)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.size("toks")).cast("long").alias("n_tokens"),
        )
        .localCheckpoint(eager=True)
    )
    total = counts.agg(F.sum("n_tokens").cast("double").alias("total_tokens"))
    shared = counts.crossJoin(F.broadcast(total)).withColumn(
        "p", F.col("n_tokens") / F.col("total_tokens")
    ).withColumn("pa", F.pow("p", F.lit(MIXTURE_ALPHA)))
    z = shared.agg(F.sum("pa").alias("z"))
    return (
        shared.crossJoin(F.broadcast(z))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round("p", 6).alias("natural_share"),
            F.round(F.col("pa") / F.col("z"), 6).alias("weight"),
            F.round(F.col("pa") / F.col("z") / F.col("p"), 6).alias("upsample_factor"),
        )
        .orderBy("source")
    )


# --- unigram-LM quality scoring ---------------------------------------------

def q_unigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean token log-probability under the corpus unigram LM; flags docs
    whose (rounded) score falls below LOGPROB_FLOOR.  The flag compares
    the ROUNDED score in both engines, keeping the boolean robust to
    last-ulp float-sum divergence.

    Fold-exactness: each per-token ``ln`` term is quantized to
    DECIMAL(30,12) BEFORE summation (the ``kmeans_converged`` pattern) —
    decimal addition commutes exactly, so the per-doc sum is
    order-independent WITHIN each engine (no task/accumulation-order
    flips); cross-engine divergence is bounded to the 1e-12 quantization
    grid (Spark's Math.log and DuckDB's libm ln can differ by an ulp and
    land on adjacent grid points — far from the 1e-4 rounding edge in
    practice, but not impossible).  The round-6 driver red
    (`curriculum_stages`) was the unquantized form of this: a raw double
    fold whose sf0.01 doc-118 score sat 3.9e-7 from the 0.0001 rounding
    edge."""
    words = _tokenized(spark, sf_dir).select(
        "doc_id", F.explode("toks").alias("w")
    )
    # Zipf-bounded term table: localCheckpoint stops the total-tokens
    # normalizer and the scoring join from each re-running the full
    # corpus scan+explode+count chain (measured 6 scans → 2, the two-pass
    # minimum: one to fit the LM, one to score).
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    total = vocab.agg(F.sum("cnt").cast("double").alias("total"))
    lp = F.log(F.col("cnt") / F.col("total")).cast("decimal(30,12)")
    scored = (
        words.join(F.broadcast(vocab), "w")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(
                F.sum(lp).cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_logprob"),
        )
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "avg_logprob",
        (F.col("avg_logprob") < LOGPROB_FLOOR).alias("is_low_quality"),
    ).orderBy("doc_id")


# --- bigram-LM quality scoring (the CCNet-style perplexity filter tier) ------

BIGRAM_LAMBDA = 0.7        # interpolation weight on the bigram MLE
BIGRAM_UNIGRAM_W = 0.3     # 1-λ spelled out: `1 - 0.7` is 0.30000000000000004
BIGRAM_LOGPROB_FLOOR = -3.5  # rounded mean below this ⇒ flagged


def q_bigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean bigram log-probability under an interpolated corpus bigram LM:
    score(doc) = mean over positions i≥2 of
    ``ln(λ·P(wᵢ|wᵢ₋₁) + (1-λ)·P(wᵢ))`` — the perplexity-filter tier a
    CCNet-style pipeline runs after the unigram gate
    (``unigram_logprob_quality``): rare-token soup passes a unigram LM if
    its tokens are individually common, but its TRANSITIONS are not.
    Docs with fewer than 2 tokens have no bigrams and are excluded (both
    engines).

    Scale shape: bigrams are built JVM-side (transform over an index
    sequence — no self-join); the bigram count table is corpus-derived
    and can be large, so its join stays a plain shuffle join keyed on
    (prev, w) for AQE to plan, while the two unigram joins broadcast
    (Zipf-bounded) and the total is a broadcast scalar.  Fold-exactness:
    each ``ln`` term is quantized to DECIMAL(30,12) before summation
    (the `unigram_logprob_quality` rule); interpolation literals are
    spelled identically in both engines (0.7 / 0.3 — never `1-λ`, which
    is 0.30000000000000004 in binary)."""
    toked = _tokenized(spark, sf_dir).select("doc_id", "toks")
    words = toked.select("doc_id", F.explode("toks").alias("w"))
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)  # feeds total + two scoring joins
    )
    total = vocab.agg(F.sum("cnt").cast("double").alias("total"))
    pairs = F.when(
        F.size("toks") >= 2,
        F.transform(
            F.sequence(F.lit(2), F.size("toks")),
            lambda i: F.struct(
                F.element_at("toks", i - 1).alias("prev"),
                F.element_at("toks", i).alias("w"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,w:string>>"))
    bigrams = toked.select("doc_id", F.explode(pairs).alias("bg")).select(
        "doc_id", F.col("bg.prev").alias("prev"), F.col("bg.w").alias("w")
    )
    # checkpoint: the corpus bigram stream feeds its own count table AND
    # the scoring join; without it the scan+tokenize+explode runs twice
    bigrams = bigrams.localCheckpoint(eager=True)
    bc = bigrams.groupBy("prev", "w").agg(F.count(F.lit(1)).alias("cb"))
    up = vocab.select(F.col("w").alias("prev"), F.col("cnt").alias("cp"))
    uw = vocab.select("w", F.col("cnt").alias("cw"))
    p = F.lit(BIGRAM_LAMBDA) * (
        F.col("cb").cast("double") / F.col("cp")
    ) + F.lit(BIGRAM_UNIGRAM_W) * (F.col("cw").cast("double") / F.col("total"))
    term = F.log(p).cast("decimal(30,12)")
    scored = (
        bigrams.join(bc, ["prev", "w"])
        .join(F.broadcast(up), "prev")
        .join(F.broadcast(uw), "w")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(F.sum(term).cast("double") / F.count(F.lit(1)), 4).alias(
                "avg_logprob"
            ),
        )
    )
    return scored.select(
        "doc_id",
        "n_bigrams",
        "avg_logprob",
        (F.col("avg_logprob") < BIGRAM_LOGPROB_FLOOR).alias("is_low_quality"),
    ).orderBy("doc_id")


_BIGRAM_LM_SQL = rf"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
  FROM documents
), w AS (
  SELECT doc_id, unnest(toks) AS w FROM t
), u AS (
  SELECT w, count(*) AS cnt FROM w GROUP BY w
), tot AS (
  SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM u
), b AS (
  SELECT doc_id, toks[i.i - 1] AS prev, toks[i.i] AS w
  FROM t CROSS JOIN LATERAL unnest(range(2, len(toks) + 1)) AS i(i)
), bc AS (
  SELECT prev, w, count(*) AS cb FROM b GROUP BY prev, w
), s AS (
  SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         round(CAST(sum(CAST(ln({BIGRAM_LAMBDA} * (CAST(bc.cb AS DOUBLE) / up.cnt)
                               + {BIGRAM_UNIGRAM_W} * (CAST(uw.cnt AS DOUBLE)
                                                       / (SELECT total FROM tot)))
                          AS DECIMAL(30,12))) AS DOUBLE) / count(*), 4)
           AS avg_logprob
  FROM b JOIN bc ON bc.prev = b.prev AND bc.w = b.w
  JOIN u up ON up.w = b.prev
  JOIN u uw ON uw.w = b.w
  GROUP BY b.doc_id
)
SELECT doc_id, n_bigrams, avg_logprob,
       avg_logprob < {BIGRAM_LOGPROB_FLOOR} AS is_low_quality
FROM s ORDER BY doc_id
"""


CURRICULUM_STAGES = 4  # easy→hard quartiles by LM quality


CURRICULUM_RANK_PARTITIONS = 16  # range partitions for the two-phase global rank


def q_curriculum_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering: documents ranked easy→hard by their unigram-LM
    quality score and cut into CURRICULUM_STAGES quartile stages, with the
    per-stage doc/token budgets a staged training run consumes first-to-
    last.  Ordering is on the ROUNDED score (ties → doc_id), so both
    engines rank identically.

    Scale shape — exact NTILE without a global window: range-partition on
    the curriculum order, ``row_number`` WITHIN each range partition,
    add each partition's broadcast row-count offset (two-phase global
    rank — no single-partition sort anywhere), then assign stages by the
    NTILE arithmetic (first ``n % k`` stages get ``ceil(n/k)`` rows).
    The checkpoint pins the range partitioner's sampled bounds so the
    offsets job and the rank job see identical partition ids."""
    scored = q_unigram_logprob_quality(spark, sf_dir).select(
        "doc_id", "n_tokens", "avg_logprob"
    )
    order = [F.col("avg_logprob").desc(), F.col("doc_id").asc()]
    part = (
        scored.repartitionByRange(CURRICULUM_RANK_PARTITIONS, *order)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    sizes = part.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    # carry offsets over <= CURRICULUM_RANK_PARTITIONS rows: a triangular
    # self-join (off(p) = sum of counts of earlier partitions) — bounded
    # by config at P^2 rows, and no window at all, so the plan carries no
    # single-partition sort anywhere
    s2 = sizes.select(F.col("_pid").alias("_pid2"), F.col("_n").alias("_n2"))
    offs = (
        sizes.join(s2, F.col("_pid2") < F.col("_pid"), "left")
        .groupBy("_pid")
        .agg(F.coalesce(F.sum("_n2"), F.lit(0)).alias("_off"))
    )
    n_total = part.agg(F.count(F.lit(1)).alias("_n_total"))
    w_local = Window.partitionBy("_pid").orderBy(*order)
    ranked = (
        part.withColumn("_rn", F.row_number().over(w_local))
        .join(F.broadcast(offs), "_pid")
        .crossJoin(F.broadcast(n_total))
        .withColumn("_rank", F.col("_off") + F.col("_rn"))
    )
    k = F.lit(CURRICULUM_STAGES)
    q = F.floor(F.col("_n_total") / k)
    rem = F.col("_n_total") % k
    cut = rem * (q + 1)
    stage = F.when(
        F.col("_rank") <= cut, F.floor((F.col("_rank") - 1) / (q + 1)) + 1
    ).otherwise(rem + F.floor((F.col("_rank") - cut - 1) / q) + 1)
    staged = ranked.withColumn("stage", stage.cast("long"))
    return (
        staged.groupBy("stage")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.round(F.avg("avg_logprob"), 4).alias("mean_score"),
            F.max("avg_logprob").alias("best_score"),
            F.min("avg_logprob").alias("worst_score"),
        )
        .orderBy("stage")
    )


_CURRICULUM_SQL = rf"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
  FROM documents
), w AS (
  SELECT doc_id, unnest(toks) AS w FROM t
), c AS (
  SELECT w, count(*) AS cnt FROM w GROUP BY w
), s AS (
  SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         round(CAST(sum(CAST(ln(CAST(cnt AS DOUBLE) / (SELECT sum(cnt) FROM c))
                             AS DECIMAL(30,12))) AS DOUBLE) / count(*), 4)
           AS avg_logprob
  FROM w JOIN c USING (w) GROUP BY w.doc_id
), staged AS (
  SELECT *, CAST(ntile({CURRICULUM_STAGES})
                 OVER (ORDER BY avg_logprob DESC, doc_id ASC) AS BIGINT) AS stage
  FROM s
)
SELECT stage, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       round(avg(avg_logprob), 4) AS mean_score,
       max(avg_logprob) AS best_score,
       min(avg_logprob) AS worst_score
FROM staged GROUP BY stage ORDER BY stage
"""


# --- exact-prefix duplicate groups ------------------------------------------

def q_prefix_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate groups keyed by md5 of the first PREFIX_TOKENS tokens
    (docs shorter than the prefix are exempt).  Only 16-byte digests
    shuffle; the keeper is the group's min doc_id."""
    prefixes = (
        _tokenized(spark, sf_dir)
        .filter(F.size("toks") >= PREFIX_TOKENS)
        .select(
            "doc_id",
            F.md5(F.array_join(F.slice("toks", 1, PREFIX_TOKENS), " ")).alias(
                "prefix_digest"
            ),
        )
    )
    groups = (
        prefixes.groupBy("prefix_digest")
        .agg(
            F.count(F.lit(1)).cast("long").alias("group_size"),
            F.min("doc_id").alias("keeper"),
        )
        .filter(F.col("group_size") > 1)
    )
    return (
        prefixes.join(groups, "prefix_digest")
        .select(
            "doc_id",
            "prefix_digest",
            "group_size",
            (F.col("doc_id") == F.col("keeper")).alias("is_keeper"),
        )
        .orderBy("doc_id")
    )


_PACKING_SQL = rf"""
WITH t AS (
  SELECT doc_id, source,
         len(regexp_split_to_array(trim(lower(text)), '\s+')) AS n
  FROM documents
), o AS (
  SELECT doc_id, source, n,
         sum(n) OVER (PARTITION BY source ORDER BY doc_id
                      ROWS UNBOUNDED PRECEDING) - n AS start_offset
  FROM t
)
SELECT source, CAST(floor(start_offset / {PACK_BUDGET}) AS BIGINT) AS pack_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS pack_tokens,
       min(doc_id) AS first_doc_id, max(doc_id) AS last_doc_id
FROM o
GROUP BY source, pack_id
ORDER BY source, pack_id
"""


_PACK_EFF_SQL = rf"""
WITH packs AS ({_PACKING_SQL.strip()})
, s AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_packs,
         CAST(sum(pack_tokens) AS BIGINT) AS total_tokens,
         CAST(sum(n_docs) AS BIGINT) AS n_docs
  FROM packs GROUP BY source
)
SELECT source, n_packs, total_tokens, n_docs,
       CAST(ceil(CAST(total_tokens AS DOUBLE) / {PACK_BUDGET}) AS BIGINT) AS ideal_packs,
       round(CAST(total_tokens AS DOUBLE) / (n_packs * {PACK_BUDGET}), 6) AS fill_ratio
FROM s ORDER BY source
"""

_MIXTURE_SQL = rf"""
WITH c AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(regexp_split_to_array(trim(lower(text)), '\s+'))) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY source
), s AS (
  SELECT source, n_docs, n_tokens,
         CAST(n_tokens AS DOUBLE) / (SELECT sum(n_tokens) FROM c) AS p,
         power(CAST(n_tokens AS DOUBLE) / (SELECT sum(n_tokens) FROM c),
               {MIXTURE_ALPHA}) AS pa
  FROM c
)
SELECT source, n_docs, n_tokens,
       round(p, 6) AS natural_share,
       round(pa / (SELECT sum(pa) FROM s), 6) AS weight,
       round(pa / (SELECT sum(pa) FROM s) / p, 6) AS upsample_factor
FROM s ORDER BY source
"""

QUOTA_BUDGET = 100_000  # tokens to allocate across sources


def q_sampling_quota_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer quota allocation — the step after `mixture_weights` that
    real sampling jobs need: fractional temperature weights (w ∝ √tokens,
    i.e. α=0.5) turned into integer per-source token quotas that sum to
    EXACTLY the budget, via the largest-remainder method (floor every
    ideal share, then hand the leftover units to the largest fractional
    remainders).  Apportionment must be exact — a sampler that draws
    Σquota ≠ budget tokens silently breaks downstream packing — so the
    Σ==budget assertion rides in the hashed result.

    Determinism: each weight is sqrt of an exact integer (identical
    doubles both engines); the normalizer sums the weights through the
    DECIMAL(30,12) ladder; each ideal share is one multiply + one divide
    of identical doubles; floor() has no tie semantics; the remainder
    ranking breaks exact-equal remainders on source id.  The per-source
    table is tiny (one row per source) — every aggregate is
    map-side-combined and the ranking window is |sources| rows."""
    counts = (
        _tokenized(spark, sf_dir)
        .groupBy("source")
        .agg(F.sum(F.size("toks")).cast("long").alias("n_tokens"))
        .localCheckpoint(eager=True)
    )
    w = F.sqrt(F.col("n_tokens").cast("double"))
    z = counts.agg(
        F.sum(w.cast("decimal(30,12)")).cast("double").alias("z")
    )
    ideal = (F.lit(float(QUOTA_BUDGET)) * F.col("w")) / F.col("z")
    shares = (
        counts.withColumn("w", w)
        .crossJoin(F.broadcast(z))
        .withColumn("ideal", ideal)
        .withColumn("base", F.floor("ideal").cast("long"))
        .withColumn("rem", F.col("ideal") - F.floor("ideal"))
    )
    deficit = shares.agg(
        (F.lit(QUOTA_BUDGET) - F.sum("base")).cast("long").alias("deficit")
    )
    rank_w = Window.orderBy(F.col("rem").desc(), F.col("source").asc())
    alloc = (
        shares.crossJoin(F.broadcast(deficit))
        .withColumn("rk", F.row_number().over(rank_w))
        .withColumn(
            "quota",
            (F.col("base") + F.when(F.col("rk") <= F.col("deficit"), 1).otherwise(0)).cast(
                "long"
            ),
        )
    )
    total = alloc.agg(F.sum("quota").alias("qsum"))
    return (
        alloc.crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_tokens",
            F.round(F.col("w") / F.col("z"), 6).alias("share"),
            "quota",
            (F.col("qsum") == QUOTA_BUDGET).alias("_sums_to_budget"),
        )
        .orderBy("source")
    )


_QUOTA_SQL = rf"""
WITH c AS (
  SELECT source,
         CAST(sum(len(regexp_split_to_array(trim(lower(text)), '\s+'))) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY source
), s AS (
  SELECT source, n_tokens, sqrt(CAST(n_tokens AS DOUBLE)) AS w,
         CAST((SELECT sum(CAST(sqrt(CAST(n_tokens AS DOUBLE)) AS DECIMAL(30,12))) FROM c)
              AS DOUBLE) AS z
  FROM c
), sh AS (
  SELECT source, n_tokens, w, z,
         ({float(QUOTA_BUDGET)} * w) / z AS ideal
  FROM s
), fl AS (
  SELECT source, n_tokens, w, z, ideal,
         CAST(floor(ideal) AS BIGINT) AS base,
         ideal - floor(ideal) AS rem
  FROM sh
), rk AS (
  SELECT *,
         row_number() OVER (ORDER BY rem DESC, source ASC) AS r,
         (SELECT {QUOTA_BUDGET} - sum(base) FROM fl) AS deficit
  FROM fl
), alloc AS (
  SELECT source, n_tokens, w, z,
         CAST(base + CASE WHEN r <= deficit THEN 1 ELSE 0 END AS BIGINT) AS quota
  FROM rk
)
SELECT source, n_tokens, round(w / z, 6) AS share, quota,
       (SELECT sum(quota) FROM alloc) = {QUOTA_BUDGET} AS _sums_to_budget
FROM alloc ORDER BY source
"""


_LOGPROB_SQL = rf"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
  FROM documents
), w AS (
  SELECT doc_id, unnest(toks) AS w FROM t
), c AS (
  SELECT w, count(*) AS cnt FROM w GROUP BY w
), s AS (
  SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         round(CAST(sum(CAST(ln(CAST(cnt AS DOUBLE) / (SELECT sum(cnt) FROM c))
                             AS DECIMAL(30,12))) AS DOUBLE) / count(*), 4)
           AS avg_logprob
  FROM w JOIN c USING (w) GROUP BY w.doc_id
)
SELECT doc_id, n_tokens, avg_logprob,
       avg_logprob < {LOGPROB_FLOOR} AS is_low_quality
FROM s ORDER BY doc_id
"""

_PREFIX_SQL = rf"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
  FROM documents
), p AS (
  SELECT doc_id,
         md5(array_to_string(toks[1:{PREFIX_TOKENS}], ' ')) AS prefix_digest
  FROM t WHERE len(toks) >= {PREFIX_TOKENS}
), g AS (
  SELECT prefix_digest, CAST(count(*) AS BIGINT) AS group_size,
         min(doc_id) AS keeper
  FROM p GROUP BY prefix_digest HAVING count(*) > 1
)
SELECT p.doc_id, p.prefix_digest, g.group_size,
       p.doc_id = g.keeper AS is_keeper
FROM p JOIN g USING (prefix_digest)
ORDER BY p.doc_id
"""

# --- Length-bucket batching audit -------------------------------------------

# pow-2 ladder sized to the fixture's 10-99-token docs so every path
# (pad-to-bucket AND truncate-at-cap) is exercised; a production ladder
# runs 128..8192 with the same CASE shape.
LENGTH_BUCKETS = (16, 32, 64)  # last entry = truncation cap


def q_length_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding/truncation audit for length-bucketed batching — the
    alternative consumption plan to `sequence_packing`: instead of
    concat-and-split packing, docs batch with same-length peers and pad
    to the bucket boundary (what a dynamic-batching trainer does).
    Per bucket: doc count, raw vs kept tokens, padding waste, truncated
    tokens, and the fill ratio the batching planner compares against
    packing's `packing_efficiency` to choose a consumption strategy.

    All-integer until the single final division; the bucket assignment
    is one branchless CASE ladder (whole-stage codegen), the aggregate
    is map-side combined over ≤ |ladder| groups — shuffle payload is a
    handful of rows regardless of corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    dl = token_count(F.trim(F.col("text")))
    b16, b32, bcap = LENGTH_BUCKETS
    bucket = (
        F.when(dl <= b16, b16).when(dl <= b32, b32).otherwise(bcap).alias("bucket")
    )
    kept = F.least(F.col("dl"), F.col("bucket"))
    return (
        docs.select(bucket, dl.alias("dl"))
        .select("bucket", "dl", kept.alias("kept"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("dl").cast("long").alias("total_tokens"),
            F.sum("kept").cast("long").alias("kept_tokens"),
            (F.first("bucket") * F.count(F.lit(1)) - F.sum("kept"))
            .cast("long")
            .alias("pad_tokens"),
            F.sum(F.greatest(F.col("dl") - F.col("bucket"), F.lit(0)))
            .cast("long")
            .alias("trunc_tokens"),
            F.round(
                F.sum("kept").cast("double")
                / (F.first("bucket") * F.count(F.lit(1))).cast("double"),
                6,
            ).alias("fill_ratio"),
        )
        .orderBy("bucket")
    )


_LB16, _LB32, _LBCAP = LENGTH_BUCKETS
_LENGTH_BUCKET_SQL = rf"""
WITH sized AS (
  SELECT CASE WHEN dl <= {_LB16} THEN {_LB16}
              WHEN dl <= {_LB32} THEN {_LB32}
              ELSE {_LBCAP} END AS bucket,
         dl,
         least(dl, CASE WHEN dl <= {_LB16} THEN {_LB16}
                        WHEN dl <= {_LB32} THEN {_LB32}
                        ELSE {_LBCAP} END) AS kept
  FROM (SELECT len(regexp_split_to_array(trim(text), '\s+')) AS dl FROM documents)
)
SELECT bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(dl) AS BIGINT) AS total_tokens,
       CAST(sum(kept) AS BIGINT) AS kept_tokens,
       CAST(bucket * count(*) - sum(kept) AS BIGINT) AS pad_tokens,
       CAST(sum(greatest(dl - bucket, 0)) AS BIGINT) AS trunc_tokens,
       round(CAST(sum(kept) AS DOUBLE) / CAST(bucket * count(*) AS DOUBLE), 6) AS fill_ratio
FROM sized
GROUP BY bucket
ORDER BY bucket
"""


QUERIES: dict[str, QuerySpec] = {
    "length_bucket_stats": QuerySpec(
        q_length_bucket_stats,
        _LENGTH_BUCKET_SQL,
        "padding/truncation audit for length-bucketed batching (the "
        "dynamic-batching alternative to sequence packing)",
    ),
    "sequence_packing": QuerySpec(
        q_sequence_packing,
        _PACKING_SQL,
        "concat-and-split token packing into fixed training-sequence budgets",
    ),
    "packing_efficiency": QuerySpec(
        q_packing_efficiency,
        _PACK_EFF_SQL,
        "packer audit: fill ratio + packs-vs-ideal per source",
    ),
    "mixture_weights": QuerySpec(
        q_mixture_weights,
        _MIXTURE_SQL,
        "temperature-scaled source sampling weights (w ∝ p^α)",
    ),
    "sampling_quota_allocation": QuerySpec(
        q_sampling_quota_allocation,
        _QUOTA_SQL,
        "largest-remainder integer quotas from sqrt-temperature weights; "
        "exact sum-to-budget assertion hashed",
    ),
    "unigram_logprob_quality": QuerySpec(
        q_unigram_logprob_quality,
        _LOGPROB_SQL,
        "corpus-unigram mean log-prob quality score with low-quality flag",
    ),
    "bigram_logprob_quality": QuerySpec(
        q_bigram_logprob_quality,
        _BIGRAM_LM_SQL,
        "interpolated bigram-LM mean log-prob (CCNet-style perplexity filter tier)",
    ),
    "curriculum_stages": QuerySpec(
        q_curriculum_stages,
        _CURRICULUM_SQL,
        "curriculum quartiles: easy-to-hard staging by unigram-LM quality",
    ),
    "prefix_dedup": QuerySpec(
        q_prefix_dedup,
        _PREFIX_SQL,
        "exact-prefix duplicate groups (md5 of the first N tokens)",
    ),
}
