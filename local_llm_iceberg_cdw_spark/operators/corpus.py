"""Corpus-pipeline operators, round 2 — the remaining ops a production
LLM-training-data pipeline runs between raw ingest and a training manifest
(north star in BASELINE.json; no reference analog — the reference stops at
SQL analytics, /root/reference/app-gradio.py:172-173).

Complements text.py (per-doc signals), dedup.py (duplicate removal) and
curation.py (splitting/selection) with:

- PII redaction (regexp scrub with counts — the compliance pass);
- train/eval decontamination (n-gram overlap between splits — the
  benchmark-leakage guard every eval pipeline needs);
- tokenizer statistics (token-length histogram, per-source vocabulary);
- bigram statistics (collocation counts);
- deterministic per-source sampling (MD5-ordered top-k — portable,
  RNG-free, exactly reproducible on any engine);
- retention cohorts over the events table (the activity analysis shape);
- an end-to-end training manifest composing dedup-keep + quality gate +
  split assignment + embedding join.

Scale notes (100 TB design intent):
- Everything is built-in functions — zero Python in any hot path.
- The decontamination join keys on the raw gram string for oracle
  exactness; the drop-in bandwidth optimization at scale is hashing the
  gram to a 64-bit key (same note as dedup.repeated_ngrams).
- Histograms/vocab stats are plain hash aggregations (map-side combine);
  the manifest is one fact-fact join on doc_id=vec_id plus broadcastable
  per-fingerprint keepers; cohorts shuffle once on user_id then once on
  the (cohort, week) pair — all integer arithmetic, no float folds.
"""

from __future__ import annotations

# module-level: pandas_udf resolves stringified type hints in MODULE
# globals (the bench.py warm-up note), so `pd` must live here
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions import spread_small_input
from . import QuerySpec
from .similarity import _norm, _sql_dot
from .text import fingerprint, tokens

# --- PII redaction ----------------------------------------------------------
# The fixture corpus carries no natural PII, so (like multimodal.py's media
# synthesis) deterministic PII is appended per doc and then scrubbed — the
# regex machinery is exercised end-to-end with nonzero counts and the oracle
# mirrors the synthesis exactly.

EMAIL_RE = r"[A-Za-z0-9._]+@[A-Za-z0-9.-]+"
PHONE_RE = r"\+1-555-[0-9]{4}"


def _with_pii(text, doc_id):
    return F.concat(
        text,
        F.lit(" contact user"),
        doc_id.cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((doc_id % 10_000).cast("string"), 4, "0"),
    )


def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: the regexp scrub is the heavy narrow stage (no-op at scale)
    docs = spread_small_input(load_table(spark, sf_dir, "documents"))
    dirty = _with_pii(F.col("text"), F.col("doc_id"))
    no_email = F.regexp_replace(dirty, EMAIL_RE, "[EMAIL]")
    clean = F.regexp_replace(no_email, PHONE_RE, "[PHONE]")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(dirty, F.lit(EMAIL_RE), 0)).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(dirty, F.lit(PHONE_RE), 0)).cast("long").alias("n_phones"),
        F.length(clean).alias("clean_len"),
        F.md5(clean).alias("clean_hash"),
    )


_PII_SQL = rf"""
WITH dirty AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or +1-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS d
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(d, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(d, '{PHONE_RE}')) AS BIGINT) AS n_phones,
       CAST(length(regexp_replace(regexp_replace(d, '{EMAIL_RE}', '[EMAIL]', 'g'),
                                  '{PHONE_RE}', '[PHONE]', 'g')) AS INT) AS clean_len,
       md5(regexp_replace(regexp_replace(d, '{EMAIL_RE}', '[EMAIL]', 'g'),
                          '{PHONE_RE}', '[PHONE]', 'g')) AS clean_hash
FROM dirty
"""


# --- Train/eval decontamination ---------------------------------------------

DECONTAM_NGRAM_N = 8

# MD5-nibble split shared with curation.hash_split_train_test: first hex
# nibble 0..b → train (75%), c..f → eval.  Portable and order-independent.


def _split_expr(doc_id):
    return F.when(
        F.substring(F.md5(doc_id.cast("string")), 1, 1) < F.lit("c"), "train"
    ).otherwise("eval")


def _gram_array(text, n: int):
    toks = F.split(F.lower(text), " ")
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.when(
        F.size(toks) >= n,
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " ")),
    ).otherwise(F.array().cast("array<string>"))


def q_decontamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-leakage guard: for every eval-split document, count its
    distinct word 8-grams that also occur anywhere in the train split.

    One gram-keyed equi-join (train grams are distinct-reduced first, so
    the shuffle is bounded by the distinct-gram count), then a per-doc
    aggregate.  `contaminated` docs are what a real pipeline quarantines
    before reporting eval numbers.

    The join/distinct key is ``xxhash64(gram)``, not the raw ~50-byte
    gram string — at 100 TB the raw-string shuffle key is several× the
    corpus size, while the 8-byte hash keeps shuffle volume bounded by
    row count.  A 64-bit collision merging two distinct grams is
    vanishingly rare (birthday bound ~n²/2⁶⁵) and the standard trade in
    production decontamination; the output schema carries no hashes, so
    the oracle's exact-string computation verifies it end to end."""
    # spread: gram construction is the heavy narrow stage (no-op at scale)
    docs = spread_small_input(load_table(spark, sf_dir, "documents")).select(
        "doc_id", _split_expr(F.col("doc_id")).alias("split"), "text"
    )
    grams = docs.select(
        "doc_id", "split", F.explode(_gram_array(F.col("text"), DECONTAM_NGRAM_N)).alias("gram")
    ).select("doc_id", "split", F.xxhash64("gram").alias("gh"))
    train_grams = grams.filter(F.col("split") == "train").select("gh").distinct()
    # localCheckpoint: eval grams feed both the contamination semi-join
    # and the per-doc totals; the eval split is the small fraction of the
    # corpus, so materializing it beats re-running explode+distinct.
    eval_grams = (
        grams.filter(F.col("split") == "eval")
        .select("doc_id", "gh")
        .distinct()
        .localCheckpoint(eager=True)
    )
    hits = (
        eval_grams.join(train_grams, "gh", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated"))
    )
    per_doc = eval_grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    return (
        docs.filter(F.col("split") == "eval")
        .select("doc_id")
        .join(per_doc, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_grams"), F.lit(0).cast("long")).alias("n_grams"),
            F.coalesce(F.col("n_contaminated"), F.lit(0).cast("long")).alias("n_contaminated"),
            (F.coalesce(F.col("n_contaminated"), F.lit(0)) > 0).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


_DECONTAM_SQL = f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
              THEN 'train' ELSE 'eval' END AS split,
         string_split(lower(text), ' ') AS t
  FROM documents
), g AS (
  SELECT doc_id, split,
         array_to_string(t[i.i:i.i + {DECONTAM_NGRAM_N - 1}], ' ') AS gram
  FROM d CROSS JOIN LATERAL unnest(range(1, len(t) - {DECONTAM_NGRAM_N - 1} + 1)) AS i(i)
), tg AS (SELECT DISTINCT gram FROM g WHERE split = 'train'),
eg AS (SELECT DISTINCT doc_id, gram FROM g WHERE split = 'eval'),
per AS (SELECT doc_id, count(*) AS n_grams,
               count(*) FILTER (WHERE gram IN (SELECT gram FROM tg)) AS n_contaminated
        FROM eg GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(per.n_grams, 0) AS n_grams,
       coalesce(per.n_contaminated, 0) AS n_contaminated,
       coalesce(per.n_contaminated, 0) > 0 AS contaminated
FROM d LEFT JOIN per ON d.doc_id = per.doc_id
WHERE d.split = 'eval'
ORDER BY d.doc_id
"""


# --- Tokenizer statistics ---------------------------------------------------

def q_token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide token-length distribution — the cheap sanity check on a
    tokenizer's input (explode → one hash aggregation, map-side combined)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokens(F.lower(F.col("text")))).alias("tok"))
    return (
        tok.groupBy(F.length("tok").cast("long").alias("token_len"))
        .agg(
            F.count("*").alias("n_tokens"),
            F.countDistinct("tok").alias("n_distinct_tokens"),
        )
        .orderBy("token_len")
    )


_TOKEN_LEN_SQL = r"""
WITH t AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
  FROM documents
)
SELECT CAST(length(tok) AS BIGINT) AS token_len,
       count(*) AS n_tokens,
       count(DISTINCT tok) AS n_distinct_tokens
FROM t GROUP BY 1 ORDER BY token_len
"""


def q_bigram_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 word bigrams (collocations) with document frequency —
    the 2-gram complement of repeated_ngrams' cross-doc 8-grams."""
    docs = spread_small_input(load_table(spark, sf_dir, "documents"))
    bg = docs.select(
        "doc_id", F.explode(_gram_array(F.col("text"), 2)).alias("bigram")
    )
    return (
        bg.groupBy("bigram")
        .agg(F.count("*").alias("n"), F.countDistinct("doc_id").alias("df"))
        .orderBy(F.col("n").desc(), F.col("bigram").asc())
        .limit(20)
    )


_BIGRAM_SQL = """
WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
b AS (
  SELECT doc_id, t[i.i] || ' ' || t[i.i + 1] AS bigram
  FROM d CROSS JOIN LATERAL unnest(range(1, len(t))) AS i(i)
)
SELECT bigram, count(*) AS n, count(DISTINCT doc_id) AS df
FROM b GROUP BY bigram ORDER BY n DESC, bigram ASC LIMIT 20
"""


def q_vocab_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary: token occurrences, distinct types, and the
    type/token ratio (exact-integer division → deterministic double)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(tokens(F.lower(F.col("text")))).alias("tok"))
    return (
        tok.groupBy("source")
        .agg(
            F.count("*").alias("n_tokens"),
            F.countDistinct("tok").alias("n_types"),
        )
        .select(
            "source",
            "n_tokens",
            "n_types",
            F.round(F.col("n_types") / F.col("n_tokens"), 6).alias("type_token_ratio"),
        )
        .orderBy("source")
    )


_VOCAB_SQL = r"""
WITH t AS (
  SELECT source, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
  FROM documents
), per AS (
  SELECT source, count(*) AS n_tokens, count(DISTINCT tok) AS n_types
  FROM t GROUP BY source
)
SELECT source, n_tokens, n_types,
       round(CAST(n_types AS DOUBLE) / n_tokens, 6) AS type_token_ratio
FROM per ORDER BY source
"""


# --- Deterministic per-source sampling --------------------------------------

HASH_SAMPLE_K = 5


def q_hash_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RNG-free stratified sampling: the first K docs per source in MD5
    order.  Bit-identical on every engine/run/partitioning (contrast
    seeded_sample, whose Bernoulli draw is engine-specific) — the
    reproducible-subset primitive for eval-set construction."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("source", "doc_id", F.row_number().over(w).cast("long").alias("rk"))
        .filter(F.col("rk") <= HASH_SAMPLE_K)
        .orderBy("source", "rk")
    )


_HASH_SAMPLE_SQL = f"""
SELECT source, doc_id, rk FROM (
  SELECT source, doc_id,
         CAST(row_number() OVER (PARTITION BY source
              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
  FROM documents
) WHERE rk <= {HASH_SAMPLE_K} ORDER BY source, rk
"""


# --- Retention cohorts over events ------------------------------------------

def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort × activity-week retention matrix (long form): users grouped
    by first-seen week, counted in each subsequent activity week.

    Two shuffles (per-user min, then the cohort/week aggregate); the
    corpus-epoch anchor is a 1-row broadcast.  Pure integer date
    arithmetic (day-diff // 7), no engine week-boundary semantics."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    # localCheckpoint the per-user firsts (user-bounded, far below event
    # volume); the epoch anchor derives from it (min-of-mins) instead of
    # its own full events scan — events is read once for the agg and once
    # for the join, the two-pass minimum.
    first = (
        events.groupBy("user_id")
        .agg(F.min("d").alias("first_d"))
        .localCheckpoint(eager=True)
    )
    epoch = first.agg(F.min("first_d").alias("epoch_d"))
    return (
        events.join(first, "user_id")
        .crossJoin(F.broadcast(epoch))
        .groupBy(
            F.floor(F.datediff(F.col("first_d"), F.col("epoch_d")) / 7)
            .cast("long")
            .alias("cohort_week"),
            F.floor(F.datediff(F.col("d"), F.col("first_d")) / 7)
            .cast("long")
            .alias("weeks_since"),
        )
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
        .orderBy("cohort_week", "weeks_since")
    )


_COHORT_SQL = """
WITH e AS (SELECT user_id, CAST(make_timestamp(epoch_ns(ts) // 1000) AS DATE) AS d
           FROM events),
f AS (SELECT user_id, min(d) AS first_d FROM e GROUP BY user_id),
ep AS (SELECT min(d) AS epoch_d FROM e)
SELECT CAST(floor(datediff('day', ep.epoch_d, f.first_d) / 7) AS BIGINT) AS cohort_week,
       CAST(floor(datediff('day', f.first_d, e.d) / 7) AS BIGINT) AS weeks_since,
       count(DISTINCT e.user_id) AS n_users,
       count(*) AS n_events
FROM e JOIN f ON e.user_id = f.user_id CROSS JOIN ep
GROUP BY 1, 2 ORDER BY cohort_week, weeks_since
"""


# --- End-to-end training manifest -------------------------------------------

MANIFEST_MIN_TOKENS = 20


def q_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed pipeline output: exact-dedup keepers, quality-gated
    (≥ MANIFEST_MIN_TOKENS tokens), split-assigned, joined with their
    embedding (doc_id = vec_id) — the manifest a trainer consumes.

    Shape at 100 TB: the fingerprint-keeper aggregate shuffles once on the
    fingerprint; the embeddings join shuffles once on the id; quality and
    split are narrow.  Per-row L2 norm uses the same fixed-fold dot
    product as similarity.py (bit-identical to the oracle)."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    keepers = (
        docs.select("doc_id", fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"))
        .select(F.col("keep_id").alias("doc_id"))
    )
    gated = (
        docs.join(keepers, "doc_id", "left_semi")
        .filter(F.size(tokens(F.col("text"))) >= MANIFEST_MIN_TOKENS)
        .select(
            "doc_id",
            "source",
            "lang",
            _split_expr(F.col("doc_id")).alias("split"),
            F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
        )
    )
    return (
        gated.join(emb, gated.doc_id == emb.vec_id)
        .select(
            "doc_id",
            "source",
            "lang",
            "split",
            "n_tokens",
            F.col("label").cast("long").alias("label"),
            F.round(_norm(F.col("embedding")), 6).alias("emb_norm"),
        )
        .orderBy("doc_id")
    )


_MANIFEST_SQL = rf"""
WITH keep AS (
  SELECT min(doc_id) AS doc_id
  FROM (SELECT doc_id, md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
        FROM documents)
  GROUP BY fp
), gated AS (
  SELECT d.doc_id, d.source, d.lang,
         CASE WHEN substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 1) < 'c'
              THEN 'train' ELSE 'eval' END AS split,
         CAST(len(regexp_split_to_array(trim(d.text), '\s+')) AS BIGINT) AS n_tokens
  FROM documents d
  WHERE d.doc_id IN (SELECT doc_id FROM keep)
    AND len(regexp_split_to_array(trim(d.text), '\s+')) >= {MANIFEST_MIN_TOKENS}
)
SELECT g.doc_id, g.source, g.lang, g.split, g.n_tokens,
       CAST(e.label AS BIGINT) AS label,
       round(sqrt({_sql_dot('e.embedding', 'e.embedding')}), 6) AS emb_norm
FROM gated g JOIN embeddings e ON g.doc_id = e.vec_id
ORDER BY g.doc_id
"""


# --- Bloom-accelerated decontamination ---------------------------------------

BLOOM_BITS_PER_KEY = 16  # m/n ≈ 16 → fp ≈ 4e-4 at k=8
BLOOM_NUM_HASHES = 8


def _build_bloom(hashes: list[int], bits_per_key: int = BLOOM_BITS_PER_KEY):
    """Bitset + size for a Bloom filter over 64-bit gram hashes.
    Kirsch-Mitzenmacher double hashing: the k probe positions derive from
    the one xxhash64 value as ``(h + i*h2) mod m`` with ``h2`` odd, so
    build and probe need no extra hash passes."""
    import numpy as np

    n = max(1, len(hashes))
    m = 1 << max(10, (n * bits_per_key - 1).bit_length())  # power-of-two bits
    bits = np.zeros(m // 8, dtype=np.uint8)
    if hashes:
        h = np.asarray(hashes, dtype=np.int64).astype(np.uint64)
        h2 = (h >> np.uint64(33)) | np.uint64(1)
        for i in range(BLOOM_NUM_HASHES):
            idx = ((h + np.uint64(i) * h2) % np.uint64(m)).astype(np.int64)
            np.bitwise_or.at(bits, idx >> 3, (np.uint8(1) << (idx & 7).astype(np.uint8)))
    return bits, m


def _bloom_probe_udf(spark: SparkSession, bits, m: int):
    """Arrow-vectorized membership test: per doc, TRUE iff ANY of its gram
    hashes has all k Bloom bits set.  The bitset ships as a REAL
    ``sparkContext.broadcast`` variable — once per executor over the
    torrent channel — not by closure capture, which would re-serialize
    the m/8-byte array into every task binary (harmless at the fixture's
    few MB, wasteful at a real eval suite's GB scale).  The closure holds
    only the broadcast handle; ``tests/test_plans.py`` pins the pickled
    closure at <64 KiB against a multi-hundred-KB bitset."""
    import numpy as np

    from pyspark.sql import types as T

    bc = spark.sparkContext.broadcast(bits)

    @F.pandas_udf(T.BooleanType())
    def probe(hash_arrays: pd.Series) -> pd.Series:
        bits = bc.value
        # flatten the whole Arrow batch into ONE vector pass: all docs'
        # hashes concatenated, k probes computed batch-wide, then a
        # segmented any() per doc via maximum.reduceat — no per-row
        # Python loop (measured ~4x on the sf0.1 probe stage)
        lens = np.fromiter(
            (0 if hs is None else len(hs) for hs in hash_arrays),
            dtype=np.int64,
            count=len(hash_arrays),
        )
        if lens.sum() == 0:
            return pd.Series(np.zeros(len(hash_arrays), dtype=bool))
        flat = np.concatenate(
            [np.asarray(hs, dtype=np.int64) for hs in hash_arrays if hs is not None and len(hs)]
        ).astype(np.uint64)
        h2 = (flat >> np.uint64(33)) | np.uint64(1)
        alive = np.ones(len(flat), dtype=bool)
        for j in range(BLOOM_NUM_HASHES):
            idx = ((flat + np.uint64(j) * h2) % np.uint64(m)).astype(np.int64)
            alive &= ((bits[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1).astype(bool)
            if not alive.any():
                break
        out = np.zeros(len(hash_arrays), dtype=bool)
        nz = lens > 0
        if alive.any():
            starts = np.zeros(int(nz.sum()), dtype=np.int64)
            np.cumsum(lens[nz][:-1], out=starts[1:])
            out[nz] = np.maximum.reduceat(alive, starts) if len(starts) else False
        return pd.Series(out)

    return probe


def q_bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quarantine audit of the TRAIN split (the pipeline
    direction of `decontamination_check`): a train doc is quarantined when
    it shares any word 8-gram with the eval split.

    Scale shape — the Bloom-prune-then-verify pattern that makes
    decontaminating 100 TB tractable:

    1. the EVAL gram-hash set is small by construction (benchmarks are
       thousands of docs), so it becomes driver-side model state: a Bloom
       filter (k=8, 16 bits/key → fp ≈ 4e-4);
    2. the corpus-sized train side is probed in ONE NARROW Arrow stage —
       no explode, no shuffle: each doc's gram-hash array tests locally
       against the bitset;
    3. only the Bloom-flagged docs (true matches + the tiny fp fraction)
       re-explode into the exact hash semi-join, so the verify shuffle is
       ∝ flagged docs, not the corpus.

    Bloom filters have NO false negatives, so prune+verify provably
    equals the full exact join — the DuckDB oracle recomputes the counts
    with plain exact SQL and the hash match certifies the accelerated
    path end-to-end (no self-validation booleans needed).  The gram key
    is xxhash64, the `decontamination_check` collision trade."""
    # spread: the probe is the compute-heavy narrow stage — a single-split
    # toy fixture would otherwise run it on ONE task (no-op at scale)
    docs = spread_small_input(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", "source", _split_expr(F.col("doc_id")).alias("split"), "text"
        )
    )
    gh_arr = F.transform(
        _gram_array(F.col("text"), DECONTAM_NGRAM_N), lambda g: F.xxhash64(g)
    )
    eval_gh = (
        docs.filter(F.col("split") == "eval")
        .select(F.explode(gh_arr).alias("gh"))
        .distinct()
        .localCheckpoint(eager=True)  # feeds the driver build AND the verify join
    )
    bits, m = _build_bloom([r.gh for r in eval_gh.collect()])
    probe = _bloom_probe_udf(spark, bits, m)

    train = docs.filter(F.col("split") == "train")
    # probe ONCE, checkpoint only the flagged doc_ids (state ∝ flagged
    # docs — the Bloom prune makes this tiny); without the checkpoint
    # every consumer would re-run the probe (and the gram pipeline
    # feeding it) over the whole train split — measured 1.5 s of the
    # op's 4 s at sf0.1
    flagged_ids = (
        train.select("doc_id", probe(gh_arr).alias("_bloom_hit"))
        .filter(F.col("_bloom_hit"))
        .select("doc_id")
        .localCheckpoint(eager=True)
    )
    # exact verification: gram re-compute + explode confined to the
    # flagged superset via a broadcast semi-join (falls back to a
    # shuffle join under AQE if the flagged set ever outgrows broadcast)
    contaminated = (
        train.join(F.broadcast(flagged_ids), "doc_id", "left_semi")
        .select("doc_id", F.explode(gh_arr).alias("gh"))
        .join(eval_gh, "gh", "left_semi")
        .select("doc_id")
        .distinct()
    )
    return (
        train.select("doc_id", "source")
        .join(contaminated.withColumn("_q", F.lit(True)), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.sum(F.coalesce(F.col("_q"), F.lit(False)).cast("long")).alias(
                "n_quarantined"
            ),
        )
        .select(
            "source",
            "n_train",
            "n_quarantined",
            (F.col("n_train") - F.col("n_quarantined")).alias("n_clean"),
        )
        .orderBy("source")
    )


_BLOOM_DECONTAM_SQL = f"""
WITH d AS (
  SELECT doc_id, source,
         CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
              THEN 'train' ELSE 'eval' END AS split,
         string_split(lower(text), ' ') AS t
  FROM documents
), g AS (
  SELECT doc_id, split,
         array_to_string(t[i.i:i.i + {DECONTAM_NGRAM_N - 1}], ' ') AS gram
  FROM d CROSS JOIN LATERAL unnest(range(1, len(t) - {DECONTAM_NGRAM_N - 1} + 1)) AS i(i)
), eg AS (SELECT DISTINCT gram FROM g WHERE split = 'eval'),
contam AS (
  SELECT DISTINCT doc_id FROM g
  WHERE split = 'train' AND gram IN (SELECT gram FROM eg)
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_train,
       CAST(count(*) FILTER (WHERE doc_id IN (SELECT doc_id FROM contam)) AS BIGINT)
         AS n_quarantined,
       CAST(count(*) FILTER (WHERE doc_id NOT IN (SELECT doc_id FROM contam)) AS BIGINT)
         AS n_clean
FROM d WHERE split = 'train'
GROUP BY source ORDER BY source
"""


QUERIES: dict[str, QuerySpec] = {
    "pii_redaction": QuerySpec(
        q_pii_redaction, _PII_SQL, "regexp PII scrub with counts (compliance pass)"
    ),
    "bloom_decontamination": QuerySpec(
        q_bloom_decontamination,
        _BLOOM_DECONTAM_SQL,
        "Bloom-prune-then-verify train-split decontamination (exact result, "
        "corpus probed in one narrow pass)",
    ),
    "decontamination_check": QuerySpec(
        q_decontamination_check,
        _DECONTAM_SQL,
        "train/eval n-gram decontamination (benchmark-leakage guard)",
    ),
    "token_length_histogram": QuerySpec(
        q_token_length_histogram, _TOKEN_LEN_SQL, "token-length distribution"
    ),
    "bigram_top_terms": QuerySpec(
        q_bigram_top_terms, _BIGRAM_SQL, "top bigram collocations with document frequency"
    ),
    "vocab_stats_by_source": QuerySpec(
        q_vocab_stats_by_source, _VOCAB_SQL, "per-source vocabulary / type-token ratio"
    ),
    "hash_sample_per_source": QuerySpec(
        q_hash_sample_per_source,
        _HASH_SAMPLE_SQL,
        "deterministic MD5-ordered per-source sample (RNG-free)",
    ),
    "retention_cohorts": QuerySpec(
        q_retention_cohorts, _COHORT_SQL, "cohort × week retention matrix over events"
    ),
    "training_manifest": QuerySpec(
        q_training_manifest,
        _MANIFEST_SQL,
        "end-to-end manifest: dedup-keep + quality gate + split + embedding join",
    ),
}
