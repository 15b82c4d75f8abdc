"""Corpus-curation operators — the selection/splitting half of an LLM
training-data pipeline (north star in BASELINE.json; no reference analog —
the reference stops at SQL analytics, /root/reference/app-gradio.py:172-173).

These complement dedup.py/text.py: after cheap quality signals and dedup,
a pipeline still needs deterministic train/test splitting, per-domain
selection of the best documents, corpus statistics, and term weighting.

Scale notes (100 TB design intent):
- The train/test split hashes each row independently (MD5 of the key) —
  no shuffle, no global state, reproducible across engines and reruns;
  exactly how production pipelines split petabyte corpora.
- TF-IDF is two hash aggregations (term frequency per doc, doc frequency
  per term) joined on the term — both shuffles key on the term, so AQE
  coalesces them into one exchange reuse; no driver-side vocabulary.
- Per-source top-k partitions the window by source (high cardinality at
  scale), never globally; the length histogram is a plain map-side-combine
  aggregation — both safe at 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from . import QuerySpec


# --- Deterministic hash-based train/test split.  MD5 is bit-identical in
# every engine, so the assignment is portable and reproducible: first hex
# nibble 0..b → train (12/16 = 75%), c..f → eval. ---------------------------

def q_hash_split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    nibble = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = F.when(nibble < F.lit("c"), "train").otherwise("eval")
    return (
        docs.groupBy(split.alias("split"))
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split")
    )


# --- TF-IDF term weighting: tf per (doc, term) ⋈ df per term, idf =
# ln(N/df); global top-20 weighted terms with deterministic tie-break. ------

def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.agg(F.countDistinct("doc_id").alias("n_docs"))
    words = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("word")
    ).filter(F.col("word") != "")
    # tf has one row per (doc, word), so document frequency is a plain
    # count over tf — deriving df from the checkpointed tf replaces a
    # second full scan+explode+shuffle with one small aggregate.
    tf = (
        words.groupBy("doc_id", "word")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    df = tf.groupBy(F.col("word").alias("w")).agg(F.count("*").alias("df"))
    return (
        tf.join(df, tf.word == df.w)
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "word",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6).alias("tfidf"),
        )
        .orderBy(F.col("tfidf").desc(), F.col("doc_id").asc(), F.col("word").asc())
        .limit(20)
    )


# --- Per-source selection: keep the top-3 documents per source by a cheap
# quality score (alpha ratio), window partitioned by source. ----------------

def q_quality_topk_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    score = F.round(
        F.length(F.regexp_replace(F.col("text"), "[^A-Za-z]", ""))
        / F.length(F.col("text")),
        6,
    )
    w = Window.partitionBy("source").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", "source", score.alias("score"))
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .orderBy("source", "rk")
    )


# --- Corpus statistics: document-length histogram.  Bucketing by
# arithmetic (not ntile) keeps it a pure map-side-combine aggregation —
# no global sort/window, so it scales linearly. -----------------------------

def q_doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.floor(F.col("n_chars") / 200).cast("long")
    return (
        docs.groupBy(bucket.alias("len_bucket"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("len_bucket")
    )


# --- Seeded Bernoulli sampling.  The RNG is engine-specific, so the sampled
# rows themselves can't be oracle-checked — instead the query is
# self-validating: it emits the deterministic corpus size plus a boolean
# asserting the realized sampling fraction sits inside a ~5-sigma binomial
# envelope (|p̂ - 0.1| ≤ 0.01 needs n·0.01 ≳ 5·sqrt(n·p·q), true for the
# fixture sizes), so the oracle is exact.  Determinism across reruns is
# additionally pinned in tests/test_curation.py. -----------------------------

SAMPLE_FRACTION = 0.1


def q_seeded_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    sampled_n = lineitem.sample(fraction=SAMPLE_FRACTION, seed=42).agg(
        F.count("*").alias("n_sampled")
    )
    total_n = lineitem.agg(F.count("*").alias("n_rows"))
    return (
        total_n.crossJoin(F.broadcast(sampled_n))
        .select(
            "n_rows",
            (
                F.abs(F.col("n_sampled") / F.col("n_rows") - F.lit(SAMPLE_FRACTION))
                <= F.lit(0.01)
            ).alias("fraction_ok"),
        )
    )


# --- Sketch percentiles: GK-style bounded-memory quantiles — the form
# usable at 100 TB (exact percentile needs a full sort per group).  The
# sketch value is engine-specific, so the output carries the exact
# interpolated percentiles (deterministic, oracle-checkable) plus booleans
# asserting the sketch landed inside the interpolated [p-0.01, p+0.01]
# band — accuracy 10_000 bounds rank error at 1e-4, well inside. ------------

def q_approx_percentile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("exact_median"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 2).alias("exact_p90"),
            F.percentile_approx("o_totalprice", 0.5, 10_000)
            .between(
                F.expr("percentile(o_totalprice, 0.49)"),
                F.expr("percentile(o_totalprice, 0.51)"),
            )
            .alias("median_sketch_ok"),
            F.percentile_approx("o_totalprice", 0.9, 10_000)
            .between(
                F.expr("percentile(o_totalprice, 0.89)"),
                F.expr("percentile(o_totalprice, 0.91)"),
            )
            .alias("p90_sketch_ok"),
        )
        .orderBy("o_orderpriority")
    )


# --- Stratified sampling: per-stratum Bernoulli fractions (sampleBy) —
# balancing a skewed corpus by down-sampling dominant sources. --------------

# Pipeline config: per-stratum keep fractions over the fixture's sources
# (src0..src19) — cycling down-sample/keep-half/keep-most tiers.
STRATA_FRACTIONS = {f"src{i}": (0.2, 0.5, 0.8)[i % 3] for i in range(20)}


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The strata set is pipeline CONFIG (STRATA_FRACTIONS), not a
    # data-discovery step: sampleBy gets the static dict directly, so the
    # sampled scan is the plan's only job — no extra full scan + driver
    # round-trip to enumerate strata (r01 did a .distinct().collect() here;
    # at 100 TB that's a full pass per invocation).  Rows from unseen strata
    # simply aren't sampled (fraction 0), which is the documented contract.
    #
    # The per-stratum sample is RNG-engine-specific, so the output is
    # self-validating: deterministic per-stratum totals and configured
    # fractions, plus a boolean putting the realized count inside a
    # ~5-sigma binomial envelope (the oracle emits literal true).
    docs = load_table(spark, sf_dir, "documents")
    sampled = (
        docs.sampleBy("source", fractions=STRATA_FRACTIONS, seed=42)
        .groupBy("source")
        .agg(F.count("*").alias("n_sampled"))
    )
    totals = docs.groupBy("source").agg(F.count("*").alias("n_total"))
    frac = F.coalesce(
        *[
            F.when(F.col("source") == s, F.lit(p))
            for s, p in sorted(STRATA_FRACTIONS.items())
        ]
    )
    tol = 5 * F.sqrt(F.col("n_total") * frac * (1 - frac)) + 2
    return (
        totals.join(sampled, "source", "left")
        .select(
            "source",
            "n_total",
            frac.alias("expected_frac"),
            (
                F.abs(F.coalesce(F.col("n_sampled"), F.lit(0)) - frac * F.col("n_total")) <= tol
            ).alias("within_tolerance"),
        )
        .orderBy("source")
    )


# --- Deterministic epoch shuffle plan ---------------------------------------
# Training-order generation: per epoch, every doc gets a portable shuffle
# key (md5 of epoch:doc_id), a bucket (the key's first hex byte — at scale
# the output FILE the doc lands in), and its rank within that bucket (the
# position in the file).  Hash-bucketed global shuffling is how petabyte
# pipelines randomize epoch order without a global sort: the only state is
# the per-(epoch, bucket) window, 256·epochs partitions, evenly loaded.

SHUFFLE_EPOCHS = 2


def q_epoch_shuffle_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    epochs = spark.range(SHUFFLE_EPOCHS).select(F.col("id").cast("long").alias("epoch"))
    keyed = docs.crossJoin(F.broadcast(epochs)).select(
        "epoch",
        "doc_id",
        F.md5(
            F.concat(F.col("epoch").cast("string"), F.lit(":"), F.col("doc_id").cast("string"))
        ).alias("shuffle_key"),
    )
    w = Window.partitionBy("epoch", F.substring("shuffle_key", 1, 2)).orderBy(
        "shuffle_key", "doc_id"
    )
    return keyed.select(
        "epoch",
        F.substring("shuffle_key", 1, 2).alias("bucket"),
        "doc_id",
        F.row_number().over(w).cast("long").alias("pos_in_bucket"),
    )


_EPOCH_SHUFFLE_SQL = f"""
WITH k AS (
  SELECT e.epoch, d.doc_id,
         md5(CAST(e.epoch AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR)) AS shuffle_key
  FROM documents d
  CROSS JOIN (SELECT unnest(range({SHUFFLE_EPOCHS})) AS epoch) e
)
SELECT epoch, substring(shuffle_key, 1, 2) AS bucket, doc_id,
       CAST(row_number() OVER (PARTITION BY epoch, substring(shuffle_key, 1, 2)
                               ORDER BY shuffle_key, doc_id) AS BIGINT) AS pos_in_bucket
FROM k
"""


# --- DSIR-style importance weighting (Xie et al. 2023, "Data Selection
# for Language Models via Importance Resampling") --------------------------

DSIR_BUCKET_HEX = 3  # md5-prefix hashed features: 16^3 = 4096 buckets
DSIR_N_BUCKETS = 16**DSIR_BUCKET_HEX


def q_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-train-doc log importance weight under hashed unigram features:
    ``log w(doc) = Σ_tokens [ln q(b) − ln p(b)]`` where ``b`` is the
    token's hashed feature bucket, ``q`` the add-one-smoothed bucket
    distribution of the TARGET (eval split) and ``p`` of the RAW corpus
    (train split) — the DSIR recipe for selecting pretraining data that
    looks like a target domain.  ``selected`` flags docs whose rounded
    weight is positive (more target-like than corpus-like).

    Scale shape: the feature space is a FIXED 4096 buckets (md5-prefix
    hashing — bit-identical in every engine, the repo's portable-hash
    trick), so the whole model is one ≤4096-row weight table:

    1. one explode + one hash aggregation builds per-bucket train/eval
       counts (map-side combine; ≤4096 groups regardless of corpus
       size); the tiny result is eagerly checkpointed since it feeds
       both the totals and the weight table;
    2. per-bucket weight ``ln q − ln p`` is computed once and quantized
       to DECIMAL(30,12) — token-level sums are then EXACT decimal
       folds, order-independent within each engine (cross-engine
       divergence bounded to the 1e-12 grid, the `unigram_logprob`
       rule);
    3. scoring is the token stream broadcast-joined to the 4096-row
       weight table + one groupBy(doc_id) — no corpus-sized shuffle
       beyond the per-doc aggregation itself.

    No reference analog (north star op; the reference stops at SQL
    analytics, /root/reference/app-gradio.py:172-173)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < F.lit("c"),
            "train",
        )
        .otherwise("eval")
        .alias("split"),
        F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("toks"),
    )
    words = docs.select(
        "doc_id",
        "split",
        F.explode(
            F.transform(F.col("toks"), lambda t: F.substring(F.md5(t), 1, DSIR_BUCKET_HEX))
        ).alias("bucket"),
    )
    counts = (
        words.groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("cp"),
            F.sum(F.when(F.col("split") == "eval", 1).otherwise(0)).alias("cq"),
        )
        .localCheckpoint(eager=True)  # ≤4096 rows; feeds totals + weights
    )
    totals = counts.agg(
        F.sum("cp").cast("double").alias("tp"), F.sum("cq").cast("double").alias("tq")
    )
    smooth = F.lit(float(DSIR_N_BUCKETS))
    wgt = (
        F.log((F.col("cq") + F.lit(1.0)) / (F.col("tq") + smooth))
        - F.log((F.col("cp") + F.lit(1.0)) / (F.col("tp") + smooth))
    ).cast("decimal(30,12)")
    dist = (
        counts.filter(F.col("cp") > 0)
        .crossJoin(F.broadcast(totals))
        .select("bucket", wgt.alias("wgt"))
    )
    scored = (
        words.filter(F.col("split") == "train")
        .join(F.broadcast(dist), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(F.sum("wgt").cast("double"), 4).alias("log_importance"),
        )
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "log_importance",
        (F.col("log_importance") > 0).alias("selected"),
    ).orderBy("doc_id")


_DSIR_SQL = rf"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
              THEN 'train' ELSE 'eval' END AS split,
         regexp_split_to_array(trim(lower(text)), '\s+') AS toks
  FROM documents
), w AS (
  SELECT doc_id, split, substring(md5(t.w), 1, {DSIR_BUCKET_HEX}) AS bucket
  FROM d CROSS JOIN LATERAL unnest(toks) AS t(w)
), c AS (
  SELECT bucket,
         sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS cp,
         sum(CASE WHEN split = 'eval' THEN 1 ELSE 0 END) AS cq
  FROM w GROUP BY bucket
), tot AS (
  SELECT CAST(sum(cp) AS DOUBLE) AS tp, CAST(sum(cq) AS DOUBLE) AS tq FROM c
), dist AS (
  SELECT bucket,
         CAST(ln((cq + 1.0) / (tq + {DSIR_N_BUCKETS}))
              - ln((cp + 1.0) / (tp + {DSIR_N_BUCKETS})) AS DECIMAL(30,12)) AS wgt
  FROM c, tot WHERE cp > 0
), s AS (
  SELECT w.doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         round(CAST(sum(wgt) AS DOUBLE), 4) AS log_importance
  FROM w JOIN dist USING (bucket)
  WHERE w.split = 'train'
  GROUP BY w.doc_id
)
SELECT doc_id, n_tokens, log_importance, log_importance > 0 AS selected
FROM s ORDER BY doc_id
"""


# --- Count-min-sketch heavy hitters (Cormode & Muthukrishnan 2005) ---------

CMS_DEPTH = 4  # independent hash rows; failure prob per key ~ 2^-depth
CMS_BUCKET_HEX = 3  # md5-prefix buckets: width w = 16^3 = 4096
CMS_WIDTH = 16**CMS_BUCKET_HEX
CMS_TOPK = 20


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters with a count-min-sketch estimate audited
    against exact counts: for the top-20 terms, emit the exact count,
    the CMS estimate (min over depth rows of the salted-bucket sums),
    the overcount, and `within_bound` — the CM guarantee
    ``est ≤ exact + 2N/w`` evaluated deterministically (fixed data,
    fixed hashes ⇒ both engines agree bit-for-bit, no probability
    statement left in the result).  CMS never underestimates, which the
    oracle hash-check certifies via ``over_count ≥ 0`` being implied by
    equal values.

    Scale shape: CMS is LINEAR, so the sketch builds from the term-count
    aggregation (map-side combine) instead of re-hashing the raw token
    stream — sum-per-bucket of pre-aggregated counts is bit-identical to
    streaming increments.  Sketch state is a FIXED d×w = 4×4096 table
    regardless of corpus size (the mergeable-sketch property: per-
    partition sketches union by cell-wise sum, exactly what the hash
    aggregation does).  The top-k resolves as TakeOrderedAndProject; the
    estimate lookup broadcasts the 20×d candidate probes into the sketch
    join.  Buckets use the portable md5-prefix hash with a row-salt
    prefix, so the DuckDB oracle replicates the sketch exactly."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term")
    )
    exact = (
        docs.groupBy("term")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .localCheckpoint(eager=True)  # Zipf-bounded; feeds total+top+sketch
    )
    total = exact.agg(F.sum("exact_cnt").cast("double").alias("n"))
    salts = F.array(*[F.lit(r) for r in range(CMS_DEPTH)])

    def bucket(r, term):
        return F.substring(
            F.md5(F.concat(r.cast("string"), F.lit(":"), term)), 1, CMS_BUCKET_HEX
        )

    sketch = (
        exact.select(F.explode(salts).alias("r"), "term", "exact_cnt")
        .groupBy("r", bucket(F.col("r"), F.col("term")).alias("bucket"))
        .agg(F.sum("exact_cnt").alias("c"))
    )
    top = exact.orderBy(F.desc("exact_cnt"), "term").limit(CMS_TOPK)
    probes = top.select(
        "term", "exact_cnt", F.explode(salts).alias("r")
    ).withColumn("bucket", bucket(F.col("r"), F.col("term")))
    est = (
        sketch.join(F.broadcast(probes), ["r", "bucket"])
        .groupBy("term", "exact_cnt")
        .agg(F.min("c").alias("cms_est"))
    )
    return (
        est.crossJoin(F.broadcast(total))
        .select(
            "term",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).alias("over_count"),
            (
                F.col("cms_est")
                <= F.col("exact_cnt") + F.lit(2.0) * F.col("n") / F.lit(CMS_WIDTH)
            ).alias("within_bound"),
        )
        .orderBy(F.desc("exact_cnt"), "term")
    )


_CMS_SQL = rf"""
WITH w AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
  FROM documents
), e AS (
  SELECT term, count(*) AS exact_cnt FROM w GROUP BY term
), tot AS (
  SELECT CAST(sum(exact_cnt) AS DOUBLE) AS n FROM e
), sk AS (
  SELECT r.r,
         substring(md5(CAST(r.r AS VARCHAR) || ':' || term), 1, {CMS_BUCKET_HEX})
           AS bucket,
         sum(exact_cnt) AS c
  FROM e CROSS JOIN (SELECT unnest(range({CMS_DEPTH})) AS r) r
  GROUP BY r.r, bucket
), top AS (
  SELECT term, exact_cnt FROM e ORDER BY exact_cnt DESC, term LIMIT {CMS_TOPK}
), est AS (
  SELECT t.term, t.exact_cnt, min(sk.c) AS cms_est
  FROM top t
  CROSS JOIN (SELECT unnest(range({CMS_DEPTH})) AS r) r
  JOIN sk ON sk.r = r.r
         AND sk.bucket = substring(md5(CAST(r.r AS VARCHAR) || ':' || t.term),
                                   1, {CMS_BUCKET_HEX})
  GROUP BY t.term, t.exact_cnt
)
SELECT term,
       CAST(exact_cnt AS BIGINT) AS exact_cnt,
       CAST(cms_est AS BIGINT) AS cms_est,
       CAST(cms_est - exact_cnt AS BIGINT) AS over_count,
       cms_est <= exact_cnt + 2.0 * (SELECT n FROM tot) / {CMS_WIDTH}
         AS within_bound
FROM est ORDER BY exact_cnt DESC, term
"""




# --- Deterministic weighted sampling (Efraimidis–Spirakis 2006) ------------

ES_SAMPLE_K = 5          # kept per source
ES_HEX_DIGITS = 12       # md5-prefix uniform: 48 bits of mantissa
ES_DENOM = 16**ES_HEX_DIGITS + 1  # u in (0, 1) — never 0 or 1 exactly


def q_weighted_sample_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source weighted sample WITHOUT an RNG: the
    Efraimidis–Spirakis A-ES scheme with hash-derived uniforms — each
    doc gets ``u = (md5₄₈(doc_id) + 1) / (2⁴⁸ + 1)`` and rank key
    ``ln(u)/w`` (monotone to the classic ``u^{1/w}``; ``w = n_chars``),
    and the top-k keys per source are the sample, so selection
    probability scales with the weight but the draw is bit-reproducible
    on any engine, any partitioning, any rerun — the property
    `seeded_sample` (engine RNG) can never give, and the weighted
    complement of `hash_sample_per_source`'s unweighted md5 ranking.

    Scale shape: one narrow projection (md5 + ln per row) and one
    window partitioned by source (high cardinality at scale) with
    WindowGroupLimit pushing rank ≤ k map-side — no global stage.  Keys
    round to 12 decimals with a doc_id tie-break so ordering is
    engine-stable (the 1e-12 grid rule)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    u_int = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, ES_HEX_DIGITS), 16, 10
    ).cast("long")
    key = F.round(
        F.log((u_int + F.lit(1)).cast("double") / F.lit(float(ES_DENOM)))
        / F.col("n_chars"),
        12,
    )
    w = Window.partitionBy("source").orderBy(F.desc("es_key"), F.asc("doc_id"))
    return (
        docs.select("doc_id", "source", "n_chars", key.alias("es_key"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= ES_SAMPLE_K)
        .orderBy("source", "rank")
    )


_ES_HEX_TO_INT = " + ".join(
    f"(strpos('0123456789abcdef', substr(h, {i + 1}, 1)) - 1) * {16**(ES_HEX_DIGITS - 1 - i)}"
    for i in range(ES_HEX_DIGITS)
)

_ES_SAMPLE_SQL = f"""
WITH d AS (
  SELECT doc_id, source, n_chars,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, {ES_HEX_DIGITS}) AS h
  FROM documents
), keyed AS (
  SELECT doc_id, source, n_chars,
         round(ln(CAST(({_ES_HEX_TO_INT}) + 1 AS DOUBLE) / {ES_DENOM}.0)
               / n_chars, 12) AS es_key
  FROM d
), ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY source
                                    ORDER BY es_key DESC, doc_id ASC) AS BIGINT)
              AS rank
  FROM keyed
)
SELECT doc_id, source, n_chars, es_key, rank
FROM ranked WHERE rank <= {ES_SAMPLE_K}
ORDER BY source, rank
"""


# --- In-engine Naive-Bayes classifier: train / apply / evaluate -------------


def q_nb_lang_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes trained, applied, and evaluated in ONE
    declarative plan — the in-engine classifier-training primitive next
    to the clustering family (`kmeans_converged`) and the importance
    reweighter (`dsir_importance_weights`).  The label is the
    marker-word language guess (`q_lang_id` semantics — a REAL learnable
    signal: the markers live in the text, so NB must rediscover them as
    high-likelihood-ratio features); the split is the portable
    md5-nibble 75/25 from `hash_split_train_test`.  Output: the test
    confusion matrix (true × predicted × count) — a wrong smoothing
    term, a dropped class, or an unstable argmax changes the hash.

    Determinism: add-1-smoothed log-likelihoods take ln of identical
    exact-integer ratios in both engines; per-term contributions
    quantize to DECIMAL(30,12) before the per-(doc, class) fold, the
    class prior adds as DECIMAL, and the argmax orders by the EXACT
    decimal score with the class label as total-order tiebreak.

    Scale shape: training is two map-side-combined aggregations over the
    exploded token stream; the model is a |vocab| × |classes| grid —
    vocabulary-bounded, broadcast (the same bounded-model-state pattern
    as `unigram_logprob_quality` / `dsir_importance_weights`); scoring
    is a per-doc term-count aggregate joined against the broadcast
    model, then an L-row-per-doc argmax window.  Nothing is ∝ corpus²;
    the only corpus-scale stages are the explode and its aggregation."""
    from ..functions import spread_small_input
    from .text import tokens, with_lang_guess

    docs = spread_small_input(load_table(spark, sf_dir, "documents"))
    lab = (
        with_lang_guess(
            docs.select("doc_id", tokens(F.lower(F.col("text"))).alias("toks"))
        )
        .withColumnRenamed("lang_guess", "label")
        .withColumn(
            "is_train",
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < F.lit("c"),
        )
        # feeds train counts, priors, and test scoring; tokenize + label once
        .localCheckpoint(eager=True)
    )
    tr = lab.filter("is_train").select("label", F.explode("toks").alias("term"))
    k = (
        tr.groupBy("label", "term")
        .agg(F.count(F.lit(1)).alias("c"))
        # bounded |vocab| x |classes| rows; feeds cls totals, vocab, and
        # the model grid join
        .localCheckpoint(eager=True)
    )
    cls = k.groupBy("label").agg(F.sum("c").alias("n_tok"))
    pri = lab.filter("is_train").groupBy("label").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    nt = lab.filter("is_train").agg(F.count(F.lit(1)).alias("n"))
    vocab = k.select("term").distinct()
    vs = vocab.agg(F.count(F.lit(1)).alias("v"))
    model = (
        cls.crossJoin(vocab)
        .crossJoin(F.broadcast(vs))
        .join(k, ["label", "term"], "left")
        .select(
            "label",
            "term",
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1)).cast("double")
                / (F.col("n_tok") + F.col("v")).cast("double")
            ).alias("ll"),
        )
    )
    defaults = (
        cls.crossJoin(F.broadcast(vs))
        .join(pri, "label")
        .crossJoin(F.broadcast(nt))
        .select(
            "label",
            F.log(
                F.lit(1.0) / (F.col("n_tok") + F.col("v")).cast("double")
            ).alias("dll"),
            F.log(
                F.col("n_docs").cast("double") / F.col("n").cast("double")
            ).alias("lprior"),
        )
    )
    te = (
        lab.filter(~F.col("is_train"))
        .select(
            "doc_id",
            F.col("label").alias("true_label"),
            F.explode("toks").alias("term"),
        )
        .groupBy("doc_id", "true_label", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    scored = (
        te.crossJoin(F.broadcast(defaults))
        .join(F.broadcast(model), ["label", "term"], "left")
        .select(
            "doc_id",
            "true_label",
            "label",
            "lprior",
            (F.col("c") * F.coalesce(F.col("ll"), F.col("dll")))
            .cast("decimal(30,12)")
            .alias("s"),
        )
        .groupBy("doc_id", "true_label", "label", "lprior")
        .agg(F.sum("s").alias("ssum"))
        .select(
            "doc_id",
            "true_label",
            "label",
            (F.col("lprior").cast("decimal(30,12)") + F.col("ssum")).alias("score"),
        )
    )
    wnd = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("label"))
    pred = scored.withColumn("rn", F.row_number().over(wnd)).filter("rn = 1")
    return (
        pred.groupBy("true_label", F.col("label").alias("pred_label"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("true_label", "pred_label")
    )


def _nb_sql() -> str:
    from .text import lang_guess_sql

    guess = lang_guess_sql("toks")
    return rf"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks,
         substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' AS is_train
  FROM documents
), lab AS (
  SELECT doc_id, toks, is_train, {guess} AS label FROM d
), tr AS (
  SELECT label, unnest(toks) AS term FROM lab WHERE is_train
), k AS (
  SELECT label, term, count(*) AS c FROM tr GROUP BY 1, 2
), cls AS (
  SELECT label, sum(c) AS n_tok FROM k GROUP BY 1
), pri AS (
  SELECT label, count(*) AS n_docs FROM lab WHERE is_train GROUP BY 1
), nt AS (
  SELECT count(*) AS n FROM lab WHERE is_train
), vocab AS (
  SELECT DISTINCT term FROM k
), vs AS (
  SELECT count(*) AS v FROM vocab
), model AS (
  SELECT cls.label, vocab.term,
         ln(CAST(coalesce(k.c, 0) + 1 AS DOUBLE)
            / CAST(cls.n_tok + vs.v AS DOUBLE)) AS ll
  FROM cls CROSS JOIN vocab CROSS JOIN vs
  LEFT JOIN k ON k.label = cls.label AND k.term = vocab.term
), defaults AS (
  SELECT cls.label,
         ln(1.0 / CAST(cls.n_tok + vs.v AS DOUBLE)) AS dll,
         ln(CAST(pri.n_docs AS DOUBLE) / CAST(nt.n AS DOUBLE)) AS lprior
  FROM cls CROSS JOIN vs JOIN pri USING (label) CROSS JOIN nt
), te AS (
  SELECT doc_id, true_label, term, count(*) AS c
  FROM (SELECT doc_id, label AS true_label, unnest(toks) AS term
        FROM lab WHERE NOT is_train)
  GROUP BY 1, 2, 3
), scored AS (
  SELECT te.doc_id, te.true_label, d.label,
         CAST(d.lprior AS DECIMAL(30,12))
           + sum(CAST(te.c * coalesce(m.ll, d.dll) AS DECIMAL(30,12))) AS score
  FROM te CROSS JOIN defaults d
  LEFT JOIN model m ON m.label = d.label AND m.term = te.term
  GROUP BY te.doc_id, te.true_label, d.label, d.lprior
), pred AS (
  SELECT doc_id, true_label, label AS pred_label
  FROM scored
  QUALIFY row_number() OVER (PARTITION BY doc_id
                             ORDER BY score DESC, label ASC) = 1
)
SELECT true_label, pred_label, CAST(count(*) AS BIGINT) AS n_docs
FROM pred GROUP BY 1, 2 ORDER BY 1, 2
"""


# --- N-gram novelty curve -----------------------------------------------------

NOVELTY_SHINGLE_N = 3  # word shingles (the dedup-family granularity)


def q_ngram_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY in arrival order (doc_id as the
    ingest sequence): the fraction of a doc's distinct 3-gram shingles
    never seen in ANY earlier document.  The marginal-information curve
    a data-curation loop reads before buying more of a source — a
    crawler re-hitting the same content produces late docs with novelty
    → 0, while fresh material holds the curve up; it is the streaming
    counterpart of `vocab_coverage` (which measures the aggregate, not
    the per-arrival marginal).

    Determinism: novelty attribution is ``min(doc_id)`` per gram — an
    exact integer argmin, no ordering hazard; the ratio rounds to 6.
    Grams shuffle as 8-byte xxhash64 digests (the `dup_span_coverage`
    convention and its documented collision asymmetry vs the
    raw-string oracle).

    Scale shape: gram explode → per-gram min(doc_id) (map-side
    combined — first-seen state is ONE bigint per distinct gram, the
    same inverted-file cardinality every dedup op here already
    shuffles) → digest-keyed join back → per-doc count.  Linear, no
    window, no collect; incremental refresh composes with the CDC scan
    exactly like `incremental_dedup_index`."""
    from .text import tokens

    n = NOVELTY_SHINGLE_N
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", tokens(F.trim(F.lower(F.col("text")))).alias("t")
    )
    idx = F.sequence(F.lit(1), F.size("t") - (n - 1))
    gram_hashes = F.when(
        F.size("t") >= n,
        F.array_distinct(
            F.transform(
                idx, lambda i: F.xxhash64(F.array_join(F.slice("t", i, n), " "))
            )
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    grams = docs.select(
        "doc_id", "source", F.explode(gram_hashes).alias("gh")
    ).localCheckpoint(eager=True)  # feeds first-seen AND the per-doc count
    first_seen = grams.groupBy("gh").agg(F.min("doc_id").alias("first_doc"))
    return (
        grams.join(first_seen, "gh")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("long")).alias(
                "n_novel"
            ),
        )
        .select(
            "doc_id",
            "source",
            "n_grams",
            "n_novel",
            F.round(F.col("n_novel") / F.col("n_grams"), 6).alias("novelty"),
        )
        .orderBy("doc_id")
    )


_NOVELTY_SQL = rf"""
WITH t AS (
  SELECT doc_id, source,
         regexp_split_to_array(trim(lower(text)), '\s+') AS toks
  FROM documents
), grams AS (
  SELECT DISTINCT doc_id, source,
         array_to_string(toks[i.i:i.i + {NOVELTY_SHINGLE_N - 1}], ' ') AS g
  FROM t CROSS JOIN LATERAL
       unnest(range(1, len(toks) - {NOVELTY_SHINGLE_N - 1} + 1)) AS i(i)
), first_seen AS (
  SELECT g, min(doc_id) AS first_doc FROM grams GROUP BY g
)
SELECT doc_id, source,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CAST(first_doc = doc_id AS BIGINT)) AS BIGINT) AS n_novel,
       round(CAST(sum(CAST(first_doc = doc_id AS BIGINT)) AS DOUBLE)
             / count(*), 6) AS novelty
FROM grams JOIN first_seen USING (g)
GROUP BY doc_id, source
ORDER BY doc_id
"""


# --- k-anonymity audit --------------------------------------------------------

KANON_K = 5          # minimum safe group size
KANON_BAL_BUCKET = 1000  # quasi-identifier granularity on the balance axis


def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the customer dimension — the privacy
    pre-release check a data-sharing pipeline runs before publishing a
    "de-identified" extract: group by the quasi-identifier tuple
    (nation, market segment, coarse balance bucket) and flag every
    group smaller than k=5, whose members a linker could re-identify by
    joining public attributes.  Output: one row per occupied QI cell
    with its size and the below-k flag, plus deterministic ordering —
    the table a privacy reviewer reads top-down after sorting by size.

    Determinism: pure integer arithmetic (floor-bucketed balance, exact
    counts); no floats anywhere.

    Scale shape: ONE map-side-combined aggregation keyed by the QI
    tuple — the same cost as any GROUP BY; cells are bounded by the QI
    domain product (25 nations × 5 segments × ~12 buckets), so the
    audit table is catalog-sized at any corpus scale."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy(
            F.col("c_nationkey").cast("long").alias("nationkey"),
            F.col("c_mktsegment").alias("segment"),
            F.floor(F.col("c_acctbal") / KANON_BAL_BUCKET)
            .cast("long")
            .alias("bal_bucket"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("group_size"))
        .select(
            "nationkey",
            "segment",
            "bal_bucket",
            "group_size",
            (F.col("group_size") < KANON_K).cast("int").alias("below_k"),
        )
        .orderBy("nationkey", "segment", "bal_bucket")
    )


_KANON_SQL = f"""
SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
       c_mktsegment AS segment,
       CAST(floor(c_acctbal / {KANON_BAL_BUCKET}) AS BIGINT) AS bal_bucket,
       CAST(count(*) AS BIGINT) AS group_size,
       CAST(count(*) < {KANON_K} AS INT) AS below_k
FROM customer
GROUP BY 1, 2, 3
ORDER BY nationkey, segment, bal_bucket
"""


QUERIES: dict[str, QuerySpec] = {
    "k_anonymity_audit": QuerySpec(
        q_k_anonymity_audit,
        _KANON_SQL,
        "k-anonymity pre-release audit: QI-tuple group sizes with "
        "below-k re-identification flags (pure integer plan)",
    ),
    "ngram_novelty_curve": QuerySpec(
        q_ngram_novelty_curve,
        _NOVELTY_SQL,
        "per-doc marginal n-gram novelty in arrival order (min-doc-id "
        "first-seen attribution) — the curation buy-more signal",
    ),
    "nb_lang_classifier": QuerySpec(
        q_nb_lang_classifier,
        _nb_sql(),
        "multinomial Naive Bayes trained + applied + evaluated in one "
        "plan (bounded broadcast model grid, exact-decimal argmax)",
    ),
    "cms_heavy_hitters": QuerySpec(
        q_cms_heavy_hitters,
        _CMS_SQL,
        "count-min-sketch heavy hitters audited against exact counts "
        "(fixed 4x4096 mergeable sketch state)",
    ),
    "dsir_importance_weights": QuerySpec(
        q_dsir_importance_weights,
        _DSIR_SQL,
        "DSIR hashed-ngram importance weights (target-vs-raw LM ratio, "
        "4096-bucket broadcast model)",
    ),
    "epoch_shuffle_plan": QuerySpec(
        q_epoch_shuffle_plan,
        _EPOCH_SHUFFLE_SQL,
        "deterministic hash-bucketed epoch shuffle order (training-order generation)",
    ),
    "hash_split_train_test": QuerySpec(
        q_hash_split_train_test,
        """
        SELECT CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
                    THEN 'train' ELSE 'eval' END AS split,
               count(*) AS n_docs,
               round(avg(n_chars), 4) AS avg_chars,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY split ORDER BY split
        """,
        "deterministic MD5-hash train/test split (portable, shuffle-free)",
    ),
    "tfidf_top_terms": QuerySpec(
        q_tfidf_top_terms,
        """
        WITH words AS (
          SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
          FROM documents
        ), w AS (SELECT doc_id, word FROM words WHERE word <> ''),
        tf AS (SELECT doc_id, word, count(*) AS tf FROM w GROUP BY doc_id, word),
        df AS (SELECT word, count(DISTINCT doc_id) AS df FROM w GROUP BY word),
        n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
        SELECT tf.doc_id, tf.word, round(tf.tf * ln(n.n_docs / df.df), 6) AS tfidf
        FROM tf JOIN df ON tf.word = df.word CROSS JOIN n
        ORDER BY tfidf DESC, tf.doc_id ASC, tf.word ASC LIMIT 20
        """,
        "TF-IDF term weighting, top-20 weighted (doc, term) pairs",
    ),
    "quality_topk_per_source": QuerySpec(
        q_quality_topk_per_source,
        """
        SELECT doc_id, source, score, rk FROM (
          SELECT doc_id, source,
                 round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                       / length(text), 6) AS score,
                 CAST(row_number() OVER (PARTITION BY source
                      ORDER BY round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                               / length(text), 6) DESC, doc_id ASC) AS BIGINT) AS rk
          FROM documents
        ) WHERE rk <= 3 ORDER BY source, rk
        """,
        "per-source top-k document selection by quality score",
    ),
    "doc_length_histogram": QuerySpec(
        q_doc_length_histogram,
        """
        SELECT CAST(floor(n_chars / 200) AS BIGINT) AS len_bucket,
               count(*) AS n_docs,
               CAST(min(n_chars) AS BIGINT) AS min_chars,
               CAST(max(n_chars) AS BIGINT) AS max_chars
        FROM documents GROUP BY len_bucket ORDER BY len_bucket
        """,
        "corpus length histogram (map-side-combine, no global sort)",
    ),
    "weighted_sample_es": QuerySpec(
        q_weighted_sample_es,
        _ES_SAMPLE_SQL,
        "RNG-free Efraimidis-Spirakis weighted per-source sample "
        "(hash-derived uniforms, bit-reproducible)",
    ),
    "seeded_sample": QuerySpec(
        q_seeded_sample,
        "SELECT count(*) AS n_rows, true AS fraction_ok FROM lineitem",
        "seeded sampling, self-validated against a binomial envelope",
    ),
    "approx_percentile_sketch": QuerySpec(
        q_approx_percentile_sketch,
        """
        SELECT o_orderpriority,
               round(quantile_cont(o_totalprice, 0.5), 2) AS exact_median,
               round(quantile_cont(o_totalprice, 0.9), 2) AS exact_p90,
               true AS median_sketch_ok,
               true AS p90_sketch_ok
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "bounded-memory quantile sketch, self-validated against exact percentiles",
    ),
    "stratified_sample": QuerySpec(
        q_stratified_sample,
        "SELECT source, count(*) AS n_total, "
        + "CAST(CASE source "
        + " ".join(f"WHEN '{s}' THEN {p}" for s, p in sorted(STRATA_FRACTIONS.items()))
        + " END AS DOUBLE) AS expected_frac, true AS within_tolerance "
        + "FROM documents GROUP BY source ORDER BY source",
        "per-stratum sampling fractions, self-validated (binomial envelope)",
    ),
}
