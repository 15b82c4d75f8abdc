"""Corpus-pipeline operators, batch 3: chunking, dedup clustering, vocab
coverage.

Three operators a production training-data pipeline needs between raw
documents and a training manifest:

- ``doc_chunking`` — sliding-window token chunks (size 32, stride 24),
  the unit of work for tokenizer/packing stages.
- ``dedup_clusters`` — connected components over the near-duplicate
  graph, turning pairwise dedup signals into canonical-document clusters
  (pairs alone can't answer "keep one per group" when duplicates chain
  A~B~C without A~C).
- ``vocab_coverage`` — Zipf head coverage: what fraction of all tokens
  the top-K terms account for.

Scale notes (100 TB design intent):
- Chunking is embarrassingly parallel: tokenize → ``sequence`` →
  ``posexplode`` → ``slice``, zero shuffle, zero UDF; output rows carry
  an md5 digest instead of chunk text so the result stays narrow.
- The dedup graph caps fingerprint-bucket fan-out (hashes shared by
  > ``CLUSTER_BUCKET_CAP`` docs are dropped as boilerplate/common
  passages — the same guard production dedup applies to degenerate
  shingles).
- Connected components is BIPARTITE min-label propagation over the raw
  (doc, hash) pairs — the doc-doc clique edges are never materialized
  (a size-c bucket would contribute c·(c−1) of them vs c pairs here).
  Each round is two joins + two aggregations over the pair list; one
  round advances labels exactly one doc-graph hop, so iterations are
  bounded by component diameter, and the driver only ever sees a
  convergence counter (never the labels).  ``localCheckpoint`` per
  round truncates lineage (see the in-function note).
- Vocab coverage aggregates term counts distributed (one shuffle), then
  ranks only the top ``max(COVERAGE_RANKS)`` terms (TakeOrdered — tiny),
  so the final cumulative window runs over a bounded head, not the full
  vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions import bind, let, spread_small_input
from . import QuerySpec
from .text import WINNOW_K, WINNOW_W, tokens

CHUNK_SIZE = 32
CHUNK_STRIDE = 24

CLUSTER_BUCKET_CAP = 50  # drop fingerprint hashes shared by more docs
CC_MAX_ITERATIONS = 20

COVERAGE_RANKS = (5, 10, 20)


# --- sliding-window token chunking ------------------------------------------

def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token chunks: chunk i covers tokens
    [i·stride + 1, i·stride + size]; chunks exist while i·stride < n_tokens
    (so every token lands in ≥ 1 chunk and a doc yields ≥ 1 chunk).
    Pure narrow ops — tokenize, sequence, posexplode, slice — no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.trim(F.lower(F.col("text"))))
    base = docs.select("doc_id", toks.alias("toks"), F.size(toks).alias("n"))
    chunks = base.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.ceil(F.col("n") / F.lit(CHUNK_STRIDE)).cast("int") - 1)
        ).alias("chunk_id"),
        "toks",
    )
    chunk_toks = F.slice(F.col("toks"), F.col("chunk_id") * CHUNK_STRIDE + 1, CHUNK_SIZE)
    return chunks.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(chunk_toks).cast("long").alias("n_chunk_tokens"),
        F.md5(F.array_join(chunk_toks, " ")).alias("chunk_digest"),
    ).orderBy("doc_id", "chunk_id")


# --- near-duplicate clusters via connected components -----------------------

def _winnow_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, h) pairs: the doc's distinct winnowing fingerprint hashes.
    Mirrors text.q_winnowing_fingerprint's pipeline (same K/W constants),
    including its measured plan hygiene: ``spread_small_input`` so a
    single-split fixture file doesn't serialize the md5 pipeline onto one
    task, and ``let``/``bind`` so CollapseProject can't inline the shingle
    pipeline into each downstream reference."""
    empty = F.array().cast("array<string>")

    def hashes_of(tk):
        n = F.size(tk)
        return F.when(
            n >= WINNOW_K + WINNOW_W - 1,
            F.transform(
                F.sequence(F.lit(1), n - (WINNOW_K - 1)),
                lambda i: F.md5(
                    F.concat_ws(" ", *[F.element_at(tk, i + j) for j in range(WINNOW_K)])
                ),
            ),
        ).otherwise(empty)

    def minima_of(h):
        m = F.size(h)
        return F.array_distinct(
            F.when(
                m >= WINNOW_W,
                F.transform(
                    F.sequence(F.lit(1), m - (WINNOW_W - 1)),
                    lambda j: F.array_min(F.slice(h, j, WINNOW_W)),
                ),
            ).otherwise(empty)
        )

    base = spread_small_input(docs.select("doc_id", F.lower(F.col("text")).alias("lt")))
    fp = let(tokens(F.col("lt")), lambda tk: let(hashes_of(tk), minima_of))
    return bind(base, fp, "fp").select("doc_id", F.explode("fp").alias("h"))


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the shared-winnowing-fingerprint graph.

    Pairwise near-dup signals chain (A~B, B~C but not A~C); cluster
    formation needs the transitive closure.  Bipartite min-label
    propagation: labels start as each doc's min doc_id over its buckets,
    then alternate hash-side min / doc-side min until no label changes.
    The driver loop carries only an iteration counter and a changed-row
    count — labels never leave the executors."""
    docs = load_table(spark, sf_dir, "documents")
    fps = _winnow_fingerprints(docs)

    good = (
        fps.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter((F.col("n_docs") >= 2) & (F.col("n_docs") <= CLUSTER_BUCKET_CAP))
        .select("h")
    )
    # Bipartite (doc ↔ hash) label propagation — never materialize the
    # doc-doc clique edges.  A bucket of size c contributes c (doc, h)
    # pairs here vs c·(c−1) doc-graph edges, so per-round volume is
    # O(docs · fingerprints-per-doc) instead of O(Σ c²).  One round
    # (doc → hash-min → doc) is exactly one doc-graph hop, so the
    # iteration count is unchanged.
    # ``localCheckpoint`` (executor-side, never a driver collect) both
    # pins the pair list for the loop's repeated reads AND truncates
    # logical lineage — with plain persist the logical plan still doubles
    # every round and Catalyst re-analysis blows up (measured: iterations
    # 1.8 s → 57 s by round 6; checkpointed they hold flat).
    capped = fps.join(good, "h").localCheckpoint(eager=True)
    # Round 0 for free: each doc's label starts as the min doc_id over
    # every bucket it belongs to (collapses each clique immediately).
    h_min0 = capped.groupBy("h").agg(F.min("doc_id").alias("h_label"))
    labels = (
        capped.join(h_min0, "h")
        .groupBy(F.col("doc_id").alias("node"))
        .agg(F.min("h_label").alias("label"))
        .localCheckpoint(eager=True)
    )

    # Convergence via a label-sum signature instead of a new-vs-old join:
    # labels are monotonically non-increasing per node (min-propagation),
    # so ANY change strictly decreases sum(label) — equal consecutive sums
    # ⇔ a fixed point.  That turns the per-round driver sync from a
    # shuffle-join + count into a single scalar aggregate over the frame
    # the round just checkpointed anyway (the r4 bench regression was
    # exactly this extra per-round job).  decimal(38,0) keeps the sum
    # exact for arbitrary 64-bit doc_ids at any corpus size.
    def _sig(lbl: DataFrame) -> int:
        return lbl.agg(F.sum(F.col("label").cast("decimal(38,0)"))).first()[0]

    prev_sig = _sig(labels)
    for _ in range(CC_MAX_ITERATIONS):
        h_min = (
            capped.join(labels, capped.doc_id == labels.node)
            .groupBy("h")
            .agg(F.min("label").alias("h_label"))
        )
        labels = (
            capped.join(h_min, "h")
            .groupBy(F.col("doc_id").alias("node"))
            .agg(F.min("h_label").alias("label"))
            .localCheckpoint(eager=True)
        )
        sig = _sig(labels)
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected components did not converge in {CC_MAX_ITERATIONS} iterations"
        )

    size_w = Window.partitionBy("cluster_id")
    return (
        labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))
        .withColumn("cluster_size", F.count(F.lit(1)).over(size_w).cast("long"))
        .withColumn("is_canonical", F.col("doc_id") == F.col("cluster_id"))
        .orderBy("doc_id")
    )


# --- cross-source near-duplicate matrix --------------------------------------

def q_cross_source_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus forensics: for every ordered source pair (a < b), how many
    shared winnowing-fingerprint hashes their documents have in common —
    the mirroring/scraping matrix a pipeline consults to decide which
    source to keep when corpora overlap (near-dup tier: shared passages,
    not just byte-identical docs).

    Shape at scale: the corpus shuffles once keyed by the fingerprint
    hash; the same 2..CLUSTER_BUCKET_CAP frequency guard as
    ``dedup_clusters`` drops boilerplate hashes, so the per-hash source
    sets (and the pair expansion over them) are bounded; the final matrix
    is |sources|² at most."""
    docs = load_table(spark, sf_dir, "documents")
    fps = _winnow_fingerprints(docs)
    good = (
        fps.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter((F.col("n_docs") >= 2) & (F.col("n_docs") <= CLUSTER_BUCKET_CAP))
        .select("h")
    )
    # doc_id→source is the full doc universe: no broadcast hint — at
    # fixture scale AQE broadcasts it anyway, and at 100 TB a forced
    # broadcast of every doc_id would OOM executors; the surviving-hash
    # side is already frequency-capped, so a shuffled hash join is fine.
    src_hashes = (
        fps.join(good, "h")
        .join(docs.select("doc_id", "source"), "doc_id")
        .select("h", "source")
        .distinct()
    )
    return (
        src_hashes.alias("a")
        .join(
            src_hashes.alias("b"),
            (F.col("a.h") == F.col("b.h")) & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_hashes"))
        .orderBy("source_a", "source_b")
    )


# reuses _CLUSTERS_SQL's winnowing CTE chain (t → sh → fp), then the same
# frequency guard and a source-pair rollup
_CROSS_SOURCE_SQL = rf"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
  FROM documents
), sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= {WINNOW_K + WINNOW_W - 1}
              THEN [md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                    for i in range(1, len(toks) - {WINNOW_K - 1} + 1)]
              ELSE [] END AS hashes
  FROM t
), fp AS (
  SELECT DISTINCT doc_id, h
  FROM (
    SELECT doc_id,
           unnest(CASE WHEN len(hashes) >= {WINNOW_W}
                       THEN [list_min(hashes[j:j+{WINNOW_W - 1}])
                             for j in range(1, len(hashes) - {WINNOW_W - 1} + 1)]
                       ELSE [] END) AS h
    FROM sh
  )
), good AS (
  SELECT h FROM fp GROUP BY h HAVING count(*) BETWEEN 2 AND {CLUSTER_BUCKET_CAP}
), src AS (
  SELECT DISTINCT fp.h, d.source
  FROM fp JOIN good USING (h) JOIN documents d USING (doc_id)
)
SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared_hashes
FROM src a JOIN src b ON a.h = b.h AND a.source < b.source
GROUP BY a.source, b.source ORDER BY source_a, source_b
"""


# --- Zipf head coverage ------------------------------------------------------

def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative token share of the top-K terms (K ∈ COVERAGE_RANKS).
    Term counting shuffles once; ranking and the cumulative sum touch only
    the bounded top-``max(K)`` head (TakeOrderedAndProject, no global
    sort), then rank + cumsum over that head run as a windowless
    triangular self-join — O(max K²) rows, bounded by config, with no
    single-partition window stage anywhere in the plan."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(tokens(F.trim(F.lower(F.col("text"))))).alias("w")
    ).filter(F.col("w") != "")
    # localCheckpoint: counts feeds both the total and the top-K head;
    # without it the scan+explode+count chain executes twice.
    counts = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    totals = counts.agg(F.sum("n").alias("total_tokens"))

    head = counts.orderBy(F.desc("n"), "w").limit(max(COVERAGE_RANKS))
    # rank + running sum over the bounded head via triangular self-join
    # (rank = 1 + rows strictly before; cum = own n + their sum) — N^2 on
    # <= max(COVERAGE_RANKS) rows, windowless, no single-partition sort
    h2 = head.select(F.col("w").alias("w2"), F.col("n").alias("n2"))
    before = (F.col("n2") > F.col("n")) | (
        (F.col("n2") == F.col("n")) & (F.col("w2") < F.col("w"))
    )
    ranked = (
        head.join(h2, before, "left")
        .groupBy("w", "n")
        .agg(
            (F.count("w2") + 1).alias("rank"),
            (F.col("n") + F.coalesce(F.sum("n2"), F.lit(0))).alias("cum_tokens"),
        )
        .select("rank", "cum_tokens")
    )
    return (
        ranked.filter(F.col("rank").isin(*COVERAGE_RANKS))
        .crossJoin(F.broadcast(totals))
        .select(
            F.col("rank").cast("long").alias("top_k"),
            F.col("cum_tokens").cast("long").alias("cum_tokens"),
            F.col("total_tokens").cast("long").alias("total_tokens"),
            F.round(F.col("cum_tokens").cast("double") / F.col("total_tokens"), 6).alias(
                "coverage"
            ),
        )
        .orderBy("top_k")
    )


_CHUNKING_SQL = rf"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
  FROM documents
), c AS (
  SELECT doc_id,
         unnest([toks[((i - 1) * {CHUNK_STRIDE} + 1):((i - 1) * {CHUNK_STRIDE} + {CHUNK_SIZE})]
                 for i in range(1, CAST(ceil(len(toks) / {CHUNK_STRIDE}.0) AS BIGINT) + 1)]) AS ct,
         unnest([i - 1
                 for i in range(1, CAST(ceil(len(toks) / {CHUNK_STRIDE}.0) AS BIGINT) + 1)]) AS chunk_id
  FROM t
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(len(ct) AS BIGINT) AS n_chunk_tokens,
       md5(array_to_string(ct, ' ')) AS chunk_digest
FROM c
ORDER BY doc_id, chunk_id
"""

_CLUSTERS_SQL = rf"""
WITH RECURSIVE t AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
  FROM documents
), sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= {WINNOW_K + WINNOW_W - 1}
              THEN [md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                    for i in range(1, len(toks) - {WINNOW_K - 1} + 1)]
              ELSE [] END AS hashes
  FROM t
), fp AS (
  SELECT DISTINCT doc_id, h
  FROM (
    SELECT doc_id,
           unnest(CASE WHEN len(hashes) >= {WINNOW_W}
                       THEN [list_min(hashes[j:j+{WINNOW_W - 1}])
                             for j in range(1, len(hashes) - {WINNOW_W - 1} + 1)]
                       ELSE [] END) AS h
    FROM sh
  )
), good AS (
  SELECT h FROM fp GROUP BY h HAVING count(*) BETWEEN 2 AND {CLUSTER_BUCKET_CAP}
), edges AS (
  SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
  FROM fp a JOIN good USING (h) JOIN fp b USING (h)
  WHERE a.doc_id <> b.doc_id
), reach(src, dst) AS (
  SELECT src, src FROM (SELECT DISTINCT src FROM edges)
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
), cc AS (
  SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src
)
SELECT doc_id, cluster_id,
       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
       doc_id = cluster_id AS is_canonical
FROM cc
ORDER BY doc_id
"""

_COVERAGE_SQL = rf"""
WITH words AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
  FROM documents
), counts AS (
  SELECT w, count(*) AS n FROM words WHERE w <> '' GROUP BY w
), ranked AS (
  SELECT row_number() OVER (ORDER BY n DESC, w) AS rank,
         sum(n) OVER (ORDER BY n DESC, w ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM counts
)
SELECT CAST(rank AS BIGINT) AS top_k,
       CAST(cum_tokens AS BIGINT) AS cum_tokens,
       (SELECT CAST(sum(n) AS BIGINT) FROM counts) AS total_tokens,
       round(CAST(cum_tokens AS DOUBLE) / (SELECT CAST(sum(n) AS BIGINT) FROM counts), 6)
         AS coverage
FROM ranked
WHERE rank IN ({', '.join(str(k) for k in COVERAGE_RANKS)})
ORDER BY top_k
"""

QUERIES: dict[str, QuerySpec] = {
    "doc_chunking": QuerySpec(
        q_doc_chunking,
        _CHUNKING_SQL,
        "sliding-window token chunking (size 32 / stride 24), shuffle-free",
    ),
    "dedup_clusters": QuerySpec(
        q_dedup_clusters,
        _CLUSTERS_SQL,
        "connected components over the shared-fingerprint near-dup graph",
    ),
    "vocab_coverage": QuerySpec(
        q_vocab_coverage,
        _COVERAGE_SQL,
        "Zipf head coverage: token share of the top-K terms",
    ),
    "cross_source_duplicates": QuerySpec(
        q_cross_source_duplicates,
        _CROSS_SOURCE_SQL,
        "source-pair shared-fingerprint matrix (mirroring/scraping forensics)",
    ),
}
