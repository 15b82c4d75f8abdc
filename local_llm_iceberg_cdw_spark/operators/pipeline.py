"""The capstone curation pipeline: every corpus stage composed end to end.

``corpus_pipeline_e2e`` chains the judged operators the way a production
100 TB training-data pipeline actually runs them, and emits the per-source
audit manifest a data lead signs off on:

    raw documents
      → quality gate      (``text.with_quality_flags`` — Gopher-style rules)
      → exact dedup       (min-doc_id keeper per md5 fingerprint, dedup.py)
      → split assignment  (portable MD5-nibble split, corpus.py)
      → decontamination   (train docs sharing any word 8-gram with the
                           eval split are quarantined, corpus.py semantics)
      → sequence packing  (concat-and-split token budgets, packing.py)

Output: one row per source with the document count surviving each stage,
the tokens that reach training, and the number of packed sequences — the
"why did my corpus shrink" table.

Scale shape (100 TB design intent):
- The per-doc state (doc_id, source, keep, fp, split, n_tokens) is
  computed in ONE narrow pass over the corpus and localCheckpointed —
  every later stage branches off ~40 bytes/doc, never re-tokenizing.
- Stage joins are id/hash-keyed: the dedup keeper set semi-joins on
  doc_id, decontamination joins on xxhash64(gram) (8-byte keys, the
  dedup.py/corpus.py trade — raw ~50-byte gram strings never enter a
  corpus-sized shuffle), and the contaminated-id set anti-joins on
  doc_id.
- Packing is the one ordered window (per-source cumsum); all per-source
  rollups are map-side-combined hash aggregates over tiny (|sources|)
  key spaces, joined at the end (AQE broadcasts them).

The oracle unrolls the identical stages as CTEs, so the driver
hash-verifies the WHOLE composition, not just each operator alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions import spread_small_input
from . import QuerySpec
from .corpus import DECONTAM_NGRAM_N, _gram_array, _split_expr
from .packing import PACK_BUDGET, sharded_start_offsets
from .text import (
    QF_MAX_MEAN_TOKEN_LEN,
    QF_MAX_TOKENS,
    QF_MIN_ALPHA_RATIO,
    QF_MIN_MEAN_TOKEN_LEN,
    QF_MIN_STOPWORD_RATIO,
    QF_MIN_TOKENS,
    REP_NGRAM_N,
    REP_THRESHOLD,
    STOPWORDS,
    fingerprint,
    with_quality_flags,
)


def q_corpus_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    flagged = with_quality_flags(spread_small_input(docs))
    # ONE tokenize/fingerprint pass → narrow per-doc state, checkpointed;
    # every stage below branches off this (never re-reads text except the
    # gram stages, which semi-join the raw scan against surviving ids).
    base = flagged.select(
        "doc_id",
        "source",
        "keep",
        fingerprint(F.col("text")).alias("fp"),
        _split_expr(F.col("doc_id")).alias("split"),
        F.size(F.col("toks")).cast("long").alias("n_tokens"),
    ).localCheckpoint(eager=True)

    kept = base.filter(F.col("keep"))
    keepers = kept.groupBy("fp").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    deduped = kept.join(keepers, "doc_id", "left_semi")
    train = deduped.filter(F.col("split") == "train")

    # decontamination: the eval split (raw — the benchmark is external to
    # curation) defines the quarantine gram set; hash-keyed joins as in
    # decontamination_check (collision note at corpus.py:126-132)
    eval_gh = (
        docs.select("doc_id", "text")
        .join(base.filter(F.col("split") == "eval").select("doc_id"), "doc_id", "left_semi")
        .select(F.explode(_gram_array(F.col("text"), DECONTAM_NGRAM_N)).alias("gram"))
        .select(F.xxhash64("gram").alias("gh"))
        .distinct()
    )
    train_grams = (
        docs.select("doc_id", "text")
        .join(train.select("doc_id"), "doc_id", "left_semi")
        .select("doc_id", F.explode(_gram_array(F.col("text"), DECONTAM_NGRAM_N)).alias("gram"))
        .select("doc_id", F.xxhash64("gram").alias("gh"))
    )
    contaminated = train_grams.join(eval_gh, "gh", "left_semi").select("doc_id").distinct()

    # one per-doc flag frame drives BOTH rollups: every stage membership
    # as a boolean, so the per-source counts are a single conditional
    # aggregation instead of one aggregate + join per stage
    flags = (
        base.join(keepers.withColumn("is_keeper", F.lit(True)), "doc_id", "left")
        .join(contaminated.withColumn("is_contam", F.lit(True)), "doc_id", "left")
        .select(
            "source",
            "doc_id",
            "n_tokens",
            "keep",
            (F.col("keep") & F.coalesce(F.col("is_keeper"), F.lit(False))).alias("survived_dedup"),
            (F.col("split") == "train").alias("is_train"),
            F.coalesce(F.col("is_contam"), F.lit(False)).alias("contam"),
        )
        .localCheckpoint(eager=True)
    )
    in_train = F.col("survived_dedup") & F.col("is_train")
    is_final = in_train & ~F.col("contam")

    rollup = flags.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_raw"),
        F.sum(F.col("keep").cast("long")).alias("n_quality_kept"),
        F.sum(F.col("survived_dedup").cast("long")).alias("n_after_dedup"),
        F.sum(in_train.cast("long")).alias("n_train"),
        F.sum(is_final.cast("long")).alias("n_final"),
        F.sum(F.when(is_final, F.col("n_tokens")).otherwise(0)).alias("total_tokens"),
    )

    # two-phase sharded prefix sum (packing.sharded_start_offsets): the
    # per-source cumulative window would route each source's whole stream
    # through ONE task; the sharded form keeps |sources| x PACK_SHARDS
    # tasks.  flags is already checkpointed, so the helper's three reads
    # of its input are cheap branches.
    offs = sharded_start_offsets(
        flags.filter(is_final).select("source", "doc_id", "n_tokens"), "n_tokens"
    )
    packs = offs.groupBy("source").agg(
        F.countDistinct(F.floor(F.col("start_offset") / PACK_BUDGET)).alias("n_packs")
    )

    zero = F.lit(0).cast("long")
    return (
        rollup.join(packs, "source", "left")
        .select(
            "source",
            "n_docs_raw",
            "n_quality_kept",
            "n_after_dedup",
            "n_train",
            (F.col("n_train") - F.col("n_final")).alias("n_contaminated_dropped"),
            "n_final",
            "total_tokens",
            F.coalesce(F.col("n_packs"), zero).alias("n_packs"),
        )
        .orderBy("source")
    )


_E2E_SQL = rf"""
WITH t AS (
  SELECT doc_id, source, text,
         regexp_split_to_array(trim(lower(text)), '\s+') AS toks
  FROM documents
), g AS (
  SELECT doc_id, source, text, toks,
         CASE WHEN len(toks) >= {REP_NGRAM_N}
              THEN [array_to_string(toks[i:i+{REP_NGRAM_N - 1}], ' ')
                    for i in range(1, len(toks) - {REP_NGRAM_N - 1} + 1)]
              ELSE [] END AS grams
  FROM t
), q AS (
  SELECT doc_id, source,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
         CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
              THEN 'train' ELSE 'eval' END AS split,
         (len(toks) >= {QF_MIN_TOKENS} AND len(toks) <= {QF_MAX_TOKENS}
          AND (CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) / len(toks))
                >= {QF_MIN_MEAN_TOKEN_LEN}
          AND (CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) / len(toks))
                <= {QF_MAX_MEAN_TOKEN_LEN}
          AND (CAST(len(list_filter(toks, x -> x IN
                ({', '.join(repr(s) for s in STOPWORDS)}))) AS DOUBLE) / len(toks))
                >= {QF_MIN_STOPWORD_RATIO}
          AND (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                / length(text)) >= {QF_MIN_ALPHA_RATIO}
          AND (CASE WHEN len(grams) > 0
                    THEN (len(grams) - len(list_distinct(grams)))
                           / CAST(len(grams) AS DOUBLE)
                    ELSE 0.0 END) <= {REP_THRESHOLD}
         ) AS keep
  FROM g
), kept AS (SELECT * FROM q WHERE keep),
keepers AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY fp),
dedup AS (SELECT * FROM kept WHERE doc_id IN (SELECT doc_id FROM keepers)),
train AS (SELECT * FROM dedup WHERE split = 'train'),
dgrams AS (
  SELECT d.doc_id, array_to_string(d.s[i.i:i.i + {DECONTAM_NGRAM_N - 1}], ' ') AS gram
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS s FROM documents) d
  CROSS JOIN LATERAL unnest(range(1, len(d.s) - {DECONTAM_NGRAM_N - 1} + 1)) AS i(i)
),
eg AS (SELECT DISTINCT gram FROM dgrams JOIN q USING (doc_id) WHERE q.split = 'eval'),
contam AS (
  SELECT DISTINCT dg.doc_id
  FROM dgrams dg JOIN train USING (doc_id)
  WHERE dg.gram IN (SELECT gram FROM eg)
),
final AS (
  SELECT source, doc_id, n_tokens FROM train
  WHERE doc_id NOT IN (SELECT doc_id FROM contam)
),
offs AS (
  SELECT source, doc_id, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS start_offset
  FROM final
),
packs AS (
  SELECT source,
         CAST(count(DISTINCT CAST(floor(start_offset / {PACK_BUDGET}) AS BIGINT)) AS BIGINT)
           AS n_packs
  FROM offs GROUP BY source
),
a AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs_raw,
         CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_quality_kept
  FROM q GROUP BY source
),
b AS (SELECT source, CAST(count(*) AS BIGINT) AS n_after_dedup FROM dedup GROUP BY source),
c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_train FROM train GROUP BY source),
f AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_final,
         CAST(sum(n_tokens) AS BIGINT) AS total_tokens
  FROM final GROUP BY source
)
SELECT a.source, a.n_docs_raw, a.n_quality_kept,
       coalesce(b.n_after_dedup, 0) AS n_after_dedup,
       coalesce(c.n_train, 0) AS n_train,
       coalesce(c.n_train, 0) - coalesce(f.n_final, 0) AS n_contaminated_dropped,
       coalesce(f.n_final, 0) AS n_final,
       coalesce(f.total_tokens, 0) AS total_tokens,
       coalesce(packs.n_packs, 0) AS n_packs
FROM a LEFT JOIN b USING (source) LEFT JOIN c USING (source)
       LEFT JOIN f USING (source) LEFT JOIN packs USING (source)
ORDER BY a.source
"""


QUERIES: dict[str, QuerySpec] = {
    "corpus_pipeline_e2e": QuerySpec(
        q_corpus_pipeline_e2e,
        _E2E_SQL,
        "capstone: quality gate → exact dedup → split → decontamination → "
        "packing, rolled up to a per-source audit manifest",
    ),
}
