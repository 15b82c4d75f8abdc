"""Structural invariants of the late round-10 operators — properties the
oracle hash cannot express as crisply (they hold at EVERY scale and
parameterization, not just on the fixture values).

- MMR scores are provably non-increasing across greedy steps: the
  remaining set shrinks and each candidate's max-sim-to-selected can
  only grow, so each step's argmax is bounded by the previous one.
- dup_span_coverage's interval union can never cover more tokens than
  exist, and any doc with a shared span covers at least K tokens.
- bpe_train_merges learns distinct merges with positive corpus support,
  and each new symbol is the concatenation the merge describes.
- nb_lang_classifier's confusion matrix partitions the test split: row
  sums equal the per-true-label test counts (no doc dropped or counted
  twice by the argmax).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMOKE


def test_mmr_scores_non_increasing_and_picks_distinct(spark):
    from local_llm_iceberg_cdw_spark.operators.similarity import (
        q_mmr_diversified_topk,
    )

    rows = q_mmr_diversified_topk(spark, SF_SMOKE).orderBy("step").collect()
    assert [r.step for r in rows] == list(range(1, len(rows) + 1))
    picks = [r.vec_id for r in rows]
    assert len(set(picks)) == len(picks)
    scores = [r.mmr_score for r in rows]
    # theorem: remaining_{i+1} ⊆ remaining_i and per-candidate scores
    # only decay as the selected set grows → argmax is non-increasing
    assert all(a >= b for a, b in zip(scores, scores[1:])), scores
    # step 1 is the pure-relevance argmax: max_sim must be exactly 0
    assert rows[0].max_sim == 0.0


def test_dup_span_coverage_bounds(spark):
    from local_llm_iceberg_cdw_spark.operators.dedup import (
        DUP_SPAN_K,
        q_dup_span_coverage,
    )

    rows = q_dup_span_coverage(spark, SF_SMOKE).collect()
    assert rows, "per-source audit must be non-empty"
    for r in rows:
        assert 0 <= r.covered_tokens <= r.total_tokens
        assert 0 <= r.n_docs_with_dup <= r.n_docs
        # a doc with any shared K-gram covers >= K tokens, so sources
        # with hits must show at least K * n_docs_with_dup... per doc;
        # the per-source sum bound is K per flagged doc
        if r.n_docs_with_dup:
            assert r.covered_tokens >= DUP_SPAN_K * r.n_docs_with_dup


def test_bpe_merges_distinct_positive_and_well_formed(spark):
    from local_llm_iceberg_cdw_spark.operators.text import (
        BPE_TRAIN_ITERS,
        q_bpe_train_merges,
    )

    rows = q_bpe_train_merges(spark, SF_SMOKE).orderBy("iteration").collect()
    assert len(rows) == BPE_TRAIN_ITERS
    merges = [r.merge for r in rows]
    assert len(set(merges)) == len(merges)  # a merge can never repeat
    for r in rows:
        assert r.pair_count > 0
        assert r.new_symbol == r.merge.replace("><", "")
        assert r.merge.startswith("<") and r.merge.endswith(">")


def test_nb_confusion_matrix_partitions_the_test_split(spark):
    from local_llm_iceberg_cdw_spark.operators.curation import (
        q_nb_lang_classifier,
    )
    from local_llm_iceberg_cdw_spark.operators.text import tokens, with_lang_guess
    from local_llm_iceberg_cdw_spark.catalog import load_table

    cm = q_nb_lang_classifier(spark, SF_SMOKE).collect()
    row_sums: dict[str, int] = {}
    for r in cm:
        row_sums[r.true_label] = row_sums.get(r.true_label, 0) + r.n_docs
    docs = load_table(spark, SF_SMOKE, "documents")
    expected = {
        r.lang_guess: r.n
        for r in with_lang_guess(
            docs.select("doc_id", tokens(F.lower(F.col("text"))).alias("toks"))
        )
        .filter(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) >= F.lit("c")
        )
        .groupBy("lang_guess")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert row_sums == expected
