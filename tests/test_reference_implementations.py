"""Crafted-fixture tests against independent pure-Python references.

The oracle-parity gate proves Spark and DuckDB agree — but both sides
were written from the same mental model, so a shared conceptual bug
(wrong interval union, wrong greedy-merge semantics) would pass it.
These tests pin the SEMANTICS against a third, independent
reimplementation on adversarial hand-built corpora: overlapping spans,
boundary spans, within-doc-only repeats, merge ties, consecutive
overlap runs.
"""

from __future__ import annotations

import re

import pytest


def _write_documents(spark, tmp_path, texts: dict[int, tuple[str, str]]) -> str:
    """Write a documents.parquet fixture: {doc_id: (source, text)}."""
    rows = [
        (i, text, "en", source, len(text))
        for i, (source, text) in sorted(texts.items())
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "docs")
    df.coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


# --- dup_span_coverage vs an independent interval-union reference ------------


def _ref_span_coverage(texts: dict[int, tuple[str, str]], k: int):
    toks = {i: re.split(r"\s+", t.strip()) for i, (_, t) in texts.items()}
    gram_docs: dict[tuple, set[int]] = {}
    for i, ts in toks.items():
        for p in range(len(ts) - k + 1):
            gram_docs.setdefault(tuple(ts[p : p + k]), set()).add(i)
    shared = {g for g, ds in gram_docs.items() if len(ds) > 1}
    per_source: dict[str, dict[str, int]] = {}
    for i, (source, _) in texts.items():
        ts = toks[i]
        covered_positions: set[int] = set()
        for p in range(len(ts) - k + 1):
            if tuple(ts[p : p + k]) in shared:
                covered_positions.update(range(p, p + k))
        agg = per_source.setdefault(
            source, {"n_docs": 0, "n_docs_with_dup": 0, "total": 0, "covered": 0}
        )
        agg["n_docs"] += 1
        agg["total"] += len(ts)
        agg["covered"] += len(covered_positions)
        if covered_positions:
            agg["n_docs_with_dup"] += 1
    return per_source


SPAN_CORPUS = {
    # doc1/doc2 share exactly one 4-gram "a b c d" (4 covered tokens each)
    1: ("s1", "a b c d e f g h"),
    2: ("s1", "x y a b c d z w"),
    # within-doc repetition ONLY — cross-doc coverage must stay 0
    3: ("s2", "q r s t q r s t q r s t"),
    # three overlapping shared grams with doc4b -> interval union, not 3*4
    4: ("s2", "m n o p r2 m2 u v"),
    5: ("s2", "m n o p r2 m2 w zz"),
    # shorter than k -> zero grams, still counted in totals
    6: ("s3", "tiny doc"),
    7: ("s3", "tiny doc"),  # 2 tokens: no 4-gram even though identical
}


def test_dup_span_coverage_matches_reference_on_crafted_corpus(spark, tmp_path):
    from local_llm_iceberg_cdw_spark.operators.dedup import (
        DUP_SPAN_K,
        q_dup_span_coverage,
    )

    sf_dir = _write_documents(spark, tmp_path, SPAN_CORPUS)
    got = {
        r.source: r.asDict() for r in q_dup_span_coverage(spark, sf_dir).collect()
    }
    ref = _ref_span_coverage(SPAN_CORPUS, DUP_SPAN_K)
    assert set(got) == set(ref)
    for source, exp in ref.items():
        g = got[source]
        assert g["n_docs"] == exp["n_docs"], source
        assert g["n_docs_with_dup"] == exp["n_docs_with_dup"], source
        assert g["total_tokens"] == exp["total"], source
        assert g["covered_tokens"] == exp["covered"], source
    # the crafted shapes actually exercise the paths:
    assert ref["s1"]["covered"] == 8  # one shared gram per doc
    assert ref["s2"]["covered"] == 12  # union of 3 overlapping grams, 6/doc
    assert ref["s2"]["n_docs_with_dup"] == 2  # doc3's self-repeats excluded
    assert ref["s3"]["covered"] == 0  # sub-K docs can never be covered


# --- bpe_train_merges vs an independent greedy-merge reference ---------------


def _ref_bpe(words: dict[str, int], iters: int):
    syms = {w: [f"<{c}>" for c in w] for w in words}
    out = []
    for _ in range(iters):
        counts: dict[str, int] = {}
        for w, s in syms.items():
            for a, b in zip(s, s[1:]):
                counts[a + b] = counts.get(a + b, 0) + words[w]
        best = min(counts, key=lambda p: (-counts[p], p))
        merged = best.replace("><", "")
        out.append((best, merged, counts[best]))
        a, b = best.split("><")
        a, b = a + ">", "<" + b
        for w, s in syms.items():
            ns, i = [], 0
            while i < len(s):  # greedy leftmost non-overlapping
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    ns.append(merged)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            syms[w] = ns
    return out


BPE_CORPUS = {
    # 'aaaa' stresses consecutive-overlap: <a><a> must merge to <aa><aa>
    10: ("s1", "aaaa aaaa aaaa abab"),
    11: ("s1", "abab abab banana banana"),
    12: ("s2", "banana bandana aaaa abab"),
}


def test_bpe_train_merges_matches_reference_on_crafted_corpus(spark, tmp_path):
    from local_llm_iceberg_cdw_spark.operators.text import (
        BPE_TRAIN_ITERS,
        q_bpe_train_merges,
    )

    sf_dir = _write_documents(spark, tmp_path, BPE_CORPUS)
    words: dict[str, int] = {}
    for _, text in BPE_CORPUS.values():
        for w in text.split():
            words[w] = words.get(w, 0) + 1
    ref = _ref_bpe(words, BPE_TRAIN_ITERS)
    got = [
        (r.merge, r.new_symbol, r.pair_count)
        for r in q_bpe_train_merges(spark, sf_dir).orderBy("iteration").collect()
    ]
    assert got == ref
    # the corpus exercises the overlap rule: counting sees every adjacent
    # pair (aaaa -> three <a><a>), while the APPLY is leftmost
    # non-overlapping (aaaa -> <aa><aa>, never <aa><a>... re-merged)
    assert got[0][0] == "<a><a>", got


# --- mmr vs an independent greedy reference (on the real fixture) ------------


def test_mmr_matches_independent_greedy_reference(spark):
    import math

    from conftest import SF_SMOKE
    from local_llm_iceberg_cdw_spark.operators.similarity import (
        MMR_K,
        MMR_LAMBDA,
        MMR_QUERY_VEC,
        MMR_SHORTLIST,
        q_mmr_diversified_topk,
    )
    from local_llm_iceberg_cdw_spark.catalog import load_table

    vecs = {
        r.vec_id: r.embedding
        for r in load_table(spark, SF_SMOKE, "embeddings").collect()
    }
    q = vecs[MMR_QUERY_VEC]

    def cos(a, b):
        dot = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) * float(x) for x in a))
        nb = math.sqrt(sum(float(y) * float(y) for y in b))
        return round(dot / (na * nb), 6)

    rel = {
        i: cos(q, v) for i, v in vecs.items() if i != MMR_QUERY_VEC
    }
    short = sorted(rel, key=lambda i: (-rel[i], i))[:MMR_SHORTLIST]
    selected: list[int] = []
    for _ in range(MMR_K):
        remaining = [i for i in short if i not in selected]
        if not selected:
            pick = min(remaining, key=lambda i: (-rel[i], i))
        else:
            def score(i):
                ms = max(cos(vecs[i], vecs[j]) for j in selected)
                return MMR_LAMBDA * rel[i] - (1 - MMR_LAMBDA) * ms

            pick = min(remaining, key=lambda i: (-score(i), i))
        selected.append(pick)
    got = [
        r.vec_id
        for r in q_mmr_diversified_topk(spark, SF_SMOKE).orderBy("step").collect()
    ]
    assert got == selected
