"""Round-20 invariants — default-suite forced-tier OUTPUT-EQUALITY tests
for every fold-exact Arrow twin the r19 optimization round introduced
(VERDICT r19 #1 / ADVICE r19: until now the twins were covered only by
plan-ROUTING tests plus the opt-in sf0.1 sweep, so a numerical
regression in the numpy folds — dtype change, fold reorder, FMA-enabled
BLAS swap — would pass the default suite while silently changing judged
outputs at sf ≥ 0.1).

Pattern (the round-16 semdecon test): run the op on the 500-row smoke
fixture twice — once on the brute Catalyst tier (the form the DuckDB
oracle mirrors, the default at this row count) and once with the tier
router forced to the Arrow twin via the `_EMB_COUNT_CACHE` monkeypatch —
and assert EXACT row equality (bit-identical floats, not approx)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


def _rows(df):
    """Collected rows as a sorted list of tuples; array cells tupled so
    exact equality is well-defined."""
    out = []
    for r in df.collect():
        out.append(
            tuple(tuple(v) if isinstance(v, list) else v for v in r)
        )
    return sorted(out, key=repr)


def _force_twin(monkeypatch, n_rows=2000):
    """Route the pair ops' tier selection: the smoke fixture holds 500
    embeddings, so a faked count of 2000 forces the fold-exact Arrow
    twin over the very same data the brute tier scored."""
    from local_llm_iceberg_cdw_spark.operators import similarity as sim

    monkeypatch.setitem(sim._EMB_COUNT_CACHE, SF_SMOKE, n_rows)


def test_cosine_topk_fold_twin_matches_brute_exactly(spark, monkeypatch):
    from local_llm_iceberg_cdw_spark.operators import similarity as sim

    brute = _rows(sim.q_cosine_topk(spark, SF_SMOKE))
    _force_twin(monkeypatch)
    twin = _rows(sim.q_cosine_topk(spark, SF_SMOKE))
    assert twin == brute and len(brute) > 0


def test_hard_negative_mining_fold_twin_matches_brute_exactly(spark, monkeypatch):
    """The labelled variant: the twin applies the label filter inside
    the Arrow pass — pair set AND cosines must match bitwise."""
    from local_llm_iceberg_cdw_spark.operators import similarity as sim

    brute = _rows(sim.q_hard_negative_mining(spark, SF_SMOKE))
    _force_twin(monkeypatch)
    twin = _rows(sim.q_hard_negative_mining(spark, SF_SMOKE))
    assert twin == brute and len(brute) > 0


def test_sq8_adc_topk_fold_twin_matches_brute_exactly(spark, monkeypatch):
    """`_sq8_pairs_fold_exact` replays the code derivation
    floor(x·127/m + 0.5) plus both score folds — sq8_score, exact_dot,
    recall_q and ranks must all match bitwise."""
    from local_llm_iceberg_cdw_spark.operators import quantization as qz

    brute = _rows(qz.q_sq8_adc_topk(spark, SF_SMOKE))
    _force_twin(monkeypatch)
    twin = _rows(qz.q_sq8_adc_topk(spark, SF_SMOKE))
    assert twin == brute and len(brute) > 0


def test_dense_shortlist_arrow_tier_matches_brute_exactly(spark, monkeypatch):
    from local_llm_iceberg_cdw_spark.operators import similarity as sim

    brute = _rows(sim.dense_shortlist(spark, SF_SMOKE, sim.MMR_QUERY_VEC, 15))
    _force_twin(monkeypatch)
    twin = _rows(sim.dense_shortlist(spark, SF_SMOKE, sim.MMR_QUERY_VEC, 15))
    assert twin == brute and len(brute) == 15


def test_dense_shortlist_arrow_tier_absent_query_returns_empty(spark, monkeypatch):
    """ADVICE r19: the Arrow tier's query-vector collect must degrade to
    an empty shortlist (the brute tier's semantics), not IndexError."""
    from local_llm_iceberg_cdw_spark.operators import similarity as sim

    _force_twin(monkeypatch)
    got = sim.dense_shortlist(spark, SF_SMOKE, 10**9, 15)
    assert got.count() == 0
    assert got.columns == ["vec_id", "cosine", "cv", "cn"]


def test_mmr_and_shortlist_consumers_twin_tier_matches_brute_exactly(
    spark, monkeypatch
):
    """The dense_shortlist consumers (MMR's driver-side greedy, hybrid
    RRF, RAG context pack) must emit identical rows whichever shortlist
    tier scored the corpus."""
    from local_llm_iceberg_cdw_spark.operators import similarity as sim
    from local_llm_iceberg_cdw_spark.operators.text import (
        q_hybrid_rrf_search,
        q_rag_context_pack,
    )

    ops = [sim.q_mmr_diversified_topk, q_hybrid_rrf_search, q_rag_context_pack]
    brute = [_rows(fn(spark, SF_SMOKE)) for fn in ops]
    _force_twin(monkeypatch)
    twin = [_rows(fn(spark, SF_SMOKE)) for fn in ops]
    for fn, b, t in zip(ops, brute, twin):
        assert t == b and len(b) > 0, fn


def test_mmr_greedy_degrades_when_shortlist_smaller_than_k(spark, monkeypatch):
    """ADVICE r19: with fewer shortlist rows than MMR_K the greedy must
    stop (fewer picks), not crash on best=None."""
    from local_llm_iceberg_cdw_spark.operators import similarity as sim

    monkeypatch.setattr(sim, "MMR_SHORTLIST", 2)
    got = sim.q_mmr_diversified_topk(spark, SF_SMOKE).collect()
    assert [r.step for r in got] == [1, 2]


def test_ivf_topk_results_fold_twin_matches_brute_exactly(spark, monkeypatch):
    """r20: the IVF probed-pair stage's Arrow twin (cell join carried
    through MapInPandas) must reproduce the expression-join form
    row-for-row — same probed pair set, bitwise-same cosines/ranks."""
    from local_llm_iceberg_cdw_spark.operators import similarity as sim

    brute = _rows(sim.ivf_topk_results(spark, SF_SMOKE))
    _force_twin(monkeypatch)
    twin = _rows(sim.ivf_topk_results(spark, SF_SMOKE))
    assert twin == brute and len(brute) > 0


def test_ivfsq8_results_fold_twin_matches_brute_exactly(spark, monkeypatch):
    from local_llm_iceberg_cdw_spark.operators import quantization as qz

    brute = _rows(qz.ivfsq8_results(spark, SF_SMOKE))
    _force_twin(monkeypatch)
    twin = _rows(qz.ivfsq8_results(spark, SF_SMOKE))
    assert twin == brute and len(brute) > 0


def test_ivf_pair_ops_route_to_fold_exact_twins_at_scale(spark, monkeypatch):
    """Routing pin (the r19 pattern): above PAIR_BRUTE_MAX_ROWS the IVF
    pair stages plan the MapInPandas twin with NO cell join; at the
    500-row oracle smoke scale they keep the broadcast cell join the
    DuckDB-mirrored recall harnesses exercise."""
    from local_llm_iceberg_cdw_spark.operators import quantization as qz
    from local_llm_iceberg_cdw_spark.operators import similarity as sim

    def plan_for(fn, n_rows):
        monkeypatch.setitem(sim._EMB_COUNT_CACHE, SF_SMOKE, n_rows)
        return fn(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()

    for fn in (sim.ivf_topk_results, qz.ivfsq8_results):
        # twin: pair stage is MapInPandas, the _probe_cells_udf pandas
        # UDF (ArrowEvalPython) is gone from the plan entirely
        fast = plan_for(fn, 2000)
        assert "MapInPandas" in fast and "ArrowEvalPython" not in fast, fn
        brute = plan_for(fn, 500)
        assert "ArrowEvalPython" in brute and "MapInPandas" not in brute, fn


def test_multiset_equal_rejects_w_collision(spark):
    from local_llm_iceberg_cdw_spark.operators.snapshots_op import _multiset_equal

    df = spark.createDataFrame([(1, 1)], "k long, __w long")
    with pytest.raises(AssertionError, match="__w"):
        _multiset_equal(df, df)
