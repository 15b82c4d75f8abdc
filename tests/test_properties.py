"""Property-based invariants (hypothesis) for the pure column functions.

Each example batches its generated cases into ONE DataFrame/job, and
example counts are kept small — Spark round-trips dominate, not the
property search.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from local_llm_iceberg_cdw_spark.functions.zorder import quantize, zorder_key
from local_llm_iceberg_cdw_spark.operators.skew import salted_join

_SPARK_SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_morton(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


@_SPARK_SETTINGS
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 65535), st.integers(0, 65535)),
        min_size=1,
        max_size=64,
    )
)
def test_zorder_key_matches_python_reference(spark, pairs):
    df = spark.createDataFrame(pairs, "a long, b long")
    got = df.select("a", "b", zorder_key(F.col("a"), F.col("b")).alias("z")).collect()
    for r in got:
        assert r.z == _py_morton(r.a, r.b), (r.a, r.b)


@_SPARK_SETTINGS
@given(
    lo=st.integers(0, 1000),
    span=st.integers(1, 5000),
    vals=st.lists(st.integers(0, 5000), min_size=1, max_size=64),
)
def test_quantize_bounds_and_monotonicity(spark, lo, span, vals):
    """quantize maps [lo, hi] onto [0, 2^bits-1], order-preserving."""
    hi = lo + span
    clamped = sorted(lo + v % (span + 1) for v in vals)
    df = spark.createDataFrame([(v,) for v in clamped], "x long")
    got = df.select(
        "x", quantize(F.col("x"), F.lit(lo), F.lit(hi), 8).alias("q")
    ).collect()
    assert all(0 <= r.q <= 255 for r in got), got
    # order preserved: quantize is monotone non-decreasing in x
    by_x = [r.q for r in sorted(got, key=lambda r: r.x)]
    assert by_x == sorted(by_x), got


@_SPARK_SETTINGS
@given(
    big=st.lists(st.tuples(st.integers(0, 5), st.integers(0, 100)), min_size=0, max_size=40),
    small=st.lists(st.integers(0, 5), min_size=0, max_size=6),
)
def test_salted_join_row_identical_to_plain_join(spark, big, small):
    bdf = spark.createDataFrame(big, "k long, v long") if big else spark.createDataFrame([], "k long, v long")
    sdf = (
        spark.createDataFrame([(k, k * 10) for k in set(small)], "k long, w long")
        if small
        else spark.createDataFrame([], "k long, w long")
    )
    got = sorted(map(tuple, salted_join(bdf, sdf, "k", salt_n=4).collect()))
    want = sorted(map(tuple, bdf.join(sdf, "k").collect()))
    assert got == want


# --- Bloom filter: the no-false-negative guarantee the prune+verify
# decontamination path relies on (corpus.q_bloom_decontamination) -----------

_PURE_SETTINGS = settings(max_examples=50, deadline=None)


@_PURE_SETTINGS
@given(
    members=st.lists(st.integers(-(2**63), 2**63 - 1), max_size=200),
    probes=st.lists(st.integers(-(2**63), 2**63 - 1), min_size=1, max_size=200),
)
def test_bloom_has_no_false_negatives(members, probes):
    import numpy as np

    from local_llm_iceberg_cdw_spark.operators.corpus import (
        BLOOM_NUM_HASHES,
        _build_bloom,
    )

    bits, m = _build_bloom(members)

    def hit(h: int) -> bool:
        h = np.uint64(np.int64(h))
        h2 = (h >> np.uint64(33)) | np.uint64(1)
        return all(
            (bits[int(idx) >> 3] >> (int(idx) & 7)) & 1
            for idx in (
                (h + np.uint64(j) * h2) % np.uint64(m)
                for j in range(BLOOM_NUM_HASHES)
            )
        )

    # every member MUST hit (false negatives would silently drop
    # contaminated docs); non-members may occasionally hit (fp) — allowed
    for h in members:
        assert hit(h)


# --- sharded prefix sum ≡ single-window prefix sum -------------------------
# The 100 TB packing path rests on this equivalence claim
# (operators/packing.py sharded_start_offsets docstring); integer sums are
# exact, so the offsets must match BIT-FOR-BIT on any input, including the
# adversarial shapes: ids clustered in a narrow slice, one doc per source,
# duplicate-free ids at extreme spreads.


@_SPARK_SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.integers(-(2**40), 2**40),  # doc_id (unique-ified below)
            st.integers(0, 2),  # source index
            st.integers(0, 10_000),  # token count n
        ),
        min_size=1,
        max_size=80,
    )
)
def test_sharded_offsets_match_single_window(spark, rows):
    from pyspark.sql.window import Window

    from local_llm_iceberg_cdw_spark.operators.packing import sharded_start_offsets

    seen: dict[int, tuple] = {}
    for doc_id, src, n in rows:
        seen[doc_id] = (doc_id, f"src{src}", n)  # dedup doc_ids, keep last
    base = spark.createDataFrame(
        list(seen.values()), "doc_id long, source string, n long"
    ).localCheckpoint(eager=True)

    got = {
        (r.doc_id, r.source): r.start_offset
        for r in sharded_start_offsets(base, "n").collect()
    }
    w = Window.partitionBy("source").orderBy("doc_id")
    want = {
        (r.doc_id, r.source): r.start_offset
        for r in base.withColumn(
            "start_offset",
            F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        )
        .fillna({"start_offset": 0})
        .collect()
    }
    assert got == want
