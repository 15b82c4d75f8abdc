"""Salted-join equivalence + Pandas-UDF operator properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from local_llm_iceberg_cdw_spark.catalog import load_table
from local_llm_iceberg_cdw_spark.operators.python_udf import (
    q_apply_in_pandas_zscore,
    q_pandas_udf_token_count,
)
from local_llm_iceberg_cdw_spark.operators.skew import salted_join
from local_llm_iceberg_cdw_spark.operators.snapshots_op import q_snapshot_time_travel

from conftest import SF_SMOKE


def _sorted_rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_salted_join_equals_plain_join(spark):
    """events.user_id is a hot-key column (15 users, 1000 events at
    sf0.001) — exactly the skew shape salting targets."""
    events = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id", "value")
    users = (
        load_table(spark, SF_SMOKE, "customer")
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    plain = events.join(users, "user_id")
    salted = salted_join(events, users, "user_id", salt_n=8)
    cols = ["event_id", "user_id", "value", "c_mktsegment"]
    assert _sorted_rows(plain, cols) == _sorted_rows(salted, cols)


def test_salted_join_left_outer(spark):
    events = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id")
    tiny = spark.createDataFrame([(0, "zero")], "user_id long, tag string")
    plain = events.join(tiny, "user_id", "left")
    salted = salted_join(events, tiny, "user_id", salt_n=4, how="left")
    cols = ["event_id", "user_id", "tag"]
    assert _sorted_rows(plain, cols) == _sorted_rows(salted, cols)


def test_salt_distribution_spreads_hot_key(spark):
    """The hot key's rows must actually land on multiple salt values."""
    events = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id", "value")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in events.columns]), F.lit(8)).cast("int")
    spread = (
        events.withColumn("_salt", salt)
        .groupBy("user_id")
        .agg(F.countDistinct("_salt").alias("n_salts"))
        .agg(F.min("n_salts"))
        .collect()[0][0]
    )
    assert spread >= 6  # every hot key scattered across ≥6 of 8 buckets


def test_pandas_udf_vectorized_not_row_at_a_time(spark):
    """ArrowEvalPython (vectorized), never BatchEvalPython (per-row)."""
    plan = q_pandas_udf_token_count(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_zscore_groups_are_normalized(spark):
    """Within-group mean≈0 and sample std≈1 (definition check)."""
    out = q_apply_in_pandas_zscore(spark, SF_SMOKE)
    stats = (
        out.groupBy("user_id")
        .agg(F.avg("zscore").alias("m"), F.stddev_samp("zscore").alias("s"), F.count("*").alias("n"))
        .collect()
    )
    for r in stats:
        if r.n >= 2:
            assert abs(r.m) < 1e-6, r
            assert abs(r.s - 1.0) < 1e-3, r


def test_snapshot_time_travel_counts(spark):
    rows = {r.read_mode: (r.n_orders, r.total_price) for r in q_snapshot_time_travel(spark, SF_SMOKE).collect()}
    assert rows["version_1"] == rows["asof_between"]
    assert rows["version_2"] == rows["current"]
    assert rows["version_1"][0] < rows["version_2"][0]


def test_salted_join_rejects_small_side_preserving_how(spark):
    import pytest

    from local_llm_iceberg_cdw_spark.operators.skew import salted_join

    big = spark.range(10).withColumnRenamed("id", "k")
    small = spark.range(3).withColumnRenamed("id", "k")
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(big, small, "k", how=how)
