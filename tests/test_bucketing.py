"""Bucketed tables → shuffle-free co-located joins (100 TB join layout).

At scale, pre-bucketing the big fact tables on their join key turns every
fact⋈fact join into a zero-shuffle zipper. Asserted here by materializing
bucketed copies of lineitem/orders and checking the join plan contains no
Exchange on either side.
"""

from __future__ import annotations

import pytest

from local_llm_iceberg_cdw_spark.catalog import load_table

from conftest import SF_SMOKE


@pytest.fixture()
def no_broadcast(spark):
    """Disable auto-broadcast so the small fixture doesn't sidestep the
    bucketed sort-merge path under test."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_shuffle(spark, no_broadcast):
    from pyspark.sql import functions as F

    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name, key in [("lineitem", "l_orderkey"), ("orders", "o_orderkey")]:
        spark.sql(f"DROP TABLE IF EXISTS {name}_bucketed")
        # the in-memory catalog forgets tables between sessions but the
        # managed location persists on disk — clear it
        shutil.rmtree(f"{warehouse}/{name}_bucketed", ignore_errors=True)
        (
            load_table(spark, SF_SMOKE, name)
            .write.bucketBy(8, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(f"{name}_bucketed")
        )
    li = spark.table("lineitem_bucketed")
    orders = spark.table("orders_bucketed")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy("o_orderpriority").agg(
        F.round(F.sum(li.l_extendedprice * (1 - li.l_discount)), 2).alias("revenue")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    join_section = plan.split("HashAggregate")[-1]  # below the agg: the join
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in join_section, join_section
    # and the result matches the unbucketed computation
    plain = (
        load_table(spark, SF_SMOKE, "lineitem")
        .join(load_table(spark, SF_SMOKE, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
