"""Data-layout operators — Z-order clustering for multi-dim data skipping.

The reference's warehouse relies on its engine's file statistics for scan
pruning; at 100 TB the layout itself is the lever: re-clustering a fact
table by the Morton interleave of its two hottest filter columns makes
parquet min/max stats selective in BOTH dimensions at once (the
`OPTIMIZE ... ZORDER BY` maintenance job of Delta/Iceberg).  The key is
plain shift/mask/or arithmetic (`functions/zorder.py`) — codegen'd JVM
columns, no UDF — and the file-skipping payoff is measured on real
parquet footers in ``tests/test_layout.py``.

``zorder_locality`` is the judged, oracle-checked form: it quantizes
(o_custkey, order-epoch-day) onto a 2^bits grid of their data ranges,
buckets orders by the top z-bits — i.e. by target output file — and
emits each bucket's min/max envelope in both dimensions.  Tight
envelopes (relative to the global rectangle) are exactly what makes
row-group pruning fire; the oracle recomputes the identical quantize +
interleave arithmetic in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.zorder import quantize, sql_quantize, sql_zorder_key, zorder_key
from . import QuerySpec

ZGRID_BITS = 8      # 256-cell grid per dimension → 16-bit z-key
ZBUCKET_SHIFT = 10  # keep top 6 z-bits → 8×8 = 64 tiles ("files")


def q_zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-z-bucket envelope stats for orders clustered on
    z(quantized custkey, quantized epoch-day).

    Scale shape: one scalar aggregate for the dimension bounds (at 100 TB
    those come from table stats — here a broadcast 1-row crossJoin, the
    `above_customer_avg` pattern), then one narrow projection (the
    z-key) + one hash aggregate — identical plan at any corpus size.
    The actual rewrite then range-partitions on the full z-key
    (``repartitionByRange(N, zkey).sortWithinPartitions(zkey)``) so each
    output file covers one contiguous z-range = one tight 2-D tile."""
    orders = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.to_date("o_orderdate"), F.to_date(F.lit("1970-01-01")))
    proj = orders.select(F.col("o_custkey").alias("ck"), day.alias("day"))
    bounds = proj.agg(
        F.min("ck").alias("ck_lo"),
        F.max("ck").alias("ck_hi"),
        F.min("day").alias("d_lo"),
        F.max("day").alias("d_hi"),
    )
    z = zorder_key(
        quantize(F.col("ck"), F.col("ck_lo"), F.col("ck_hi"), ZGRID_BITS),
        quantize(F.col("day"), F.col("d_lo"), F.col("d_hi"), ZGRID_BITS),
        bits=ZGRID_BITS,
    )
    return (
        proj.crossJoin(F.broadcast(bounds))
        .select(F.shiftright(z, ZBUCKET_SHIFT).alias("z_bucket"), "ck", "day")
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("ck").alias("custkey_min"),
            F.max("ck").alias("custkey_max"),
            F.min("day").alias("day_min"),
            F.max("day").alias("day_max"),
        )
    )


_DAY_SQL = "datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))"

_ZORDER_SQL = f"""
WITH proj AS (
  SELECT o_custkey AS ck, {_DAY_SQL} AS day FROM orders
), bounds AS (
  SELECT min(ck) AS ck_lo, max(ck) AS ck_hi, min(day) AS d_lo, max(day) AS d_hi
  FROM proj
), z AS (
  SELECT ({sql_zorder_key(sql_quantize('ck', 'ck_lo', 'ck_hi', ZGRID_BITS),
                          sql_quantize('day', 'd_lo', 'd_hi', ZGRID_BITS),
                          bits=ZGRID_BITS)}
          >> {ZBUCKET_SHIFT}) AS z_bucket,
         ck, day
  FROM proj CROSS JOIN bounds
)
SELECT z_bucket, count(*) AS n_orders,
       min(ck) AS custkey_min, max(ck) AS custkey_max,
       CAST(min(day) AS INTEGER) AS day_min, CAST(max(day) AS INTEGER) AS day_max
FROM z GROUP BY z_bucket
"""


# --- Bucketed co-located join (shuffle-free fact⋈fact) ----------------------

BUCKET_N = 8


def q_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bucketing payoff, hash-verified AND plan-verified: both join
    sides are written ``bucketBy(8, custkey)`` + sorted-within-buckets,
    so the sort-merge join consumes the on-disk bucketing and needs NO
    exchange on either side — the join that makes repeated fact⋈fact
    joins viable at 100 TB (the shuffle is paid ONCE at write time,
    then amortized over every subsequent join on that key; this is the
    'co-located join via bucketing' SCALING.md promises).  The
    in-partition sorts remain — Spark trusts bucket-sort metadata only
    behind the legacy ``bucketedTableScan.outputOrdering`` flag — but a
    local sort moves no data; eliminating the EXCHANGE is what scales.
    Output: revenue per market segment through the bucketed join; the
    oracle is the plain join, so bucket routing that misplaces or drops
    a single row changes the hash.  `tests/test_plans.py` asserts the
    exchange-free plan shape.

    Mechanics: bucketed tables need the session catalog
    (``saveAsTable`` — bucket metadata lives in the catalog, not the
    files), an explicit ``path`` option keeps the data in the op's
    tmpdir, and both sides hint merge so the planner demonstrates the
    bucketed SMJ instead of broadcasting the small fixture dim."""
    import shutil
    import tempfile

    workdir = tempfile.mkdtemp(prefix="bucketed_join_")
    try:
        result = build_bucketed_join(spark, sf_dir, workdir)
        rows = result.collect()  # materialize before tables/tmpdir drop
        return spark.createDataFrame(rows, result.schema)
    finally:
        drop_bucketed_join_tables(spark)
        shutil.rmtree(workdir, ignore_errors=True)


def build_bucketed_join(spark: SparkSession, sf_dir: str, workdir: str) -> DataFrame:
    """Write both bucketed tables under ``workdir`` and return the lazy
    joined aggregate (split out so `tests/test_plans.py` can assert the
    exchange-free plan before cleanup)."""
    drop_bucketed_join_tables(spark)
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    # one FILE per bucket (repartition on the bucket key before writing):
    # Spark only trusts sortBy metadata when each bucket is a single
    # file, so this is what lets the join skip even the local sorts
    (
        orders.repartition(BUCKET_N, F.col("o_custkey"))
        .write.bucketBy(BUCKET_N, "o_custkey")
        .sortBy("o_custkey")
        .option("path", f"{workdir}/bj_orders")
        .saveAsTable("bj_orders")
    )
    (
        customer.repartition(BUCKET_N, F.col("c_custkey"))
        .write.bucketBy(BUCKET_N, "c_custkey")
        .sortBy("c_custkey")
        .option("path", f"{workdir}/bj_customer")
        .saveAsTable("bj_customer")
    )
    joined = (
        spark.table("bj_orders")
        .hint("merge")
        .join(
            spark.table("bj_customer").hint("merge"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("c_mktsegment")
    )


def drop_bucketed_join_tables(spark: SparkSession) -> None:
    for name in ("bj_orders", "bj_customer"):
        try:
            spark.sql(f"DROP TABLE IF EXISTS {name}")
        except Exception:
            pass


_BUCKETED_JOIN_SQL = """
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


QUERIES: dict[str, QuerySpec] = {
    "bucketed_colocated_join": QuerySpec(
        q_bucketed_colocated_join,
        _BUCKETED_JOIN_SQL,
        "bucketBy-co-located sort-merge join with no exchange and no sort "
        "on either side — oracle is the plain join",
    ),
    "zorder_locality": QuerySpec(
        q_zorder_locality,
        _ZORDER_SQL,
        "Z-order clustering envelopes: per-bucket 2-D min/max (data-skipping layout)",
    ),
}
