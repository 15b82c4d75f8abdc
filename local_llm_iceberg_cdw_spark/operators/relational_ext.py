"""Extended relational surface — TPC-H-shaped queries beyond the first batch.

The reference's prompt contract ("join the table if necessary ... create a
syntactically correct SQL query", /root/reference/app-gradio.py:134-140)
obliges the engine to execute arbitrary analyst SQL over the registered
schema, not just the handful of logged statements.  This module widens the
judged surface with the classic decision-support shapes the first batch
(relational.py) did not cover: correlated EXISTS / NOT EXISTS, scalar
subqueries, left/full outer joins, conditional aggregation, disjunctive
predicate pushdown, explode/unpivot reshaping, and agg-of-agg pipelines —
each adapted to the fixture schema (no partsupp/phone/shipmode columns).

Scale notes (100 TB design intent):
- Every fact-side join keys on l_orderkey/o_custkey — a single hash
  shuffle per join, reused by the downstream groupBy where keys align.
- Dimension sides (part, nation, supplier, scalar aggregates) broadcast;
  a scalar subquery is a 1-row broadcast cross join, never a collect().
- Correlated EXISTS/NOT EXISTS lower to left-semi/anti joins — Spark's
  RewritePredicateSubquery does the same for the SQL front door, so both
  entry points share one physical shape.
- Disjunctive OR-of-AND predicates stay inside the parquet scan where
  referencing only scan columns (l_quantity bounds) and otherwise run
  post-broadcast-join in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from . import QuerySpec
from .relational import _money_avg, _money_sum  # exact (order-independent) money aggregation


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _rev():
    # built lazily: F.col needs an active SparkContext in classic mode
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --- TPC-H Q4 shape: correlated EXISTS → left-semi join with a non-equi
# residual (l_shipdate > o_orderdate). --------------------------------------

def q_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-04-01"))
    )
    lineitem = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            lineitem,
            (orders.o_orderkey == lineitem.l_orderkey)
            & (lineitem.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


# --- TPC-H Q13 shape: LEFT OUTER join with an ON-clause filter, then a
# distribution (agg of agg).  Customers with zero qualifying orders must
# surface as n_orders = 0 — the null-count semantics of count(col). ---------

def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count("*").alias("n_customers"))
        .orderBy(F.col("n_customers").desc(), F.col("n_orders").desc())
    )


# --- TPC-H Q14 shape: conditional aggregation — promo revenue share.
# CASE inside SUM; single broadcast join lineitem⋈part. ---------------------

def q_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01"))
        & (F.col("l_shipdate") < F.lit("1997-10-01"))
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0.0))
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(promo.cast("decimal(18,6)")).cast("double")
                / F.sum(_rev().cast("decimal(18,6)")).cast("double"),
                4,
            ).alias("promo_pct"),
            _money_sum(_rev()).alias("total_revenue"),
        )
    )


# --- TPC-H Q19 shape: disjunctive OR-of-AND predicate over a broadcast
# join — exercises boolean-expression pushdown and codegen. -----------------

def q_disjunctive_part_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 50) & F.col("l_quantity").between(20, 30))
    )
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(_money_sum(_rev()).alias("revenue"), F.count("*").alias("n_lineitems"))
    )


# --- TPC-H Q22 shape: uncorrelated scalar subquery (threshold) + NOT EXISTS
# (anti join).  The scalar aggregate is a 1-row broadcast cross join — no
# collect(), so the plan is fully distributed. ------------------------------

def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        # exact decimal sum / count → the threshold is order-independent, so
        # rows near the average can't flip membership between engines
        (F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, customer.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"), _money_sum(F.col("c_acctbal")).alias("total_bal"))
        .orderBy("c_mktsegment")
    )


# --- TPC-H Q15 shape: agg → max-of-agg scalar subquery → join back.
# The revenue view shuffles once on l_suppkey; the max is a 1-row broadcast.

def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    supplier = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    # localCheckpoint: rev (supplier-bounded) feeds both the max scalar
    # and the filter — without it the lineitem agg executes twice.
    rev = (
        lineitem.groupBy("l_suppkey")
        .agg(_money_sum(_rev()).alias("total_rev"))
        .localCheckpoint(eager=True)
    )
    max_rev = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(supplier), rev.l_suppkey == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


# --- TPC-H Q10 shape: returned-item revenue per customer, top 20. ----------

def q_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01"))
        & (F.col("o_orderdate") < F.lit("1997-10-01"))
    )
    lineitem = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_money_sum(_rev()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


# --- TPC-H Q12 shape: conditional counting by line status — CASE inside SUM
# classifying order priorities. ---------------------------------------------

def q_priority_class_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    lineitem = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(is_high).alias("high_line_count"),
            F.sum(1 - is_high).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# --- TPC-H Q18 shape: join against an agg-with-HAVING, top-k. --------------

def q_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


# --- TPC-H Q7 shape: bilateral trade — the same dimension (nation) joined
# twice under different roles (supplier nation vs customer nation). ---------

def q_bilateral_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supplier = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("supp_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cust_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n1), supplier.s_nationkey == n1.supp_nk)
        .join(F.broadcast(n2), customer.c_nationkey == n2.cust_nk)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(_money_sum(_rev()).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --- Q2 flavor (no partsupp in fixtures): correlated scalar MIN — suppliers
# at their nation's minimum account balance. --------------------------------

def q_nation_min_acctbal_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = _t(spark, sf_dir, "supplier")
    nation_min = supplier.groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        supplier.join(
            F.broadcast(nation_min),
            (supplier.s_nationkey == nation_min.nk) & (supplier.s_acctbal == nation_min.min_bal),
        )
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
        .orderBy("s_suppkey")
    )


# --- Full outer join: per-nation customer vs supplier counts (either side
# may be absent → COALESCE both key and counts). ----------------------------

def q_full_outer_nation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("cnk"))
        .agg(F.count("*").alias("cust_n"))
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("snk"))
        .agg(F.count("*").alias("supp_n"))
    )
    return (
        cust.join(supp, cust.cnk == supp.snk, "full_outer")
        .select(
            F.coalesce(F.col("cnk"), F.col("snk")).alias("nationkey"),
            F.coalesce(F.col("cust_n"), F.lit(0)).alias("n_customers"),
            F.coalesce(F.col("supp_n"), F.lit(0)).alias("n_suppliers"),
        )
        .orderBy("nationkey")
    )


# --- F8/reshape: explode — word frequencies over documents.text.  The
# split+explode+count pipeline is the canonical map-side-combine shape. -----

def q_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("text")
    words = docs.select(F.explode(F.split(F.lower(F.col("text")), " ")).alias("word"))
    return (
        words.filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(20)
    )


# --- §2.5 window: time-based RANGE frame — trailing 7-day spend per
# customer.  RANGE frames bound by *value* (event time), not row count —
# the form rolling features are built with; expressed through the SQL
# front door (same Catalyst plan as the DataFrame rangeBetween form). -------

def q_window_range_7day(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey, o_orderdate,
               round(sum(o_totalprice) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW
               ), 2) AS spend_7d
        FROM orders
        """
    )


# --- §2.5 window: first_value / last_value / nth_value over explicit
# frames (full-partition frame for last/nth — the default frame would
# stop at CURRENT ROW). -----------------------------------------------------

def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    order_cols = [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()]
    full = (
        Window.partitionBy("o_custkey")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderdate").over(full).alias("first_orderdate"),
        F.last("o_orderdate").over(full).alias("last_orderdate"),
        F.nth_value("o_orderkey", 2).over(full).alias("second_orderkey"),
    )


# --- §2.5 window: ntile quartiles *within* a partition (never a global
# single-partition window), then per-bucket stats — the quantile-bucketing
# shape used for per-group quality tiers. -----------------------------------

def q_window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return (
        orders.select(
            "o_orderpriority",
            "o_totalprice",
            F.ntile(4).over(w).cast("long").alias("quartile"),
        )
        .groupBy("o_orderpriority", "quartile")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
        .orderBy("o_orderpriority", "quartile")
    )


# --- Statistical aggregates: correlation / covariance / regression slope —
# single-pass distributed moments (no driver math). -------------------------

def q_correlation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("qty_price_covar"),
            F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias("price_per_qty"),
            F.round(F.var_samp("l_discount"), 8).alias("discount_var"),
        )
        .orderBy("l_returnflag")
    )


# --- Reshape: UNPIVOT (melt) grouped metrics to long form. -----------------

def q_unpivot_returnflag_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    wide = lineitem.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),  # integral-valued → exact
        _money_sum(F.col("l_extendedprice")).alias("sum_price"),
    )
    return (
        wide.unpivot(["l_returnflag"], ["sum_qty", "sum_price"], "metric", "val")
        .orderBy("l_returnflag", "metric")
    )


# --- Distribution-position windows: percent_rank / cume_dist ----------------


def q_customer_order_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each order's position in its CUSTOMER's price distribution —
    ``percent_rank`` ((rank−1)/(n−1)) and ``cume_dist`` (rank-with-ties
    / n), the two distribution-position window shapes the rest of the
    window family (§2.5) did not cover.  Both are rank-derived, so ties
    produce identical values on both engines by definition — no float
    ordering hazard; outputs still round to 6 for the hash.

    Scale shape: the window partitions on c_custkey — high cardinality,
    so the per-partition sort parallelizes across the cluster (contrast
    `salted_hot_key_agg`'s discussion of FEW-valued keys: percent_rank
    over a 5-valued key would funnel the table through 5 reducers and
    has no cheap salt rewrite because rank needs a total order per
    key; over customers it is embarrassingly parallel).  Single-order
    customers get percent_rank 0 (n−1 = 0 guard on both engines)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.round(F.percent_rank().over(w), 6).alias("price_pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("price_cume_dist"),
    )


_PERCENTILE_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice,
       round(percent_rank() OVER w, 6) AS price_pct_rank,
       round(cume_dist() OVER w, 6) AS price_cume_dist
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice ASC, o_orderkey ASC)
"""


# --- Robust outliers: median / MAD ------------------------------------------

MAD_CONSISTENCY = 1.4826  # Gaussian consistency constant for MAD -> sigma
MAD_CUTOFF = 3.5  # modified z-score threshold (Iglewicz & Hoaglin)


def q_robust_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment robust outlier audit over customer account balances:
    median, MAD (median absolute deviation), the robust sigma
    (1.4826·MAD), and how many customers exceed the modified z-score
    cutoff |x − med| > 3.5·1.4826·MAD.  The robust counterpart to
    `label_outliers`' mean/stddev z-score — outliers cannot poison the
    center/spread estimates they are measured against.

    Determinism: both engines compute the exact interpolated median
    ((a+b)/2 at even counts — identical IEEE arithmetic); med and MAD
    round to 6 BEFORE the threshold comparison so the flag thresholds
    the same value on both sides.

    Scale shape: two grouped EXACT median aggregations with the group
    statistics broadcast back (≤ |segments| rows).  Exact percentile
    state grows with per-group distinct values, so at 100 TB the swap-in
    is approx_percentile with an error budget — the self-validating
    pattern `approx_percentile_sketch` already demonstrates; the
    join/flag structure is unchanged."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")
    med = cust.groupBy("c_mktsegment").agg(
        F.round(F.median("c_acctbal"), 6).alias("med"),
        F.count(F.lit(1)).cast("long").alias("n_customers"),
    )
    dev = cust.join(F.broadcast(med), "c_mktsegment").select(
        "c_mktsegment", "med", "n_customers",
        F.abs(F.col("c_acctbal") - F.col("med")).alias("absdev"),
    )
    mad = dev.groupBy("c_mktsegment", "med", "n_customers").agg(
        F.round(F.median("absdev"), 6).alias("mad")
    )
    flagged = dev.select("c_mktsegment", "absdev").join(
        F.broadcast(mad.select("c_mktsegment", "mad")), "c_mktsegment"
    )
    n_out = flagged.groupBy("c_mktsegment").agg(
        F.sum(
            (
                F.col("absdev")
                > F.lit(MAD_CUTOFF) * F.lit(MAD_CONSISTENCY) * F.col("mad")
            ).cast("long")
        ).alias("n_outliers")
    )
    return (
        mad.join(n_out, "c_mktsegment")
        .select(
            "c_mktsegment",
            "n_customers",
            "med",
            "mad",
            F.round(F.lit(MAD_CONSISTENCY) * F.col("mad"), 6).alias("robust_sigma"),
            "n_outliers",
        )
        .orderBy("c_mktsegment")
    )


_MAD_SQL = f"""
WITH med AS (
  SELECT c_mktsegment,
         round(median(c_acctbal), 6) AS med,
         CAST(count(*) AS BIGINT) AS n_customers
  FROM customer GROUP BY c_mktsegment
), dev AS (
  SELECT c.c_mktsegment, med.med, med.n_customers,
         abs(c.c_acctbal - med.med) AS absdev
  FROM customer c JOIN med ON c.c_mktsegment = med.c_mktsegment
), mad AS (
  SELECT c_mktsegment, med, n_customers,
         round(median(absdev), 6) AS mad
  FROM dev GROUP BY c_mktsegment, med, n_customers
)
SELECT mad.c_mktsegment, mad.n_customers, mad.med, mad.mad,
       round({MAD_CONSISTENCY} * mad.mad, 6) AS robust_sigma,
       CAST(sum(CAST(dev.absdev > {MAD_CUTOFF} * {MAD_CONSISTENCY} * mad.mad AS BIGINT)) AS BIGINT) AS n_outliers
FROM dev JOIN mad ON dev.c_mktsegment = mad.c_mktsegment
GROUP BY mad.c_mktsegment, mad.n_customers, mad.med, mad.mad
ORDER BY mad.c_mktsegment
"""


# --- Winsorized statistics ---------------------------------------------------

WINSOR_LO = 0.05  # clamp floor percentile
WINSOR_HI = 0.95  # clamp ceiling percentile


def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment WINSORIZED mean/spread of customer account balances —
    the third robust-statistics shape next to `robust_outliers_mad`
    (median/MAD) and `label_outliers` (z-score): clamp every value into
    the exact [p05, p95] interpolated-percentile interval, then average
    the clamped values.  Winsorizing keeps the tails' ROW COUNT (unlike
    trimming) while bounding their leverage — the estimator a billing
    dashboard wants when a few extreme balances would drag the mean.

    Determinism: p05/p95 are exact interpolated percentiles rounded to
    6 (identical doubles both engines — the `percentile_stats` rule),
    so the clamp thresholds match bitwise; each clamped value quantizes
    to DECIMAL(18,6) before the sum (exact fold at any parallelism) and
    the single mean division runs on identical doubles, rounded 4.

    Scale shape: one grouped exact-percentile aggregation (≤ |segments|
    rows broadcast back) + one grouped sum — two shuffles keyed on the
    segment.  Exact percentile state grows with per-group distinct
    values; at 100 TB swap in approx_percentile with an error budget
    (the `robust_outliers_mad` documented swap) — clamp/mean unchanged."""
    cust = _t(spark, sf_dir, "customer").select("c_mktsegment", "c_acctbal")
    pct = cust.groupBy("c_mktsegment").agg(
        F.round(F.expr(f"percentile(c_acctbal, {WINSOR_LO})"), 6).alias("p_lo"),
        F.round(F.expr(f"percentile(c_acctbal, {WINSOR_HI})"), 6).alias("p_hi"),
        F.count(F.lit(1)).cast("long").alias("n_customers"),
    )
    clamped = cust.join(F.broadcast(pct), "c_mktsegment").select(
        "c_mktsegment",
        "n_customers",
        "p_lo",
        "p_hi",
        F.least(F.greatest(F.col("c_acctbal"), F.col("p_lo")), F.col("p_hi"))
        .cast("decimal(18,6)")
        .alias("clamped"),
        (F.col("c_acctbal") < F.col("p_lo")).cast("long").alias("is_lo"),
        (F.col("c_acctbal") > F.col("p_hi")).cast("long").alias("is_hi"),
    )
    return (
        clamped.groupBy("c_mktsegment", "n_customers", "p_lo", "p_hi")
        .agg(
            F.round(
                F.sum("clamped").cast("double") / F.col("n_customers"), 4
            ).alias("winsorized_mean"),
            F.sum("is_lo").alias("n_clamped_lo"),
            F.sum("is_hi").alias("n_clamped_hi"),
        )
        .select(
            "c_mktsegment",
            "n_customers",
            "p_lo",
            "p_hi",
            "winsorized_mean",
            "n_clamped_lo",
            "n_clamped_hi",
        )
        .orderBy("c_mktsegment")
    )


_WINSOR_SQL = f"""
WITH pct AS (
  SELECT c_mktsegment,
         round(quantile_cont(c_acctbal, {WINSOR_LO}), 6) AS p_lo,
         round(quantile_cont(c_acctbal, {WINSOR_HI}), 6) AS p_hi,
         CAST(count(*) AS BIGINT) AS n_customers
  FROM customer GROUP BY c_mktsegment
), clamped AS (
  SELECT c.c_mktsegment, pct.n_customers, pct.p_lo, pct.p_hi,
         CAST(least(greatest(c.c_acctbal, pct.p_lo), pct.p_hi)
              AS DECIMAL(18,6)) AS v,
         CAST(c.c_acctbal < pct.p_lo AS BIGINT) AS is_lo,
         CAST(c.c_acctbal > pct.p_hi AS BIGINT) AS is_hi
  FROM customer c JOIN pct ON c.c_mktsegment = pct.c_mktsegment
)
SELECT c_mktsegment, n_customers, p_lo, p_hi,
       round(CAST(sum(v) AS DOUBLE) / n_customers, 4) AS winsorized_mean,
       CAST(sum(is_lo) AS BIGINT) AS n_clamped_lo,
       CAST(sum(is_hi) AS BIGINT) AS n_clamped_hi
FROM clamped
GROUP BY c_mktsegment, n_customers, p_lo, p_hi
ORDER BY c_mktsegment
"""


# --- One-pass table profiling -------------------------------------------------

# canonical per-column string formats: C-style printf templates that Spark's
# format_string and DuckDB's printf render identically; fixed-width
# zero-padding makes lexicographic min/max == numeric min/max for the
# non-negative fixture domains (keys, prices).  o_totalprice carries 2
# decimals in the fixture, so %.2f re-rounds nothing.
PROFILE_FORMATS = {
    "o_orderkey": "%020d",
    "o_custkey": "%020d",
    "o_orderstatus": None,  # raw string
    "o_totalprice": "%020.2f",
    "o_orderdate": "ts",  # ISO timestamp text
    "o_orderpriority": None,
}


def q_table_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass data-profiling of the orders table — per column: row
    count, null count, distinct count, and canonical-format min/max —
    the quality summary an ingestion gate records per batch (the
    warehouse counterpart of `catalog.describe`'s schema-only
    introspection, S10).

    The profile UNPIVOTS first (one array-of-structs explode — column
    name + canonically formatted value) and aggregates grouped by
    column name: ONE scan of the table regardless of column count,
    versus the per-column-aggregate form whose mixed distinct sets
    plan an Expand (the `approx_distinct` r11 lesson: Expand cost 10×).
    Formats are C-printf templates both engines render identically;
    fixed-width zero-padding makes the string min/max numerically
    faithful on the non-negative domains.

    Scale shape: explode(|columns|) is a narrow map ×6; the aggregation
    shuffles (column, value) once for the distinct count, map-side
    combined — the same cost class as one global countDistinct."""
    o = _t(spark, sf_dir, "orders")
    entries = []
    for c, spec in PROFILE_FORMATS.items():
        if spec is None:
            v = F.col(c)
        elif spec == "ts":
            v = F.date_format(c, "yyyy-MM-dd HH:mm:ss")
        else:
            v = F.format_string(spec, F.col(c))
        entries.append(
            F.struct(
                F.lit(c).alias("column"),
                F.when(F.col(c).isNull(), F.lit(None).cast("string"))
                .otherwise(v)
                .alias("v"),
            )
        )
    kv = o.select(F.explode(F.array(*entries)).alias("kv")).select(
        F.col("kv.column").alias("column"), F.col("kv.v").alias("v")
    )
    return (
        kv.groupBy("column")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.col("v").isNull().cast("long")).alias("n_nulls"),
            F.countDistinct("v").cast("long").alias("n_distinct"),
            F.min("v").alias("min_str"),
            F.max("v").alias("max_str"),
        )
        .orderBy("column")
    )


def _profile_sql() -> str:
    branches = []
    for c, spec in PROFILE_FORMATS.items():
        if spec is None:
            v = c
        elif spec == "ts":
            v = f"strftime({c}, '%Y-%m-%d %H:%M:%S')"
        else:
            v = f"printf('{spec}', {c})"
        branches.append(
            f"SELECT '{c}' AS \"column\","
            f" CASE WHEN {c} IS NULL THEN NULL ELSE {v} END AS v FROM orders"
        )
    union = "\nUNION ALL\n".join(branches)
    return f"""
WITH kv AS (
{union}
)
SELECT "column",
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(v IS NULL AS BIGINT)) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
       min(v) AS min_str,
       max(v) AS max_str
FROM kv
GROUP BY "column"
ORDER BY "column"
"""


# --- Salted two-stage aggregation (hot-key skew pattern) --------------------

SALT_BUCKETS = 16


def q_salted_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation over lineitem's hottest grouping —
    l_returnflag has only 3 distinct values, so a naive groupBy funnels
    the entire fact table through 3 reducers.  Stage 1 aggregates on
    (flag, salt) with a deterministic 16-way salt (pmod(l_orderkey, 16)
    — data-derived, no RNG, so the plan is bit-reproducible); stage 2
    re-aggregates the ≤ |keys|·16 partials on the bare flag.  The salt
    never reaches the output and the result is provably identical to
    the direct groupBy (the DuckDB oracle IS the unsalted query).

    Fold-exactness: both stages sum DECIMAL(18,6)-quantized inputs, so
    the extra reassociation the salt introduces cannot change a cent;
    avg derives from exact sum / exact count at the final stage.

    Scale shape: stage 1 is a map-side-combined shuffle over 3×16 keys
    spread across 16 reducers per hot key; stage 2 moves ≤ 48 partial
    rows.  This is the manual skew-spread for FULL aggregation over
    few-valued keys, where AQE's skew handling (which targets joins and
    partition splitting) does not apply; sums/counts re-associate, so
    avg must ship (sum, count) pairs — it does."""
    li = _t(spark, sf_dir, "lineitem")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    partial = (
        li.groupBy(
            "l_returnflag", F.pmod(F.col("l_orderkey"), F.lit(SALT_BUCKETS)).alias("salt")
        )
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("p_qty"),
            F.sum(revenue).alias("p_rev"),
            F.count(F.lit(1)).alias("p_n"),
        )
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(
            F.round(F.sum("p_qty"), 2).cast("double").alias("sum_qty"),
            F.round(F.sum("p_rev"), 2).cast("double").alias("sum_revenue"),
            F.sum("p_n").cast("long").alias("n_items"),
            F.round(
                F.sum("p_rev").cast("double") / F.sum("p_n"), 6
            ).alias("avg_revenue"),
        )
        .orderBy("l_returnflag")
    )


_SALTED_SQL = """
SELECT l_returnflag,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_revenue,
       CAST(count(*) AS BIGINT) AS n_items,
       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
             / count(*), 6) AS avg_revenue
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# --- SCD Type-2 point-in-time dimension join --------------------------------

SCD2_BREAK1 = "1994-01-01 00:00:00"  # v1 -> v2: acctbal correction era
SCD2_BREAK2 = "1996-01-01 00:00:00"  # v2 -> v3: segment reassignment era
SCD2_LO = "1900-01-01 00:00:00"
SCD2_HI = "2100-01-01 00:00:00"


def q_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (Type 2) point-in-time join — the
    classic warehouse temporal-modeling shape: the customer dimension
    carries three effective-dated versions (v2 corrects acctbal +500 for
    ``custkey % 5 == 0``; v3 reassigns ``custkey % 7 == 0`` to
    MACHINERY), and every order joins the version IN EFFECT on its order
    date (``o_orderdate ∈ [eff_from, eff_to)``), never the current one.
    Output: orders/revenue per (version era, effective segment) — an
    order attributed to a segment its customer did not belong to on that
    date changes the hash.

    The interval table here is built declaratively; in production it is
    exactly what the snapshot CDC surface emits
    (`snapshot_incremental_read` deltas folded into effective ranges).

    Scale shape: the join is EQUI-keyed on custkey with the interval
    predicate as a residual filter — Catalyst plans a plain hash/SMJ
    join on the key, and the fan-out per order is bounded by the
    versions-per-key (3 here; small by SCD2 construction), so the
    temporal join costs the same as the plain dimension join plus a
    narrow filter.  At 100 TB both sides bucket by custkey and the join
    is exchange-free (`bucketed_colocated_join`); no range-join
    explosion exists anywhere."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    ts = lambda s: F.lit(s).cast("timestamp")  # noqa: E731
    bal2 = F.when(
        F.col("c_custkey") % 5 == 0, F.col("c_acctbal") + F.lit(500.0)
    ).otherwise(F.col("c_acctbal"))
    seg3 = F.when(F.col("c_custkey") % 7 == 0, F.lit("MACHINERY")).otherwise(
        F.col("c_mktsegment")
    )
    v1 = cust.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit(1).cast("long").alias("version"),
        ts(SCD2_LO).alias("eff_from"),
        ts(SCD2_BREAK1).alias("eff_to"),
    )
    v2 = cust.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        bal2.alias("acctbal"),
        F.lit(2).cast("long").alias("version"),
        ts(SCD2_BREAK1).alias("eff_from"),
        ts(SCD2_BREAK2).alias("eff_to"),
    )
    v3 = cust.select(
        "c_custkey",
        seg3.alias("segment"),
        bal2.alias("acctbal"),
        F.lit(3).cast("long").alias("version"),
        ts(SCD2_BREAK2).alias("eff_from"),
        ts(SCD2_HI).alias("eff_to"),
    )
    dim = v1.unionByName(v2).unionByName(v3)
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    joined = orders.join(
        dim,
        (F.col("o_custkey") == F.col("c_custkey"))
        & (F.col("o_orderdate") >= F.col("eff_from"))
        & (F.col("o_orderdate") < F.col("eff_to")),
    )
    return (
        joined.groupBy("version", "segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.countDistinct("o_custkey").cast("long").alias("n_customers"),
            _money_sum(F.col("o_totalprice")).alias("revenue"),
            _money_avg(F.col("acctbal")).alias("avg_eff_acctbal"),
        )
        .orderBy("version", "segment")
    )


_SCD2_SQL = f"""
WITH dim AS (
  SELECT c_custkey, c_mktsegment AS segment, c_acctbal AS acctbal,
         CAST(1 AS BIGINT) AS version,
         TIMESTAMP '{SCD2_LO}' AS eff_from, TIMESTAMP '{SCD2_BREAK1}' AS eff_to
  FROM customer
  UNION ALL
  SELECT c_custkey, c_mktsegment,
         CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 500.0 ELSE c_acctbal END,
         CAST(2 AS BIGINT),
         TIMESTAMP '{SCD2_BREAK1}', TIMESTAMP '{SCD2_BREAK2}'
  FROM customer
  UNION ALL
  SELECT c_custkey,
         CASE WHEN c_custkey % 7 = 0 THEN 'MACHINERY' ELSE c_mktsegment END,
         CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 500.0 ELSE c_acctbal END,
         CAST(3 AS BIGINT),
         TIMESTAMP '{SCD2_BREAK2}', TIMESTAMP '{SCD2_HI}'
  FROM customer
)
SELECT version, segment,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS revenue,
       round(CAST(sum(CAST(acctbal AS DECIMAL(18,6))) AS DOUBLE) / count(*), 2)
         AS avg_eff_acctbal
FROM orders JOIN dim
  ON o_custkey = c_custkey
 AND o_orderdate >= eff_from AND o_orderdate < eff_to
GROUP BY version, segment
ORDER BY version, segment
"""


QUERIES: dict[str, QuerySpec] = {
    "scd2_point_in_time": QuerySpec(
        q_scd2_point_in_time,
        _SCD2_SQL,
        "SCD Type-2 point-in-time dimension join: effective-dated "
        "versions, equi-key join with interval residual",
    ),
    "customer_order_percentile": QuerySpec(
        q_customer_order_percentile,
        _PERCENTILE_SQL,
        "percent_rank + cume_dist of each order in its customer's price "
        "distribution (distribution-position window shapes)",
    ),
    "robust_outliers_mad": QuerySpec(
        q_robust_outliers_mad,
        _MAD_SQL,
        "per-segment median/MAD robust outlier audit (modified z-score, "
        "the outlier-resistant counterpart to label_outliers)",
    ),
    "winsorized_stats": QuerySpec(
        q_winsorized_stats,
        _WINSOR_SQL,
        "per-segment winsorized mean: exact p05/p95 clamp, decimal-"
        "quantized fold, clamp-count tails",
    ),
    "table_profile_orders": QuerySpec(
        q_table_profile_orders,
        _profile_sql(),
        "one-pass per-column profiling (rows/nulls/distinct/min/max) "
        "via unpivot-then-aggregate — no Expand, one scan",
    ),
    "salted_hot_key_agg": QuerySpec(
        q_salted_hot_key_agg,
        _SALTED_SQL,
        "two-stage salted aggregation over a 3-valued hot key — oracle is "
        "the direct unsalted GROUP BY (skew-spread equivalence proof)",
    ),
    "order_priority_exists": QuerySpec(
        q_order_priority_exists,
        """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "TPC-H Q4 shape: correlated EXISTS as semi join with non-equi residual",
    ),
    "customer_order_distribution": QuerySpec(
        q_customer_order_distribution,
        """
        SELECT n_orders, count(*) AS n_customers
        FROM (
          SELECT c_custkey, count(o_orderkey) AS n_orders
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey
        )
        GROUP BY n_orders ORDER BY n_customers DESC, n_orders DESC
        """,
        "TPC-H Q13 shape: left outer join + distribution (agg of agg)",
    ),
    "promo_revenue_ratio": QuerySpec(
        q_promo_revenue_ratio,
        """
        SELECT round(100.0 * CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE)
                      / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 4) AS promo_pct,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
        """,
        "TPC-H Q14 shape: conditional aggregation ratio",
    ),
    "disjunctive_part_filter": QuerySpec(
        q_disjunctive_part_filter,
        """
        SELECT CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
               count(*) AS n_lineitems
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50 AND l_quantity BETWEEN 20 AND 30)
        """,
        "TPC-H Q19 shape: disjunctive OR-of-AND predicates",
    ),
    "idle_rich_customers": QuerySpec(
        q_idle_rich_customers,
        """
        SELECT c_mktsegment, count(*) AS n_customers,
               CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_bal
        FROM customer
        WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / count(*)
                           FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment ORDER BY c_mktsegment
        """,
        "TPC-H Q22 shape: scalar subquery threshold + NOT EXISTS anti join",
    ),
    "top_supplier_revenue": QuerySpec(
        q_top_supplier_revenue,
        """
        WITH rev AS (
          SELECT l_suppkey,
                 CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_rev
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_rev
        FROM supplier JOIN rev ON s_suppkey = l_suppkey
        WHERE total_rev = (SELECT max(total_rev) FROM rev)
        ORDER BY s_suppkey
        """,
        "TPC-H Q15 shape: agg view + max-of-agg scalar subquery",
    ),
    "returned_item_revenue": QuerySpec(
        q_returned_item_revenue,
        """
        SELECT c_custkey, c_name, n_name,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1997-07-01' AND o_orderdate < TIMESTAMP '1997-10-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey ASC LIMIT 20
        """,
        "TPC-H Q10 shape: returned-item revenue top-k",
    ),
    "priority_class_counts": QuerySpec(
        q_priority_class_counts,
        """
        SELECT l_linestatus,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_linestatus ORDER BY l_linestatus
        """,
        "TPC-H Q12 shape: conditional counting",
    ),
    "large_volume_orders": QuerySpec(
        q_large_volume_orders,
        """
        SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
        FROM orders
        JOIN (SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING round(sum(l_quantity), 2) > 150) big
          ON o_orderkey = big.l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
        """,
        "TPC-H Q18 shape: join against agg-with-HAVING, top-k",
    ),
    "bilateral_trade_volume": QuerySpec(
        q_bilateral_trade_volume,
        """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(extract(year FROM l_shipdate) AS BIGINT) AS l_year,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
        """,
        "TPC-H Q7 shape: one dimension joined twice under different roles",
    ),
    "nation_min_acctbal_suppliers": QuerySpec(
        q_nation_min_acctbal_suppliers,
        """
        SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        FROM supplier s
        WHERE s_acctbal = (SELECT min(s2.s_acctbal) FROM supplier s2
                           WHERE s2.s_nationkey = s.s_nationkey)
        ORDER BY s_suppkey
        """,
        "TPC-H Q2 flavor: correlated scalar MIN subquery",
    ),
    "full_outer_nation_counts": QuerySpec(
        q_full_outer_nation_counts,
        """
        SELECT COALESCE(cnk, snk) AS nationkey,
               COALESCE(cust_n, 0) AS n_customers,
               COALESCE(supp_n, 0) AS n_suppliers
        FROM (SELECT c_nationkey AS cnk, count(*) AS cust_n FROM customer GROUP BY 1) c
        FULL OUTER JOIN
             (SELECT s_nationkey AS snk, count(*) AS supp_n FROM supplier GROUP BY 1) s
          ON cnk = snk
        ORDER BY nationkey
        """,
        "full outer join of two aggregates with COALESCE",
    ),
    "word_count": QuerySpec(
        q_word_count,
        """
        SELECT word, count(*) AS n
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        WHERE word <> ''
        GROUP BY word ORDER BY n DESC, word ASC LIMIT 20
        """,
        "explode/split word frequencies (map-side-combine shape)",
    ),
    "window_range_7day": QuerySpec(
        q_window_range_7day,
        """
        SELECT o_custkey, o_orderkey, o_orderdate,
               round(sum(o_totalprice) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW
               ), 2) AS spend_7d
        FROM orders
        """,
        "§2.5 window: time-based RANGE frame (trailing 7-day rolling sum)",
    ),
    "window_first_last": QuerySpec(
        q_window_first_last,
        """
        SELECT o_custkey, o_orderkey,
               first_value(o_orderdate) OVER w AS first_orderdate,
               last_value(o_orderdate) OVER w AS last_orderdate,
               nth_value(o_orderkey, 2) OVER w AS second_orderkey
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate ASC, o_orderkey ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        """,
        "§2.5 window: first_value/last_value/nth_value over a full frame",
    ),
    "window_ntile_quartiles": QuerySpec(
        q_window_ntile_quartiles,
        """
        SELECT o_orderpriority, quartile, count(*) AS n_orders,
               round(avg(o_totalprice), 2) AS avg_price
        FROM (
          SELECT o_orderpriority, o_totalprice,
                 CAST(ntile(4) OVER (PARTITION BY o_orderpriority
                      ORDER BY o_totalprice ASC, o_orderkey ASC) AS BIGINT) AS quartile
          FROM orders
        )
        GROUP BY o_orderpriority, quartile ORDER BY o_orderpriority, quartile
        """,
        "§2.5 window: partitioned ntile quartiles + per-bucket stats",
    ),
    "correlation_stats": QuerySpec(
        q_correlation_stats,
        """
        SELECT l_returnflag,
               round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
               round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
               round(regr_slope(l_extendedprice, l_quantity), 6) AS price_per_qty,
               round(var_samp(l_discount), 8) AS discount_var
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "distributed single-pass moments: corr/covar/regr_slope/variance",
    ),
    "unpivot_returnflag_metrics": QuerySpec(
        q_unpivot_returnflag_metrics,
        """
        SELECT l_returnflag, 'sum_qty' AS metric, round(sum(l_quantity), 2) AS val
        FROM lineitem GROUP BY l_returnflag
        UNION ALL
        SELECT l_returnflag, 'sum_price' AS metric,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS val
        FROM lineitem GROUP BY l_returnflag
        ORDER BY l_returnflag, metric
        """,
        "UNPIVOT/melt wide metrics to long form",
    ),
}
