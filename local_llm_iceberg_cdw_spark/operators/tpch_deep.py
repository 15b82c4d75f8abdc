"""Deep TPC-H decision-support shapes — the second extension batch.

Completes the classic TPC-H query-shape inventory the first two relational
modules left out: Q2 (min-cost-supplier join-back), Q8 (market share with a
double nation role), Q9 (profit by supplier nation and year), Q11
(value-concentration HAVING against a scalar aggregate), Q16
(distinct-count with NOT IN exclusion), Q17 (correlated per-group average
threshold), Q20 (nested semi-join chain), Q21 (multi-supplier wait
analysis — EXISTS plus NOT EXISTS over the same fact table).

The fixture schema has no ``partsupp`` table, so part↔supplier
relationships derive from ``lineitem`` (the observed supply graph) and
"supply cost" is the observed minimum unit price
``min(l_extendedprice / l_quantity)``; TPC-H's nation/region constants map
onto the fixture's NATION_*/region names.  The reference engine's prompt
contract obliges it to run arbitrary analyst SQL of exactly these shapes
over the warehouse schema (``/root/reference/app-gradio.py:134-140``).

Scale notes (100 TB design intent):
- Q2/Q11/Q17's "compare to an aggregate of the same fact table" all
  follow one pattern: aggregate once, join back on the group key (never a
  window over the raw fact table, which would shuffle the full input to
  co-locate rows that the agg-side shuffle already co-located at 1/Nth
  the volume).  The scalar (0-key) variants broadcast a 1-row DataFrame.
- Q8/Q9's dimension sides (part filtered by type/name, nation, region,
  supplier) broadcast; the only big shuffles are lineitem⋈orders and the
  final groupBy, both on keys with ~uniform cardinality.
- Q16's NOT IN lowers to a broadcast left-anti join (negative-balance
  suppliers are a tiny filtered dim); count(DISTINCT) shuffles once on
  the grouping key with partial aggregation map-side.
- Q21 aggregates lineitem⋈orders once per order (countDistinct suppliers,
  countDistinct late suppliers) then joins back on l_orderkey — the same
  agg-then-join-back pattern, replacing TPC-H's correlated EXISTS +
  NOT EXISTS pair with one extra hash aggregate instead of two extra
  scans of the fact table.
- All money/quantity sums go through DECIMAL(18,6) (exact,
  order-independent) before any rounding or division, so results are
  bit-stable under Spark's nondeterministic partition fold order
  (round-1 lesson from ``bilateral_trade_volume``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import QuerySpec
from .relational import _money_sum


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _dec(col):
    return col.cast("decimal(18,6)")


# --- Q2 shape: minimum-cost supplier per part (agg + join-back) -------------

def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For LARGE parts of size ≥ 40, the EUROPE supplier(s) offering the
    observed minimum unit price.  Aggregate-then-join-back twice: once to
    build the (part, supplier) cost matrix, once to pick each part's min."""
    lineitem = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    part = _t(spark, sf_dir, "part")

    cost = lineitem.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supply_cost")
    )
    eligible = (
        cost.join(F.broadcast(supplier), cost.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == region.r_regionkey,
        )
        .select("l_partkey", "l_suppkey", "supply_cost", "s_name", "n_name", "s_acctbal")
    )
    # Min-per-part as a window over the AGGREGATED cost matrix (not the
    # raw fact table): one shuffle on l_partkey replaces the
    # agg-then-join-back pair, which executed the eligible subtree twice.
    from pyspark.sql.window import Window

    min_cost = F.min("supply_cost").over(Window.partitionBy("l_partkey"))
    sized_parts = part.filter((F.col("p_size") >= 40) & (F.col("p_type") == "LARGE"))
    return (
        eligible.withColumn("min_cost", min_cost)
        .filter(F.col("supply_cost") == F.col("min_cost"))
        .join(F.broadcast(sized_parts), eligible.l_partkey == sized_parts.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.round("supply_cost", 4).alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# --- Q8 shape: national market share within a region by year ----------------

def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_2's share of ECONOMY-part revenue sold to AMERICA customers,
    by order year.  nation plays two roles (customer side and supplier
    side) — both broadcast."""
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")

    cust_nation = nation.select(
        F.col("n_nationkey").alias("cn_nationkey"), F.col("n_regionkey").alias("cn_regionkey")
    )
    supp_nation = nation.select(
        F.col("n_nationkey").alias("sn_nationkey"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    sales = (
        lineitem.join(F.broadcast(part.filter(F.col("p_type") == "ECONOMY")),
                      lineitem.l_partkey == part.p_partkey)
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(cust_nation), customer.c_nationkey == F.col("cn_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "AMERICA")),
            F.col("cn_regionkey") == region.r_regionkey,
        )
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(supp_nation), supplier.s_nationkey == F.col("sn_nationkey"))
    )
    return (
        sales.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(_dec(F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(F.lit(0.0))))
                .cast("double")
                / F.sum(_dec(vol)).cast("double"),
                6,
            ).alias("mkt_share"),
            _money_sum(vol).alias("total_volume"),
        )
        .orderBy("o_year")
    )


# --- Q9 shape: profit by supplier nation and year ---------------------------

def q_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on red parts by supplier nation and order year.  No partsupp
    table → supply cost proxied as 40% of the part's retail price per unit
    (a fixed pipeline constant, not data-derived)."""
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    part = _t(spark, sf_dir, "part")

    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.4) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_name").like("%red%"))),
            lineitem.l_partkey == part.p_partkey,
        )
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(_money_sum(amount).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# --- Q11 shape: value concentration vs a scalar aggregate -------------------

def q_part_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose lineitem value (from well-capitalized suppliers) exceeds
    1.2× the average part value.  The global average is a 1-row broadcast
    cross join, never a collect(); per-part sums stay DECIMAL until the
    final comparison/round so the threshold test is order-independent."""
    lineitem = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")

    # localCheckpoint: v feeds both the scalar normalizer and the filter;
    # without it the lineitem join+agg subtree executes twice (no
    # ReusedExchange fires — the agg-on-top branches differ).  v is
    # bounded by distinct parts, orders of magnitude below lineitem.
    v = (
        lineitem.join(
            F.broadcast(supplier.filter(F.col("s_acctbal") > 2000)),
            lineitem.l_suppkey == supplier.s_suppkey,
            "inner",
        )
        .groupBy("l_partkey")
        .agg(F.sum(_dec(F.col("l_extendedprice"))).alias("val_dec"))
        .localCheckpoint(eager=True)
    )
    totals = v.agg(
        F.sum("val_dec").cast("double").alias("total_val"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        v.crossJoin(F.broadcast(totals))
        .filter(
            F.col("val_dec").cast("double")
            > F.lit(1.2) * (F.col("total_val") / F.col("n_parts"))
        )
        .select(
            "l_partkey",
            F.round("val_dec", 2).cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


# --- Q16 shape: supplier diversity per part class with NOT IN exclusion -----

def q_supplier_part_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct supplier count per (brand, type, size) bucket, excluding one
    brand, the PROMO type, and negative-balance suppliers (NOT IN →
    broadcast anti join)."""
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supplier = _t(spark, sf_dir, "supplier")

    bad_suppliers = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    parts = part.filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 14, 23, 36, 45, 50)
    )
    return (
        lineitem.join(
            F.broadcast(bad_suppliers),
            lineitem.l_suppkey == bad_suppliers.s_suppkey,
            "left_anti",
        )
        .join(F.broadcast(parts), lineitem.l_partkey == parts.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# --- Q17 shape: correlated per-group average threshold ----------------------

def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average yearly revenue lost if Brand#3 orders below 20% of the
    part's average quantity went unshipped.  The correlated AVG subquery
    becomes aggregate-once + join-back on l_partkey; the threshold is
    computed identically in both engines (exact decimal sum → double →
    ×0.2) so the boundary comparison is bit-stable."""
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")

    brand_parts = part.filter(F.col("p_brand") == "Brand#3").select("p_partkey")
    li = lineitem.join(
        F.broadcast(brand_parts), lineitem.l_partkey == brand_parts.p_partkey
    )
    avg_qty = li.groupBy("l_partkey").agg(
        F.sum(_dec(F.col("l_quantity"))).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_li"),
    )
    return (
        li.join(avg_qty, "l_partkey")
        .filter(F.col("l_quantity") < F.lit(0.2) * (F.col("sum_qty") / F.col("n_li")))
        .agg(
            F.round(F.sum(_dec(F.col("l_extendedprice"))).cast("double") / F.lit(7.0), 2).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_small_lineitems"),
        )
    )


# --- Q20 shape: nested semi-join chain --------------------------------------

def q_bulk_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers that moved > 40 units of some 'small%' part during 1997 —
    TPC-H Q20's IN(IN(...)) chain as groupBy-HAVING → left-semi join.
    Quantity HAVING stays in DECIMAL (exact) on both engines."""
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")

    small_parts = part.filter(F.col("p_name").like("small%")).select("p_partkey")
    bulk = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .join(F.broadcast(small_parts), lineitem.l_partkey == small_parts.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec(F.col("l_quantity"))).alias("qty"))
        .filter(F.col("qty") > 40)
        .select("l_suppkey")
    )
    return (
        supplier.join(bulk, supplier.s_suppkey == bulk.l_suppkey, "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


# --- Q21 shape: the lone late supplier in multi-supplier orders -------------

def q_waiting_orders_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the ONLY late shipper (> 90 days after the order
    date) in finalized multi-supplier orders.  TPC-H Q21's correlated
    EXISTS + NOT EXISTS pair is one per-order aggregate (distinct
    suppliers, distinct late suppliers) joined back on l_orderkey — one
    extra hash agg instead of two extra fact-table scans."""
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supplier = _t(spark, sf_dir, "supplier")

    li = (
        lineitem.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            lineitem.l_orderkey == orders.o_orderkey,
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias(
                "late"
            ),
        )
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late_suppliers"),
    )
    waiting = (
        li.filter(F.col("late"))
        .join(per_order, "l_orderkey")
        .filter((F.col("n_suppliers") >= 2) & (F.col("n_late_suppliers") == 1))
    )
    return (
        waiting.join(F.broadcast(supplier), waiting.l_suppkey == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


QUERIES: dict[str, QuerySpec] = {
    "min_cost_supplier": QuerySpec(
        q_min_cost_supplier,
        """
        WITH cost AS (
          SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS supply_cost
          FROM lineitem GROUP BY l_partkey, l_suppkey
        ),
        eligible AS (
          SELECT l_partkey, l_suppkey, supply_cost, s_name, n_name, s_acctbal
          FROM cost
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE'
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
               round(supply_cost, 4) AS supply_cost
        FROM eligible
        JOIN (SELECT l_partkey, min(supply_cost) AS min_cost
              FROM eligible GROUP BY l_partkey) m USING (l_partkey)
        JOIN part ON p_partkey = l_partkey
        WHERE supply_cost = min_cost AND p_size >= 40 AND p_type = 'LARGE'
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
        """,
        "TPC-H Q2 shape: per-part min-cost supplier via agg + join-back",
    ),
    "market_share": QuerySpec(
        q_market_share,
        """
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               round(CAST(sum(CAST(CASE WHEN n2.n_name = 'NATION_2'
                                        THEN l_extendedprice * (1 - l_discount)
                                        ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE)
                     / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                                     AS DECIMAL(18,6))) AS DOUBLE), 6) AS mkt_share,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_volume
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
        GROUP BY o_year ORDER BY o_year
        """,
        "TPC-H Q8 shape: market share, nation in two join roles",
    ),
    "product_type_profit": QuerySpec(
        q_product_type_profit,
        """
        SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                                   - 0.4 * p_retailprice * l_quantity
                                   AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY n_name, year(o_orderdate) ORDER BY n_name, o_year DESC
        """,
        "TPC-H Q9 shape: profit by supplier nation and year (retail-price cost proxy)",
    ),
    "part_value_concentration": QuerySpec(
        q_part_value_concentration,
        """
        WITH v AS (
          SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS val_dec
          FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
          WHERE s_acctbal > 2000
          GROUP BY l_partkey
        ),
        t AS (SELECT CAST(sum(val_dec) AS DOUBLE) AS total_val, count(*) AS n_parts FROM v)
        SELECT l_partkey, CAST(round(val_dec, 2) AS DOUBLE) AS part_value
        FROM v, t
        WHERE CAST(val_dec AS DOUBLE) > 1.2 * (total_val / n_parts)
        ORDER BY part_value DESC, l_partkey
        """,
        "TPC-H Q11 shape: value concentration vs broadcast scalar average",
    ),
    "supplier_part_diversity": QuerySpec(
        q_supplier_part_diversity,
        """
        SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
          AND p_size IN (1, 5, 9, 14, 23, 36, 45, 50)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """,
        "TPC-H Q16 shape: distinct-supplier diversity with NOT IN anti join",
    ),
    "small_quantity_revenue": QuerySpec(
        q_small_quantity_revenue,
        """
        SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0, 2)
                 AS avg_yearly,
               count(*) AS n_small_lineitems
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#3'
          AND l_quantity < 0.2 * (
            SELECT CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*)
            FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
        """,
        "TPC-H Q17 shape: correlated per-part average-quantity threshold",
    ),
    "bulk_part_suppliers": QuerySpec(
        q_bulk_part_suppliers,
        """
        SELECT s_suppkey, s_name, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE s_suppkey IN (
          SELECT l_suppkey
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_name LIKE 'small%'
            AND l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate < TIMESTAMP '1998-01-01'
          GROUP BY l_suppkey, l_partkey
          HAVING sum(CAST(l_quantity AS DECIMAL(18,6))) > 40
        )
        ORDER BY s_suppkey
        """,
        "TPC-H Q20 shape: nested IN chain as groupBy-HAVING semi join",
    ),
    "waiting_orders_suppliers": QuerySpec(
        q_waiting_orders_suppliers,
        """
        WITH li AS (
          SELECT l_orderkey, l_suppkey,
                 (l_shipdate > o_orderdate + INTERVAL 90 DAY) AS late
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F'
        ),
        per_order AS (
          SELECT l_orderkey,
                 count(DISTINCT l_suppkey) AS n_suppliers,
                 count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late_suppliers
          FROM li GROUP BY l_orderkey
        )
        SELECT s_name, count(*) AS numwait
        FROM li
        JOIN per_order USING (l_orderkey)
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE late AND n_suppliers >= 2 AND n_late_suppliers = 1
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
        """,
        "TPC-H Q21 shape: lone-late-supplier wait analysis (EXISTS/NOT EXISTS as one agg)",
    ),
}
