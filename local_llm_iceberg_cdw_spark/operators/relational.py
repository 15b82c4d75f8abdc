"""Relational core — SURVEY.md §2 inventory as a Spark-first query library.

Every capability the reference exercises or contractually requires
(projection/filter P1-P9, joins J1-J6, aggregations A1-A5, window §2.5,
sort/limit O1-O3, set ops §2.7, scalar functions §2.8) expressed as
declarative DataFrame plans so Catalyst owns the physical strategy:
predicate pushdown and column pruning reach the parquet scans, small
dimensions broadcast, IN-subqueries become semi-joins, top-k becomes
TakeOrderedAndProject, and partial aggregation is map-side automatically.

Scale notes (100 TB design intent, validated at sf0.1 locally):
- Fact-fact joins (lineitem⋈orders) shuffle on the join key once; all
  subsequent groupings reuse that clustering where possible.
- Dimension joins (region/nation/part/customer at TPC-H ratios) are
  broadcast — `F.broadcast` hints where the dimension is provably small,
  otherwise AQE decides at runtime.
- Windows partition by high-cardinality keys (custkey/orderkey), never by
  constant keys, so no single-partition bottleneck.

Reference evidence is cited per query (file:line into /root/reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from . import QuerySpec


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# Money doubles (2-dp values stored as float64) sum in partition order, so a
# double SUM is not deterministic across engines/partitionings: r01 measured
# one of bilateral_trade_volume's 1,246 groups landing on the opposite side of
# a half-cent rounding boundary vs the DuckDB oracle.  Casting each term to
# DECIMAL(18,6) BEFORE the sum makes the aggregate exact (6 dp covers the
# widest true product: 2dp*2dp*2dp) and therefore order-independent; the final
# round+cast-to-double is then a deterministic function of an exact value.
# Oracles mirror the same cast chain.  DECIMAL(18,6) sums widen to (28,6) in
# Spark — no overflow until ~1e22 per group, safe at 100 TB.

def _money_sum(col, scale: int = 2):
    return F.round(F.sum(col.cast("decimal(18,6)")), scale).cast("double")


def _money_avg(col, scale: int = 2):
    # exact decimal sum / exact count, divided as doubles → deterministic.
    # (count(lit(1)) == count(*); money columns are non-null in the fixtures)
    return F.round(F.sum(col.cast("decimal(18,6)")).cast("double") / F.count(F.lit(1)), scale)


# ---------------------------------------------------------------------------
# Flagship (SURVEY §7.2): the reference's placeholder question "Compare total
# revenue between prepaid and postpaid plans" (app-gradio.py:114) transposed
# to the fixture schema: revenue grouped over a customer attribute, via the
# 3-table star join the reference's logged SQL demonstrates (README.md:75-79).
# ---------------------------------------------------------------------------

def q_flagship_revenue_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    revenue = _money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            revenue.alias("revenue"),
            F.count("*").alias("n_lineitems"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
        .orderBy(F.col("revenue").desc())
    )


_FLAGSHIP_SQL = """
SELECT c_mktsegment,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
       count(*) AS n_lineitems,
       count(DISTINCT o_orderkey) AS n_orders
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY revenue DESC
"""


# --- The SQL FRONT DOOR as a judged query: the flagship arrives as raw
# LLM output (markdown fence, SQLQuery: label, a trailing second statement,
# a :min_price named parameter, backtick identifiers) and must survive
# plans.sql's guard pipeline into spark.sql. ---------------------------------

SQL_ENTRY_MIN_PRICE = 900.0


def q_flagship_via_sql_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole generated-SQL path under driver adjudication, not just
    unit tests: `plans.sql.execute_sql` gets the flagship star join
    wrapped the way the reference's model emits SQL — inside a markdown
    code fence, behind a ``SQLQuery:`` label, with a junk second
    statement after the semicolon (must be truncated, O2), backtick
    identifiers (F2), and a ``:min_price`` named parameter bound by
    Spark instead of string-escaped (F1).  The oracle runs the same
    ANSI statement, so the fence-strip/label-strip/truncate/bind chain
    is hash-verified end to end.

    Scale: identical physical plan to `flagship_revenue_by_segment` —
    the guards are string-level; Catalyst sees the same query."""
    from ..catalog import register_views
    from ..plans.sql import execute_sql

    register_views(spark, sf_dir, tables=("lineitem", "orders", "customer"))
    raw = f"""SQLQuery: ```sql
SELECT `c_mktsegment`,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
       count(*) AS n_lineitems,
       count(DISTINCT o_orderkey) AS n_orders
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE o_totalprice >= :min_price
GROUP BY `c_mktsegment`
ORDER BY revenue DESC;
DROP TABLE lineitem
```"""
    return execute_sql(spark, raw, args={"min_price": SQL_ENTRY_MIN_PRICE})


_FLAGSHIP_SQL_ENTRY_ORACLE = f"""
SELECT c_mktsegment,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
       count(*) AS n_lineitems,
       count(DISTINCT o_orderkey) AS n_orders
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE o_totalprice >= {SQL_ENTRY_MIN_PRICE}
GROUP BY c_mktsegment
ORDER BY revenue DESC
"""


# --- U1–U3 as a judged query: the COMPLETE NL loop (question → LLM →
# SQL guards → spark.sql → plot decision → summary) under driver
# adjudication with a deterministic mock model. ------------------------------

NL_MOCK_SUMMARY = "Across the five priorities, order counts are nearly even."


def q_nl_answer_via_mock_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole chat loop judged end to end (VERDICT r14
    #4): three questions run through ``AnswerPipeline`` with a
    deterministic scripted model (`MockLLM` — the same injectable seam
    the OpenAI-compatible client plugs into), covering the three
    terminal branches of ``/root/reference/app-gradio.py``:

    1. ANSWER: the model returns fenced SQL behind a ``SQLQuery:`` label
       with a junk second statement (the guard chain must strip/truncate
       — app-gradio.py:149-155), then a fenced lowercase-boolean plot
       JSON (the true→True patch, :215-217), then a summary; the
       EXECUTED result rows are the hashed payload, with the summary
       text and parsed plot decision as hashed literal columns.
    2. EMPTY SHORT-CIRCUIT: a query with zero rows must answer the fixed
       "no matching records" string WITHOUT consulting the model again
       (:176-181) — pinned by the per-question LLM call count.
    3. EXECUTION ERROR: invalid generated SQL surfaces as the error
       answer, never raises (:183-186), again with no extra model call.

    Structural booleans (oracle: literal true): ``_empty_short_circuit``,
    ``_error_surfaced``, ``_llm_call_budget`` (exactly 3/1/1 calls).

    Scale: the NL layer is driver-side string work; the executed plan is
    whatever the generated SQL declares — here a single group-by over
    orders (same physical shape as `group_sum_by_priority`)."""
    from ..catalog import register_views
    from ..nl.chain import NO_RESULTS_ANSWER, AnswerPipeline, MockLLM

    register_views(spark, sf_dir, tables=("orders",))
    mock = MockLLM(
        [
            # Q1 — reference-shaped raw completion: label + fence + junk tail
            """SQLQuery: ```sql
SELECT o_orderpriority AS priority,
       count(*) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_price
FROM orders GROUP BY o_orderpriority ORDER BY priority;
DROP TABLE orders
```""",
            # Q1 plot decision — fenced JSON, lowercase booleans
            """```json
{"plottable": true, "chart_type": "bar", "title": "Orders by priority",
 "x_label": "priority", "y_label": "n_orders"}
```""",
            NL_MOCK_SUMMARY,  # Q1 summary
            "SELECT o_orderkey FROM orders WHERE o_totalprice < 0",  # Q2: empty
            "SELECT FROM nowhere",  # Q3: unparseable → execution error
        ]
    )
    pipe = AnswerPipeline(
        spark,
        mock,
        table_info="orders(o_orderkey, o_custkey, o_orderstatus, "
        "o_totalprice, o_orderdate, o_orderpriority)",
    )
    a = pipe.run("How many orders are there per priority?")
    calls_a = len(mock.calls)
    b = pipe.run("Which orders have a negative price?")
    calls_b = len(mock.calls) - calls_a
    c = pipe.run("Run something broken")
    calls_c = len(mock.calls) - calls_a - calls_b

    empty_short_circuit = (
        b.error == "" and b.rows == [] and b.text == NO_RESULTS_ANSWER
    )
    error_surfaced = (
        c.error.startswith("The query could not be executed") and c.rows == []
    )
    call_budget = calls_a == 3 and calls_b == 1 and calls_c == 1
    answered = spark.createDataFrame(
        [tuple(r) for r in a.rows],
        "priority string, n_orders long, total_price double",
    )
    return answered.select(
        "priority",
        "n_orders",
        "total_price",
        F.lit(a.text).alias("answer_text"),
        F.lit(bool(a.plot.plottable)).alias("plottable"),
        F.lit(a.plot.chart_type).alias("chart_type"),
        F.lit(bool(empty_short_circuit)).alias("_empty_short_circuit"),
        F.lit(bool(error_surfaced)).alias("_error_surfaced"),
        F.lit(bool(call_budget)).alias("_llm_call_budget"),
    ).orderBy("priority")


_NL_MOCK_ORACLE = f"""
SELECT o_orderpriority AS priority,
       count(*) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_price,
       '{NL_MOCK_SUMMARY}' AS answer_text,
       true AS plottable,
       'bar' AS chart_type,
       true AS _empty_short_circuit,
       true AS _error_surfaced,
       true AS _llm_call_budget
FROM orders GROUP BY o_orderpriority ORDER BY priority
"""


# --- P1/P2/O1/O3: projection + deterministic limit (prompt-mandated LIMIT,
# app-gradio.py:140; LIMIT 5 observed README.md:79). Ordered by a unique key
# so the limited row set is well-defined on any engine/partitioning. --------

def q_projection_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
        .limit(5)
    )


# --- P3/P4: predicates — string equality + date range (README.md:78,113-117)

def q_filter_date_range_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01"))
            & (F.col("o_orderdate") < F.lit("1998-01-01"))
            & (F.col("o_orderstatus") == "F")
        ).agg(F.count("*").alias("n_orders"))
    )


# --- P5/J3: IN-subquery → left-semi join (README.md:78: plan_id IN
# (SELECT plan_id FROM plans WHERE plan_type='Postpaid')) ------------------

def q_semi_join_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    # Catalyst rewrites IN(subquery) to exactly this left-semi; the dim side
    # broadcasts (part is |SF|*200 rows — tiny next to lineitem).
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey, "left_semi")
        .agg(F.count("*").alias("n_promo_lineitems"))
    )


# --- J6: anti join — "customers with no orders" ---------------------------

def q_anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


# --- J1/J2/J4: multi-table star join with broadcast dims (TPC-H Q5 shape) --

def q_star_join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = _money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(revenue.alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


# --- J5: theta (non-equi) join, bounded dims ------------------------------

def q_theta_join_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    customer = _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    # Non-equi predicate → BroadcastNestedLoopJoin; acceptable because the
    # supplier side is the smallest table in the schema (broadcast it).
    return (
        customer.join(F.broadcast(supplier), supplier.s_acctbal > customer.c_acctbal)
        .agg(F.count("*").alias("n_pairs"))
    )


# --- A1/A2: scalar aggregates (COUNT(*) README.md:84; MAX append_iceberg.py:116)

def q_scalar_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.agg(
        F.count("*").alias("n_orders"),
        F.max("o_orderkey").alias("max_orderkey"),
        F.min("o_orderdate").alias("min_orderdate"),
        F.max("o_orderdate").alias("max_orderdate"),
        _money_sum(F.col("o_totalprice")).alias("sum_totalprice"),
    )


# --- A4: GROUP BY + SUM (flagship chart contract, app-gradio.py:197-201) ---

def q_group_sum_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            _money_sum(F.col("o_totalprice")).alias("total_price"),
            _money_avg(F.col("o_totalprice")).alias("avg_price"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


# --- A5: DISTINCT / count distinct -----------------------------------------

def q_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.agg(
        F.countDistinct("o_custkey").alias("n_customers_with_orders"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
    )


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # HLL++ estimates are engine-specific, so the sketch value itself can't be
    # oracle-checked.  Self-validating form instead: emit the exact distinct
    # counts plus booleans asserting the sketch landed within a 5% envelope —
    # the oracle is then fully deterministic (exact counts + literal true).
    # rsd=0.01 makes 5% a ~5-sigma bound (the default rsd=0.05 is 1-sigma, and
    # at sf0.001 the l_partkey estimate measurably missed 5%).
    #
    # The exact and approx families run as TWO single-pass aggregates
    # crossed via a 1-row broadcast: mixing countDistinct with
    # approx_count_distinct in one agg makes Catalyst plan an Expand
    # (one projection per distinct set) and drops the p=14 HLL buffers
    # out of partial hash aggregation — measured 20.3 s combined vs
    # 1.7 s + 2.1 s split at sf0.1 (the r11 registry-rest sweep caught
    # the 10x; the two clean scans also beat the tripled Expand scan at
    # any data size).
    lineitem = _t(spark, sf_dir, "lineitem")
    exact = lineitem.agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )
    approx = lineitem.agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
    )
    return exact.crossJoin(F.broadcast(approx)).select(
        "exact_parts",
        "exact_orders",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts")) / F.col("exact_parts")
            <= 0.05
        ).alias("parts_within_5pct"),
        (
            F.abs(F.col("approx_orders") - F.col("exact_orders"))
            / F.col("exact_orders")
            <= 0.05
        ).alias("orders_within_5pct"),
    )


# --- A5: ROLLUP (grouping sets family; partial/final agg automatic) --------

def q_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count("*").alias("n_rows"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


# --- TPC-H Q1 shape: the canonical wide aggregate over the scaling table ---

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),  # integral-valued → exact
            _money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            _money_sum(disc_price).alias("sum_disc_price"),
            _money_sum(charge).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),  # exact sum → deterministic avg
            _money_avg(F.col("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- §2.5 window: ranking — latest order per customer ----------------------

def q_window_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.col("o_orderdate").alias("latest_orderdate"),
        )
    )


# --- §2.5 window: moving aggregate — running revenue per customer ----------

def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    order_spec = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    frame = order_spec.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(frame), 2).alias("running_total"),
        F.row_number().over(order_spec).cast("long").alias("order_seq"),
    )


# --- §2.5 window: lag — days since previous order per customer -------------

def q_window_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    prev = F.lag("o_orderdate").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), prev).alias("days_since_prev"),
    )


# --- O3: top-k with deterministic tie-break --------------------------------

def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    # orderBy+limit lowers to TakeOrderedAndProject — no global sort at scale.
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


# --- §2.7 set ops -----------------------------------------------------------

def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    orders = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return customer.intersect(orders)


def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    orders = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return customer.exceptAll(orders.distinct())


def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("key"))
    b = _t(spark, sf_dir, "events").select(F.col("user_id").alias("key"))
    return a.union(b).distinct()


# --- P6/F-surface: CASE WHEN bucketing + null-safe logic --------------------

def q_case_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "low")
        .when(F.col("c_acctbal") < 8000, "mid")
        .otherwise("high")
    )
    return (
        customer.groupBy(bucket.alias("balance_bucket"))
        .agg(F.count("*").alias("n_customers"), _money_avg(F.col("c_acctbal")).alias("avg_bal"))
        .orderBy("balance_bucket")
    )


# --- F3: date functions — monthly order volume ------------------------------

def q_date_trunc_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("order_month"))
        .agg(F.count("*").alias("n_orders"), _money_sum(F.col("o_totalprice")).alias("monthly_total"))
        .orderBy("order_month")
    )


# --- F-surface: string functions --------------------------------------------

def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        F.upper(F.col("c_name")).alias("name_upper"),
        F.length(F.col("c_name")).alias("name_len"),
        F.substring(F.col("c_mktsegment"), 1, 3).alias("seg_prefix"),
        F.concat_ws("-", F.col("c_mktsegment"), F.col("c_custkey").cast("string")).alias("seg_key"),
    )


# --- J1 + A4 + HAVING: grouped join with post-aggregation filter ------------

def q_having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), _money_sum(F.col("o_totalprice")).alias("spend"))
        .filter(F.col("n_orders") >= 5)
    )


# --- A5: CUBE over two dims -------------------------------------------------

def q_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), _money_sum(F.col("o_totalprice")).alias("total"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


# --- §2.5 window: rank/dense_rank (ties allowed) + lead over a total order --

def q_window_rank_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    by_date = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc())
    total = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(by_date).cast("long").alias("date_rank"),
        F.dense_rank().over(by_date).cast("long").alias("date_dense_rank"),
        F.lead("o_orderdate").over(total).alias("next_orderdate"),
    )


# --- P9: LIKE / BETWEEN predicate surface -----------------------------------

def q_like_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    return (
        customer.filter(
            F.col("c_name").like("%1%")
            & F.col("c_acctbal").between(1000.0, 6000.0)
            & ~F.col("c_mktsegment").isin("MACHINERY", "BUILDING")
        ).agg(F.count("*").alias("n_matches"), _money_avg(F.col("c_acctbal")).alias("avg_bal"))
    )


# --- P9/J2: compare each row to its group aggregate (correlated-subquery
# semantics, expressed as agg + broadcastable join) --------------------------

def q_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    per_cust = orders.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.avg("o_totalprice").alias("cust_avg")
    )
    return (
        orders.join(per_cust, orders.o_custkey == per_cust.ck)
        .filter(F.col("o_totalprice") > F.col("cust_avg"))
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_above_avg"))
    )


# --- TPC-H Q6 shape: forecast-revenue filter-aggregate ----------------------

def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            _money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


# --- TPC-H Q3 shape: shipping-priority top-k --------------------------------

def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    cutoff = F.lit("1998-06-01")
    return (
        lineitem.filter(F.col("l_shipdate") > cutoff)
        .join(orders.filter(F.col("o_orderdate") < cutoff), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


# --- A5: GROUPING SETS — expressed through the SQL API (the engine's two
# front doors, DataFrame and spark.sql, share one Catalyst pipeline) -------

def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        """
    )


# --- A5: exact percentiles + dispersion statistics --------------------------

def q_percentile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("median_price"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 2).alias("p90_price"),
            F.round(F.stddev_samp("o_totalprice"), 4).alias("std_price"),
        )
        .orderBy("o_orderpriority")
    )


# --- F8/A-surface: set collection with deterministic ordering ---------------

def q_collect_set_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.array_join(F.sort_array(F.collect_set("o_orderstatus")), ",").alias("statuses"),
            F.count("*").alias("n_orders"),
        )
    )


QUERIES: dict[str, QuerySpec] = {
    "flagship_revenue_by_segment": QuerySpec(
        q_flagship_revenue_by_segment,
        _FLAGSHIP_SQL,
        "flagship 3-table star join + group-sum (SURVEY §7.2)",
    ),
    "flagship_via_sql_entry": QuerySpec(
        q_flagship_via_sql_entry,
        _FLAGSHIP_SQL_ENTRY_ORACLE,
        "the generated-SQL guard pipeline (fence strip, label strip, "
        "first-statement truncation, named-parameter bind, backticks) "
        "executed end to end under the driver hash",
    ),
    "nl_answer_via_mock_entry": QuerySpec(
        q_nl_answer_via_mock_entry,
        _NL_MOCK_ORACLE,
        "the NL question→SQL→answer loop (U1–U3) judged with a scripted "
        "model: guard-chain execution hashed with summary/plot literals; "
        "empty-result short-circuit and error-surfacing branches pinned "
        "by LLM call counts",
    ),
    "projection_limit": QuerySpec(
        q_projection_limit,
        "SELECT c_custkey, c_name, c_mktsegment FROM customer ORDER BY c_custkey LIMIT 5",
        "P1/P2/O1: projection with mandated LIMIT",
    ),
    "filter_date_range_count": QuerySpec(
        q_filter_date_range_count,
        """
        SELECT count(*) AS n_orders FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
          AND o_orderstatus = 'F'
        """,
        "P3/P4: string-equality + date-range predicates",
    ),
    "semi_join_in_subquery": QuerySpec(
        q_semi_join_in_subquery,
        """
        SELECT count(*) AS n_promo_lineitems FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
        """,
        "P5/J3: IN-subquery as broadcast left-semi join",
    ),
    "anti_join_customers_without_orders": QuerySpec(
        q_anti_join_customers_without_orders,
        """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        """,
        "J6: anti join",
    ),
    "star_join_revenue_by_nation": QuerySpec(
        q_star_join_revenue_by_nation,
        """
        SELECT n_name, CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
        """,
        "J2/J4: 5-table star join with broadcast dims",
    ),
    "theta_join_acctbal": QuerySpec(
        q_theta_join_acctbal,
        """
        SELECT count(*) AS n_pairs FROM customer
        JOIN supplier ON s_acctbal > c_acctbal
        """,
        "J5: non-equi (theta) join via broadcast nested loop",
    ),
    "scalar_aggregates": QuerySpec(
        q_scalar_aggregates,
        """
        SELECT count(*) AS n_orders, max(o_orderkey) AS max_orderkey,
               min(o_orderdate) AS min_orderdate, max(o_orderdate) AS max_orderdate,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_totalprice
        FROM orders
        """,
        "A1/A2: scalar COUNT/MAX/MIN/SUM",
    ),
    "group_sum_by_priority": QuerySpec(
        q_group_sum_by_priority,
        """
        SELECT o_orderpriority,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_price,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / count(*), 2) AS avg_price,
               count(*) AS n_orders
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "A4: grouped SUM/AVG (flagship chart contract)",
    ),
    "distinct_count": QuerySpec(
        q_distinct_count,
        """
        SELECT count(DISTINCT o_custkey) AS n_customers_with_orders,
               count(DISTINCT o_orderpriority) AS n_priorities
        FROM orders
        """,
        "A5: exact distinct aggregation",
    ),
    "approx_distinct": QuerySpec(
        q_approx_distinct,
        """
        SELECT count(DISTINCT l_partkey) AS exact_parts,
               count(DISTINCT l_orderkey) AS exact_orders,
               true AS parts_within_5pct,
               true AS orders_within_5pct
        FROM lineitem
        """,
        "A5: approx_count_distinct (HLL++), self-validated against exact",
    ),
    "rollup_lineitem": QuerySpec(
        q_rollup_lineitem,
        """
        SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
               count(*) AS n_rows
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """,
        "A5: ROLLUP grouping sets",
    ),
    "pricing_summary": QuerySpec(
        q_pricing_summary,
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base_price,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_disc_price,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge,
               round(avg(l_quantity), 6) AS avg_qty,
               round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_disc,
               count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
        """,
        "TPC-H Q1 shape: wide aggregate over scaling table",
    ),
    "window_latest_order": QuerySpec(
        q_window_latest_order,
        """
        SELECT o_custkey, o_orderkey AS latest_orderkey, o_orderdate AS latest_orderdate
        FROM (
          SELECT *, row_number() OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders
        ) WHERE rn = 1
        """,
        "§2.5 window: ranking",
    ),
    "window_running_sum": QuerySpec(
        q_window_running_sum,
        """
        SELECT o_custkey, o_orderkey,
               round(sum(o_totalprice) OVER w, 2) AS running_total,
               CAST(row_number() OVER w AS BIGINT) AS order_seq
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """,
        "§2.5 window: moving aggregate",
    ),
    "window_lag_gap": QuerySpec(
        q_window_lag_gap,
        """
        SELECT o_custkey, o_orderkey,
               datediff('day',
                 lag(o_orderdate) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate ASC, o_orderkey ASC),
                 o_orderdate)::INT AS days_since_prev
        FROM orders
        """,
        "§2.5 window: lag",
    ),
    "topk_orders": QuerySpec(
        q_topk_orders,
        """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
        """,
        "O3: top-k (TakeOrderedAndProject)",
    ),
    "set_intersect": QuerySpec(
        q_set_intersect,
        """
        SELECT c_custkey AS custkey FROM customer
        INTERSECT
        SELECT o_custkey AS custkey FROM orders
        """,
        "§2.7: INTERSECT",
    ),
    "set_except": QuerySpec(
        q_set_except,
        """
        SELECT c_custkey AS custkey FROM customer
        EXCEPT ALL
        SELECT DISTINCT o_custkey AS custkey FROM orders
        """,
        "§2.7: EXCEPT",
    ),
    "set_union": QuerySpec(
        q_set_union,
        """
        SELECT DISTINCT key FROM (
          SELECT o_custkey AS key FROM orders
          UNION ALL
          SELECT user_id AS key FROM events
        )
        """,
        "§2.7: UNION + DISTINCT",
    ),
    "case_bucketing": QuerySpec(
        q_case_bucketing,
        """
        SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                    WHEN c_acctbal < 5000 THEN 'low'
                    WHEN c_acctbal < 8000 THEN 'mid'
                    ELSE 'high' END AS balance_bucket,
               count(*) AS n_customers,
               round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / count(*), 2) AS avg_bal
        FROM customer GROUP BY 1 ORDER BY balance_bucket
        """,
        "P6/P9: CASE WHEN bucketing",
    ),
    "date_trunc_monthly": QuerySpec(
        q_date_trunc_monthly,
        """
        SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
               count(*) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS monthly_total
        FROM orders GROUP BY 1 ORDER BY order_month
        """,
        "F3: date_trunc monthly aggregation",
    ),
    "string_functions": QuerySpec(
        q_string_functions,
        """
        SELECT c_custkey, upper(c_name) AS name_upper, length(c_name) AS name_len,
               substring(c_mktsegment, 1, 3) AS seg_prefix,
               concat_ws('-', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS seg_key
        FROM customer
        """,
        "F-surface: string functions",
    ),
    "forecast_revenue": QuerySpec(
        q_forecast_revenue,
        """
        SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
               count(*) AS n_lineitems
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        """,
        "TPC-H Q6 shape: filter-aggregate",
    ),
    "shipping_priority": QuerySpec(
        q_shipping_priority,
        """
        SELECT l_orderkey, o_orderdate,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate > TIMESTAMP '1998-06-01'
          AND o_orderdate < TIMESTAMP '1998-06-01'
          AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
        """,
        "TPC-H Q3 shape: selective star join + top-k",
    ),
    "grouping_sets": QuerySpec(
        q_grouping_sets,
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        """,
        "A5: GROUPING SETS via the SQL front door",
    ),
    "percentile_stats": QuerySpec(
        q_percentile_stats,
        """
        SELECT o_orderpriority,
               round(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
               round(quantile_cont(o_totalprice, 0.9), 2) AS p90_price,
               round(stddev_samp(o_totalprice), 4) AS std_price
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "A5: exact interpolated percentiles + stddev",
    ),
    "collect_set_agg": QuerySpec(
        q_collect_set_agg,
        """
        SELECT o_custkey,
               array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
               count(*) AS n_orders
        FROM orders GROUP BY o_custkey
        """,
        "deterministic set collection (sorted, joined)",
    ),
    "cube_status_priority": QuerySpec(
        q_cube_status_priority,
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """,
        "A5: CUBE grouping sets",
    ),
    "window_rank_funcs": QuerySpec(
        q_window_rank_funcs,
        """
        SELECT o_custkey, o_orderkey,
               CAST(rank() OVER d AS BIGINT) AS date_rank,
               CAST(dense_rank() OVER d AS BIGINT) AS date_dense_rank,
               lead(o_orderdate) OVER t AS next_orderdate
        FROM orders
        WINDOW d AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC),
               t AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        """,
        "§2.5 window: rank/dense_rank/lead",
    ),
    "like_between": QuerySpec(
        q_like_between,
        """
        SELECT count(*) AS n_matches,
               round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / count(*), 2) AS avg_bal
        FROM customer
        WHERE c_name LIKE '%1%' AND c_acctbal BETWEEN 1000.0 AND 6000.0
          AND c_mktsegment NOT IN ('MACHINERY', 'BUILDING')
        """,
        "P9: LIKE/BETWEEN/NOT IN predicates",
    ),
    "above_customer_avg": QuerySpec(
        q_above_customer_avg,
        """
        SELECT o_custkey, count(*) AS n_above_avg
        FROM orders o
        WHERE o_totalprice > (SELECT avg(i.o_totalprice) FROM orders i
                              WHERE i.o_custkey = o.o_custkey)
        GROUP BY o_custkey
        """,
        "correlated-aggregate comparison (agg + join form)",
    ),
    "having_filter": QuerySpec(
        q_having_filter,
        """
        SELECT o_custkey, count(*) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS spend
        FROM orders GROUP BY o_custkey HAVING count(*) >= 5
        """,
        "A4 + HAVING",
    ),
}
