"""Time-series spine operators: calendar gap-fill + last-observation-
carried-forward (LOCF).

``daily_revenue_gapfill`` densifies a sparse daily series onto a
complete calendar spine — the standard pre-step before any rolling
window, forecast, or seasonal decomposition that assumes one row per
day (``trend_seasonality_decompose`` and ``forecast_revenue`` both
consume daily series; a day silently missing from the input skews every
moving statistic downstream).  Urgent-priority orders are sparse enough
at small SF that real gaps exist, so the fill paths are exercised.

Reference parity: the reference's warehouse exposes daily rollups via
plain SQL over Impala (/root/reference/README.md:75-84); spine
densification is the composed capability its users would script around
the engine, re-expressed as one declarative plan.

Scale notes (100 TB design intent):
- The daily aggregate shuffles once on day (map-side combined); its
  cardinality is calendar-bounded (~2.5 k rows for the 7-year TPC-H
  range) REGARDLESS of input scale, so everything after the first
  aggregate — spine generation, the left join, the LOCF window — runs
  on a bounded table.  The unpartitioned ``Window.orderBy(day)`` is
  therefore safe by construction: it sorts the calendar, not the data
  (see SCALING.md on calendar-bounded state).
- The spine derives from a 1-row min/max aggregate crossed back in via
  broadcast; ``sequence() + explode`` generates days JVM-side with no
  Python boundary and no driver round-trip.
- Fold-exactness: daily revenue sums DECIMAL(18,6)-quantized inputs
  (the `_money_sum` rule), so partial-aggregate reassociation at any
  parallelism yields identical cents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import QuerySpec

GAPFILL_PRIORITY = "1-URGENT"


def q_daily_revenue_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily revenue for urgent-priority orders: every calendar
    day between the first and last observed order date appears exactly
    once, with (a) zero-filled revenue/order counts, (b) a gap flag,
    and (c) LOCF revenue — the last observed day's revenue carried
    forward across the gap (what a monitoring dashboard plots when a
    source pauses)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == GAPFILL_PRIORITY
    )
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("rev"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    bounds = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = bounds.select(
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day")
    )
    locf_w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(daily, "day", "left")
        .select(
            "day",
            F.coalesce(F.col("rev"), F.lit(0.0)).alias("rev"),
            F.coalesce(F.col("n_orders"), F.lit(0)).cast("long").alias("n_orders"),
            F.col("rev").isNull().cast("int").alias("is_gap"),
            # spine starts at an observed day, so LOCF is never NULL
            F.last("rev", ignorenulls=True).over(locf_w).alias("rev_locf"),
        )
        .orderBy("day")
    )


_GAPFILL_SQL = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS rev,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders
  WHERE o_orderpriority = '{GAPFILL_PRIORITY}'
  GROUP BY 1
), spine AS (
  SELECT CAST(unnest(generate_series(
           (SELECT min(day) FROM daily),
           (SELECT max(day) FROM daily),
           INTERVAL 1 DAY)) AS DATE) AS day
)
SELECT spine.day AS day,
       coalesce(daily.rev, 0.0) AS rev,
       CAST(coalesce(daily.n_orders, 0) AS BIGINT) AS n_orders,
       CAST(daily.rev IS NULL AS INT) AS is_gap,
       last_value(daily.rev IGNORE NULLS) OVER (
         ORDER BY spine.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS rev_locf
FROM spine LEFT JOIN daily ON spine.day = daily.day
ORDER BY day
"""


QUERIES: dict[str, QuerySpec] = {
    "daily_revenue_gapfill": QuerySpec(
        q_daily_revenue_gapfill,
        _GAPFILL_SQL,
        "calendar-spine densification of sparse daily revenue with "
        "zero-fill, gap flags, and LOCF carry-forward",
    ),
}
