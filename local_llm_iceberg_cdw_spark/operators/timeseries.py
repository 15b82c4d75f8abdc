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


# --- CUSUM changepoint detection ---------------------------------------------


def q_revenue_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan over the daily revenue series — the
    classic mean-shift detector (Page 1954): cumulative sum of
    deviations from the global mean; the day where |CUSUM| peaks is the
    most likely single changepoint (the binary-segmentation pivot).
    Complements `revenue_anomaly_days` (pointwise outliers) with the
    LEVEL-SHIFT question monitoring actually asks: "did the series
    change regime, and when?".

    Determinism: daily sums are exact DECIMAL(28,6); the global mean
    rounds to 4 and snaps to DECIMAL(18,4) (exactly representable —
    the `revenue_anomaly_days` r11 ladder), so every deviation and the
    running CUSUM are EXACT decimal arithmetic in both engines; the
    peak flag compares exact decimals (|cusum| vs its max), never a
    rounded double.

    Scale shape: one date-keyed fact aggregation (map-side combined),
    then everything is O(days): the unpartitioned running-sum window
    sorts the calendar, not the data (the `daily_revenue_gapfill`
    bounded-window class), and the peak is a 1-row broadcast max."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("decimal(28,6)")
            .alias("rev")
        )
    )
    mean = daily.agg(
        F.round(
            F.sum("rev").cast("double") / F.count(F.lit(1)),
            4,
        )
        .cast("decimal(18,4)")
        .alias("mu")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cusum_d = F.sum(F.col("rev") - F.col("mu")).over(w)  # exact decimal
    scanned = (
        daily.crossJoin(F.broadcast(mean))
        .select("day", "rev", "mu", cusum_d.alias("cusum_d"))
        .localCheckpoint(eager=True)  # feeds the peak agg AND the flag pass
    )
    peak = scanned.agg(F.max(F.abs(F.col("cusum_d"))).alias("peak_abs"))
    return (
        scanned.crossJoin(F.broadcast(peak))
        .select(
            "day",
            F.round(F.col("rev"), 2).cast("double").alias("rev"),
            F.round(F.col("cusum_d"), 4).cast("double").alias("cusum"),
            (F.abs(F.col("cusum_d")) == F.col("peak_abs"))
            .cast("int")
            .alias("is_changepoint"),
        )
        .orderBy("day")
    )


_CUSUM_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS rev
  FROM orders GROUP BY 1
), mean AS (
  SELECT CAST(round(CAST(sum(rev) AS DOUBLE) / count(*), 4) AS DECIMAL(18,4)) AS mu
  FROM daily
), scanned AS (
  SELECT day, rev,
         sum(rev - mu) OVER (ORDER BY day
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cusum_d
  FROM daily, mean
), peak AS (
  SELECT max(abs(cusum_d)) AS peak_abs FROM scanned
)
SELECT day,
       CAST(round(rev, 2) AS DOUBLE) AS rev,
       CAST(round(cusum_d, 4) AS DOUBLE) AS cusum,
       CAST(abs(cusum_d) = peak_abs AS INT) AS is_changepoint
FROM scanned, peak
ORDER BY day
"""


# --- Bounded-lookback EWMA smoothing -----------------------------------------

EWMA_LOOKBACK = 7  # trailing OBSERVED days in the kernel (8 terms incl. today)
# 0.5^j for j = 0..7 — every weight is a power of two, so the decimal
# literals are EXACT in binary AND decimal on both engines
EWMA_WEIGHTS = [0.5**j for j in range(EWMA_LOOKBACK + 1)]


def q_ewma_revenue_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily revenue with a
    BOUNDED 8-term kernel (w = 0.5, truncated at lookback 7) — the
    dashboard smoother.  Truncation makes the recursion a plain
    windowless join-aggregate: each observed day contributes to its
    next 8 rows with weight 0.5^distance, so there is no sequential
    dependency to thread through the plan (the infinite-memory EWMA is
    inherently recursive; the truncated kernel ≈ it to 2^-8 ≈ 0.4%
    while staying embarrassingly parallel).

    Determinism: daily revenue is exact DECIMAL(28,6) and every kernel
    weight 0.5^j is exactly representable in BOTH binary and decimal,
    so the weighted numerator and the per-row weight sum (series-start
    rows see shorter kernels) fold as EXACT decimals; the single
    division runs on identical doubles in both engines and rounds to 2
    (a raw-quotient double: half-tie odds are the accepted ~1e-7 class,
    unlike the r10 sum-of-rounded-terms class).

    Scale shape: O(days) after the daily agg — the offset explode
    multiplies the calendar-bounded series by 8, the regroup is
    map-side combined, and the row-number spine window sorts the
    calendar (bounded-window class)."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("decimal(28,6)")
            .alias("rev")
        )
    )
    rn_w = Window.orderBy("day")
    base = daily.select(
        "day", "rev", F.row_number().over(rn_w).cast("long").alias("rn")
    ).localCheckpoint(eager=True)  # feeds contributors AND the spine join
    kernel = F.array(
        *[
            F.struct(
                F.lit(j).cast("long").alias("j"),
                F.lit(f"{EWMA_WEIGHTS[j]:.7f}").cast("decimal(9,7)").alias("wt"),
            )
            for j in range(EWMA_LOOKBACK + 1)
        ]
    )
    contrib = base.select(
        "rn", "rev", F.explode(kernel).alias("k")
    ).select(
        (F.col("rn") + F.col("k.j")).alias("target_rn"),
        (F.col("rev") * F.col("k.wt")).alias("wrev"),  # exact decimal product
        F.col("k.wt").alias("wt"),
    )
    agg = contrib.groupBy("target_rn").agg(
        F.sum("wrev").alias("num"),  # exact decimal folds
        F.sum("wt").alias("den"),
        F.count(F.lit(1)).cast("long").alias("n_terms"),
    )
    return (
        base.join(agg, base["rn"] == agg["target_rn"])
        .select(
            "day",
            F.round(F.col("rev"), 2).cast("double").alias("rev"),
            F.round(F.col("num").cast("double") / F.col("den").cast("double"), 2)
            .alias("ewma"),
            "n_terms",
        )
        .orderBy("day")
    )


def _ewma_sql() -> str:
    vals = ", ".join(
        f"({j}, CAST('{EWMA_WEIGHTS[j]:.7f}' AS DECIMAL(9,7)))"
        for j in range(EWMA_LOOKBACK + 1)
    )
    return f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS rev
  FROM orders GROUP BY 1
), base AS (
  SELECT day, rev,
         CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn
  FROM daily
), kernel(j, wt) AS (
  VALUES {vals}
), contrib AS (
  SELECT rn + j AS target_rn, rev * wt AS wrev, wt
  FROM base, kernel
), agg AS (
  SELECT target_rn, sum(wrev) AS num, sum(wt) AS den,
         CAST(count(*) AS BIGINT) AS n_terms
  FROM contrib GROUP BY target_rn
)
SELECT base.day AS day,
       CAST(round(base.rev, 2) AS DOUBLE) AS rev,
       round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 2) AS ewma,
       n_terms
FROM base JOIN agg ON base.rn = agg.target_rn
ORDER BY day
"""


QUERIES: dict[str, QuerySpec] = {
    "daily_revenue_gapfill": QuerySpec(
        q_daily_revenue_gapfill,
        _GAPFILL_SQL,
        "calendar-spine densification of sparse daily revenue with "
        "zero-fill, gap flags, and LOCF carry-forward",
    ),
    "revenue_changepoint_cusum": QuerySpec(
        q_revenue_changepoint_cusum,
        _CUSUM_SQL,
        "CUSUM mean-shift changepoint scan: exact-decimal running sum "
        "of deviations, peak-|CUSUM| day flagged",
    ),
    "ewma_revenue_smooth": QuerySpec(
        q_ewma_revenue_smooth,
        _ewma_sql(),
        "bounded-kernel (8-term, w=0.5) exponential smoothing as a "
        "windowless join-aggregate — exact power-of-two decimal weights",
    ),
}
