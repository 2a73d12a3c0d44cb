"""Regular-time-grid and interval-algebra operators over event/date data.

Extension family (the reference's event feed, index.js:226-238, exposes
only a raw reverse-chron listing; these are the temporal shapes a
time-series store grows into):

* gap-filled resampling — TimescaleDB's `time_bucket_gapfill` + `locf`
  re-expressed as DataFrame ops: bucket, densify against a generated
  calendar spine, forward-fill with `last(..., ignorenulls=True)`;
* interval-overlap self-join — Allen-algebra `overlaps` between the
  ship→receipt windows of lineitems of the same order, the classic
  temporal-join shape (room-booking conflicts, concurrent-session
  counting) bounded by an equi-key so it never goes quadratic globally.

Scale notes: the calendar spine is hours × event types — its cardinality
grows with WALL-CLOCK SPAN and type arity, not with data volume, so the
cross join is bounded by construction at any SF (and both inputs are
already aggregates). The overlap join shuffles once on the order key;
per-key group size is bounded by the schema (≤ 7 lineitems/order in
TPC-H-shaped data), so the within-group pair expansion is O(1) per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..registry import register

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"

# ------------------------------------------------------- gap-filled resample

_GAPFILL_ORACLE = """
WITH hourly AS (
  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, event_type,
         count(*) AS n, round(sum(value), 2) AS v
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM hourly),
spine AS (
  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM bounds
),
grid AS (
  SELECT s.h, t.event_type
  FROM spine s, (SELECT DISTINCT event_type FROM events) t
)
SELECT strftime(g.h, '%Y-%m-%d %H:%M:%S') AS hour_s,
       g.event_type,
       coalesce(hh.n, 0) AS n_events,
       last_value(hh.v IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
       CASE WHEN hh.n IS NULL THEN 1 ELSE 0 END AS is_gap
FROM grid g
LEFT JOIN hourly hh ON g.h = hh.h AND g.event_type = hh.event_type
ORDER BY g.event_type, hour_s
"""


@register("events_gapfill_hourly", oracle=_GAPFILL_ORACLE, tags=("event-time", "window-fn"))
def events_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly resample with last-observation-carried-forward:
    bucket events to (hour, type) totals, densify against a generated
    hour spine so silent hours appear as explicit rows, and forward-fill
    the last seen total (`locf`). Dashboards and anomaly detectors need
    the dense grid — a missing bucket is a signal, not an absence.

    Plan: one partial-agg'd groupBy over events (the only data-sized
    shuffle), then everything downstream operates on the spine — hours ×
    types, whose cardinality is set by wall-clock span and type arity,
    NOT by event volume, so the densify cross join and the per-type
    forward-fill window cost the same at 100 TB as at sf0.001. The fill
    carries the rounded bucket TOTAL (a sum of 2-decimal inputs is itself
    2-decimal, so rounding never lands on a half-tie — engines with
    different tie-break directions still agree; a bucket AVERAGE of two
    2-decimal values can land exactly on .xx5 and diverge, measured at
    sf0.01)."""
    events = load_tables(spark, sf_dir)["events"]
    hourly = events.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("v"),
    )
    bounds = hourly.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    spine = bounds.select(
        F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias("h")
    )
    types = events.select("event_type").distinct()
    grid = spine.crossJoin(F.broadcast(types))
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["h", "event_type"], "left")
        .withColumn("v_filled", F.last("v", ignorenulls=True).over(w))
        .select(
            F.date_format("h", _TS_FMT_SPARK).alias("hour_s"),
            "event_type",
            F.coalesce("n", F.lit(0)).alias("n_events"),
            "v_filled",
            F.when(F.col("n").isNull(), 1).otherwise(0).alias("is_gap"),
        )
        .orderBy("event_type", "hour_s")
    )


# --------------------------------------------------- interval-overlap join

_OVERLAP_ORACLE = """
WITH li AS (
  SELECT l_orderkey, l_linenumber,
         CAST(l_shipdate AS DATE) AS d0,
         -- trunc() keeps DuckDB's double->int conversion (round-to-nearest)
         -- aligned with Spark's truncating cast for any fractional quantity
         CAST(l_shipdate AS DATE) + to_days(CAST(trunc(l_quantity) AS INTEGER)) AS d1
  FROM lineitem
),
pairs AS (
  SELECT a.l_orderkey,
         date_diff('day', greatest(a.d0, b.d0), least(a.d1, b.d1)) + 1
           AS overlap_days
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey
   AND a.l_linenumber < b.l_linenumber
   AND a.d0 <= b.d1 AND b.d0 <= a.d1
),
per_order AS (
  SELECT l.l_orderkey,
         count(p.overlap_days) AS n_pairs,
         CAST(coalesce(sum(p.overlap_days), 0) AS BIGINT) AS total_days
  FROM (SELECT l_orderkey FROM li GROUP BY 1 HAVING count(*) >= 2) l
  LEFT JOIN pairs p ON l.l_orderkey = p.l_orderkey
  GROUP BY 1
)
SELECT n_pairs, count(*) AS n_orders,
       round(avg(total_days), 2) AS avg_overlap_days
FROM per_order
GROUP BY n_pairs
ORDER BY n_pairs
"""


@register("lineitem_interval_overlap", oracle=_OVERLAP_ORACLE, tags=("join", "interval"))
def lineitem_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allen-`overlaps` interval self-join: for each order, count lineitem
    pairs whose delivery windows (shipdate → shipdate + quantity days; the
    fixture carries no receiptdate, so transit time is derived
    deterministically from quantity) overlap in time, then histogram the
    orders by overlap-pair count (concurrent-shipment pressure). The
    general temporal-conflict shape — double-bookings, concurrent
    sessions — anchored to an equi-key.

    Plan: ONE shuffle of the pruned 4-column lineitem relation on the
    order key; the overlap inequality evaluates inside the sort-merge
    join's per-key group, which TPC-H bounds at ≤ 7 rows, so the pair
    expansion is O(1) per key and the join never degenerates into a
    cartesian (the registry-wide plan audit enforces this). All outputs
    are integer counts + one rounded average."""
    li = (
        load_tables(spark, sf_dir)["lineitem"]
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_shipdate").cast("date").alias("d0"),
            F.date_add(
                F.col("l_shipdate").cast("date"), F.col("l_quantity").cast("int")
            ).alias("d1"),
        )
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_linenumber") < F.col("b.l_linenumber"))
            & (F.col("a.d0") <= F.col("b.d1"))
            & (F.col("b.d0") <= F.col("a.d1")),
        )
        .select(
            F.col("a.l_orderkey").alias("l_orderkey"),
            (
                F.datediff(
                    F.least("a.d1", "b.d1"), F.greatest("a.d0", "b.d0")
                )
                + 1
            ).alias("overlap_days"),
        )
        .groupBy("l_orderkey")
        .agg(
            F.count("overlap_days").alias("n_pairs"),
            F.sum("overlap_days").cast("bigint").alias("total_days"),
        )
    )
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_lines"))
        .filter(F.col("n_lines") >= 2)
        .select("l_orderkey")
    )
    per_order = multi.join(pairs, "l_orderkey", "left").select(
        "l_orderkey",
        F.coalesce("n_pairs", F.lit(0).cast("bigint")).alias("n_pairs"),
        F.coalesce("total_days", F.lit(0).cast("bigint")).alias("total_days"),
    )
    return (
        per_order.groupBy("n_pairs")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("total_days"), 2).alias("avg_overlap_days"),
        )
        .orderBy("n_pairs")
    )


# --------------------------------------------------- year-over-year growth

_YOY_ORACLE = """
WITH monthly AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month_s,
         count(*) AS n_orders,
         round(sum(o_totalprice), 2) AS revenue
  FROM orders
  GROUP BY 1
),
grown AS (
  SELECT month_s, n_orders, revenue,
         round(
           (revenue - lag(revenue, 12) OVER (ORDER BY month_s))
             / lag(revenue, 12) OVER (ORDER BY month_s) * 100, 2
         ) AS yoy_pct
  FROM monthly
)
-- first-year months have no prior-year comparison; a NULL double renders
-- as NaN through Spark->pandas, so the no-comparison rows are excluded
-- rather than emitted as NULL (registry float policy: no NULL floats out)
SELECT * FROM grown WHERE yoy_pct IS NOT NULL
ORDER BY month_s
"""


@register("orders_yoy_growth", oracle=_YOY_ORACLE, tags=("agg", "window-fn"))
def orders_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with year-over-year growth — the standard BI
    time-series cut: aggregate to months, then lag(12) over the monthly
    series for the same-month-last-year comparison (NULL for the first
    year, like every BI tool renders it).

    Plan: ONE partial-agg'd shuffle reduces orders to month cardinality
    (≤ 84 rows for the 7-year TPC-H span at ANY SF); the lag window runs
    over that aggregate — its single-partition global ordering is safe
    precisely because the input is calendar-bounded, the same argument
    as the gapfill spine above. Float determinism: growth is computed
    from the already-round(2)-ed monthly revenues, so the division's
    operands are bit-identical cross-engine before the final round."""
    monthly = (
        load_tables(spark, sf_dir)["orders"]
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month_s"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )
    w = Window.orderBy("month_s")
    prev = F.lag("revenue", 12).over(w)
    return (
        monthly.select(
            "month_s",
            "n_orders",
            "revenue",
            F.round((F.col("revenue") - prev) / prev * 100, 2).alias("yoy_pct"),
        )
        # no-prior-year months excluded: NULL doubles render as NaN through
        # toPandas and the registry emits no NULL floats (oracle matches)
        .filter(F.col("yoy_pct").isNotNull())
        .orderBy("month_s")
    )
