"""Aggregations — SURVEY.md §2.5 (A1-A7) plus the idiomatic supersets
(rollup/cube/grouping-sets) flagged there as extensions.

Scale notes: every aggregate here compiles to partial (map-side) +
final HashAggregate, so the shuffle carries pre-combined state, not rows —
the distributed upgrade of the reference's single-node `$group` / JS
`reduce`. Conditional counts are one-pass `sum(when(...))` instead of the
reference's N separate filtered scans (index.js:335-337).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables, register_views
from ..registry import register

_COUNT_WHERE_ORACLE = """
SELECT count(*) AS n_workers
FROM customer
WHERE c_mktsegment = 'MACHINERY'
"""


@register("count_with_predicate", oracle=_COUNT_WHERE_ORACLE, tags=("agg",))
def count_with_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: `countDocuments({role:'worker'})` (index.js:1203-1204)."""
    customer = load_tables(spark, sf_dir)["customer"]
    return customer.filter(F.col("c_mktsegment") == "MACHINERY").agg(
        F.count(F.lit(1)).alias("n_workers")
    )


_COND_COUNTS_ORACLE = """
SELECT
  count(*)                                  AS n_total,
  count(*) FILTER (WHERE o_orderstatus = 'O')     AS n_open,
  count(*) FILTER (WHERE o_orderstatus = 'F')     AS n_fulfilled,
  count(*) FILTER (WHERE o_orderstatus = 'P')     AS n_partial
FROM orders
"""


@register("conditional_counts", oracle=_COND_COUNTS_ORACLE, tags=("agg",))
def conditional_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: the reference materializes all rows then counts subsets in JS
    (`subs.filter(s => s.status==='pending').length`, index.js:335-337,
    557-559). One-pass conditional aggregation replaces three scans."""
    orders = load_tables(spark, sf_dir)["orders"]

    def count_if(cond):
        return F.sum(F.when(cond, 1).otherwise(0))

    return orders.agg(
        F.count(F.lit(1)).alias("n_total"),
        count_if(F.col("o_orderstatus") == "O").alias("n_open"),
        count_if(F.col("o_orderstatus") == "F").alias("n_fulfilled"),
        count_if(F.col("o_orderstatus") == "P").alias("n_partial"),
    )


_EMPTY_SUM_ORACLE = """
SELECT coalesce(round(sum(o_totalprice), 2), CAST(0 AS DOUBLE)) AS total
FROM orders
WHERE o_totalprice < 0
"""


@register("sum_empty_input_default", oracle=_EMPTY_SUM_ORACLE, tags=("agg", "null-semantics"))
def sum_empty_input_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 quirk (SURVEY.md §2.11 item 2): Mongo's `$group` on empty input
    yields `[]`, defaulted to 0 by `agg[0]?.x || 0` (index.js:1210,1216).
    SQL `sum` over empty input yields NULL → wrap in `coalesce(sum, 0)`."""
    orders = load_tables(spark, sf_dir)["orders"]
    return orders.filter(F.col("o_totalprice") < 0).agg(
        F.coalesce(F.round(F.sum("o_totalprice"), 2), F.lit(0).cast("double")).alias(
            "total"
        )
    )


_FILTERED_SUM_ORACLE = """
SELECT round(sum(o_totalprice), 2) AS total_paid, count(*) AS n_payments
FROM orders
WHERE o_custkey = 77
"""


@register("filtered_grand_total", oracle=_FILTERED_SUM_ORACLE, tags=("agg",))
def filtered_grand_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: `[{$match:{email}}, {$group:{_id:null, totalPaid:{$sum:...}}}]`
    (index.js:562-566) — filter pushed to the scan, then a grand total."""
    orders = load_tables(spark, sf_dir)["orders"]
    return orders.filter(F.col("o_custkey") == 77).agg(
        F.round(F.sum("o_totalprice"), 2).alias("total_paid"),
        F.count(F.lit(1)).alias("n_payments"),
    )


_COALESCED_SUM_ORACLE = """
SELECT round(sum(coalesce(nullif(l_discount, 0.0), CAST(0 AS DOUBLE))), 2) AS total_disc,
       count(*) AS n
FROM lineitem
WHERE l_orderkey < 1000
"""


@register("sum_with_null_default", oracle=_COALESCED_SUM_ORACLE, tags=("agg", "null-semantics"))
def sum_with_null_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: `reduce((s,x)=>s+(x.payable_amount||0),0)` (index.js:340-343,617)
    — per-element null-coalescing inside a sum. Nulls are derived with
    `nullif` since the fixtures are fully populated."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.filter(F.col("l_orderkey") < 1000).agg(
        F.round(
            F.sum(
                F.coalesce(
                    F.nullif(F.col("l_discount"), F.lit(0.0)),
                    F.lit(0).cast("double"),
                )
            ),
            2,
        ).alias("total_disc"),
        F.count(F.lit(1)).alias("n"),
    )


_DASHBOARD_ORACLE = """
SELECT * FROM
  (SELECT count(*)                                   AS total_customers,
          count(*) FILTER (WHERE c_mktsegment='MACHINERY') AS machinery_customers,
          round(sum(c_acctbal), 2)                   AS total_balance
   FROM customer)
CROSS JOIN
  (SELECT count(*)                              AS total_orders,
          count(*) FILTER (WHERE o_orderstatus = 'O') AS open_orders,
          round(sum(o_totalprice), 2)           AS total_revenue
   FROM orders)
"""


@register("dashboard_multi_metric", oracle=_DASHBOARD_ORACLE, tags=("agg", "composite"))
def dashboard_multi_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: the admin-home dashboard (index.js:1200-1233) issues 4+ sequential
    round-trips for counts and sums; here both tables are aggregated in one
    job and the two single-row results are cross-joined (trivial join — both
    sides are 1 row after partial aggregation)."""
    t = load_tables(spark, sf_dir)
    cust = t["customer"].agg(
        F.count(F.lit(1)).alias("total_customers"),
        F.sum(F.when(F.col("c_mktsegment") == "MACHINERY", 1).otherwise(0)).alias(
            "machinery_customers"
        ),
        F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
    )
    orders = t["orders"].agg(
        F.count(F.lit(1)).alias("total_orders"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias(
            "open_orders"
        ),
        F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
    )
    return cust.crossJoin(orders)


_ROLLUP_ORACLE = """
SELECT coalesce(c_mktsegment, 'ALL') AS segment,
       count(*) AS n,
       round(sum(c_acctbal), 2) AS balance
FROM customer
GROUP BY ROLLUP (c_mktsegment)
ORDER BY segment
"""


@register("rollup_by_segment", oracle=_ROLLUP_ORACLE, tags=("agg", "rollup"))
def rollup_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idiomatic superset of A1+A4 (SURVEY.md §2.5): per-role and grand-total
    metrics in one pass via `rollup` instead of the reference's separate
    countDocuments + $group round-trips."""
    customer = load_tables(spark, sf_dir)["customer"]
    return (
        customer.rollup("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("c_acctbal"), 2).alias("balance"),
        )
        .select(
            F.coalesce(F.col("c_mktsegment"), F.lit("ALL")).alias("segment"),
            "n",
            "balance",
        )
        .orderBy("segment")
    )


_CUBE_ORACLE = """
SELECT coalesce(l_returnflag, '*') AS rflag,
       coalesce(l_linestatus, '*') AS lstatus,
       count(*) AS n,
       round(sum(l_quantity), 2) AS qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY rflag, lstatus
"""


@register("cube_flag_status", oracle=_CUBE_ORACLE, tags=("agg", "cube"))
def cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`cube` over the two lineitem flags — all 2^2 grouping combinations in
    a single shuffle."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("*")).alias("rflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("*")).alias("lstatus"),
            "n",
            "qty",
        )
        .orderBy("rflag", "lstatus")
    )


_GROUPING_SETS_ORACLE = """
SELECT coalesce(o_orderstatus, '*')   AS status,
       coalesce(o_orderpriority, '*') AS priority,
       count(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
ORDER BY status, priority
"""


@register("grouping_sets_status_priority", oracle=_GROUPING_SETS_ORACLE, tags=("agg",))
def grouping_sets_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the SQL API (same Catalyst plan as the DataFrame
    path) — two independent group-bys in one scan."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, '*')   AS status,
               coalesce(o_orderpriority, '*') AS priority,
               count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        ORDER BY status, priority
        """
    )


_DISTINCT_ORACLE = """
SELECT count(DISTINCT o_custkey) AS n_active_customers,
       count(DISTINCT o_orderpriority) AS n_priorities,
       count(*) AS n_orders
FROM orders
WHERE o_orderstatus <> 'F'
"""


@register("distinct_count", oracle=_DISTINCT_ORACLE, tags=("agg",))
def distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (expand + two-phase agg under the hood).
    The approximate variant (`approx_count_distinct`, HLL) is benchmarked
    separately — its result is engine-specific so it is not oracle-gated."""
    orders = load_tables(spark, sf_dir)["orders"]
    return orders.filter(F.col("o_orderstatus") != "F").agg(
        F.countDistinct("o_custkey").alias("n_active_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ----------------------------------------------------- concentration (HHI)

_HHI_ORACLE = """
WITH rev AS (
  SELECT s.s_nationkey, l.l_suppkey,
         round(sum(l.l_extendedprice), 2) AS supplier_rev
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY s.s_nationkey, l.l_suppkey
),
shares AS (
  SELECT s_nationkey, supplier_rev,
         round(supplier_rev / sum(supplier_rev) OVER (PARTITION BY s_nationkey), 6)
           AS share
  FROM rev
)
SELECT n.n_name,
       count(*) AS n_suppliers,
       round(sum(share * share) * 10000, 2) AS hhi
FROM shares sh JOIN nation n ON sh.s_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY hhi DESC, n_name
"""


@register("supplier_concentration_hhi", oracle=_HHI_ORACLE, tags=("agg", "window-fn"))
def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration index of supplier revenue per
    nation (sum of squared market shares x 10000 — the antitrust scale
    where >2500 is 'highly concentrated'): the supply-risk view of the
    same revenue relation the TPC-H analogs aggregate — one dominant
    supplier in a nation is a single point of failure no average reveals.

    Plan: lineitem reduces once to (nation, supplier) revenue via an
    AQE-planned supplier join (partial aggs move, not line items); shares
    are a supplier-cardinality window per nation; the HHI is a 25-row
    output. Shares round to 6 before squaring so both engines square
    identical operands."""
    t = load_tables(spark, sf_dir)
    from pyspark.sql import Window

    rev = (
        t["lineitem"]
        .join(t["supplier"], t["lineitem"]["l_suppkey"] == t["supplier"]["s_suppkey"])
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("supplier_rev"))
    )
    shares = rev.select(
        "s_nationkey",
        F.round(
            F.col("supplier_rev")
            / F.sum("supplier_rev").over(Window.partitionBy("s_nationkey")),
            6,
        ).alias("share"),
    )
    return (
        shares.join(
            F.broadcast(t["nation"]),
            shares["s_nationkey"] == t["nation"]["n_nationkey"],
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum(F.col("share") * F.col("share")) * 10000, 2).alias("hhi"),
        )
        .orderBy(F.col("hhi").desc(), "n_name")
    )


# ------------------------------------------------------------- churn census

_CHURN_ORACLE = """
WITH horizon AS (SELECT max(CAST(o_orderdate AS DATE)) AS d_max FROM orders),
last_order AS (
  SELECT o_custkey, max(CAST(o_orderdate AS DATE)) AS last_d
  FROM orders GROUP BY o_custkey
),
flagged AS (
  SELECT c.c_mktsegment,
         CASE WHEN lo.o_custkey IS NULL THEN 'never_ordered'
              WHEN date_diff('day', lo.last_d, h.d_max) > 365 THEN 'churned'
              ELSE 'active' END AS status,
         c.c_acctbal
  FROM customer c
  LEFT JOIN last_order lo ON c.c_custkey = lo.o_custkey
  CROSS JOIN horizon h
)
SELECT c_mktsegment, status,
       count(*) AS n_customers,
       round(avg(c_acctbal), 2) AS avg_acctbal
FROM flagged
GROUP BY c_mktsegment, status
ORDER BY c_mktsegment, status
"""


@register("customers_churn_census", oracle=_CHURN_ORACLE, tags=("agg", "join"))
def customers_churn_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn census: customers bucketed active / churned (no order in the
    365 days before the data horizon) / never-ordered, per market
    segment with average account balance — the lifecycle complement to
    RFM (`customers_rfm_segments` scores the engaged; this one counts
    the leavers and the never-activated, who RFM's order-derived
    quintiles cannot see at all).

    Plan: orders reduce once to per-customer last-order dates, customers
    left-join that customer-cardinality relation (AQE strategy, both
    sides SF-proportional), the horizon is a broadcast 1-row aggregate,
    and the census is a (segment x 3) groupBy. Day arithmetic on CAST
    dates — exact in both engines."""
    t = load_tables(spark, sf_dir)
    horizon = t["orders"].agg(
        F.max(F.col("o_orderdate").cast("date")).alias("d_max")
    )
    last_order = t["orders"].groupBy("o_custkey").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_d")
    )
    flagged = (
        t["customer"]
        .join(last_order, t["customer"]["c_custkey"] == last_order["o_custkey"], "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            "c_mktsegment",
            F.when(F.col("o_custkey").isNull(), "never_ordered")
            .when(F.datediff(F.col("d_max"), F.col("last_d")) > 365, "churned")
            .otherwise("active")
            .alias("status"),
            "c_acctbal",
        )
    )
    return (
        flagged.groupBy("c_mktsegment", "status")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("c_acctbal"), 2).alias("avg_acctbal"),
        )
        .orderBy("c_mktsegment", "status")
    )


# ------------------------------------------------------- log2 histogram

_VALUE_HIST_ORACLE = """
WITH b AS (
  SELECT CAST(floor(log2(o_totalprice)) AS BIGINT) AS bucket,
         o_totalprice
  FROM orders WHERE o_totalprice > 0
),
tot AS (SELECT count(*) AS n FROM b)
SELECT bucket,
       power(2.0, bucket) AS bucket_low,
       count(*) AS n_orders,
       round(count(*) * 100.0 / tot.n, 2) AS pct
FROM b, tot
GROUP BY bucket, tot.n
ORDER BY bucket
"""


@register("orders_value_histogram", oracle=_VALUE_HIST_ORACLE, tags=("agg",))
def orders_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed order-value histogram: the generic distribution
    primitive for heavy-tailed money/size columns (linear buckets put
    ~everything in one bin; doubling buckets read as orders of
    magnitude). Complements the exact/approx percentile tiers with the
    full-shape view monitoring dashboards plot.

    Plan: bucket assignment is a map-side floor(log2(x)); the histogram
    is one partial-agg'd groupBy to ~a dozen bucket rows crossed with the
    1-row total. floor(log2()) on identical doubles is engine-identical
    (both evaluate IEEE log2 then floor — any representable input maps to
    the same bucket unless log2 lands EXACTLY on an integer boundary,
    which only powers of two do, and both engines return exact integers
    for those)."""
    orders = load_tables(spark, sf_dir)["orders"]
    b = orders.filter(F.col("o_totalprice") > 0).select(
        F.floor(F.log2("o_totalprice")).cast("bigint").alias("bucket")
    )
    tot = b.agg(F.count(F.lit(1)).alias("n"))
    return (
        b.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.pow(F.lit(2.0), F.col("bucket")).alias("bucket_low"),
            "n_orders",
            F.round(F.col("n_orders") * 100.0 / F.col("n"), 2).alias("pct"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------- Gini coefficient

_GINI_ORACLE = """
WITH per_cust AS (
  SELECT o_custkey, round(sum(o_totalprice), 2) AS rev
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT rev,
         row_number() OVER (ORDER BY rev, o_custkey) AS i,
         count(*) OVER () AS n,
         sum(rev) OVER () AS total
  FROM per_cust
)
SELECT CAST(max(n) AS BIGINT) AS n_customers,
       round(sum((2.0 * i - n - 1) * rev) / (max(n) * max(total)), 6) AS gini
FROM ranked
"""


@register("orders_gini_coefficient", oracle=_GINI_ORACLE, tags=("agg", "window-fn", "stats"))
def orders_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue — the single-number
    inequality summary completing the concentration toolkit (the Pareto
    curve shows WHERE revenue concentrates, HHI scores supplier markets,
    Gini scores the whole customer distribution on [0, 1]), via the
    rank-form identity G = sum((2i - n - 1)·x_(i)) / (n · sum x).

    Plan: one customer-keyed partial agg, then `ranking.global_row_number`
    — range-partitioned exact rank (the total row count rides the same
    broadcast offsets join), so NO customer-cardinality single-partition
    sort or unpartitioned window — then one moment aggregate (which also
    folds sum(rev), replacing the old `sum OVER ()` global window).
    Revenues are rounded before ranking so rank order and every product
    term are engine-identical; the tie order is pinned by the
    customer-key tiebreak; round(6) after the division absorbs the
    summation-order ulp."""
    from .ranking import global_row_number

    per_cust = (
        load_tables(spark, sf_dir)["orders"]
        .groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    )
    ranked = global_row_number(
        per_cust, ["rev", "o_custkey"], rank_col="i", total_col="n"
    )
    return ranked.agg(
        F.max("n").cast("bigint").alias("n_customers"),
        F.round(
            F.sum((2.0 * F.col("i") - F.col("n") - 1) * F.col("rev"))
            / (F.max("n") * F.sum("rev")),
            6,
        ).alias("gini"),
    )


# ------------------------------------------------------ realized-price margin

_MARGIN_ORACLE = """
WITH px AS (
  SELECT p.p_type, p.p_retailprice,
         l.l_extendedprice / l.l_quantity AS unit_price
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_quantity > 0
)
SELECT p_type,
       count(*) AS n_lines,
       round(avg(p_retailprice), 2) AS avg_retail,
       round(avg(unit_price), 2) AS avg_realized,
       round((round(avg(unit_price), 2) - round(avg(p_retailprice), 2))
             * 100.0 / round(avg(p_retailprice), 2), 2) AS margin_pct
FROM px
GROUP BY p_type
ORDER BY margin_pct DESC, p_type
"""


@register("parts_realized_margin", oracle=_MARGIN_ORACLE, tags=("agg", "join"))
def parts_realized_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Realized-price margin per part type: average transacted unit price
    (extendedprice / quantity) against the catalog retail price — the
    pricing-power view (which product lines sell above list, which get
    discounted into the floor) that closes the loop between the part
    dimension's list prices and the fact table's realized revenue.

    Plan: one part-keyed join (AQE strategy), one type-cardinality
    aggregate; unit price is a per-row division (identical IEEE op both
    engines) and the margin ratio is computed from the PRE-ROUNDED
    averages so both engines divide the same operands."""
    t = load_tables(spark, sf_dir)
    px = (
        t["lineitem"]
        .filter(F.col("l_quantity") > 0)
        .join(t["part"], t["lineitem"]["l_partkey"] == t["part"]["p_partkey"])
        .select(
            "p_type",
            "p_retailprice",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        )
    )
    agg = px.groupBy("p_type").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.avg("p_retailprice"), 2).alias("avg_retail"),
        F.round(F.avg("unit_price"), 2).alias("avg_realized"),
    )
    return agg.select(
        "p_type",
        "n_lines",
        "avg_retail",
        "avg_realized",
        F.round(
            (F.col("avg_realized") - F.col("avg_retail"))
            * 100.0
            / F.col("avg_retail"),
            2,
        ).alias("margin_pct"),
    ).orderBy(F.col("margin_pct").desc(), "p_type")


# ------------------------------------------ broadcast cut-point bucketing

_CUTPOINT_ORACLE = """
WITH per_cust AS (
  SELECT o_custkey, round(sum(o_totalprice), 2) AS m
  FROM orders GROUP BY o_custkey
),
cuts AS (
  SELECT quantile_cont(m, 0.25) AS c1,
         quantile_cont(m, 0.5)  AS c2,
         quantile_cont(m, 0.75) AS c3
  FROM per_cust
)
SELECT CASE WHEN m <= c1 THEN 1 WHEN m <= c2 THEN 2
            WHEN m <= c3 THEN 3 ELSE 4 END AS bucket,
       count(*) AS n_customers,
       round(min(m), 2) AS min_m,
       round(max(m), 2) AS max_m
FROM per_cust, cuts
GROUP BY 1
ORDER BY 1
"""


@register(
    "orders_value_quartiles_cutpoint",
    oracle=_CUTPOINT_ORACLE,
    tags=("agg", "stats"),
)
def orders_value_quartiles_cutpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-value quartiles via BROADCAST CUT-POINTS — the map-side
    bucketing pattern that complements `ranking.global_ntile`: compute
    the three quartile boundaries once (a 1-row aggregate), broadcast
    them, and assign buckets with a CASE — zero sorts of the customer
    relation anywhere, one aggregate pass + one map-side pass. The
    semantic difference from ntile is deliberate and documented: buckets
    are VALUE-based, so tied values always share a bucket and bucket
    populations may be uneven; use this tier when bucket-boundary
    stability matters more than equal counts, ntile when the reverse.

    Oracle exactness: Spark's `percentile` and DuckDB's `quantile_cont`
    both interpolate linearly at index q·(n-1) over identical round(2)
    money values, so the cut-points are bit-identical doubles (verified)
    and the boundary comparisons agree exactly. At 100 TB the exact
    percentile's aggregation state is a value→count map bounded by the
    DISTINCT rounded-cent values (money domain, not row count); for
    unbounded domains the same plan runs on `approx_percentile` with
    identical shape."""
    per_cust = (
        load_tables(spark, sf_dir)["orders"]
        .groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("m"))
    )
    cuts = per_cust.agg(
        F.expr("percentile(m, 0.25)").alias("c1"),
        F.expr("percentile(m, 0.5)").alias("c2"),
        F.expr("percentile(m, 0.75)").alias("c3"),
    )
    bucket = (
        F.when(F.col("m") <= F.col("c1"), 1)
        .when(F.col("m") <= F.col("c2"), 2)
        .when(F.col("m") <= F.col("c3"), 3)
        .otherwise(4)
    )
    return (
        per_cust.crossJoin(F.broadcast(cuts))
        .select("m", bucket.cast("int").alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.min("m"), 2).alias("min_m"),
            F.round(F.max("m"), 2).alias("max_m"),
        )
        .orderBy("bucket")
    )


# ------------------------------------------------------ winsorized moments

_WINSOR_ORACLE = """
WITH cuts AS (
  SELECT quantile_cont(o_totalprice, 0.01) AS p01,
         quantile_cont(o_totalprice, 0.99) AS p99
  FROM orders
)
SELECT count(*) AS n_orders,
       round(max(p01), 2) AS p01,
       round(max(p99), 2) AS p99,
       round(avg(o_totalprice), 2) AS mean_raw,
       round(avg(least(greatest(o_totalprice, p01), p99)), 2)
         AS mean_winsorized,
       count(*) FILTER (WHERE o_totalprice < p01) AS n_clipped_low,
       count(*) FILTER (WHERE o_totalprice > p99) AS n_clipped_high
FROM orders, cuts
"""


@register("orders_winsorized_stats", oracle=_WINSOR_ORACLE, tags=("agg", "stats"))
def orders_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized moments of order value: clip at the exact p01/p99
    percentiles and report the mean before/after plus the clip census —
    the outlier-robust summary a revenue KPI needs before a single fat-
    finger order moves the average (the same robustness job
    `events_anomaly_mad` does with median/MAD, here in the
    percentile-clip form feature pipelines standardize on).

    Plan: the cut-points are ONE 1-row exact-percentile aggregate
    broadcast back over the fact table (the `orders_value_quartiles_
    cutpoint` pattern — no sort of the data anywhere), then one final
    aggregate; two passes total, both full-width map-only + partial agg.
    Cross-engine exactness: Spark `percentile` and DuckDB `quantile_cont`
    interpolate identically (verified bit-equal), `least/greatest` are
    order-preserving on identical doubles, and round(2) absorbs the
    summation-order ulp of the two avgs."""
    orders = load_tables(spark, sf_dir)["orders"]

    def count_if(cond):
        return F.sum(F.when(cond, 1).otherwise(0))

    cuts = orders.agg(
        F.expr("percentile(o_totalprice, 0.01)").alias("p01"),
        F.expr("percentile(o_totalprice, 0.99)").alias("p99"),
    )
    return (
        orders.crossJoin(F.broadcast(cuts))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.max("p01"), 2).alias("p01"),
            F.round(F.max("p99"), 2).alias("p99"),
            F.round(F.avg("o_totalprice"), 2).alias("mean_raw"),
            F.round(
                F.avg(
                    F.least(
                        F.greatest(F.col("o_totalprice"), F.col("p01")),
                        F.col("p99"),
                    )
                ),
                2,
            ).alias("mean_winsorized"),
            count_if(F.col("o_totalprice") < F.col("p01")).alias("n_clipped_low"),
            count_if(F.col("o_totalprice") > F.col("p99")).alias("n_clipped_high"),
        )
    )


# ----------------------------------------------------- ABC classification

_ABC_ORACLE = """
WITH per_part AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                  * CAST(round((1 - l_discount) * 100, 0) AS BIGINT))
           AS BIGINT) AS rev_u
  FROM lineitem GROUP BY 1
),
tot AS (SELECT CAST(sum(rev_u) AS BIGINT) AS t FROM per_part),
cum AS (
  SELECT rev_u,
         CAST(sum(rev_u) OVER (ORDER BY rev_u DESC, l_partkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cum_u
  FROM per_part
),
classed AS (
  SELECT rev_u,
         CASE WHEN cum_u * 5 <= t * 4 THEN 'A'
              WHEN cum_u * 20 <= t * 19 THEN 'B'
              ELSE 'C' END AS abc_class
  FROM cum CROSS JOIN tot
)
SELECT abc_class,
       count(*) AS n_parts,
       round(sum(rev_u) / 10000.0, 2) AS revenue,
       round(sum(rev_u) * 1.0 / max(t), 4) AS revenue_share
FROM classed CROSS JOIN tot
GROUP BY 1
ORDER BY abc_class
"""


@register("orders_abc_analysis", oracle=_ABC_ORACLE, tags=("orders", "agg", "stats"))
def orders_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts ranked by realized revenue,
    class A = parts inside the first 80% of cumulative revenue, B = the
    next 15% (to 95%), C = the tail — the Pareto workhorse of inventory
    and catalog management (`customer_ltv_pareto` buckets by ntile,
    i.e. equal-COUNT deciles; ABC cuts by cumulative VALUE share, so
    class sizes are data-driven).

    Plan: one partkey-keyed partial agg collapses lineitem to parts,
    then the cumulative revenue comes from `ranking.global_cumsum` — the
    range-partitioned exact prefix-sum, no single-partition window over
    the SF-proportional part relation. Each line's revenue is fixed to
    INTEGER units BEFORE any summation (price-cents x discount-percent,
    both exact 2-decimal encodings -> bigint), so per-part revenues and
    the cumulative totals are EXACT on both engines in ANY summation
    order (round-after-float-sum flips cents at .xx5 boundaries when
    partial-agg order differs — observed at this very query's first
    cut) and the 80/95% boundaries are integer comparisons
    (cum*5 <= 4*total), bit-identical cross-engine. The 1-row grand
    total crosses back broadcast."""
    from .ranking import global_cumsum

    lineitem = load_tables(spark, sf_dir)["lineitem"]
    per_part = lineitem.groupBy("l_partkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
            * F.round((1 - F.col("l_discount")) * 100, 0).cast("bigint")
        )
        .cast("bigint")
        .alias("rev_u")
    )
    tot = per_part.agg(F.sum("rev_u").cast("bigint").alias("t"))
    cum = global_cumsum(
        per_part,
        [F.col("rev_u").desc(), F.col("l_partkey")],
        "rev_u",
        "cum_u",
    )
    classed = cum.crossJoin(F.broadcast(tot)).withColumn(
        "abc_class",
        F.when(F.col("cum_u") * 5 <= F.col("t") * 4, F.lit("A"))
        .when(F.col("cum_u") * 20 <= F.col("t") * 19, F.lit("B"))
        .otherwise(F.lit("C")),
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.sum("rev_u") / 10000.0, 2).alias("revenue"),
            F.round(F.sum("rev_u") / F.max("t"), 4).alias(
                "revenue_share"
            ),
        )
        .orderBy("abc_class")
    )


# ------------------------------------------------ exact weighted quantiles

_WMEDIAN_ORACLE = """
WITH w AS (
  SELECT CAST(round(l_extendedprice / l_quantity * 100, 0) AS BIGINT)
           AS unit_c,
         CAST(l_quantity AS BIGINT) AS qty,
         l_orderkey, l_linenumber
  FROM lineitem
),
cum AS (
  SELECT unit_c, qty,
         CAST(sum(qty) OVER (ORDER BY unit_c, l_orderkey, l_linenumber
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cw
  FROM w
),
tot AS (SELECT CAST(sum(qty) AS BIGINT) AS tw FROM w)
SELECT max(tw) AS total_weight,
       round(min(CASE WHEN cw * 4 >= tw THEN unit_c END) / 100.0, 2)
         AS w_p25,
       round(min(CASE WHEN cw * 2 >= tw THEN unit_c END) / 100.0, 2)
         AS w_median,
       round(min(CASE WHEN cw * 4 >= tw * 3 THEN unit_c END) / 100.0, 2)
         AS w_p75
FROM cum CROSS JOIN tot
"""


@register("lineitem_weighted_median", oracle=_WMEDIAN_ORACLE, tags=("agg", "stats"))
def lineitem_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact QUANTITY-WEIGHTED quartiles of unit price — "the price the
    median UNIT shipped at", which a row-median gets wrong whenever
    cheap lines carry big quantities (the inventory-valuation and
    fairness-audit quantile; `sketch_approx_quantiles` is the
    row-weighted approximate tier). Lower-weighted-quantile convention:
    the smallest price whose inclusive cumulative weight reaches
    p x total.

    Plan: unit prices fix to integer cents and weights to integer
    quantities, the cumulative weight comes from `ranking.global_cumsum`
    over the (price, orderkey, linenumber) total order — the
    SF-proportional line relation never crosses a single-partition
    window — and each quartile is min-over-filter pure integer
    comparisons (cw*4 >= 3*tw), bit-identical cross-engine; the 1-row
    grand weight crosses back broadcast."""
    from .ranking import global_cumsum

    li = load_tables(spark, sf_dir)["lineitem"]
    w = li.select(
        F.round(F.col("l_extendedprice") / F.col("l_quantity") * 100, 0)
        .cast("bigint")
        .alias("unit_c"),
        F.col("l_quantity").cast("bigint").alias("qty"),
        "l_orderkey",
        "l_linenumber",
    )
    cum = global_cumsum(
        w, ["unit_c", "l_orderkey", "l_linenumber"], "qty", "cw"
    )
    tot = w.agg(F.sum("qty").cast("bigint").alias("tw"))
    return cum.crossJoin(F.broadcast(tot)).agg(
        F.max("tw").alias("total_weight"),
        F.round(
            F.min(
                F.when(F.col("cw") * 4 >= F.col("tw"), F.col("unit_c"))
            )
            / 100.0,
            2,
        ).alias("w_p25"),
        F.round(
            F.min(
                F.when(F.col("cw") * 2 >= F.col("tw"), F.col("unit_c"))
            )
            / 100.0,
            2,
        ).alias("w_median"),
        F.round(
            F.min(
                F.when(F.col("cw") * 4 >= F.col("tw") * 3, F.col("unit_c"))
            )
            / 100.0,
            2,
        ).alias("w_p75"),
    )
