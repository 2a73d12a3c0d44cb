"""Headline analytical plans (TPC-H-shaped) — the engine's flagship queries.

The reference's richest read path (`/root/reference/index.js:542-589`,
SURVEY.md §3.1) is a scan→filter→join→aggregate dashboard; these queries are
the same shapes at analytical scale on the driver fixtures, and double as the
bench workload.

Scale design: `lineitem` is the 100 TB fact; every plan here aggregates it
with map-side partial aggregation (Catalyst HashAggregate partial→final),
joins dimensions broadcast-side (`F.broadcast`), and keeps all expressions
JVM-codegen'd (no Python UDFs). Filters are written directly against scan
columns so Parquet row-group pruning and predicate pushdown apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..registry import register

_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  round(sum(l_quantity), 2)                                        AS sum_qty,
  round(sum(l_extendedprice), 2)                                   AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
  round(avg(l_quantity), 4)                                        AS avg_qty,
  round(avg(l_extendedprice), 4)                                   AS avg_price,
  round(avg(l_discount), 6)                                        AS avg_disc,
  count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=_Q1_ORACLE, tags=("headline", "agg"))
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide multi-aggregate grouped scan of the fact table.

    Reference analog: the multi-metric dashboard aggregations
    (`index.js:1200-1233`, SURVEY.md §2.5 A7) — counts+sums computed in one
    pass instead of the reference's four sequential round-trips.
    """
    lineitem = load_tables(spark, sf_dir)["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q3_ORACLE = """
SELECT
  l_orderkey,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
  strftime(o_orderdate, '%Y-%m-%d')                 AS orderdate,
  o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", oracle=_Q3_ORACLE, tags=("headline", "join", "topk"))
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact join → grouped agg → top-k.

    Reference analog: buyer-home (`index.js:542-589`) = filter a small side
    (one buyer's tasks), join the fact (submissions), aggregate. The
    `customer` side after the segment filter is small → broadcast, so the
    fact table joins without shuffling (SURVEY.md §2.4 J1).
    """
    t = load_tables(spark, sf_dir)
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = t["orders"].filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = t["lineitem"].filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(
            F.broadcast(
                orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


_Q5_ORACLE = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@register("q5_region_volume", oracle=_Q5_ORACLE, tags=("headline", "join"))
def q5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join with a region filter.

    Reference analog: the 2-hop chained lookup joins (`index.js:205-206`,
    SURVEY.md §2.4 J3) generalized to a full star. All dimensions broadcast;
    only the lineitem↔orders join is a real shuffle candidate, and AQE keeps
    it broadcast when the filtered orders side is small.
    """
    t = load_tables(spark, sf_dir)
    region = t["region"].filter(F.col("r_name") == "ASIA")
    nation = t["nation"].join(
        F.broadcast(region), t["nation"].n_regionkey == region.r_regionkey
    )
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = t["lineitem"]
    cust = t["customer"]
    supp = t["supplier"]
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(supp),
            li.l_suppkey == supp.s_suppkey,
        )
        .join(
            F.broadcast(cust),
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


_ARGMIN_ORACLE = """
WITH mn AS (
  SELECT o_custkey, min(o_totalprice) AS m
  FROM orders GROUP BY o_custkey
)
SELECT c_custkey, c_name, o_orderkey, round(o_totalprice, 2) AS price
FROM customer
JOIN orders ON c_custkey = orders.o_custkey
JOIN mn ON orders.o_custkey = mn.o_custkey AND o_totalprice = m
WHERE c_custkey < 100
ORDER BY c_custkey, o_orderkey
"""


@register("argmin_cheapest_order", oracle=_ARGMIN_ORACLE, tags=("join", "agg"))
def argmin_cheapest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2's argmin shape on the fixture schema: the per-group
    minimum computed once, joined back to select the achieving rows
    (Catalyst decorrelates the equivalent correlated subquery to exactly
    this plan). Ties keep all achieving rows in both engines."""
    t = load_tables(spark, sf_dir)
    orders = t["orders"]
    mn = orders.groupBy("o_custkey").agg(F.min("o_totalprice").alias("m"))
    cust = t["customer"].filter(F.col("c_custkey") < 100)
    return (
        orders.join(
            F.broadcast(mn.withColumnRenamed("o_custkey", "mk")),
            (F.col("o_custkey") == F.col("mk")) & (F.col("o_totalprice") == F.col("m")),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
        )
        .orderBy("c_custkey", "o_orderkey")
    )


_Q18_ORACLE = """
WITH big AS (
  SELECT l_orderkey
  FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(l_quantity) > 300
)
SELECT c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       round(o_totalprice, 2) AS totalprice,
       round(sum(l_quantity), 2) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
ORDER BY totalprice DESC, o_orderkey
LIMIT 20
"""


@register("q18_large_orders", oracle=_Q18_ORACLE, tags=("headline", "agg", "join"))
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered aggregate as a semi-join filter on
    the fact, then re-aggregate with dimensions. The `big` subquery is the
    interesting plan piece: one pass over lineitem produces the qualifying
    keys (partial-agg'd), which then SEMI-join back — no row
    multiplication before the final group-by. At 100 TB both lineitem
    passes shuffle on l_orderkey, so with bucketed tables
    (source_bucketed_join) they'd be shuffle-free."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 300)
        .select("l_orderkey")
    )
    orders = t["orders"].join(
        big.withColumnRenamed("l_orderkey", "bk"),
        F.col("o_orderkey") == F.col("bk"),
        "left_semi",
    )
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.col("totalprice").desc(), "o_orderkey")
        .limit(20)
    )
