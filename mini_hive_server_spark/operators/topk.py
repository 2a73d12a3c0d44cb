"""Sorts, limits, top-k — SURVEY.md §2.6 (O1-O3).

Scale notes: `orderBy(...).limit(k)` compiles to TakeOrderedAndProject —
each partition keeps a k-row heap and only k·partitions rows reach the
driver; no global sort materializes. Top-k *per group* uses a window
row_number with partial pushdown; at extreme scale a two-phase
(per-partition top-k then global) variant can be expressed the same way.
Every ordering carries a unique-key tiebreaker → results are total-ordered
and oracle-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..registry import register

_ORDER_DESC_ORACLE = """
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_totalprice
FROM orders
ORDER BY o_orderdate DESC, o_orderkey DESC
LIMIT 20
"""


@register("order_desc_recent", oracle=_ORDER_DESC_ORACLE, tags=("sort",))
def order_desc_recent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: timestamp-descending feeds (`sort({createdAt:-1})`,
    index.js:523,534,1036). The reference's sort on an all-missing key
    (index.js:1008) is the degenerate case: every key NULL → `desc_nulls_last`
    ordering, preserved by the tiebreaker."""
    orders = load_tables(spark, sf_dir)["orders"]
    return (
        orders.orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
        .limit(20)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
        )
    )


_SORT_MISSING_ORACLE = """
SELECT o_orderkey,
       strftime(CAST(NULL AS TIMESTAMP), '%Y-%m-%d') AS current_date,
       o_totalprice
FROM orders
ORDER BY current_date DESC NULLS LAST, o_orderkey
LIMIT 15
"""


@register("sort_missing_field", oracle=_SORT_MISSING_ORACLE, tags=("sort", "fidelity"))
def sort_missing_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.11 fidelity quirk: the reference sorts withdrawal feeds on
    `current_date` (index.js:1008), a field NO insert path ever writes —
    every sort key is missing, and MongoDB degrades to a deterministic
    all-equal ordering. The relational translation: an all-NULL sort key
    under `desc_nulls_last`, where ordering is carried entirely by the
    unique-key tiebreaker. This exercises the null-ordering semantics that
    `order_desc_recent` (real timestamps) never reaches."""
    orders = load_tables(spark, sf_dir)["orders"]
    return (
        orders.select(
            "o_orderkey",
            # Rendered via date_format per the registry's "no raw
            # timestamps" determinism rule (NULL in, NULL string out).
            F.date_format(F.lit(None).cast("timestamp"), "yyyy-MM-dd").alias(
                "current_date"
            ),
            "o_totalprice",
        )
        .orderBy(F.col("current_date").desc_nulls_last(), F.col("o_orderkey"))
        .limit(15)
    )


_TOP_WORKERS_ORACLE = """
SELECT c_name AS name, c_acctbal AS coins, c_mktsegment AS img
FROM customer
WHERE c_mktsegment = 'BUILDING'
ORDER BY c_acctbal DESC, c_name
LIMIT 6
"""


@register("top_workers", oracle=_TOP_WORKERS_ORACLE, tags=("sort", "topk"))
def top_workers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2/§3.3: the reference's only fully-pushed-down pipeline —
    `[$match{role:'worker'}, $sort{coins:-1}, $limit 6, $project]`
    (index.js:1239-1250). Same logical shape here; physical plan is
    TakeOrderedAndProject over a filtered scan (distributed top-k, no full
    sort)."""
    customer = load_tables(spark, sf_dir)["customer"]
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_name"))
        .limit(6)
        .select(
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("coins"),
            F.col("c_mktsegment").alias("img"),
        )
    )


_TOPK_PER_GROUP_ORACLE = """
SELECT c_mktsegment, c_name, c_acctbal, rank FROM (
  SELECT c_mktsegment, c_name, c_acctbal,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey) AS rank
  FROM customer
)
WHERE rank <= 3
ORDER BY c_mktsegment, rank
"""


@register("topk_per_group", oracle=_TOPK_PER_GROUP_ORACLE, tags=("sort", "topk", "window-fn"))
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (the natural extension of O2: top workers *per
    segment*) via a ranking window function. Rank is computed after a single
    hash-partition on the group key — no global sort."""
    customer = load_tables(spark, sf_dir)["customer"]
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        customer.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("c_mktsegment", "c_name", "c_acctbal", "rank")
        .orderBy("c_mktsegment", "rank")
    )


# --------------------------------------------- skyline / Pareto frontier

_SKYLINE_ORACLE = """
WITH priced AS (
  SELECT p_partkey, p_size,
         CAST(round(p_retailprice * 100, 0) AS BIGINT) AS price_c
  FROM part
),
scanned AS (
  SELECT p_partkey, p_size, price_c,
         min(price_c) OVER (
           ORDER BY p_size DESC, price_c ASC, p_partkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_min
  FROM priced
)
SELECT p_partkey, p_size,
       round(price_c / 100.0, 2) AS retail_price
FROM scanned
WHERE prior_min IS NULL OR price_c < prior_min
ORDER BY p_size DESC, p_partkey
"""


@register("parts_skyline_frontier", oracle=_SKYLINE_ORACLE, tags=("topk", "agg"))
def parts_skyline_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) of parts: maximize p_size, minimize
    retail price — every part not dominated by another that is at least
    as large AND cheaper. The dominance-query operator family (Borzsony
    et al., ICDE 2001) reduced to the sort-filter skyline algorithm:
    scan the (size DESC, price ASC, partkey) total order and keep a row
    iff its price undercuts the strictly-prior running minimum (the
    first row always survives; an equal-(size, price) twin is kept only
    once, the standard distinct-skyline convention).

    Plan: the running minimum is `ranking.global_cummin(exclusive=True)`
    — the range-partitioned exact prefix-extreme, so the dominance scan
    of the SF-proportional part relation never funnels through a
    single-partition sort; prices are fixed to integer cents before
    comparing (exact 2-decimal encodings), making the frontier
    membership test pure integer comparison cross-engine. Output is
    frontier-sized (staircase of record-cheap sizes), tiny at any SF."""
    from .ranking import global_cummin

    part = load_tables(spark, sf_dir)["part"]
    priced = part.select(
        "p_partkey",
        "p_size",
        F.round(F.col("p_retailprice") * 100, 0).cast("bigint").alias("price_c"),
    )
    scanned = global_cummin(
        priced,
        [F.col("p_size").desc(), F.col("price_c").asc(), F.col("p_partkey")],
        "price_c",
        "prior_min",
        exclusive=True,
    )
    return (
        scanned.filter(
            F.col("prior_min").isNull() | (F.col("price_c") < F.col("prior_min"))
        )
        .select(
            "p_partkey",
            "p_size",
            F.round(F.col("price_c") / 100.0, 2).alias("retail_price"),
        )
        .orderBy(F.col("p_size").desc(), "p_partkey")
    )
