"""Scans, point lookups, and projections — SURVEY.md §2.1-§2.3.

Reference sites re-expressed on the fixture schema:
* S1 full scan        — ``find({})`` at /root/reference/index.js:534,1114-1116
* S2 point lookup     — ``findOne({_id})`` at index.js:137,148,174,205,...
* S3 secondary lookup — ``findOne({email})`` at index.js:77,120,346,...
* P1/P2 projections   — index.js:1115, index.js:1244-1248
* F1-F4/F6/F8 filters — index.js:230,522,599-614,950-953,1100-1103,388-391

Scale notes: point lookups and selective filters rely on Parquet
min/max row-group pruning + predicate pushdown (visible as PushedFilters in
`.explain("formatted")`); projections prune columns at the scan (ReadSchema).
At 100 TB these queries read only the row groups and columns they touch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..registry import register

_FULL_SCAN_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment, c_acctbal
FROM customer
ORDER BY c_custkey
"""


@register("full_scan_projection", oracle=_FULL_SCAN_ORACLE, tags=("scan", "projection"))
def full_scan_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 + P1: full collection scan with inclusion projection.

    Reference: `usersCollection.find({}, {projection:{name:1,email:1,...}})`
    (index.js:1114-1116). Column pruning reaches the Parquet scan — the file
    is read for exactly these four columns.
    """
    customer = load_tables(spark, sf_dir)["customer"]
    return customer.select("c_custkey", "c_name", "c_mktsegment", "c_acctbal").orderBy(
        "c_custkey"
    )


_POINT_LOOKUP_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority
FROM orders
WHERE o_orderkey = 42
"""


@register("point_lookup_pk", oracle=_POINT_LOOKUP_ORACLE, tags=("scan", "lookup"))
def point_lookup_pk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: point lookup by primary key (`findOne({_id: ObjectId})`,
    index.js:137 et al.). Equality predicate pushes down to the scan;
    `findOne`'s first-match semantics are exact here because the key is
    unique."""
    orders = load_tables(spark, sf_dir)["orders"]
    return orders.filter(F.col("o_orderkey") == 42).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        "o_orderpriority",
    )


_SECONDARY_LOOKUP_ORACLE = """
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
FROM customer
WHERE c_name = 'Customer#000000042'
"""


@register("lookup_secondary_key", oracle=_SECONDARY_LOOKUP_ORACLE, tags=("scan", "lookup"))
def lookup_secondary_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: lookup by secondary (logical) key — `findOne({email})`
    (index.js:346,417,...). `users.email` maps to `customer.c_name` as the
    human-readable unique key."""
    customer = load_tables(spark, sf_dir)["customer"]
    return customer.filter(F.col("c_name") == "Customer#000000042")


_PROJECT_RENAME_ORACLE = """
SELECT c_name AS name, c_acctbal AS coins, c_mktsegment AS img
FROM customer
WHERE c_custkey < 100
ORDER BY name
"""


@register("projection_rename", oracle=_PROJECT_RENAME_ORACLE, tags=("projection",))
def projection_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: `$project` with rename — `{name:1, coins:1, img:'$photo'}`
    (index.js:1244-1248)."""
    customer = load_tables(spark, sf_dir)["customer"]
    return (
        customer.filter(F.col("c_custkey") < 100)
        .select(
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("coins"),
            F.col("c_mktsegment").alias("img"),
        )
        .orderBy("name")
    )


_CONJUNCTION_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag, l_linestatus
FROM lineitem
WHERE l_returnflag = 'R' AND l_linestatus = 'F' AND l_quantity >= 49
ORDER BY l_orderkey, l_linenumber
"""


@register("filter_conjunction", oracle=_CONJUNCTION_ORACLE, tags=("filter",))
def filter_conjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: implicit-AND compound predicate (`{_id, buyer_email}`
    index.js:808,862; `{task_id, status:'approved'}` index.js:816-819).
    All three conjuncts push down to one Parquet filter."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.filter(
            (F.col("l_returnflag") == "R")
            & (F.col("l_linestatus") == "F")
            & (F.col("l_quantity") >= 49)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_returnflag",
            "l_linestatus",
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# MongoDB `$ne` matches documents where the field is missing; Spark/SQL `!=`
# is null-rejecting (SURVEY.md §2.11 item 1). The fixtures have no NULLs, so
# the query *derives* them (nullif) and then applies the null-safe translation.
_NE_NULL_SAFE_ORACLE = """
WITH t AS (
  SELECT o_orderkey, nullif(o_orderstatus, 'F') AS status
  FROM orders
)
SELECT coalesce(status, '<missing>') AS status_class, count(*) AS n
FROM t
WHERE status IS DISTINCT FROM 'O'
GROUP BY 1
ORDER BY 1
"""


@register("ne_null_safe", oracle=_NE_NULL_SAFE_ORACLE, tags=("filter", "null-semantics"))
def ne_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: MongoDB `$ne` semantics — `status: {$ne: "deleted"}`
    (index.js:601,607) matches rows where status is missing. Translated as a
    null-safe inequality: `NOT (status <=> 'O')` in Spark, `IS DISTINCT
    FROM` in the oracle."""
    orders = load_tables(spark, sf_dir)["orders"]
    t = orders.select(
        "o_orderkey", F.nullif(F.col("o_orderstatus"), F.lit("F")).alias("status")
    )
    return (
        t.filter(~F.col("status").eqNullSafe(F.lit("O")))
        .groupBy(F.coalesce(F.col("status"), F.lit("<missing>")).alias("status_class"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("status_class")
    )


_ISIN_ORACLE = """
SELECT o_orderpriority, count(*) AS n
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("isin_membership", oracle=_ISIN_ORACLE, tags=("filter",))
def isin_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 literal-list membership: `status: {$in:["approve","approved"]}`
    (index.js:614). Small literal lists stay a scan predicate (pushed down);
    key-list `$in` probes become real semi-joins (see operators.joins)."""
    orders = load_tables(spark, sf_dir)["orders"]
    return (
        orders.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderpriority")
    )


_DYNAMIC_FILTER_ORACLE = """
SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders
WHERE o_orderstatus = 'P'
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register("dynamic_optional_filter", oracle=_DYNAMIC_FILTER_ORACLE, tags=("filter",))
def dynamic_optional_filter(
    spark: SparkSession, sf_dir: str, status: str | None = "P"
) -> DataFrame:
    """F6: dynamically-built query — `query = status ? {status} : {}`
    (index.js:1100-1103). The filter is applied only when the parameter is
    present; the registered/oracle form pins status='P'."""
    orders = load_tables(spark, sf_dir)["orders"]
    if status is not None:
        orders = orders.filter(F.col("o_orderstatus") == status)
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("o_orderstatus")
    )


_EXISTS_ORACLE = """
SELECT (count(*) > 0) AS already_exists
FROM customer
WHERE c_name = 'Customer#000000007'
"""


@register("existence_check", oracle=_EXISTS_ORACLE, tags=("filter",))
def existence_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: existence/uniqueness check before insert — `findOne({email})` then
    409 if present (index.js:388-391)."""
    customer = load_tables(spark, sf_dir)["customer"]
    return customer.filter(F.col("c_name") == "Customer#000000007").agg(
        (F.count(F.lit(1)) > 0).alias("already_exists")
    )
