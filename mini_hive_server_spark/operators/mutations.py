"""Mutations as pure DataFrame transforms — SURVEY.md §2.1 S4-S7.

The reference mutates MongoDB in place (`insertOne`/`updateOne $set,$inc`/
`deleteOne`); a batch-analytics engine expresses the same semantics as
deterministic transforms over immutable snapshots (SURVEY.md §1.5):

* insert  → `unionByName` with literal rows
* $set    → `when(keyPred, newVal).otherwise(col)`
* $inc    → `when(keyPred, col + δ).otherwise(col)`
* delete  → `left_anti` join against the victim keys

Each query returns a *verifiable aggregate of the post-mutation state* so
the oracle checks the transform, not a side effect. At scale this is the
copy-on-write pattern (the Delta/Iceberg MERGE shape) without a table-format
dependency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..registry import register

_INSERT_ORACLE = """
WITH after AS (
  SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
  UNION ALL
  SELECT * FROM (VALUES (9001, 'BUILDING', CAST(50 AS DOUBLE)),
                        (9002, 'MACHINERY', CAST(10 AS DOUBLE)))
)
SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS balance
FROM after
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@register("mutation_insert_append", oracle=_INSERT_ORACLE, tags=("mutation",))
def mutation_insert_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4: `insertOne(doc)` with role-seeded defaults (`role==='buyer' ? 50
    : 10` coins, index.js:393-404) → append-union of literal rows, verified
    by post-state aggregation."""
    cust = load_tables(spark, sf_dir)["customer"].select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    new_rows = spark.createDataFrame(
        [(9001, "BUILDING", 50.0), (9002, "MACHINERY", 10.0)],
        schema="c_custkey long, c_mktsegment string, c_acctbal double",
    )
    return (
        cust.unionByName(new_rows)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("c_acctbal"), 2).alias("balance"),
        )
        .orderBy("c_mktsegment")
    )


_UPDATE_SET_ORACLE = """
WITH after AS (
  SELECT o_orderkey,
         CASE WHEN o_custkey = 77 AND o_orderstatus = 'P'
              THEN 'F' ELSE o_orderstatus END AS o_orderstatus
  FROM orders
)
SELECT o_orderstatus, count(*) AS n
FROM after
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register("mutation_update_set", oracle=_UPDATE_SET_ORACLE, tags=("mutation",))
def mutation_update_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: `updateOne(filter, {$set:{status:...}})` (index.js:828-831,
    869-872) — conditional column rewrite over the snapshot; post-state
    status histogram proves exactly the matched rows changed."""
    orders = load_tables(spark, sf_dir)["orders"]
    after = orders.select(
        "o_orderkey",
        F.when(
            (F.col("o_custkey") == 77) & (F.col("o_orderstatus") == "P"), "F"
        )
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
    )
    return (
        after.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderstatus")
    )


_UPDATE_INC_ORACLE = """
WITH after AS (
  SELECT c_custkey,
         c_acctbal + CASE WHEN c_mktsegment = 'FURNITURE' THEN -25.5 ELSE 0 END
           AS c_acctbal
  FROM customer
)
SELECT round(sum(c_acctbal), 2) AS total_after,
       round(min(c_acctbal), 2) AS min_after
FROM after
"""


@register("mutation_update_inc", oracle=_UPDATE_INC_ORACLE, tags=("mutation",))
def mutation_update_inc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: `updateOne(filter, {$inc:{coins: δ}})` with negative δ — the
    coin-deduction write (index.js:489-492). Applied set-wide here (every
    FURNITURE customer pays 25.5) to make the arithmetic visible in the
    checked aggregate."""
    cust = load_tables(spark, sf_dir)["customer"]
    after = cust.select(
        "c_custkey",
        (
            F.col("c_acctbal")
            + F.when(F.col("c_mktsegment") == "FURNITURE", -25.5).otherwise(0.0)
        ).alias("c_acctbal"),
    )
    return after.agg(
        F.round(F.sum("c_acctbal"), 2).alias("total_after"),
        F.round(F.min("c_acctbal"), 2).alias("min_after"),
    )


_DELETE_ORACLE = """
WITH after AS (
  SELECT * FROM orders
  WHERE o_orderkey NOT IN (
    SELECT o_orderkey FROM orders WHERE o_custkey = 77 AND o_orderstatus = 'O'
  )
)
SELECT count(*) AS n_remaining,
       count(*) FILTER (WHERE o_custkey = 77) AS n_cust77_remaining
FROM after
"""


@register("mutation_delete_anti", oracle=_DELETE_ORACLE, tags=("mutation",))
def mutation_delete_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7: `deleteOne(filter)` (index.js:250,700,1128,1183) → left_anti
    against the victim-key set; the intended semantics of the reference's
    broken `/admin/tasks` delete (SURVEY.md §2.11 item 6) implemented
    correctly."""
    orders = load_tables(spark, sf_dir)["orders"]
    victims = orders.filter(
        (F.col("o_custkey") == 77) & (F.col("o_orderstatus") == "O")
    ).select("o_orderkey")
    after = orders.join(victims, "o_orderkey", "left_anti")
    return after.agg(
        F.count(F.lit(1)).alias("n_remaining"),
        F.sum(F.when(F.col("o_custkey") == 77, 1).otherwise(0)).alias(
            "n_cust77_remaining"
        ),
    )
