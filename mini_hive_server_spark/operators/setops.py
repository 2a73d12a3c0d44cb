"""Set operations — SURVEY.md §2.7.

The reference has none (its duplicate route registrations are an Express
artifact, not set ops); Spark provides them natively, so the surface is
completed here: UNION/INTERSECT/EXCEPT with DISTINCT semantics, the shapes
a user of the reference would reach for next.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..registry import register


def _custkeys_with_priority(t, priority: str) -> DataFrame:
    return (
        t["orders"].filter(F.col("o_orderpriority") == priority).select("o_custkey")
    )


_UNION_ORACLE = """
SELECT count(*) AS n FROM (
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
  UNION
  SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
)
"""


@register("set_union_distinct", oracle=_UNION_ORACLE, tags=("setop",))
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): customers with urgent or high-priority orders."""
    t = load_tables(spark, sf_dir)
    u = _custkeys_with_priority(t, "1-URGENT").union(
        _custkeys_with_priority(t, "2-HIGH")
    ).distinct()
    return u.agg(F.count(F.lit(1)).alias("n"))


_INTERSECT_ORACLE = """
SELECT count(*) AS n FROM (
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
)
"""


@register("set_intersect", oracle=_INTERSECT_ORACLE, tags=("setop",))
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers with both urgent and low-priority orders."""
    t = load_tables(spark, sf_dir)
    i = _custkeys_with_priority(t, "1-URGENT").intersect(
        _custkeys_with_priority(t, "5-LOW")
    )
    return i.agg(F.count(F.lit(1)).alias("n"))


_EXCEPT_ORACLE = """
SELECT count(*) AS n FROM (
  SELECT c_custkey FROM customer
  EXCEPT
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
"""


@register("set_except", oracle=_EXCEPT_ORACLE, tags=("setop",))
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: all customers minus those with urgent orders (the set-op twin
    of the anti-join)."""
    t = load_tables(spark, sf_dir)
    e = t["customer"].select(F.col("c_custkey")).subtract(
        _custkeys_with_priority(t, "1-URGENT")
    )
    return e.agg(F.count(F.lit(1)).alias("n"))
