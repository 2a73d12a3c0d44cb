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


_ALL_VARIANTS_ORACLE = """
WITH u AS (
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
),
h AS (
  SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
)
SELECT
  (SELECT count(*) FROM (SELECT * FROM u UNION ALL SELECT * FROM h)) AS n_union_all,
  (SELECT count(*) FROM (SELECT * FROM u INTERSECT ALL SELECT * FROM h)) AS n_intersect_all,
  (SELECT count(*) FROM (SELECT * FROM u EXCEPT ALL SELECT * FROM h)) AS n_except_all
"""


@register("set_ops_all_variants", oracle=_ALL_VARIANTS_ORACLE, tags=("setop",))
def set_ops_all_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bag-semantics (ALL) set operations in one row — UNION ALL
    keeps every duplicate, INTERSECT ALL keeps min(multiplicity),
    EXCEPT ALL subtracts multiplicities — completing §2.7 next to the
    DISTINCT forms. The multiplicity rules matter for fact data: a
    customer with 3 urgent + 2 high orders contributes 5/2/1 rows to the
    three results respectively, which the DISTINCT forms collapse to
    1/1/0.

    Plan: UNION ALL is a free concatenation (no shuffle); the ALL
    intersect/except compile to multiplicity-tracking hash aggregates on
    the key — one exchange each, same movement class as the DISTINCT
    forms."""
    t = load_tables(spark, sf_dir)
    u = _custkeys_with_priority(t, "1-URGENT")
    h = _custkeys_with_priority(t, "2-HIGH")
    n_union_all = u.unionAll(h).agg(F.count(F.lit(1)).alias("n_union_all"))
    n_intersect_all = u.intersectAll(h).agg(
        F.count(F.lit(1)).alias("n_intersect_all")
    )
    n_except_all = u.exceptAll(h).agg(F.count(F.lit(1)).alias("n_except_all"))
    return n_union_all.crossJoin(F.broadcast(n_intersect_all)).crossJoin(
        F.broadcast(n_except_all)
    )
