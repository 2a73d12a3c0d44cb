"""Physical-plan guarantees for the source/sink layer: the oracle gate
proves values; these tests prove the layout decisions actually reach the
plan (pruning, bucketing)."""

from __future__ import annotations

import re

from mini_hive_server_spark import registry

from .conftest import SF_SMOKE

QS = registry.queries()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_write_prunes(spark):
    """The filter on the partition column must become a PartitionFilter on
    the scan (directory pruning), not a post-scan Filter."""
    plan = _plan(QS["source_partitioned_prune"](spark, SF_SMOKE))
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "o_orderpriority" in m.group(1), plan


def test_bucketed_join_no_shuffle(spark):
    """Bucketed tables joined on the bucket key: zero shuffle Exchange in
    the plan (a BroadcastExchange of the tiny filtered side is fine — that
    is not a repartition of the fact table)."""
    plan = _plan(QS["source_bucketed_join"](spark, SF_SMOKE))
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Bucketed: true" in plan, plan


def test_bucketed_smj_without_broadcast(spark):
    """With broadcast disabled, the bucketed join must run as a SortMergeJoin
    with still zero Exchange — the pre-shuffled layout carries the join."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(QS["source_bucketed_join"](spark, SF_SMOKE))
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
