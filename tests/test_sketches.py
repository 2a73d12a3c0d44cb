"""Bounds for the approximate (rows-only) sketch aggregations: the oracle
gate can't check engine-specific sketches, so these tests bound them
against the exact answers computed in the same query."""

from __future__ import annotations

from pyspark.sql import functions as F

from mini_hive_server_spark import registry

from .conftest import SF_SMOKE

QS = registry.queries()


def test_approx_distinct_within_hll_error(spark):
    """HLL++ at default precision has ~2.3% standard error; assert a
    generous 5% envelope against the exact distinct per group."""
    for r in QS["sketch_approx_distinct"](spark, SF_SMOKE).collect():
        rel = abs(r.approx_users - r.exact_users) / max(r.exact_users, 1)
        assert rel <= 0.05, f"{r.event_type}: approx {r.approx_users} vs exact {r.exact_users}"


def test_hll_mergeable_union_within_error(spark):
    """The union of per-shard DataSketches HLL sketches (lgK=12 → ~1.6%
    standard error) must estimate the global distinct count within 5%."""
    row = QS["sketch_hll_mergeable"](spark, SF_SMOKE).collect()[0]
    rel = abs(row.approx_users - row.exact_users) / max(row.exact_users, 1)
    assert rel <= 0.05, row
    assert row.n_shards == 16


def test_approx_quantiles_bounded_by_exact_extremes(spark):
    """Each approximate quantile must lie within the group's exact value
    range and be monotone p50 <= p95 <= p99."""
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    exact = {
        r.o_orderstatus: (r.mn, r.mx)
        for r in orders.groupBy("o_orderstatus")
        .agg(F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx"))
        .collect()
    }
    for r in QS["sketch_approx_quantiles"](spark, SF_SMOKE).collect():
        mn, mx = exact[r.o_orderstatus]
        assert mn <= r.p50 <= r.p95 <= r.p99 <= mx, r
