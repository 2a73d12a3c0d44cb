"""Bounds for the approximate sketch aggregations. The registered queries
emit exact values plus a within-error-bound flag (the oracle-checkable
contract); these tests bound the RAW estimates via the module's
estimate-bearing helpers, and assert the registered flags are all true."""

from __future__ import annotations

from pyspark.sql import functions as F

from mini_hive_server_spark import registry
from mini_hive_server_spark.operators.sketches import (
    approx_distinct_raw,
    hll_mergeable_raw,
)

from .conftest import SF_SMOKE

QS = registry.queries()


def test_approx_distinct_within_hll_error(spark):
    """HLL++ at default precision has ~2.3% standard error; assert a
    generous 5% envelope against the exact distinct per group."""
    for r in approx_distinct_raw(spark, SF_SMOKE).collect():
        rel = abs(r.approx_users - r.exact_users) / max(r.exact_users, 1)
        assert rel <= 0.05, f"{r.event_type}: approx {r.approx_users} vs exact {r.exact_users}"
    rows = QS["sketch_approx_distinct"](spark, SF_SMOKE).collect()
    assert rows and all(r.approx_ok for r in rows)


def test_hll_mergeable_union_within_error(spark):
    """The union of per-shard DataSketches HLL sketches (lgK=12 → ~1.6%
    standard error) must estimate the global distinct count within 5%."""
    row = hll_mergeable_raw(spark, SF_SMOKE).collect()[0]
    rel = abs(row.approx_users - row.exact_users) / max(row.exact_users, 1)
    assert rel <= 0.05, row
    assert row.n_shards == 16
    out = QS["sketch_hll_mergeable"](spark, SF_SMOKE).collect()[0]
    assert out.approx_ok and out.n_shards == 16


def test_approx_quantiles_bounded_by_exact_extremes(spark):
    """The emitted exact percentiles must lie within the group's value
    range, be monotone p50 <= p95 <= p99, and every group's sketch
    estimate must sit inside the 1%-rank envelope (approx_ok)."""
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
        assert r.approx_ok, r


def test_cms_estimates_are_exact_at_fixture_widths(spark):
    """The CMS heavy-hitter oracle reports EXACT counts, so the sketch
    estimate must clear every collision at fixture cardinality (min over
    d=4 rows of w=1024 counters vs 150 keys). Pin estimate==exact for ALL
    keys (not just heavy hitters) at both fixture SFs — the first
    fixture regeneration that plants a 4-row total collision fails here
    before it ever reaches the driver."""
    from mini_hive_server_spark.catalog import load_tables
    from mini_hive_server_spark.operators.sketches import (
        _CMS_DEPTH,
        _CMS_WIDTH,
        cms_sketch,
    )

    for sf in (SF_SMOKE, "/root/testdata/sf0.01"):
        events = load_tables(spark, sf)["events"]
        exact = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        probe = events.select("user_id").distinct().select(
            "user_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, {_CMS_DEPTH - 1}),"
                    f" j -> pmod(xxhash64(user_id, j), {_CMS_WIDTH}))"
                )
            ).alias("j", "bucket"),
        )
        est = (
            probe.join(cms_sketch(events), ["j", "bucket"])
            .groupBy("user_id")
            .agg(F.min("counter").alias("est"))
        )
        bad = est.join(exact, "user_id").filter(F.col("est") != F.col("n")).collect()
        assert not bad, f"{sf}: CMS over-estimates {bad[:5]}"


def test_hll_intersection_estimate_bounded(spark):
    """Inclusion-exclusion compounds the error of three sketches; bound
    the raw overlap estimate by 10% of the smaller cohort and assert the
    registered flag holds."""
    from mini_hive_server_spark.operators.sketches import hll_intersection_raw

    r = hll_intersection_raw(spark, SF_SMOKE).collect()[0]
    envelope = 0.10 * min(r.exact_clickers, r.exact_purchasers)
    assert abs(r.approx_both - r.exact_both) <= envelope, r
    rows = QS["sketch_hll_intersection"](spark, SF_SMOKE).collect()
    assert rows and rows[0].approx_ok
