"""Physical-plan guarantees for the source/sink layer: the oracle gate
proves values; these tests prove the layout decisions actually reach the
plan (pruning, bucketing)."""

from __future__ import annotations

import re

from mini_hive_server_spark import registry

from .conftest import SF_ORACLE, SF_SMOKE

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


def test_bucketed_catalog_reregister_no_rewrite(spark):
    """Fresh-catalog fallback: when the bucketed data is on disk and fresh
    but the session catalog has no entry (the in-memory-catalog restart
    case), the query must re-register via catalog-only DDL — NOT rewrite
    the data (ADVICE r11: the old fallback called _write() outside
    _build_once's flock, a full DROP+rewrite racing concurrent readers).
    Proof: drop the catalog entries, snapshot part-file stats, re-run —
    identical files, bucketed shuffle-free plan, same result."""
    import glob
    import os

    from mini_hive_server_spark.sources.connectors import _path_tag, _tmp_dir

    first = QS["source_bucketed_join"](spark, SF_SMOKE).collect()
    sf_name = os.path.basename(os.path.normpath(SF_SMOKE)).replace(".", "_")
    db = f"mhs_bucketed_{sf_name}_{_path_tag(SF_SMOKE)}"

    def _stats():
        out = {}
        for tbl in ("orders_b", "lineitem_b"):
            for p in glob.glob(os.path.join(_tmp_dir(SF_SMOKE, f"bucketed/{tbl}"), "*.parquet")):
                st = os.stat(p)
                out[p] = (st.st_mtime_ns, st.st_size)
        return out

    before = _stats()
    assert before, "expected staged bucketed part files"
    for tbl in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE {db}.{tbl}")  # external: metadata only
    df = QS["source_bucketed_join"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "Bucketed: true" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert _stats() == before, "fallback rewrote data files"
    assert df.collect() == first


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


def test_zorder_rowgroups_bound_both_dims(spark, tmp_path):
    """Mechanism proof for source_zorder_layout: parquet footer stats of
    the Z-ORDERED layout must bound user_id per row group at a fraction of
    the time-sorted baseline (whose every row group spans the full user
    range — a user predicate prunes nothing there). Row-group min/max is
    exactly what Spark's parquet filter pushdown prunes with, so narrow
    stats = skipped IO, no execution needed to prove it."""
    import glob

    import pyarrow.parquet as pq

    from mini_hive_server_spark.catalog import load_tables
    from mini_hive_server_spark.sources.connectors import write_events_zorder

    zdir = str(tmp_path / "z")
    tdir = str(tmp_path / "t")
    write_events_zorder(spark, SF_ORACLE, zdir)
    (
        load_tables(spark, SF_ORACLE)["events"]
        .repartitionByRange(8, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .option("parquet.block.size", 256 * 1024)
        .parquet(tdir)
    )

    def avg_user_spread(path):
        spreads = []
        for f in glob.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(cols["user_id"]).statistics
                spreads.append(st.max - st.min)
        assert spreads
        return sum(spreads) / len(spreads)

    z, t = avg_user_spread(zdir), avg_user_spread(tdir)
    assert z * 3 < t, (
        f"z-order user spread {z:.0f} not substantially narrower than "
        f"time-sorted {t:.0f}"
    )


def test_incremental_rollup_leaves_unaffected_partitions_untouched(spark):
    """Dynamic partition overwrite must replace ONLY the partitions
    present in the merge write: the base files of every day outside the
    delta's 3-day late-arrival window keep their exact file identities
    (Spark part-file names embed a per-write UUID, so any rewrite would
    change them), while every affected day's files are replaced."""
    import os

    from mini_hive_server_spark.sources.connectors import (
        _tmp_dir,
        merge_rollup_delta,
        write_rollup_base,
    )

    out = _tmp_dir(SF_SMOKE, "events_rollup_by_day")
    write_rollup_base(spark, SF_SMOKE, out)

    def listing():
        return {
            d: sorted(os.listdir(os.path.join(out, d)))
            for d in os.listdir(out)
            if d.startswith("day=")
        }

    before = listing()
    merge_rollup_delta(spark, SF_SMOKE, out)
    after = listing()

    assert set(after) == set(before), "merge must not add or drop day partitions"
    days = sorted(before)
    affected = set(days[-3:])  # delta = last 3 days by construction
    changed = {d for d in days if before[d] != after[d]}
    assert changed == affected, (
        f"expected exactly the last-3-day partitions rewritten; "
        f"changed={sorted(changed)} affected={sorted(affected)}"
    )


def test_dynamic_partition_pruning_in_plan(spark):
    """The dim-side-only filter must plant a dynamicpruning subquery on
    the fact scan (runtime partition pruning) — no static
    PartitionFilter names the months, yet the scan must not be a full
    read."""
    df = QS["source_dynamic_partition_prune"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "dynamicpruning" in plan.lower(), plan


def test_agg_pushdown_reaches_parquet_footer(spark):
    """source_agg_pushdown must actually push the aggregate into the V2
    parquet scan (PushedAggregation in the executed plan, no
    HashAggregate over raw rows feeding it from a full scan) — and the
    session conf it flips must be restored afterwards."""
    from mini_hive_server_spark import registry

    v1_key = "spark.sql.sources.useV1SourceList"
    before = spark.conf.get(v1_key)
    df = registry.queries()["source_agg_pushdown"](spark, SF_SMOKE)
    assert spark.conf.get(v1_key) == before, "conf not restored"
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedAggregation: [COUNT(*)" in plan, plan
    assert "MIN(o_totalprice)" in plan, plan
    # the scan's output IS the aggregate — ReadSchema carries agg columns
    assert "ReadSchema: struct<count(" in plan, plan


def test_analyze_table_stats_feed_cbo(spark, tmp_path):
    """ANALYZE TABLE COMPUTE STATISTICS must land row/size stats in the
    catalog and the optimizer must SEE them (plan statistics carry the
    analyzed rowCount instead of a file-size heuristic) — the
    cost-based-optimization prerequisite: at cluster scale CBO's join
    reorder and broadcast decisions are only as good as these stats."""
    from mini_hive_server_spark import registry  # noqa: F401 — session init

    spark.sql("CREATE DATABASE IF NOT EXISTS mhs_cbo")
    try:
        src = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
        (
            src.write.mode("overwrite")
            .option("path", str(tmp_path / "nation_tbl"))
            .saveAsTable("mhs_cbo.nation_tbl")
        )
        spark.sql(
            "ANALYZE TABLE mhs_cbo.nation_tbl COMPUTE STATISTICS "
            "FOR COLUMNS n_nationkey"
        )
        n = src.count()
        # plan statistics only surface the analyzed rowCount under CBO
        # (otherwise the size-only visitor runs); flip it for the probe
        prev_cbo = spark.conf.get("spark.sql.cbo.enabled")
        spark.conf.set("spark.sql.cbo.enabled", "true")
        try:
            stats = (
                spark.table("mhs_cbo.nation_tbl")
                ._jdf.queryExecution()
                .optimizedPlan()
                .stats()
            )
            assert not stats.rowCount().isEmpty(), "rowCount stat missing"
            assert stats.rowCount().get() == n
        finally:
            spark.conf.set("spark.sql.cbo.enabled", prev_cbo)
        # column-level stats recorded (distinct-count for the join key)
        col = spark.sql(
            "DESCRIBE EXTENDED mhs_cbo.nation_tbl n_nationkey"
        ).collect()
        got = {r[0]: r[1] for r in col}
        assert got.get("distinct_count") == str(n), got
    finally:
        spark.sql("DROP TABLE IF EXISTS mhs_cbo.nation_tbl")
        spark.sql("DROP DATABASE IF EXISTS mhs_cbo")
