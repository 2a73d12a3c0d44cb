"""The synthesized reference-shaped tables (fixtures.py) must actually
carry every FIXTURES.md §B quirk and §C edge case — otherwise the
reference_model quirk queries exercise nothing — and must reproduce
bit-identically in DuckDB (the property that makes them oracle-able)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from mini_hive_server_spark import fixtures


def _t(spark, name):
    return fixtures.reference_table(spark, name)


def test_submission_quirks_present(spark):
    subs = _t(spark, "ref_submissions")
    stats = subs.agg(
        F.count(F.when(F.col("taskId").isNotNull(), 1)).alias("alt_key"),
        F.count(F.when(F.col("task_id").isNotNull(), 1)).alias("main_key"),
        F.count(F.when(F.col("status") == "approve", 1)).alias("misspelled"),
        F.count(F.when(F.col("payable_amount").isNull(), 1)).alias("null_pay"),
        F.count(F.when(F.col("buyer_email").isNull(), 1)).alias("null_buyer"),
    ).first()
    n = subs.count()
    assert 0.05 * n < stats.alt_key < 0.15 * n, stats  # ~10% taskId spelling
    assert stats.main_key + stats.alt_key == n  # exactly one spelling per row
    assert 0.01 * n < stats.misspelled < 0.04 * n  # ~2% 'approve'
    assert 0.03 * n < stats.null_pay < 0.08 * n  # ~5% NULL amount
    # ~1% orphan task references (no matching task)
    tasks = _t(spark, "ref_tasks").select(F.col("id").alias("tid"))
    orphans = (
        subs.select(F.coalesce("task_id", "taskId").alias("ref"))
        .join(F.broadcast(tasks), F.col("ref") == F.col("tid"), "left_anti")
        .count()
    )
    assert 0.005 * n < orphans < 0.02 * n, orphans


def test_payment_dual_shapes(spark):
    pays = _t(spark, "ref_payments")
    shapes = pays.agg(
        F.count(F.when(F.col("email").isNotNull(), 1)).alias("shape_b"),
        F.count(F.when(F.col("buyer_email").isNotNull(), 1)).alias("shape_a"),
        F.count(
            F.when(F.col("email").isNotNull() & F.col("buyer_email").isNotNull(), 1)
        ).alias("both"),
    ).first()
    n = pays.count()
    assert shapes.both == 0  # shapes are mutually exclusive, like the writers
    assert 0.5 * n < shapes.shape_b < 0.7 * n  # ~60% shape-B
    assert shapes.shape_a + shapes.shape_b == n


def test_user_and_task_edge_cases(spark):
    users = _t(spark, "ref_users")
    assert users.filter(F.col("role") == "ghost").count() == 1  # §C.5
    tasks = _t(spark, "ref_tasks")
    assert tasks.filter(F.col("status").isNull()).count() >= 1  # §C.2
    assert (
        tasks.filter(F.col("updatedAt").isNull()).count() > 0.5 * tasks.count()
    )  # ~70% never patched
    # §C.1: buyer #5 (buyer-FK: (5 div 30)*100 + (5 mod 30) + 1 = user 6)
    # has tasks but zero payments
    b5 = "user6@example.com"
    assert tasks.filter(F.col("buyer_email") == b5).count() > 0
    pays = _t(spark, "ref_payments")
    assert (
        pays.filter(
            (F.col("email") == b5) | (F.col("buyer_email") == b5)
        ).count()
        == 0
    )


def test_withdrawal_and_oversubscription_edges(spark):
    wds = _t(spark, "ref_withdrawals")
    n_low = wds.filter(F.col("withdrawal_coin") < 200).count()
    assert 0 < n_low < 0.1 * wds.count()  # sub-minimum rows exist (§C, min rule)
    # §C.4: at least one over-subscribed task (the audit query is non-empty)
    from mini_hive_server_spark import registry

    over = registry.queries()["ref_oversubscribed_tasks"](spark, "")
    assert over.count() > 0


def test_duckdb_reproduces_identical_rows(spark):
    """Spot-check cross-engine determinism on the two quirk-heaviest
    tables via full-row md5 rollups (cheap, order-insensitive)."""
    con = duckdb.connect()
    for table in ("ref_submissions", "ref_payments"):
        sdf = fixtures.reference_table(spark, table)
        cols = [
            F.date_format(n, "yyyy-MM-dd HH:mm:ss").alias(n)
            if dt.startswith("timestamp")
            else F.col(n).cast("string").alias(n)
            for n, dt in sdf.dtypes
        ]
        names = sorted(sdf.columns)
        rollup = (
            sdf.select(*cols)
            .select(
                F.md5(
                    F.concat_ws("|", *[F.coalesce(F.col(n), F.lit("NULL")) for n in names])
                ).alias("h")
            )
            .agg(F.count(F.lit(1)).alias("n"), F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("long")).alias("hsum"))
            .first()
        )
        ts_cols = {n for n, dt in sdf.dtypes if dt.startswith("timestamp")}
        concat = "concat_ws('|', " + ", ".join(
            (
                f"coalesce(strftime({n}, '%Y-%m-%d %H:%M:%S'), 'NULL')"
                if n in ts_cols
                else f"coalesce({n}::VARCHAR, 'NULL')"
            )
            for n in names
        ) + ")"
        duck = con.execute(
            f"WITH {fixtures.duck_cte(table)} "
            f"SELECT count(*) AS n, sum(('0x' || substr(md5({concat}), 1, 8))::BIGINT) AS hsum "
            f"FROM {table}"
        ).fetchone()
        assert (rollup.n, rollup.hsum) == duck, (table, rollup, duck)
