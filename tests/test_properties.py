"""Property-based invariants (hypothesis): the oracle gate checks fixed
fixtures; these check algebraic properties on generated data — the cases
a fixture never contains (all-null groups, hot keys, empty relations).

Examples are kept small and few: each runs real Spark jobs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (key in small range → collisions guaranteed; value; value may be null)
_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.one_of(st.none(), st.integers(min_value=-1000, max_value=1000)),
    ),
    min_size=0,
    max_size=30,
)


@given(rows=_rows)
@_settings
def test_salted_agg_equals_direct(spark, rows):
    """groupBy((key, salt)) then merge must equal the direct groupBy for
    counts and integer sums, for any distribution including hot keys."""
    if not rows:
        return
    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)], "id long, k int, v int"
    )
    direct = {
        (r.k): (r.n, r.s)
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    salted = (
        df.withColumn("salt", (F.col("id") % 4).cast("int"))
        .groupBy("k", "salt")
        .agg(F.count(F.lit(1)).alias("pn"), F.sum("v").alias("pv"))
        .groupBy("k")
        .agg(F.sum("pn").alias("n"), F.sum("pv").alias("s"))
    )
    merged = {(r.k): (r.n, r.s) for r in salted.collect()}
    assert merged == direct


@given(rows=_rows)
@_settings
def test_ne_null_safe_matches_mongo_semantics(spark, rows):
    """MongoDB's `$ne: x` matches documents where the field is missing or
    null; Spark's `!=` rejects nulls. The engine's null-safe pattern
    `(col != x) | col.isNull()` must equal the Mongo model on any data."""
    df = spark.createDataFrame(
        [(i, v) for i, (_, v) in enumerate(rows)], "id long, v int"
    )
    target = 0
    expect = {i for i, (_, v) in enumerate(rows) if v is None or v != target}
    got = {
        r.id
        for r in df.filter(
            (F.col("v") != target) | F.col("v").isNull()
        ).collect()
    }
    assert got == expect


@given(rows=_rows)
@_settings
def test_sum_empty_input_coalesce_default(spark, rows):
    """`coalesce(sum(x), 0)` must yield 0 on empty input and on all-null
    input — the reference's `agg[0]?.x || 0` idiom (SURVEY §2.5 A4)."""
    only_nulls = [(i, None) for i in range(3)]
    for data in ([], only_nulls, [(i, v) for i, (_, v) in enumerate(rows)]):
        df = spark.createDataFrame(data, "id long, v int")
        out = df.agg(F.coalesce(F.sum("v"), F.lit(0)).alias("s")).collect()[0].s
        expected = sum(v for _, v in data if v is not None)
        assert out == expected


def test_scd2_versioning_invariants(spark):
    """SCD2 output invariants on the fixture: every dimension key has
    exactly one current row; closed rows carry a valid_to equal to the new
    version's valid_from (contiguous history); version numbers are dense
    from 1."""
    from mini_hive_server_spark.operators.mutations import mutation_scd2_merge

    from .conftest import SF_ORACLE

    out = mutation_scd2_merge(spark, SF_ORACLE).collect()
    by_key: dict[int, list] = {}
    for r in out:
        by_key.setdefault(r.c_custkey, []).append(r)
    assert by_key, "empty SCD2 output"
    for key, rows in by_key.items():
        rows.sort(key=lambda r: r.version)
        assert [r.version for r in rows] == list(range(1, len(rows) + 1)), key
        assert sum(r.is_current for r in rows) == 1, key
        assert rows[-1].is_current and rows[-1].valid_to is None, key
        for closed, nxt in zip(rows, rows[1:]):
            assert not closed.is_current, key
            assert closed.valid_to == nxt.valid_from, key


def test_sequential_fold_hot_key_scale_guard(spark):
    """Scale guard for the greedy-budget ledger fold (VERDICT r4 nit #2):
    the per-key Python loop inside applyInPandas is sanctioned ONLY
    because parallelism is group-level — one pathological user must not
    slow the whole stage superlinearly or serialize other keys behind it.

    Plants ONE hot key with 10^4 requests next to 200 normal keys and
    asserts (a) the fold's greedy-skip semantics match a local replay on
    the hot key exactly, (b) every other key still produces output (no
    key starves behind the hot one), and (c) wall-time grows ~linearly in
    the hot-key size: the 10^4-row run must stay under 8x the 10^3-row
    run (a quadratic fold would be ~100x) and under a generous absolute
    cap."""
    import time

    from mini_hive_server_spark.plans.reference_model import (
        _FOLD_SCHEMA,
        _greedy_budget_fold,
    )

    def build(hot_n: int):
        rows = []
        # hot user: budget admits roughly half the requests, cost varies
        for i in range(hot_n):
            rows.append(("hot", "hot", i, i, (i * 37) % 500 + 1, 100_000))
        for k in range(200):
            for i in range(3):
                rows.append((f"u{k}", f"u{k}", i, i, 100 + i, 250))
        return spark.createDataFrame(
            rows, "key string, grp string, ord_ts long, ord_id long, cost_c long, budget_c long"
        )

    def run(hot_n: int):
        df = build(hot_n)
        t0 = time.perf_counter()
        out = df.groupBy("key").applyInPandas(_greedy_budget_fold, _FOLD_SCHEMA).collect()
        return time.perf_counter() - t0, out

    t_small, _ = run(1_000)
    t_big, out = run(10_000)

    # (a) hot-key semantics == local greedy replay
    hot_accepted = sum(1 for r in out if r.key == "hot" and r.accepted)
    rem, expect = 100_000, 0
    for i in range(10_000):
        c = (i * 37) % 500 + 1
        if c <= rem:
            rem -= c
            expect += 1
    assert hot_accepted == expect

    # (b) no key starves: all 201 keys present, normal keys fold correctly
    keys = {r.key for r in out}
    assert len(keys) == 201
    u0 = sorted((r for r in out if r.key == "u0"), key=lambda r: r.cost_c)
    assert [r.accepted for r in u0] == [True, True, False]  # 100+101 fit in 250

    # (c) linearity: 10x input must cost well under a quadratic blow-up.
    # Generous bounds absorb host noise: ratio < 8 (measured ~1-2x since
    # job overhead dominates), absolute < 30s.
    assert t_big < max(8 * t_small, 10.0), (t_small, t_big)
    assert t_big < 30.0, t_big


@given(
    rows=st.lists(
        st.integers(min_value=0, max_value=5),  # heavy ties guaranteed
        min_size=0,
        max_size=40,
    ),
    n_buckets=st.integers(min_value=1, max_value=7),
)
@_settings
def test_global_ntile_equals_window_ntile(spark, rows, n_buckets):
    """ranking.global_ntile must equal Spark's own window ntile for ANY
    data — including all-tied values, N < n buckets, and single rows —
    because the repaired statistics queries claim bit-identical cells.
    The order is totalized by the unique id tiebreak (the helper's
    documented requirement)."""
    from pyspark.sql import Window

    from mini_hive_server_spark.operators.ranking import (
        global_ntile,
        global_row_number,
    )

    if not rows:
        return
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(rows)], "id long, v long"
    ).repartition(5)
    order = [F.col("v").desc(), "id"]
    ref = {
        r.id: (r.b, r.rk)
        for r in df.select(
            "id",
            F.ntile(n_buckets).over(Window.orderBy(*order)).alias("b"),
            F.row_number().over(Window.orderBy(*order)).alias("rk"),
        ).collect()
    }
    got_b = {
        r.id: r.b
        for r in global_ntile(df, n_buckets, order, "b").collect()
    }
    ranked = global_row_number(df, order, rank_col="rk", total_col="tot")
    got_r = {r.id: r.rk for r in ranked.collect()}
    tots = {r.tot for r in ranked.collect()}
    assert got_b == {k: b for k, (b, _) in ref.items()}
    assert got_r == {k: rk for k, (_, rk) in ref.items()}
    assert tots == {len(rows)}


@given(
    vals=st.lists(
        st.one_of(st.none(), st.integers(min_value=0, max_value=100)),
        min_size=1,
        max_size=40,
    )
)
@_settings
def test_global_cumsum_equals_window_sum(spark, vals):
    """ranking.global_cumsum must equal the single-partition window
    running sum exactly for any integral input — zeros AND NULLs
    included (round-10 self-review: an all-NULL range partition used to
    NULL-poison every later partition's offset; window semantics skip
    NULLs and only an all-NULL prefix yields NULL) — the
    sequence-packing query's bin assignment depends on every prefix."""
    from pyspark.sql import Window

    from mini_hive_server_spark.operators.ranking import global_cumsum

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    ).repartition(5)
    ref = {
        r.id: r.c
        for r in df.select(
            "id",
            F.sum("v")
            .over(
                Window.orderBy("id").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            .alias("c"),
        ).collect()
    }
    got = {r.id: r.cum for r in global_cumsum(df, ["id"], "v").collect()}
    assert got == ref


@given(
    vals=st.lists(
        st.integers(min_value=-100, max_value=100), min_size=1, max_size=40
    ),
    exclusive=st.booleans(),
)
@_settings
def test_global_cummin_equals_window_min(spark, vals, exclusive):
    """ranking.global_cummin must equal the single-partition window
    running min exactly, in both inclusive and exclusive frames (the
    skyline's dominance test reads the strictly-prior minimum; NULL for
    an empty prefix must survive the distributed form too)."""
    from pyspark.sql import Window

    from mini_hive_server_spark.operators.ranking import global_cummin

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    ).repartition(5)
    hi = -1 if exclusive else Window.currentRow
    ref = {
        r.id: r.c
        for r in df.select(
            "id",
            F.min("v")
            .over(
                Window.orderBy("id").rowsBetween(Window.unboundedPreceding, hi)
            )
            .alias("c"),
        ).collect()
    }
    got = {
        r.id: r.cm
        for r in global_cummin(
            df, ["id"], "v", "cm", exclusive=exclusive
        ).collect()
    }
    assert got == ref

def test_global_cumsum_null_partition_regression(spark):
    """Deterministic pin of the round-10 self-review NULL finding
    (hypothesis may not reliably shrink to it): NULLs concentrated at
    the LOW end of the order force range partition 0 to aggregate a
    NULL partial sum — the offsets fold must treat it as 0 for later
    partitions (not propagate NULL into every downstream cumsum), while
    the all-NULL-prefix rows themselves stay NULL, and a NULL local
    prefix in a LATER partition must fall through to the earlier
    partitions' sum (window parity in all three regimes)."""
    from pyspark.sql import Window

    from mini_hive_server_spark.operators.ranking import global_cumsum

    vals = [None] * 10 + [1, 2, None, 3] + [None]  # trailing NULL: late
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    ).repartition(5)
    ref = {
        r.id: r.c
        for r in df.select(
            "id",
            F.sum("v")
            .over(
                Window.orderBy("id").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            .alias("c"),
        ).collect()
    }
    got = {
        r.id: r.cum
        for r in global_cumsum(df, ["id"], "v", num_partitions=4).collect()
    }
    assert got == ref
    assert got[0] is None and got[9] is None  # all-NULL prefix stays NULL
    assert got[14] == 6  # trailing NULL falls through to the prior sum


def test_global_cummin_null_partition_regression(spark):
    """The cummin twin of the NULL-partition pin above — round-10
    self-review finding #8's disposition was REJECTED-as-already-safe:
    the offsets fold merges with `F.least`, which skips NULLs in Spark,
    so an all-NULL partition's NULL partial min cannot poison later
    partitions the way the cumsum `acc + x` fold could. That claim
    lived only in a comment (ranking.py); this test pins it with the
    same adversarial layout (NULLs forced into range partition 0)."""
    from pyspark.sql import Window

    from mini_hive_server_spark.operators.ranking import global_cummin

    vals = [None] * 10 + [5, 2, None, 3] + [None]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    ).repartition(5)
    ref = {
        r.id: r.c
        for r in df.select(
            "id",
            F.min("v")
            .over(
                Window.orderBy("id").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            .alias("c"),
        ).collect()
    }
    got = {
        r.id: r.cm
        for r in global_cummin(
            df, ["id"], "v", "cm", num_partitions=4
        ).collect()
    }
    assert got == ref
    assert got[0] is None and got[9] is None  # all-NULL prefix stays NULL
    assert got[14] == 2  # trailing NULL falls through to the prior min


def test_global_ntile_rejects_nonpositive_n(spark):
    """Window ntile(0) raises at analysis time; the distributed form
    must not silently produce NULL buckets instead (round-10
    self-review: `% 0` is NULL under non-ANSI sessions)."""
    import pytest as _pytest

    from mini_hive_server_spark.operators.ranking import global_ntile

    df = spark.createDataFrame([(1, 1)], "id long, v long")
    # True passes isinstance(n, int) and would silently mean ntile(1)
    # without the explicit bool rejection (ADVICE r10 #4)
    for bad in (0, -1, 2.5, True, False):
        with _pytest.raises(ValueError):
            global_ntile(df, bad, ["id"], "b")


def test_ranking_accepts_bare_string_order_cols(spark):
    """A bare-string order_cols used to iterate character by character
    (silently wrong keys on single-letter schemas); it must now mean
    [that column] (round-10 self-review)."""
    from mini_hive_server_spark.operators.ranking import global_row_number

    df = spark.createDataFrame(
        [(3, "c"), (1, "a"), (2, "b")], "id long, name string"
    )
    got = {
        r.name: r.rk for r in global_row_number(df, "id", "rk").collect()
    }
    assert got == {"a": 1, "b": 2, "c": 3}
