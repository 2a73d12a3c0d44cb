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
