"""Self-tests of the oracle harness's canonical encoding — the gate all
344 queries are judged by. Round-10 self-review found the encoding was
not injective (typed NULL vs the literal string 'NULL') and structurally
false-mismatched raw timestamps (Spark toArrow yields tz-aware UTC,
DuckDB naive); these pin the repaired properties without a SparkSession.
"""

from __future__ import annotations

import datetime as dt

from .oracle_harness import _canon_value, canonicalize


def test_null_and_literal_null_string_distinct():
    # the false-green direction: the driver's typed hash has null != 'NULL'
    assert _canon_value(None) != _canon_value("NULL")
    assert _canon_value(None) == "NULL"


def test_string_tagging_injective_against_numbers():
    # '1' the string must not collide with 1 the int
    assert _canon_value("1") != _canon_value(1)
    assert _canon_value("true") != _canon_value(True)


def test_tz_aware_and_naive_utc_timestamps_equal():
    # Spark side: tz-aware UTC; DuckDB side: naive (session pinned UTC)
    aware = dt.datetime(2024, 3, 1, 12, 30, 45, 123456, tzinfo=dt.timezone.utc)
    naive = dt.datetime(2024, 3, 1, 12, 30, 45, 123456)
    assert _canon_value(aware) == _canon_value(naive)
    # and a non-UTC-rendered aware value normalizes to the same instant
    est = dt.timezone(dt.timedelta(hours=-5))
    assert _canon_value(aware.astimezone(est)) == _canon_value(naive)


def test_distinct_instants_stay_distinct():
    a = dt.datetime(2024, 3, 1, 12, 0, 0, tzinfo=dt.timezone.utc)
    b = dt.datetime(2024, 3, 1, 12, 0, 1, tzinfo=dt.timezone.utc)
    assert _canon_value(a) != _canon_value(b)


def test_zero_column_results_keep_row_count():
    # two zero-column results with different cardinalities must differ
    _, rows3 = canonicalize({}, n_rows=3)
    _, rows5 = canonicalize({}, n_rows=5)
    assert len(rows3) == 3 and len(rows5) == 5
    assert rows3 != rows5


def test_float_canonicalization_roundtrips():
    # repr round-trips: 0.1 + 0.2 differs from 0.3 in the last ulp and
    # the canonical form must preserve that difference
    assert _canon_value(0.1 + 0.2) != _canon_value(0.3)
    assert _canon_value(float("nan")) == "NaN"
