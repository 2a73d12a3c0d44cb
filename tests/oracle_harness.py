"""Local replica of the driver's oracle-differential gate (SURVEY.md §5.1).

For each registered query with an oracle: run the PySpark query and the
DuckDB SQL on the same Parquet fixtures, then compare row count, sorted
column names, and an order-insensitive canonicalization of all values.
Exact equality is required — the engine's determinism rules (rounding floats,
truncating timestamps, total-ordering every limit) exist precisely so exact
comparison is achievable.
"""

from __future__ import annotations

import datetime as _dt
import math
from typing import Any

import duckdb

from mini_hive_server_spark.catalog import TABLE_NAMES, table_path


def run_duckdb_oracle(sql: str, sf_dir: str) -> "pyarrow.Table":
    con = duckdb.connect()
    try:
        for name in TABLE_NAMES:
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
            )
        return con.execute(sql).fetch_arrow_table()
    finally:
        con.close()


def _canon_value(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr gives the shortest round-tripping decimal → detects any
        # binary difference between the two engines' float results.
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        # prefix-tag: without it the canonical encoding is not injective
        # for the string family — a typed NULL and the literal 4-char
        # string 'NULL' both rendered "NULL", a false-green the driver's
        # typed hash (null != 'NULL') would report red (round-10
        # self-review of the harness).
        return "S:" + v
    if isinstance(v, _dt.datetime):
        # Spark's toArrow() hands back tz-AWARE UTC datetimes, DuckDB's
        # to_pylist() naive ones — str() would render '...+00:00' vs
        # '...', a guaranteed false mismatch on any raw timestamp column
        # (the exact class of artifact the round-8 toArrow switch exists
        # to kill). Both sessions are pinned UTC, so normalize to naive
        # UTC before rendering.
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return "T:" + v.isoformat()
    return str(v)


def canonicalize(
    columns: dict[str, list], n_rows: int | None = None
) -> tuple[list[str], list[tuple[str, ...]]]:
    names = sorted(columns)
    rows = list(zip(*[[_canon_value(v) for v in columns[n]] for n in names]))
    if not columns or not rows:
        # zero-column (or zero-row) inputs: the row COUNT must survive —
        # callers pass the table's num_rows so two zero-column results
        # with different cardinalities cannot compare equal
        if n_rows is None:
            n_rows = len(next(iter(columns.values()), []))
        rows = [() for _ in range(n_rows)]
    return names, sorted(rows)


def spark_df_to_columns(df) -> dict[str, list]:
    """Arrow, not pandas (round 8): `toPandas()` renders a NULL double as
    NaN, so a Spark-side typed NULL canonicalized as 'NaN' while the
    DuckDB side said 'NULL' — a false mismatch the real driver (typed
    value hash, null==null) would not report. Surfaced by the sf0.001
    stress sweep on `events_gapfill_hourly`'s leading-gap rows (LOCF
    before any observation is legitimately NULL). `toArrow()` preserves
    nulls and yields the same python types `to_pylist` gives the oracle
    side."""
    return arrow_to_columns(df.toArrow())


def arrow_to_columns(tbl) -> dict[str, list]:
    return {name: tbl.column(name).to_pylist() for name in tbl.column_names}


def _spark_type_family(dt) -> str:
    """Collapse a Spark DataType into the family the driver's typed value-hash
    distinguishes. int64 vs decimal128 hash differently even for equal values
    (round-1 commit 3c26f38 and the round-3 red rows were exactly this)."""
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, (T.TimestampType, getattr(T, "TimestampNTZType", T.TimestampType))):
        return "timestamp"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.StringType, T.VarcharType, T.CharType)):
        return "string"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.ArrayType):
        return "array<" + _spark_type_family(dt.elementType) + ">"
    return "other"


def _arrow_type_family(at) -> str:
    import pyarrow as pa

    if pa.types.is_integer(at):
        return "int"
    if pa.types.is_floating(at):
        return "float"
    if pa.types.is_decimal(at):
        return "decimal"
    if pa.types.is_boolean(at):
        return "bool"
    if pa.types.is_timestamp(at):
        return "timestamp"
    if pa.types.is_date(at):
        return "date"
    if pa.types.is_string(at) or pa.types.is_large_string(at):
        return "string"
    if pa.types.is_binary(at) or pa.types.is_large_binary(at):
        return "binary"
    if pa.types.is_list(at) or pa.types.is_large_list(at):
        return "array<" + _arrow_type_family(at.value_type) + ">"
    return "other"


def type_mismatches(name: str, spark_df, oracle_tbl) -> list[str]:
    """Driver-faithful type check: same column name must resolve to the same
    hash family on both sides. Catches DuckDB's integer-sum → DECIMAL128
    widening (and hugeint) that the stringified value compare is blind to."""
    problems: list[str] = []
    s_fam = {f.name: _spark_type_family(f.dataType) for f in spark_df.schema.fields}
    o_fam = {
        fld.name: _arrow_type_family(fld.type) for fld in oracle_tbl.schema
    }
    for col in sorted(set(s_fam) & set(o_fam)):
        if s_fam[col] != o_fam[col]:
            problems.append(
                f"[{name}] column '{col}' type family differs: "
                f"spark={s_fam[col]} oracle={o_fam[col]} "
                f"(driver's typed hash WILL fail — cast the oracle, e.g. "
                f"CAST(sum(...) AS BIGINT) for DuckDB's DECIMAL128 sum widening)"
            )
    return problems


def compare(name: str, spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    s_tbl = spark_df.toArrow()
    s_cols = arrow_to_columns(s_tbl)
    o_tbl = run_duckdb_oracle(oracle_sql, sf_dir)
    o_cols = arrow_to_columns(o_tbl)
    problems.extend(type_mismatches(name, spark_df, o_tbl))

    s_names, s_rows = canonicalize(s_cols, s_tbl.num_rows)
    o_names, o_rows = canonicalize(o_cols, o_tbl.num_rows)

    if s_names != o_names:
        problems.append(f"[{name}] columns differ: spark={s_names} oracle={o_names}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(
            f"[{name}] row count differs: spark={len(s_rows)} oracle={len(o_rows)}"
        )
        # misaligned zip would report alignment artifacts, not the real
        # delta — show the symmetric difference instead (round-10
        # self-review)
        from collections import Counter

        extra_s = Counter(s_rows) - Counter(o_rows)
        extra_o = Counter(o_rows) - Counter(s_rows)
        if extra_s:
            problems.append(
                f"[{name}] rows only in spark (first 3): "
                f"{list(extra_s)[:3]}"
            )
        if extra_o:
            problems.append(
                f"[{name}] rows only in oracle (first 3): "
                f"{list(extra_o)[:3]}"
            )
        return problems
    diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b]
    if diffs:
        head = diffs[:5]
        problems.append(
            f"[{name}] {len(diffs)} row(s) differ (cols={s_names}); first: "
            + "; ".join(f"spark={a} oracle={b}" for a, b in head)
        )
    return problems
