"""Local replica of the driver's oracle-differential gate (SURVEY.md §5.1).

For each registered query with an oracle: run the PySpark query and the
DuckDB SQL on the same Parquet fixtures, then compare row count, sorted
column names, and an order-insensitive canonicalization of all values.
Exact equality is required — the engine's determinism rules (rounding floats,
truncating timestamps, total-ordering every limit) exist precisely so exact
comparison is achievable.
"""

from __future__ import annotations

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
    return str(v)


def canonicalize(columns: dict[str, list]) -> tuple[list[str], list[tuple[str, ...]]]:
    names = sorted(columns)
    rows = list(zip(*[[_canon_value(v) for v in columns[n]] for n in names]))
    if not columns or not rows:
        n_rows = len(next(iter(columns.values()), []))
        rows = [() for _ in range(n_rows)]
    return names, sorted(rows)


def spark_df_to_columns(df) -> dict[str, list]:
    pdf = df.toPandas()
    return {c: list(pdf[c]) for c in pdf.columns}


def arrow_to_columns(tbl) -> dict[str, list]:
    return {name: tbl.column(name).to_pylist() for name in tbl.column_names}


def compare(name: str, spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    s_cols = spark_df_to_columns(spark_df)
    o_tbl = run_duckdb_oracle(oracle_sql, sf_dir)
    o_cols = arrow_to_columns(o_tbl)

    s_names, s_rows = canonicalize(s_cols)
    o_names, o_rows = canonicalize(o_cols)

    if s_names != o_names:
        problems.append(f"[{name}] columns differ: spark={s_names} oracle={o_names}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(
            f"[{name}] row count differs: spark={len(s_rows)} oracle={len(o_rows)}"
        )
    diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b]
    if diffs:
        head = diffs[:5]
        problems.append(
            f"[{name}] {len(diffs)} row(s) differ (cols={s_names}); first: "
            + "; ".join(f"spark={a} oracle={b}" for a, b in head)
        )
    return problems
