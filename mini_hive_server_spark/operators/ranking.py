"""Distributed exact global rank / ntile — no single-partition sorts.

An unpartitioned ``Window.orderBy(...)`` forces EVERY row through one
partition's sort (``Exchange SinglePartition`` → ``Sort`` → ``Window`` in
the plan) — the one shape in an otherwise distributed plan that cannot
survive a 100× scale-up of the windowed relation. These helpers produce
the SAME numbers (exact ``row_number`` / ``ntile`` semantics, bit-for-bit
against a single-sort engine like the DuckDB oracle) from a fully
distributed plan:

1. ``repartitionByRange`` on the order keys — a parallel range exchange
   (sampled bounds), so partition *p* holds a contiguous slice of the
   total order and every row in partition *p* sorts before every row in
   partition *p+1*;
2. a ``row_number`` window PARTITIONED by the captured range-partition id
   — P independent in-memory/spillable sorts, never a global one;
3. per-partition row counts (P rows, partition-count-bounded — NOT
   SF-proportional) folded into prefix-sum offsets with higher-order
   array functions, so no driver collect and no window over the counts;
4. a broadcast equi-join shipping ``(pid → offset, total)`` back to the
   ranked rows: ``global row_number = offset + local row_number``.

Requirements: ``order_cols`` must define a TOTAL order (append a unique
key as tiebreaker — every caller here does). Rows with equal full sort
keys could otherwise land in different range partitions and take
arbitrary ranks. AQE partition coalescing is safe: it merges ADJACENT
shuffle partitions, so captured partition ids remain range-ordered.

``ntile`` is then pure arithmetic on the exact rank: with N rows and n
buckets, the first ``N mod n`` buckets take ``N div n + 1`` rows and the
rest take ``N div n`` — the same larger-buckets-first rule Spark and
DuckDB implement, so a value-based approximate-cut-point scheme (which
can move tied boundary rows across buckets) is unnecessary: this form is
exact AND distributed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["global_row_number", "global_ntile", "global_cumsum"]

_PID = "__rng_pid"
_LRK = "__rng_lrk"
_OFF = "__rng_off"
_TOT = "__rng_tot"


def _cols(order_cols) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order_cols]


def global_row_number(
    df: DataFrame,
    order_cols,
    rank_col: str = "rk",
    total_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global ``row_number`` over ``order_cols`` (a total
    order) with no single-partition exchange; optionally attaches the
    total row count as ``total_col`` (same broadcast join, no extra
    cross join). See module docstring for the plan shape."""
    from ..persistence import tracked_persist

    cols = _cols(order_cols)
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    # tracked_persist is REQUIRED for correctness, not a cache hint: the
    # ranked rows and the per-partition counts below are two consumers of
    # the same range exchange, and repartitionByRange samples its bounds
    # with a per-RDD seed — two independent re-executions (the counts
    # subtree would otherwise be column-pruned into a separate scan) could
    # pick DIFFERENT boundaries, mismatching offsets against pids. The
    # persisted relation is the caller's per-entity aggregate (users /
    # customers), already orders of magnitude smaller than the raw facts;
    # MEMORY_AND_DISK spills if it doesn't fit. It also folds the two
    # passes into one scan.
    ranged = tracked_persist(
        df.repartitionByRange(num_partitions, *cols).withColumn(
            _PID, F.spark_partition_id()
        )
    )
    local = ranged.withColumn(
        _LRK, F.row_number().over(Window.partitionBy(_PID).orderBy(*cols))
    )
    counts = ranged.groupBy(_PID).agg(F.count(F.lit(1)).alias("_cnt"))
    # P = num_partitions rows: bounded by parallelism, not data. Prefix
    # sums via higher-order functions — one ObjectHashAggregate over P
    # rows, zero driver collects, zero windows.
    packed = counts.agg(F.collect_list(F.struct(_PID, "_cnt")).alias("pc"))
    offsets = packed.select(
        F.explode(
            F.transform(
                "pc",
                lambda x: F.struct(
                    x[_PID].alias(_PID),
                    F.aggregate(
                        F.filter(F.col("pc"), lambda y: y[_PID] < x[_PID]),
                        F.lit(0).cast("bigint"),
                        lambda acc, y: acc + y["_cnt"],
                    ).alias(_OFF),
                ),
            )
        ).alias("o"),
        F.aggregate(
            F.col("pc"),
            F.lit(0).cast("bigint"),
            lambda acc, y: acc + y["_cnt"],
        ).alias(_TOT),
    ).select(f"o.{_PID}", f"o.{_OFF}", _TOT)
    out = (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(rank_col, (F.col(_OFF) + F.col(_LRK)).cast("bigint"))
    )
    drop = [_PID, _LRK, _OFF] + ([] if total_col else [_TOT])
    if total_col:
        out = out.withColumnRenamed(_TOT, total_col)
    return out.drop(*drop)


def global_ntile(
    df: DataFrame,
    n: int,
    order_cols,
    bucket_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ``ntile(n) OVER (ORDER BY order_cols)`` (larger buckets
    first, identical to Spark's and DuckDB's window ntile) computed from
    the distributed global rank — same cells as the single-sort window,
    no ``Exchange SinglePartition``."""
    ranked = global_row_number(
        df,
        order_cols,
        rank_col="__nt_rk",
        total_col="__nt_n",
        num_partitions=num_partitions,
    )
    # Pure integer arithmetic (SQL `div`): with q = N div n, r = N mod n,
    # ranks 1..r*(q+1) fall in the first r (larger) buckets; the rest in
    # buckets of q rows. greatest(q, 1) guards N < n (then r = N and the
    # ELSE branch is unreachable but still type-checked).
    bucket = F.expr(
        f"CAST(CASE WHEN __nt_rk <= (__nt_n % {n}) * ((__nt_n div {n}) + 1) "
        f"THEN ((__nt_rk - 1) div ((__nt_n div {n}) + 1)) + 1 "
        f"ELSE (__nt_n % {n}) + ((__nt_rk - (__nt_n % {n}) * ((__nt_n div {n}) + 1) - 1) "
        f"div greatest(__nt_n div {n}, 1)) + 1 END AS INT)"
    )
    return ranked.withColumn(bucket_col, bucket).drop("__nt_rk", "__nt_n")


def global_cumsum(
    df: DataFrame,
    order_cols,
    value_col: str,
    cumsum_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact INCLUSIVE running sum of ``value_col`` over the total order
    ``order_cols`` — the distributed prefix-sum: the same
    range-partition / local-window / broadcast-offsets skeleton as
    ``global_row_number``, with the offsets carrying per-partition VALUE
    sums instead of row counts. Exact for integral values (the intended
    domain: token counts, byte sizes); float inputs would re-associate
    the summation order.

    Same requirements and the same persist-for-determinism rationale as
    ``global_row_number`` (see its docstring)."""
    from ..persistence import tracked_persist

    cols = _cols(order_cols)
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    ranged = tracked_persist(
        df.repartitionByRange(num_partitions, *cols).withColumn(
            _PID, F.spark_partition_id()
        )
    )
    local = ranged.withColumn(
        "__cs_local",
        F.sum(value_col).over(
            Window.partitionBy(_PID)
            .orderBy(*cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    sums = ranged.groupBy(_PID).agg(
        F.sum(value_col).cast("bigint").alias("_vsum")
    )
    packed = sums.agg(F.collect_list(F.struct(_PID, "_vsum")).alias("pc"))
    offsets = packed.select(
        F.explode(
            F.transform(
                "pc",
                lambda x: F.struct(
                    x[_PID].alias(_PID),
                    F.aggregate(
                        F.filter(F.col("pc"), lambda y: y[_PID] < x[_PID]),
                        F.lit(0).cast("bigint"),
                        lambda acc, y: acc + y["_vsum"],
                    ).alias(_OFF),
                ),
            )
        ).alias("o")
    ).select(f"o.{_PID}", f"o.{_OFF}")
    return (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(
            cumsum_col,
            (F.col(_OFF) + F.col("__cs_local")).cast("bigint"),
        )
        .drop(_PID, "__cs_local", _OFF)
    )
