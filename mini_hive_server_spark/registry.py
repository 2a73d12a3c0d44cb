"""Central query registry: every engine capability is a named query.

Each operator/query shape from SURVEY.md §2 (plus the LLM-pipeline
extensions) registers itself here with:

* a PySpark callable ``(spark, sf_dir) -> DataFrame``;
* optionally a DuckDB-runnable SQL oracle string computing the same result on
  the same Parquet tables (the driver's correctness gate). Queries whose
  semantics are not SQL-expressible (probabilistic LSH, streaming) register
  without an oracle and get a rows-only check.

Determinism rules every registered query obeys (so order-insensitive
value-hash comparison against DuckDB is stable):

1. Float aggregates are ``round(x, N)``-ed identically on both sides —
   distributed summation order differs from DuckDB's single-threaded order in
   the last ulp.
2. Timestamps are never emitted raw: the events fixture has nanosecond
   precision which Spark truncates to microseconds but DuckDB keeps, so
   outputs use second-or-coarser truncation rendered via date_format/strftime.
3. Every LIMIT/top-k has a total order (unique-key tiebreaker appended).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}

# Modules that register queries on import (order = SURVEY.md §7 build plan).
_QUERY_MODULES = (
    "mini_hive_server_spark.plans.tpch",
    "mini_hive_server_spark.operators.scans",
    "mini_hive_server_spark.functions.scalar_queries",
    "mini_hive_server_spark.operators.aggregates",
    "mini_hive_server_spark.operators.joins",
    "mini_hive_server_spark.operators.topk",
    "mini_hive_server_spark.operators.mutations",
    "mini_hive_server_spark.plans.lifecycle",
    "mini_hive_server_spark.operators.windows",
    "mini_hive_server_spark.operators.setops",
    "mini_hive_server_spark.operators.dedup",
    "mini_hive_server_spark.operators.similarity",
    "mini_hive_server_spark.operators.text_analysis",
    "mini_hive_server_spark.operators.multimodal",
    "mini_hive_server_spark.operators.sketches",
    "mini_hive_server_spark.sources.connectors",
    "mini_hive_server_spark.streaming.events_stream",
)


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tuple(tags), doc=fn.__doc__ or ""
        )
        return fn

    return deco


def _ensure_loaded() -> None:
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)


def all_specs() -> dict[str, QuerySpec]:
    _ensure_loaded()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracles() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
