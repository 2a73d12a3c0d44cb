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

# Modules that register queries on import. Never-driver-verified families
# lead; the round-1-proven scan/scalar/agg/join/TPC-H families trail (their
# 48/50 green rows are in CORRECTNESS_r01.json).
_QUERY_MODULES = (
    "mini_hive_server_spark.operators.mutations",
    "mini_hive_server_spark.operators.topk",
    "mini_hive_server_spark.plans.lifecycle",
    "mini_hive_server_spark.operators.windows",
    "mini_hive_server_spark.operators.setops",
    "mini_hive_server_spark.operators.dedup",
    "mini_hive_server_spark.operators.similarity",
    "mini_hive_server_spark.operators.text_analysis",
    "mini_hive_server_spark.operators.pipeline",
    "mini_hive_server_spark.operators.contamination",
    "mini_hive_server_spark.operators.multimodal",
    "mini_hive_server_spark.operators.sketches",
    "mini_hive_server_spark.sources.connectors",
    "mini_hive_server_spark.streaming.events_stream",
    "mini_hive_server_spark.operators.joins",
    "mini_hive_server_spark.plans.tpch",
    "mini_hive_server_spark.operators.scans",
    "mini_hive_server_spark.functions.scalar_queries",
    "mini_hive_server_spark.operators.aggregates",
)

# The driver's correctness gate compares the FIRST 50 registered queries
# (verified round 1: CORRECTNESS_r01.json's key set == the first 50 names in
# registration order). Round 1 proved the scan/filter/scalar/agg/join/TPC-H
# families 48/50 green; round 2 rotates the never-checked families into the
# window — LLM-pipeline ops (dedup/similarity/text/multimodal), mutations,
# top-k, composites, event-time, sources, streaming, the two new fidelity
# queries — plus the two round-1 hash-mismatch regressions (q12_late_lines,
# json_ingest_extract) whose oracles were fixed this round.
_DRIVER_WINDOW = (
    # mutations (S4-S7 + SCD2)
    "mutation_insert_append",
    "mutation_update_set",
    "mutation_update_inc",
    "mutation_delete_anti",
    "mutation_scd2_merge",
    # sort / top-k (O1-O3 + missing-field fidelity quirk)
    "order_desc_recent",
    "top_workers",
    "topk_per_group",
    "sort_missing_field",
    # composite lifecycle plans (§3) + dual-shape fidelity quirk
    "buyer_home_dashboard",
    "worker_home_stats",
    "approve_submission_batch",
    "payment_dual_shape",
    # range join (custom operator)
    "range_join_value_tiers",
    # event-time / window functions (most distinctive five)
    "events_tumbling_hourly",
    "events_sessionize",
    "events_asof_last_click",
    "events_lag_delta",
    "events_ntile_quartiles",
    # dedup tier (exact → Jaccard truth → MinHash-LSH → SimHash → clusters)
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_lsh_clusters",
    "text_hash_split",
    # similarity / ANN tier
    "similarity_cosine_topk",
    "similarity_lsh_ann",
    "dedup_embedding_cosine",
    "similarity_ivf_ann",
    "embedding_norm_stats",
    "embedding_label_centroids",
    # text analysis
    "text_token_count",
    "text_quality_score",
    "text_lang_id",
    "text_fingerprint_md5",
    "doc_stats_by_lang",
    "text_tokenize_udtf",
    # multimodal plumbing
    "multimodal_feature_extract",
    "multimodal_metadata_stats",
    "multimodal_frame_sample",
    "multimodal_resize",
    # sources
    "source_partitioned_prune",
    "source_bucketed_join",
    "source_from_json",
    "source_orc_roundtrip",
    # structured streaming
    "streaming_user_running_stats",
    "streaming_dedup_watermark",
    "streaming_static_enrich",
    # round-1 hash-mismatch regressions (oracles fixed this round)
    "q12_late_lines",
    "json_ingest_extract",
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
    """All registered specs, driver-window names first (see _DRIVER_WINDOW),
    then the rest in module-registration order."""
    _ensure_loaded()
    missing = [n for n in _DRIVER_WINDOW if n not in _REGISTRY]
    if missing:
        raise KeyError(f"_DRIVER_WINDOW names not registered: {missing}")
    window = set(_DRIVER_WINDOW)
    ordered = [*_DRIVER_WINDOW, *(n for n in _REGISTRY if n not in window)]
    return {n: _REGISTRY[n] for n in ordered}


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracles() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
