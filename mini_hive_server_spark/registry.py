"""Central query registry: every engine capability is a named query.

Each operator/query shape from SURVEY.md §2 (plus the LLM-pipeline
extensions) registers itself here with:

* a PySpark callable ``(spark, sf_dir) -> DataFrame``;
* a DuckDB-runnable SQL oracle string computing the same result on the
  same Parquet tables (the driver's correctness gate). The schema allows
  oracle-less registration, but since round 8 NO registered query uses it
  (`tests/test_oracle_parity.py::test_no_rows_only_queries`): the driver
  does not support rows-only checks — an oracle-less query burns its
  window slot on a guaranteed `err: no_oracle` (the round-7 lesson).
  Non-SQL-expressible semantics get an oracle anyway via an equivalence
  argument (batch twins for streaming, provably-exact operating points
  for ANN, the contraction bound for the ε-stopped PageRank).

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

import functools
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
    "mini_hive_server_spark.operators.curation",
    "mini_hive_server_spark.operators.spans",
    "mini_hive_server_spark.operators.multimodal",
    "mini_hive_server_spark.operators.sketches",
    "mini_hive_server_spark.operators.ingest",
    "mini_hive_server_spark.operators.behavior",
    "mini_hive_server_spark.operators.timegrid",
    "mini_hive_server_spark.operators.governance",
    "mini_hive_server_spark.operators.graph",
    "mini_hive_server_spark.plans.reference_model",
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
# registration order). Full rotation history lives in COVERAGE.md
# ("Driver-window rotation history"); this comment documents only the
# CURRENT window's rationale.
#
# Round-11 window — the third staleness-rotation round, draining the
# documented round-11 queue in full (VERDICT r10 #1). Composition:
# 2 round-11 additions (`dedup_minhash_k256`, the large-K classic tier
# that converted the OPH/classic crossover hypothesis into measured A/B
# points — VERDICT r10 #8's suggested operating point — and
# `dedup_lsh_df_capped`, the document-frequency boilerplate cut the
# dedup module docstring had only prescribed in prose) + the ENTIRE
# 29-query queue (the r3-checked set from COVERAGE.md "Round-11
# queue") + `similarity_pq_adc` (r10-checked but REWORKED this round:
# encode+ADC fused into one Arrow kernel and the posexplode double-eval
# fixed — highest refactor exposure in the repo, so it re-enters the
# window) + 18 re-confirms from the r4-checked set, prioritized by
# refactor exposure: the three similarity.py neighbors of the PQ rework
# (`dedup_semantic_clusters`, `embedding_mrl_truncation`,
# `similarity_filtered_topk`), the four r4 streaming queries (the
# observe/persistence machinery churns every round), the events long
# tail, the three r4 `ref_*` reads, the two ingest/CDC folds, and
# `join_salted_skew` (the skew discipline's flagship). After r11 the
# oldest driver row anywhere is r4; the 21 remaining r4-checked queries
# form the round-12 queue in COVERAGE.md.
_DRIVER_WINDOW = (
    # --- round-11 additions (≤10 budget; 2 used) ---
    "dedup_minhash_k256",
    "dedup_lsh_df_capped",
    # --- the round-11 staleness queue: 29 r3-checked, in queue order ---
    "q12_late_lines",
    "events_tumbling_hourly",
    "similarity_cosine_topk",
    "dedup_embedding_cosine",
    "multimodal_feature_extract",
    "events_sliding_window",
    "events_running_total",
    "events_type_pivot",
    "events_type_unpivot",
    "events_value_percentiles",
    "events_date_parts",
    "set_union_distinct",
    "set_intersect",
    "set_except",
    "seq_packing_bins",
    "text_tfidf_top_terms",
    "ngram_bigram_top",
    "stratified_sample_by_lang",
    "embedding_int8_quantize",
    "decontaminate_ngram",
    "text_pii_scrub",
    "text_chunk_dedup",
    "sketch_approx_distinct",
    "sketch_approx_quantiles",
    "sketch_hll_mergeable",
    "agg_salted_two_stage",
    "catalog_managed_sql",
    "source_json_roundtrip",
    "source_csv_roundtrip",
    # --- reworked-this-round re-confirm ---
    "similarity_pq_adc",
    # --- 18 r4 re-confirms (refactor-exposure order; see comment) ---
    "dedup_semantic_clusters",
    "embedding_mrl_truncation",
    "similarity_filtered_topk",
    "streaming_cdc_merge",
    "streaming_cep_error_burst",
    "streaming_sessionize",
    "streaming_stream_stream_left_join",
    "events_asof_next_error",
    "events_cep_error_burst",
    "events_funnel_conversion",
    "events_retention_cohorts",
    "events_sessionize",
    "ref_admin_platform_stats",
    "ref_buyer_payment_history",
    "ref_top_workers",
    "ingest_cdc_merge",
    "ingest_incremental_dedup",
    "join_salted_skew",
)


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        if oracle is None:
            # enforce the since-round-8 invariant at the production
            # surface, not just in the test suite: an oracle-less query
            # reaching the driver burns its window slot on a guaranteed
            # `err: no_oracle` (module docstring) — fail at registration,
            # where the developer is, instead of in the remote gate
            raise ValueError(
                f"query '{name}' registered without an oracle — every "
                "registered query must be oracle-paired (give non-SQL-"
                "expressible semantics an equivalence oracle; see the "
                "module docstring)"
            )

        @functools.wraps(fn)
        def gated(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Release the previous query's tracked persist() blocks: the
            # driver runs 50 queries in one session and never clears cache
            # (see persistence.py). Queries composing other queries call
            # the raw fn (module-level name), so internal persists survive
            # until the NEXT top-level invocation.
            from .persistence import release_tracked

            release_tracked()
            return fn(spark, sf_dir)

        _REGISTRY[name] = QuerySpec(
            name=name, fn=gated, oracle=oracle, tags=tuple(tags), doc=fn.__doc__ or ""
        )
        return fn

    return deco


# A module that failed to import is retried by every later _ensure_loaded
# call (Python drops it from sys.modules), and the retry trips the
# duplicate-name guard on the module's own EARLIER, innocent
# registrations — masking the real error. Remember the first failure and
# re-raise IT (round-10 self-review).
_LOAD_FAILED: dict[str, BaseException] = {}


def _ensure_loaded() -> None:
    for mod in _QUERY_MODULES:
        if mod in _LOAD_FAILED:
            raise _LOAD_FAILED[mod]
        try:
            importlib.import_module(mod)
        except BaseException as exc:
            _LOAD_FAILED[mod] = exc
            raise


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
