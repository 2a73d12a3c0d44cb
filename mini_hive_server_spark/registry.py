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
# Round-7 window (rotated after CORRECTNESS_r06 came back 50/50 green —
# the third consecutive fully green round): leads with the 31 round-6
# additions that have never had a driver row (the COVERAGE.md round-7
# queue: the statistics suite, the ranking-family anchors, PCA/RRF/SCD2,
# dynamic partition pruning; all locally oracle-green), so after this
# round every registered query has a green driver row EXCEPT the late
# round-7 additions listed in COVERAGE.md's round-8 queue (the window's
# 50 slots were full when they landed; each is locally oracle-green,
# hostile-swept, and first in line for the round-8 window).
# The re-confirm slots gate the heaviest dedup/ANN tiers (including the
# three whose round-6 timings regressed — re-measured under bench.py's
# new repeat-median), the three reference WRITE lifecycles, one
# ranking-family query (the persistence contract around
# ranking._ranged changed this round), and the AQE-skew join. Round-7
# additions are appended at the window tail as they land.
_DRIVER_WINDOW = (
    # --- never driver-checked round-6 additions (COVERAGE.md r7 queue) ---
    "events_abtest_mannwhitney",
    "events_abtest_ks",
    "events_proportion_ztest",
    "events_bh_fdr_control",
    "events_eb_shrunk_means",
    "events_chisq_independence",
    "customers_kaplan_meier",
    "events_bootstrap_ci",
    "orders_sen_trend",
    "events_skewness_kurtosis",
    "documents_quality_deciles",
    "corpus_pack_sequences",
    "orders_abc_analysis",
    "lineitem_weighted_median",
    "orders_value_quartiles_cutpoint",
    "orders_winsorized_stats",
    "retrieval_rrf_hybrid",
    "orders_point_in_time_scd2",
    "parts_skyline_frontier",
    "embedding_pca_power",
    "privacy_k_anonymity",
    "source_dynamic_partition_prune",
    "corpus_split_no_leakage",
    "text_pmi_collocations",
    "classifier_pr_auc",
    "orders_value_psi",
    "events_key_skew_report",
    "events_multitouch_attribution",
    "events_type_corr_matrix",
    "events_moving_median_7d",
    "graph_pagerank_converged",  # rows-only; golden-pinned in tests
    # --- re-confirm: heaviest dedup/ANN tiers (incl. the three round-6
    #     timing regressions, re-measured under repeat-median) ---
    "dedup_minhash_oph",
    "similarity_pq_adc",
    "text_span_dedup",
    # --- re-confirm: reference WRITE lifecycles (sequential folds) ---
    "ref_post_task_batch",
    "ref_approve_withdrawal_batch",
    "ref_approve_submission_batch",
    # --- re-confirm: ranking family (persistence contract hardened r7) ---
    "customers_rfm_segments",
    # --- re-confirm: AQE skew join ---
    "events_click_attribution",
    # --- round-7 additions (replaced re-confirm slots on entry; the
    #     displaced re-confirms — LSH-ANN/clusters/incremental-minhash,
    #     simhash, minhash-LSH, IVF, engagement tiers, curation
    #     pipeline — were green in r4-r6 and keep those rows) ---
    "graph_pagerank_golden",
    "multimodal_bmp_decode",
    "multimodal_wav_decode",
    "tokenizer_bpe_merges",
    "text_inverted_index",
    "sql_pipe_syntax",
    "sql_scalar_udf",
    "source_agg_pushdown",
    "source_python_stream_datasource",
    "tokenizer_bpe_apply",
    "shard_rendezvous_hashing",
)


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")

        def gated(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Release the previous query's tracked persist() blocks: the
            # driver runs 50 queries in one session and never clears cache
            # (see persistence.py). Queries composing other queries call
            # the raw fn (module-level name), so internal persists survive
            # until the NEXT top-level invocation.
            from .persistence import release_tracked

            release_tracked()
            return fn(spark, sf_dir)

        gated.__name__ = fn.__name__
        gated.__doc__ = fn.__doc__
        _REGISTRY[name] = QuerySpec(
            name=name, fn=gated, oracle=oracle, tags=tuple(tags), doc=fn.__doc__ or ""
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
