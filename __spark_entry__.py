"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H-Q1-shaped pricing summary)
at sf0.001. ``queries()`` / ``oracle_sql()`` are generated from the engine's
central registry (``mini_hive_server_spark.registry``), where every operator
from SURVEY.md §2 plus the LLM-pipeline extensions registers a PySpark
callable and (where SQL-expressible) a DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mini_hive_server_spark import registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.queries()["q1_pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query. EVERY registered query is
    oracle-paired (since round 8; round 7 proved the driver does not
    support rows-only checks — an oracle-less query returns
    `err: no_oracle`). `graph_pagerank_converged`'s data-dependent
    stopping rule is oracle'd via the contraction bound: the 12-round
    golden unroll's values equal the ε-stopped iterate after round(…,6),
    with the rounding margin pinned by tests/test_llm_ops.py. The ANN
    tiers run at provably-exact operating points whose results equal the
    brute-force SQL; the approximate operating points stay recall-bound
    under pytest."""
    return registry.oracles()
