"""Scoped persistence for query-internal cached intermediates.

The dedup/similarity tiers persist() intermediates that feed multiple
downstream joins (shingle arrays, fingerprints, bucketed embeddings). A
query function returns a LAZY DataFrame — the caller (driver, tests,
bench) materializes it later — so the query itself can never unpersist:
the blocks must be live when the caller finally collects.

What it CAN do is release the blocks of every PREVIOUS query invocation:
the driver's correctness gate runs 50 queries sequentially in one session,
and without this the persisted blocks accumulate for the whole run
(bench.py clears cache between queries; the driver harness doesn't).
`registry.register` wraps every query so invocation N releases invocation
N-1's tracked blocks — the live cached set is bounded by one query's
working set at any time, regardless of how many queries the session runs.

At cluster scale the same discipline matters more, not less: executor
storage memory competes with shuffle/execution memory under the unified
memory manager, and dead cached blocks evict live ones or spill to disk.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

_LIVE: list[Callable[[], None]] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() a query-internal intermediate, registering it for release
    when the NEXT registered query starts (see module docstring)."""
    p = df.persist()
    _LIVE.append(p.unpersist)
    return p


def tracked_release(unpersist_fn: Callable[[], None]) -> None:
    """Register an arbitrary cleanup for the next release cycle — used for
    blocks the DataFrame API cannot unpersist itself (localCheckpoint
    RDDs: `catalog.clearCache` only drops InMemoryRelations, so an
    iterative query's final checkpoint would otherwise outlive it)."""
    _LIVE.append(unpersist_fn)


def release_tracked() -> None:
    """Unpersist every tracked intermediate from prior query invocations.

    Contract (round 6): a query's returned DataFrame must be materialized
    BEFORE the next registered query is built — the sequential
    materialize-then-advance pattern the driver, tests, and bench all
    follow. Plain persists would merely recompute if collected late, but
    two tracked classes are no longer re-executable: ranking.py's ranged
    relation (a recompute re-samples range bounds, the determinism
    hazard its docstring describes) and iterative queries' checkpoint
    blocks (truncated lineage cannot recompute at all)."""
    while _LIVE:
        try:
            _LIVE.pop()()
        except Exception:
            pass  # session already stopped — blocks died with it
