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

Two classes of tracked block exist:

* plain (default): the persist is a pure performance hint — releasing it
  early merely recomputes. Released unconditionally at the next cycle.
* correctness-bearing (``correctness_bearing=True`` — ranking.py's ranged
  relation): the cached result correlates ``spark_partition_id`` across
  two consumers of one ``repartitionByRange`` exchange, whose bounds are
  sampled with a per-RDD seed. If the persist were dropped BEFORE the
  consumer materialized, a late action could plan the two subtrees as two
  independent range exchanges with independently-sampled bounds —
  silently wrong ranks, not just wasted work (ADVICE r6). Release is
  therefore DEFERRED: at each cycle the tracker asks the CacheManager
  whether the cached buffers were ever built; if not (consumer never ran
  — e.g. a caller built query N+1 before collecting query N, or the plan
  audit explains without executing), the entry re-registers itself for
  the next cycle. An unmaterialized persist holds zero storage, so
  deferral is free; once the consumer materializes, the very next cycle
  releases the blocks as usual.

At cluster scale the same discipline matters more, not less: executor
storage memory competes with shuffle/execution memory under the unified
memory manager, and dead cached blocks evict live ones or spill to disk.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

_LIVE: list[Callable[[], None]] = []


def _cache_state(df: DataFrame) -> str:
    """'loaded' (buffers built — safe to release), 'pending' (cached but
    never computed — releasing would re-expose the re-sample hazard), or
    'gone' (already uncached by someone else). Introspection failure
    degrades to 'loaded' (= the pre-deferral behavior: release now)."""
    try:
        cm = df.sparkSession._jsparkSession.sharedState().cacheManager()
        cached = cm.lookupCachedData(df._jdf)
        if cached.isEmpty():
            return "gone"
        builder = cached.get().cachedRepresentation().cacheBuilder()
        return "loaded" if builder.isCachedColumnBuffersLoaded() else "pending"
    except Exception:
        return "loaded"


class _DeferredRelease:
    """Release hook for a correctness-bearing persist: unpersists only
    once the cached buffers were actually built, re-deferring itself
    across release cycles until then (see module docstring)."""

    def __init__(self, df: DataFrame):
        self._df = df

    def __call__(self) -> None:
        state = _cache_state(self._df)
        if state == "pending":
            _LIVE.append(self)
        elif state == "loaded":
            self._df.unpersist()
        # 'gone': nothing left to release


def tracked_persist(df: DataFrame, correctness_bearing: bool = False) -> DataFrame:
    """persist() a query-internal intermediate, registering it for release
    when the NEXT registered query starts. ``correctness_bearing=True``
    defers the release until the block was actually computed (see module
    docstring) — pass it whenever a recompute would NOT reproduce the
    cached result bit-for-bit (sampled range bounds, nondeterministic
    ids)."""
    p = df.persist()
    _LIVE.append(_DeferredRelease(p) if correctness_bearing else p.unpersist)
    # Contract boundary (round-10 self-review): deferral protects the
    # never-materialized direction only. Once the buffers were built AND
    # a later registered query's start released them, a FURTHER action on
    # the earlier query's still-held DataFrame recomputes from scratch —
    # for a sampled range exchange that means freshly-sampled bounds and
    # silently different ranks. The engine's own consumers never do this
    # (the driver, bench, and the facade build a fresh DataFrame per
    # invocation); external callers must re-invoke the query function
    # instead of re-collecting a stale handle across query boundaries.
    return p


def tracked_release(unpersist_fn: Callable[[], None]) -> None:
    """Register an arbitrary cleanup for the next release cycle — used for
    blocks the DataFrame API cannot unpersist itself (localCheckpoint
    RDDs: `catalog.clearCache` only drops InMemoryRelations, so an
    iterative query's final checkpoint would otherwise outlive it)."""
    _LIVE.append(unpersist_fn)


def release_tracked() -> None:
    """Run one release cycle over every tracked intermediate from prior
    query invocations. Deferred (correctness-bearing) entries whose
    blocks were never computed re-register themselves for the next cycle
    instead of releasing — the snapshot-then-clear shape below lets them
    append to the fresh list without being re-invoked this cycle."""
    pending = _LIVE[:]
    _LIVE.clear()
    for fn in pending:
        try:
            fn()
        except Exception:
            pass  # session already stopped — blocks died with it
