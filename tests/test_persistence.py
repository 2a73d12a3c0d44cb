"""The driver's correctness gate runs 50 queries sequentially in one
session without clearing cache; query-internal persist() blocks must not
accumulate across invocations (persistence.py's tracked-release contract)."""

from __future__ import annotations

from mini_hive_server_spark import registry

from .conftest import SF_SMOKE


def _n_cached_rdds(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_tracked_persists_do_not_accumulate(spark):
    qs = registry.queries()
    # Each of these persists at least one intermediate internally.
    persisting = ["dedup_minhash_lsh", "dedup_simhash", "dedup_embedding_cosine"]
    counts = []
    for name in persisting:
        qs[name](spark, SF_SMOKE).count()
        counts.append(_n_cached_rdds(spark))
    # Invocation N releases N-1's blocks: the live set must not grow with
    # the number of queries run (it is bounded by ONE query's working set).
    assert max(counts) <= max(counts[:1]) , counts
    # and a subsequent non-persisting query clears the tail entirely
    qs["text_token_count"](spark, SF_SMOKE).count()
    assert _n_cached_rdds(spark) == 0
