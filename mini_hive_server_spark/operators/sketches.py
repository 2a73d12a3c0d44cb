"""Approximate (sketch) aggregations and skew-mitigation patterns.

The reference has no approximate operators (SURVEY.md §2.5: "No
distinct-agg, median/percentile, approx"), but at 100 TB exact
distinct/quantiles are shuffle-heavy, and sketches are how a training-data
pipeline counts unique documents or monitors value distributions cheaply:

* `approx_count_distinct` — HyperLogLog++: fixed-size sketch per group,
  merged map-side; the shuffle carries kilobytes per group regardless of
  cardinality (exact distinct expands rows per distinct value).
* `percentile_approx` — streaming t-digest-style quantiles, same shape.

Sketch ESTIMATES are engine-specific (Spark HLL++ vs DuckDB's HLL give
different numbers on the same data), so the estimate value itself can never
hash-match a DuckDB oracle. What IS oracle-checkable — and what these
queries emit — is (a) the exact answer, which both engines compute
identically, and (b) a boolean asserting the sketch estimate landed within
its published error envelope of that exact answer, evaluated Spark-side
where the estimate lives and `true` by construction in the oracle. A sketch
regression (wrong merge, precision loss, broken estimator) flips the flag
and fails the driver's value-hash — a strictly stronger gate than the
rows-only check these carried before. pytest additionally bounds the raw
estimates (tests/test_sketches.py).

Also here: the salting pattern for skewed aggregation keys — two-stage
groupBy((key, salt)) → groupBy(key). The result is bit-identical to the
direct groupBy (sums/counts re-associate), so it IS oracle-gated; what
changes is the shuffle layout: a hot key spreads over `_N_SALT` reducers
instead of melting one. (For skewed *joins*, prefer AQE skew-join which
does this automatically; explicit salting remains the tool for skewed
aggs with heavy per-group state.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..registry import register


_APPROX_DISTINCT_ORACLE = """
SELECT event_type,
       count(DISTINCT user_id) AS exact_users,
       count(*) AS n_events,
       true AS approx_ok
FROM events
GROUP BY event_type
ORDER BY event_type
"""


_HLL_RSD = 0.02  # explicit, not the 0.05 default: see sketch_approx_distinct


def approx_distinct_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimate-bearing form: HLL++ estimate next to the exact count.
    The product at scale is `approx_users` (drop the exact column); tests
    bound the raw estimate here."""
    events = load_tables(spark, sf_dir)["events"]
    return (
        events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", _HLL_RSD).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "sketch_approx_distinct",
    oracle=_APPROX_DISTINCT_ORACLE,
    tags=("agg", "sketch"),
)
def sketch_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct users per event type, driver-gated via the
    exact-plus-error-flag contract (module docstring): `approx_ok` asserts
    the HLL++ estimate is within 5% of the exact count.

    rsd is 0.02 EXPLICITLY (round 8): rsd is a standard deviation, not a
    max error — at the default 0.05 the sf0.1 fixture's 1500-distinct
    groups measured 6.7% error (a ~1.3-sigma excursion), flipping the
    flag the oracle pins true. At rsd 0.02 the 5% envelope is a
    2.5-sigma bound with measured error ≤0.5% at every SF (sf0.001/0.01/
    0.1) — the flag's claim now holds with a 10x margin everywhere the
    engine is checked, not just at the driver's scale."""
    return (
        approx_distinct_raw(spark, sf_dir)
        .select(
            "event_type",
            "exact_users",
            "n_events",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("approx_ok"),
        )
        .orderBy("event_type")
    )


_APPROX_QUANTILES_ORACLE = """
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
       round(quantile_cont(o_totalprice, 0.95), 2) AS p95,
       round(quantile_cont(o_totalprice, 0.99), 2) AS p99,
       count(*) AS n,
       true AS approx_ok
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register(
    "sketch_approx_quantiles",
    oracle=_APPROX_QUANTILES_ORACLE,
    tags=("agg", "sketch"),
)
def sketch_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p95/p99 of order totals per status
    (`percentile_approx`, accuracy 10k) — distribution monitoring without a
    full sort. Driver-gated via the exact-plus-error-flag contract (module
    docstring): the emitted percentiles are the EXACT interpolated ones
    (both engines compute the same classic rank-(n-1)·q interpolation);
    `approx_ok` asserts each sketch estimate lies between the exact
    percentiles at q ± 0.01 — a 1%-rank envelope, 100× the GK sketch's
    guaranteed 1/accuracy rank error, so it only trips on real sketch
    breakage, never on legitimate approximation."""
    orders = load_tables(spark, sf_dir)["orders"]
    qs = [0.49, 0.5, 0.51, 0.94, 0.95, 0.96, 0.98, 0.99, 1.0]
    agg = orders.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", [0.5, 0.95, 0.99], 10000).alias("qa"),
        F.percentile("o_totalprice", F.array(*[F.lit(q) for q in qs])).alias("qe"),
        F.count(F.lit(1)).alias("n"),
    )
    in_band = (
        F.col("qa")[0].between(F.col("qe")[0], F.col("qe")[2])
        & F.col("qa")[1].between(F.col("qe")[3], F.col("qe")[5])
        & F.col("qa")[2].between(F.col("qe")[6], F.col("qe")[8])
    )
    return agg.select(
        "o_orderstatus",
        F.round(F.col("qe")[1], 2).alias("p50"),
        F.round(F.col("qe")[4], 2).alias("p95"),
        F.round(F.col("qe")[7], 2).alias("p99"),
        "n",
        in_band.alias("approx_ok"),
    ).orderBy("o_orderstatus")


_HLL_MERGEABLE_ORACLE = """
SELECT count(DISTINCT event_id % 16) AS n_shards,
       count(DISTINCT user_id) AS exact_users,
       true AS approx_ok
FROM events
"""


@register(
    "sketch_hll_mergeable", oracle=_HLL_MERGEABLE_ORACLE, tags=("agg", "sketch")
)
def sketch_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Apache DataSketches, Spark 3.5+): build one
    binary sketch per source shard with `hll_sketch_agg`, then merge the
    shard sketches with `hll_union_agg` into the corpus-wide distinct-user
    estimate — the two-level pattern that makes distinct counting
    incremental at 100 TB: per-shard sketches are computed once, persisted
    (KBs each), and re-merged on every corpus update instead of rescanning
    history. Driver-gated via the exact-plus-error-flag contract (module
    docstring): `approx_ok` asserts the MERGED estimate is within 5% of the
    exact corpus-wide distinct count (lgK=12 → rsd ≈ 1.6%, so the flag only
    trips on a broken merge, not on legitimate sketch error); pytest bounds
    the raw estimate too.

    Scale shape: stage 1 is a per-shard partial agg (map-side combine on
    the shard key); stage 2 shuffles only `n_shards` sketch blobs — the
    merge cost is independent of corpus cardinality."""
    return hll_mergeable_raw(spark, sf_dir).select(
        "n_shards",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("approx_ok"),
    )


def hll_mergeable_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimate-bearing form: merged-union estimate next to the exact
    count and shard count; tests bound the raw estimate here."""
    events = load_tables(spark, sf_dir)["events"]
    shard = events.withColumn("shard", (F.col("event_id") % 16).cast("int"))
    per_shard = shard.groupBy("shard").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"),
    )
    merged = per_shard.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias(
            "approx_users"
        ),
        F.count(F.lit(1)).alias("n_shards"),
    )
    return merged.crossJoin(
        F.broadcast(
            events.agg(F.countDistinct("user_id").alias("exact_users"))
        )
    )


_N_SALT = 8

_SALTED_AGG_ORACLE = """
SELECT event_type,
       count(*) AS n,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("agg_salted_two_stage", oracle=_SALTED_AGG_ORACLE, tags=("agg", "skew"))
def agg_salted_two_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigation salted aggregation: stage 1 groups by (key, salt)
    so a hot key's rows spread across `_N_SALT` reducers; stage 2 merges
    the partials per key. Counts and sums re-associate, so the result is
    bit-identical to the direct groupBy — oracle-gated to prove it.

    Note the float subtlety: sum-of-sums changes addition order vs a
    direct sum, so the *unrounded* double can differ in the last ulp; the
    round(2) on output absorbs it (and the oracle applies the same
    rounding), same policy as every float aggregate in the registry."""
    events = load_tables(spark, sf_dir)["events"]
    salted = events.withColumn(
        "salt", (F.col("event_id") % _N_SALT).cast("int")
    )
    partial = salted.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum("value").alias("pv"),
    )
    return (
        partial.groupBy("event_type")
        .agg(
            F.sum("pn").alias("n"),
            F.round(F.sum("pv"), 2).alias("total_value"),
        )
        .orderBy("event_type")
    )


_HOT_REPLICAS = 15  # hot key becomes 1 + 15 = 16x its natural size

_SALTED_HOT_KEY_ORACLE = f"""
WITH skewed AS (
  SELECT event_type, value FROM events
  UNION ALL
  SELECT e.event_type, e.value
  FROM events e CROSS JOIN range({_HOT_REPLICAS}) r
  WHERE e.event_type = 'click'
)
SELECT event_type,
       count(*) AS n,
       round(sum(value), 2) AS total_value
FROM skewed
GROUP BY event_type
ORDER BY event_type
"""


@register("agg_salted_hot_key", oracle=_SALTED_HOT_KEY_ORACLE, tags=("agg", "skew"))
def agg_salted_hot_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted two-stage aggregation under PLANTED skew: one key
    ('click') is replicated 16x via a map-only explode, so at bench SF
    (~1M events → ~5.2M skewed rows) a single reducer would own ~75% of
    the input if grouped directly. The salt spreads the hot key over
    `_N_SALT` reducers; the merge stage re-associates exactly, so the
    output equals the direct groupBy — the oracle replays the same
    replication in SQL and groups directly.

    This query exists so the skew story carries a MEASURED wall-clock
    number in BENCH_rN (bench.py EXTENDED set), not just the plan
    assertion `tests/test_plans.py` makes for the AQE skew join. The
    replication is explode(sequence), not a join — no shuffle until the
    salted partial agg, and the partials are 2 longs per (key, salt):
    map-side combine collapses the planted 16x before anything moves."""
    events = load_tables(spark, sf_dir)["events"].select("event_id", "event_type", "value")
    hot = (
        events.filter(F.col("event_type") == "click")
        .withColumn("r", F.explode(F.sequence(F.lit(1), F.lit(_HOT_REPLICAS))))
        .drop("r")
    )
    skewed = events.unionAll(hot)
    partial = skewed.withColumn(
        "salt", (F.col("event_id") % _N_SALT).cast("int")
    ).groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum("value").alias("pv"),
    )
    return (
        partial.groupBy("event_type")
        .agg(
            F.sum("pn").alias("n"),
            F.round(F.sum("pv"), 2).alias("total_value"),
        )
        .orderBy("event_type")
    )


_CATALOG_SQL_ORACLE = """
SELECT n.n_name, count(*) AS n_customers
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY n_customers DESC, n_name
"""


@register("catalog_managed_sql", oracle=_CATALOG_SQL_ORACLE, tags=("catalog", "sql"))
def catalog_managed_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Hive-metastore-style path end-to-end: fixtures materialized as
    catalogued tables via saveAsTable DDL (explicit /tmp LOCATION), then
    pure Spark SQL over catalog-qualified names — the surface a Hive/
    Thrift user of the engine would hit. On a cluster the same code backs
    onto a real metastore (enableHiveSupport) and gains ANALYZE TABLE
    statistics for the cost-based optimizer."""
    import os
    from ..catalog import create_managed_tables

    sf_name = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    db = f"mini_hive_{sf_name}"
    create_managed_tables(spark, sf_dir, database=db, tables=("customer", "nation"))
    return spark.sql(
        f"""
        SELECT n.n_name, count(*) AS n_customers
        FROM {db}.customer c JOIN {db}.nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        ORDER BY n_customers DESC, n_name
        """
    )


# ------------------------------------------- count-min heavy hitters

_CMS_DEPTH = 4
_CMS_WIDTH = 1024
_CMS_PHI = 0.008  # support threshold as a fraction of stream length

_CMS_HEAVY_ORACLE = f"""
WITH c AS (
  SELECT user_id, count(*) AS n FROM events GROUP BY user_id
),
t AS (
  SELECT count(*) AS total FROM events
)
SELECT c.user_id, c.n AS est_count
FROM c, t
WHERE c.n >= CAST(ceil({_CMS_PHI} * t.total) AS BIGINT)
ORDER BY est_count DESC, c.user_id
"""


def cms_sketch(events: DataFrame) -> DataFrame:
    """Build the count-min sketch table: (row j, bucket, counter) for
    depth x width counters. Counters are plain sums → the sketch merges
    across shards/days by adding counters cell-wise (linear sketch), the
    property that makes it incrementally maintainable at 100 TB."""
    buckets = events.select(
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {_CMS_DEPTH - 1}),"
                f" j -> pmod(xxhash64(user_id, j), {_CMS_WIDTH}))"
            )
        ).alias("j", "bucket")
    )
    return buckets.groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("counter"))


@register("sketch_cms_heavy_hitters", oracle=_CMS_HEAVY_ORACLE, tags=("agg", "sketch"))
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via a count-min sketch (Cormode & Muthukrishnan
    2005): estimate each key's frequency as the MIN over d=4 hash rows of
    w=1024 counters, and report keys at or above a support threshold
    (0.8% of stream length). At the fixture cardinality (150 users vs
    4x1024 counters) the minimum provably clears every collision, so the
    estimates — and therefore the oracle, which computes exact counts —
    are exact; `tests/test_sketches.py` pins that estimate==exact at both
    fixture SFs, the same exact-plus-error contract as the HLL tier.

    Scale shape: sketch construction is a map-only bucket explode (x4)
    into a hash agg over AT MOST d*w = 4096 cells — the shuffle is
    sketch-sized, not corpus-sized, and counters merge additively across
    shards (see cms_sketch). The candidate probe joins the (tiny, fixed
    -size) sketch via broadcast — this broadcast is size-bounded by
    construction at ANY scale factor, the one case SCALE.md's policy
    allows a static hint. The exact per-key groupBy the sketch replaces
    is the thing that needs the full corpus-wide shuffle at 100 TB; here
    only candidate keys (a sample or watchlist in production) rendezvous
    with 4096 cells."""
    events = load_tables(spark, sf_dir)["events"]
    sketch = cms_sketch(events)
    total = events.agg(F.count(F.lit(1)).alias("total"))
    candidates = events.select("user_id").distinct()
    probe = candidates.select(
        "user_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {_CMS_DEPTH - 1}),"
                f" j -> pmod(xxhash64(user_id, j), {_CMS_WIDTH}))"
            )
        ).alias("j", "bucket"),
    )
    est = (
        probe.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("user_id")
        .agg(F.min("counter").alias("est_count"))
    )
    return (
        est.crossJoin(F.broadcast(total))
        .filter(F.col("est_count") >= F.ceil(F.lit(_CMS_PHI) * F.col("total")))
        .select("user_id", "est_count")
        .orderBy(F.col("est_count").desc(), "user_id")
    )


# --------------------------------- HLL set algebra: intersection estimate

_HLL_INTERSECT_ORACLE = """
WITH a AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
),
b AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
)
SELECT (SELECT count(*) FROM a) AS exact_clickers,
       (SELECT count(*) FROM b) AS exact_purchasers,
       (SELECT count(*) FROM a JOIN b USING (user_id)) AS exact_both,
       TRUE AS approx_ok
"""


@register(
    "sketch_hll_intersection", oracle=_HLL_INTERSECT_ORACLE, tags=("agg", "sketch")
)
def sketch_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL set ALGEBRA beyond union: estimate the overlap of two cohorts
    (clicked ∩ purchased users) by inclusion-exclusion over three HLL
    sketches — |A∩B| = |A| + |B| - |A∪B| — where |A∪B| comes from
    `hll_union_agg` over the two cohort sketches. This is the audience-
    overlap query every analytics store answers from stored sketches
    WITHOUT rescanning either cohort: at 100 TB, A and B live as KB-sized
    per-cohort sketches (built once, map-side), and the intersection is
    driver-side arithmetic on three estimates.

    Contract (same as the other sketch tiers): the registered query emits
    the EXACT cohort and overlap counts plus an `approx_ok` flag
    asserting the inclusion-exclusion estimate lands within the combined
    error envelope (union error compounds — 3 sketches at lgK=12, rsd
    ~1.6% each, enveloped at 10% of the smaller cohort); pytest bounds
    the raw estimate in tests/test_sketches.py."""
    return hll_intersection_raw(spark, sf_dir).select(
        "exact_clickers",
        "exact_purchasers",
        "exact_both",
        (
            F.abs(F.col("approx_both") - F.col("exact_both"))
            <= 0.10 * F.least("exact_clickers", "exact_purchasers")
        ).alias("approx_ok"),
    )


def hll_intersection_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimate-bearing form: inclusion-exclusion overlap next to the
    exact counts; tests bound the raw estimate here."""
    events = load_tables(spark, sf_dir)["events"]
    cohorts = events.filter(
        F.col("event_type").isin("click", "purchase")
    ).select("event_type", "user_id")
    # one pass: per-cohort sketch; the union sketch merges the two
    per = cohorts.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"),
        F.countDistinct("user_id").alias("exact"),
    )
    merged = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_union"),
        F.sum(F.when(F.col("event_type") == "click", F.col("exact"))).alias(
            "exact_clickers"
        ),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("exact"))
        ).alias("exact_purchasers"),
        F.sum(F.hll_sketch_estimate("sk")).alias("approx_sum"),
    )
    both = (
        events.filter(F.col("event_type") == "click")
        .select("user_id")
        .distinct()
        .join(
            events.filter(F.col("event_type") == "purchase")
            .select("user_id")
            .distinct(),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("exact_both"))
    )
    return (
        merged.crossJoin(F.broadcast(both))
        .withColumn(
            "approx_both",
            F.round(F.col("approx_sum") - F.col("approx_union")).cast("long"),
        )
        .select(
            "exact_clickers",
            "exact_purchasers",
            "exact_both",
            "approx_both",
        )
    )


# ------------------------------------------- sliding-window HLL user counts

_SLIDING_HLL_HOURS = 6

_SLIDING_HLL_ORACLE = f"""
WITH hours AS (
  SELECT DISTINCT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h FROM events
),
expanded AS (
  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP))
           + to_hours(t.i) AS win_end_h,
         user_id
  FROM events, unnest(range(0, {_SLIDING_HLL_HOURS})) AS t(i)
)
SELECT strftime(e.win_end_h, '%Y-%m-%d %H:%M:%S') AS window_end,
       count(DISTINCT e.user_id) AS exact_users,
       true AS approx_ok
FROM expanded e
JOIN hours ON hours.h = e.win_end_h
GROUP BY 1
ORDER BY 1
"""


@register("sketch_hll_sliding_users", oracle=_SLIDING_HLL_ORACLE, tags=("agg", "sketch", "event-time"))
def sketch_hll_sliding_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 6-hour distinct-user counts from MERGEABLE hour-level HLL
    partials: build one HLL sketch per hour, then every 6-hour window
    unions its 6 hour-sketches — the pre-aggregated rollup pattern that
    makes sliding distinct-counts affordable (recomputing distinct over
    raw events per window position multiplies the scan 6×; merging
    byte-sized sketches is O(windows), independent of event volume, and
    the same partials serve any window length). Emits the EXACT count
    per window (computed Spark-side for the oracle) plus an approx_ok
    flag asserting the sketch estimate lands within 5% — the
    `sketch_hll_mergeable` contract.

    Plan: one partial-agg'd groupBy(hour) over events builds the
    sketches; the window expansion (explode of 6 offsets) operates on
    HOUR-cardinality rows only. The exact twin explodes raw events — at
    100 TB you would ship ONLY the sketch path; the exact column is the
    fixture-scale verification contract."""
    events = load_tables(spark, sf_dir)["events"]
    hourly = events.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.hll_sketch_agg(F.col("user_id")).alias("sk")
    )
    hours = hourly.select("h")
    offsets = F.array([F.lit(i) for i in range(_SLIDING_HLL_HOURS)])
    windows = (
        hourly.select(
            F.explode(offsets).alias("i"), "h", "sk"
        )
        .select(
            (F.col("h") + F.expr("make_interval(0, 0, 0, 0, i, 0, 0)")).alias(
                "win_end_h"
            ),
            "sk",
        )
        .join(hours.withColumnRenamed("h", "win_end_h"), "win_end_h", "left_semi")
        .groupBy("win_end_h")
        .agg(F.hll_sketch_estimate(F.hll_union_agg(F.col("sk"))).alias("est"))
    )
    exact = (
        events.select(
            F.explode(offsets).alias("i"),
            F.date_trunc("hour", "ts").alias("h"),
            "user_id",
        )
        .select(
            (F.col("h") + F.expr("make_interval(0, 0, 0, 0, i, 0, 0)")).alias(
                "win_end_h"
            ),
            "user_id",
        )
        .join(hours.withColumnRenamed("h", "win_end_h"), "win_end_h", "left_semi")
        .groupBy("win_end_h")
        .agg(F.count_distinct("user_id").alias("exact_users"))
    )
    return (
        exact.join(windows, "win_end_h")
        .select(
            F.date_format("win_end_h", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
            "exact_users",
            (
                F.abs(F.col("est") - F.col("exact_users"))
                <= F.col("exact_users") * 0.05
            ).alias("approx_ok"),
        )
        .orderBy("window_end")
    )


# -------------------------------------------- mergeable bloom membership

# 32768 bits as 1024 x 32-bit words (carried in longs so every mask is
# positive in both engines' signed arithmetic); k=3 md5-derived probes.
_BLOOM_BITS = 32768
_BLOOM_K = 3

_BLOOM_ORACLE = f"""
WITH standing AS (
  SELECT DISTINCT md5(text) AS fp, source
  FROM documents WHERE doc_id % 10 != 0
),
probe AS (
  -- every 5th doc: the odd multiples of 5 are ALSO in standing (true
  -- members); multiples of 10 are not (bloom must say no, modulo FPs)
  SELECT DISTINCT md5(text) AS fp
  FROM documents WHERE doc_id % 5 = 0
),
ins_pos AS (
  SELECT s.source,
         CAST(CAST(('0x' || substr(md5(CAST(h.i AS VARCHAR) || ':' || s.fp), 1, 8))
              AS UBIGINT) % {_BLOOM_BITS} AS BIGINT) AS pos
  FROM standing s CROSS JOIN (SELECT unnest(range({_BLOOM_K})) AS i) h
),
shard_words AS (
  SELECT source, pos // 32 AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER)) AS bits
  FROM ins_pos GROUP BY 1, 2
),
merged AS (
  SELECT word, bit_or(bits) AS bits FROM shard_words GROUP BY word
),
probe_pos AS (
  SELECT p.fp,
         CAST(CAST(('0x' || substr(md5(CAST(h.i AS VARCHAR) || ':' || p.fp), 1, 8))
              AS UBIGINT) % {_BLOOM_BITS} AS BIGINT) AS pos
  FROM probe p CROSS JOIN (SELECT unnest(range({_BLOOM_K})) AS i) h
),
verdicts AS (
  SELECT pp.fp,
         bool_and(coalesce((m.bits & (CAST(1 AS BIGINT) << CAST(pp.pos % 32 AS INTEGER)))
                  = (CAST(1 AS BIGINT) << CAST(pp.pos % 32 AS INTEGER)), FALSE))
           AS maybe_member
  FROM probe_pos pp LEFT JOIN merged m ON pp.pos // 32 = m.word
  GROUP BY pp.fp
),
exact AS (
  SELECT p.fp, EXISTS (SELECT 1 FROM standing s WHERE s.fp = p.fp) AS is_member
  FROM probe p
)
SELECT count(*) AS n_probe,
       count(*) FILTER (WHERE v.maybe_member) AS n_bloom_hits,
       count(*) FILTER (WHERE e.is_member) AS n_exact_hits,
       count(*) FILTER (WHERE v.maybe_member AND NOT e.is_member)
         AS n_false_positives,
       count(*) FILTER (WHERE e.is_member AND NOT v.maybe_member)
         AS n_false_negatives
FROM verdicts v JOIN exact e ON v.fp = e.fp
"""


def _bloom_positions(df: DataFrame, key: str) -> DataFrame:
    """Explode each key into its k md5-derived bit positions (0..m-1).
    md5 on both engines makes the filter BIT-IDENTICAL cross-engine."""
    probes = F.array(*[F.lit(i) for i in range(_BLOOM_K)])
    return df.withColumn("i", F.explode(probes)).withColumn(
        "pos",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("i").cast("string"), F.lit(":"), F.col(key))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % _BLOOM_BITS
        ),
    )


@register("sketch_bloom_membership", oracle=_BLOOM_ORACLE, tags=("sketch", "llm", "dedup"))
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable Bloom-filter membership — the fourth sketch family (HLL
    counts distinct, quantile sketch ranks, CMS estimates frequency;
    Bloom answers 'have we ingested this before?'). Per-source shard
    filters are built over the standing corpus's content fingerprints,
    OR-merged into one global filter, and the incremental batch (every
    10th doc) probes it — the constant-size standing-state alternative to
    `ingest_incremental_dedup`'s anti-join when the corpus outgrows a
    re-scan.

    Representation is relational, not opaque bytes: the filter is (word,
    bits) rows — 1024 x 32-bit words in long arithmetic so every mask
    stays positive under both engines' signed shifts — built by one
    bit_or aggregate over exploded (key x 3 md5 probes) positions,
    merged across shards by a second bit_or (associative = mergeable;
    the same per-shard/global algebra as the HLL tier). Probing joins
    the probe positions to the 1024-row filter and bool_ands the bit
    tests per key. md5-derived positions make the filter bit-identical
    cross-engine, so the oracle reproduces hits AND false positives
    exactly; false negatives are structurally impossible and pinned at 0.
    At 100 TB: the filter is ~4 KB per shard regardless of data volume —
    it broadcasts; only fingerprints shuffle."""
    docs = load_tables(spark, sf_dir)["documents"]
    standing = (
        docs.filter(F.col("doc_id") % 10 != 0)
        .select(F.md5("text").alias("fp"), "source")
        .distinct()
    )
    probe = (
        # half the probes are true members (doc_id % 10 == 5 stays in
        # standing), half are novel (doc_id % 10 == 0)
        docs.filter(F.col("doc_id") % 5 == 0)
        .select(F.md5("text").alias("fp"))
        .distinct()
    )
    # expr form: F.shiftleft only takes a literal shift amount
    mask = F.expr("shiftleft(cast(1 as bigint), cast(pos % 32 as int))")
    shard_words = (
        _bloom_positions(standing, "fp")
        .groupBy("source", F.expr("pos div 32").alias("word"))
        .agg(F.bit_or(mask).alias("bits"))
    )
    merged = shard_words.groupBy("word").agg(F.bit_or("bits").alias("bits"))
    pp = _bloom_positions(probe, "fp").withColumn("word", F.expr("pos div 32"))
    verdicts = (
        pp.join(F.broadcast(merged), "word", "left")
        .select(
            "fp",
            F.coalesce(
                (F.col("bits").bitwiseAND(mask) == mask), F.lit(False)
            ).alias("bit_set"),
        )
        .groupBy("fp")
        .agg(F.bool_and("bit_set").alias("maybe_member"))
    )
    exact = probe.join(
        standing.select("fp").distinct(),
        "fp",
        "left_semi",
    ).select("fp", F.lit(True).alias("is_member"))
    joined = verdicts.join(exact, "fp", "left").select(
        "maybe_member", F.coalesce("is_member", F.lit(False)).alias("is_member")
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_probe"),
        F.count(F.when(F.col("maybe_member"), 1)).alias("n_bloom_hits"),
        F.count(F.when(F.col("is_member"), 1)).alias("n_exact_hits"),
        F.count(F.when(F.col("maybe_member") & ~F.col("is_member"), 1)).alias(
            "n_false_positives"
        ),
        F.count(F.when(F.col("is_member") & ~F.col("maybe_member"), 1)).alias(
            "n_false_negatives"
        ),
    )


_CATALOG_VIEW_ORACLE = """
SELECT r.r_name, count(*) AS n_nations, count(DISTINCT n.n_name) AS n_names
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
ORDER BY r.r_name
"""


@register("catalog_sql_view", oracle=_CATALOG_VIEW_ORACLE, tags=("catalog", "sql"))
def catalog_sql_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog VIEW surface: a persistent SQL view (CREATE OR REPLACE VIEW
    in the managed database — stored logical plan, not materialized data)
    defined over catalogued tables and queried through the catalog-
    qualified name, exactly how a Hive/JDBC user encapsulates a join once
    and reuses it. Views are late-bound: this query's aggregate runs over
    the view's plan inlined by Catalyst, so pushdown/pruning see through
    the view boundary as if the join were written inline (at 100 TB a
    view costs nothing — it is purely a name for a plan)."""
    import os
    from ..catalog import create_managed_tables

    sf_name = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    db = f"mini_hive_{sf_name}"
    create_managed_tables(spark, sf_dir, database=db, tables=("nation", "region"))
    spark.sql(
        f"""
        CREATE OR REPLACE VIEW {db}.nation_regions AS
        SELECT n.n_nationkey, n.n_name, r.r_name
        FROM {db}.nation n JOIN {db}.region r ON n.n_regionkey = r.r_regionkey
        """
    )
    return spark.sql(
        f"""
        SELECT r_name, count(*) AS n_nations, count(DISTINCT n_name) AS n_names
        FROM {db}.nation_regions
        GROUP BY r_name
        ORDER BY r_name
        """
    )
