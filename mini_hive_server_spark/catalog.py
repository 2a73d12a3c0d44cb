"""Catalog layer: named tables over Parquet, Hive-metastore style.

The reference binds six MongoDB collection handles at startup
(``/root/reference/index.js:284-289``); our analog is a catalog of named
relational tables. Two modes:

* **Ephemeral views** (`load_tables` / `register_views`) — read the driver's
  Parquet fixtures and expose them as temp views for DataFrame/SQL queries.
  This is what the driver-facing queries use: no metastore daemon needed.
* **Managed tables** (`create_managed_tables`) — ``saveAsTable`` into
  ``spark.sql.warehouse.dir``. Under the default session this is the
  in-memory catalog; under ``session.get_hive_spark()`` the SAME calls go
  through a real Hive metastore (embedded Derby locally, the shared
  metastore service on a cluster), where DDL persists across JVMs —
  ``tests/test_hive_catalog.py`` proves create-in-one-JVM /
  read-in-another, bucketed DDL included (BASELINE.json
  ``spark_approach``). On a real cluster this is where you'd also
  ``ANALYZE TABLE`` for CBO stats and bucket the big fact tables
  (`bucketBy(n, "l_orderkey")`) so repeated joins on the key shuffle zero
  bytes.

Scale note (100 TB): fixtures are single Parquet files; production tables
would be date-partitioned directories (`partitionBy("o_orderdate")`) so
partition pruning cuts scans, with file sizes targeted at 128-512 MB via
``spark.sql.files.maxPartitionBytes``-aligned writes.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Driver fixture tables (TESTDATA.md) — the relational modeling surface for
# every reference query shape plus the LLM-pipeline extension tables.
TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Broadcast policy lives where the joins are declared (plans/tpch.py module
# docstring + SCALE.md): static hints ONLY on SF-invariant sides
# (region/nation, 1-row aggregates, literal tables, bounded key sets);
# SF-proportional sides — including part/supplier/customer — are AQE's call.


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def events_ts_encoding(sf_dir: str) -> str:
    """Probe the physical encoding of events.ts from the parquet footer.

    The driver's fixture generator has shipped the column as TIMESTAMP(NANOS)
    (round 1-2) and as timestamp[us] (round 3+); a future run could emit
    tz-adjusted micros. The footer read is pure pyarrow — no JVM round-trip —
    and is the single source of truth for BOTH the batch reader below and the
    streaming source schema (streaming/events_stream.py), so every consumer
    normalizes identically. Returns one of: "ns" (int64 nanos under the
    legacy conf), "ntz_us" (timestamp[us], no tz → Spark TIMESTAMP_NTZ),
    "ltz" (tz-adjusted → Spark TIMESTAMP), "timestamp" (unknown-but-castable
    fallback).
    """
    try:
        import pyarrow.parquet as pq

        t = pq.read_schema(table_path(sf_dir, "events")).field("ts").type
        s = str(t)
        if s.startswith("timestamp[ns") or s in ("int64", "long"):
            return "ns"
        if s.startswith("timestamp") and getattr(t, "tz", None):
            return "ltz"
        if s.startswith("timestamp"):
            return "ntz_us"
    except Exception:
        pass
    return "timestamp"


# the ns->us decode, shared VERBATIM by the batch reader below and the
# streaming reader (streaming.events_stream.read_events_stream): ns -> µs
# must FLOOR (what a timestamp downcast means); `div` truncates toward
# zero, which would shift a pre-epoch (negative) ts 1µs late. One
# definition so a future repair cannot land in one reader and not the
# other (round-11 review).
NS_TO_TS_EXPR = (
    "timestamp_micros(ts div 1000 - "
    "(CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END))"
)

def _read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read events with ts normalized to Spark TIMESTAMP (µs, UTC session).

    Three fixture encodings are handled (see events_ts_encoding):
    * int64 / TIMESTAMP(NANOS): read ns as long (legacy conf, set at runtime
      so it also applies to a foreign SparkSession, e.g. the driver's) and
      truncate with integer division — `ts div 1000` stays in int64; a float
      path would lose precision above 2^53 ns.
    * timestamp[us] no-tz (current fixtures): arrives as TIMESTAMP_NTZ;
      cast to TIMESTAMP. The session tz is pinned UTC (load_tables), so
      NTZ→LTZ is value-preserving.
    * tz-adjusted timestamp: already Spark TIMESTAMP — passthrough.
    """
    kind = events_ts_encoding(sf_dir)
    if kind == "ns":
        # No fallback exists if this conf can't be set: no session in the
        # repo (including session.py) sets it by default, so a build where
        # conf.set raises would fault on the nanos read anyway — let the
        # conf error surface with context instead of a bare parquet error.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, "events"))
    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":
        # ns → µs must FLOOR (what a timestamp downcast means); `div`
        # truncates toward zero, which would shift a pre-epoch (negative)
        # ts 1µs late. The generator emits post-epoch data today, but the
        # exact form costs one CASE on this legacy-vintage path only.
        df = df.withColumn("ts", F.expr(NS_TO_TS_EXPR))
    elif dtype == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


# Per-session memo of the fixture DataFrames: binding a table handle costs a
# driver-side file listing + footer schema read (~90ms × 10 tables per call
# through Py4J — measured ~0.9s, dominating every sub-second query). The
# fixtures are immutable (mutation queries write DERIVED outputs to /tmp,
# never back to sf_dir), and DataFrames are immutable plan handles, so
# binding once per (session, sf_dir) is exactly the reference's
# startup-bound collection handles (index.js:284-289). Weak-keyed so a
# stopped session's entries die with it.
_TABLES_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[str, dict[str, DataFrame]]]" = (
    weakref.WeakKeyDictionary()
)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read every fixture table as a DataFrame (lazy — no scan happens here).
    Handles are memoized per (session, sf_dir); see _TABLES_CACHE."""
    # every query path funnels through here, so this is where driver-owned
    # vanilla sessions (correctness gate, foreign-cwd launches) get the
    # package zip shipped to executor Python workers (VERDICT r10 #6);
    # once-per-SparkContext guard inside
    from mini_hive_server_spark.session import ship_package_to_executors

    ship_package_to_executors(spark)
    try:
        # Timestamp rendering (date_format) follows the session timezone;
        # oracle comparison requires UTC regardless of the caller's session.
        # (Re-set on every call on purpose: the caller may have flipped it.)
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    try:
        per_session = _TABLES_CACHE.setdefault(spark, {})
    except TypeError:  # session not weak-referenceable on this build
        per_session = {}
    cached = per_session.get(sf_dir)
    if cached is not None:
        return dict(cached)
    out = {}
    for name in TABLE_NAMES:
        if name == "events":
            out[name] = _read_events(spark, sf_dir)
        else:
            out[name] = spark.read.parquet(table_path(sf_dir, name))
    per_session[sf_dir] = out
    return dict(out)


def parallelize_scan(df: DataFrame, *keys: str) -> DataFrame:
    """Guarantee cluster parallelism for a CPU-heavy map stage downstream.

    Scan parallelism is file/row-group granularity. A table packed into
    fewer splits than cores (the fixture is ONE single-row-group file per
    table → one task) serializes per-row kernels — shingling, hash
    signatures, vector arithmetic, Pandas UDFs — onto one core no matter
    the cluster size. When (and only when) the scan yields fewer
    partitions than ``defaultParallelism``, repartition up to it; the
    shuffle moves just the scan's (pruned) columns, megabytes here.

    At 100 TB the input has thousands of splits, the condition is false,
    and NO shuffle is inserted — this must stay a no-op on healthy layouts.
    The explicit numPartitions keeps AQE from coalescing the small local
    exchange back into one partition.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    if _scan_partitions(df) >= par:
        return df
    return df.repartition(par, *keys) if keys else df.repartition(par)


# Memo of the scan-partition probe: `df.rdd.getNumPartitions()` converts
# the plan to an RDD (~120ms through Py4J) on EVERY invocation, even for a
# plan Spark has analyzed before. The count is a pure function of the
# (immutable) input layout + plan, so key it by the plan's semanticHash
# (~7ms) per session. Assumptions this memo rests on (round-10
# self-review): layout-affecting confs (spark.sql.files.maxPartitionBytes)
# stay fixed within a session — nothing in the repo flips them after
# startup — and the fixture files are immutable (TESTDATA.md). A stale
# count degrades parallelism for the Arrow-kernel scans, never
# correctness; flip those confs mid-session and this memo must be keyed
# on them too.
_NUMPARTS_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[int, int]]" = (
    weakref.WeakKeyDictionary()
)


def _scan_partitions(df: DataFrame) -> int:
    try:
        per_session = _NUMPARTS_CACHE.setdefault(df.sparkSession, {})
        key = df.semanticHash()
    except Exception:
        return df.rdd.getNumPartitions()
    n = per_session.get(key)
    if n is None:
        n = df.rdd.getNumPartitions()
        per_session[key] = n
    return n


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register all fixture tables as temp views named after themselves.

    Last registration wins if called with a different ``sf_dir`` — callers
    (driver, tests, bench) use one scale factor per run.
    """
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables


def create_managed_tables(
    spark: SparkSession,
    sf_dir: str,
    database: str = "mini_hive",
    tables: tuple[str, ...] = TABLE_NAMES,
) -> None:
    """Materialize fixtures as catalogued Parquet tables via saveAsTable
    (Hive-metastore-compatible DDL path). Data lands under /tmp with an
    explicit LOCATION so a vanilla driver session (whose warehouse dir is
    its CWD) never writes inside the repo; idempotent per session."""
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    # explicit LOCATION: without it the database *directory* is created
    # under the session warehouse dir — the CWD for a vanilla session
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS {database} "
        f"LOCATION '/tmp/mhs_spark_warehouse/{sf_name}/{database}'"
    )
    for name in tables:
        expected_loc = f"/tmp/mhs_spark_warehouse/{sf_name}/{database}/{name}"
        if spark.catalog.tableExists(f"{database}.{name}"):
            # The Derby metastore persists across JVMs (metastore_db in the
            # server's CWD), so "exists" is NOT "current": a table created
            # from a different sf_dir would silently serve the OLD scale
            # factor's data to every SQL client. The location embeds the
            # sf name — if it matches, the data is the right fixture
            # (fixtures are immutable per TESTDATA.md); if not, drop and
            # rewrite at this run's location.
            loc_rows = spark.sql(
                f"DESCRIBE FORMATTED {database}.{name}"
            ).filter(F.col("col_name") == "Location").collect()
            actual = loc_rows[0]["data_type"] if loc_rows else ""
            if actual.rstrip("/").endswith(expected_loc):
                continue
            spark.sql(f"DROP TABLE {database}.{name}")
        # events must go through the same ts normalization every
        # DataFrame consumer gets (_read_events): a raw parquet read
        # either faults on the nanos-vintage fixture encoding or stores
        # a different ts type (NTZ vs LTZ) than the view path serves.
        df = (
            _read_events(spark, sf_dir)
            if name == "events"
            else spark.read.parquet(table_path(sf_dir, name))
        )
        (
            df.write.mode("overwrite")
            .format("parquet")
            .option("path", expected_loc)
            .saveAsTable(f"{database}.{name}")
        )
