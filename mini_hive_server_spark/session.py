"""SparkSession factory tuned for both local testing and cluster scale.

The reference (``/root/reference/index.js:281-289``) "configures" its engine by
opening a MongoClient; our analog is a SparkSession with scale-aware defaults:

* AQE on — runtime join-strategy switching, partition coalescing, and skew-join
  splitting replace every hand-tuned decision the reference made (SURVEY.md §4).
* ``spark.sql.shuffle.partitions`` sized to the local core count; on a real
  cluster AQE coalescing makes the initial number a ceiling, not a fixed cost.
* Arrow enabled so the Pandas-UDF slow path (similarity / multimodal ops) is
  batch-vectorized rather than row-at-a-time.
* Session timezone pinned to UTC so timestamp semantics are stable and
  oracle-comparable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "mini-hive-server-spark"


def local_cpu_count() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "") or os.cpu_count() or 4)
    except ValueError:
        return os.cpu_count() or 4


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    In local mode there is a single JVM; ``getOrCreate`` reuses an existing
    session, so tests, the driver contract, and bench all share one JVM.
    """
    cpus = local_cpu_count()
    builder = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # the events fixture stores TIMESTAMP(NANOS) which Spark has no native
        # type for; read as long ns and convert in catalog.load_tables
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/mhs_warehouse"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
