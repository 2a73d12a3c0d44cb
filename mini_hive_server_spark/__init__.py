"""mini_hive_server_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
``Kaniz-Naiba/mini-hive-server`` (an Express.js + MongoDB micro-task backend;
see SURVEY.md) as a Spark-first engine:

* every query shape the reference executes (scans, point lookups, filters,
  app-side joins, aggregates, top-k pipelines — SURVEY.md §2) is implemented
  as a declarative DataFrame / Spark SQL query over a relational model of the
  reference's collections, instantiated on the driver's TPC-H-ish fixtures;
* a Hive-metastore-style catalog layer registers Parquet tables;
* large-scale training-data-pipeline operators (dedup, similarity search,
  text analysis, multimodal plumbing) extend the surface, designed for
  100 TB / 1000-executor scale (broadcast dims, partial aggregation, LSH
  blocking instead of cross joins, AQE skew handling).

Nothing here is a port of the reference's runtime — the reference has no
engine internals (SURVEY.md §0); only its query *semantics* are reproduced.
"""

__version__ = "0.1.0"
