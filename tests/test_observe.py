"""Pipeline observability: `df.observe` attaches named metric aggregates
computed DURING a job (no extra pass) and readable via `Observation` —
how a production pipeline exports row counts / null rates / value bounds
to its monitoring without re-reading data. Pure API surface (observe
never changes results): callers can wrap any registry query with
observation points at zero plan cost."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from .conftest import SF_ORACLE


def test_observe_metrics_computed_in_job(spark):
    from mini_hive_server_spark.catalog import load_tables

    obs = Observation("orders_metrics")
    orders = load_tables(spark, SF_ORACLE)["orders"]
    out = (
        orders.observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice")).alias("sum_price"),
            F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("null_keys"),
        )
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert out  # the query itself ran
    got = obs.get  # blocks until the action above delivered metrics
    assert got["n_rows"] == orders.count()
    assert got["null_keys"] == 0
    assert got["sum_price"] > 0
