"""Graph algorithms expressed as relational dataflow.

Extension family (the reference has no graph surface; its nearest shape
is the activity feed, index.js:226-238). PageRank here runs on the
event-type transition graph — nodes are event types, edges the observed
prev→next transitions weighted by frequency (the same edge relation
`events_type_transitions` exposes). The node set is bounded by type
arity, but the DATAFLOW is the general one: each iteration is
rank ⋈ edges → groupBy(dst) → sum, i.e. one key-shuffled join + one
partial-agg'd aggregate per iteration, which is exactly how PageRank
scales on a billion-node graph (Pregel/GraphX reduce to the same join-
aggregate loop; iteration count bounds the number of shuffles). A fixed
iteration count keeps the whole computation ORACLE-EXPRESSIBLE as
unrolled CTEs — the convergence-test variant is the same loop with a
driver-side delta check.

Dangling mass (nodes with no out-edges) is dropped rather than
redistributed — the common simplification; both the DataFrame plan and
the oracle implement the same recurrence, so the check is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..registry import register

_DAMPING = 0.85
_N_ITER = 3

_PAGERANK_ORACLE = f"""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY CAST(ts AS TIMESTAMP), event_id)
           AS prev_type
  FROM events
),
raw_edges AS (
  SELECT prev_type AS src, event_type AS dst, count(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
),
edges AS (
  SELECT src, dst,
         CAST(n AS DOUBLE)
           / CAST(sum(n) OVER (PARTITION BY src) AS DOUBLE) AS w
  FROM raw_edges
),
nodes AS (SELECT DISTINCT event_type AS node FROM events),
nn AS (SELECT count(*) AS n_nodes FROM nodes),
pr0 AS (
  SELECT node, 1.0 / n_nodes AS pr FROM nodes, nn
),
pr1 AS (
  SELECT n.node,
         (1 - {_DAMPING}) / nn.n_nodes
           + {_DAMPING} * coalesce(sum(p.pr * e.w), 0) AS pr
  FROM nodes n CROSS JOIN nn
  LEFT JOIN edges e ON e.dst = n.node
  LEFT JOIN pr0 p ON p.node = e.src
  GROUP BY n.node, nn.n_nodes
),
pr2 AS (
  SELECT n.node,
         (1 - {_DAMPING}) / nn.n_nodes
           + {_DAMPING} * coalesce(sum(p.pr * e.w), 0) AS pr
  FROM nodes n CROSS JOIN nn
  LEFT JOIN edges e ON e.dst = n.node
  LEFT JOIN pr1 p ON p.node = e.src
  GROUP BY n.node, nn.n_nodes
),
pr3 AS (
  SELECT n.node,
         (1 - {_DAMPING}) / nn.n_nodes
           + {_DAMPING} * coalesce(sum(p.pr * e.w), 0) AS pr
  FROM nodes n CROSS JOIN nn
  LEFT JOIN edges e ON e.dst = n.node
  LEFT JOIN pr2 p ON p.node = e.src
  GROUP BY n.node, nn.n_nodes
)
SELECT node AS event_type, round(pr, 6) AS pagerank
FROM pr3
ORDER BY event_type
"""


@register("graph_pagerank_3iter", oracle=_PAGERANK_ORACLE, tags=("graph", "iterative"))
def graph_pagerank_3iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 unrolled iterations, damping 0.85) over the event-type
    transition graph. Each iteration is the canonical relational step:
    current ranks join the out-edge relation on src, contributions
    group-sum on dst, teleport added per node — so iteration count = #
    of (join + aggregate) rounds, the exact dataflow GraphX/Pregel run at
    billion-node scale. The edge build itself is one window (lag) + one
    partial-agg'd groupBy over events; edges and ranks are node/edge-
    cardinality relations from then on — event volume never re-enters.

    Float determinism: edge weights and teleport are single IEEE
    divisions (engine-identical); the per-dst contribution sums differ
    only in accumulation order (≤1e-15 relative), absorbed by the final
    round(…, 6)."""
    events = load_tables(spark, sf_dir)["events"]
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    raw_edges = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("src"), F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wsrc = Window.partitionBy("src")
    edges = raw_edges.select(
        "src",
        "dst",
        (
            F.col("n").cast("double")
            / F.sum("n").over(wsrc).cast("double")
        ).alias("w"),
    )
    nodes = events.select(F.col("event_type").alias("node")).distinct()
    nn = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))

    pr = nodes.crossJoin(F.broadcast(nn)).select(
        "node", (F.lit(1.0) / F.col("n_nodes")).alias("pr")
    )
    for _ in range(_N_ITER):
        contrib = (
            pr.join(edges, pr["node"] == edges["src"])
            .groupBy("dst")
            .agg(F.sum(F.col("pr") * F.col("w")).alias("c"))
        )
        pr = (
            nodes.crossJoin(F.broadcast(nn))
            .join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    (1 - _DAMPING) / F.col("n_nodes")
                    + _DAMPING * F.coalesce("c", F.lit(0.0))
                ).alias("pr"),
            )
        )
    return pr.select(
        F.col("node").alias("event_type"), F.round("pr", 6).alias("pagerank")
    ).orderBy("event_type")
