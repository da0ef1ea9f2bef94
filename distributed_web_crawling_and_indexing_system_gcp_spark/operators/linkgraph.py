"""Link-graph analytics over the crawl's URL/document graph.

The reference system stores per-page ``extracted_links`` (GCS JSON written
by /root/reference/src/crawler/crawler_node.py:317-335) but never analyses
the induced graph.  Any production crawl at frontier scale needs exactly
these graph queries — ranking pages for recrawl priority (PageRank),
collapsing mirror clusters before indexing (connected components), and
spam/community signals (triangle counting) — so they are first-class
operators here, each expressed as DataFrame joins/aggregations that
Catalyst plans as ordinary shuffle joins.

Scale notes (100 TB / 10^10-edge frontier):

- ``pagerank`` is the classic iterative join: each iteration is one
  (edges ⋈ ranks) shuffle on ``src`` plus one ``groupBy(dst)`` partial
  aggregation — the same dataflow GraphX's Pregel emits, minus vertex
  mirroring.  Lineage is truncated every iteration with
  ``localCheckpoint`` so the plan does not grow linearly with iteration
  count (the classic iterative-Spark failure mode).  Dangling mass is not
  redistributed (same contract as the canonical Spark PageRank example);
  callers at scale should pre-filter to the fetched subgraph where every
  node has out-links, or accept the (1-d)/N floor semantics.
- ``connected_components`` is min-label propagation: rounds of
  neighbour-min until a fixpoint, each round one shuffle.  Rounds needed =
  graph diameter; web graphs are short-diameter so this is bounded in
  practice.  For adversarial long-path graphs switch to the
  large-star/small-star algorithm (Kiveris et al., "Connected Components
  in MapReduce and Beyond", SoCC'14) which converges in O(log n) rounds —
  the per-round dataflow here is the building block either way.
- ``triangle_count`` orients edges low→high and counts closed wedges with
  two self-joins — the standard MapReduce triangle enumeration; skew on
  high-degree hubs is bounded by the orientation (each triangle counted
  once from its lowest vertex).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def graph_nodes(edges: DataFrame) -> DataFrame:
    """Distinct node set of an edge list — union of both endpoints."""
    return (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed ``(src, dst)`` edge list.

    Returns ``(node, rank)``.  Initial rank 1/N; each iteration
    ``rank'(v) = (1-d)/N + d * Σ_{u→v} rank(u)/out_deg(u)``.

    Deterministic given a deterministic edge list, so oracle-checkable by
    unrolling the same iterations as SQL CTEs (see __spark_entry__).
    """
    nodes = graph_nodes(edges)
    # one scalar count on the node dimension (driver-side, same as GraphX);
    # everything else stays distributed
    n = nodes.count()
    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contribs = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .join(out_deg, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("out_deg")).alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("inflow"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
            # truncate lineage so the logical plan stays O(1) per iteration
            .localCheckpoint(eager=False)
        )
    return ranks


def connected_components(
    edges: DataFrame, max_iterations: int = 25
) -> DataFrame:
    """Connected components of the UNDIRECTED graph under ``(src, dst)``.

    Min-label propagation to a fixpoint: every node's component is the
    smallest node id reachable from it.  Returns ``(node, component)``.

    Each round is one join + one groupBy shuffle; rounds = diameter.
    ``max_iterations`` is a safety bound — convergence is detected by an
    exact changed-row check (an action per round, on the node dimension
    only, never on the edge list).
    """
    und = (
        edges.select("src", "dst")
        .unionByName(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = graph_nodes(und).withColumn("component", F.col("node"))
    labels = labels.localCheckpoint(eager=False)
    for _ in range(max_iterations):
        neigh = und.join(labels, und["src"] == labels["node"]).select(
            F.col("dst").alias("node"), F.col("component")
        )
        new_labels = (
            labels.unionByName(neigh)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def triangle_count(edges: DataFrame) -> DataFrame:
    """Total triangle count of the undirected simple graph over ``edges``.

    Orients each undirected edge low→high, then counts paths a<b<c with
    (a,b), (b,c), (a,c) all present — each triangle exactly once.  Returns
    a single row ``(n_triangles)``.
    """
    und = (
        edges.select("src", "dst")
        .unionByName(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    e1 = und.select(F.col("a"), F.col("b"))
    e2 = und.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = und.select(F.col("a").alias("ta"), F.col("b").alias("c2"))
    wedges = e1.join(e2, "b")
    tri = wedges.join(
        e3, (wedges["a"] == e3["ta"]) & (wedges["c"] == e3["c2"])
    )
    return tri.agg(F.count("*").alias("n_triangles"))


__all__ = [
    "graph_nodes",
    "pagerank",
    "connected_components",
    "triangle_count",
]
