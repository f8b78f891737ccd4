"""Connected components over the near-dup pair graph (SURVEY §2
training-data dedup family; used by queries.q_dedup_clusters).

Two interchangeable algorithms, both pure DataFrame equi-joins
(JVM-side, one shuffle per round, no per-row Python):

* :func:`cc_label_propagation` — min-label propagation. One join +
  groupBy per round; rounds = component diameter. Near-dup components
  are near-cliques (every member shares most content with every
  other), so diameter is tiny and this is the cheapest path — the
  default in q_dedup_clusters.

* :func:`cc_alternating_stars` — the large-star/small-star algorithm
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC 2014 — public paper). Converges in O(log n) rounds on ANY
  graph, including adversarial long chains where propagation needs
  O(n) rounds; each round is two groupBy/join passes over the edge
  set, and the edge set SHRINKS toward a star per component. This is
  the 100 TB production path when the pair graph's shape is unknown.

Both return (doc_id, cluster) with cluster = min node id of the
component — byte-identical outputs (property-tested against each
other and the DuckDB recursive-CTE transitive closure).

Driver-side count() per round is loop termination only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sym(edges: DataFrame) -> DataFrame:
    """Symmetrize an (a, b) edge list."""
    return edges.select("a", "b").unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )


def cc_label_propagation(edges: DataFrame, max_rounds: int = 50) -> DataFrame:
    """Min-label propagation: every round each vertex takes the min
    label among itself and its neighbors. Rounds = diameter."""
    sym = _sym(edges).localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("a").alias("doc_id"))
        .distinct()
        .withColumn("cluster", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["doc_id"])
            .groupBy("a")
            .agg(F.min("cluster").alias("nbr_cluster"))
        )
        new_labels = (
            labels.join(nbr_min, labels["doc_id"] == nbr_min["a"], "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster"),
                    F.coalesce(F.col("nbr_cluster"), F.col("cluster")),
                ).alias("cluster"),
            )
            .localCheckpoint(eager=True)  # truncate per-round lineage
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.cluster") != F.col("o.cluster"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to u's local min
    m(u) = min({u} ∪ N(u)). Cuts long chains in half each round."""
    nbrs = _sym(edges)
    mins = (
        nbrs.groupBy("a")
        .agg(F.min("b").alias("_mb"))
        .select("a", F.least("a", "_mb").alias("m"))
    )
    return (
        nbrs.join(mins, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges large→small; connect each smaller neighbor (and u
    itself) of u to m(u) = min of u's smaller neighborhood."""
    directed = (
        _sym(edges)
        .filter(F.col("b") <= F.col("a"))  # keep (larger, smaller)
        .distinct()
    )
    mins = directed.groupBy("a").agg(F.min("b").alias("m"))
    joined = directed.join(mins, "a")
    to_min = joined.select(
        F.col("b").alias("a"), F.col("m").alias("b")
    ).unionByName(joined.select("a", F.col("m").alias("b")))
    return to_min.filter(F.col("a") != F.col("b")).distinct()


def cc_alternating_stars(edges: DataFrame, max_rounds: int = 30) -> DataFrame:
    """Alternate large-star / small-star until the edge set is a fixed
    point (a forest of stars: every node points at its component min).
    O(log n) rounds on any graph shape."""
    singletons = (
        _sym(edges)
        .select(F.col("a").alias("doc_id"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    cur = edges.select("a", "b").distinct().localCheckpoint(eager=True)
    for _ in range(max_rounds):
        nxt = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        delta = (
            nxt.join(cur, ["a", "b"], "left_anti").count()
            + cur.join(nxt, ["a", "b"], "left_anti").count()
        )
        cur = nxt
        if delta == 0:
            break
    # at the fixed point every edge is (member, component_min)
    stars = cur.select(F.col("a").alias("doc_id"), F.col("b").alias("cluster"))
    return (
        singletons.join(stars, "doc_id", "left")
        .select(
            "doc_id", F.coalesce(F.col("cluster"), F.col("doc_id")).alias("cluster")
        )
    )
