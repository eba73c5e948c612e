"""Distributed connected components — the transitive-closure engine
behind near-duplicate clustering (north-star B19).

Alternating large-star / small-star rounds (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14): each round is two
shuffles (adjacency group + edge rewrite) and the edge set contracts
toward star graphs rooted at each component's minimum id. Round count
is O(log n) even on adversarial long chains, where naive min-label
propagation needs O(diameter) supersteps. The driver loop inspects one
scalar per round (a checksum of the edge multiset) — no data collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _adjacency(edges: DataFrame) -> DataFrame:
    return edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def _min_label(adj: DataFrame) -> DataFrame:
    """m(u) = min over {u} ∪ N(u)."""
    return adj.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m")
    )


def _large_star(edges: DataFrame) -> DataFrame:
    # No distinct here: duplicate edges cannot change any min-label
    # (min is duplicate-insensitive), and the round's closing
    # _small_star dedupes once — one shuffle per round instead of two.
    adj = _adjacency(edges)
    m = _min_label(adj)
    return (
        adj.filter(F.col("dst") > F.col("src"))
        .join(m, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    adj = _adjacency(edges)
    m = _min_label(adj)
    lesser = (
        adj.filter(F.col("dst") <= F.col("src"))
        .join(m, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    self_edge = m.select(F.col("src"), F.col("m").alias("dst"))
    return (
        lesser.union(self_edge)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame, max_rounds: int = 30
) -> tuple[DataFrame, int]:
    """(node, component) for an undirected pair list (d1, d2), where
    component = the minimum node id reachable. Returns the label
    DataFrame and the number of alternation rounds used. Nodes appear
    iff they appear in some pair (callers union isolated nodes with
    label=self if needed)."""
    edges = (
        pairs.select(
            F.col(pairs.columns[0]).alias("src"),
            F.col(pairs.columns[1]).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    prev = None
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        # localCheckpoint truncates the logical plan each round —
        # without it the lineage (≈8 self-references per round)
        # compounds geometrically and analysis time explodes by round 3
        # lazy checkpoint: the checksum action below is what
        # materializes it, so each round is ONE job (an eager
        # checkpoint would spend a second job per round just to
        # persist before the same data is re-read for the checksum)
        new_edges = _small_star(_large_star(edges)).localCheckpoint(eager=False)
        # order-insensitive checksum of the edge multiset; equal
        # checksum+count for an only-contracting edge set ⇒ fixpoint
        chk = new_edges.agg(
            F.count("*").alias("n"),
            F.sum(F.col("src") + F.col("dst")).alias("s"),
        ).first()
        edges = new_edges
        if prev == (chk["n"], chk["s"]):
            break
        prev = (chk["n"], chk["s"])
    # post-fixpoint the graph is a union of stars rooted at each
    # component's min — every node's label is min(self, neighbors)
    labels = _min_label(_adjacency(edges)).select(
        F.col("src").alias("node"), F.col("m").alias("component")
    )
    return labels, rounds
