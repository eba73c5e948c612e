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


def _driver_union_find(spark, edges: DataFrame) -> DataFrame:
    """Exact CC over a COLLECTED edge list: union-find with path
    halving, parent = min of component (union attaches the larger root
    under the smaller, so every root is its component's minimum)."""
    rows = edges.collect()
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            parent[r] = parent[parent[r]]
            r = parent[r]
        return r

    for a, b in rows:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    labels = [(n, find(n)) for n in parent]
    node_t = edges.schema["src"].dataType
    from pyspark.sql.types import StructField, StructType

    return spark.createDataFrame(
        labels,
        StructType(
            [StructField("node", node_t), StructField("component", node_t)]
        ),
    )


def connected_components(
    pairs: DataFrame,
    max_rounds: int = 30,
    driver_threshold: int = 2_000_000,
) -> tuple[DataFrame, int]:
    """(node, component) for an undirected pair list (d1, d2), where
    component = the minimum node id reachable. Returns the label
    DataFrame and the number of alternation rounds used. Nodes appear
    iff they appear in some pair (callers union isolated nodes with
    label=self if needed).

    Adaptive strategy, same contract as a broadcast join: after the
    dedupe the edge count is known (one cheap count over the
    checkpointed RDD); at or under ``driver_threshold`` edges (~32 MB
    at 16 B/edge — broadcast-small) the transitive closure runs as
    driver-side union-find in O(n α(n)) and the answer returns in ONE
    collect + ONE createDataFrame, skipping the star rounds whose
    per-round multi-stage scheduling latency dominates at small n
    (measured 2.1 s for 2 rounds over 256 edges at sf0.1 vs ~0.2 s
    collected). Past the threshold — the 100 TB path, where the edge
    list can be billions — the alternating star rounds run unchanged;
    ``rounds`` reports 0 for the driver path. Tests pin BOTH paths to
    the same labels (tests/test_northstar.py)."""
    edges = (
        pairs.select(
            F.col(pairs.columns[0]).alias("src"),
            F.col(pairs.columns[1]).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    if edges.count() <= driver_threshold:
        return _driver_union_find(pairs.sparkSession, edges), 0
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
