"""Connected components over edge tables — the cluster step of near-dup dedup.

MinHash/SimHash/embedding dedup produce *pairs* (id_a, id_b); an actual
deduplicated corpus needs the transitive closure of those pairs so each
near-dup *cluster* keeps exactly one canonical document.  This module
computes components with the alternating large-star / small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14),
which converges in O(log^2 n) rounds regardless of component diameter —
unlike naive label propagation, whose round count is the graph diameter
(a 10^6-long redirect chain would take 10^6 rounds).

Scale shape: each half-round is ONE hash-aggregate (per-node neighborhood
min — map-side combined, never a collect_list of the neighborhood) plus ONE
equi-join back to the edge table, so a mega-node's neighborhood stays
distributed across tasks; the convergence check is a single count.  Edge
tables are checkpointed every round to truncate the iterative lineage.
Node ids are any orderable type (string doc ids work; min = lexicographic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Attach every neighbor v > u to m = min(N(u) ∪ {u}).

    Handles high-degree nodes: emitted edges fan the neighborhood out to
    the component minimum instead of chaining through the hub.
    """
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("_mn"))
    mins = mins.select("u", F.least("u", "_mn").alias("_m"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("_m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Within each node's smaller-neighbor set, point everything at the min."""
    directed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = directed.groupBy("u").agg(F.min("v").alias("_m"))
    return (
        directed.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("_m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .union(mins.select(F.col("u"), F.col("_m").alias("v")))
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_rounds: int = 50,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``; ``component``
    is the minimum node id of its component (deterministic label).

    Converged when a large-star + small-star round leaves the edge set
    unchanged — at that point the edges ARE a star forest (node → root).
    ``max_rounds`` is a safety rail far above the O(log^2 n) bound (50
    rounds covers n ≈ 2^(sqrt 50·log2 e) ≫ 10^10); hitting it raises.
    """
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if not edges.take(1):
        return edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
    for _ in range(max_rounds):
        nxt = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        # Star forest ⟺ fixed point of the round.  Both sets are distinct,
        # so "same count + nxt ⊆ edges" ⟺ equality; one anti-join count
        # checks both cheaply (edge keys only, no payloads).
        if (
            nxt.count() == edges.count()
            and not nxt.join(edges, ["u", "v"], "left_anti").take(1)
        ):
            edges = nxt
            break
        edges = nxt
    else:
        raise RuntimeError(f"connected_components: no fixed point in {max_rounds} rounds")
    roots = (
        edges.select(F.col("v").alias("node"))
        .distinct()
        .join(edges.select(F.col("u").alias("node")).distinct(), "node", "left_anti")
    )
    return edges.select(F.col("u").alias("node"), F.col("v").alias("component")).union(
        roots.select("node", F.col("node").alias("component"))
    )
