"""Transitive clustering — large-star/small-star connected components.

Absent from the reference (its pipeline stops at pairwise decisions,
/root/reference/matcher.py:156-160); required by BASELINE.json north_rule.
Algorithm: Kiveris et al., "Connected Components in MapReduce and Beyond"
(SoCC'14) — alternate large-star and small-star rounds until the edge set is
stable; converges in O(log² n) rounds (O(log n) in practice), each round two
shuffles (groupBy min + distinct). DataFrame-only; per-round
localCheckpoint() cuts lineage so plans don't grow across iterations —
at cluster scale this would be a persisted table per round (resume point).

  large-star(u): m = min({u} ∪ Γ(u)); emit (v, m) for v ∈ Γ(u), v > u
  small-star(u): N = {v ∈ Γ(u) : v < u}; m = min(N ∪ {u});
                 emit (v, m) for v ∈ N ∪ {u}, v ≠ m

On convergence every edge points node → component-min; singletons are added
back with cluster_id = self.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """edges must be the symmetric neighbor list (u, v), u != v."""
    mins = edges.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        edges.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """edges oriented (u, v) with v < u (from large-star output)."""
    nbrs = edges.where(F.col("v") < F.col("u"))
    mins = nbrs.groupBy("u").agg(F.min("v").alias("m"))
    emit_n = (
        nbrs.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    emit_self = mins.select(F.col("u"), F.col("m").alias("v"))
    return (
        emit_n.unionByName(emit_self)
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    left_col: str = "left_id",
    right_col: str = "right_id",
    max_iter: int = 50,
) -> DataFrame:
    """(left_id, right_id) match edges → (conv_id, cluster_id) with
    cluster_id = min node id of the component. Nodes appearing only as
    singletons must be unioned in by the caller (see assign_clusters)."""
    e = pairs.select(
        F.col(left_col).alias("u"), F.col(right_col).alias("v")
    ).where(F.col("u") != F.col("v"))
    # symmetric closure for the first large-star
    edges = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    edges = edges.localCheckpoint(eager=True)

    prev_sig = None
    for _ in range(max_iter):
        ls = _large_star(edges)
        # large-star emits (bigger → min); symmetrize for neighbor-list view
        sym = ls.unionByName(
            ls.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct()
        ss = _small_star(sym)
        edges = ss.unionByName(
            ss.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct()
        edges = edges.localCheckpoint(eager=True)
        sig_row = edges.select(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("u", "v")).alias("h"),  # overflow-free under ANSI
        ).collect()[0]
        sig = (sig_row["n"], sig_row["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    # stable state: every node's min neighbor is its component representative
    comp = edges.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("cluster_id"))
    return comp.select(F.col("u").alias("conv_id"), "cluster_id")


def assign_clusters(all_ids: DataFrame, pairs: DataFrame, id_col: str = "conv_id") -> DataFrame:
    """Full assignment: matched components + singletons as their own cluster."""
    comp = connected_components(pairs)
    return (
        all_ids.select(F.col(id_col).alias("conv_id"))
        .distinct()
        .join(comp, "conv_id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", "conv_id"))
    )
