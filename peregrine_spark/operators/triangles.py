"""Exact triangle counting — the canonical Peregrine pattern, Spark-first.

The reference counts triangles by degree-desc renumbering + the symmetry
condition u<v<w + sorted-adjacency intersection
(/root/reference/core/Graph.hh:1062-1073, core/PatternMatching.hh:1116-1217).
The Spark restatement: degree-ordered orientation turns the graph into a
DAG with O(sqrt(E)) out-degrees; triangles = oriented wedges (u→v, u→w with
v ≺ w in the (deg,id) order) that close with an oriented edge v→w.

Physical plan: two shuffles (wedge self-join on src, closing join on
(v, w)), each a plain equi-join Catalyst can hash/sort-merge and AQE can
skew-split — no Python, no materialized match list (the count aggregates
map-side, like the reference's Counter never materializing matches,
core/PatternMatching.hh:1413).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from peregrine_spark.operators.graph import orient


def oriented_wedges(fwd: DataFrame) -> DataFrame:
    """(u, v, w) with oriented edges u→v and u→w and v ≺ w in (deg, id)
    order. The carried ddeg columns supply ≺ without another join."""
    a = fwd.select(
        F.col("src").alias("u"), F.col("dst").alias("v"), F.col("ddeg").alias("_vd")
    )
    b = fwd.select(
        F.col("src").alias("u"), F.col("dst").alias("w"), F.col("ddeg").alias("_wd")
    )
    return (
        a.join(b, "u")
        .filter(
            (F.col("_vd") < F.col("_wd"))
            | ((F.col("_vd") == F.col("_wd")) & (F.col("v") < F.col("w")))
        )
        .select("u", "v", "w")
    )


def triangles_wedge(edges: DataFrame) -> DataFrame:
    """Wedge-join triangle enumeration: (u, v, w), each exactly once,
    u ≺ v ≺ w in (deg, id) order. Kept as the reference plan; on dense
    graphs the adjacency edge-iterator below is ~3× faster because it
    never materializes the wedge set through a shuffle."""
    fwd = orient(edges)
    wedges = oriented_wedges(fwd)
    closing = fwd.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    return wedges.join(closing, ["v", "w"], "left_semi").select("u", "v", "w")


def triangles(edges: DataFrame) -> DataFrame:
    """All triangles (u, v, w), each exactly once, u ≺ v ≺ w in (deg, id)
    order — via per-edge sorted-adjacency intersection (the direct analog
    of the reference's set_intersection core, core/PatternMatching.hh:1116):
    pack forward-adjacency arrays, then for each oriented base edge (u,v)
    emit N+(u) ∩ N+(v). Intermediates stay bounded by true triangle
    output size instead of wedge count."""
    from peregrine_spark.operators.csr import _edge_adjacency_pairs

    pairs = _edge_adjacency_pairs(edges)
    return pairs.select(
        F.col("src").alias("u"),
        F.col("dst").alias("v"),
        F.explode(F.array_intersect("adj_u", "adj_v")).alias("w"),
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Single-row DataFrame (n_triangles: long). Adjacency edge-iterator
    plan: sum of |N+(u) ∩ N+(v)| over oriented edges — no explode, the
    count never materializes."""
    from peregrine_spark.operators.csr import triangles_via_adjacency

    return triangles_via_adjacency(edges)


def triangles_per_vertex(edges: DataFrame) -> DataFrame:
    """(id, n_tri): number of triangles each vertex participates in.
    Vertices in no triangle are absent (join with vertices+coalesce(0)
    if a dense vector is needed)."""
    t = triangles(edges)
    ends = (
        t.select(F.col("u").alias("id"))
        .union(t.select(F.col("v").alias("id")))
        .union(t.select(F.col("w").alias("id")))
    )
    return ends.groupBy("id").agg(F.count(F.lit(1)).alias("n_tri"))
