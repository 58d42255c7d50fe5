"""CSR-packed adjacency + Arrow intersection kernels.

The reference's physical core is ordered-set algebra over sorted uint32
adjacency runs (std::set_intersection at
/root/reference/core/PatternMatching.hh:1116-1217). Spark-first we express
the same dataflow two ways:

1. triangles_via_adjacency — pure JVM: pack per-vertex sorted adjacency
   arrays (groupBy + sort_array(collect_list)), then per oriented edge
   (u,v) count |N+(u) ∩ N+(v)| with array_intersect inside whole-stage
   codegen. The "edge-iterator" triangle algorithm; zero Python.

2. triangles_csr_arrow — the same plan, but the intersection runs in a
   vectorized numpy kernel over Arrow batches (mapInArrow). Inside each
   batch the list column IS a CSR run (offsets + values) — this is the
   per-partition CSR-packed Arrow buffer path the north rule names, and
   the template for custom kernels Spark built-ins can't express.

Both bound intermediate size by out-degree of the ORIENTED DAG
(O(sqrt E)), exactly like the reference's symmetry-broken candidate sets.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from peregrine_spark.operators.graph import orient


def adjacency(fwd: DataFrame, src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """(id, adj): sorted forward-adjacency array per source vertex — the
    per-vertex CSR run (adjlist, /root/reference/core/DataGraph.hh:26-32)."""
    return fwd.groupBy(F.col(src_col).alias("id")).agg(
        F.sort_array(F.collect_list(dst_col)).alias("adj")
    )


def oriented_adjacency_context(
    edges: DataFrame,
    n_vertices: int | None = None,
    caches: list[DataFrame] | None = None,
) -> tuple[DataFrame, DataFrame, list[int]]:
    """(fwd, adj, hubs): the degree-ordered DAG, its forward-adjacency
    arrays, and the driver-side list of skewed dst keys. The shared
    set-up for every frontier-intersection plan (triangles, cliques).

    Canonicalizes and computes degrees ONCE, shared between the
    orientation and the broadcast decision — callers that already know
    |V| pass n_vertices and skip the deg.count() job entirely. Pass a
    `caches` list to receive the internally cached DataFrames (can, deg,
    fwd) for unpersisting once the caller's action has run."""
    from peregrine_spark.operators.graph import canonical
    from peregrine_spark.operators.skew import auto_hub_threshold, hub_keys

    can = canonical(edges).cache()
    ends = can.select(F.col("src").alias("id")).union(
        can.select(F.col("dst").alias("id"))
    )
    deg = ends.groupBy("id").agg(F.count(F.lit(1)).alias("deg")).cache()
    if n_vertices is None:
        n_vertices = deg.count()
    fwd = (
        orient(can, deg=deg, n_vertices=n_vertices, assume_canonical=True)
        .select("src", "dst")
        .cache()
    )
    adj = adjacency(fwd)
    hubs = hub_keys(fwd, "dst", auto_hub_threshold(fwd.count()))
    if caches is not None:
        caches += [can, deg, fwd]
    return fwd, adj, hubs


def _edge_adjacency_pairs(edges: DataFrame) -> DataFrame:
    """Per oriented edge (u,v): both endpoints' forward adjacency runs.

    The src join is skew-safe (oriented out-degree ≤ O(sqrt E)); the dst
    join is NOT — a mega-hub's in-degree can approach |E|, pinning one
    task — so hub dsts take the broadcast path (their adjacency runs are
    tiny: a high-degree vertex has few higher-degree neighbours)."""
    from peregrine_spark.operators.skew import hub_split_join

    fwd, adj, hubs = oriented_adjacency_context(edges)
    with_u = fwd.join(
        adj.select(F.col("id").alias("src"), F.col("adj").alias("adj_u")), "src"
    )
    return hub_split_join(
        with_u,
        adj.select(F.col("id").alias("dst"), F.col("adj").alias("adj_v")),
        "dst",
        hubs,
    )


def triangles_via_adjacency(edges: DataFrame) -> DataFrame:
    """Triangle count via JVM array_intersect — single-row (n_triangles)."""
    pairs = _edge_adjacency_pairs(edges)
    return pairs.select(
        F.size(F.array_intersect("adj_u", "adj_v")).alias("c")
    ).agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_triangles"))


def triangles_csr_arrow(edges: DataFrame) -> DataFrame:
    """Triangle count with the intersection in a numpy kernel over Arrow
    batches. Per batch: flatten both list columns to contiguous value
    buffers + offsets (CSR), intersect per edge with searchsorted —
    vectorized, no per-row Python function calls."""
    import numpy as np

    pairs = _edge_adjacency_pairs(edges).select("adj_u", "adj_v")

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        total = 0
        for batch in batches:
            au = batch.column(0)
            av = batch.column(1)
            # CSR view of the Arrow list arrays: (offsets, values)
            u_off = au.offsets.to_numpy(zero_copy_only=False)
            u_val = au.values.to_numpy(zero_copy_only=False)
            v_off = av.offsets.to_numpy(zero_copy_only=False)
            v_val = av.values.to_numpy(zero_copy_only=False)
            for i in range(len(batch)):
                a = u_val[u_off[i] : u_off[i + 1]]
                b = v_val[v_off[i] : v_off[i + 1]]
                if len(a) > len(b):
                    a, b = b, a
                if len(a) == 0:
                    continue
                # sorted-run membership: searchsorted == set_intersection
                idx = np.searchsorted(b, a)
                idx[idx == len(b)] = 0
                total += int((b[idx] == a).sum())
        yield pa.RecordBatch.from_pydict({"n": pa.array([total], pa.int64())})

    per_part = pairs.mapInArrow(kernel, "n long")
    return per_part.agg(F.sum("n").alias("n_triangles"))
