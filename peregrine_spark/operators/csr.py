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

# Whole-adjacency broadcast bound, shared by every frontier-intersection
# plan (triangles, cliques, cycle4): Σ out-run lengths = |E| ids ≈ 160 MB
# raw at the cap — the same order as orient()'s ≤20M-VERTEX degree-table
# broadcast (graph.py), but measured in edges because the adjacency
# payload is one id per oriented edge. Below it, adjacency attaches via
# map-side broadcast joins (zero array-carrying shuffles and no hub
# detection needed); above it, plans fall back to hub-split shuffle
# joins.
BROADCAST_MAX_EDGES = 20_000_000


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
    broadcast_max_edges: int | None = None,
) -> tuple[DataFrame, DataFrame, list[int]]:
    """(fwd, adj, hubs): the degree-ordered DAG, its forward-adjacency
    arrays, and the driver-side list of skewed dst keys. The shared
    set-up for every frontier-intersection plan (triangles, cliques,
    cycle4).

    Canonicalizes and computes degrees ONCE, shared between the
    orientation and the broadcast decision — callers that already know
    |V| pass n_vertices and skip the deg.count() job entirely. Pass a
    `caches` list to receive the internally cached DataFrames (can, deg,
    fwd) for unpersisting once the caller's action has run.

    broadcast_max_edges: callers that take a whole-adjacency BROADCAST
    route when |E| ≤ the bound pass it here; when the graph is under the
    bound, hub detection is skipped entirely (hubs = []) — the hub list
    only serves shuffle-join fallbacks, and its groupBy + collect is a
    full extra pass over the DAG (guide §1.2). Such callers must gate
    their plan on len(hubs)-independent logic: use
    `_oriented_adjacency` below to get the decision."""
    fwd, adj, hubs, _, _, _, _ = _oriented_adjacency(
        edges, n_vertices, caches, broadcast_max_edges
    )
    return fwd, adj, hubs


def _oriented_adjacency(
    edges: DataFrame,
    n_vertices: int | None = None,
    caches: list[DataFrame] | None = None,
    broadcast_max_edges: int | None = None,
) -> tuple[DataFrame, DataFrame, list[int], int, bool, DataFrame, DataFrame]:
    """(fwd, adj, hubs, n_edges, small, deg, can) — see
    oriented_adjacency_context; deg is the cached (id, deg) table (also
    appended to `caches`) so callers can read degree stats without
    another shuffle, and can the cached canonical edge set (fwd and adj
    are LAZY — a caller whose plan never references them, like cycle4's
    orientation-free route 1, never pays the orient joins at all)."""
    from peregrine_spark.operators.graph import canonical
    from peregrine_spark.operators.groups import live_context_for
    from peregrine_spark.operators.skew import auto_hub_threshold, hub_keys

    own_can_deg = True
    ctx = live_context_for(edges)
    if ctx is not None:
        # a live GroupCountContext on EXACTLY this DataFrame (e.g. a
        # catalog gate's clique class running right after the fused
        # group action on one cached subgraph): its undirected closure
        # IS can ∪ reversed(can), its degree table and stats are the
        # same quantities — reuse them instead of re-running the
        # canonical distinct, the degree groupBy and the stats agg.
        # The views stay owned by the context (not appended to caches).
        can = ctx.und.filter(F.col("src") < F.col("dst"))
        deg = ctx.deg.select(
            F.col("src").alias("id"), F.col("_deg").alias("deg")
        )
        if n_vertices is None:
            n_vertices = ctx.n_vertices
        n_edges = ctx.n_und // 2
        own_can_deg = False
    else:
        can = canonical(edges).cache()
        ends = can.select(F.col("src").alias("id")).union(
            can.select(F.col("dst").alias("id"))
        )
        deg = ends.groupBy("id").agg(F.count(F.lit(1)).alias("deg")).cache()
        # ONE deg-side action gives |V| AND |E| (Σ deg = 2|E| over the
        # canonical closure) and materializes the can/deg caches — the
        # old fwd.count() pass (a second setup job that also paid the
        # orient join up front) is gone; fwd materializes into its
        # cache inside the caller's first real job (guide §1.2)
        row = deg.agg(
            F.count(F.lit(1)).alias("nv"),
            F.coalesce(F.sum("deg"), F.lit(0)).alias("sd"),
        ).first()
        if n_vertices is None:
            n_vertices = int(row["nv"])
        n_edges = int(row["sd"]) // 2
    fwd = (
        orient(can, deg=deg, n_vertices=n_vertices, assume_canonical=True)
        .select("src", "dst")
        .cache()
    )
    adj = adjacency(fwd)
    small = broadcast_max_edges is not None and n_edges <= broadcast_max_edges
    # hub keys exist only to route shuffle-join fallbacks; on the
    # broadcast route they are dead weight — skip the detection pass
    hubs = (
        [] if small else hub_keys(fwd, "dst", auto_hub_threshold(n_edges))
    )
    if caches is not None:
        caches += [can, deg, fwd] if own_can_deg else [fwd]
    return fwd, adj, hubs, n_edges, small, deg, can


def _edge_adjacency_pairs(
    edges: DataFrame, caches: list[DataFrame] | None = None
) -> DataFrame:
    """Per oriented edge (u,v): both endpoints' forward adjacency runs.

    When the whole adjacency broadcasts (|E| ≤ BROADCAST_MAX_EDGES), both
    attachments are map-side broadcast hash joins — the |E| rows carrying
    ~O(sqrt E)-element arrays never cross an exchange (guide §2.4: a
    broadcast join replaces the shuffle of the large side; round-6
    profile: the two array-carrying shuffles were most of triangle_count
    wall at sf0.1).

    Fallback above the bound: the src join is skew-safe (oriented
    out-degree ≤ O(sqrt E)); the dst join is NOT — a mega-hub's in-degree
    can approach |E|, pinning one task — so hub dsts take the broadcast
    path (their adjacency runs are tiny: a high-degree vertex has few
    higher-degree neighbours)."""
    from peregrine_spark.operators.skew import hub_split_join

    fwd, adj, hubs, _, small, _, _ = _oriented_adjacency(
        edges, caches=caches, broadcast_max_edges=BROADCAST_MAX_EDGES
    )
    if small and caches is not None:
        # both broadcast builds read the SAME adjacency groupBy; cache
        # it so the second build reuses the first's result instead of
        # recomputing it (no extra job: the first build materializes
        # the cache as a side effect; runtime broadcast-exchange reuse
        # is not guaranteed across the differently-aliased builds)
        adj = adj.cache()
        caches.append(adj)
    a_u = adj.select(F.col("id").alias("src"), F.col("adj").alias("adj_u"))
    a_v = adj.select(F.col("id").alias("dst"), F.col("adj").alias("adj_v"))
    if small:
        return fwd.join(F.broadcast(a_u), "src").join(F.broadcast(a_v), "dst")
    with_u = fwd.join(a_u, "src")
    return hub_split_join(with_u, a_v, "dst", hubs)


def _triangle_count_df(
    edges: DataFrame, caches: list[DataFrame] | None = None
) -> DataFrame:
    """Lazy single-row triangle-count plan (bench_extra dumps this for
    the .explain evidence; triangles_via_adjacency is its eager form)."""
    pairs = _edge_adjacency_pairs(edges, caches=caches)
    return pairs.select(
        F.size(F.array_intersect("adj_u", "adj_v")).alias("c")
    ).agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_triangles"))


def triangles_via_adjacency(edges: DataFrame) -> DataFrame:
    """Triangle count via JVM array_intersect — single-row (n_triangles).
    EAGER: runs the aggregation and drops the context caches (the lazy
    form leaked can/deg/fwd per call for the session lifetime)."""
    _caches: list[DataFrame] = []
    row = _triangle_count_df(edges, caches=_caches).first()
    for df in _caches:
        df.unpersist()
    return edges.sparkSession.createDataFrame(
        [(int(row["n_triangles"]),)], "n_triangles long"
    )


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
