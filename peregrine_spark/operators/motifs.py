"""Motif counting: all connected k-vertex patterns, edge- and
vertex-induced (the reference's count app + convert_counts rewrite,
/root/reference/core/Peregrine.hh:1054-1095,1025-1041).

Edge-induced counts come from the generic matcher (cheap — no
anti-edges); vertex-induced counts are recovered by back-substitution:
    v[i] = e[i] − Σ_{j denser} num_mappings(p_j, p_i) · v[j]
where num_mappings(p_j, p_i) is the number of edge-induced occurrences of
p_i inside the (tiny) pattern p_j — computed with the same brute-force
counter the test oracle uses, on a ≤5-vertex graph
(mirrors core/PatternMatching.hh:2149-2170).

Pattern catalogs for k ≤ 4 are enumerated inline; k = 5 comes from the
brute-force isomorphism-class enumeration (plans/generators.all_connected,
21 classes — the same catalog the reference decodes from graph6 files,
core/graphs/graph5c.g6). The conversion logic is k-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from peregrine_spark.operators.patterns import match_pattern
from peregrine_spark.plans.patterns import SmallGraph
from peregrine_spark.reference import pattern_count


def all_motifs(k: int) -> dict[str, SmallGraph]:
    """All connected unlabelled patterns on k vertices (k ≤ 8; the
    reference's integration tests count 4/5/6-motif catalogs from graph6
    files, core/integrationtests/Counting_test.hh:14-84, and ship
    catalogs to k=9 in core/graphs/ — here k ≤ 4 get stable human
    names, k ≥ 5 the enumerated catalogs m5_000.. / m8_0000..)."""
    if k == 3:
        return {"path3": SmallGraph.path(3), "triangle": SmallGraph.clique(3)}
    if k == 4:
        diamond = SmallGraph.from_text("1 2\n2 3\n1 3\n1 4\n3 4\n")  # chordal 4-cycle
        tailed = SmallGraph.from_text("1 2\n2 3\n1 3\n3 4\n")
        return {
            "path4": SmallGraph.path(4),
            "star4": SmallGraph.star(3),
            "cycle4": SmallGraph.cycle(4),
            "tailed_triangle": tailed,
            "diamond": diamond,
            "clique4": SmallGraph.clique(4),
        }
    if k in (5, 6, 7, 8, 9):
        from peregrine_spark.plans.generators import all_connected

        # 21 / 112 / 853 / 11,117 / 261,080 isomorphism classes
        cat = all_connected(k)
        width = {5: 3, 6: 3, 7: 3, 8: 4, 9: 6}[k]
        return {f"m{k}_{i:0{width}d}": g for i, g in enumerate(cat)}
    raise ValueError("motif catalogs implemented for k in {3, ..., 9}")


# Whole-adjacency broadcast bound: single source of truth in
# operators/csr.py (shared by triangles, cliques and cycle4; orient()'s
# ≤20M-VERTEX degree bound in graph.py is a separate statistic).
from peregrine_spark.operators.csr import BROADCAST_MAX_EDGES  # noqa: E402

# cycle4 route-1 packs a vertex pair into one signed 64-bit key
# (x · 2³² + y); ids must stay below 2³¹ for the product to stay
# positive under ANSI. Module-level so tests can force the fallback.
PACK_MAX_ID = 1 << 31

# route-1 wedge budget: total wedges Σ C(deg,2) is exactly the row count
# of the one packed-key shuffle (8 B/row ⇒ ~8 GB at the cap). A zipf
# mega-hub's Σ C(deg,2) is 10¹³⁺, so skewed graphs land on the
# intersect/hub-split routes just as the old orientation-based in-skew
# guard sent them (routing is a perf heuristic only — every route is
# exact and golden-tested).
WEDGE_ENUM_MAX = 1_000_000_000


def _as_complement_anti(pattern: SmallGraph) -> SmallGraph:
    """Vertex-induced form: add anti-edges for every non-edge."""
    g = SmallGraph(edges=list(pattern.edges))
    vs = pattern.vertices
    for i, u in enumerate(vs):
        for v in vs[i + 1 :]:
            if not pattern.has_edge(u, v):
                g.add_anti_edge(u, v)
    return g


def num_mappings(container: SmallGraph, contained: SmallGraph) -> int:
    """Edge-induced occurrences of `contained` inside the pattern graph
    `container` (both tiny) — the conversion matrix entry."""
    edges = [(u, v) for u, v in container.edges]
    return pattern_count(edges, contained)


def motif_counts(
    spark: SparkSession,
    edges: DataFrame,
    k: int,
    vertex_induced: bool = False,
) -> DataFrame:
    """(motif, count) for all connected k-vertex motifs. Edge-induced by
    default; vertex_induced=True applies the back-substitution rewrite
    (the conversion is driver-side arithmetic on the tiny count vector).

    Routing per class (the reference's special-case dispatch,
    core/Graph.hh:1024-1080 + the D2-D4 counters):
    - cliques → the oriented-DAG frontier intersection (clique_count);
    - everything with a non-trivial group plan → the generalized B5
      group counter (operators/groups.py) through match_pattern's auto
      policy, sharing ONE GroupCountContext so degrees/codegrees are
      computed once for the whole catalog — only minimum-vertex-cover
      cores are enumerated, groups are counted;
    - the residue (single non-core vertex with ≥3 core neighbours, e.g.
      near-cliques) → the generic join-chain matcher.
    All branches union into ONE action; degree_order stays off for the
    enumeration residue because per-pattern orientation would add a
    degree/orient exchange per class inside the shared job."""
    from functools import reduce

    from peregrine_spark.operators.patterns import clique_count

    cat = all_motifs(k)
    names = list(cat)
    # the union's branches cannot share uncached subplans — without this,
    # every chain re-derives the input edge table from its sources.
    # Only drop the cache at the end if WE created it (cache() on an
    # already-cached input is a no-op; unpersisting would silently kill
    # a caller's cache — round-5 advice).
    was_cached = edges.storageLevel.useMemory or edges.storageLevel.useDisk
    edges = edges.cache()

    e_counts: dict[str, int] = {}
    if k >= 5:
        # fused group counting: one enumerated core flow per core SHAPE
        # (5 shapes for k=5, 11 for k=6) instead of one join chain per
        # class — the per-class Spark overhead (planning + tiny stages)
        # otherwise dominates the whole catalog
        from peregrine_spark.operators.groups import (
            GroupCountContext,
            group_count_many,
        )

        from concurrent.futures import ThreadPoolExecutor

        ctx = GroupCountContext(edges)
        plannable: dict[str, SmallGraph] = {}
        residue: list[str] = []
        cliques: list[tuple[str, int]] = []
        for name in names:
            g = cat[name]
            nv = len(g.vertices)
            if len(g.edges) == nv * (nv - 1) // 2:
                cliques.append((name, nv))
            elif g.group_count_plan() is not None:
                plannable[name] = g
            else:
                residue.append(name)
        # clique classes run CONCURRENTLY with the fused group action
        # (independent jobs back-fill each other's straggler tails,
        # guide §2.6); results land in catalog order below
        with ThreadPoolExecutor(max_workers=max(1, len(cliques))) as pool:
            futs = [
                (name, pool.submit(
                    lambda nv=nv: clique_count(edges, nv).first()["n_cliques"]
                ))
                for name, nv in cliques
            ]
            e_counts.update(group_count_many(edges, plannable, ctx))
            for name in residue:  # none for k ≤ 6; kept for larger catalogs
                e_counts[name] = match_pattern(
                    edges, cat[name], degree_order=False, group_ctx=ctx
                ).first()["n_matches"]
            for name, f in futs:
                e_counts[name] = f.result()
        ctx.unpersist()
    else:
        counts_df = reduce(
            DataFrame.unionByName,
            [
                match_pattern(edges, cat[name], degree_order=False).select(
                    F.lit(name).alias("motif"), F.col("n_matches")
                )
                for name in names
            ],
        )
        e_counts = {r["motif"]: r["n_matches"] for r in counts_df.collect()}
    if not was_cached:  # every branch above is eager; drop OUR input cache
        edges.unpersist()
    if not vertex_induced:
        rows = [(n, e_counts[n]) for n in names]
        return spark.createDataFrame(rows, "motif string, count long")

    v_counts = _to_vertex_induced(cat, e_counts)
    rows = [(n, v_counts[n]) for n in names]
    return spark.createDataFrame(rows, "motif string, count long")


def _to_vertex_induced(
    cat: dict[str, SmallGraph], e_counts: dict[str, int]
) -> dict[str, int]:
    """Densest-first back-substitution (D5, core/Peregrine.hh:1025-1041):
    v[i] = e[i] − Σ_{j denser} num_mappings(p_j, p_i) · v[j]."""
    order = sorted(cat, key=lambda n: -len(cat[n].edges))
    v_counts: dict[str, int] = {}
    for i, name in enumerate(order):
        v = e_counts[name]
        for denser in order[:i]:
            v -= num_mappings(cat[denser], cat[name]) * v_counts[denser]
        v_counts[name] = v
    return v_counts


def cycle4_count(edges: DataFrame) -> DataFrame:
    """Exact 4-cycle count over the degree-ordered DAG — single row
    (n_cycles,). 2·C4 = Σ_{x<y} C(codeg(x,y), 2); instead of enumerating
    every wedge (Θ(Σ deg²) — the zipf mega-hub alone is ~10¹² rows), split
    each wedge x−c−y by the center's position in the degree-id total
    order η (the same orientation that bounds the triangle/clique paths,
    reference core/Graph.hh:1062-1073):

      A (c η-min):  enumerated via the oriented self-join on src —
                    Σ C(outdeg, 2) rows, outdeg = O(√E), hub outdeg ≈ 0
      B (c η-mid):  per DAG edge a→c, explode c's out-adjacency —
                    Σ indeg·outdeg rows; the hub's huge in-degree
                    multiplies its ≈0 out-degree, and hub dsts broadcast
      C (c η-max):  NEVER enumerated — for a pair (x, y) it equals
                    |out(x) ∩ out(y)| (array_intersect on the short
                    oriented runs), and pairs of C-wedges reduce back to
                    A-counts: Σ_{x<y} C(Cw, 2) = Σ_{c1<c2} C(A(c1,c2), 2)

    With codeg = AB + Cw:  2·C4 = Σ C(AB,2) + Σ AB·Cw + Σ C(A,2).

    Physical routing (round-6 rework; round-5/6 profiles in BENCH.md /
    OPTIMIZATION_r06.md): three routes, picked from one degree-stats
    pass.

    1. FULL WEDGE ENUMERATION (small unskewed graphs:
       |E| ≤ broadcast_max_edges, ids < 2³¹, total wedges Σ C(deg,2) ≤
       WEDGE_ENUM_MAX): A ∪ B ∪ C at a center is ALL unordered pairs of
       its neighbours, so one sorted full-neighbourhood run per vertex
       (built straight from the canonical set — no orientation) feeds a
       codegen posexplode + slice + explode that emits each packed
       64-bit pair key exactly once; one groupBy(count),
       2·C4 = Σ C(codeg, 2). The round-5 plan's C-term (two broadcast
       joins + an array_intersect per surviving pair — 66M intersects
       ≈ 13 s at sf0.1) disappears; the one shuffle carries one long
       per wedge. The wedge budget matters: a zipf mega-hub makes
       Σ C(deg,2) ~10¹³⁺, which is why wedges are otherwise never
       fully enumerated.
    2. BROADCAST + INTERSECT (small but in-skewed or huge ids): A/B
       wedges enumerated (hub in-degree × ≈0 out-degree stays bounded),
       C recovered per pair as |out(x) ∩ out(y)| via broadcast left
       joins, pairs of C-wedges via the Σ C(A,2) duality.
    3. HUB-SPLIT SHUFFLE (|E| above the broadcast bound): as 2 but with
       shuffle joins and hub splitting — the mega-hub's in-degree lives
       on the dst side of every one of those joins."""
    from peregrine_spark.operators.csr import _oriented_adjacency
    from peregrine_spark.operators.skew import hub_split_join

    _caches: list[DataFrame] = []
    fwd, adj, hubs, n_edges, small, deg, can = _oriented_adjacency(
        edges, caches=_caches, broadcast_max_edges=BROADCAST_MAX_EDGES
    )
    if small:
        # one aggregation over the CACHED degree table picks route 1 vs
        # 2 and validates the id packing — orientation-free (route 1
        # enumerates ALL neighbour pairs, so only the total wedge count
        # and the id bound matter; fwd/adj stay lazy and route 1 never
        # pays the orient joins at all)
        st = deg.agg(
            F.coalesce(
                F.sum(F.expr("cast(deg as bigint) * (deg - 1) DIV 2")),
                F.lit(0),
            ).alias("wedges"),
            F.max("id").alias("max_id"),
        ).first()
        full_enum = (
            st["max_id"] is not None
            and int(st["max_id"]) < PACK_MAX_ID
            and int(st["wedges"]) <= WEDGE_ENUM_MAX
        )
    else:
        full_enum = False
    if full_enum:
        sc = edges.sparkSession.sparkContext
        # The A/B/C split exists to AVOID enumerating hub wedges on
        # skewed graphs; under route 1's no-skew guard every wedge is
        # enumerable, and A ∪ B ∪ C at a center c is simply ALL
        # unordered pairs of distinct neighbours of c — so ONE shuffle
        # builds the full sorted neighbour run per vertex (no direction
        # flags, no conditional collect_lists) and one codegen
        # posexplode + slice + explode emits each pair exactly once.
        # The first cut of this route generated pairs with
        # transform/filter lambdas — higher-order array functions run
        # INTERPRETED per element (the minhash lesson), ~2× the wedge
        # count in expression-walk evaluations, and the union of two
        # generator branches recomputed the whole run-build subtree per
        # branch (no runtime exchange reuse across union branches).
        nbr = can.select("src", F.col("dst").alias("nb")).union(
            can.select(F.col("dst").alias("src"), F.col("src").alias("nb"))
        )
        runs = nbr.groupBy(F.col("src").alias("id")).agg(
            F.sort_array(F.collect_list("nb")).alias("adj")
        )
        # |V| rows feed a Σ C(deg,2)-row explode: round-robin them over
        # the cores FIRST or AQE coalesces the tiny input to a handful
        # of partitions and the generators run nearly serially
        # (measured: 91 s vs 13 s at sf0.1)
        runs = runs.repartition(sc.defaultParallelism * 4)
        P = 1 << 32
        # sorted runs: the slice after position i holds exactly the
        # y > x partners, so the packed key x·2³² + y is canonical
        pairs = (
            runs.select(F.posexplode("adj").alias("i", "x"), "adj")
            .select(
                F.col("x"),
                F.explode(
                    F.expr("slice(adj, i + 2, size(adj) - i - 1)")
                ).alias("y"),
            )
            .select(
                (F.col("x").cast("bigint") * F.lit(P) + F.col("y")).alias("k")
            )
        )
        # explicit repartition ON the key sized from the known wedge
        # count (8 bytes/row, ~16 MB target per task, floor at 2×cores):
        # the groupBy then needs no second exchange and no map-side
        # partial pass (121M wedges → 66M groups: partial agg reduced
        # almost nothing and built the hash tables twice)
        n_wedges = int(st["wedges"])
        n_agg = max(
            2 * sc.defaultParallelism, min(2048, n_wedges // 2_000_000)
        )
        row = (
            pairs.repartition(n_agg, "k")
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(
                F.expr(
                    "coalesce(sum(n * (n - 1) DIV 2), 0L) DIV 2"
                ).cast("long").alias("n_cycles")
            )
            .first()
        )
        for df in _caches:
            df.unpersist()
        return edges.sparkSession.createDataFrame(
            [(int(row["n_cycles"]),)], "n_cycles long"
        )
    adj = adj.cache()
    if small:
        # A-wedges map-side: all unordered pairs within each out-run
        aw = adj.select(
            F.explode(
                F.expr(
                    "flatten(transform(adj, (a, i) ->"
                    " transform(slice(adj, i + 2, size(adj) - i - 1),"
                    " b -> struct(least(a, b) as x, greatest(a, b) as y))))"
                )
            ).alias("p")
        ).select("p.x", "p.y", F.lit(1).alias("is_a"))
        bw_joined = fwd.join(
            F.broadcast(adj.select(F.col("id").alias("dst"), "adj")), "dst"
        )
    else:
        f1 = fwd.select(F.col("src").alias("c"), F.col("dst").alias("x"))
        f2 = fwd.select(F.col("src").alias("c"), F.col("dst").alias("y"))
        aw = (
            f1.join(f2, "c")
            .filter(F.col("x") < F.col("y"))
            .select("x", "y", F.lit(1).alias("is_a"))
        )
        bw_joined = hub_split_join(
            fwd, adj.select(F.col("id").alias("dst"), "adj"), "dst", hubs
        )
    bw = (
        bw_joined
        .select(F.col("src").alias("a"), F.explode("adj").alias("b"))
        .select(
            F.least("a", "b").alias("x"),
            F.greatest("a", "b").alias("y"),
            F.lit(0).alias("is_a"),
        )
    )
    pairs = (
        aw.unionByName(bw)
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("nab"), F.sum("is_a").alias("na"))
    )
    ax = adj.select(F.col("id").alias("x"), F.col("adj").alias("ax"))
    ay = adj.select(F.col("id").alias("y"), F.col("adj").alias("ay"))
    if small:
        # Cw attaches via broadcast LEFT joins (missing row ⇒ Cw = 0) so
        # all three terms fuse into one aggregation over the groupBy
        with_ay = pairs.join(F.broadcast(ax), "x", "left").join(
            F.broadcast(ay), "y", "left"
        )
        row = (
            with_ay.select(
                (
                    F.expr("nab * (nab - 1) DIV 2 + na * (na - 1) DIV 2")
                    + F.col("nab")
                    * F.when(
                        F.col("ax").isNotNull() & F.col("ay").isNotNull(),
                        F.size(F.array_intersect("ax", "ay")),
                    ).otherwise(F.lit(0))
                ).alias("v")
            )
            .agg(
                F.expr("coalesce(sum(v), 0L) DIV 2")
                .cast("long")
                .alias("n_cycles")
            )
            .first()
        )
        for df in [adj, *_caches]:
            df.unpersist()
    else:
        pairs = pairs.cache()
        t13 = pairs.agg(
            F.coalesce(
                F.sum(F.expr("nab * (nab - 1) DIV 2 + na * (na - 1) DIV 2")),
                F.lit(0).cast("long"),
            ).alias("s13")
        )
        # Cw only matters where AB > 0 (its pure pairs are the Σ C(A,2)
        # term); missing adjacency rows mean Cw = 0, so inner joins are
        # exact
        with_ax = hub_split_join(pairs, ax, "x", hubs)
        with_ay = hub_split_join(with_ax, ay, "y", hubs)
        t2 = with_ay.select(
            (F.col("nab") * F.size(F.array_intersect("ax", "ay"))).alias("v")
        ).agg(F.coalesce(F.sum("v"), F.lit(0).cast("long")).alias("s2"))
        # EAGER: run the two aggregations, then drop this plan's caches
        # (adj, pairs) — the lazy form leaked both for the session lifetime
        row = t13.crossJoin(t2).select(
            F.expr("(s13 + s2) DIV 2").cast("long").alias("n_cycles")
        ).first()
        for df in [adj, pairs, *_caches]:
            df.unpersist()
    return edges.sparkSession.createDataFrame(
        [(int(row["n_cycles"]),)], "n_cycles long"
    )


def motif_counts_k4(
    spark: SparkSession, edges: DataFrame, vertex_induced: bool = True
) -> DataFrame:
    """All six connected 4-vertex motif counts via closed-form counting —
    the reference's candidate-size / binomial / inclusion-exclusion
    shortcuts (D2-D4, core/PatternMatching.hh:1741-1857) generalized to
    the whole k=4 catalog. Never enumerates a 4-vertex occurrence: only
    degrees, the triangle list, per-edge/per-vertex triangle counts, pair
    codegrees, and the 4-clique frontier.

    Edge-induced identities (then D5 back-substitution when
    vertex_induced):
      star4    = Σ_v C(deg v, 3)
      path4    = Σ_{(u,v)∈E} (deg u − 1)(deg v − 1) − 3·triangles
      tailed   = Σ_v t_v · (deg v − 2)
      diamond  = Σ_e C(t_e, 2)        (pairs of triangles sharing an edge)
      cycle4   = ½ Σ_{u<v} C(codeg(u,v), 2)
      clique4  = oriented-DAG frontier count

    At 100 TB every term is one shuffle on a graph key; the cycle4 term
    runs over the degree-ordered DAG (see cycle4_count — Σ outdeg² plus
    Σ indeg·outdeg rows, hub-split, never the unoriented Σ deg² wedge
    fan-out a zipf mega-hub turns into ~10¹² rows in one key); this
    replaces the Θ(Σ deg³)-row generic join chain that path4/star4 would
    otherwise cost."""
    from concurrent.futures import ThreadPoolExecutor

    from peregrine_spark.operators.graph import canonical, degrees
    from peregrine_spark.operators.patterns import clique_count
    from peregrine_spark.operators.triangles import triangles

    can = canonical(edges).cache()
    deg = degrees(can).cache()
    tri = triangles(can).cache()
    # materialize the three shared caches up front (one action each, in
    # dependency order) so the concurrent terms below never race to fill
    # the same cache
    deg.count()
    n_tri = tri.count()

    def term_star4() -> int:
        # stars: reuse the exact-binomial single-value aggregator
        return int(star_count(can, 3).collect()[0]["n_matches"])

    def term_mid() -> int:
        # middle-edge extension counts
        dsrc = deg.select(F.col("id").alias("src"), F.col("deg").alias("_du"))
        ddst = deg.select(F.col("id").alias("dst"), F.col("deg").alias("_dv"))
        return int(
            can.join(F.broadcast(dsrc), "src")
            .join(F.broadcast(ddst), "dst")
            .agg(
                F.sum(
                    (F.col("_du") - 1).cast("long") * (F.col("_dv") - 1)
                ).alias("s")
            )
            .collect()[0]["s"]
            or 0
        )

    def term_tailed() -> int:
        # per-vertex triangle participation → tailed triangles
        ends = (
            tri.select(F.col("u").alias("id"))
            .union(tri.select(F.col("v").alias("id")))
            .union(tri.select(F.col("w").alias("id")))
        )
        t_v = ends.groupBy("id").agg(F.count(F.lit(1)).alias("t"))
        return int(
            t_v.join(F.broadcast(deg), "id")
            .agg(F.sum(F.col("t") * (F.col("deg") - 2)).alias("s"))
            .collect()[0]["s"]
            or 0
        )

    def term_diamond() -> int:
        # per-edge triangle counts → diamonds (triangle pairs per edge)
        tri_edges = tri.select(
            F.explode(
                F.array(
                    F.struct(F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")),
                    F.struct(F.least("u", "w").alias("a"), F.greatest("u", "w").alias("b")),
                    F.struct(F.least("v", "w").alias("a"), F.greatest("v", "w").alias("b")),
                )
            ).alias("e")
        ).select("e.a", "e.b")
        t_e = tri_edges.groupBy("a", "b").agg(F.count(F.lit(1)).alias("t"))
        return int(
            t_e.agg(
                # integer DIV: '/' is double division, exact below 2^53
                F.sum(F.expr("t * (t - 1) DIV 2")).alias("s")
            ).collect()[0]["s"]
            or 0
        )

    def term_cycle4() -> int:
        # 4-cycles via packed wedge keys (never Σ deg² hub fan-out)
        return int(cycle4_count(can).collect()[0]["n_cycles"])

    def term_clique4() -> int:
        return int(clique_count(can, 4).first()["n_cliques"])

    # the six terms are independent single-value aggregations over the
    # shared (materialized) caches — run them as concurrent Spark jobs
    # so each job's straggler tail back-fills with the next one's tasks
    # (guide §2.6; sequentially they were ~10 driver-latency-bound jobs)
    terms = [
        term_star4, term_mid, term_tailed,
        term_diamond, term_cycle4, term_clique4,
    ]
    with ThreadPoolExecutor(max_workers=len(terms)) as pool:
        e_star4, mid, e_tailed, e_diamond, e_cycle4, e_clique4 = [
            f.result() for f in [pool.submit(t) for t in terms]
        ]

    for df in (can, deg, tri):  # all terms above are collected; drop caches
        df.unpersist()

    e_counts = {
        "path4": int(mid) - 3 * n_tri,
        "star4": int(e_star4),
        "cycle4": int(e_cycle4),
        "tailed_triangle": int(e_tailed),
        "diamond": int(e_diamond),
        "clique4": int(e_clique4),
    }
    cat = all_motifs(4)
    out = _to_vertex_induced(cat, e_counts) if vertex_induced else e_counts
    rows = [(n, out[n]) for n in cat]
    return spark.createDataFrame(rows, "motif string, count long")


def star_count(edges: DataFrame, k: int) -> DataFrame:
    """Closed-form k-star count: Σ_v C(deg(v), k) — the reference's
    binomial counting shortcut (D3, core/PatternMatching.hh:129-147,
    1788-1826) for the single-order-group case. One groupBy + one agg;
    never enumerates a single star. Single row (n_matches,)."""
    from peregrine_spark.operators.arith import sum_binom_exact
    from peregrine_spark.operators.graph import degrees

    deg = degrees(edges)
    # exact integer arithmetic in decimal(38,0): raw falling factorials
    # summed per-row (full 10^(37/k) per-degree budget — a mega-hub is
    # fine to deg ≈ 2.5e7 at k=5), ONE exact ÷ k! on the aggregated
    # total (the DuckDB oracle mirrors this with HUGEINT // k!); raises
    # rather than silently NULL-overflowing past the int64 result range.
    return deg.agg(
        sum_binom_exact(F.col("deg"), k).cast("long").alias("n_matches")
    )


def pattern_exists(edges: DataFrame, pattern: SmallGraph, labels=None) -> bool:
    """Existence query (reference C7 short-circuit,
    apps/existence-query.cc): Spark stops tasks once limit(1) is met."""
    m = match_pattern(edges, pattern, labels=labels, count_only=False)
    return len(m.limit(1).collect()) > 0


def mni_support(matches: DataFrame, pattern: SmallGraph) -> int:
    """Minimum-image-based (MNI) support of a pattern given its
    materialized matches (columns v<i>): for each automorphism orbit, the
    domain is the set of data vertices appearing in ANY of the orbit's
    positions (the reference's Domain unions every set position,
    apps/Domain.hh:19-40); support = min domain size over orbits.

    ONE Spark job for ALL orbits: explode every (orbit, position) into
    tagged rows and count distinct per orbit in a single aggregation —
    the match join runs once, not once per orbit (a 3-orbit pattern used
    to re-run the whole enumeration three times)."""
    reg = set(pattern.regular_vertices())
    orbits = [
        [p for p in orbit if p in reg]
        for orbit in pattern.automorphic_sets()
        if any(p in reg for p in orbit)
    ]
    tagged = matches.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("o"), F.col(f"v{p}").alias("x"))
                    for i, orbit in enumerate(orbits)
                    for p in orbit
                ]
            )
        ).alias("s")
    ).select("s.o", "s.x")
    doms = tagged.groupBy("o").agg(F.count_distinct("x").alias("n")).collect()
    if not doms:  # zero matches → every domain is empty
        return 0
    return int(min(r["n"] for r in doms))
