"""Labelled-pattern operators: label discovery (reference C9,
/root/reference/core/PatternMatching.hh:1219-1284) and the FSM driver loop
(apps/fsm.cc:94-111): match → MNI support filter → extend → repeat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from peregrine_spark.operators.graph import undirected
from peregrine_spark.operators.motifs import mni_support
from peregrine_spark.operators.patterns import match_pattern
from peregrine_spark.plans.generators import extend_by_edge
from peregrine_spark.plans.patterns import SmallGraph


def discover_edge_labels(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """(l1, l2, n) — frequency of each canonical (sorted) label pair over
    undirected edges. The single-edge DISCOVER_LABELS expansion."""
    canon = (
        edges.select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    ls = labels.select(F.col("id").alias("src"), F.col("label").alias("_l1"))
    ld = labels.select(F.col("id").alias("dst"), F.col("label").alias("_l2"))
    return (
        canon.join(ls, "src")
        .join(ld, "dst")
        .groupBy(
            F.least("_l1", "_l2").alias("l1"), F.greatest("_l1", "_l2").alias("l2")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def discover_star_labels(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """(center_label, l1, l2, n) for 2-stars with leaf labels in canonical
    (sorted) order — the reference's 2-star discovery with the PROCESS-
    macro label canonicalization (core/PatternMatching.hh:83-106)."""
    und = undirected(edges)
    a = und.select(F.col("src").alias("c"), F.col("dst").alias("x"))
    b = und.select(F.col("src").alias("c"), F.col("dst").alias("y"))
    wedges = a.join(b, "c").filter(F.col("x") < F.col("y"))
    lc = labels.select(F.col("id").alias("c"), F.col("label").alias("cl"))
    lx = labels.select(F.col("id").alias("x"), F.col("label").alias("xl"))
    ly = labels.select(F.col("id").alias("y"), F.col("label").alias("yl"))
    return (
        wedges.join(lc, "c")
        .join(lx, "x")
        .join(ly, "y")
        .groupBy(
            F.col("cl").alias("center_label"),
            F.least("xl", "yl").alias("l1"),
            F.greatest("xl", "yl").alias("l2"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def discover_star_labels_3(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """(center_label, l1, l2, l3, n) for 3-stars with leaf labels in
    canonical (sorted) order — the reference's 3-star DISCOVER_LABELS
    expansion (core/PatternMatching.hh:1219-1284), which seeds 3-FSM.

    Leaves enumerate by id order (x < y < z) so each 3-star occurs once;
    the LABEL canonicalization is a driver-free array_sort. Cost is
    Σ_v C(deg v, 3) rows through one shuffle — run it on graphs where the
    3-star count is sane (the same bound as the reference's enumeration)."""
    und = undirected(edges)
    a = und.select(F.col("src").alias("c"), F.col("dst").alias("x"))
    b = und.select(F.col("src").alias("c"), F.col("dst").alias("y"))
    cc = und.select(F.col("src").alias("c"), F.col("dst").alias("z"))
    stars = (
        a.join(b, "c")
        .filter(F.col("x") < F.col("y"))
        .join(cc, "c")
        .filter(F.col("y") < F.col("z"))
    )
    lc = labels.select(F.col("id").alias("c"), F.col("label").alias("cl"))
    lx = labels.select(F.col("id").alias("x"), F.col("label").alias("xl"))
    ly = labels.select(F.col("id").alias("y"), F.col("label").alias("yl"))
    lz = labels.select(F.col("id").alias("z"), F.col("label").alias("zl"))
    sorted_leaves = F.array_sort(F.array("xl", "yl", "zl"))
    return (
        stars.join(lc, "c")
        .join(lx, "x")
        .join(ly, "y")
        .join(lz, "z")
        .groupBy(
            F.col("cl").alias("center_label"),
            sorted_leaves.getItem(0).alias("l1"),
            sorted_leaves.getItem(1).alias("l2"),
            sorted_leaves.getItem(2).alias("l3"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def mni_edge_supports(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """(l1, l2, support): exact MNI support of every labelled single-edge
    pattern (l1 ≤ l2) — the FSM seeding step (D11, apps/Domain.hh:6-95)
    fully distributed: support = min over automorphism orbits of the
    domain size. For l1 ≠ l2 the two endpoints are separate orbits
    (min of two countDistinct); for l1 = l2 they form ONE orbit whose
    domain is the union of both positions."""
    ls = labels.select(F.col("id").alias("src"), F.col("label").alias("_l1"))
    ld = labels.select(F.col("id").alias("dst"), F.col("label").alias("_l2"))
    occ = undirected(edges).join(ls, "src").join(ld, "dst")
    # one row per DIRECTED labelled occurrence; canonical pair (least, greatest)
    canon = occ.select(
        F.least("_l1", "_l2").alias("l1"),
        F.greatest("_l1", "_l2").alias("l2"),
        F.col("_l1").alias("la"),
        "src",
        "dst",
    )
    diff = (
        canon.filter(F.col("l1") != F.col("l2"))
        .groupBy("l1", "l2")
        .agg(
            F.count_distinct(
                F.when(F.col("la") == F.col("l1"), F.col("src"))
            ).alias("d1"),
            F.count_distinct(
                F.when(F.col("la") == F.col("l2"), F.col("src"))
            ).alias("d2"),
        )
        .select("l1", "l2", F.least("d1", "d2").alias("support"))
    )
    same = (
        canon.filter(F.col("l1") == F.col("l2"))
        .groupBy("l1", "l2")
        .agg(F.count_distinct("src").alias("support"))
    )
    return diff.unionByName(same)


def mni_star2_supports(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """(center_label, l1, l2, support): exact MNI support of every
    labelled 2-star pattern (leaf labels sorted) — the FSM level-2 support
    table, fully distributed. Orbits: {center} always its own; the two
    leaves form ONE orbit iff l1 = l2 (domain = union of both positions),
    else two. Implemented uniformly by exploding the leaf positions:
    countDistinct(leaf | leaf_label = l_i) gives the per-label domain for
    l1 ≠ l2 and the union domain when l1 = l2."""
    und = undirected(edges)
    a = und.select(F.col("src").alias("c"), F.col("dst").alias("x"))
    b = und.select(F.col("src").alias("c"), F.col("dst").alias("y"))
    wedges = a.join(b, "c").filter(F.col("x") < F.col("y"))
    lc = labels.select(F.col("id").alias("c"), F.col("label").alias("cl"))
    lx = labels.select(F.col("id").alias("x"), F.col("label").alias("xl"))
    ly = labels.select(F.col("id").alias("y"), F.col("label").alias("yl"))
    wl = wedges.join(lc, "c").join(lx, "x").join(ly, "y")
    ex = wl.select(
        "cl",
        F.least("xl", "yl").alias("l1"),
        F.greatest("xl", "yl").alias("l2"),
        "c",
        F.explode(
            F.array(
                F.struct(F.col("x").alias("v"), F.col("xl").alias("vl")),
                F.struct(F.col("y").alias("v"), F.col("yl").alias("vl")),
            )
        ).alias("leaf"),
    )
    return (
        ex.groupBy(F.col("cl").alias("center_label"), "l1", "l2")
        .agg(
            F.count_distinct("c").alias("_dc"),
            F.count_distinct(
                F.when(F.col("leaf.vl") == F.col("l1"), F.col("leaf.v"))
            ).alias("_d1"),
            F.count_distinct(
                F.when(F.col("leaf.vl") == F.col("l2"), F.col("leaf.v"))
            ).alias("_d2"),
        )
        .select(
            "center_label", "l1", "l2",
            F.least("_dc", "_d1", "_d2").alias("support"),
        )
    )


def fsm(
    spark: SparkSession,
    edges: DataFrame,
    labels: DataFrame,
    min_support: int,
    max_edges: int = 3,
) -> list[tuple[SmallGraph, int]]:
    """Frequent-subgraph mining with exact MNI support (the reference's
    fsm app): seed with frequent labelled single edges, then repeatedly
    extend frequent patterns by one edge (new vertex takes every label
    seen among frequent seeds) and keep those with support ≥ min_support.

    Returns [(pattern, support)] for all frequent patterns with ≤
    max_edges edges. Each candidate costs one Spark match job — the same
    pattern-at-a-time execution as the reference (E6 notes FSM
    distributes per pattern; Spark parallelizes within each)."""
    seed_rows = discover_edge_labels(edges, labels).collect()
    label_pool = sorted({r.l1 for r in seed_rows} | {r.l2 for r in seed_rows})

    frequent: list[tuple[SmallGraph, int]] = []
    level: list[SmallGraph] = []
    for r in seed_rows:
        p = SmallGraph()
        p.add_edge(1, 2)
        p.labels = {1: r.l1, 2: r.l2}
        m = match_pattern(edges, p, labels=labels, count_only=False)
        s = mni_support(m, p)
        if s >= min_support:
            frequent.append((p, s))
            level.append(p)

    n_edges = 1
    while level and n_edges < max_edges:
        n_edges += 1
        # structural extensions; label every unlabelled (new) vertex
        candidates: dict[str, SmallGraph] = {}
        for g in extend_by_edge(level):
            unlab = [v for v in g.vertices if v not in g.labels]
            if not unlab:
                candidates.setdefault(g.canonical_form(), g)
                continue
            assert len(unlab) == 1
            for lab in label_pool:
                h = SmallGraph(
                    edges=list(g.edges), anti_edges=list(g.anti_edges),
                    labels={**g.labels, unlab[0]: lab},
                )
                candidates.setdefault(h.canonical_form(), h)
        level = []
        for p in candidates.values():
            m = match_pattern(edges, p, labels=labels, count_only=False)
            s = mni_support(m, p)
            if s >= min_support:
                frequent.append((p, s))
                level.append(p)
    return frequent
