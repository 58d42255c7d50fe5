"""Motif counting (edge- and vertex-induced), existence queries, MNI
support, and output sinks."""

import pytest
from pyspark.sql import functions as F

from peregrine_spark import reference as ref
from peregrine_spark.operators.motifs import (
    _as_complement_anti,
    all_motifs,
    mni_support,
    motif_counts,
    num_mappings,
    pattern_exists,
)
from peregrine_spark.operators.patterns import match_pattern
from peregrine_spark.plans.patterns import SmallGraph
from peregrine_spark.sources import ingest as ing
from peregrine_spark.sources.sinks import remap_to_origin, write_matches_csv
from tests import golden


def test_num_mappings_known_values():
    # a triangle contains 3 edge-induced path3s; a 4-clique contains 12
    assert num_mappings(SmallGraph.clique(3), SmallGraph.path(3)) == 3
    assert num_mappings(SmallGraph.clique(4), SmallGraph.path(3)) == 12
    assert num_mappings(SmallGraph.cycle(4), SmallGraph.path(3)) == 4


@pytest.mark.parametrize("gname", ["k6", "two_tri_bridge", "disconnected"])
@pytest.mark.parametrize("k", [3, 4])
def test_vertex_induced_motifs_vs_anti_edge_oracle(spark, gname, k):
    """Back-substitution conversion == direct anti-edge (vertex-induced)
    counting by the brute-force oracle."""
    pairs = golden.ALL[gname]
    e = golden.to_spark_edges(spark, pairs)
    got = {r.motif: r["count"] for r in motif_counts(spark, e, k, vertex_induced=True).collect()}
    for name, pat in all_motifs(k).items():
        want = ref.pattern_count(pairs, _as_complement_anti(pat))
        assert got[name] == want, (gname, name, got[name], want)


def test_edge_induced_motifs_k6(spark):
    e = golden.to_spark_edges(spark, golden.K6)
    got = {r.motif: r["count"] for r in motif_counts(spark, e, 3).collect()}
    assert got == {"path3": 60, "triangle": 20}
    vi = {r.motif: r["count"] for r in motif_counts(spark, e, 3, vertex_induced=True).collect()}
    assert vi == {"path3": 0, "triangle": 20}  # K6 has no induced path3


def test_existence_short_circuit(spark):
    e = golden.to_spark_edges(spark, golden.TWO_TRI_BRIDGE)
    assert pattern_exists(e, SmallGraph.clique(3))
    assert not pattern_exists(e, SmallGraph.clique(4))


def test_mni_support(spark):
    e = golden.to_spark_edges(spark, golden.STAR_HUB)
    m = match_pattern(e, SmallGraph.star(2), count_only=False)  # 2-star
    # hub position domain = {0}; leaf-pair orbit domain = all 50 leaves
    assert mni_support(m, SmallGraph.star(2)) == 1


def test_sinks_roundtrip_and_remap(spark, tiny_repo_files, tmp_path):
    e = ing.extract_edges(tiny_repo_files)
    vm = ing.vertex_map(tiny_repo_files)
    tri = match_pattern(e, SmallGraph.clique(3), count_only=False)
    out = str(tmp_path / "tri_csv")
    write_matches_csv(tri, out)
    back = spark.read.option("header", "true").csv(out)
    assert back.count() == tri.count()
    remapped = remap_to_origin(tri, vm)
    row = remapped.first()
    if row is not None:
        assert "/" in row["v1_origin"]
        n_null = remapped.filter(F.col("v1_origin").isNull()).count()
        assert n_null == 0


@pytest.mark.parametrize("gname", ["k6", "two_tri_bridge", "disconnected", "star_hub"])
def test_motif_counts_k4_closed_form_vs_generic(spark, gname):
    """The closed-form D2-D4 counter must equal the generic join-chain
    matcher (and hence the brute-force oracle) on every golden graph."""
    from peregrine_spark.operators.motifs import motif_counts_k4

    pairs = golden.ALL[gname]
    e = golden.to_spark_edges(spark, pairs)
    for vi in (False, True):
        closed = {
            r.motif: r["count"]
            for r in motif_counts_k4(spark, e, vertex_induced=vi).collect()
        }
        generic = {
            r.motif: r["count"]
            for r in motif_counts(spark, e, 4, vertex_induced=vi).collect()
        }
        assert closed == generic, (gname, vi, closed, generic)


def test_cycle4_count_oriented_vs_oracle(spark):
    """The oriented-DAG wedge-class decomposition (A/B enumerated, C via
    out-adjacency intersection) must equal the brute-force oracle on the
    golden graphs AND a seeded random graph with uneven degrees."""
    import random

    import numpy as np

    from peregrine_spark.operators.motifs import cycle4_count

    cases = [golden.ALL[g] for g in ("k6", "two_tri_bridge", "star_hub")]
    rnd = random.Random(7)
    n = 40
    rand_pairs = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rnd.randrange(n), rnd.randrange(n)) for _ in range(260)
            )
            if a != b
        }
    )
    cases.append(np.array(rand_pairs, dtype=np.int64))
    from peregrine_spark.operators import motifs as motifs_mod

    # All three physical routes: full wedge enumeration (route 1, the
    # small-graph default), broadcast + intersect C-term (route 2,
    # forced by failing the pair-packing id bound), and the hub-split
    # shuffle fallback (route 3, forced via a 0 broadcast bound)
    for bound, pack in (
        (motifs_mod.BROADCAST_MAX_EDGES, motifs_mod.PACK_MAX_ID),
        (motifs_mod.BROADCAST_MAX_EDGES, 0),
        (0, motifs_mod.PACK_MAX_ID),
    ):
        old, oldp = motifs_mod.BROADCAST_MAX_EDGES, motifs_mod.PACK_MAX_ID
        motifs_mod.BROADCAST_MAX_EDGES = bound
        motifs_mod.PACK_MAX_ID = pack
        try:
            for pairs in cases:
                e = golden.to_spark_edges(spark, pairs)
                got = cycle4_count(e).collect()[0]["n_cycles"]
                want = ref.pattern_count(pairs, SmallGraph.cycle(4))
                assert got == want, (bound, pack, len(pairs), got, want)
        finally:
            motifs_mod.BROADCAST_MAX_EDGES = old
            motifs_mod.PACK_MAX_ID = oldp


def test_motifs5_catalog_vs_oracle(spark):
    """k=5 catalog (21 isomorphism classes) — golden parity with the
    brute-force oracle, mirroring the reference's 5-motif truth files
    (core/integrationtests/Counting_test.hh:30-50, truth/5m.txt)."""
    from peregrine_spark.operators.motifs import _as_complement_anti

    cat = all_motifs(5)
    assert len(cat) == 21
    pairs = golden.TWO_TRI_BRIDGE
    e = golden.to_spark_edges(spark, pairs)
    got_e = {
        r.motif: r["count"]
        for r in motif_counts(spark, e, 5, vertex_induced=False).collect()
    }
    got_v = {
        r.motif: r["count"]
        for r in motif_counts(spark, e, 5, vertex_induced=True).collect()
    }
    for name, pat in cat.items():
        assert got_e[name] == ref.pattern_count(pairs, pat), name
        want_v = ref.pattern_count(pairs, _as_complement_anti(pat))
        assert got_v[name] == want_v, (name, got_v[name], want_v)
