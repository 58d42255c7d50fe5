"""Pattern layer: analysis (automorphisms/conditions/order), the compiled
join-chain matcher, and the clique fast path — vs the brute-force oracle
(shape-parity with /root/reference/core/unittests/{Graph,PatternMatching}_test.hh)."""

import math

import pytest
from pyspark.sql import functions as F

from peregrine_spark import reference as ref
from peregrine_spark.operators.patterns import clique_count, match_pattern
from peregrine_spark.plans.patterns import SmallGraph
from tests import golden


# ---------------------------------------------------------------- analysis
def test_parser_reference_format():
    g = SmallGraph.from_text("1 2\n2 3\n1 3 0\n")  # edge, edge, anti-edge
    assert set(g.edges) == {(1, 2), (2, 3)}
    assert g.anti_edges == [(1, 3)]
    lab = SmallGraph.from_text("1 7 2 9\n")
    assert lab.edges == [(1, 2)] and lab.labels == {1: 7, 2: 9}


def test_automorphisms_counts():
    assert len(SmallGraph.clique(3).automorphisms()) == 6
    assert len(SmallGraph.clique(4).automorphisms()) == 24
    assert len(SmallGraph.path(3).automorphisms()) == 2
    assert len(SmallGraph.star(3).automorphisms()) == 6  # 3! leaf perms
    assert len(SmallGraph.cycle(4).automorphisms()) == 8  # dihedral


def test_symmetry_conditions_form_total_order_on_cliques():
    conds = SmallGraph.clique(4).symmetry_conditions()
    # enough conditions to leave exactly one representative per 24 autos
    assert len(conds) >= 3
    g = SmallGraph.clique(4)
    # conditions must be consistent (acyclic)
    assert all(a < b or (b, a) not in conds for a, b in conds)
    assert g.automorphic_sets() == [[1, 2, 3, 4]]


def test_matching_order_connected():
    g = SmallGraph.from_text("1 2\n2 3\n3 4\n")  # path
    order = g.matching_order()
    for i in range(1, len(order)):
        assert any(q in g.neighbours(order[i]) for q in order[:i])


# ---------------------------------------------------------------- matching
PATTERNS = {
    "triangle": SmallGraph.clique(3),
    "path3": SmallGraph.path(3),
    "star3": SmallGraph.star(3),
    "cycle4": SmallGraph.cycle(4),
    "clique4": SmallGraph.clique(4),
    "tailed_tri": SmallGraph.from_text("1 2\n2 3\n1 3\n3 4\n"),
    "open_wedge": SmallGraph.from_text("1 2\n2 3\n1 3 0\n"),  # strict path
}


@pytest.mark.parametrize("pname", list(PATTERNS))
@pytest.mark.parametrize("gname", ["k6", "two_tri_bridge", "disconnected"])
def test_match_counts_vs_oracle(spark, pname, gname):
    pat = PATTERNS[pname]
    pairs = golden.ALL[gname]
    e = golden.to_spark_edges(spark, pairs)
    got = match_pattern(e, pat).collect()[0].n_matches
    want = ref.pattern_count(pairs, pat)
    assert got == want, (pname, gname, got, want)


def test_k6_closed_forms(spark):
    e = golden.to_spark_edges(spark, golden.K6)
    assert match_pattern(e, SmallGraph.clique(3)).collect()[0][0] == 20
    assert match_pattern(e, SmallGraph.clique(4)).collect()[0][0] == 15
    # open wedges in a clique: none (every pair adjacent)
    assert match_pattern(e, PATTERNS["open_wedge"]).collect()[0][0] == 0
    # paths of 3 (edge-induced): C(6,3)*3 orderings? oracle confirms
    assert match_pattern(e, SmallGraph.path(3)).collect()[0][0] == ref.pattern_count(
        golden.K6, SmallGraph.path(3)
    )


@pytest.mark.parametrize("k", [3, 4, 5, 6])
def test_clique_fast_path_k6(spark, k):
    e = golden.to_spark_edges(spark, golden.K6)
    want = math.comb(6, k)
    assert clique_count(e, k).collect()[0].n_cliques == want


def test_clique_fast_path_matches_generic(spark, tiny_repo_files):
    from peregrine_spark.sources import ingest as ing

    e = ing.extract_edges(tiny_repo_files)
    fast = clique_count(e, 4).collect()[0].n_cliques
    generic = match_pattern(e, SmallGraph.clique(4)).collect()[0].n_matches
    assert fast == generic


def test_labelled_pattern(spark):
    pairs = golden.TWO_TRI_BRIDGE
    e = golden.to_spark_edges(spark, pairs)
    glab = {v: v % 2 for v in range(1, 7)}
    labels = spark.createDataFrame(list(glab.items()), "id long, label int")
    pat = SmallGraph.from_text("1 1 2 0\n")  # edge with labels (1)-(0)
    got = match_pattern(e, pat, labels=labels).collect()[0].n_matches
    want = ref.pattern_count(pairs, pat, graph_labels=glab)
    assert got == want


def test_anti_edge_on_star(spark):
    """In a star, every leaf pair is non-adjacent: open wedges = C(50,2)."""
    e = golden.to_spark_edges(spark, golden.STAR_HUB)
    got = match_pattern(e, PATTERNS["open_wedge"]).collect()[0].n_matches
    assert got == math.comb(50, 2)
