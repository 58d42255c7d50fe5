"""Sanity-check the NumPy oracle itself on closed-form golden graphs —
if the oracle is wrong everything downstream is meaningless."""

import numpy as np

from peregrine_spark import reference as ref
from tests import golden


def test_triangles_closed_form():
    assert ref.triangle_count(golden.K6) == 20  # C(6,3)
    assert ref.triangle_count(golden.TWO_TRI_BRIDGE) == 2
    assert ref.triangle_count(golden.STAR_HUB) == 0
    assert ref.triangle_count(golden.DISCONNECTED) == 1


def test_degrees_k6():
    deg = ref.degrees(golden.K6)
    assert all(v == 5 for v in deg.values()) and len(deg) == 6


def test_cc():
    comp = ref.connected_components(golden.DISCONNECTED)
    assert comp[10] == comp[14] == 10
    assert comp[20] == comp[21] == comp[22] == 20
    assert comp[30] == comp[31] == 30
    one = ref.connected_components(golden.TWO_TRI_BRIDGE)
    assert set(one.values()) == {1}


def test_pagerank_uniform_on_k6():
    pr = ref.pagerank(np.concatenate([golden.K6, golden.K6[:, ::-1]]))
    vals = np.array(list(pr.values()))
    assert np.allclose(vals, 1.0 / 6, atol=1e-9)
    assert np.isclose(vals.sum(), 1.0, atol=1e-9)


def test_pagerank_mass_conserved_star():
    # directed star: all leaves point at hub; hub dangles
    edges = [(i, 0) for i in range(1, 51)]
    pr = ref.pagerank(edges)
    assert np.isclose(sum(pr.values()), 1.0, atol=1e-9)
    assert pr[0] > pr[1]


def test_label_propagation_cliquey():
    # two triangles + bridge: each triangle converges to its min label
    lab = ref.label_propagation(golden.TWO_TRI_BRIDGE, n_iter=10)
    assert lab[1] == lab[2] == lab[3]
    assert lab[4] == lab[5] == lab[6]
