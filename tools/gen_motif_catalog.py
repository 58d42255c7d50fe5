"""Generate the connected k-vertex motif catalog as graph6 lines —
self-generated parity with the reference's shipped nauty catalogs
(core/graphs/graph{3..9}c.g6, decoded there by core/PatternGenerator.cc;
we enumerate from scratch instead of copying the files).

Method: every connected graph on k vertices contains a non-cut vertex,
so extending every connected (k-1)-class by one new vertex joined to
every non-empty subset of the old vertices covers all connected
k-classes.
Dedup by canonical form = min over all vertex permutations of the
packed adjacency bitmask — vectorized with numpy (a (k!, C(k,2)) gather
matrix), ~5 s for k=7's 112×127 candidates.

Usage: python tools/gen_motif_catalog.py 7 > peregrine_spark/plans/graph7c.g6
Known class counts (OEIS A001349): 2, 6, 21, 112, 853, 11117.
"""

from __future__ import annotations

import itertools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from peregrine_spark.plans.generators import all_connected, decode_graph6  # noqa: E402
from peregrine_spark.plans.patterns import SmallGraph  # noqa: E402


def _pair_index(k: int) -> dict[tuple[int, int], int]:
    """(u, v) 0-based u<v -> bit position, in the fixed enumeration
    order used for packing."""
    pairs = list(itertools.combinations(range(k), 2))
    return {p: i for i, p in enumerate(pairs)}


def _perm_gather(k: int) -> np.ndarray:
    """(k!, C(k,2)) int matrix G: canonical candidate row r of a packed
    bit vector b is b[G[r]] — position j of the permuted graph takes the
    bit of the source pair that perm maps onto pair j."""
    idx = _pair_index(k)
    pairs = list(itertools.combinations(range(k), 2))
    perms = list(itertools.permutations(range(k)))
    G = np.empty((len(perms), len(pairs)), dtype=np.int64)
    for r, perm in enumerate(perms):
        for (u, v), j in idx.items():
            pu, pv = perm[u], perm[v]
            G[r, idx[(min(pu, pv), max(pu, pv))]] = j
    return G


def canon_key(bits: np.ndarray, G: np.ndarray, weights: np.ndarray) -> int:
    """Minimal packed integer over all permutations."""
    return int((bits[G] @ weights).min())


def mask_of(g: SmallGraph, k: int) -> np.ndarray:
    idx = _pair_index(k)
    vs = g.vertices
    pos = {v: i for i, v in enumerate(vs)}
    bits = np.zeros(len(idx), dtype=np.int64)
    for a, b in g.edges:
        i, j = pos[a], pos[b]
        bits[idx[(min(i, j), max(i, j))]] = 1
    return bits


def encode_graph6(bits: np.ndarray, k: int) -> str:
    """Pack an upper-triangle (column-major, nauty order: for v in 1..k-1,
    for u in 0..v-1) bit list into a graph6 line."""
    idx = _pair_index(k)
    stream = []
    for v in range(1, k):
        for u in range(v):
            stream.append(int(bits[idx[(u, v)]]))
    while len(stream) % 6:
        stream.append(0)
    chars = [chr(k + 63)]
    for i in range(0, len(stream), 6):
        val = 0
        for b in stream[i : i + 6]:
            val = (val << 1) | b
        chars.append(chr(val + 63))
    return "".join(chars)


def connected_catalog(k: int) -> list[str]:
    """graph6 lines for every connected k-vertex isomorphism class,
    ordered by canonical key (deterministic)."""
    base = all_connected(k - 1)
    n_pairs = k * (k - 1) // 2
    G = _perm_gather(k)
    weights = (1 << np.arange(n_pairs, dtype=np.int64))[::-1].copy()
    idx = _pair_index(k)
    seen: dict[int, np.ndarray] = {}
    for g in base:
        bits0 = np.zeros(n_pairs, dtype=np.int64)
        vs = g.vertices
        pos = {v: i for i, v in enumerate(vs)}
        for a, b in g.edges:
            i, j = pos[a], pos[b]
            bits0[idx[(min(i, j), max(i, j))]] = 1
        new = k - 1  # 0-based id of the added vertex
        for sub in range(1, 1 << (k - 1)):
            bits = bits0.copy()
            for u in range(k - 1):
                if sub >> u & 1:
                    bits[idx[(u, new)]] = 1
            key = canon_key(bits, G, weights)
            if key not in seen:
                seen[key] = bits
    return [encode_graph6(seen[key], k) for key in sorted(seen)]


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    lines = connected_catalog(k)
    # sanity: decode roundtrip + connectivity + class count
    expected = {3: 2, 4: 6, 5: 21, 6: 112, 7: 853, 8: 11117}
    if k in expected:
        assert len(lines) == expected[k], (len(lines), expected[k])
    for ln in lines:  # decode roundtrip (keys are distinct by construction)
        g = decode_graph6(ln)
        assert len(g.vertices) == k, ln
        assert g.edges, ln
    for ln in lines:
        print(ln)


if __name__ == "__main__":
    main()
