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


def _wl_cells(adj: np.ndarray) -> list[list[int]]:
    """1-WL stable partition of a k×k 0/1 adjacency matrix: iterated
    colour refinement (new colour = (old colour, sorted multiset of
    neighbour colours)), cells ordered by the CANONICAL colour key —
    iso-invariant, so isomorphic graphs get identical cell structures."""
    k = adj.shape[0]
    colors = [int(adj[v].sum()) for v in range(k)]
    while True:
        sig = [
            (colors[v], tuple(sorted(colors[u] for u in range(k) if adj[v, u])))
            for v in range(k)
        ]
        ranks = {s: r for r, s in enumerate(sorted(set(sig)))}
        new = [ranks[sig[v]] for v in range(k)]
        if new == colors:
            break
        colors = new
    cells: dict[int, list[int]] = {}
    for v in range(k):
        cells.setdefault(colors[v], []).append(v)
    return [cells[c] for c in sorted(cells)]


def canon_key_refined(
    bits: np.ndarray, k: int, pair_pos: np.ndarray, weights: np.ndarray,
    pairs_uv: tuple[np.ndarray, np.ndarray],
) -> int:
    """Canonical key = min packed adjacency over COLOUR-PRESERVING
    permutations only (vertices mapped into slot ranges ordered by the
    canonical 1-WL colour ranks). The 1-WL partition is iso-invariant,
    so this min agrees between isomorphic graphs; the permutation count
    is Π |cell|! — usually tiny, 9! only for WL-homogeneous graphs
    (cycles, circulants), where the numpy gather still handles it."""
    adj = np.zeros((k, k), dtype=np.int8)
    U, V = pairs_uv
    adj[U, V] = bits
    adj[V, U] = bits
    cells = _wl_cells(adj)
    # perms: slot s gets vertex perm[s]; slots assigned cell-by-cell
    per_cell = [list(itertools.permutations(c)) for c in cells]
    combos = list(itertools.product(*per_cell))
    P = np.array([sum(c, ()) for c in combos], dtype=np.int64)
    # inverse: vertex -> slot (the packed graph is indexed by slots)
    inv = np.empty_like(P)
    np.put_along_axis(inv, P, np.arange(k, dtype=np.int64)[None, :], axis=1)
    slot_u = inv[:, U]
    slot_v = inv[:, V]
    G = pair_pos[np.minimum(slot_u, slot_v), np.maximum(slot_u, slot_v)]
    # packed[perm][G[j]] = bits[j]  ⇒  key rows via scatter
    rows = np.zeros((P.shape[0], len(weights)), dtype=np.int64)
    np.put_along_axis(rows, G, bits[None, :].repeat(P.shape[0], 0), axis=1)
    return int((rows @ weights).min())


def connected_catalog(k: int) -> list[str]:
    """graph6 lines for every connected k-vertex isomorphism class,
    ordered by canonical key (deterministic)."""
    base = all_connected(k - 1)
    n_pairs = k * (k - 1) // 2
    weights = (1 << np.arange(n_pairs, dtype=np.int64))[::-1].copy()
    idx = _pair_index(k)
    # k ≤ 8: full-permutation gather (kept for byte-stable existing
    # catalogs). k ≥ 9: 9! per candidate is infeasible — use the
    # WL-refined canon (validated partition-identical to brute at
    # k = 6, 7: 651 + 7,056 candidates, zero divergence).
    refined = k >= 9
    if refined:
        pairs = list(itertools.combinations(range(k), 2))
        pair_pos = np.zeros((k, k), dtype=np.int64)
        for (u, v), j in idx.items():
            pair_pos[u, v] = j
        UV = (
            np.array([p[0] for p in pairs], dtype=np.int64),
            np.array([p[1] for p in pairs], dtype=np.int64),
        )
    else:
        G = _perm_gather(k)
    seen: dict[int, np.ndarray] = {}
    done = 0
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
            key = (
                canon_key_refined(bits, k, pair_pos, weights, UV)
                if refined
                else canon_key(bits, G, weights)
            )
            if key not in seen:
                seen[key] = bits
        done += 1
        if refined and done % 500 == 0:
            print(
                f"# {done}/{len(base)} base classes, {len(seen)} found",
                file=sys.stderr, flush=True,
            )
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
