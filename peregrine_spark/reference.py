"""Single-node NumPy reference implementations — the test oracle.

Plays the role of the reference repo's golden-truth files
(/root/reference/core/integrationtests/truth/, hard-coded count maps in
core/unittests/PatternMatching_test.hh:92-118): independent, simple,
obviously-correct implementations the Spark engine is checked against.
Triangles/CC/LP must match EXACTLY; PageRank allclose at 1e-6
(float summation order differs across partitionings — SURVEY.md §7).

All functions take raw edge arrays with arbitrary int64 vertex ids (the
engine's 64-bit hash ids) and remap to dense local indices internally —
the same new-id/original-id split as ids.bin
(/root/reference/core/DataConverter.cc:453-459).
"""

from __future__ import annotations

import numpy as np


def _as_pairs(edges) -> np.ndarray:
    a = np.asarray(edges, dtype=np.int64)
    if a.size == 0:
        return a.reshape(0, 2)
    return a.reshape(-1, 2)


def _remap(pairs: np.ndarray, extra_ids=None):
    """Dense local ids. Returns (ids_sorted, src_local, dst_local)."""
    pools = [pairs.ravel()]
    if extra_ids is not None and len(extra_ids):
        pools.append(np.asarray(extra_ids, dtype=np.int64))
    ids = np.unique(np.concatenate(pools)) if pools[0].size or len(pools) > 1 else np.array([], dtype=np.int64)
    src = np.searchsorted(ids, pairs[:, 0]) if pairs.size else np.array([], dtype=np.int64)
    dst = np.searchsorted(ids, pairs[:, 1]) if pairs.size else np.array([], dtype=np.int64)
    return ids, src, dst


def canonical_pairs(edges) -> np.ndarray:
    """Undirected edge set: (min, max) pairs, self-loops dropped, deduped."""
    p = _as_pairs(edges)
    p = p[p[:, 0] != p[:, 1]]
    lo = np.minimum(p[:, 0], p[:, 1])
    hi = np.maximum(p[:, 0], p[:, 1])
    return np.unique(np.stack([lo, hi], axis=1), axis=0)


def degrees(edges) -> dict[int, int]:
    can = canonical_pairs(edges)
    ids, s, d = _remap(can)
    deg = np.bincount(np.concatenate([s, d]), minlength=len(ids))
    return {int(ids[i]): int(deg[i]) for i in range(len(ids))}


def triangle_count(edges) -> int:
    """Exact triangle count via degree-ordered orientation + sorted
    adjacency intersection (mirrors core/PatternMatching.hh:1116)."""
    can = canonical_pairs(edges)
    if can.size == 0:
        return 0
    ids, s, d = _remap(can)
    n = len(ids)
    deg = np.bincount(np.concatenate([s, d]), minlength=n)
    # total order: (deg, id); orient low -> high
    key = deg.astype(np.int64) * (n + 1)
    ks, kd = key[s] + s, key[d] + d
    u = np.where(ks < kd, s, d)
    v = np.where(ks < kd, d, s)
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, u + 1, 1)
    np.cumsum(indptr, out=indptr)
    count = 0
    for a, b in zip(u, v):
        na = v[indptr[a] : indptr[a + 1]]
        nb = v[indptr[b] : indptr[b + 1]]
        count += len(np.intersect1d(na, nb, assume_unique=True))
    return int(count)


def pagerank(
    edges,
    vertex_ids=None,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 200,
    n_iter: int | None = None,
) -> dict[int, float]:
    """Directed PageRank with uniform dangling redistribution.

    r_{t+1} = (1-d)/N + d*(A^T (r_t / outdeg) + dangling_mass/N).
    Converged when max|Δ| < tol, or exactly n_iter supersteps if given.
    """
    p = _as_pairs(edges)
    ids, s, d = _remap(p, vertex_ids)
    n = len(ids)
    if n == 0:
        return {}
    out = np.bincount(s, minlength=n).astype(np.float64)
    dangling = out == 0
    r = np.full(n, 1.0 / n)
    iters = n_iter if n_iter is not None else max_iter
    for _ in range(iters):
        contrib = np.zeros(n)
        w = r / np.where(dangling, 1.0, out)
        np.add.at(contrib, d, w[s])
        dm = r[dangling].sum()
        new = (1.0 - damping) / n + damping * (contrib + dm / n)
        delta = np.abs(new - r).max()
        r = new
        if n_iter is None and delta < tol:
            break
    return {int(ids[i]): float(r[i]) for i in range(n)}


def connected_components(edges, vertex_ids=None, n_iter: int | None = None) -> dict[int, int]:
    """Hash-min components: comp(v) = min vertex id in v's component.
    With n_iter set, exactly that many synchronous min-propagation
    supersteps (matching the engine superstep-for-superstep); else to
    fixpoint."""
    can = canonical_pairs(edges)
    ids, s, d = _remap(can, vertex_ids)
    n = len(ids)
    comp = ids.copy()
    it = 0
    while True:
        new = comp.copy()
        if len(s):
            np.minimum.at(new, d, comp[s])
            np.minimum.at(new, s, comp[d])
        changed = (new != comp).any()
        comp = new
        it += 1
        if n_iter is not None:
            if it >= n_iter:
                break
        elif not changed:
            break
    return {int(ids[i]): int(comp[i]) for i in range(n)}


def pattern_count(
    edges,
    pattern,
    graph_labels: dict[int, int] | None = None,
    known_labels: set[int] | None = None,
) -> int:
    """Brute-force symmetry-broken pattern match count — the oracle for
    operators/patterns.py (mirrors the hard-coded ground-truth maps in
    /root/reference/core/unittests/PatternMatching_test.hh:92-118).

    Counts injective mappings of the REGULAR pattern vertices preserving
    true edges, excluding anti-edges, respecting labels ('*' = any label
    not in known_labels, default the pattern's own); anti-vertices become
    the reference's NOT-EXISTS constraint (check_anti_vertices,
    core/PatternMatching.hh:381-487), here in its set-equality form: the
    common data-neighbours of the matched anti-parents must be exactly
    the matched pattern-adjacent vertices (labelled anti-vertex: at most
    c of them may carry its label). Divides by the automorphism group
    restricted to regular vertices so each occurrence counts once."""
    can = canonical_pairs(edges)
    ids, s, d = _remap(can)
    n = len(ids)
    adj: list[set[int]] = [set() for _ in range(n)]
    for a, b in zip(s, d):
        adj[a].add(b)
        adj[b].add(a)
    glab = None
    if graph_labels is not None:
        glab = {i: graph_labels[int(ids[i])] for i in range(n)}
    if known_labels is None:
        known_labels = pattern.known_labels()

    pv = pattern.regular_vertices()
    antis = pattern.anti_vertices()
    order = pattern.matching_order()
    # distinct restrictions of Aut(P) to the regular vertices
    n_aut = len({tuple(m[v] for v in pv) for m in pattern.automorphisms()})

    def label_ok(p: int, c: int) -> bool:
        if p not in pattern.labels or glab is None:
            return True
        want = pattern.labels[p]
        if want == pattern.WILDCARD:
            return glab[c] not in known_labels
        return glab[c] == want

    def anti_vertices_ok(mapping: dict[int, int]) -> bool:
        for av in antis:
            S = sorted(pattern.anti_neighbours(av))
            cands = set.intersection(*[adj[mapping[u]] for u in S])
            av_label = pattern.labels.get(av)
            if av_label is not None and av_label != pattern.WILDCARD:
                if glab is None:
                    # labelled anti-vertex without graph labels: skip only
                    # THIS anti-vertex (a bare `return True` would skip
                    # validating the remaining anti-vertices too)
                    continue
                c_bound = sum(
                    1
                    for q in pv
                    if q not in S and pattern.labels.get(q) == av_label
                )
                if sum(1 for w in cands if glab[w] == av_label) > c_bound:
                    return False
            else:
                reg_v = {
                    mapping[q]
                    for q in pv
                    if all(q in pattern.neighbours(u) for u in S)
                }
                if cands != reg_v:
                    return False
        return True

    total = 0

    def extend(i: int, mapping: dict[int, int]) -> None:
        nonlocal total
        if i == len(order):
            if anti_vertices_ok(mapping):
                total += 1
            return
        p = order[i]
        matched_nbrs = [q for q in pattern.neighbours(p) if q in mapping]
        matched_anti = [q for q in pattern.anti_neighbours(p) if q in mapping]
        if matched_nbrs:
            cands = set.intersection(*[adj[mapping[q]] for q in matched_nbrs])
        else:
            cands = set(range(n))
        for c in cands:
            if c in mapping.values():
                continue
            if any(c in adj[mapping[q]] for q in matched_anti):
                continue
            if not label_ok(p, c):
                continue
            mapping[p] = c
            extend(i + 1, mapping)
            del mapping[p]

    extend(0, {})
    assert total % n_aut == 0, (total, n_aut)
    return total // n_aut


def label_propagation(edges, vertex_ids=None, n_iter: int = 10) -> dict[int, int]:
    """Synchronous label propagation, n_iter supersteps, deterministic:
    label(v) ← most frequent neighbour label, ties → smallest label;
    isolated vertices keep their own label. Labels init to vertex id."""
    can = canonical_pairs(edges)
    ids, s, d = _remap(can, vertex_ids)
    n = len(ids)
    # adjacency
    src = np.concatenate([s, d])
    dst = np.concatenate([d, s])
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, src + 1, 1)
    np.cumsum(indptr, out=indptr)
    labels = ids.copy()
    for _ in range(n_iter):
        new = labels.copy()
        for v in range(n):
            nbrs = dst[indptr[v] : indptr[v + 1]]
            if len(nbrs) == 0:
                continue
            lab = labels[nbrs]
            uniq, cnt = np.unique(lab, return_counts=True)
            new[v] = uniq[cnt == cnt.max()].min()
        labels = new
    return {int(ids[i]): int(labels[i]) for i in range(n)}
