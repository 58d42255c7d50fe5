"""Pattern generators — the reference's PatternGenerator
(/root/reference/core/PatternGenerator.cc): cliques, stars, all connected
k-vertex patterns, and single-edge extension for FSM candidate growth.

`all_connected(k)` enumerates edge subsets and dedupes by canonical form —
no nauty needed for k ≤ 5 (the reference ships graph6 catalogs decoded by
the vendored showg.cc; decode_graph6 below reads that public format for
parity, should a catalog file be supplied)."""

from __future__ import annotations

import itertools

from peregrine_spark.plans.patterns import SmallGraph


# The 112 connected 6-vertex isomorphism classes in graph6 form — the same
# catalog format the reference ships (core/graphs/graph6c.g6). Generated
# in-repo by the k=6 brute-force enumeration below (edge-subset masks +
# canonical_form dedup, ~3 min — too slow for import time, so the result
# is embedded; tests/test_labels_generators.py re-verifies class count,
# connectivity and pairwise non-isomorphism from the decoded graphs).
_G6_CONNECTED_6 = [
    "Esa?", "Eka?", "E{a?", "Eia?", "EYa?", "Eya?", "E]a?", "E}a?",
    "E]Q?", "E}Q?", "E]q?", "E}q?", "E]r?", "E}r?", "Eja?", "Eza?",
    "E~a?", "EpQ?", "EtQ?", "Etq?", "ExQ?", "ELQ?", "ElQ?", "E\\Q?",
    "E|Q?", "ELq?", "Elq?", "E|q?", "E^Q?", "E~Q?", "EJq?", "Ejq?",
    "EZq?", "Ezq?", "E^q?", "E~q?", "EPr?", "Epr?", "ETr?", "Etr?",
    "EXr?", "Exr?", "ELr?", "Elr?", "E\\r?", "E|r?", "E^r?", "E~r?",
    "EfY?", "EvY?", "Evy?", "ENY?", "EnY?", "E~Y?", "ENy?", "Eny?",
    "E~y?", "EBj?", "Ebj?", "Erj?", "EFj?", "Efj?", "Evj?", "Ezj?",
    "ENj?", "Enj?", "E~j?", "EFz?", "Efz?", "EVz?", "Evz?", "E^z?",
    "E~z?", "EFz_", "Efz_", "Evz_", "E~z_", "Ej]?", "Ez]?", "E~]?",
    "E~}?", "EpN?", "EtN?", "Etn?", "ElN?", "E|N?", "ELn?", "Eln?",
    "E\\n?", "E|n?", "E~N?", "EZn?", "Ezn?", "E^n?", "E~n?", "E^~?",
    "E~~?", "E]v_", "E}v_", "Etv_", "ELv_", "Elv_", "E|v_", "E^v_",
    "E~v_", "Ef~_", "Ev~_", "E~~_", "E]~o", "E}~o", "E~~o", "E~~w",
]


def all_connected(k: int) -> list[SmallGraph]:
    """All connected unlabelled graphs on k vertices, one per isomorphism
    class (1, 2, 6, 21, 112 classes for k = 2..6). k ≤ 5 enumerates
    directly; k = 6 decodes the embedded graph6 catalog."""
    if k == 6:
        return [decode_graph6(s) for s in _G6_CONNECTED_6]
    if k > 6:
        raise ValueError("catalogs available for k ≤ 6")
    pairs = list(itertools.combinations(range(1, k + 1), 2))
    seen: set[str] = set()
    out: list[SmallGraph] = []
    for mask in range(1, 1 << len(pairs)):
        g = SmallGraph()
        for i, (u, v) in enumerate(pairs):
            if mask >> i & 1:
                g.add_edge(u, v)
        if len(g.vertices) != k or not _connected(g):
            continue
        key = g.canonical_form()
        if key not in seen:
            seen.add(key)
            out.append(g)
    return out


def _connected(g: SmallGraph) -> bool:
    vs = g.vertices
    if not vs:
        return False
    seen = {vs[0]}
    stack = [vs[0]]
    while stack:
        u = stack.pop()
        for w in g.neighbours(u):
            if w not in seen:
                seen.add(w)
                stack.append(w)
    return len(seen) == len(vs)


def extend_by_edge(patterns: list[SmallGraph]) -> list[SmallGraph]:
    """FSM candidate growth (PatternGenerator::extend,
    core/PatternGenerator.cc:79-475, edge-based strategy): every way of
    adding one edge — between existing vertices or to one new vertex —
    deduped by canonical form (labels preserved; a new vertex inherits
    each label seen in the pattern set, handled by the FSM driver)."""
    seen: set[str] = set()
    out: list[SmallGraph] = []
    for p in patterns:
        vs = p.vertices
        nxt = max(vs) + 1
        candidates = []
        for u, v in itertools.combinations(vs, 2):
            if not p.has_edge(u, v):
                candidates.append((u, v, None))
        for u in vs:
            candidates.append((u, nxt, None))
        for u, v, _ in candidates:
            g = SmallGraph(
                edges=list(p.edges), anti_edges=list(p.anti_edges),
                labels=dict(p.labels),
            )
            g.add_edge(u, v)
            key = g.canonical_form()
            if key not in seen:
                seen.add(key)
                out.append(g)
    return out


def decode_graph6(line: str) -> SmallGraph:
    """Decode one graph in the public graph6 format (the format of the
    reference's core/graphs/graph{3..9}c.g6 catalogs; format spec is
    public nauty documentation). Supports n < 63."""
    s = line.strip()
    if s.startswith(">>graph6<<"):
        s = s[10:]
    n = ord(s[0]) - 63
    if n >= 63:
        raise ValueError("graph6 n >= 63 not supported")
    bits = []
    for ch in s[1:]:
        v = ord(ch) - 63
        bits.extend((v >> (5 - i)) & 1 for i in range(6))
    g = SmallGraph(n=n)  # n is explicit so isolated vertices survive
    idx = 0
    for v in range(1, n):
        for u in range(0, v):
            if idx < len(bits) and bits[idx]:
                g.add_edge(u + 1, v + 1)
            idx += 1
    return g
