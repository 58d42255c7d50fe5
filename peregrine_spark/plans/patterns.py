"""Pattern model + driver-side query compilation (Peregrine parity layer).

Re-implements, in plain Python on tiny inputs, the reference's
driver-side pattern analysis:

- SmallGraph: true/anti adjacency + optional labels, with the reference's
  text format parser (/root/reference/core/Graph.hh:389-446: per line
  `u v` = edge, 3 tokens = anti-edge, 4 = labelled edge, 5 = labelled
  anti-edge).
- automorphisms(): brute-force permutation search (patterns are ≤ 9
  vertices — same regime as the reference's bliss usage).
- symmetry_conditions(): partial-order pairs (u < v) that kill automorphic
  duplicate matches — the algorithm of PO::findPOs
  (/root/reference/core/PO.cc:125-180): repeatedly fix the smallest vertex
  with a nontrivial orbit, emit v<u for its orbit, restrict the group to
  the stabilizer.
- matching_order(): connectivity-greedy vertex order (each new vertex
  adjacent to a matched one when the pattern is connected) — the
  join-schedule analog of the reference's vgs/qs generation
  (core/Graph.hh:1569-1722), simplified: one order, no vgs forest.

The executor side (operators/patterns.py) compiles this into a chain of
DataFrame joins with the conditions as pushed-down predicates.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field


@dataclass
class SmallGraph:
    """Query pattern on vertices 1..n (reference keeps 1-based ids,
    core/DataConverter.cc:173 — we mirror that in the pattern layer)."""

    edges: list[tuple[int, int]] = field(default_factory=list)
    anti_edges: list[tuple[int, int]] = field(default_factory=list)
    labels: dict[int, int] = field(default_factory=dict)
    # declared vertex count: vertices = {edge/label endpoints} ∪ {1..n}.
    # Lets graphs with isolated vertices (e.g. graph6 decodes) keep them.
    n: int = 0

    # -- construction ------------------------------------------------------
    @classmethod
    def from_text(cls, text: str) -> SmallGraph:
        """Parse the reference's pattern text format."""
        g = cls()
        for line in text.strip().splitlines():
            tok = line.split()
            if not tok or tok[0].startswith("#"):
                continue
            if len(tok) == 2:
                g.add_edge(int(tok[0]), int(tok[1]))
            elif len(tok) == 3:
                g.add_anti_edge(int(tok[0]), int(tok[1]))
            elif len(tok) == 4:
                u, lu, v, lv = map(int, tok)
                g.add_edge(u, v)
                g.labels[u], g.labels[v] = lu, lv
            elif len(tok) == 5:
                u, lu, v, lv = map(int, tok[:4])
                g.add_anti_edge(u, v)
                g.labels[u], g.labels[v] = lu, lv
            else:
                raise ValueError(f"bad pattern line: {line!r}")
        return g

    @classmethod
    def from_file(cls, path: str) -> SmallGraph:
        with open(path) as f:
            return cls.from_text(f.read())

    @classmethod
    def clique(cls, k: int) -> SmallGraph:
        g = cls()
        for u, v in itertools.combinations(range(1, k + 1), 2):
            g.add_edge(u, v)
        return g

    @classmethod
    def star(cls, k: int) -> SmallGraph:
        """1 hub + k leaves (reference PatternGenerator::star)."""
        g = cls()
        for i in range(2, k + 2):
            g.add_edge(1, i)
        return g

    @classmethod
    def path(cls, k: int) -> SmallGraph:
        g = cls()
        for i in range(1, k):
            g.add_edge(i, i + 1)
        return g

    @classmethod
    def cycle(cls, k: int) -> SmallGraph:
        g = cls.path(k)
        g.add_edge(k, 1)
        return g

    # -- mutation ----------------------------------------------------------
    def add_edge(self, u: int, v: int) -> None:
        if u != v and not self.has_edge(u, v):
            self.edges.append((min(u, v), max(u, v)))

    def add_anti_edge(self, u: int, v: int) -> None:
        if u != v and not self.has_anti_edge(u, v):
            self.anti_edges.append((min(u, v), max(u, v)))

    # -- views -------------------------------------------------------------
    def has_edge(self, u: int, v: int) -> bool:
        return (min(u, v), max(u, v)) in set(self.edges)

    def has_anti_edge(self, u: int, v: int) -> bool:
        return (min(u, v), max(u, v)) in set(self.anti_edges)

    @property
    def vertices(self) -> list[int]:
        vs = set(range(1, self.n + 1))
        for u, v in self.edges + self.anti_edges:
            vs.update((u, v))
        vs.update(self.labels)
        return sorted(vs)

    def neighbours(self, u: int) -> set[int]:
        out = set()
        for a, b in self.edges:
            if a == u:
                out.add(b)
            elif b == u:
                out.add(a)
        return out

    def anti_neighbours(self, u: int) -> set[int]:
        out = set()
        for a, b in self.anti_edges:
            if a == u:
                out.add(b)
            elif b == u:
                out.add(a)
        return out

    # -- anti-vertices / partially-labelled classification -------------------
    WILDCARD = -1  # the reference's '*' label (uint32_t(-1), core/Graph.hh:676)

    def is_anti_vertex(self, v: int) -> bool:
        """A pattern vertex with only anti-edges: 'no data vertex may sit
        here' (reference core/Graph.hh:505-508)."""
        return bool(self.anti_neighbours(v)) and not self.neighbours(v)

    def anti_vertices(self) -> list[int]:
        return [v for v in self.vertices if self.is_anti_vertex(v)]

    def regular_vertices(self) -> list[int]:
        return [v for v in self.vertices if not self.is_anti_vertex(v)]

    def wildcard_vertices(self) -> list[int]:
        """Vertices labelled '*' (partially-labelled patterns match them to
        data vertices whose label is NOT a known label)."""
        return [v for v in self.vertices if self.labels.get(v) == self.WILDCARD]

    def known_labels(self) -> set[int]:
        """The non-wildcard labels of this pattern (the per-pattern slice of
        the reference's DataGraph::known_labels, core/DataGraph.cc:186-202)."""
        return {l for l in self.labels.values() if l != self.WILDCARD}

    def validate_anti_vertices(self) -> None:
        """The reference's AnalyzedPattern::check_anti_vertices
        (core/Graph.hh:695-733): anti-vertex ids must come after every
        regular vertex, and no two anti-vertices may be connected."""
        regular = self.regular_vertices()
        top = max(regular) if regular else 0
        for av in self.anti_vertices():
            if av <= top:
                raise ValueError(
                    f"anti-vertex {av} has a smaller id than regular vertices"
                )
            for q in self.anti_neighbours(av):
                if self.is_anti_vertex(q):
                    raise ValueError(
                        f"anti-vertex {av} is connected to anti-vertex {q}; "
                        "this pattern is impossible to match"
                    )

    # -- analysis (driver-side planning) ------------------------------------
    def _wl_cells(self) -> list[list[int]]:
        """1-WL stable partition over the TRUE edges (iterated colour
        refinement; initial colour = degree). Automorphisms preserve WL
        colours, so the search space shrinks to Π |cell|! colour-
        preserving permutations — usually a handful for k ≥ 8 patterns
        vs 9! = 362,880 brute (WL-homogeneous patterns like cycles keep
        one cell and fall back to the full set)."""
        vs = self.vertices
        colors = {v: len(self.neighbours(v)) for v in vs}
        while True:
            sig = {
                v: (colors[v], tuple(sorted(colors[u] for u in self.neighbours(v))))
                for v in vs
            }
            ranks = {s: r for r, s in enumerate(sorted(set(sig.values())))}
            new = {v: ranks[sig[v]] for v in vs}
            if new == colors:
                break
            colors = new
        cells: dict[int, list[int]] = {}
        for v in vs:
            cells.setdefault(colors[v], []).append(v)
        return [cells[c] for c in sorted(cells)]

    def automorphisms(self) -> list[dict[int, int]]:
        """All label- and (anti-)edge-preserving permutations. Memoized
        on the (edges, anti_edges, labels) state — planning calls this
        several times per pattern (symmetry conditions, |Aut|, group
        plans), and for 9-vertex patterns one brute sweep is ~10 s."""
        state = (
            tuple(sorted(self.edges)),
            tuple(sorted(self.anti_edges)),
            tuple(sorted(self.labels.items())),
        )
        cached = getattr(self, "_aut_cache", None)
        if cached is not None and cached[0] == state:
            return cached[1]
        vs = self.vertices
        eset = set(self.edges)
        aset = set(self.anti_edges)
        if not self.labels and not aset and len(vs) >= 7:
            # colour-preserving candidates only (exact: autos preserve
            # the iso-invariant WL colours; each candidate still gets
            # the full edge-set check below)
            cells = self._wl_cells()
            perms_iter = (
                sum((list(c) for c in combo), [])
                for combo in itertools.product(
                    *[itertools.permutations(c) for c in cells]
                )
            )
            src_order = [v for cell in cells for v in cell]
        else:
            perms_iter = itertools.permutations(vs)
            src_order = vs
        autos = []
        for perm in perms_iter:
            m = dict(zip(src_order, perm))
            if any(self.labels.get(v) != self.labels.get(m[v]) for v in vs):
                continue
            if {tuple(sorted((m[a], m[b]))) for a, b in eset} != eset:
                continue
            if {tuple(sorted((m[a], m[b]))) for a, b in aset} != aset:
                continue
            autos.append(m)
        self._aut_cache = (state, autos)
        return autos

    def symmetry_conditions(self) -> list[tuple[int, int]]:
        """Partial-order pairs (u, v) meaning 'match(u) < match(v)', such
        that exactly one member of each automorphism class of matches
        survives (PO::findPOs, /root/reference/core/PO.cc:125-180).

        Only REGULAR vertices are matched, so the acting group is the
        automorphism group restricted to them (automorphisms that differ
        only on anti-vertices act identically on matches — 'automorphic
        anti-vertices are redundant', PatternMatching_test.hh:384)."""
        regular = self.regular_vertices()
        seen: set[tuple] = set()
        group: list[dict[int, int]] = []
        for m in self.automorphisms():
            key = tuple(m[v] for v in regular)
            if key not in seen:
                seen.add(key)
                group.append({v: m[v] for v in regular})
        conds: list[tuple[int, int]] = []
        while len(group) > 1:
            # smallest vertex moved by some member of the group
            moved = sorted({v for m in group for v in m if m[v] != v})
            v0 = moved[0]
            orbit = sorted({m[v0] for m in group})
            conds.extend((v0, u) for u in orbit if u != v0)
            group = [m for m in group if m[v0] == v0]
        return conds

    def automorphic_sets(self) -> list[list[int]]:
        """Vertex orbits under the automorphism group (the reference's
        PO::automorphicSets, used for FSM/MNI domains)."""
        autos = self.automorphisms()
        seen: set[int] = set()
        orbits = []
        for v in self.vertices:
            if v in seen:
                continue
            orb = sorted({m[v] for m in autos})
            orbits.append(orb)
            seen.update(orb)
        return orbits

    def canonical_form(self) -> str:
        """Canonical isomorphism key: lexicographically minimal adjacency
        encoding over all vertex permutations (+ labels). Brute force —
        patterns are ≤ 9 vertices, same regime as the reference's bliss
        usage (core/Graph.hh:212-252). Two patterns are isomorphic iff
        their canonical forms are equal."""
        vs = self.vertices
        n = len(vs)
        eset = {(vs.index(a), vs.index(b)) for a, b in self.edges}
        aset = {(vs.index(a), vs.index(b)) for a, b in self.anti_edges}
        labs = [self.labels.get(v, 0) for v in vs]
        best = None
        for perm in itertools.permutations(range(n)):
            enc_e = sorted(
                (min(perm[a], perm[b]), max(perm[a], perm[b])) for a, b in eset
            )
            enc_a = sorted(
                (min(perm[a], perm[b]), max(perm[a], perm[b])) for a, b in aset
            )
            enc_l = [0] * n
            for i in range(n):
                enc_l[perm[i]] = labs[i]
            enc = (tuple(enc_e), tuple(enc_a), tuple(enc_l))
            if best is None or enc < best:
                best = enc
        return repr(best)

    def _greedy_order(self, vs: list[int]) -> list[int]:
        """Greedy connectivity order over `vs`: highest-degree seed, each
        subsequent vertex maximizes edges back to matched vertices (ties:
        more symmetry conditions already usable, then smaller id)."""
        if not vs:
            return []
        conds = self.symmetry_conditions()
        deg = {v: len(self.neighbours(v)) for v in vs}
        order = [max(vs, key=lambda v: (deg[v], -v))]
        remaining = [v for v in vs if v != order[0]]
        while remaining:
            def score(v: int):
                back = len(self.neighbours(v) & set(order))
                cond = sum(1 for a, b in conds if (a == v and b in order) or (b == v and a in order))
                return (back, cond, deg[v], -v)

            nxt = max(remaining, key=score)
            order.append(nxt)
            remaining.remove(nxt)
        return order

    def _min_vertex_cover(self) -> list[int] | None:
        """Smallest REGULAR-vertex cover whose induced subgraph is
        connected (the reference's core extraction, B3,
        core/Graph.hh:1569-1640: non-core vertices have every neighbour
        in the core, so they match as pure extensions). Returns None when
        no connected cover exists (e.g. paths — the greedy order is used
        instead). Brute force: patterns are ≤ 9 vertices."""
        import itertools as it

        vs = self.regular_vertices()
        edges = [
            (a, b) for a, b in self.edges
            if a in vs and b in vs
        ]
        if not edges:
            return None
        for k in range(1, len(vs) + 1):
            best = None
            for sub in it.combinations(vs, k):
                sset = set(sub)
                if any(a not in sset and b not in sset for a, b in edges):
                    continue
                # connected induced subgraph (single vertex counts)
                seen = {sub[0]}
                frontier = [sub[0]]
                while frontier:
                    x = frontier.pop()
                    for y in self.neighbours(x) & sset:
                        if y not in seen:
                            seen.add(y)
                            frontier.append(y)
                if seen == sset:
                    best = list(sub)
                    break
            if best is not None:
                return best
        return None

    def aut_order_regular(self) -> int:
        """Order of the automorphism group restricted to the REGULAR
        vertices (the divisor for unbroken ordered-match counting —
        #injective homomorphisms = |Aut| × #occurrences)."""
        regular = self.regular_vertices()
        return len({tuple(m[v] for v in regular) for m in self.automorphisms()})

    def group_count_plan(
        self,
    ) -> tuple[list[int], list[tuple[list[int], frozenset[int]]]] | None:
        """Driver-side plan for the generalized order-group counter (B5,
        reference core/Graph.hh:1270-1543): (core matching order, sibling
        groups). The core is the minimum connected vertex cover (B3), so
        every NON-core vertex has ALL its neighbours in the core — it is a
        pure extension, never enumerated. Non-core vertices partition into
        sibling groups by neighbour set (the reference's get_matching_groups
        keys groups on identical true+anti adjacency); each group of size t
        is COUNTED from its candidate-set size, with inclusion–exclusion
        across groups for inter-group distinctness
        (core/PatternMatching.hh:1741-1857).

        Counting is UNBROKEN: no symmetry conditions anywhere — the core is
        enumerated as ordered injective assignments and the global total is
        divided by aut_order_regular() at the end, which sidesteps the
        reference's per-group bounds entirely (bounds exist only to repair
        partial symmetry breaking). Returns None for labelled / anti-edge
        patterns (their candidate counts need label-partitioned tables) and
        for patterns with no non-core vertex."""
        if self.labels or self.anti_edges:
            return None
        vs = self.regular_vertices()
        core = self._min_vertex_cover()
        if core is None:
            return None
        noncore = [v for v in vs if v not in core]
        if not noncore:
            return None
        by_nset: dict[frozenset[int], list[int]] = {}
        for v in noncore:
            by_nset.setdefault(frozenset(self.neighbours(v)), []).append(v)
        groups = [
            (sorted(members), nset)
            for nset, members in sorted(
                by_nset.items(), key=lambda kv: sorted(kv[1])
            )
        ]
        return self._greedy_order(core), groups

    def matching_order(self) -> list[int]:
        """Matching order over the REGULAR vertices (anti-vertices are
        never enumerated — they become NOT-EXISTS checks).

        Core-first (B3/B4): enumerate a minimum connected vertex cover
        with the greedy connectivity order, then append the non-core
        vertices grouped by their (identical) neighbour sets, LARGEST
        sibling group last — every non-core vertex is a pure extension of
        the core, and the trailing sibling group is exactly what the B5
        order-group counter turns into a binomial. Falls back to the
        plain greedy order when no connected cover exists."""
        vs = self.regular_vertices()
        if not vs:
            return []
        core = self._min_vertex_cover()
        if core is None or len(core) == len(vs):
            return self._greedy_order(vs)
        order = self._greedy_order(core)
        groups: dict[tuple, list[int]] = {}
        for v in vs:
            if v in core:
                continue
            key = tuple(sorted(self.neighbours(v))) + (self.labels.get(v),)
            groups.setdefault(key, []).append(v)
        for key in sorted(groups, key=lambda k: (len(groups[k]), repr(k))):
            order.extend(sorted(groups[key]))
        return order

    def enumeration_order(
        self,
        conds: set[tuple[int, int]],
        t_tail: int = 0,
        default: list[int] | None = None,
        max_orders: int = 8000,
    ) -> list[int]:
        """B4 multi-order selection (the reference's vgs forests,
        core/Graph.hh:1569-1722, re-expressed): instead of materializing
        a forest of alternate views, score every CONNECTED matching
        order (with the trailing B5 order group pinned in place) and
        enumerate through the one that binds symmetry-condition
        endpoints earliest — a `<` condition halves the partial-match
        stream the moment both endpoints are bound, so earlier binding
        dominates join-chain cost (measured min-of-2 interleaved at
        sf0.01 mod-8: cycle6 2.3×, tailed triangle 4.7×, house 1.4×;
        BENCH.md round 5). Score: lexicographic
        (Σ_k #conds active by step k, Σ_k #edges bound by step k);
        exact ties keep the default core-first order. Falls back to the
        default when the pattern is disconnected over the head vertices
        or the order space exceeds max_orders (huge patterns — their
        counting routes through the group counter anyway)."""
        if default is None:
            default = self.matching_order()
        tail = default[len(default) - t_tail :] if t_tail else []
        head = default[: len(default) - t_tail] if t_tail else list(default)
        if len(head) <= 2:
            return default
        nbr = {v: self.neighbours(v) for v in head}
        orders: list[list[int]] = []
        budget = [max_orders]

        def rec(order: list[int], rest: frozenset[int]) -> None:
            if budget[0] <= 0:
                return
            if not rest:
                budget[0] -= 1
                orders.append(order + tail)
                return
            for v in sorted(rest):
                if any(u in nbr[v] for u in order):
                    rec(order + [v], rest - {v})

        for s in head:
            rec([s], frozenset(head) - {s})
        if budget[0] <= 0 or not orders:
            return default

        def score(o: list[int]) -> tuple[int, int]:
            s1 = s2 = act_c = act_e = 0
            bound: set[int] = set()
            for v in o:
                act_c += sum(
                    1
                    for a, b in conds
                    if (a == v and b in bound) or (b == v and a in bound)
                )
                act_e += sum(1 for u in self.neighbours(v) if u in bound)
                bound.add(v)
                s1 += act_c
                s2 += act_e
            return (s1, s2)

        return max(orders, key=lambda o: (score(o), o == default))
