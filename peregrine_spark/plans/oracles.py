"""DuckDB oracle SQL for the driver correctness harness.

Every SQL string here is the ANSI-SQL restatement of a queries() entry in
__spark_entry__.py, runnable by DuckDB over the same parquet views. The
iterative algorithms are expressed as K *unrolled* superstep CTEs — the
same synchronous semantics the Spark engine executes, so integer results
(CC comps, LP labels) match exactly and PageRank matches to 6 decimals
(emitted as integer micro-units to dodge float-representation drift).

Hash-min is monotone, so "K supersteps" and "converged before K" give the
same state as long as K ≥ diameter — CC_K below is chosen above the test
graphs' diameters.
"""

from __future__ import annotations

CC_K = 8
PR_K = 5
LP_K = 3
DAMPING = 0.85

# ---- shared edge derivations (must mirror sources/testdata.py) ----------
E_COPURCHASE = """
  e AS (
    SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
    FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
    WHERE a.l_partkey < b.l_partkey
  )"""

E_EVENTS = """
  ev AS (
    SELECT user_id,
           LEAD(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id)
             AS next_user
    FROM events
  ),
  e AS (
    SELECT DISTINCT LEAST(user_id, next_user) AS src,
                    GREATEST(user_id, next_user) AS dst
    FROM ev WHERE next_user IS NOT NULL AND user_id <> next_user
  )"""

U_CLOSURE = """
  u AS (
    SELECT src AS id, dst AS nbr FROM e
    UNION ALL
    SELECT dst AS id, src AS nbr FROM e
  )"""

DEGREES = """
  d AS (SELECT id, COUNT(*) AS deg FROM u GROUP BY id)"""

VERTICES = """
  v AS (SELECT DISTINCT id FROM u)"""

ORIENTED = """
  o AS (
    SELECT CASE WHEN ds.deg < dd.deg OR (ds.deg = dd.deg AND e.src < e.dst)
                THEN e.src ELSE e.dst END AS src,
           CASE WHEN ds.deg < dd.deg OR (ds.deg = dd.deg AND e.src < e.dst)
                THEN e.dst ELSE e.src END AS dst,
           LEAST(ds.deg, dd.deg)    AS sdeg,
           CASE WHEN ds.deg < dd.deg OR (ds.deg = dd.deg AND e.src < e.dst)
                THEN dd.deg ELSE ds.deg END AS ddeg
    FROM e
    JOIN d ds ON ds.id = e.src
    JOIN d dd ON dd.id = e.dst
  )"""


def _graph_prelude(graph: str) -> str:
    base = E_COPURCHASE if graph == "copurchase" else E_EVENTS
    return base + "," + U_CLOSURE


def edges_sql(graph: str = "copurchase") -> str:
    base = E_COPURCHASE if graph == "copurchase" else E_EVENTS
    return f"WITH{base}\nSELECT src, dst FROM e"


def degrees_sql(graph: str = "copurchase") -> str:
    return f"WITH{_graph_prelude(graph)},{DEGREES}\nSELECT id, deg FROM d"


def top_degree_sql(k: int = 100, graph: str = "copurchase") -> str:
    return (
        f"WITH{_graph_prelude(graph)},{DEGREES}\n"
        f"SELECT id, deg FROM d ORDER BY deg DESC, id LIMIT {k}"
    )


def oriented_sql(graph: str = "copurchase") -> str:
    return (
        f"WITH{_graph_prelude(graph)},{DEGREES},{ORIENTED}\n"
        "SELECT src, dst, sdeg, ddeg FROM o"
    )


def triangle_count_sql(graph: str = "copurchase") -> str:
    return (
        f"WITH{_graph_prelude(graph)},{DEGREES},{ORIENTED}\n"
        "SELECT COUNT(*) AS n_triangles\n"
        "FROM o a\n"
        "JOIN o b ON a.src = b.src\n"
        "  AND (a.ddeg < b.ddeg OR (a.ddeg = b.ddeg AND a.dst < b.dst))\n"
        "JOIN o c ON c.src = a.dst AND c.dst = b.dst"
    )


def triangles_per_vertex_sql(graph: str = "copurchase") -> str:
    return (
        f"WITH{_graph_prelude(graph)},{DEGREES},{ORIENTED},\n"
        "  t AS (\n"
        "    SELECT a.src AS u, a.dst AS v, b.dst AS w\n"
        "    FROM o a\n"
        "    JOIN o b ON a.src = b.src\n"
        "      AND (a.ddeg < b.ddeg OR (a.ddeg = b.ddeg AND a.dst < b.dst))\n"
        "    JOIN o c ON c.src = a.dst AND c.dst = b.dst\n"
        "  ),\n"
        "  ends AS (SELECT u AS id FROM t UNION ALL SELECT v FROM t"
        " UNION ALL SELECT w FROM t)\n"
        "SELECT id, COUNT(*) AS n_tri FROM ends GROUP BY id"
    )


def clique4_count_sql(graph: str = "copurchase") -> str:
    """4-cliques via the oriented DAG: base vertex a ≺ b ≺ c ≺ d; the
    (deg,id) order among b,c,d is re-established from the carried ddeg."""
    lt = lambda x, y: (  # noqa: E731
        f"({x}.ddeg < {y}.ddeg OR ({x}.ddeg = {y}.ddeg AND {x}.dst < {y}.dst))"
    )
    # Join order matters enormously on dense graphs: close the (a,b,c)
    # triangle BEFORE extending to d, so the intermediate is the triangle
    # set, not the (wedge × out-degree) cross product.
    oriented_mat = ORIENTED.replace("o AS (", "o AS MATERIALIZED (")
    return (
        f"WITH{_graph_prelude(graph)},{DEGREES},{oriented_mat}\n"
        "SELECT COUNT(*) AS n_cliques\n"
        "FROM o ab\n"
        f"JOIN o ac ON ac.src = ab.src AND {lt('ab', 'ac')}\n"
        "JOIN o bc ON bc.src = ab.dst AND bc.dst = ac.dst\n"
        f"JOIN o ad ON ad.src = ab.src AND {lt('ac', 'ad')}\n"
        "JOIN o bd ON bd.src = ab.dst AND bd.dst = ad.dst\n"
        "JOIN o cd ON cd.src = ac.dst AND cd.dst = ad.dst"
    )


def motifs3_vi_sql(graph: str = "copurchase") -> str:
    """Vertex-induced 3-motif counts: triangles directly; induced paths =
    wedges − 3·triangles (the back-substitution conversion in SQL)."""
    return (
        f"WITH{_graph_prelude(graph)},{DEGREES},{ORIENTED},\n"
        "  tri AS (\n"
        "    SELECT COUNT(*) AS t FROM o a\n"
        "    JOIN o b ON a.src = b.src\n"
        "      AND (a.ddeg < b.ddeg OR (a.ddeg = b.ddeg AND a.dst < b.dst))\n"
        "    JOIN o c ON c.src = a.dst AND c.dst = b.dst\n"
        "  ),\n"
        "  wed AS (SELECT CAST(SUM(CAST(deg AS HUGEINT) * (deg - 1) // 2) AS BIGINT) AS w FROM d)\n"
        "SELECT 'triangle' AS motif, t AS n FROM tri\n"
        "UNION ALL\n"
        "SELECT 'path3' AS motif, w - 3 * t AS n FROM wed CROSS JOIN tri"
    )


def star_count_sql(k: int, graph: str = "copurchase") -> str:
    """Closed-form k-star count: Σ_v C(deg(v), k) (binomial shortcut).
    Exact HUGEINT falling factorial // k! — the integer division is exact
    (binomials are integers), mirroring the engine's decimal(38,0) math."""
    import math

    num = " * ".join(f"(CAST(deg AS HUGEINT) - {i})" for i in range(k))
    return (
        f"WITH{_graph_prelude(graph)},{DEGREES}\n"
        f"SELECT CAST(COALESCE(SUM(CASE WHEN deg >= {k} THEN "
        f"({num}) // {math.factorial(k)} ELSE 0 END), 0) AS BIGINT)"
        " AS n_matches\nFROM d"
    )


LAB_COPURCHASE = """
  lab AS (
    SELECT p_partkey AS id, CAST(substring(p_brand, 7) AS INT) AS label
    FROM part
  )"""

LAB_EVENTS = """
  lab AS (
    SELECT DISTINCT user_id AS id, CAST(user_id % 5 AS INT) AS label
    FROM events
  )"""


def _lab(graph: str) -> str:
    return LAB_COPURCHASE if graph == "copurchase" else LAB_EVENTS



def _graph_prelude_sparse(graph: str, mod: int | None) -> str:
    """Graph prelude with an optional deterministic (src+dst) % mod
    sparsification applied BEFORE the undirected closure."""
    base = E_COPURCHASE if graph == "copurchase" else E_EVENTS
    if not mod:
        return base + "," + U_CLOSURE
    return (
        base
        + f""",
  ef AS (SELECT src, dst FROM e WHERE (src + dst) % {mod} = 0),"""
        + U_CLOSURE.replace("FROM e", "FROM ef")
    )

def _mat(prelude: str) -> str:
    """Force MATERIALIZED on the shared graph/label CTEs: the MNI shape
    queries reference u/lab several times each, and DuckDB's default
    inlining re-derives the (windowed, DISTINCT) base per reference —
    measured 114 s → ~2 s on the events 4-path supports."""
    for name in ("ev", "e", "u", "lab"):
        prelude = prelude.replace(
            f"  {name} AS (", f"  {name} AS MATERIALIZED ("
        )
    return prelude


TRI_ID_ORDER = """
  tri3 AS (
    SELECT a.src AS v1, a.dst AS v2, b.dst AS v3
    FROM e a
    JOIN e b ON b.src = a.src AND b.dst > a.dst
    JOIN e c ON c.src = a.dst AND c.dst = b.dst
  )"""


def _clique_joins(k: int, ot: str = "o") -> str:
    """Oriented-DAG k-clique join chain over `ot` (a ≺ b ≺ c ≺ ... by
    the carried (ddeg, dst) order) — generalizes the k=4 chain."""
    lt = lambda x, y: (  # noqa: E731
        f"({x}.ddeg < {y}.ddeg OR ({x}.ddeg = {y}.ddeg AND {x}.dst < {y}.dst))"
    )
    names = "bcdefghi"
    parts = [f"FROM {ot} ab"]
    prev = "ab"
    for i in range(1, k - 1):
        v = names[i]
        parts.append(f"JOIN {ot} a{v} ON a{v}.src = ab.src AND {lt(prev, 'a' + v)}")
        for j in range(1, i):
            w = names[j]
            parts.append(f"JOIN {ot} {w}{v} ON {w}{v}.src = a{w}.dst AND {w}{v}.dst = a{v}.dst")
        parts.append(f"JOIN {ot} b{v} ON b{v}.src = ab.dst AND b{v}.dst = a{v}.dst")
        prev = f"a{v}"
    return "\n".join(parts)


def clique_count_sql(k: int, graph: str = "copurchase") -> str:
    """k-clique count via the oriented DAG join chain (k ≥ 3)."""
    oriented_mat = ORIENTED.replace("o AS (", "o AS MATERIALIZED (")
    return (
        f"WITH{_graph_prelude(graph)},{DEGREES},{oriented_mat}\n"
        f"SELECT COUNT(*) AS n_cliques\n{_clique_joins(k)}"
    )


def motifs4_vi_sql(graph: str = "copurchase") -> str:
    """Vertex-induced 4-motif counts: edge-induced counts from join-based
    identities, then the D5 back-substitution EXPANDED to closed formulas
    (containment matrix from the 4-vertex catalog: K4 ⊇ 6 diamonds,
    3 C4s, 12 tailed, 12 P4s, 4 stars; diamond ⊇ 1 C4, 4 tailed, 6 P4s,
    2 stars; C4 ⊇ 4 P4s; tailed ⊇ 2 P4s, 1 star):
      v_k4   = K
      v_dia  = D − 6K
      v_c4   = C − D + 3K
      v_tail = T − 4D + 12K
      v_star = S − T + 2D − 4K
      v_path = P − 2T − 4C + 6D − 12K
    This formulation is independent of the engine's sequential
    num_mappings substitution — an algebra error on either side breaks
    the hash match."""
    oriented_mat = ORIENTED.replace("o AS (", "o AS MATERIALIZED (")
    return f"""WITH{_graph_prelude(graph)},{DEGREES},{oriented_mat},
  tri AS (
    SELECT a.src AS x, a.dst AS y, b.dst AS z
    FROM o a
    JOIN o b ON a.src = b.src
      AND (a.ddeg < b.ddeg OR (a.ddeg = b.ddeg AND a.dst < b.dst))
    JOIN o c ON c.src = a.dst AND c.dst = b.dst
  ),
  ntri AS (SELECT COUNT(*) AS t FROM tri),
  tv AS (
    SELECT id, COUNT(*) AS t FROM (
      SELECT x AS id FROM tri UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri
    ) GROUP BY id
  ),
  te AS (
    SELECT a, b, COUNT(*) AS t FROM (
      SELECT LEAST(x, y) AS a, GREATEST(x, y) AS b FROM tri
      UNION ALL SELECT LEAST(x, z), GREATEST(x, z) FROM tri
      UNION ALL SELECT LEAST(y, z), GREATEST(y, z) FROM tri
    ) GROUP BY a, b
  ),
  codeg AS (
    SELECT a.nbr AS x, b.nbr AS y, COUNT(*) AS n
    FROM u a JOIN u b ON a.id = b.id AND a.nbr < b.nbr
    GROUP BY 1, 2
  ),
  es AS (
    SELECT
      (SELECT CAST(COALESCE(SUM(
         CAST(deg AS HUGEINT) * (deg - 1) * (deg - 2) // 6), 0) AS BIGINT)
       FROM d WHERE deg >= 3) AS s4,
      (SELECT CAST(SUM(CAST(ds.deg - 1 AS HUGEINT) * (dd.deg - 1)) AS BIGINT)
       FROM e JOIN d ds ON ds.id = e.src JOIN d dd ON dd.id = e.dst)
        - 3 * (SELECT t FROM ntri) AS p4,
      (SELECT CAST(COALESCE(SUM(tv.t * (d.deg - 2)), 0) AS BIGINT)
       FROM tv JOIN d ON d.id = tv.id) AS tl,
      (SELECT CAST(COALESCE(SUM(CAST(t AS HUGEINT) * (t - 1) // 2), 0) AS BIGINT)
       FROM te) AS dia,
      (SELECT CAST(COALESCE(SUM(CAST(n AS HUGEINT) * (n - 1) // 2), 0) // 2 AS BIGINT)
       FROM codeg) AS c4,
      (SELECT COUNT(*) {_clique_joins(4)}) AS k4
  )
SELECT motif, n FROM (
  SELECT 'clique4' AS motif, k4 AS n FROM es
  UNION ALL SELECT 'diamond', dia - 6 * k4 FROM es
  UNION ALL SELECT 'cycle4', c4 - dia + 3 * k4 FROM es
  UNION ALL SELECT 'tailed_triangle', tl - 4 * dia + 12 * k4 FROM es
  UNION ALL SELECT 'star4', s4 - tl + 2 * dia - 4 * k4 FROM es
  UNION ALL SELECT 'path4', p4 - 2 * tl - 4 * c4 + 6 * dia - 12 * k4 FROM es
)"""


def _automorphism_count(pattern) -> int:
    """|Aut(pattern)| by brute force over ≤ 6 vertices — used to convert
    injective-embedding counts into occurrence counts (count / |Aut|),
    deliberately INDEPENDENT of the engine's symmetry-condition machinery."""
    from itertools import permutations

    vs = list(pattern.vertices)
    es = {frozenset(e) for e in pattern.edges}
    n = 0
    for perm in permutations(vs):
        m = dict(zip(vs, perm))
        if {frozenset((m[a], m[b])) for a, b in pattern.edges} == es:
            n += 1
    return n


def _embedding_chain_sql(pattern, utable: str, vertex_induced: bool) -> str:
    """Subquery counting occurrences of `pattern` as an explicit join
    chain over the undirected view `utable(id, nbr)`: one join per pattern
    edge, <> predicates for distinctness, NOT EXISTS per non-edge when
    vertex_induced. Counts ALL injective embeddings then divides by
    |Aut| — a formulation independent of both the engine's matcher
    (symmetry-broken join order) and its D5 back-substitution."""
    vs = sorted(pattern.vertices)
    edges = [tuple(sorted(e)) for e in pattern.edges]
    # BFS matching order so each join introduces one adjacent vertex
    order = [vs[0]]
    while len(order) < len(vs):
        nxt = next(
            v for v in vs
            if v not in order and any(q in pattern.neighbours(v) for q in order)
        )
        order.append(nxt)
    expr: dict[int, str] = {}
    joins: list[str] = []
    used: set[tuple[int, int]] = set()
    t = 0
    for i, p in enumerate(order):
        if i == 0:
            continue
        q = next(q for q in order[:i] if q in pattern.neighbours(p))
        if i == 1:
            joins.append(f"{utable} t0")
            expr[q] = "t0.id"
            expr[p] = "t0.nbr"
        else:
            joins.append(f"JOIN {utable} t{t} ON t{t}.id = {expr[q]}")
            expr[p] = f"t{t}.nbr"
        used.add(tuple(sorted((q, p))))
        t += 1
        # close any remaining pattern edges between p and already-matched
        for r in order[:i]:
            e = tuple(sorted((r, p)))
            if e in edges and e not in used:
                joins.append(
                    f"JOIN {utable} t{t} ON t{t}.id = {expr[r]} "
                    f"AND t{t}.nbr = {expr[p]}"
                )
                used.add(e)
                t += 1
    preds: list[str] = []
    for i, a in enumerate(vs):
        for b in vs[i + 1 :]:
            e = tuple(sorted((a, b)))
            if e in edges:
                continue
            preds.append(f"{expr[a]} <> {expr[b]}")
            if vertex_induced:
                preds.append(
                    f"NOT EXISTS (SELECT 1 FROM {utable} w "
                    f"WHERE w.id = {expr[a]} AND w.nbr = {expr[b]})"
                )
    where = ("WHERE " + "\n      AND ".join(preds)) if preds else ""
    aut = _automorphism_count(pattern)
    return (
        f"SELECT CAST(COUNT(*) // {aut} AS BIGINT) AS n\n"
        f"    FROM {chr(10).join('    ' + j for j in joins).lstrip()}\n"
        f"    {where}"
    )


def _fall_sql(s: str, t: int, denom: int = 1) -> str:
    """Falling factorial (s)_t [// denom] in BIGINT SQL. For integer
    s ≥ 0 the product self-zeroes below t (one factor is exactly 0), so
    no CASE guard is needed — callers clamp s with GREATEST(·, 0).
    BIGINT keeps the per-row arithmetic an order of magnitude faster than
    HUGEINT; DuckDB raises loudly on BIGINT overflow (the SQL analog of
    the engine's decimal(38,0) raise guard), and the aggregate SUM over
    rows widens to HUGEINT automatically."""
    if t == 0:
        return "CAST(1 AS BIGINT)"
    prod = " * ".join(
        [f"CAST(({s}) AS BIGINT)"] + [f"(({s}) - {i})" for i in range(1, t)]
    )
    expr = f"({prod})"
    if denom > 1:
        expr = f"({expr} // {denom})"
    return expr


def _group_count_subquery(
    pattern, plan, ug: str, degt: str, codegt: str, pairw: str = "pairw"
) -> str:
    """Single-value subquery (… AS n) counting EDGE-induced occurrences
    of an unlabelled pattern via the same ALGEBRA as the engine's group
    counter (operators/groups.py) but written independently in SQL: core
    join chain (unbroken ordered-injective), candidate counts from
    degree/codegree lookups or a grouped fan-out, Venn-atom
    inclusion-exclusion, final // |Aut|. Expects shared CTEs
    `ug(id, nbr)`, `degt(id, d)`, `codegt(x, y, cd)`."""
    import itertools as it
    import math

    core, groups = plan
    m = len(groups)
    t = [len(g[0]) for g in groups]
    subsets = [
        frozenset(J) for r in range(1, m + 1) for J in it.combinations(range(m), r)
    ]
    nu_of = {J: frozenset().union(*[groups[g][1] for g in J]) for J in subsets}
    nus = list(dict.fromkeys(nu_of.values()))

    # ---- core CTE: equality joins only (hash-joinable), <> residue
    if len(core) == 1:
        core_cte = (
            f"core AS (SELECT DISTINCT id AS v{core[0]} FROM {ug})"
        )
    else:
        expr: dict[int, str] = {core[0]: "e0.id", core[1]: "e0.nbr"}
        joins = [f"{ug} e0"]
        ti = 1
        for i in range(2, len(core)):
            p = core[i]
            nbrs = [q for q in core[:i] if q in pattern.neighbours(p)]
            seed, rest = nbrs[0], nbrs[1:]
            joins.append(f"JOIN {ug} e{ti} ON e{ti}.id = {expr[seed]}")
            expr[p] = f"e{ti}.nbr"
            ti += 1
            for q in rest:
                joins.append(
                    f"JOIN {ug} e{ti} ON e{ti}.id = {expr[q]} AND e{ti}.nbr = {expr[p]}"
                )
                ti += 1
        preds = []
        for i, p in enumerate(core):
            for q in core[:i]:
                if q not in pattern.neighbours(p):
                    preds.append(f"{expr[q]} <> {expr[p]}")
        where = ("\n  WHERE " + " AND ".join(preds)) if preds else ""
        sel = ", ".join(f"{expr[p]} AS v{p}" for p in core)
        core_cte = f"core AS (\n  SELECT {sel}\n  FROM {' '.join(joins)}{where})"

    core_cols = ", ".join(f"v{p}" for p in core)

    # ---- per-NU raw candidate counts + flags, as join clauses on core
    ctes = [core_cte]
    flow_joins: list[str] = []
    raw_expr: dict[frozenset, str] = {}
    needs_corr: set[frozenset] = set()
    flag_expr: dict[tuple[int, int], str] = {}
    ji = 0
    for nu in nus:
        qlist = sorted(nu)
        if len(nu) == 1:
            flow_joins.append(f"LEFT JOIN {degt} dg{ji} ON dg{ji}.id = core.v{qlist[0]}")
            raw_expr[nu] = f"COALESCE(dg{ji}.d, 0)"
            needs_corr.add(nu)
        elif len(nu) == 2:
            flow_joins.append(
                f"LEFT JOIN {codegt} cg{ji} ON cg{ji}.x = core.v{qlist[0]}"
                f" AND cg{ji}.y = core.v{qlist[1]}"
            )
            raw_expr[nu] = f"COALESCE(cg{ji}.cd, 0)"
            needs_corr.add(nu)
        else:
            # seed the fan-out from the common-neighbour PAIR LIST
            # (codeg-sized first hop, not deg-sized — the dense-cluster
            # killer): pairw(w, x, y) is a prebuilt CTE, so the planner
            # CANNOT fan a single vertex's whole adjacency first
            w_joins = [
                f"JOIN {pairw} pw ON pw.x = core.v{qlist[0]} AND pw.y = core.v{qlist[1]}"
            ]
            for j, q in enumerate(qlist[2:], start=2):
                w_joins.append(
                    f"JOIN {ug} w{j} ON w{j}.id = core.v{q} AND w{j}.nbr = pw.w"
                )
            w_preds = [
                f"pw.w <> core.v{p}" for p in core if p not in nu
            ]
            where = ("\n    WHERE " + " AND ".join(w_preds)) if w_preds else ""
            ctes.append(
                f"fo{ji} AS (\n    SELECT {core_cols}, COUNT(*) AS c\n"
                f"    FROM core {' '.join(w_joins)}{where}\n"
                f"    GROUP BY {core_cols})"
            )
            on = " AND ".join(f"fo{ji}.v{p} = core.v{p}" for p in core)
            flow_joins.append(f"LEFT JOIN fo{ji} ON {on}")
            raw_expr[nu] = f"COALESCE(fo{ji}.c, 0)"
        ji += 1

    fi = 0
    for nu in sorted(needs_corr, key=sorted):
        for p in core:
            if p in nu:
                continue
            for q in sorted(nu):
                key = (min(q, p), max(q, p))
                if pattern.has_edge(p, q) or key in flag_expr:
                    continue
                flow_joins.append(
                    f"LEFT JOIN {ug} fl{fi} ON fl{fi}.id = core.v{key[0]}"
                    f" AND fl{fi}.nbr = core.v{key[1]}"
                )
                flag_expr[key] = f"(CASE WHEN fl{fi}.id IS NOT NULL THEN 1 ELSE 0 END)"
                fi += 1

    def corrected(nu: frozenset) -> str:
        e = raw_expr[nu]
        if nu not in needs_corr:
            return e
        for p in core:
            if p in nu:
                continue
            factors = [
                flag_expr[(min(q, p), max(q, p))]
                for q in nu
                if not pattern.has_edge(p, q)
            ]
            e += " - " + (" * ".join(factors) if factors else "1")
        return e

    n_cols = {nu: f"n{i}" for i, nu in enumerate(nus)}
    inner = ", ".join(f"{corrected(nu)} AS {n_cols[nu]}" for nu in nus)

    # ---- set-partition inclusion–exclusion over group SLOTS (mirrors
    # groups.py _rowval): the ordered injective fill count is
    #   N_inj = Σ_P Π_{B∈P} (−1)^{|B|−1}(|B|−1)! · n(∪_{g∈B} N_g),
    # Bell(Σt) ≤ 52 terms of plain corrected counts — the previous
    # Venn-atom composition polynomial exploded to 4096 terms on four
    # singleton groups (k=7 catalog). The ordered count already carries
    # the Π t_g! ordered-pick factor, so only |Aut| divides at the end.
    slots = [g for g in range(m) for _ in range(t[g])]

    def _partitions(items):
        if not items:
            yield []
            return
        head, rest = items[0], items[1:]
        for p in _partitions(rest):
            for i in range(len(p)):
                yield p[:i] + [[head] + p[i]] + p[i + 1 :]
            yield [[head]] + p

    terms = []
    for P in _partitions(slots):
        coeff = 1
        factors = []
        for B in P:
            coeff *= (-1) ** (len(B) - 1) * math.factorial(len(B) - 1)
            factors.append(
                f"CAST({n_cols[nu_of[frozenset(B)]]} AS HUGEINT)"
            )
        prod_sql = " * ".join(factors) if factors else "CAST(1 AS HUGEINT)"
        terms.append(
            f"({coeff} * {prod_sql})" if coeff != 1 else f"({prod_sql})"
        )

    def _balanced(ts: list[str]) -> str:
        # balanced addition tree: a left-associated chain of 100+ adds
        # exceeds DuckDB's binder recursion depth
        if len(ts) == 1:
            return ts[0]
        mid = len(ts) // 2
        return f"({_balanced(ts[:mid])} + {_balanced(ts[mid:])})"

    poly = _balanced(terms)

    aut = pattern.aut_order_regular()
    cte_text = ",\n".join(ctes)
    return f"""WITH {cte_text}
SELECT CAST(COALESCE(SUM({poly}), 0) // {aut} AS BIGINT) AS n
FROM (
    SELECT {inner}
    FROM core {' '.join(flow_joins)}
) flow"""


def _is_star(pattern) -> bool:
    vs = pattern.vertices
    degs = sorted(len(pattern.neighbours(v)) for v in vs)
    return len(pattern.edges) == len(vs) - 1 and degs[-1] == len(vs) - 1


def _is_clique(pattern) -> bool:
    n = len(pattern.vertices)
    return len(pattern.edges) == n * (n - 1) // 2


def motifs_vi_catalog_sql(
    k: int, graph: str = "copurchase", mod: int | None = None
) -> str:
    """Vertex-induced k-motif counts over the (optionally sparsified)
    graph, scaling past what per-class NOT-EXISTS enumeration can reach:
    EDGE-induced counts per class (closed-form stars / oriented-DAG
    cliques / group-counting algebra / join-chain residue), then the D5
    edge→vertex-induced conversion EXPANDED driver-side into an integer
    linear combination (the unit-triangular back-substitution matrix is
    inverted symbolically, so the SQL applies one literal lincomb per
    class). Output: (motif, n)."""
    from peregrine_spark.operators.motifs import all_motifs, num_mappings

    cat = all_motifs(k)
    names = list(cat)
    sparsify = f"WHERE (src + dst) % {mod} = 0" if mod else ""
    prelude = f"""WITH{_graph_prelude(graph)},
  eg AS MATERIALIZED (SELECT src, dst FROM e {sparsify}),
  ug AS MATERIALIZED (
    SELECT src AS id, dst AS nbr FROM eg
    UNION ALL
    SELECT dst AS id, src AS nbr FROM eg
  ),
  degt AS MATERIALIZED (SELECT id, COUNT(*) AS d FROM ug GROUP BY id),
  pairw AS MATERIALIZED (
    SELECT a.id AS w, a.nbr AS x, b.nbr AS y
    FROM ug a JOIN ug b ON a.id = b.id AND a.nbr <> b.nbr
  ),
  codegt AS MATERIALIZED (
    SELECT x, y, COUNT(*) AS cd FROM pairw GROUP BY 1, 2
  ),
  o AS MATERIALIZED (
    SELECT CASE WHEN ds.d < dd.d OR (ds.d = dd.d AND eg.src < eg.dst)
                THEN eg.src ELSE eg.dst END AS src,
           CASE WHEN ds.d < dd.d OR (ds.d = dd.d AND eg.src < eg.dst)
                THEN eg.dst ELSE eg.src END AS dst,
           LEAST(ds.d, dd.d) AS sdeg,
           GREATEST(ds.d, dd.d) AS ddeg
    FROM eg
    JOIN degt ds ON ds.id = eg.src
    JOIN degt dd ON dd.id = eg.dst
  )"""

    branches = []
    for i, name in enumerate(names):
        g = cat[name]
        if _is_star(g):
            import math

            body = (
                f"SELECT COALESCE(SUM({_fall_sql('d', k - 1, math.factorial(k - 1))}), 0) AS n"
                f" FROM degt"
            )
        elif _is_clique(g):
            body = f"SELECT COUNT(*) AS n\n{_clique_joins(k)}"
        else:
            plan = g.group_count_plan()
            use_groups = plan is not None and (
                sum(len(mm) for mm, _ in plan[1]) >= 2
                or len(plan[1][0][1]) <= 2
            )
            if use_groups:
                body = _group_count_subquery(g, plan, "ug", "degt", "codegt")
            else:
                body = _embedding_chain_sql(g, "ug", vertex_induced=False)
        branches.append(f"SELECT {i} AS mi, n FROM (\n{body}\n)")

    union = "\nUNION ALL\n".join(branches)

    # symbolic back-substitution: v[name] = Σ coeff · e[other]
    order = sorted(cat, key=lambda n: -len(cat[n].edges))
    coeffs: dict[str, dict[str, int]] = {}
    for i, name in enumerate(order):
        c = {name: 1}
        for denser in order[:i]:
            km = num_mappings(cat[denser], cat[name])
            if km:
                for nm, cv in coeffs[denser].items():
                    c[nm] = c.get(nm, 0) - km * cv
        coeffs[name] = c
    idx = {name: i for i, name in enumerate(names)}
    wide_cols = ", ".join(
        f"SUM(CASE WHEN mi = {i} THEN CAST(n AS HUGEINT) END) AS e_{i}"
        for i in range(len(names))
    )
    outs = []
    for name in names:
        lin = " + ".join(
            f"({cv}) * e_{idx[nm]}" for nm, cv in sorted(coeffs[name].items())
        )
        outs.append(f"SELECT '{name}' AS motif, CAST({lin} AS BIGINT) AS n FROM wide")
    out_union = "\nUNION ALL\n".join(outs)
    return f"""{prelude},
  ec AS MATERIALIZED (
{union}
  ),
  wide AS (SELECT {wide_cols} FROM ec)
{out_union}"""


def motifs_ei_subset_sql(
    k: int,
    names: list[str],
    graph: str = "copurchase",
    mod: int | None | dict[str, int | None] = None,
) -> str:
    """EDGE-induced counts for a SUBSET of the k-motif catalog (no D5
    conversion — edge-induced counts are per-class self-contained, so a
    subset can run on graphs where the full catalog's heaviest class is
    oracle-bound). Same per-class strategy split as the full catalog
    oracle (closed-form stars / oriented cliques / group-count algebra).

    `mod` sparsifies with (src+dst) % mod == 0 — either one density for
    every class, or a dict {class: mod} assigning each class its own
    density (big sparse cores need sparser graphs than cheap small-core
    classes; one prelude table-set is generated per distinct density,
    and pairw/codegt — the quadratic tables — only for densities that a
    group-count class actually uses)."""
    import itertools as it
    import math

    from peregrine_spark.operators.motifs import all_motifs

    cat = all_motifs(k)
    mod_of = (
        {n: mod.get(n) for n in names}
        if isinstance(mod, dict)
        else {n: mod for n in names}
    )

    def strategy(g):
        if _is_star(g):
            return "star"
        if _is_clique(g):
            return "clique"
        # group classes where some subset-union of candidate N-sets has
        # >=3 vertices need the raw common-neighbour pair list (pairw)
        # for the fan-out seed (same per-nu rule as
        # _group_count_subquery); the rest only read codegt — pairw is
        # the big table, skip it where unused
        plan = g.group_count_plan()
        if plan is None:
            raise ValueError(
                "motifs_ei_subset_sql: class is neither star nor clique "
                "and has no group-count plan — no oracle strategy for it"
            )
        _, groups = plan
        m = len(groups)
        for r in range(1, m + 1):
            for J in it.combinations(range(m), r):
                if len(frozenset().union(*[groups[j][1] for j in J])) >= 3:
                    return "group_fanout"
        return "group"

    needs = {}  # mod -> set of strategies at that density
    for n in names:
        needs.setdefault(mod_of[n], set()).add(strategy(cat[n]))

    parts = [f"WITH{_mat(_graph_prelude(graph))}"]
    suffix = {}
    for m, strats in sorted(needs.items(), key=lambda kv: kv[0] or 0):
        s = f"_{m}" if m else "_full"
        suffix[m] = s
        sparsify = f"WHERE (src + dst) % {m} = 0" if m else ""
        parts.append(f"""  eg{s} AS MATERIALIZED (SELECT src, dst FROM e {sparsify}),
  ug{s} AS MATERIALIZED (
    SELECT src AS id, dst AS nbr FROM eg{s}
    UNION ALL
    SELECT dst AS id, src AS nbr FROM eg{s}
  ),
  degt{s} AS MATERIALIZED (SELECT id, COUNT(*) AS d FROM ug{s} GROUP BY id)""")
        if "group_fanout" in strats:
            parts.append(f"""  pairw{s} AS MATERIALIZED (
    SELECT a.id AS w, a.nbr AS x, b.nbr AS y
    FROM ug{s} a JOIN ug{s} b ON a.id = b.id AND a.nbr <> b.nbr
  ),
  codegt{s} AS MATERIALIZED (
    SELECT x, y, COUNT(*) AS cd FROM pairw{s} GROUP BY 1, 2
  )""")
        elif "group" in strats:
            parts.append(f"""  codegt{s} AS MATERIALIZED (
    SELECT x, y, COUNT(*) AS cd FROM (
      SELECT a.nbr AS x, b.nbr AS y
      FROM ug{s} a JOIN ug{s} b ON a.id = b.id AND a.nbr <> b.nbr
    ) GROUP BY 1, 2
  )""")
        if "clique" in strats:
            parts.append(f"""  o{s} AS MATERIALIZED (
    SELECT CASE WHEN ds.d < dd.d OR (ds.d = dd.d AND eg{s}.src < eg{s}.dst)
                THEN eg{s}.src ELSE eg{s}.dst END AS src,
           CASE WHEN ds.d < dd.d OR (ds.d = dd.d AND eg{s}.src < eg{s}.dst)
                THEN eg{s}.dst ELSE eg{s}.src END AS dst,
           LEAST(ds.d, dd.d) AS sdeg,
           GREATEST(ds.d, dd.d) AS ddeg
    FROM eg{s}
    JOIN degt{s} ds ON ds.id = eg{s}.src
    JOIN degt{s} dd ON dd.id = eg{s}.dst
  )""")
    prelude = ",\n".join(parts)
    branches = []
    for name in names:
        g = cat[name]
        s = suffix[mod_of[name]]
        if _is_star(g):
            body = (
                f"SELECT COALESCE(SUM({_fall_sql('d', k - 1, math.factorial(k - 1))}), 0) AS n"
                f" FROM degt{s}"
            )
        elif _is_clique(g):
            body = f"SELECT COUNT(*) AS n\n{_clique_joins(k, 'o' + s)}"
        else:
            body = _group_count_subquery(
                g, g.group_count_plan(), f"ug{s}", f"degt{s}", f"codegt{s}",
                pairw=f"pairw{s}",
            )
        branches.append(
            f"SELECT '{name}' AS motif, CAST(n AS BIGINT) AS n FROM (\n{body}\n)"
        )
    union = "\nUNION ALL\n".join(branches)
    return f"{prelude}\n{union}"


def motifs5_vi_sparse_sql(graph: str = "copurchase", mod: int = 16) -> str:
    """Vertex-induced 5-motif counts on the deterministically sparsified
    graph ((src + dst) % mod = 0) — reference parity for the 5-motif
    integration tests (core/integrationtests/Counting_test.hh:30-50,
    truth/5m.txt). Per-motif explicit join chains + NOT EXISTS anti-edges
    + |Aut| division; the engine side counts edge-induced via the generic
    matcher and converts with D5 back-substitution — fully independent
    formulations."""
    from peregrine_spark.operators.motifs import all_motifs

    cat = all_motifs(5)
    subqueries = []
    for name, g in cat.items():
        body = _embedding_chain_sql(g, "u2", vertex_induced=True)
        subqueries.append(
            f"SELECT '{name}' AS motif, n FROM (\n    {body}\n)"
        )
    union = "\nUNION ALL\n".join(subqueries)
    # MATERIALIZED: 21 subqueries share u2 — inlining would re-derive the
    # base-table self-join once per chain
    return f"""WITH{_graph_prelude(graph)},
  e2 AS MATERIALIZED (SELECT src, dst FROM e WHERE (src + dst) % {mod} = 0),
  u2 AS MATERIALIZED (
    SELECT src AS id, dst AS nbr FROM e2
    UNION ALL
    SELECT dst AS id, src AS nbr FROM e2
  )
{union}"""


def open_wedge_anti_sql(graph: str = "copurchase") -> str:
    """Induced open wedge (path3 with an anti-edge between the endpoints)
    = wedges − 3·triangles — the independent closed form checking the
    generic matcher's left_anti plan."""
    return (
        f"WITH{_graph_prelude(graph)},{DEGREES},{ORIENTED},\n"
        "  tri AS (\n"
        "    SELECT COUNT(*) AS t FROM o a\n"
        "    JOIN o b ON a.src = b.src\n"
        "      AND (a.ddeg < b.ddeg OR (a.ddeg = b.ddeg AND a.dst < b.dst))\n"
        "    JOIN o c ON c.src = a.dst AND c.dst = b.dst\n"
        "  ),\n"
        "  wed AS (SELECT CAST(SUM(CAST(deg AS HUGEINT) * (deg - 1) // 2) AS BIGINT) AS w FROM d)\n"
        "SELECT w - 3 * t AS n_matches FROM wed CROSS JOIN tri"
    )


def edge_no_triangle_sql(graph: str = "copurchase") -> str:
    """Edges with NO common neighbour (the anti-vertex NOT-EXISTS pattern:
    edge(1,2) + anti-vertex 3 anti-adjacent to both) — the oracle uses a
    plain NOT EXISTS, independent of the engine's count-equality plan."""
    return (
        f"WITH{_graph_prelude(graph)}\n"
        "SELECT COUNT(*) AS n_matches FROM e\n"
        "WHERE NOT EXISTS (\n"
        "  SELECT 1 FROM u u1 JOIN u u2 ON u1.nbr = u2.nbr\n"
        "  WHERE u1.id = e.src AND u2.id = e.dst\n"
        ")"
    )


def labelled_triangle_sql(la: int, lb: int, lc: int, graph: str = "copurchase") -> str:
    """Triangles whose corner labels form exactly the multiset
    {la, lb, lc} (distinct labels → trivial automorphism group, one count
    per triangle)."""
    want = sorted([la, lb, lc])
    return (
        f"WITH{_graph_prelude(graph)},{_lab(graph)},{TRI_ID_ORDER}\n"
        "SELECT COUNT(*) AS n_matches\n"
        "FROM tri3\n"
        "JOIN lab lx ON lx.id = v1\nJOIN lab ly ON ly.id = v2\n"
        "JOIN lab lz ON lz.id = v3\n"
        f"WHERE list_sort([lx.label, ly.label, lz.label]) = {want}"
    )


def edge_labels_sql(graph: str = "copurchase") -> str:
    """Canonical label-pair frequencies over undirected edges (C9/D7)."""
    return (
        f"WITH{_graph_prelude(graph)},{_lab(graph)}\n"
        "SELECT LEAST(a.label, b.label) AS l1, GREATEST(a.label, b.label) AS l2,\n"
        "       COUNT(*) AS n\n"
        "FROM e JOIN lab a ON a.id = e.src JOIN lab b ON b.id = e.dst\n"
        "GROUP BY 1, 2"
    )


def star2_labels_sql(graph: str = "copurchase") -> str:
    """2-star label discovery: (center_label, sorted leaf labels, n)."""
    return (
        f"WITH{_graph_prelude(graph)},{_lab(graph)}\n"
        "SELECT lc.label AS center_label,\n"
        "       LEAST(lx.label, ly.label) AS l1,\n"
        "       GREATEST(lx.label, ly.label) AS l2, COUNT(*) AS n\n"
        "FROM u a JOIN u b ON a.id = b.id AND a.nbr < b.nbr\n"
        "JOIN lab lc ON lc.id = a.id\n"
        "JOIN lab lx ON lx.id = a.nbr\nJOIN lab ly ON ly.id = b.nbr\n"
        "GROUP BY 1, 2, 3"
    )


def star3_labels_sql(graph: str = "events") -> str:
    """3-star label discovery: (center_label, sorted leaf labels, n)."""
    return (
        f"WITH{_graph_prelude(graph)},{_lab(graph)},\n"
        "  s AS (\n"
        "    SELECT a.id AS c, a.nbr AS x, b.nbr AS y, c3.nbr AS z\n"
        "    FROM u a\n"
        "    JOIN u b ON a.id = b.id AND a.nbr < b.nbr\n"
        "    JOIN u c3 ON a.id = c3.id AND b.nbr < c3.nbr\n"
        "  ),\n"
        "  sl AS (\n"
        "    SELECT lc.label AS center_label,\n"
        "           list_sort([lx.label, ly.label, lz.label]) AS ls\n"
        "    FROM s JOIN lab lc ON lc.id = s.c\n"
        "    JOIN lab lx ON lx.id = s.x\nJOIN lab ly ON ly.id = s.y\n"
        "    JOIN lab lz ON lz.id = s.z\n"
        "  )\n"
        "SELECT center_label, ls[1] AS l1, ls[2] AS l2, ls[3] AS l3,\n"
        "       COUNT(*) AS n\nFROM sl GROUP BY 1, 2, 3, 4"
    )


def mni_edge_supports_sql(graph: str = "copurchase", mod: int | None = None) -> str:
    """MNI support of every labelled single-edge pattern (D11): min over
    automorphism-orbit domains; l1 = l2 merges both endpoint positions
    into one orbit."""
    return (
        f"WITH{_mat(_graph_prelude_sparse(graph, mod))},{_mat(_lab(graph))},\n"
        "  occ AS (\n"
        "    SELECT u.id AS src, la.label AS l_src, lb.label AS l_dst\n"
        "    FROM u JOIN lab la ON la.id = u.id JOIN lab lb ON lb.id = u.nbr\n"
        "  )\n"
        "SELECT LEAST(l_src, l_dst) AS l1, GREATEST(l_src, l_dst) AS l2,\n"
        "  LEAST(\n"
        "    COUNT(DISTINCT CASE WHEN l_src = LEAST(l_src, l_dst) THEN src END),\n"
        "    COUNT(DISTINCT CASE WHEN l_src = GREATEST(l_src, l_dst) THEN src END)\n"
        "  ) AS support\n"
        "FROM occ WHERE l_src <> l_dst GROUP BY 1, 2\n"
        "UNION ALL\n"
        "SELECT l_src, l_dst, COUNT(DISTINCT src) FROM occ\n"
        "WHERE l_src = l_dst GROUP BY 1, 2"
    )


def mni_star2_supports_sql(graph: str = "events", mod: int | None = None) -> str:
    """MNI supports of labelled 2-stars: min over orbit domains, with the
    leaf orbit merging both positions when l1 = l2."""
    return (
        f"WITH{_mat(_graph_prelude_sparse(graph, mod))},{_mat(_lab(graph))},\n"
        "  w AS (\n"
        "    SELECT a.id AS c, a.nbr AS x, b.nbr AS y\n"
        "    FROM u a JOIN u b ON a.id = b.id AND a.nbr < b.nbr\n"
        "  ),\n"
        "  wl AS (\n"
        "    SELECT lc.label AS cl, LEAST(lx.label, ly.label) AS l1,\n"
        "           GREATEST(lx.label, ly.label) AS l2, c, x, y,\n"
        "           lx.label AS xl, ly.label AS yl\n"
        "    FROM w JOIN lab lc ON lc.id = w.c\n"
        "    JOIN lab lx ON lx.id = w.x JOIN lab ly ON ly.id = w.y\n"
        "  ),\n"
        "  ex AS (\n"
        "    SELECT cl, l1, l2, c, x AS v, xl AS vl FROM wl\n"
        "    UNION ALL SELECT cl, l1, l2, c, y, yl FROM wl\n"
        "  )\n"
        "SELECT cl AS center_label, l1, l2,\n"
        "  CAST(LEAST(COUNT(DISTINCT c),\n"
        "       COUNT(DISTINCT CASE WHEN vl = l1 THEN v END),\n"
        "       COUNT(DISTINCT CASE WHEN vl = l2 THEN v END)) AS BIGINT)\n"
        "    AS support\n"
        "FROM ex GROUP BY 1, 2, 3"
    )


def sparse_pattern_count_sql(
    pattern, mod: int = 16, graph: str = "copurchase"
) -> str:
    """Occurrence count of an arbitrary unlabelled pattern on the
    deterministically sparsified graph — generated join chain + |Aut|
    division (vertex_induced=False: plain subgraph occurrences, matching
    the engine's edge-induced matcher)."""
    body = _embedding_chain_sql(pattern, "u2", vertex_induced=False)
    return f"""WITH{_graph_prelude(graph)},
  e2 AS MATERIALIZED (SELECT src, dst FROM e WHERE (src + dst) % {mod} = 0),
  u2 AS MATERIALIZED (
    SELECT src AS id, dst AS nbr FROM e2
    UNION ALL
    SELECT dst AS id, src AS nbr FROM e2
  )
SELECT n AS n_matches FROM (
    {body}
)"""


def cycle4_count_sql(graph: str = "copurchase") -> str:
    """Standalone 4-cycle count: the classic unoriented codegree identity
    Σ_{x<y} C(codeg(x,y), 2) / 2 — fine at oracle scale, and independent
    of the engine's oriented A/B/C wedge-class decomposition."""
    return (
        f"WITH{_graph_prelude(graph)},\n"
        "  codeg AS (\n"
        "    SELECT a.nbr AS x, b.nbr AS y, COUNT(*) AS n\n"
        "    FROM u a JOIN u b ON a.id = b.id AND a.nbr < b.nbr\n"
        "    GROUP BY 1, 2\n"
        "  )\n"
        "SELECT CAST(COALESCE(SUM(CAST(n AS HUGEINT) * (n - 1) // 2), 0) // 2\n"
        "       AS BIGINT) AS n_cycles FROM codeg"
    )


def fsm2_sql(min_support: int, graph: str = "copurchase") -> str:
    """FSM to max_edges = 2 as the union of the level-1 and level-2 MNI
    support formulations filtered at min_support (MNI anti-monotonicity
    makes that exactly the candidate-generation + filter loop — every
    frequent 2-star's sub-edges are themselves frequent)."""
    return f"""
SELECT 'edge' AS pattern, -1 AS center_label, l1, l2, support
FROM ({mni_edge_supports_sql(graph)}) WHERE support >= {min_support}
UNION ALL
SELECT 'star2' AS pattern, center_label, l1, l2, support
FROM ({mni_star2_supports_sql(graph)}) WHERE support >= {min_support}"""


def mni_triangle_supports_sql(graph: str = "events", mod: int | None = None) -> str:
    """MNI supports of labelled triangles: enumerate each triangle once
    (id-ordered), key = sorted label triple, min over per-label distinct
    vertex domains (the labelled triangle's automorphisms act
    transitively on equal-label positions)."""
    return (
        f"WITH{_mat(_graph_prelude_sparse(graph, mod))},{_mat(_lab(graph))},\n"
        "  tri AS (\n"
        "    SELECT a.id AS x, a.nbr AS y, b.nbr AS z\n"
        "    FROM u a\n"
        "    JOIN u b ON b.id = a.id AND b.nbr > a.nbr\n"
        "    JOIN u c ON c.id = a.nbr AND c.nbr = b.nbr\n"
        "    WHERE a.id < a.nbr\n"
        "  ),\n"
        "  tl AS (\n"
        "    SELECT list_sort([lx.label, ly.label, lz.label]) AS ks, x, y, z,\n"
        "           lx.label AS xl, ly.label AS yl, lz.label AS zl\n"
        "    FROM tri JOIN lab lx ON lx.id = tri.x\n"
        "    JOIN lab ly ON ly.id = tri.y JOIN lab lz ON lz.id = tri.z\n"
        "  ),\n"
        "  ex AS (\n"
        "    SELECT ks[1] AS l1, ks[2] AS l2, ks[3] AS l3, xl AS vl, x AS v FROM tl\n"
        "    UNION ALL SELECT ks[1], ks[2], ks[3], yl, y FROM tl\n"
        "    UNION ALL SELECT ks[1], ks[2], ks[3], zl, z FROM tl\n"
        "  )\n"
        "SELECT l1, l2, l3,\n"
        "  CAST(LEAST(COUNT(DISTINCT CASE WHEN vl = l1 THEN v END),\n"
        "             COUNT(DISTINCT CASE WHEN vl = l2 THEN v END),\n"
        "             COUNT(DISTINCT CASE WHEN vl = l3 THEN v END)) AS BIGINT)\n"
        "    AS support\n"
        "FROM ex GROUP BY 1, 2, 3"
    )


def mni_star3_supports_sql(graph: str = "events", mod: int | None = None) -> str:
    """MNI supports of labelled 3-stars: enumerate unordered leaf
    triples, key = (center label, sorted leaf labels), min over the
    center domain and per-leaf-label domains."""
    return (
        f"WITH{_mat(_graph_prelude_sparse(graph, mod))},{_mat(_lab(graph))},\n"
        "  st AS (\n"
        "    SELECT a.id AS c, a.nbr AS p, b.nbr AS q, c3.nbr AS r\n"
        "    FROM u a\n"
        "    JOIN u b ON b.id = a.id AND b.nbr > a.nbr\n"
        "    JOIN u c3 ON c3.id = a.id AND c3.nbr > b.nbr\n"
        "  ),\n"
        "  sl AS (\n"
        "    SELECT lc.label AS cl,\n"
        "           list_sort([lp.label, lq.label, lr.label]) AS ks,\n"
        "           c, p, q, r, lp.label AS pl, lq.label AS ql, lr.label AS rl\n"
        "    FROM st JOIN lab lc ON lc.id = st.c JOIN lab lp ON lp.id = st.p\n"
        "    JOIN lab lq ON lq.id = st.q JOIN lab lr ON lr.id = st.r\n"
        "  ),\n"
        "  ex AS (\n"
        "    SELECT cl, ks[1] AS l1, ks[2] AS l2, ks[3] AS l3, c,\n"
        "           pl AS vl, p AS v FROM sl\n"
        "    UNION ALL SELECT cl, ks[1], ks[2], ks[3], c, ql, q FROM sl\n"
        "    UNION ALL SELECT cl, ks[1], ks[2], ks[3], c, rl, r FROM sl\n"
        "  )\n"
        "SELECT cl AS center_label, l1, l2, l3,\n"
        "  CAST(LEAST(COUNT(DISTINCT c),\n"
        "             COUNT(DISTINCT CASE WHEN vl = l1 THEN v END),\n"
        "             COUNT(DISTINCT CASE WHEN vl = l2 THEN v END),\n"
        "             COUNT(DISTINCT CASE WHEN vl = l3 THEN v END)) AS BIGINT)\n"
        "    AS support\n"
        "FROM ex GROUP BY 1, 2, 3, 4"
    )


def mni_path4_supports_sql(graph: str = "events", mod: int | None = None) -> str:
    """MNI supports of labelled 4-paths: enumerate ordered injective
    4-paths (both orientations), canonicalize the label sequence by ≤
    reversal with positions remapped, min over per-position distinct
    domains (reversal images land on the same key, so the position
    domains ARE the orbit domains for palindromes too)."""
    return (
        f"WITH{_mat(_graph_prelude_sparse(graph, mod))},{_mat(_lab(graph))},\n"
        "  p4 AS (\n"
        "    SELECT e1.id AS v1, e1.nbr AS v2, e2.nbr AS v3, e3.nbr AS v4\n"
        "    FROM u e1\n"
        "    JOIN u e2 ON e2.id = e1.nbr AND e2.nbr <> e1.id\n"
        "    JOIN u e3 ON e3.id = e2.nbr AND e3.nbr <> e2.id AND e3.nbr <> e1.id\n"
        "  ),\n"
        "  pl AS (\n"
        "    SELECT CASE WHEN [l1.label, l2.label, l3.label, l4.label] <=\n"
        "                     [l4.label, l3.label, l2.label, l1.label]\n"
        "                THEN [l1.label, l2.label, l3.label, l4.label]\n"
        "                ELSE [l4.label, l3.label, l2.label, l1.label] END AS ks,\n"
        "           CASE WHEN [l1.label, l2.label, l3.label, l4.label] <=\n"
        "                     [l4.label, l3.label, l2.label, l1.label]\n"
        "                THEN [v1, v2, v3, v4] ELSE [v4, v3, v2, v1] END AS vs\n"
        "    FROM p4 JOIN lab l1 ON l1.id = p4.v1 JOIN lab l2 ON l2.id = p4.v2\n"
        "    JOIN lab l3 ON l3.id = p4.v3 JOIN lab l4 ON l4.id = p4.v4\n"
        "  ),\n"
        "  ex AS (\n"
        "    SELECT ks[1] AS l1, ks[2] AS l2, ks[3] AS l3, ks[4] AS l4,\n"
        "           i AS pos, vs[i] AS v\n"
        "    FROM pl, UNNEST([1, 2, 3, 4]) AS t(i)\n"
        "  )\n"
        "SELECT l1, l2, l3, l4,\n"
        "  CAST(LEAST(COUNT(DISTINCT CASE WHEN pos = 1 THEN v END),\n"
        "             COUNT(DISTINCT CASE WHEN pos = 2 THEN v END),\n"
        "             COUNT(DISTINCT CASE WHEN pos = 3 THEN v END),\n"
        "             COUNT(DISTINCT CASE WHEN pos = 4 THEN v END)) AS BIGINT)\n"
        "    AS support\n"
        "FROM ex GROUP BY 1, 2, 3, 4"
    )


def fsm3_sql(
    min_support: int, graph: str = "copurchase", mod: int | None = None
) -> str:
    """FSM to max_edges = 3: levels 1-2 as in fsm2_sql plus the three
    level-3 shape tables (triangle / 3-star / 4-path), each filtered at
    min_support — by MNI anti-monotonicity this IS the fsm driver loop's
    output. Encoding: (pattern, a, b, c, d, support) with -1 padding."""
    return f"""
SELECT 'edge' AS pattern, l1 AS a, l2 AS b, -1 AS c, -1 AS d, support
FROM ({mni_edge_supports_sql(graph, mod)}) WHERE support >= {min_support}
UNION ALL
SELECT 'star2', center_label, l1, l2, -1, support
FROM ({mni_star2_supports_sql(graph, mod)}) WHERE support >= {min_support}
UNION ALL
SELECT 'triangle', l1, l2, l3, -1, support
FROM ({mni_triangle_supports_sql(graph, mod)}) WHERE support >= {min_support}
UNION ALL
SELECT 'star3', center_label, l1, l2, l3, support
FROM ({mni_star3_supports_sql(graph, mod)}) WHERE support >= {min_support}
UNION ALL
SELECT 'path4', l1, l2, l3, l4, support
FROM ({mni_path4_supports_sql(graph, mod)}) WHERE support >= {min_support}"""


def exists_clique_sql(k: int, graph: str = "copurchase") -> str:
    """Existence query (C7): 1 if any k-clique exists else 0."""
    oriented_mat = ORIENTED.replace("o AS (", "o AS MATERIALIZED (")
    return (
        f"WITH{_graph_prelude(graph)},{DEGREES},{oriented_mat}\n"
        f"SELECT CAST(CASE WHEN EXISTS (SELECT 1 {_clique_joins(k)}) "
        "THEN 1 ELSE 0 END AS BIGINT) AS found"
    )


def triangles_sample_sql(limit: int = 100, graph: str = "copurchase") -> str:
    """Deterministic enumeration sample (C5): first `limit` triangles in
    (v1, v2, v3) id order."""
    return (
        f"WITH{_graph_prelude(graph)},{TRI_ID_ORDER}\n"
        f"SELECT v1, v2, v3 FROM tri3 ORDER BY v1, v2, v3 LIMIT {limit}"
    )


def partial_label_edges_sql(label: int, graph: str = "copurchase") -> str:
    """Partially-labelled edge (label, '*') grouped by the discovered
    label (D8): neighbours of label-`label` vertices whose own label is
    anything else."""
    return (
        f"WITH{_graph_prelude(graph)},{_lab(graph)}\n"
        "SELECT lb.label AS label, COUNT(*) AS n_matches\n"
        "FROM u JOIN lab la ON la.id = u.id JOIN lab lb ON lb.id = u.nbr\n"
        f"WHERE la.label = {label} AND lb.label <> {label}\n"
        "GROUP BY 1"
    )


def cc_sql(graph: str = "copurchase", k: int = CC_K) -> str:
    """Hash-min after exactly k synchronous supersteps (unrolled CTEs)."""
    parts = [f"WITH{_graph_prelude(graph)},{VERTICES},"]
    parts.append("  c0 AS (SELECT id, id AS comp FROM v)")
    for i in range(1, k + 1):
        parts.append(
            f""",
  m{i} AS (
    SELECT u.nbr AS id, MIN(c.comp) AS mc
    FROM u JOIN c{i - 1} c ON u.id = c.id GROUP BY u.nbr
  ),
  c{i} AS (
    SELECT s.id, LEAST(s.comp, COALESCE(m.mc, s.comp)) AS comp
    FROM c{i - 1} s LEFT JOIN m{i} m ON s.id = m.id
  )"""
        )
    parts.append(f"\nSELECT id, comp FROM c{k}")
    return "".join(parts)


def pagerank_sql(graph: str = "copurchase", k: int = PR_K, d: float = DAMPING) -> str:
    """PageRank over the undirected closure, exactly k supersteps, emitted
    as integer micro-units ROUND(rank*1e6). No dangling vertices exist in
    a closure (every vertex has deg ≥ 1), so no dangling term."""
    parts = [f"WITH{_graph_prelude(graph)},{DEGREES},{VERTICES},"]
    parts.append("  n AS (SELECT COUNT(*) AS n FROM v),")
    parts.append(
        "  r0 AS (SELECT v.id, 1.0 / n.n AS rank FROM v CROSS JOIN n)"
    )
    for i in range(1, k + 1):
        parts.append(
            f""",
  s{i} AS (
    SELECT u.nbr AS id, SUM(r.rank / dg.deg) AS c
    FROM u
    JOIN r{i - 1} r ON u.id = r.id
    JOIN d dg ON dg.id = u.id
    GROUP BY u.nbr
  ),
  r{i} AS (
    SELECT v.id,
           (1.0 - {d}) / n.n + {d} * COALESCE(s.c, 0.0) AS rank
    FROM v CROSS JOIN n LEFT JOIN s{i} s ON v.id = s.id
  )"""
        )
    parts.append(
        f"\nSELECT id, CAST(ROUND(rank * 1000000) AS BIGINT) AS rank_ppm FROM r{k}"
    )
    return "".join(parts)


def lp_sql(graph: str = "copurchase", k: int = LP_K) -> str:
    """Synchronous label propagation, k supersteps, min-label tie-break."""
    parts = [f"WITH{_graph_prelude(graph)},{VERTICES},"]
    parts.append("  l0 AS (SELECT id, id AS label FROM v)")
    for i in range(1, k + 1):
        parts.append(
            f""",
  t{i} AS (
    SELECT u.nbr AS id, c.label, COUNT(*) AS cnt
    FROM u JOIN l{i - 1} c ON u.id = c.id
    GROUP BY u.nbr, c.label
  ),
  b{i} AS (
    SELECT id, MIN(label) AS newlabel FROM (
      SELECT id, label, cnt, MAX(cnt) OVER (PARTITION BY id) AS mx FROM t{i}
    ) WHERE cnt = mx GROUP BY id
  ),
  l{i} AS (
    SELECT s.id, COALESCE(b.newlabel, s.label) AS label
    FROM l{i - 1} s LEFT JOIN b{i} b ON s.id = b.id
  )"""
        )
    parts.append(f"\nSELECT id, label FROM l{k}")
    return "".join(parts)
