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
        "  wed AS (SELECT CAST(SUM(deg * (deg - 1) / 2) AS BIGINT) AS w FROM d)\n"
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
