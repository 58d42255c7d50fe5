"""peregrine_spark — a from-scratch PySpark-native link-graph analytics engine.

Re-expresses the capabilities of the reference pattern-mining system
(ygk1/peregrine, EuroSys 2020: set-intersection dataflow over sorted CSR
adjacency + symmetry-breaking orders + partial/final aggregation) as
idiomatic Spark DataFrame pipelines:

- ingest:   repo_files(repo, path, commit, lang, content) -> vertices/edges
            (mirrors core/DataConverter.cc ingest semantics: self-loop drop,
            dedupe, degree computation; sha256 row invariant carried through)
- graph ops: degrees, undirected closure, degree-ordered orientation
            (the Spark form of Peregrine's degree-desc renumbering,
            core/DataConverter.cc:283-287, + clique symmetry conditions,
            core/Graph.hh:1062-1073)
- algorithms: exact triangle counting (oriented intersection join — the
            canonical Peregrine triangle plan, core/PatternMatching.hh:1116),
            PageRank, connected components (hash-min), label propagation —
            gather-scatter supersteps with checkpoint/resume
- pattern layer: clique/motif counting compiled to join chains with
            automorphism-derived symmetry-breaking predicates (core/PO.cc)

Everything is DataFrame + vectorized pandas/Arrow UDFs; no per-row Python.
"""

__version__ = "0.1.0"
