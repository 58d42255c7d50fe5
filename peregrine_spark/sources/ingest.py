"""Ingest: ``repo_files(repo, path, commit, lang, content)`` → link graph.

The Spark restatement of the reference's ingest pipeline
(/root/reference/core/DataConverter.cc:205-464): parse raw references,
drop self-loops, dedupe, keep an id→origin map. Differences by design:

- vertex ids are 64-bit deterministic hashes ``xxhash64(repo, 0x1f, path)``
  (the reference renumbers to dense uint32, core/DataConverter.cc:279-304 —
  dense ids don't survive 10^12-file scale; degree ORDER, which is what the
  renumbering buys, is recovered per-query by operators/graph.py:orient).
- the ``sha2(content, 256)`` row invariant is carried into vertex_map
  (BASELINE.json: content sha256 equality row-for-row from ingest).
- extraction is JVM-side ``regexp_extract_all`` + explode — whole-stage
  codegen, zero Python in the hot path (faster than even a pandas UDF).

Everything here is a narrow projection + one distinct — Catalyst pushes the
column pruning into the parquet scan, so a 100 TB content column is only
read where content is actually parsed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Separator byte between repo and path inside the vertex hash. Keeps
# ("a/b", "c") and ("a", "b/c") from colliding.
VSEP = "\x1f"

# Must stay in sync with sources/synth.py content format.
REF_PATTERN = r'#include "([^"]+)"'
REF_SEP = "|"


def vertex_id(repo: Column, path: Column) -> Column:
    """Deterministic 64-bit vertex id for a (repo, path) file."""
    return F.xxhash64(repo, F.lit(VSEP), path)


def vertex_map(repo_files: DataFrame) -> DataFrame:
    """id → (repo, path, lang, sha256). The analog of ids.bin
    (/root/reference/core/DataConverter.cc:453-459) plus the sha256
    row invariant."""
    return repo_files.select(
        vertex_id(F.col("repo"), F.col("path")).alias("id"),
        "repo",
        "path",
        "lang",
        F.sha2(F.col("content"), 256).alias("sha256"),
    )


def extract_edges(repo_files: DataFrame, dedupe: bool = True) -> DataFrame:
    """Directed reference edges (src, dst): one row per ``#include`` whose
    target parses as repo|path. Self-loops dropped, duplicates deduped
    (mirrors /root/reference/core/DataConverter.cc:112-119,349-359)."""
    refs = repo_files.select(
        vertex_id(F.col("repo"), F.col("path")).alias("src"),
        F.explode(
            F.regexp_extract_all(F.col("content"), F.lit(REF_PATTERN), F.lit(1))
        ).alias("ref"),
    ).filter(F.col("ref").contains(REF_SEP))  # tolerate malformed targets
    split = F.split(F.col("ref"), r"\|", 2)
    edges = refs.select(
        "src",
        vertex_id(split.getItem(0), split.getItem(1)).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    if dedupe:
        edges = edges.distinct()
    return edges


def ingest(repo_files: DataFrame) -> dict[str, DataFrame]:
    """Full ingest: returns {vertex_map, edges}."""
    return {
        "vertex_map": vertex_map(repo_files),
        "edges": extract_edges(repo_files),
    }
