"""Worker for the N-vs-4N scaling evidence run: executes the identical
link-graph job (ingest → K PageRank supersteps → exact triangle count)
at a given core count and prints one JSON line.

Run in a fresh JVM per core count (tools/bench_scaling.py drives it).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from peregrine_spark.operators.graph import undirected  # noqa: E402
from peregrine_spark.operators.iterative import pagerank  # noqa: E402
from peregrine_spark.operators.triangles import triangle_count  # noqa: E402
from peregrine_spark.session import get_spark  # noqa: E402
from peregrine_spark.sources.ingest import extract_edges  # noqa: E402

PR_STEPS = 5


def _timed(fn) -> float:
    import time as _t

    t0 = _t.perf_counter()
    fn()
    return _t.perf_counter() - t0


def main() -> None:
    parquet, cores, shuffle = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    spark = get_spark(
        master=f"local[{cores}]",
        app_name=f"scaling-{cores}",
        shuffle_partitions=shuffle,
        extra_conf={
            "spark.driver.memory": "48g",
            # enough input splits that the scan parallelizes at 4N cores
            "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
        },
    )
    files = spark.read.parquet(parquet)

    t0 = time.perf_counter()
    edges = extract_edges(files).cache()
    n_edges = edges.count()
    ingest_wall = time.perf_counter() - t0

    und = undirected(edges).cache()
    n_und = und.count()

    # Warm-up: compile the whole-stage-codegen plans once so the timed
    # phases measure steady-state throughput, not JIT, at both core counts.
    pagerank(spark, und, tol=None, max_iter=1, resume=False)
    warm = edges.limit(50_000).cache()
    triangle_count(warm).collect()
    warm.unpersist()

    # Repeat timed phases and take the min — the sandbox VM has visible
    # noisy-neighbor variance (same job measured 66s and 119s back to
    # back); min-of-k is the standard noise-robust estimator.
    repeats = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "2"))
    pr_wall = min(
        _timed(lambda: pagerank(spark, und, tol=None, max_iter=PR_STEPS, resume=False))
        for _ in range(repeats)
    )
    tri_walls = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        n_tri = triangle_count(edges).collect()[0]["n_triangles"]
        tri_walls.append(time.perf_counter() - t0)
    tri_wall = min(tri_walls)

    print(
        json.dumps(
            {
                "cores": cores,
                "n_edges": n_edges,
                "n_und": n_und,
                "n_triangles": n_tri,
                "ingest_wall": round(ingest_wall, 2),
                "pr_supersteps": PR_STEPS,
                "pr_wall": round(pr_wall, 2),
                "pr_edges_per_sec_per_superstep": round(n_und * PR_STEPS / pr_wall),
                "tri_wall": round(tri_wall, 2),
                "tri_per_sec": round(n_tri / tri_wall),
            }
        )
    )


if __name__ == "__main__":
    main()
