"""Per-stage task-time profile of a link-graph job at a given core count,
from Spark's event log (the UI is disabled in this sandbox).

For each stage: n_tasks, sum/median/max executorRunTime, and the
straggler ratio max/median. This is the stage-level evidence the scaling
analysis needs: if Σ task-time is ~equal at 8 and 32 cores but wall time
is bounded by max-task (straggler) or by vCPU overcommit, the residual
inefficiency is host/skew, not plan structure.

Usage: python tools/stage_profile.py <parquet> <cores> <pagerank|triangles>
Prints one JSON line with the top stages by total task time.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from peregrine_spark.operators.graph import undirected  # noqa: E402
from peregrine_spark.operators.iterative import pagerank  # noqa: E402
from peregrine_spark.operators.triangles import triangle_count  # noqa: E402
from peregrine_spark.session import get_spark  # noqa: E402
from peregrine_spark.sources.ingest import extract_edges  # noqa: E402


def parse_event_log(log_dir: str, after_ms: int = 0) -> list[dict]:
    stages: dict[int, dict] = {}
    names: dict[int, str] = {}
    # Spark 4 rolls event logs into a directory (eventlog_v2_*)
    paths = [
        p
        for p in glob.glob(os.path.join(log_dir, "**", "*"), recursive=True)
        if os.path.isfile(p)
    ]
    for path in paths:
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rt", errors="replace") as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if not isinstance(ev, dict):
                    continue
                if ev.get("Event") == "SparkListenerStageSubmitted":
                    si = ev["Stage Info"]
                    names[si["Stage ID"]] = si.get("Stage Name", "")
                elif ev.get("Event") == "SparkListenerTaskEnd":
                    info = ev.get("Task Info") or {}
                    if info.get("Launch Time", 0) < after_ms:
                        continue  # warm-up / ingest tasks
                    sid = ev["Stage ID"]
                    run = ev.get("Task Metrics") or {}
                    t = run.get("Executor Run Time", 0)
                    stages.setdefault(sid, {"times": []})["times"].append(t)
    out = []
    for sid, rec in stages.items():
        ts = sorted(rec["times"])
        out.append(
            {
                "stage": sid,
                "name": names.get(sid, "")[:60],
                "n_tasks": len(ts),
                "sum_ms": sum(ts),
                "median_ms": ts[len(ts) // 2],
                "max_ms": ts[-1],
                "straggler_ratio": round(ts[-1] / max(1, ts[len(ts) // 2]), 1),
            }
        )
    out.sort(key=lambda r: -r["sum_ms"])
    return out


def main() -> None:
    parquet, cores, job = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    log_dir = tempfile.mkdtemp(prefix=f"evlog-{cores}-")
    spark = get_spark(
        master=f"local[{cores}]",
        app_name=f"profile-{cores}",
        shuffle_partitions=cores * 2,
        extra_conf={
            "spark.driver.memory": "48g",
            "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
            "spark.local.dir": "/dev/shm/spark-local",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    files = spark.read.parquet(parquet)
    edges = extract_edges(files).cache()
    edges.count()
    def _labels():
        # deterministic synthetic vertex labels (25 classes) for the
        # label-discovery / support jobs on the label-free scaling graph
        from pyspark.sql import functions as F

        verts = (
            edges.select(F.col("src").alias("id"))
            .union(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
        return verts.select("id", (F.col("id") % 25).cast("int").alias("label"))

    if job == "pagerank":
        und = undirected(edges).cache()
        und.count()
        pagerank(spark, und, tol=None, max_iter=1, resume=False)  # warm
        t0_ms = int(time.time() * 1000)
        t0 = time.perf_counter()
        pagerank(spark, und, tol=None, max_iter=3, resume=False)
        wall = time.perf_counter() - t0
    elif job == "clique4":
        from peregrine_spark.operators.patterns import clique_count

        t0_ms = int(time.time() * 1000)
        t0 = time.perf_counter()
        clique_count(edges, 4).collect()
        wall = time.perf_counter() - t0
    elif job == "cycle4":
        from peregrine_spark.operators.motifs import cycle4_count

        t0_ms = int(time.time() * 1000)
        t0 = time.perf_counter()
        cycle4_count(edges).collect()
        wall = time.perf_counter() - t0
    elif job in ("star2_labels", "star3_labels", "mni_star2"):
        from peregrine_spark.operators import labels as LAB

        lab = _labels().cache()
        lab.count()
        fn = {
            "star2_labels": LAB.discover_star_labels,
            "star3_labels": LAB.discover_star_labels_3,
            "mni_star2": LAB.mni_star2_supports,
        }[job]
        t0_ms = int(time.time() * 1000)
        t0 = time.perf_counter()
        fn(edges, lab).collect()
        wall = time.perf_counter() - t0
    else:
        t0_ms = int(time.time() * 1000)
        t0 = time.perf_counter()
        triangle_count(edges).collect()
        wall = time.perf_counter() - t0
    spark.stop()  # flush the event log
    stages = parse_event_log(log_dir, after_ms=t0_ms)
    total_task_ms = sum(s["sum_ms"] for s in stages)
    print(
        json.dumps(
            {
                "cores": cores,
                "job": job,
                "wall_sec": round(wall, 2),
                "total_task_sec": round(total_task_ms / 1000.0, 1),
                "parallel_efficiency": round(
                    total_task_ms / 1000.0 / (wall * cores), 2
                ),
                "top_stages": stages[:10],
            }
        )
    )


if __name__ == "__main__":
    main()
