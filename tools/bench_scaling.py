"""N-vs-4N scaling evidence (north rule): run the identical link-graph job
at local[8] and local[32] on the same synthesized input, in separate JVMs,
and report throughput at both plus scaling efficiency into BENCH.md.

Efficiency = (T_N / T_4N) / 4  — 1.0 is perfect linear scaling.

Usage: python tools/bench_scaling.py [n_files] [mean_refs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, "data")
SHUFFLE = 64
CORES = (8, 32)


def ensure_input(n_files: int, mean_refs: float) -> str:
    os.makedirs(DATA, exist_ok=True)
    path = os.path.join(DATA, f"scaling_repo_files_{n_files}_{int(mean_refs)}.parquet")
    if not os.path.exists(path):
        sys.path.insert(0, REPO)
        from peregrine_spark.sources.synth import write_repo_files

        print(f"generating {path} ...", file=sys.stderr)
        write_repo_files(path, n_files, seed=42, mean_refs=mean_refs)
    return path


def run_worker(path: str, cores: int) -> dict:
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "_scaling_worker.py"),
         path, str(cores), str(SHUFFLE)],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-3000:])
        raise RuntimeError(f"worker cores={cores} failed")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    mean_refs = float(sys.argv[2]) if len(sys.argv) > 2 else 6.0
    path = ensure_input(n_files, mean_refs)

    results = {c: run_worker(path, c) for c in CORES}
    lo, hi = results[CORES[0]], results[CORES[1]]
    factor = CORES[1] / CORES[0]
    eff_pr = (lo["pr_wall"] / hi["pr_wall"]) / factor
    eff_tri = (lo["tri_wall"] / hi["tri_wall"]) / factor

    md = f"""# BENCH — N vs 4N scaling evidence (sandbox form of the north rule)

Same job, same input ({n_files:,} files → {lo["n_edges"]:,} directed edges,
{lo["n_und"]:,} undirected closure rows, {lo["n_triangles"]:,} triangles),
two parallelism levels in separate JVMs, shuffle partitions fixed at {SHUFFLE}.

| metric | local[{CORES[0]}] (N) | local[{CORES[1]}] (4N) | scaling efficiency |
|---|---|---|---|
| PageRank {lo["pr_supersteps"]} supersteps wall | {lo["pr_wall"]} s | {hi["pr_wall"]} s | **{eff_pr:.2f}** |
| PageRank edges/sec/superstep | {lo["pr_edges_per_sec_per_superstep"]:,} | {hi["pr_edges_per_sec_per_superstep"]:,} | |
| Triangle count wall | {lo["tri_wall"]} s | {hi["tri_wall"]} s | **{eff_tri:.2f}** |
| Triangles/sec | {lo["tri_per_sec"]:,} | {hi["tri_per_sec"]:,} | |
| Ingest (parse refs) wall | {lo["ingest_wall"]} s | {hi["ingest_wall"]} s | |

Raw: `{json.dumps(lo)}`
     `{json.dumps(hi)}`

Target: efficiency ≥ 0.8 between N and 4N (BASELINE.json). Local-mode
caveat: both "clusters" share one host's memory bus and disk, so this
under-states what separate executors would achieve on the shuffle-bound
stages.
"""
    # Preserve any hand-written analysis below the generated block
    bench_path = os.path.join(REPO, "BENCH.md")
    tail = ""
    if os.path.exists(bench_path):
        prev = open(bench_path).read()
        marker = "## Measurement history"
        if marker in prev:
            tail = "\n" + prev[prev.index(marker):]
    with open(bench_path, "w") as f:
        f.write(md + tail)
    print(md)


if __name__ == "__main__":
    main()
