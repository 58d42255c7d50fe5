"""N-vs-4N scaling evidence (north rule): run the identical link-graph job
at local[8] and local[32] on the same synthesized input and report
throughput at both plus scaling efficiency into BENCH.md.

Protocol (this host shows ~2x variance between identical back-to-back
jobs — BENCH.md history): INTERLEAVED A/B rounds (8c, 32c, 8c, 32c, ...),
each in a fresh JVM, min per config across rounds; shuffle partitions
proportional to cores (2x); per-superstep medians alongside end-to-end
walls so fixed per-job overhead is visible separately.

Efficiency = (T_N / T_4N) / 4  — 1.0 is perfect linear scaling.

Usage: python tools/bench_scaling.py [n_files] [mean_refs] [rounds]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, "data")
CORES = (8, 32)
SHUFFLE_PER_CORE = 2


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
    # Pin the whole JVM (task threads AND GC/IO/shuffle service threads)
    # to exactly `cores` CPUs: unpinned local[8] silently borrows the
    # other 24 cores for GC and IO, which a real 8-core node cannot do —
    # it systematically inflates the small config and understates scaling.
    cmd = [sys.executable, os.path.join(REPO, "tools", "_scaling_worker.py"),
           path, str(cores), str(cores * SHUFFLE_PER_CORE)]
    if os.environ.get("SPARK_GRAFT_NO_PIN") != "1":
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(
        cmd,
        capture_output=True, text=True, env=dict(os.environ), timeout=3600,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-3000:])
        raise RuntimeError(f"worker cores={cores} failed")
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    print(f"  run: {json.dumps(rec)}", file=sys.stderr)
    return rec


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    mean_refs = float(sys.argv[2]) if len(sys.argv) > 2 else 6.0
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    path = ensure_input(n_files, mean_refs)

    runs: dict[int, list[dict]] = {c: [] for c in CORES}
    for r in range(rounds):
        print(f"-- interleaved round {r + 1}/{rounds}", file=sys.stderr)
        for c in CORES:
            runs[c].append(run_worker(path, c))

    def best(c: int, key: str) -> float:
        return min(r[key] for r in runs[c])

    lo, hi = runs[CORES[0]][0], runs[CORES[1]][0]
    factor = CORES[1] / CORES[0]
    metrics = [
        "pr_wall", "pr_step_median", "pr_chained_wall", "tri_wall",
        "cpu_wall", "shuffle_wall",
    ]
    b = {c: {m: best(c, m) for m in metrics} for c in CORES}
    n_lo, n_hi = CORES
    eff = {m: (b[n_lo][m] / b[n_hi][m]) / factor for m in metrics}

    n_und, n_tri = lo["n_und"], lo["n_triangles"]
    k = lo["pr_supersteps"]
    md = f"""# BENCH — N vs 4N scaling evidence (sandbox form of the north rule)

Same job, same input ({n_files:,} files → {lo["n_edges"]:,} directed edges,
{n_und:,} undirected closure rows, {n_tri:,} triangles). Protocol:
{rounds} INTERLEAVED rounds of (local[{n_lo}], local[{n_hi}]) in fresh JVMs,
min per config; each JVM is CPU-PINNED (taskset) to exactly its core
count — unpinned local[{n_lo}] borrows the {os.cpu_count() - n_lo} idle host
cores for GC/IO threads, which a real {n_lo}-core node cannot; shuffle
partitions = 2×cores
({n_lo * SHUFFLE_PER_CORE} / {n_hi * SHUFFLE_PER_CORE}); per-superstep medians separate fixed per-job
overhead from shuffle throughput. Efficiency = (T_{n_lo} / T_{n_hi}) / {factor:.0f}.

| metric | local[{n_lo}] (N) | local[{n_hi}] ({factor:.0f}N) | efficiency |
|---|---|---|---|
| PageRank {k} supersteps, materialized | {b[n_lo]["pr_wall"]:.2f} s | {b[n_hi]["pr_wall"]:.2f} s | **{eff["pr_wall"]:.2f}** |
| PageRank median superstep | {b[n_lo]["pr_step_median"]:.2f} s | {b[n_hi]["pr_step_median"]:.2f} s | **{eff["pr_step_median"]:.2f}** |
| PageRank {k} supersteps, chained (one job) | {b[n_lo]["pr_chained_wall"]:.2f} s | {b[n_hi]["pr_chained_wall"]:.2f} s | **{eff["pr_chained_wall"]:.2f}** |
| Triangle count | {b[n_lo]["tri_wall"]:.2f} s | {b[n_hi]["tri_wall"]:.2f} s | **{eff["tri_wall"]:.2f}** |
| control: pure compute (hash-fold 2B rows, no shuffle) | {b[n_lo]["cpu_wall"]:.2f} s | {b[n_hi]["cpu_wall"]:.2f} s | **{eff["cpu_wall"]:.2f}** |
| control: pure shuffle (repartition 200M longs) | {b[n_lo]["shuffle_wall"]:.2f} s | {b[n_hi]["shuffle_wall"]:.2f} s | **{eff["shuffle_wall"]:.2f}** |
| edges/sec/superstep (materialized) | {n_und * k / b[n_lo]["pr_wall"]:,.0f} | {n_und * k / b[n_hi]["pr_wall"]:,.0f} | |
| edges/sec/superstep (chained) | {n_und * k / b[n_lo]["pr_chained_wall"]:,.0f} | {n_und * k / b[n_hi]["pr_chained_wall"]:,.0f} | |
| triangles/sec | {n_tri / b[n_lo]["tri_wall"]:,.0f} | {n_tri / b[n_hi]["tri_wall"]:,.0f} | |

All runs (chronological, interleaved):

| round | cores | ingest | pr_wall | step_med | pr_chained | tri | cpu_ctl | shuf_ctl |
|---|---|---|---|---|---|---|---|---|
"""
    for r in range(rounds):
        for c in CORES:
            rec = runs[c][r]
            md += (
                f"| {r + 1} | {c} | {rec['ingest_wall']} | {rec['pr_wall']} "
                f"| {rec['pr_step_median']} | {rec['pr_chained_wall']} "
                f"| {rec['tri_wall']} | {rec['cpu_wall']} "
                f"| {rec['shuffle_wall']} |\n"
            )
    md += """
Target: efficiency ≥ 0.8 between N and 4N (BASELINE.json). The two
CONTROL rows bound what this host can scale at all: the pure-compute
control has zero shuffle and zero skew, so its efficiency is the ceiling
any Spark job can reach here; the pure-shuffle control isolates the
shared memory-bus/tmpfs bandwidth both "clusters" compete for. Engine
jobs at or above the corresponding control are scaling as well as the
hardware allows — on a real 4N-executor cluster each node brings its own
memory channels and spill disks, which is exactly what the single box
cannot emulate.
"""
    bench_path = os.path.join(REPO, "BENCH.md")
    tail = ""
    if os.path.exists(bench_path):
        prev = open(bench_path).read()
        # preserve EVERY curated section after the generated protocol
        # block (stage decompositions, per-round operator profiles,
        # measurement history) — not just the history table
        for marker in (
            "## Host scaling ceiling",
            "## Stage-level decomposition",
            "## Measurement history",
        ):
            if marker in prev:
                tail = "\n" + prev[prev.index(marker):]
                break
    with open(bench_path, "w") as f:
        f.write(md + tail)
    print(md)


if __name__ == "__main__":
    main()
