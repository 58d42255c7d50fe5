"""Generic iterative superstep driver with checkpoint / lineage / resume.

The Spark analog of the reference's per-pattern barrier loop
(/root/reference/core/Peregrine.hh:1131-1150: reset task counter, release
workers, wait at the barrier): here each superstep is one bounded-shuffle
Spark job over the state DataFrame, and the "barrier" is the state
materialization between supersteps.

Why materialize every superstep (SURVEY.md §7 hard parts):
- iterative DataFrame plans grow without bound → write state to parquet and
  read it back, which truncates lineage AND is the resume snapshot — the
  cost pays twice.
- per-partition lineage metrics (algo, superstep, partition_id, rows,
  checksum, delta, wall_ms) are appended to a metrics table per superstep,
  so a resumed run can prove it continued from exactly the state it wrote.

With no checkpoint dir (tests/bench), ``localCheckpoint`` truncates lineage
in memory and metrics stay driver-side only.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LATEST_FILE = "_latest.json"


@dataclass
class SuperstepResult:
    state: DataFrame
    supersteps: int  # supersteps executed across all runs (incl. resumed-from)
    converged: bool
    deltas: list[float] = field(default_factory=list)
    metrics: list[dict] = field(default_factory=list)


def _partition_lineage(state: DataFrame) -> list[dict]:
    """Per-partition (rows, checksum) — checksum is an order-insensitive
    sum of row hashes, so it is stable under within-partition reordering."""
    rows = (
        state.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(
                F.xxhash64(*[c for c in state.columns]).cast("decimal(38,0)")
            ).alias("checksum"),
        )
        .collect()
    )
    return [
        {"partition_id": r["__pid"], "rows": r["rows"], "checksum": str(r["checksum"])}
        for r in rows
    ]


class SuperstepDriver:
    def __init__(
        self,
        spark: SparkSession,
        algo: str,
        checkpoint_dir: str | None = None,
        max_iter: int = 100,
        tol: float | None = None,
        metrics_lineage: bool | None = None,
        materialize_every: int = 1,
        input_fingerprint: str | None = None,
    ):
        # materialize_every > 1 chains that many supersteps into ONE Spark
        # job (no barrier, no state write between them) — per-superstep
        # fixed overhead (scheduling, checkpoint, planning) amortizes by
        # the same factor. Convergence (delta_fn) is then checked only at
        # materialization boundaries: valid for monotone algorithms (CC —
        # extra supersteps past fixpoint are no-ops) and for PageRank
        # (max|Δ| over an interval is a stricter criterion). Resume
        # granularity becomes the boundary, not the superstep.
        # Lineage checksums are part of the checkpoint contract; without a
        # checkpoint dir they'd be a pure extra pass per superstep.
        if metrics_lineage is None:
            metrics_lineage = checkpoint_dir is not None
        self.spark = spark
        self.algo = algo
        self.dir = checkpoint_dir
        self.max_iter = max_iter
        self.tol = tol
        self.metrics_lineage = metrics_lineage
        self.materialize_every = max(1, materialize_every)
        # identifies the input dataset (e.g. its path); a resume refuses to
        # continue a checkpoint written for a different algo or input
        self.input_fingerprint = input_fingerprint

    # -- checkpoint layout: <dir>/state/step=<k>/, <dir>/metrics/, _latest.json
    def _state_path(self, k: int) -> str:
        return os.path.join(self.dir, "state", f"step={k}")

    def _load_latest(self) -> tuple[int, DataFrame] | None:
        if not self.dir:
            return None
        latest = os.path.join(self.dir, LATEST_FILE)
        if not os.path.exists(latest):
            return None
        with open(latest) as f:
            meta = json.load(f)
        if meta.get("algo") != self.algo:
            raise ValueError(
                f"checkpoint dir {self.dir} holds algo={meta.get('algo')!r}, "
                f"refusing to resume {self.algo!r} from it"
            )
        ckpt_fp = meta.get("input_fingerprint")
        if (
            ckpt_fp is not None
            and self.input_fingerprint is not None
            and ckpt_fp != self.input_fingerprint
        ):
            raise ValueError(
                f"checkpoint dir {self.dir} was written for input "
                f"{ckpt_fp!r}, refusing to resume on {self.input_fingerprint!r}"
            )
        k = meta["superstep"]
        return k, self.spark.read.parquet(self._state_path(k))

    def _materialize(self, state: DataFrame, k: int) -> DataFrame:
        if self.dir:
            path = self._state_path(k)
            state.write.mode("overwrite").parquet(path)
            return self.spark.read.parquet(path)
        chk = state.localCheckpoint(eager=True)
        return chk

    def _record(self, k: int, state: DataFrame, delta: float | None, wall_ms: float):
        parts = _partition_lineage(state) if self.metrics_lineage else []
        recs = [
            {
                "algo": self.algo,
                "superstep": k,
                "delta": delta,
                "wall_ms": wall_ms,
                **p,
            }
            for p in (parts or [{"partition_id": -1, "rows": -1, "checksum": ""}])
        ]
        if self.dir:
            mdf = self.spark.createDataFrame(
                [
                    (
                        r["algo"],
                        r["superstep"],
                        r["partition_id"],
                        r["rows"],
                        r["checksum"],
                        float(r["delta"]) if r["delta"] is not None else None,
                        r["wall_ms"],
                    )
                    for r in recs
                ],
                "algo string, superstep int, partition_id int, rows long, "
                "checksum string, delta double, wall_ms double",
            )
            mdf.write.mode("append").parquet(os.path.join(self.dir, "metrics"))
            with open(os.path.join(self.dir, LATEST_FILE), "w") as f:
                json.dump(
                    {
                        "superstep": k,
                        "algo": self.algo,
                        "input_fingerprint": self.input_fingerprint,
                    },
                    f,
                )
        return recs

    def run(
        self,
        init_state: Callable[[], DataFrame] | DataFrame,
        step_fn: Callable[[DataFrame, int], DataFrame],
        delta_fn: Callable[[DataFrame, DataFrame], float] | None = None,
        resume: bool = True,
    ) -> SuperstepResult:
        """Iterate ``state ← step_fn(state, k)`` until ``delta_fn`` falls
        below tol or max_iter supersteps ran. ``delta_fn(old, new)``
        returns a driver scalar; None disables the convergence check
        (fixed-iteration semantics, e.g. label propagation).

        resume=True + an existing checkpoint dir continues from the last
        written superstep (mid-iteration resume per the north rule).
        """
        start_k = 0
        resumed = self._load_latest() if resume else None
        if resumed is not None:
            start_k, state = resumed
        else:
            state = init_state() if callable(init_state) else init_state
            state = self._materialize(state, 0)
            self._record(0, state, None, 0.0)

        deltas: list[float] = []
        all_metrics: list[dict] = []
        converged = False
        k = start_k
        boundary_state = state  # last materialized state
        t0 = time.time()
        while k < self.max_iter:
            k += 1
            state = step_fn(state, k)
            if k % self.materialize_every != 0 and k < self.max_iter:
                continue  # chain the next superstep into the same plan
            state = self._materialize(state, k)
            delta = delta_fn(boundary_state, state) if delta_fn else None
            wall_ms = (time.time() - t0) * 1000.0
            boundary_state.unpersist() if self.dir is None else None
            all_metrics.extend(self._record(k, state, delta, wall_ms))
            boundary_state = state
            t0 = time.time()
            if delta is not None:
                deltas.append(delta)
                if self.tol is not None and delta < self.tol:
                    converged = True
                    break
        return SuperstepResult(boundary_state, k, converged, deltas, all_metrics)
