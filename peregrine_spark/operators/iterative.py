"""Iterative link-graph algorithms as gather-scatter supersteps.

Each superstep is exactly one join (state × edges, shuffle on the gather
key) + one groupBy (scatter key) + a small |V|-sized state rebuild —
the bounded-shuffle structure the north rule demands. Lineage truncation,
checkpointing and resume come from plans/superstep.py.

Skew note: the scatter ``groupBy(dst)`` partially aggregates map-side
(Spark's hash agg), so a hub file with 10^6 in-references reduces to one
row per map partition before the shuffle — the same effect as the
reference's work-stealing over hub-adjacent tasks
(/root/reference/core/Peregrine.hh:94-102), without explicit salting.
AQE skew-join handles the state×edges side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from peregrine_spark.operators.graph import undirected
from peregrine_spark.operators.skew import (
    auto_hub_threshold,
    hub_keys,
    hub_presplit,
    presplit_join,
)
from peregrine_spark.plans.superstep import SuperstepDriver, SuperstepResult


def _vertices_from_edges(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


# --------------------------------------------------------------------------
# PageRank
# --------------------------------------------------------------------------
def pagerank(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    num_partitions: int | None = None,
    checkpoint_interval: int = 1,
    input_fingerprint: str | None = None,
    skew_mode: str = "hub_split",
) -> SuperstepResult:
    """Directed PageRank with uniform dangling redistribution; converges
    when max|Δrank| < tol. State schema: (id, rank, out_deg).

    r_{t+1} = (1-d)/N + d * (Σ_in r_t/outdeg + dangling_mass/N)

    skew_mode: "hub_split" (default) broadcasts hub slices of the state —
    best when each superstep materializes (the state subtree is a cheap
    scan). "aqe" uses a plain unhinted join and lets AQE's skew-join
    splitting handle hubs — required when CHAINING supersteps without
    materialization (checkpoint_interval > 1): hub_split references the
    state twice per superstep, so the unmaterialized plan tree would grow
    2^k.
    """
    if vertices is None:
        vertices = _vertices_from_edges(edges)
    # Pre-partition the static edge side by the gather key ONCE: the
    # cached hash partitioning matches the per-superstep join requirement,
    # so only the (|V|-sized) state side shuffles each superstep. Hub
    # edges are split into their own ROUND-ROBIN cache (see hub_presplit).
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = edges.select("src", "dst")
    out_deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    vstatic = (
        vertices.select("id")
        .join(out_deg, "id", "left")
        .select("id", F.coalesce("out_deg", F.lit(0)).alias("out_deg"))
        .cache()
    )
    n = vstatic.count()  # also materializes the cache
    if n == 0:
        return SuperstepResult(vstatic.select("id", F.lit(0.0).alias("rank")), 0, True)
    # Dangling vertices can't appear in an undirected closure; detecting
    # their absence once saves a full scalar job EVERY superstep.
    has_dangling = vstatic.filter(F.col("out_deg") == 0).limit(1).count() > 0
    # dangling mass needs a per-superstep scalar; only dangling-free
    # graphs can chain supersteps without materialization.
    interval = 1 if has_dangling else checkpoint_interval
    if interval > 1 and skew_mode == "hub_split":
        # chained supersteps: hub_split references the state twice per
        # step → 2^k unmaterialized plan tree. Force the AQE path.
        skew_mode = "aqe"
    # Hub detection (once, static): sources whose edge multiplicity would
    # pin the gather join on a single task take the broadcast path.
    n_e = edges.count()
    hubs = hub_keys(edges, "src", auto_hub_threshold(n_e))
    if skew_mode == "hub_split":
        e_rest, e_hub = hub_presplit(edges, "src", hubs, n_part)
    else:
        e_rest, e_hub = edges.repartition(n_part, "src").cache(), None

    def init() -> DataFrame:
        return vstatic.select("id", F.lit(1.0 / n).alias("rank"), "out_deg")

    # Dangling mass for the CURRENT state. When a convergence check runs,
    # the delta job below piggybacks next step's dangling mass onto the
    # same |V|-sized aggregation, so each superstep costs ONE scalar job,
    # not two. Fixed-K runs (tol=None) compute it standalone.
    dm_cell = {"dm": None}

    def _dangling(state: DataFrame) -> float:
        if not has_dangling:
            return 0.0
        return (
            state.agg(
                F.sum(F.when(F.col("out_deg") == 0, F.col("rank")).otherwise(0.0))
            ).collect()[0][0]
            or 0.0
        )

    def step(state: DataFrame, _k: int) -> DataFrame:
        dm = dm_cell["dm"] if dm_cell["dm"] is not None else _dangling(state)
        dm_cell["dm"] = None
        # Gather: hub sources join a broadcast slice of the state (their
        # millions of edge rows never shuffle); the rest shuffle-hash —
        # a per-superstep broadcast of the FULL state would be rebuilt
        # driver-side each time (measured 20-40% of superstep wall).
        src_state = state.filter(F.col("out_deg") > 0).select(
            F.col("id").alias("src"),
            (F.col("rank") / F.col("out_deg")).alias("w"),
        )
        gathered = (
            presplit_join(e_rest, e_hub, src_state, "src", hubs)
            if skew_mode == "hub_split"
            else e_rest.join(src_state, "src")
        )
        contrib = (
            gathered.select(F.col("dst").alias("id"), "w")
            .groupBy("id")
            .agg(F.sum("w").alias("c"))
        )
        base = (1.0 - damping) / n + damping * dm / n
        return vstatic.join(contrib.hint("shuffle_hash"), "id", "left").select(
            "id",
            (F.lit(base) + F.lit(damping) * F.coalesce("c", F.lit(0.0))).alias("rank"),
            "out_deg",
        )

    def delta(old: DataFrame, new: DataFrame) -> float:
        row = (
            old.select("id", F.col("rank").alias("r0"))
            .join(
                new.select("id", F.col("rank").alias("r1"), "out_deg"), "id"
            )
            .agg(
                F.max(F.abs(F.col("r1") - F.col("r0"))).alias("d"),
                F.sum(
                    F.when(F.col("out_deg") == 0, F.col("r1")).otherwise(0.0)
                ).alias("dm"),
            )
            .collect()[0]
        )
        dm_cell["dm"] = row["dm"] or 0.0
        return row["d"]

    driver = SuperstepDriver(
        spark, "pagerank", checkpoint_dir, max_iter=max_iter, tol=tol,
        materialize_every=interval, input_fingerprint=input_fingerprint,
    )
    # tol=None means fixed-iteration semantics — skip the per-superstep
    # delta join entirely (two fewer |V|-sized jobs per superstep).
    return driver.run(init, step, delta if tol is not None else None, resume=resume)


# --------------------------------------------------------------------------
# Connected components (hash-min)
# --------------------------------------------------------------------------
def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 100,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    num_partitions: int | None = None,
    checkpoint_interval: int = 1,
    input_fingerprint: str | None = None,
    skew_mode: str = "hub_split",
) -> SuperstepResult:
    """Hash-min components: comp(v) = min vertex id reachable; synchronous
    min-propagation to fixpoint. State: (id, comp) — exact integers.

    Converges in O(diameter) supersteps. (Large-diameter graphs would want
    the large-/small-star pointer-doubling variant; link graphs are
    small-diameter so hash-min's strictly-bounded shuffle wins.)

    skew_mode as in pagerank; chained supersteps (checkpoint_interval > 1)
    force "aqe" — hub_split references the state twice per step, growing
    the unmaterialized plan tree 2^k.
    """
    if vertices is None:
        vertices = _vertices_from_edges(edges)
    if checkpoint_interval > 1 and skew_mode == "hub_split":
        skew_mode = "aqe"
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    und = undirected(edges)
    vstatic = vertices.select("id").cache()
    hubs = hub_keys(und, "src", auto_hub_threshold(und.count()))
    if skew_mode == "hub_split":
        u_rest, u_hub = hub_presplit(und, "src", hubs, n_part)
    else:
        u_rest, u_hub = und.repartition(n_part, "src").cache(), None

    def init() -> DataFrame:
        return vstatic.select("id", F.col("id").alias("comp"))

    def step(state: DataFrame, _k: int) -> DataFrame:
        src_state = state.select(F.col("id").alias("src"), "comp")
        gathered = (
            presplit_join(u_rest, u_hub, src_state, "src", hubs)
            if skew_mode == "hub_split"
            else u_rest.join(src_state, "src")
        )
        msgs = (
            gathered.select(F.col("dst").alias("id"), "comp")
            .groupBy("id")
            .agg(F.min("comp").alias("mincomp"))
        )
        return state.join(msgs.hint("shuffle_hash"), "id", "left").select(
            "id", F.least("comp", F.coalesce("mincomp", "comp")).alias("comp")
        )

    def delta(old: DataFrame, new: DataFrame) -> float:
        return float(
            old.select("id", F.col("comp").alias("c0"))
            .join(new.select("id", F.col("comp").alias("c1")), "id")
            .filter(F.col("c0") != F.col("c1"))
            .count()
        )

    driver = SuperstepDriver(
        spark, "cc", checkpoint_dir, max_iter=max_iter, tol=0.5,
        materialize_every=checkpoint_interval, input_fingerprint=input_fingerprint,
    )
    return driver.run(init, step, delta, resume=resume)


# --------------------------------------------------------------------------
# Label propagation
# --------------------------------------------------------------------------
def label_propagation(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    n_iter: int = 10,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    num_partitions: int | None = None,
    checkpoint_interval: int = 1,
    input_fingerprint: str | None = None,
    skew_mode: str = "hub_split",
) -> SuperstepResult:
    """Synchronous label propagation, exactly n_iter supersteps,
    deterministic: label(v) ← most frequent neighbour label, ties →
    smallest label; isolated vertices keep their own. Labels init to id.
    (Async LP is order-dependent — synchronous + min-tiebreak is the
    reproducible semantic our oracle and tests pin down.)

    skew_mode as in pagerank; chained supersteps (checkpoint_interval > 1)
    force "aqe" to avoid the 2^k hub_split plan-tree blowup.
    """
    if vertices is None:
        vertices = _vertices_from_edges(edges)
    if checkpoint_interval > 1 and skew_mode == "hub_split":
        skew_mode = "aqe"
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    und = undirected(edges)
    vstatic = vertices.select("id").cache()
    hubs = hub_keys(und, "src", auto_hub_threshold(und.count()))
    if skew_mode == "hub_split":
        u_rest, u_hub = hub_presplit(und, "src", hubs, n_part)
    else:
        u_rest, u_hub = und.repartition(n_part, "src").cache(), None

    def init() -> DataFrame:
        return vstatic.select("id", F.col("id").alias("label"))

    def step(state: DataFrame, _k: int) -> DataFrame:
        src_state = state.select(F.col("id").alias("src"), "label")
        gathered = (
            presplit_join(u_rest, u_hub, src_state, "src", hubs)
            if skew_mode == "hub_split"
            else u_rest.join(src_state, "src")
        )
        cnt = (
            gathered.select(F.col("dst").alias("id"), "label")
            .groupBy("id", "label")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        # argmax by (count, -label): a hash aggregation instead of a
        # window row_number (saves a per-superstep sort stage); the
        # negated label makes lexicographic struct-max pick the SMALLEST
        # label on count ties — labels are non-negative vertex ids
        best = (
            cnt.groupBy("id")
            .agg(
                F.max(
                    F.struct(
                        F.col("n"), (-F.col("label")).alias("_negl"), F.col("label")
                    )
                ).alias("_b")
            )
            .select("id", F.col("_b.label").alias("newlabel"))
        )
        return state.join(best.hint("shuffle_hash"), "id", "left").select(
            "id", F.coalesce("newlabel", "label").alias("label")
        )

    driver = SuperstepDriver(
        spark, "lp", checkpoint_dir, max_iter=n_iter, tol=None,
        materialize_every=checkpoint_interval, input_fingerprint=input_fingerprint,
    )
    return driver.run(init, step, None, resume=resume)
