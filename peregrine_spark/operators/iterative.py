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
    # ONE setup aggregation over the cached |V| table replaces three
    # separate jobs (vstatic.count, the dangling limit(1) probe, and
    # edges.count for the hub threshold — Σ out_deg IS the edge count);
    # guide §1.2: remove whole passes before tuning inside them.
    srow = vstatic.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("out_deg") == 0).cast("long")).alias("n_dangling"),
        F.coalesce(F.sum("out_deg"), F.lit(0).cast("long")).alias("n_e"),
    ).first()
    n = int(srow["n"])
    if n == 0:
        vstatic.unpersist()
        return SuperstepResult(vstatic.select("id", F.lit(0.0).alias("rank")), 0, True)
    # Dangling vertices can't appear in an undirected closure; detecting
    # their absence once saves a full scalar job EVERY superstep.
    has_dangling = int(srow["n_dangling"]) > 0
    # dangling mass needs a per-superstep scalar; only dangling-free
    # graphs can chain supersteps without materialization.
    interval = 1 if has_dangling else checkpoint_interval
    if interval > 1 and skew_mode == "hub_split":
        # chained supersteps: hub_split references the state twice per
        # step → 2^k unmaterialized plan tree. Force the AQE path.
        skew_mode = "aqe"
    # Hub detection (once, static): sources whose edge multiplicity would
    # pin the gather join on a single task take the broadcast path.
    # src multiplicity in `edges` IS out_deg, so the hub keys come from a
    # scan of the cached vstatic — no extra full-edge groupBy job.
    n_e = int(srow["n_e"])
    thr = auto_hub_threshold(n_e)
    hubs = [
        r["id"]
        for r in vstatic.filter(F.col("out_deg") > thr)
        .orderBy(F.col("out_deg").desc())
        .limit(2048)
        .collect()
    ]
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

    # interval == 1 (the default): the new state carries |Δrank| per row
    # (_delta), so each convergence check is a narrow aggregation over
    # the just-materialized state instead of an old ⨝ new join — one
    # fewer |V|-sized shuffle join job per superstep. Chained intervals
    # compare boundary states (a different quantity), so they keep the
    # join-based delta.
    carry_delta = tol is not None and interval == 1

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
        new_rank = F.lit(base) + F.lit(damping) * F.coalesce("c", F.lit(0.0))
        # join the STATE (carries the old rank) rather than vstatic: the
        # localCheckpointed state keeps its hash(id) partitioning, so the
        # join cost is identical — and the old rank rides along for the
        # per-row delta
        out_cols = ["id", new_rank.alias("rank"), "out_deg"]
        if carry_delta:
            out_cols.append(F.abs(new_rank - F.col("rank")).alias("_delta"))
        return state.join(contrib.hint("shuffle_hash"), "id", "left").select(
            *out_cols
        )

    def delta(old: DataFrame, new: DataFrame) -> float:
        if carry_delta:
            row = new.agg(
                F.max("_delta").alias("d"),
                F.sum(
                    F.when(F.col("out_deg") == 0, F.col("rank")).otherwise(0.0)
                ).alias("dm"),
            ).collect()[0]
        else:
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
    # delta job entirely.
    res = driver.run(init, step, delta if tol is not None else None, resume=resume)
    # the result state is materialized (localCheckpoint/parquet) — the
    # static caches are no longer reachable from it; holding them would
    # leak executor storage for the session lifetime (measured: leaked
    # caches from earlier bench queries inflated later ones' walls)
    for df in [vstatic, e_rest] + ([e_hub] if e_hub is not None else []):
        df.unpersist()
    if carry_delta:
        res.state = res.state.select("id", "rank", "out_deg")
    return res


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
    if checkpoint_interval > 1 and skew_mode == "hub_split":
        skew_mode = "aqe"
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    # cache the closure ONCE: hub detection, the rest-split and the
    # hub-split all scan it — uncached, the canonical distinct shuffle
    # ran three times per call (guide §2.4: remove repeated passes).
    # If the CALLER already cached an identical plan (bench.py caches
    # undirected(edges) for pagerank), cache() is a no-op and we must
    # not unpersist their cache at the end.
    und = undirected(edges)
    und_ours = not (und.storageLevel.useMemory or und.storageLevel.useDisk)
    und = und.cache()
    # one |V|-row degree pass yields the vertex set, the edge count AND
    # the hub keys (src multiplicity in the closure == degree) — instead
    # of a separate union-distinct job plus a full-closure groupBy
    degt = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("_deg")
    ).cache()
    if vertices is None:
        vstatic = degt.select("id")
        n_und = int(
            degt.agg(F.coalesce(F.sum("_deg"), F.lit(0).cast("long"))).first()[0]
        )
    else:
        vstatic = vertices.select("id").cache()
        n_und = und.count()
    thr = auto_hub_threshold(n_und)
    hubs = [
        r["id"]
        for r in degt.filter(F.col("_deg") > thr)
        .orderBy(F.col("_deg").desc())
        .limit(2048)
        .collect()
    ]
    if skew_mode == "hub_split":
        u_rest, u_hub = hub_presplit(und, "src", hubs, n_part)
    else:
        u_rest, u_hub = und.repartition(n_part, "src").cache(), None

    # interval == 1 (default): carry a per-row changed flag so the delta
    # is a narrow agg over the new state, not an old ⨝ new join. For
    # hash-min this is exact at any boundary (zero changes in the LAST
    # superstep already implies the global fixpoint), but chained
    # intervals keep the boundary-join delta so reported deltas stay
    # boundary-to-boundary.
    carry_delta = checkpoint_interval == 1

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
        new_comp = F.least("comp", F.coalesce("mincomp", "comp"))
        out_cols = ["id", new_comp.alias("comp")]
        if carry_delta:
            out_cols.append((new_comp != F.col("comp")).cast("long").alias("_chg"))
        return state.join(msgs.hint("shuffle_hash"), "id", "left").select(*out_cols)

    def delta(old: DataFrame, new: DataFrame) -> float:
        if carry_delta:
            return float(
                new.agg(F.coalesce(F.sum("_chg"), F.lit(0).cast("long"))).first()[0]
            )
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
    res = driver.run(init, step, delta, resume=resume)
    caches = [degt, u_rest] + ([u_hub] if u_hub is not None else [])
    if und_ours:
        caches.append(und)
    if vertices is not None:
        caches.append(vstatic)
    for df in caches:
        df.unpersist()
    if carry_delta:
        res.state = res.state.select("id", "comp")
    return res


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
    if checkpoint_interval > 1 and skew_mode == "hub_split":
        skew_mode = "aqe"
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    # same setup shape as connected_components: closure cached once
    # (respecting a pre-existing caller cache), one degree pass
    # providing vertices + edge count + hub keys
    und = undirected(edges)
    und_ours = not (und.storageLevel.useMemory or und.storageLevel.useDisk)
    und = und.cache()
    degt = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("_deg")
    ).cache()
    if vertices is None:
        vstatic = degt.select("id")
        n_und = int(
            degt.agg(F.coalesce(F.sum("_deg"), F.lit(0).cast("long"))).first()[0]
        )
    else:
        vstatic = vertices.select("id").cache()
        n_und = und.count()
    thr = auto_hub_threshold(n_und)
    hubs = [
        r["id"]
        for r in degt.filter(F.col("_deg") > thr)
        .orderBy(F.col("_deg").desc())
        .limit(2048)
        .collect()
    ]
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
    res = driver.run(init, step, None, resume=resume)
    caches = [degt, u_rest] + ([u_hub] if u_hub is not None else [])
    if und_ours:
        caches.append(und)
    if vertices is not None:
        caches.append(vstatic)
    for df in caches:
        df.unpersist()
    return res
