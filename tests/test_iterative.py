"""PageRank / CC / LP vs the NumPy oracle, plus checkpoint/resume
equivalence (FIXTURES.md §3, SURVEY.md §5 implications a/d)."""

import numpy as np
import pytest

from peregrine_spark import reference as ref
from peregrine_spark.operators.iterative import (
    connected_components,
    label_propagation,
    pagerank,
)
from peregrine_spark.sources import ingest as ing
from tests import golden


def both_dirs(pairs):
    return np.concatenate([pairs, pairs[:, ::-1]])


def pr_dict(res):
    return {r.id: r.rank for r in res.state.select("id", "rank").collect()}


def comp_dict(res, col="comp"):
    return {r.id: r[col] for r in res.state.collect()}


def test_pagerank_k6_uniform(spark):
    e = golden.to_spark_edges(spark, both_dirs(golden.K6))
    res = pagerank(spark, e, tol=1e-9)
    got = pr_dict(res)
    assert res.converged
    assert np.allclose(list(got.values()), 1.0 / 6, atol=1e-8)


def test_pagerank_directed_star_vs_oracle(spark):
    pairs = np.array([(i, 0) for i in range(1, 21)], dtype=np.int64)
    e = golden.to_spark_edges(spark, pairs)
    res = pagerank(spark, e, tol=1e-8)
    want = ref.pagerank(pairs, tol=1e-8)
    got = pr_dict(res)
    assert set(got) == set(want)
    for k in got:
        assert abs(got[k] - want[k]) < 1e-6
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved w/ dangling hub


def test_pagerank_tiny_ingested_vs_oracle(spark, tiny_repo_files):
    e = ing.extract_edges(tiny_repo_files)
    pairs = np.array([(r.src, r.dst) for r in e.collect()], dtype=np.int64)
    res = pagerank(spark, e, tol=1e-6)
    want = ref.pagerank(pairs, tol=1e-6)
    got = pr_dict(res)
    assert res.converged
    assert set(got) == set(want)
    diffs = [abs(got[k] - want[k]) for k in got]
    assert max(diffs) < 1e-6


@pytest.mark.parametrize("name", ["disconnected", "two_tri_bridge", "star_hub"])
def test_cc_golden(spark, name):
    pairs = golden.ALL[name]
    e = golden.to_spark_edges(spark, pairs)
    res = connected_components(spark, e)
    assert res.converged
    assert comp_dict(res) == ref.connected_components(pairs)


def test_cc_tiny_ingested(spark, tiny_repo_files):
    e = ing.extract_edges(tiny_repo_files)
    pairs = [(r.src, r.dst) for r in e.collect()]
    res = connected_components(spark, e)
    assert comp_dict(res) == ref.connected_components(pairs)


@pytest.mark.parametrize("n_iter", [1, 5])
def test_lp_golden_vs_oracle(spark, n_iter):
    pairs = golden.TWO_TRI_BRIDGE
    e = golden.to_spark_edges(spark, pairs)
    res = label_propagation(spark, e, n_iter=n_iter)
    assert comp_dict(res, "label") == ref.label_propagation(pairs, n_iter=n_iter)


def test_lp_tiny_ingested(spark, tiny_repo_files):
    e = ing.extract_edges(tiny_repo_files)
    pairs = [(r.src, r.dst) for r in e.collect()]
    res = label_propagation(spark, e, n_iter=4)
    assert comp_dict(res, "label") == ref.label_propagation(pairs, n_iter=4)


# ---------------------------------------------------------------- resume --
def test_cc_resume_bit_identical(spark, tmp_path):
    e = golden.to_spark_edges(spark, golden.DISCONNECTED)
    straight = connected_components(spark, e)
    d = str(tmp_path / "cc")
    part = connected_components(spark, e, max_iter=1, checkpoint_dir=d)
    assert not part.converged
    resumed = connected_components(spark, e, checkpoint_dir=d, resume=True)
    assert resumed.converged
    assert comp_dict(resumed) == comp_dict(straight)
    assert resumed.supersteps > 1  # continued, not restarted


def test_pagerank_resume_allclose(spark, tmp_path):
    pairs = both_dirs(golden.TWO_TRI_BRIDGE)
    e = golden.to_spark_edges(spark, pairs)
    straight = pagerank(spark, e, tol=1e-8)
    d = str(tmp_path / "pr")
    pagerank(spark, e, tol=1e-8, max_iter=3, checkpoint_dir=d)
    resumed = pagerank(spark, e, tol=1e-8, checkpoint_dir=d, resume=True)
    a, b = pr_dict(straight), pr_dict(resumed)
    assert set(a) == set(b)
    assert max(abs(a[k] - b[k]) for k in a) < 1e-9


def test_lineage_metrics_written(spark, tmp_path):
    e = golden.to_spark_edges(spark, golden.DISCONNECTED)
    d = str(tmp_path / "ccm")
    connected_components(spark, e, checkpoint_dir=d)
    m = spark.read.parquet(f"{d}/metrics")
    cols = set(m.columns)
    assert {"algo", "superstep", "partition_id", "rows", "checksum", "delta", "wall_ms"} <= cols
    # every superstep accounted for, row counts per superstep sum to |V|
    per_step = {
        r.superstep: r.total
        for r in m.groupBy("superstep").agg(
            __import__("pyspark.sql.functions", fromlist=["sum"]).sum("rows").alias("total")
        ).collect()
    }
    assert all(v == 10 for v in per_step.values())


def test_checkpoint_interval_equivalence(spark):
    """Chaining supersteps (materialize_every>1) must not change results:
    CC exactly; PageRank to float-noise."""
    e = golden.to_spark_edges(spark, golden.DISCONNECTED)
    a = connected_components(spark, e, checkpoint_interval=1)
    b = connected_components(spark, e, checkpoint_interval=3)
    assert comp_dict(a) == comp_dict(b)

    pe = golden.to_spark_edges(spark, both_dirs(golden.TWO_TRI_BRIDGE))
    p1 = pagerank(spark, pe, tol=None, max_iter=6, checkpoint_interval=1, resume=False)
    p3 = pagerank(spark, pe, tol=None, max_iter=6, checkpoint_interval=3, resume=False)
    d1, d3 = pr_dict(p1), pr_dict(p3)
    assert max(abs(d1[k] - d3[k]) for k in d1) < 1e-12


def test_cc_isolated_vertices(spark):
    """Vertices table larger than edge endpoints: isolated ids keep
    their own component."""
    e = golden.to_spark_edges(spark, golden.DISCONNECTED)
    verts = spark.createDataFrame([(i,) for i in [10, 11, 12, 13, 14, 20, 21, 22, 30, 31, 99]], "id long")
    res = connected_components(spark, e, vertices=verts)
    comps = comp_dict(res)
    assert comps[99] == 99
