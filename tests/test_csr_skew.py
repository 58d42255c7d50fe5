"""CSR/Arrow intersection kernels and skew helpers produce identical
results to the join-based plan and the NumPy oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from peregrine_spark import reference as ref
from peregrine_spark.operators import skew
from peregrine_spark.operators.csr import (
    adjacency,
    triangles_csr_arrow,
    triangles_via_adjacency,
)
from peregrine_spark.operators.graph import orient, undirected
from peregrine_spark.operators.iterative import connected_components
from peregrine_spark.sources import ingest as ing
from tests import golden


@pytest.mark.parametrize("name", ["k6", "two_tri_bridge", "star_hub", "disconnected"])
def test_adjacency_variants_golden(spark, name):
    pairs = golden.ALL[name]
    e = golden.to_spark_edges(spark, pairs)
    want = ref.triangle_count(pairs)
    assert triangles_via_adjacency(e).collect()[0].n_triangles == want
    assert triangles_csr_arrow(e).collect()[0].n_triangles == want


def test_csr_arrow_tiny_ingested(spark, tiny_repo_files):
    e = ing.extract_edges(tiny_repo_files)
    pairs = [(r.src, r.dst) for r in e.collect()]
    want = ref.triangle_count(pairs)
    assert triangles_via_adjacency(e).collect()[0].n_triangles == want
    assert triangles_csr_arrow(e).collect()[0].n_triangles == want


def test_adjacency_runs_sorted(spark):
    e = golden.to_spark_edges(spark, golden.K6)
    rows = adjacency(orient(e)).collect()
    for r in rows:
        assert list(r.adj) == sorted(r.adj)


def test_hub_detection(spark):
    e = golden.to_spark_edges(spark, golden.STAR_HUB)
    h = skew.hubs(e, threshold=10).collect()
    assert len(h) == 1 and h[0].id == 0 and h[0].deg == 50


def test_salted_join_matches_plain(spark):
    e = undirected(golden.to_spark_edges(spark, golden.STAR_HUB))
    state = e.select(F.col("src").alias("id")).distinct().select(
        "id", (F.col("id") * 10).alias("val")
    )
    plain = e.join(state.withColumnRenamed("id", "src"), "src").select("src", "dst", "val")
    salted = skew.salted_join(
        e, state.withColumnRenamed("id", "src"), "src", n_salts=4, salt_source="dst"
    ).select("src", "dst", "val")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_two_phase_min_matches_plain(spark):
    e = undirected(golden.to_spark_edges(spark, golden.DISCONNECTED))
    msgs = e.select(F.col("dst").alias("id"), F.col("src").alias("comp"))
    plain = {r.id: r.comp for r in msgs.groupBy("id").agg(F.min("comp").alias("comp")).collect()}
    two = {
        r.id: r.comp
        for r in skew.two_phase_agg(msgs, "id", "comp", "min", n_salts=3).collect()
    }
    assert plain == two


def test_hub_split_join_matches_plain(spark):
    e = undirected(golden.to_spark_edges(spark, golden.STAR_HUB))
    state = e.select(F.col("src")).distinct().select(
        "src", (F.col("src") * 7).alias("val")
    )
    hubs = skew.hub_keys(e, "src", threshold=10)
    assert hubs == [0]  # the star hub
    plain = e.join(state, "src").select("src", "dst", "val")
    split = skew.hub_split_join(e, state, "src", hubs).select("src", "dst", "val")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, split.collect()))


def test_cc_on_hub_graph(spark):
    """CC over the star graph (worst-case hub) still exact."""
    pairs = golden.STAR_HUB
    res = connected_components(spark, golden.to_spark_edges(spark, pairs))
    got = {r.id: r.comp for r in res.state.collect()}
    assert got == ref.connected_components(pairs)
