"""Loaders over the driver-provided parquet tables (/root/testdata/sf*)
and the link-graph derivations used by the driver correctness harness.

The co-purchase projection (parts sharing an order) is the SQL-expressible
stand-in for the repo_files link graph: FIXTURES.md §4. Every derivation
here has a textually-equivalent DuckDB oracle in plans/oracles.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected co-purchase edge set over parts: (src < dst), one row per
    pair of distinct parts appearing in the same order. Self-join on
    l_orderkey — Catalyst sort-merge/shuffle-hash on the order key; the
    p1<p2 predicate halves the pair space and canonicalizes."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
    )


def events_user_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparser graph: user–user edges between consecutive actors of the
    same event_type (by ts, event_id as deterministic tie-break)."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type")
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    nxt = ev.withColumn("next_user", F.lead("user_id").over(w))
    return (
        nxt.filter(F.col("next_user").isNotNull())
        .filter(F.col("user_id") != F.col("next_user"))
        .select(
            F.least("user_id", "next_user").alias("src"),
            F.greatest("user_id", "next_user").alias("dst"),
        )
        .distinct()
    )


def part_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id, label) over parts: label = the brand number ('Brand#13' → 13).
    The vertex-label table for labelled-pattern queries on the
    co-purchase graph (reference labels.bin analog)."""
    return load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("id"),
        F.substring("p_brand", 7, 8).cast("int").alias("label"),
    )


def user_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id, label) over event users: label = user_id % 5 (deterministic,
    SQL-reproducible)."""
    return (
        load(spark, sf_dir, "events")
        .select(F.col("user_id").alias("id"))
        .distinct()
        .select("id", (F.col("id") % 5).cast("int").alias("label"))
    )
