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
    pair of distinct parts appearing in the same order.

    Plan: ONE groupBy(l_orderkey) collecting the (tiny, ≤7-element)
    sorted part list per order, pairs exploded map-side, then the
    distinct. The equivalent self-join shuffled the lineitem table twice
    (both join sides) for the same pair set (guide §2.3: shuffle fewer
    bytes); the strict src < dst filter reproduces the join's p1 < p2
    canonicalization exactly (same-part duplicates within an order never
    pair)."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    grouped = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("l_partkey")).alias("_ps")
    )
    return (
        grouped.select(
            F.explode(
                F.expr(
                    "flatten(transform(_ps, (a, i) ->"
                    " transform(slice(_ps, i + 2, size(_ps) - i - 1),"
                    " b -> struct(a as src, b as dst))))"
                )
            ).alias("p")
        )
        .select("p.src", "p.dst")
        .filter(F.col("src") < F.col("dst"))
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
