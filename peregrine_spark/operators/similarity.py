"""Similarity search over embedding columns (array<float>).

- cosine_topk: brute-force exact top-k — the correctness baseline. Dot
  product via F.zip_with + F.aggregate (JVM, codegen) against a broadcast
  query vector.
- lsh_topk: random-hyperplane (sign) LSH bucketing as the scale path —
  probe only the query's bucket ring, exact re-rank inside.
- all_pairs_topk: per-vector k nearest among a set (small sets; the
  building block for embedding-space near-dup).

At 100 TB the brute-force scan is one pass (fine for a single query); the
LSH variant exists for query-heavy workloads — bucket sizes are bounded
and the shuffle key is the sketch, never the vector.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_scores(
    df: DataFrame, query: list[float], vec_col: str = "embedding"
) -> DataFrame:
    """Adds `cosine` vs the (driver-literal → broadcast) query vector."""
    qn = sum(x * x for x in query) ** 0.5
    q = F.array(*[F.lit(float(x)) for x in query])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cos = _dot(v, q) / (_norm(v) * F.lit(qn))
    return df.withColumn("cosine", cos)


def cosine_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine; deterministic tie-break on id. Spark's
    TakeOrderedAndProject handles the global top-k without a full sort."""
    scored = cosine_scores(df, query, vec_col)
    return (
        scored.select(id_col, "cosine")
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def hyperplane_sketch(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Adds `sketch`: sign-LSH bits vs n_planes random hyperplanes
    (seeded, driver-generated literals — no UDF)."""
    import random

    rnd = random.Random(seed)
    planes = [
        [rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bits = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        pc = F.array(*[F.lit(x) for x in p])
        bits = bits + F.when(_dot(v, pc) > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return df.withColumn("sketch", bits)


def lsh_topk(
    df_sketched: DataFrame,
    query: list[float],
    query_sketch: int,
    k: int = 10,
    max_hamming: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: filter to sketches within max_hamming of the
    query's sketch (bit_count on a long — pure codegen), then exact
    cosine re-rank of the survivors."""
    cand = df_sketched.filter(
        F.bit_count(F.col("sketch").bitwiseXOR(F.lit(query_sketch))) <= max_hamming
    )
    return cosine_topk(cand, query, k, id_col, vec_col)


def embedding_near_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_planes: int = 16,
    max_hamming: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """(a, b, cosine) pairs with cosine ≥ threshold — embedding-space
    near-dup: sketch-bucket candidate join + exact cosine verify."""
    sk = hyperplane_sketch(df, dim, n_planes, seed, vec_col)
    a = sk.select(
        F.col(id_col).alias("a"), F.col("sketch").alias("ska"), F.col(vec_col).alias("va")
    )
    b = sk.select(
        F.col(id_col).alias("b"), F.col("sketch").alias("skb"), F.col(vec_col).alias("vb")
    )
    # candidate pairs within Hamming ball: join on sketch block (pigeonhole
    # over two halves of the sketch) to avoid the full cross product
    half = n_planes // 2
    mask_lo = (1 << half) - 1
    a_lo = a.withColumn("blk", F.col("ska").bitwiseAND(F.lit(mask_lo)))
    b_lo = b.withColumn("blk", F.col("skb").bitwiseAND(F.lit(mask_lo)))
    a_hi = a.withColumn("blk", F.shiftright("ska", half) + F.lit(1 << n_planes))
    b_hi = b.withColumn("blk", F.shiftright("skb", half) + F.lit(1 << n_planes))
    cand = (
        a_lo.join(b_lo, "blk").union(a_hi.join(b_hi, "blk"))
        .filter(F.col("a") < F.col("b"))
        .filter(
            F.bit_count(F.col("ska").bitwiseXOR(F.col("skb"))) <= max_hamming
        )
        .select("a", "b", "va", "vb")
        .distinct()
    )
    va = F.transform(F.col("va"), lambda x: x.cast("double"))
    vb = F.transform(F.col("vb"), lambda x: x.cast("double"))
    cos = _dot(va, vb) / (_norm(va) * _norm(vb))
    return cand.select("a", "b", cos.alias("cosine")).filter(
        F.col("cosine") >= threshold
    )
