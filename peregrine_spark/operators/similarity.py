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
    """(a, b, cosine) pairs with cosine ≥ threshold among pairs whose
    sign-LSH sketches are within max_hamming bits — embedding-space
    near-dup: block-LSH candidate join + exact cosine verify.

    Pigeonhole recall: the sketch is split into max_hamming + 1 blocks, so
    any pair with Hamming(sketch) ≤ max_hamming shares at least one exact
    block (same guarantee construction as simhash_near_pairs). Candidates
    shuffle on (block_idx, block_value) short keys, never the vectors.

    Approximate by design: a high-cosine pair whose 16-bit sketches differ
    by > max_hamming bits is out of contract (raise n_planes / max_hamming
    to trade recall for candidate volume). For the exact bounded baseline
    see embedding_near_pairs_exact."""
    n_blocks = max_hamming + 1
    if n_blocks > n_planes:
        raise ValueError("max_hamming + 1 blocks must fit in n_planes bits")
    sk = hyperplane_sketch(df, dim, n_planes, seed, vec_col)
    # block i covers bits [i*w, (i+1)*w) (last block takes the remainder)
    w = n_planes // n_blocks
    blocks = F.array(
        *[
            F.struct(
                F.lit(i).alias("bi"),
                F.shiftright(F.col("sketch"), i * w)
                .bitwiseAND(
                    F.lit(
                        (1 << (n_planes - i * w if i == n_blocks - 1 else w)) - 1
                    )
                )
                .alias("bv"),
            )
            for i in range(n_blocks)
        ]
    )
    ex = (
        sk.select(
            F.col(id_col).alias("id"), F.col("sketch"), F.col(vec_col).alias("v"),
            F.explode(blocks).alias("b"),
        )
        .select("id", "sketch", "v", F.col("b.bi").alias("bi"), F.col("b.bv").alias("bv"))
    )
    a = ex.select("bi", "bv", F.col("id").alias("a"), F.col("sketch").alias("ska"), F.col("v").alias("va"))
    b = ex.select("bi", "bv", F.col("id").alias("b"), F.col("sketch").alias("skb"), F.col("v").alias("vb"))
    cand = (
        a.join(b, ["bi", "bv"])
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


def embedding_near_pairs_exact(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(a, b, cosine): ALL pairs with cosine ≥ threshold — exact quadratic
    baseline (the oracle-checkable ground truth the LSH path approximates;
    same role as dedup.ngram_jaccard_pairs). Use only on bounded inputs;
    at corpus scale use embedding_near_pairs."""
    a = df.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    va = F.transform(F.col("va"), lambda x: x.cast("double"))
    vb = F.transform(F.col("vb"), lambda x: x.cast("double"))
    cos = _dot(va, vb) / (_norm(va) * _norm(vb))
    return (
        a.join(b, F.col("a") < F.col("b"))
        .select("a", "b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
