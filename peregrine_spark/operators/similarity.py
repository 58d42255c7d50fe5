"""Similarity search over embedding columns (array<float>).

- cosine_topk: brute-force exact top-k — the correctness baseline. Dot
  product via F.zip_with + F.aggregate (JVM, codegen) against a broadcast
  query vector.
- lsh_topk: sign-LSH scan-with-filter — one cheap bit_count pass replaces
  the cosine for non-candidates (honest contract: it still reads every
  row once).
- write_lsh_index / lsh_probe_topk: the query-serving path — a persistent
  block-bucketed index probed with partition-pruned bucket-ring reads.
- embedding_near_pairs: block-LSH candidate join on short sketch keys,
  vectors re-joined only for survivors.

At 100 TB the brute-force scan is one pass (fine for a single query); the
LSH index exists for query-heavy workloads — bucket sizes are bounded
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


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> list[list[float]]:
    """Seeded random hyperplanes — driver literals shared by the Spark
    sketch, the DuckDB oracle generator (plans/oracles_text.py embeds the
    same constants), and index writers. One source of truth so the two
    sides can never drift."""
    import random

    rnd = random.Random(seed)
    return [[rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def hyperplane_sketch(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Adds `sketch`: sign-LSH bits vs n_planes random hyperplanes
    (seeded, driver-generated literals — no UDF)."""
    planes = hyperplanes(dim, n_planes, seed)
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
    """Approximate top-k as a SCAN-WITH-FILTER: every row is read and its
    sketch tested (bit_count on a long — pure codegen, far cheaper than
    the cosine it replaces), then exact cosine re-rank of the survivors.
    This is the one-shot form; for query-serving workloads that must NOT
    scan, build a bucketed index once with write_lsh_index and probe it
    with lsh_probe_topk (partition-pruned bucket-ring reads)."""
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
    sk = hyperplane_sketch(df, dim, n_planes, seed, vec_col).cache()
    blocks = _block_array(n_planes, n_blocks)
    # candidates shuffle on (block_idx, block_value) SHORT keys — ids and
    # 64-bit sketches only; the float vectors are re-joined for the (few)
    # surviving pairs below, so they ride ONE shuffle, not ×n_blocks
    ex = (
        sk.select(F.col(id_col).alias("id"), "sketch", F.explode(blocks).alias("b"))
        .select("id", "sketch", F.col("b.bi").alias("bi"), F.col("b.bv").alias("bv"))
    )
    a = ex.select("bi", "bv", F.col("id").alias("a"), F.col("sketch").alias("ska"))
    b = ex.select("bi", "bv", F.col("id").alias("b"), F.col("sketch").alias("skb"))
    cand = (
        a.join(b, ["bi", "bv"])
        .filter(F.col("a") < F.col("b"))
        .filter(
            F.bit_count(F.col("ska").bitwiseXOR(F.col("skb"))) <= max_hamming
        )
        .select("a", "b")
        .distinct()
    )
    vecs_a = sk.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    vecs_b = sk.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    pairs = cand.join(vecs_a, "a").join(vecs_b, "b")
    va = F.transform(F.col("va"), lambda x: x.cast("double"))
    vb = F.transform(F.col("vb"), lambda x: x.cast("double"))
    cos = _dot(va, vb) / (_norm(va) * _norm(vb))
    return pairs.select("a", "b", cos.alias("cosine")).filter(
        F.col("cosine") >= threshold
    )


def _block_array(n_planes: int, n_blocks: int):
    """array<struct(bi, bv)>: the sketch split into n_blocks bit-blocks —
    block i covers bits [i*w, (i+1)*w), the last takes the remainder.
    Pigeonhole: Hamming ≤ n_blocks - 1 ⇒ at least one block equal."""
    w = n_planes // n_blocks
    return F.array(
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


def write_lsh_index(
    df: DataFrame,
    path: str,
    dim: int,
    n_planes: int = 16,
    max_hamming: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Build the persistent bucket-ring index lsh_probe_topk probes: the
    block-exploded sketch table written hive-partitioned by block index
    (directory pruning) and sorted by bucket value within files (parquet
    row-group min/max pruning on bv). One index row per (vector, block) —
    ×(max_hamming+1) storage, the standard multi-probe LSH trade."""
    n_blocks = max_hamming + 1
    sk = hyperplane_sketch(df, dim, n_planes, seed, vec_col)
    ex = (
        sk.select(
            F.col(id_col).alias("id"), "sketch", F.col(vec_col).alias("v"),
            F.explode(_block_array(n_planes, n_blocks)).alias("b"),
        )
        .select("id", "sketch", "v", F.col("b.bi").alias("bi"), F.col("b.bv").alias("bv"))
    )
    (
        ex.repartition("bi")
        .sortWithinPartitions("bv")
        .write.mode("overwrite")
        .partitionBy("bi")
        .parquet(path)
    )


def lsh_probe_topk(
    spark,
    path: str,
    query: list[float],
    k: int = 10,
    n_planes: int = 16,
    max_hamming: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k against a write_lsh_index directory, touching
    ONLY the query's bucket ring: the filter is an OR of per-block
    (bi = i AND bv = qbv_i) conjunctions, so Catalyst prunes the bi
    partitions at plan time and parquet skips row groups by the bv sort
    (`.explain` shows PartitionFilters + PushedFilters). Candidates
    within max_hamming of the query sketch are exact-cosine re-ranked."""
    planes = hyperplanes(len(query), n_planes, seed)
    qs = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(query, p)) > 0:
            qs |= 1 << i
    n_blocks = max_hamming + 1
    w = n_planes // n_blocks
    ring = None
    for i in range(n_blocks):
        width = n_planes - i * w if i == n_blocks - 1 else w
        qbv = (qs >> (i * w)) & ((1 << width) - 1)
        clause = (F.col("bi") == i) & (F.col("bv") == qbv)
        ring = clause if ring is None else (ring | clause)
    idx = spark.read.parquet(path).filter(ring)
    cand = (
        idx.filter(F.bit_count(F.col("sketch").bitwiseXOR(F.lit(qs))) <= max_hamming)
        .select("id", "v")
        .dropDuplicates(["id"])
    )
    return cosine_topk(cand, query, k, id_col="id", vec_col="v")


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
