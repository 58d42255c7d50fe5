"""Deduplication operators for large-scale text/document corpora.

Exact dedup is a hash groupBy; near-dup is MinHash+LSH (shingle → minhash
→ band → bucket-join), SimHash, and n-gram Jaccard verification. All hash
computation is JVM-side (xxhash64/sha2 + array functions); the only
Python is driver-side parameter generation. Designed so the candidate-pair
stage shuffles on small band keys, never on raw text.

Scale notes: LSH bucket join self-joins only within buckets — the shuffle
key is (band, band_hash), and a pathological bucket (boilerplate docs) is
capped via `max_bucket` to bound the quadratic blowup, mirroring the
skew-salting philosophy of the link-graph layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: with a, b, x all < 2^31, a*x + b < 2^62 stays in
# int64 under ANSI arithmetic (a 61-bit prime would overflow the multiply).
_P = (1 << 31) - 1


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(hash, n_docs, doc_ids): groups of byte-identical documents.
    sha2-256 — collision-safe at any corpus size."""
    h = df.select(F.col(id_col).alias("id"), F.sha2(F.col(text_col), 256).alias("hash"))
    return (
        h.groupBy("hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sort_array(F.collect_list("id")).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per identical text."""
    w_hash = df.withColumn("_h", F.sha2(F.col(text_col), 256))
    keep = w_hash.groupBy("_h").agg(F.min(id_col).alias(id_col))
    return w_hash.join(keep, ["_h", id_col], "left_semi").drop("_h")


def shingles(
    df: DataFrame, text_col: str = "text", k: int = 5, token_pattern: str | None = None
) -> DataFrame:
    """Adds `shingle_hashes`: distinct xxhash64 of k-word shingles.
    Default tokenization = lowercase single-space split (oracle-portable);
    pass token_pattern (e.g. r"[^\\p{L}\\p{N}]+") for regex tokenization."""
    toks = F.split(F.lower(F.col(text_col)), token_pattern or " ")
    toks = F.filter(toks, lambda t: t != "")
    n = F.size(toks)
    idxs = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(
        idxs, lambda i: F.xxhash64(F.concat_ws("\x1f", F.slice(toks, i + 1, k)))
    )
    # degenerate docs (< k tokens): one shingle over all tokens
    sh = F.when(n >= k, sh).otherwise(
        F.array(F.xxhash64(F.concat_ws("\x1f", toks)))
    )
    return df.withColumn("shingle_hashes", F.array_distinct(sh))


def minhash_signature(
    df: DataFrame, n_hashes: int = 64, seed: int = 42, col: str = "shingle_hashes"
) -> DataFrame:
    """Adds `sig`: array of n_hashes minhash values. Permutation hashes
    h_i(x) = (a_i * x + b_i) mod P over the shingle hash — computed with
    JVM array ops (transform + array_min), no UDFs."""
    import random

    rnd = random.Random(seed)
    params = [(rnd.randrange(1, _P), rnd.randrange(0, _P)) for _ in range(n_hashes)]
    base = F.transform(F.col(col), lambda x: F.pmod(x, F.lit(_P)))

    def perm(a: int, b: int):
        # factory closure: PySpark infers lambda arity from the signature,
        # so captured constants must not appear as default parameters
        return lambda x: F.pmod(
            F.pmod(F.lit(a) * x, F.lit(_P)) + F.lit(b), F.lit(_P)
        )

    sig = F.array(
        *[F.array_min(F.transform(base, perm(a, b))) for a, b in params]
    )
    return df.withColumn("sig", sig)


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    n_bands: int = 16,
    rows_per_band: int = 4,
    max_bucket: int = 200,
) -> DataFrame:
    """(a, b) candidate near-dup pairs: docs sharing ≥1 LSH band bucket.
    Bands hash `rows_per_band` consecutive signature values; the self-join
    runs per (band, bucket). Buckets larger than max_bucket are dropped
    (boilerplate guard) — at 100 TB a single degenerate bucket would
    otherwise produce O(bucket²) pairs in one task."""
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.xxhash64(
                    F.concat_ws(
                        ",",
                        *[
                            F.col("sig").getItem(i * rows_per_band + j).cast("string")
                            for j in range(rows_per_band)
                        ],
                    )
                ).alias("bucket"),
            )
            for i in range(n_bands)
        ]
    )
    exploded = (
        df.select(F.col(id_col).alias("id"), bands.alias("bands"))
        .select("id", F.explode("bands").alias("b"))
        .select("id", F.col("b.band").alias("band"), F.col("b.bucket").alias("bucket"))
    )
    sized = exploded.withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy("band", "bucket"))
    ).filter(F.col("_n") <= max_bucket)
    a = sized.select("band", "bucket", F.col("id").alias("a"))
    b = sized.select("band", "bucket", F.col("id").alias("b"))
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame,
    shingled: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.7,
) -> DataFrame:
    """(a, b, jaccard) for candidate pairs with true n-gram Jaccard ≥
    threshold — exact verification via array_intersect/array_union on the
    shingle-hash sets (the adversarial-check stage after LSH recall)."""
    sa = shingled.select(F.col(id_col).alias("a"), F.col("shingle_hashes").alias("sa"))
    sb = shingled.select(F.col(id_col).alias("b"), F.col("shingle_hashes").alias("sb"))
    j = (
        pairs.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            (
                F.size(F.array_intersect("sa", "sb"))
                / F.size(F.array_union("sa", "sb"))
            ).alias("jaccard"),
        )
    )
    return j.filter(F.col("jaccard") >= threshold)


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 5,
    n_hashes: int = 64,
    n_bands: int = 16,
    threshold: float = 0.7,
    seed: int = 42,
) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: shingle → sign → band →
    bucket-join → exact Jaccard verify. Returns (a, b, jaccard)."""
    sh = shingles(df.select(id_col, text_col), text_col, k_shingle)
    sig = minhash_signature(sh, n_hashes, seed)
    cand = lsh_candidate_pairs(sig, id_col, n_bands, n_hashes // n_bands)
    return jaccard_verify(cand, sh, id_col, threshold)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """(a, b, jaccard): ALL pairs with k-shingle Jaccard ≥ threshold —
    exact quadratic baseline (the oracle-checkable ground truth that the
    LSH pipelines approximate). Use only on bounded inputs; at corpus
    scale use minhash_dedup_pairs."""
    sh = shingles(df.select(id_col, text_col), text_col, k)
    a = sh.select(F.col(id_col).alias("a"), F.col("shingle_hashes").alias("sa"))
    b = sh.select(F.col(id_col).alias("b"), F.col("shingle_hashes").alias("sb"))
    j = (
        a.join(b, F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            (
                F.size(F.array_intersect("sa", "sb"))
                / F.size(F.array_union("sa", "sb"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return j


def simhash(df: DataFrame, text_col: str = "text", bits: int = 64) -> DataFrame:
    """Adds `simhash`: 64-bit SimHash over word tokens — per-bit majority
    vote of token hashes, as JVM array algebra (aggregate over ±1 votes)."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"[^\p{L}\p{N}]+"), lambda t: t != ""
    )
    th = F.transform(toks, lambda t: F.xxhash64(t))
    def voter(i: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_exprs = []
    for i in range(bits):
        votes = F.aggregate(th, F.lit(0), voter(i))
        bit_val = (1 << i) if i < 63 else -(1 << 63)  # signed-long wrap for bit 63
        bit_exprs.append(
            F.when(votes > 0, F.lit(bit_val).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    import functools
    import operator

    sh = functools.reduce(operator.add, bit_exprs)
    return df.withColumn("simhash", sh)


def simhash_near_pairs(
    df: DataFrame, id_col: str = "doc_id", max_hamming: int = 3, n_blocks: int = 4
) -> DataFrame:
    """(a, b, hamming) pairs with Hamming(simhash) ≤ max_hamming, found by
    block-permutation LSH: split the 64-bit hash into n_blocks 16-bit
    blocks; any pair within distance max_hamming < n_blocks shares ≥ one
    exact block (pigeonhole) — bucket-join on (block_idx, block_value)."""
    width = 64 // n_blocks
    blocks = F.array(
        *[
            F.struct(
                F.lit(i).alias("bi"),
                F.shiftright(F.col("simhash"), i * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("bv"),
            )
            for i in range(n_blocks)
        ]
    )
    ex = (
        df.select(F.col(id_col).alias("id"), F.col("simhash"), blocks.alias("bs"))
        .select("id", "simhash", F.explode("bs").alias("b"))
        .select("id", "simhash", F.col("b.bi").alias("bi"), F.col("b.bv").alias("bv"))
    )
    a = ex.select("bi", "bv", F.col("id").alias("a"), F.col("simhash").alias("ha"))
    b = ex.select("bi", "bv", F.col("id").alias("b"), F.col("simhash").alias("hb"))
    pairs = (
        a.join(b, ["bi", "bv"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"))
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)
