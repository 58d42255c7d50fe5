"""DuckDB oracle SQL for the training-data operators (documents /
embeddings tables). Tokenization is single-space split in both engines;
shingle Jaccard is computed on hash sets in Spark and string sets in SQL —
identical values absent 64-bit hash collisions. Hash-dependent outputs
(minhash/simhash pair lists) have no SQL oracle → rows-only checks.
"""

from __future__ import annotations

from peregrine_spark.operators.text import LANG_MARKERS, STOPWORDS

TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"
TOKS_LOWER = "list_filter(string_split(lower(text), ' '), x -> x <> '')"


def token_stats_sql() -> str:
    return f"""
WITH t AS (SELECT doc_id, text, {TOKS} AS toks FROM documents)
SELECT doc_id,
       len(toks) AS n_tokens,
       length(text) AS n_chars2,
       ROUND(CASE WHEN len(toks) > 0
             THEN list_sum(list_transform(toks, x -> length(x))) * 1.0 / len(toks)
             ELSE 0.0 END, 6) AS avg_token_len
FROM t"""


def dup_stats_sql() -> str:
    return """
SELECT COUNT(*) AS n_docs,
       COUNT(DISTINCT sha256(text)) AS n_distinct_texts
FROM documents"""


def quality_sql() -> str:
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
WITH t AS (
  SELECT doc_id, text, {TOKS_LOWER} AS toks, length(text) AS len FROM documents
),
r AS (
  SELECT doc_id,
    CASE WHEN len(toks) > 0 THEN
      len(list_filter(toks, x -> list_contains([{stop_list}], x))) * 1.0 / len(toks)
    ELSE 0.0 END AS stopword_ratio,
    CASE WHEN len > 0 THEN
      (len - length(regexp_replace(text, '[.,;:!?]', '', 'g'))) * 1.0 / len
    ELSE 0.0 END AS punct_ratio,
    CASE WHEN len > 0 THEN
      (len - length(regexp_replace(text, '[A-Z]', '', 'g'))) * 1.0 / len
    ELSE 0.0 END AS upper_ratio
  FROM t
)
SELECT doc_id,
       ROUND(stopword_ratio, 6) AS stopword_ratio,
       ROUND(punct_ratio, 6) AS punct_ratio,
       ROUND(upper_ratio, 6) AS upper_ratio,
       ROUND(LEAST(stopword_ratio * 4, 1.0) * 0.5
           + (1 - LEAST(punct_ratio * 5, 1.0)) * 0.25
           + (1 - LEAST(upper_ratio * 5, 1.0)) * 0.25, 6) AS quality
FROM r"""


def lang_guess_sql() -> str:
    score_exprs = []
    for lang, ms in LANG_MARKERS.items():
        parts = " + ".join(
            f"(length(s) - length(replace(s, '{m}', ''))) / {len(m)}" for m in ms
        )
        score_exprs.append(f"({parts}) AS s_{lang}")
    langs = list(LANG_MARKERS)
    best = "GREATEST(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    case = " ".join(
        f"WHEN s_{lang} = best AND best > 0 THEN '{lang}'" for lang in langs
    )
    return f"""
WITH t AS (
  SELECT doc_id, ' ' || lower(text) || ' ' AS s FROM documents
),
sc AS (SELECT doc_id, {", ".join(score_exprs)} FROM t),
b AS (SELECT doc_id, *, {best} AS best FROM sc)
SELECT doc_id, CASE {case} ELSE 'und' END AS lang_guess FROM b"""


def ngram_jaccard_sql(k: int = 3, threshold: float = 0.5) -> str:
    return f"""
WITH t AS (SELECT doc_id, {TOKS_LOWER} AS toks FROM documents),
sh AS (
  SELECT doc_id,
    list_distinct(CASE WHEN len(toks) >= {k}
      THEN list_transform(range(1, len(toks) - {k} + 2),
                          i -> array_to_string(list_slice(toks, i, i + {k} - 1), chr(31)))
      ELSE [array_to_string(toks, chr(31))] END) AS s
  FROM t
)
SELECT a.doc_id AS a, b.doc_id AS b,
       ROUND(len(list_intersect(a.s, b.s)) * 1.0
             / len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.s, b.s)) * 1.0
      / len(list_distinct(list_concat(a.s, b.s))) >= {threshold}"""


def stream_dedup_sql() -> str:
    """Batch restatement of the streaming stateful dedup: first-seen
    (min doc_id) per distinct text, keyed by the content hash."""
    return """
SELECT sha256(text) AS hash, MIN(doc_id) AS doc_id
FROM documents GROUP BY text"""


def media_features_sql() -> str:
    """Metadata columns of extract_features over media_from_documents —
    the payload is derived from the documents table with pure expressions,
    so n_bytes / sha / parsed width/height are all SQL-reproducible (the
    fake-decode `feature` column stays out of the oracle contract)."""
    w = "CAST(8 + doc_id % 56 AS INT)"
    h = "CAST(8 + (doc_id * 7) % 56 AS INT)"
    payload = (
        f"'W' || CAST({w} AS VARCHAR) || 'H' || CAST({h} AS VARCHAR)"
        " || ';' || text"
    )
    return f"""
WITH m AS (
  SELECT doc_id AS media_id,
         (['image', 'audio', 'video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
         {payload} AS payload, {w} AS width, {h} AS height
  FROM documents
)
SELECT media_id, kind, CAST(octet_length(encode(payload)) AS BIGINT) AS n_bytes,
       sha256(payload) AS payload_sha, width, height
FROM m"""


def near_pairs_sql(threshold: float = 0.45) -> str:
    """Exact all-pairs cosine ≥ threshold (the ground truth for the
    embedding near-dup operators; quadratic — driver-gate scale only)."""
    dot = "list_sum(list_transform(range(1, len(a.e) + 1), i -> a.e[i] * b.e[i]))"
    na = "sqrt(list_sum(list_transform(a.e, x -> x * x)))"
    nb = "sqrt(list_sum(list_transform(b.e, x -> x * x)))"
    cos = f"{dot} / ({na} * {nb})"
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
SELECT a.vec_id AS a, b.vec_id AS b, ROUND({cos}, 6) AS cosine
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE {cos} >= {threshold}"""


def _fold_sum(list_expr: str) -> str:
    """Explicit sequential left fold (init 0.0) — the DuckDB restatement
    of Spark's F.aggregate(…, 0.0, acc + x), so threshold / top-k
    boundary decisions see bit-identical double arithmetic instead of
    whatever summation order list_sum picks."""
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {list_expr}),"
        " (acc, x) -> acc + x)"
    )


def near_pairs_lsh_sql(
    threshold: float = 0.45,
    n_planes: int = 16,
    max_hamming: int = 4,
    seed: int = 42,
    dim: int = 64,
) -> str:
    """Full oracle for the sign-LSH near-pair operator: the hyperplanes
    are seeded DRIVER LITERALS (similarity.hyperplanes — one source of
    truth), so DuckDB recomputes the same sketches, applies the Hamming
    filter, and verifies cosine. The Spark side's block join equals the
    plain Hamming-≤-max filter by the pigeonhole guarantee (max_hamming+1
    blocks), so the oracle can skip the banding entirely."""
    from peregrine_spark.operators.similarity import hyperplanes

    planes = hyperplanes(dim, n_planes, seed)
    plit = (
        "["
        + ", ".join(
            "[" + ", ".join(repr(x) for x in p) + "]" for p in planes
        )
        + "]"
    )
    dot = _fold_sum("list_transform(range(1, len(a.e) + 1), i -> a.e[i] * b.e[i])")
    na = f"sqrt({_fold_sum('list_transform(a.e, x -> x * x)')})"
    nb = f"sqrt({_fold_sum('list_transform(b.e, x -> x * x)')})"
    cos = f"{dot} / ({na} * {nb})"
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
p AS (SELECT {plit}::DOUBLE[][] AS planes),
sk AS (
  SELECT vec_id, e,
    CAST(list_sum(list_transform(range(1, {n_planes} + 1), i ->
      CASE WHEN {_fold_sum(f"list_transform(range(1, {dim} + 1), j -> e[j] * planes[i][j])")} > 0
           THEN 1 << (i - 1) ELSE 0 END)) AS BIGINT) AS sketch
  FROM v CROSS JOIN p
)
SELECT a.vec_id AS a, b.vec_id AS b, ROUND({cos}, 6) AS cosine
FROM sk a JOIN sk b ON a.vec_id < b.vec_id
WHERE bit_count(xor(a.sketch, b.sketch)) <= {max_hamming}
  AND {cos} >= {threshold}"""


def lsh_probe_topk_sql(
    k: int = 10,
    n_planes: int = 16,
    max_hamming: int = 2,
    seed: int = 42,
    dim: int = 64,
) -> str:
    """Oracle for the bucket-ring index probe: sketch every vector and
    the min-vec_id query vector with the SAME hyperplane literals, filter
    to Hamming ≤ max_hamming, exact-cosine top-k with the id tie-break.
    The index's bucket-ring pruning is recall-lossless by the pigeonhole
    guarantee, so the probe must equal this plain filtered top-k."""
    from peregrine_spark.operators.similarity import hyperplanes

    planes = hyperplanes(dim, n_planes, seed)
    plit = (
        "["
        + ", ".join(
            "[" + ", ".join(repr(x) for x in p) + "]" for p in planes
        )
        + "]"
    )
    plane_dot = _fold_sum(
        f"list_transform(range(1, {dim} + 1), j -> e[j] * planes[i][j])"
    )
    sketch = (
        f"CAST(list_sum(list_transform(range(1, {n_planes} + 1), i ->\n"
        f"      CASE WHEN {plane_dot} > 0\n"
        "           THEN 1 << (i - 1) ELSE 0 END)) AS BIGINT)"
    )
    return f"""
WITH p AS (SELECT {plit}::DOUBLE[][] AS planes),
v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
sk AS (SELECT vec_id, e, {sketch} AS sketch FROM v CROSS JOIN p),
q AS (SELECT e AS qe, sketch AS qsk FROM sk ORDER BY vec_id LIMIT 1),
cand AS (
  SELECT sk.vec_id AS id,
    {_fold_sum("list_transform(range(1, len(sk.e) + 1), i -> sk.e[i] * q.qe[i])")}
    / (sqrt({_fold_sum("list_transform(sk.e, x -> x * x)")})
       * sqrt({_fold_sum("list_transform(q.qe, x -> x * x)")})) AS cosine
  FROM sk CROSS JOIN q
  WHERE bit_count(xor(sk.sketch, q.qsk)) <= {max_hamming}
)
SELECT id, ROUND(cosine, 6) AS cosine
FROM cand ORDER BY cand.cosine DESC, id LIMIT {k}"""


def stream_window_degrees_sql() -> str:
    """Batch restatement of the streaming windowed degrees: tumbling
    epoch-aligned 1-hour windows over events. APPEND-mode only emits
    windows below the watermark, so the driver feeds a sentinel event 10
    days past max(ts) as the last batch — availableNow's final flush then
    carries every real window past the watermark (the sentinel's own
    window stays above it and is never emitted, and its user_id never
    appears). The batch equivalent is therefore the PLAIN aggregation."""
    return """
WITH ev AS (
  SELECT CAST(ts AS TIMESTAMP) AS ts, user_id FROM events
)
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start_epoch,
       user_id, COUNT(*) AS deg
FROM ev GROUP BY 1, 2"""


def cosine_topk_sql(k: int = 10) -> str:
    """Top-k cosine vs the min-vec_id embedding; explicit sequential
    double-precision fold so the float result matches Spark's aggregate."""
    return f"""
WITH q AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings
  ORDER BY vec_id LIMIT 1
),
s AS (
  SELECT e.vec_id,
         list_sum(list_transform(range(1, len(e.embedding) + 1),
                  i -> e.embedding[i]::DOUBLE * q.qv[i]))
         / (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))
            * sqrt(list_sum(list_transform(q.qv, x -> x * x)))) AS cosine
  FROM embeddings e CROSS JOIN q
)
SELECT vec_id, ROUND(cosine, 6) AS cosine
FROM s ORDER BY s.cosine DESC, vec_id LIMIT {k}"""
