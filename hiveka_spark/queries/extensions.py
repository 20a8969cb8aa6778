"""SURVEY.md §2C — LLM-data-pipeline extension operators as inventory entries.

Dedup (exact / n-gram Jaccard / MinHash-LSH / SimHash / embedding-cosine),
similarity search (brute-force + LSH ANN), text analysis (lang-ID, quality,
tokens, fingerprints), multimodal plumbing, as-of join.

Oracle notes: every ratio/cosine is floor-quantized (floor(x*1e4)/1e4) rather
than ROUND()ed — floor of an identical IEEE double is engine-independent while
ROUND half-boundary behavior is not.  Cosines are computed over fixed-point
integer-quantized vectors so dot products are exact integers (< 2^53) in both
engines regardless of summation order.  MinHash / SimHash / LSH entries hash
with the md5-derived portable_hash60, so even the probabilistic pipelines are
replayed exactly by their DuckDB oracles; quality (recall vs brute force) is
additionally property-tested in tests/.
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hiveka_spark.catalog import table
from hiveka_spark.operators import dedup as D
from hiveka_spark.operators import multimodal as M
from hiveka_spark.operators import similarity as S
from hiveka_spark.operators.asof import asof_join
from hiveka_spark.operators.text import (
    EN_STOPWORDS,
    tokens as word_tokens,
    LANG_MARKERS,
    SENTIMENT_NEG,
    SENTIMENT_POS,
    TOKEN_PATTERN,
    with_fingerprint,
    with_lang_id,
    with_quality,
    with_sentiment,
    with_token_stats,
)
from hiveka_spark.queries import register
from hiveka_spark.scratch import scratch_dir

_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + "]"

# Shared replay of operators.text.with_quality's feature CTEs — ONE copy of
# the delicate float-exact quality SQL, used by the x08 oracle here and the
# x74 curriculum-ordering oracle (curation_ext).
_QUALITY_TF_CTES = f"""t AS (
      SELECT doc_id,
             LENGTH(text) AS len_text,
             list_filter(string_split(LOWER(text), ' '), w -> w <> '') AS toks,
             LENGTH(regexp_replace(LOWER(text), '[^a-z0-9 ]', '', 'g')) AS n_alnum_space
      FROM documents),
    f AS (
      SELECT doc_id,
             LEN(toks) AS n_tok,
             list_sum(list_transform(toks, w -> LENGTH(w))) AS sum_len,
             LEN(list_filter(toks, w -> list_contains({_STOP_SQL}, w))) AS n_stop,
             (len_text - n_alnum_space) * 1.0 / GREATEST(len_text, 1) AS punct_r
      FROM t)"""

_QUALITY_SCORE_SQL = (
    "CAST(FLOOR((LEAST(n_tok / 100.0, 1.0) * 0.5 + (1.0 - punct_r) * 0.3"
    " + LEAST(n_stop * 1.0 / GREATEST(n_tok, 1) * 5.0, 1.0) * 0.2) * 10000.0)"
    " AS BIGINT) / 10000.0"
)


@register(
    "x01_dedup_exact",
    oracle="""
    SELECT MIN(doc_id) AS canonical_id, COUNT(*) AS copies
    FROM (SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 3 = 0)
    GROUP BY text
    """,
    tags=("dedup", "exact"),
)
def x01_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-aggregate on the full text key (one shuffle,
    map-side combinable).  A partial 're-crawl' is simulated by unioning every
    3rd document back in under shifted ids; dedup must collapse them."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    recrawl = d.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    return (
        D.exact_dedup(d.unionByName(recrawl), ["text"], "doc_id")
        .select("canonical_id", "copies")
    )


@register(
    "x02_dedup_ngram_jaccard",
    oracle="""
    WITH w AS (SELECT doc_id, list_filter(string_split(LOWER(text), ' '), x -> x <> '') AS ws
               FROM documents),
    sh AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS s
           FROM (SELECT doc_id, ws, UNNEST(generate_series(1, GREATEST(LEN(ws) - 2, 1))) AS i
                 FROM w)),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT id_a, id_b,
           CAST(FLOOR((i * 1.0 / (sa.n + sb.n - i)) * 10000.0) AS BIGINT) / 10000.0 AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(FLOOR((i * 1.0 / (sa.n + sb.n - i)) * 10000.0) AS BIGINT) / 10000.0 >= 0.8
    """,
    tags=("dedup", "neardup", "jaccard"),
)
def x02_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup detection: word-3-gram shingles -> inverted-index
    self-join -> pairwise Jaccard >= 0.8.  The fixture corpus has planted
    near-duplicates (jaccard >= 0.9 cluster, clean gap below)."""
    d = table(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(d, "doc_id", "text", k=3, threshold=0.8)


def _minhash_oracle(num_perm: int = 32, bands: int = 8, k: int = 3,
                    threshold: float = 0.8) -> str:
    """DuckDB replay of the full MinHash+LSH+verify pipeline — possible
    because every hash is the engine-portable md5-derived portable_hash60.
    Built on the CANONICAL SQL builders in operators/dedup.py (one copy of
    the replay math for x03/x41/s19/x60)."""
    return f"""
    WITH w AS (SELECT doc_id, list_filter(string_split(LOWER(text), ' '), x -> x <> '') AS ws
               FROM documents),
    {D.minhash_machinery_sql(num_perm, bands, k, "w")},
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
                                      AND a.doc_id < b.doc_id),
    {D.jaccard_pairs_sql("cand", "pairs", threshold, with_value=True)}
    SELECT id_a, id_b, jaccard FROM pairs
    """


@register(
    "x03_dedup_minhash",
    oracle=_minhash_oracle(),
    tags=("dedup", "neardup", "minhash", "lsh"),
)
def x03_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32 perms) + LSH(8 bands x 4 rows) candidates, Jaccard-verified
    at 0.8 on the candidate set only — the shuffle-on-bucket scale path for
    near-dup dedup.  Fully oracle-checked: portable_hash60 lets DuckDB replay
    the exact signatures, bands, and verification."""
    d = table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(d, "doc_id", "text", num_perm=32, bands=8, verify_threshold=0.8)


def _simhash_oracle(bits: int = 32, bands: int = 4, max_hamming: int = 3) -> str:
    votes = ",\n                 ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}" for i in range(bits)
    )
    sig = " + ".join(
        f"(CASE WHEN v{i} > 0 THEN CAST({2 ** i} AS BIGINT) ELSE 0 END)" for i in range(bits)
    )
    width = bits // bands
    mask = (1 << width) - 1
    blocks = "\n          UNION ALL\n          ".join(
        f"SELECT doc_id, simhash, {bi} AS block, (simhash >> {bi * width}) & {mask} AS bv"
        f" FROM sig"
        for bi in range(bands)
    )
    return f"""
    WITH tok AS (SELECT doc_id, UNNEST(list_filter(string_split(LOWER(text), ' '),
                                                   x -> x <> '')) AS w
                 FROM documents),
    h AS (SELECT doc_id, {D.portable_hash60_sql("w")} AS h FROM tok),
    votes AS (SELECT doc_id, {votes} FROM h GROUP BY doc_id),
    sig AS (SELECT doc_id, {sig} AS simhash FROM votes),
    blocks AS ({blocks}),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                    a.simhash AS sig_a, b.simhash AS sig_b
             FROM blocks a JOIN blocks b ON a.block = b.block AND a.bv = b.bv
                                        AND a.doc_id < b.doc_id)
    SELECT id_a, id_b, CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= {max_hamming}
    """


@register("x04_dedup_simhash", oracle=_simhash_oracle(), tags=("dedup", "neardup", "simhash"))
def x04_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(32-bit) near-dup pairs at Hamming <= 3 via pigeonhole banding
    (4 blocks): equi-join candidates, exact bit_count verify.  Oracle-checked
    end-to-end via portable_hash60 token hashes."""
    d = table(spark, sf_dir, "documents")
    return D.simhash_pairs(d, "doc_id", "text", bits=32, bands=4, max_hamming=3)


def _neardup_lsh_oracle(
    threshold: float = 0.4, n_planes: int = 4, n_tables: int = 8, dim: int = 64
) -> str:
    """Replay x05's multi-table hyperplane blocking in DuckDB: same
    md5-derived planes, same integer dots, same verify — candidate blocking
    is part of the declared (approximate) semantics, exactly like x03/x04/x07."""
    bucket_exprs = []
    for t in range(n_tables):
        planes = S.plane_weights(n_planes, dim, tag=f"t{t}_")
        bucket_exprs.append(
            " + ".join(
                f"(CASE WHEN list_dot_product(qvd, {[float(w) for w in planes[p]]}) > 0"
                f" THEN {2 ** p} ELSE 0 END)"
                for p in range(n_planes)
            )
        )
    cos = (
        "CAST(FLOOR((list_dot_product(a.qvd, b.qvd) / (sqrt(a.n2) * sqrt(b.n2)))"
        " * 10000.0) AS BIGINT) / 10000.0"
    )
    return f"""
    WITH q AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
               FROM embeddings),
    n AS (SELECT vec_id, list_transform(qv, x -> CAST(x AS DOUBLE)) AS qvd FROM q),
    e AS (SELECT vec_id, qvd, list_dot_product(qvd, qvd) AS n2,
                 UNNEST([{", ".join(bucket_exprs)}]) AS bucket,
                 UNNEST([{", ".join(str(t) for t in range(n_tables))}]) AS tbl
          FROM n)
    SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b, {cos} AS cosine
    FROM e a JOIN e b ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {cos} >= {threshold}
    """


@register(
    "x05_embedding_neardup",
    oracle=_neardup_lsh_oracle(),
    tags=("dedup", "neardup", "embedding", "similarity", "lsh"),
)
def x05_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos >= 0.4) via multi-table
    hyperplane LSH blocking (8 tables x 4 planes) + exact integer-cosine
    verify on candidates — the equi-join plan that survives 100 TB (no
    all-pairs product anywhere; asserted in tests/test_plans.py).  The
    exact all-pairs path lives on as S.cosine_neardup_pairs for recall
    measurement (tests/test_similarity.py)."""
    e = table(spark, sf_dir, "embeddings")
    return S.lsh_neardup_pairs(e, "vec_id", "embedding", threshold=0.4)


@register(
    "x05x_embedding_neardup_exact",
    oracle="""
    WITH q AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
               FROM embeddings),
    n AS (SELECT vec_id, qv,
                 list_dot_product(list_transform(qv, x -> CAST(x AS DOUBLE)),
                                  list_transform(qv, x -> CAST(x AS DOUBLE))) AS n2
          FROM q)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           CAST(FLOOR((list_dot_product(list_transform(a.qv, x -> CAST(x AS DOUBLE)),
                                        list_transform(b.qv, x -> CAST(x AS DOUBLE)))
                       / (sqrt(a.n2) * sqrt(b.n2))) * 10000.0) AS BIGINT) / 10000.0 AS cosine
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE CAST(FLOOR((list_dot_product(list_transform(a.qv, x -> CAST(x AS DOUBLE)),
                                       list_transform(b.qv, x -> CAST(x AS DOUBLE)))
                      / (sqrt(a.n2) * sqrt(b.n2))) * 10000.0) AS BIGINT) / 10000.0 >= 0.4
    """,
    tags=("dedup", "neardup", "embedding", "similarity", "exact"),
)
def x05x_embedding_neardup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT embedding-cosine near-dup pairs (cos >= 0.4) — the all-pairs
    O(n^2) baseline kept as its own gate entry: it is x05's recall oracle and
    the bounded-input exact mode.  x05 itself runs the LSH-blocked plan."""
    e = table(spark, sf_dir, "embeddings")
    return S.cosine_neardup_pairs(e, "vec_id", "embedding", threshold=0.4)


@register(
    "x06_ann_topk",
    oracle="""
    WITH q AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
               FROM embeddings),
    n AS (SELECT vec_id, qv,
                 list_dot_product(list_transform(qv, x -> CAST(x AS DOUBLE)),
                                  list_transform(qv, x -> CAST(x AS DOUBLE))) AS n2
          FROM q),
    scored AS (
      SELECT qs.vec_id AS query_id, cs.vec_id AS neighbor_id,
             CAST(FLOOR((list_dot_product(list_transform(qs.qv, x -> CAST(x AS DOUBLE)),
                                          list_transform(cs.qv, x -> CAST(x AS DOUBLE)))
                         / (sqrt(qs.n2) * sqrt(cs.n2))) * 10000.0) AS BIGINT) / 10000.0 AS cosine
      FROM n qs JOIN n cs ON qs.vec_id < 10 AND cs.vec_id <> qs.vec_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= 5
    """,
    tags=("similarity", "ann", "topk"),
)
def x06_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for the 10 query vectors (vec_id < 10):
    broadcast queries x corpus scan, per-query ranked window with
    deterministic tiebreak."""
    e = table(spark, sf_dir, "embeddings")
    return S.brute_force_topk(e, e.filter(F.col("vec_id") < 10), "vec_id", "embedding", k=5)


def _ann_lsh_oracle(k: int = 5, n_planes: int = 4, dim: int = 64) -> str:
    planes = S.plane_weights(n_planes, dim)
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(qvd, {[float(w) for w in planes[p]]}) > 0"
        f" THEN {2 ** p} ELSE 0 END)"
        for p in range(n_planes)
    )
    return f"""
    WITH q AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
               FROM embeddings),
    n AS (SELECT vec_id, list_transform(qv, x -> CAST(x AS DOUBLE)) AS qvd FROM q),
    b AS (SELECT vec_id, qvd, list_dot_product(qvd, qvd) AS n2, {bucket} AS bucket FROM n),
    probes AS (SELECT vec_id, qvd, n2,
                      UNNEST([bucket, {", ".join(f"xor(bucket, {2 ** p})" for p in range(n_planes))}])
                        AS bucket
               FROM b WHERE vec_id < 10),
    scored AS (
      SELECT qs.vec_id AS query_id, cs.vec_id AS neighbor_id,
             CAST(FLOOR((list_dot_product(qs.qvd, cs.qvd)
                         / (sqrt(qs.n2) * sqrt(cs.n2))) * 10000.0) AS BIGINT) / 10000.0
               AS cosine
      FROM probes qs JOIN b cs ON qs.bucket = cs.bucket AND cs.vec_id <> qs.vec_id)
    SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= {k}
    """


@register("x07_ann_lsh", oracle=_ann_lsh_oracle(), tags=("similarity", "ann", "lsh"))
def x07_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via random-hyperplane LSH buckets (4 planes over the
    quantized vectors — integer dots, engine-exact bucket assignment):
    candidates restricted to the query's bucket.  Recall vs brute force is
    property-tested in tests/; the oracle replays the same planes in DuckDB."""
    e = table(spark, sf_dir, "embeddings")
    return S.lsh_topk(e, e.filter(F.col("vec_id") < 10), "vec_id", "embedding", k=5, n_planes=4)


def _ann_ivf_ctes(
    k: int = 5, n_cells: int = 16, n_probe: int = 4, stride: int = 31,
    query_pred: str = "vec_id < 10", out: str = "knnf",
) -> str:
    """The IVF top-k replay as a CTE chain ending in ``{out}`` (query_id,
    neighbor_id, cosine, rank) — factored out of :func:`_ann_ivf_oracle`
    so graph consumers (x142's mutual-kNN components) can embed x139's
    certified edge list as their input CTE."""
    return f"""q AS (SELECT vec_id,
                 list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
          FROM embeddings),
    nn AS (SELECT vec_id, list_transform(qv, x -> CAST(x AS DOUBLE)) AS qvd,
                  list_dot_product(list_transform(qv, x -> CAST(x AS DOUBLE)),
                                   list_transform(qv, x -> CAST(x AS DOUBLE))) AS n2
           FROM q),
    cents AS (SELECT CAST(vec_id / {stride} AS BIGINT) AS cell, qvd AS cvd, n2 AS cn2
              FROM nn WHERE vec_id % {stride} = 0 AND vec_id / {stride} < {n_cells}),
    assign AS (SELECT vec_id, qvd, n2, cell,
                      ROW_NUMBER() OVER (PARTITION BY vec_id
                                         ORDER BY c_cos DESC, cell) AS c_rank
               FROM (SELECT nn.vec_id, nn.qvd, nn.n2, c.cell,
                            list_dot_product(nn.qvd, c.cvd)
                              / (sqrt(nn.n2) * sqrt(c.cn2)) AS c_cos
                     FROM nn CROSS JOIN cents c)),
    corpus AS (SELECT vec_id AS neighbor_id, qvd, n2, cell FROM assign WHERE c_rank = 1),
    probes AS (SELECT vec_id AS query_id, qvd, n2, cell
               FROM assign WHERE c_rank <= {n_probe} AND {query_pred}),
    scored AS (
      SELECT p.query_id, c.neighbor_id,
             CAST(FLOOR((list_dot_product(p.qvd, c.qvd)
                         / (sqrt(p.n2) * sqrt(c.n2))) * 10000.0) AS BIGINT) / 10000.0
               AS cosine
      FROM probes p JOIN corpus c ON p.cell = c.cell AND c.neighbor_id <> p.query_id),
    {out} AS (
      SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rank
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY cosine DESC, neighbor_id) AS rn
            FROM scored)
      WHERE rn <= {k})"""


def _ann_ivf_oracle(
    k: int = 5, n_cells: int = 16, n_probe: int = 4, stride: int = 31,
    query_pred: str = "vec_id < 10",
) -> str:
    return f"""
    WITH {_ann_ivf_ctes(k, n_cells, n_probe, stride, query_pred)}
    SELECT query_id, neighbor_id, cosine, rank FROM knnf
    """


@register("x15_ann_ivf", oracle=_ann_ivf_oracle(), tags=("similarity", "ann", "ivf"))
def x15_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5: corpus partitioned into 16 Voronoi cells around
    deterministic stride-sampled centroids; queries probe their 4 nearest
    cells (equi-join on cell id — corpus work per query drops ~4x).  The
    100 TB shape for ANN when bucket collisions (x07's LSH) are too coarse.
    The stride is an EXPLICIT literal (31 — ids are dense from 0 at every
    SF), not derived from corpus.count(): centroid choice must not cost a
    full corpus pass, and fixed centroids are the offline-training posture
    anyway (VERDICT r4 #4)."""
    e = table(spark, sf_dir, "embeddings")
    return S.ivf_topk(
        e, e.filter(F.col("vec_id") < 10), "vec_id", "embedding",
        k=5, n_cells=16, n_probe=4, centroid_stride=31,
    )


@register(
    "x08_text_quality",
    oracle=f"""
    WITH {_QUALITY_TF_CTES}
    SELECT doc_id,
           CAST(n_tok AS BIGINT) AS n_tokens,
           CAST(FLOOR((sum_len * 1.0 / GREATEST(n_tok, 1)) * 10000.0) AS BIGINT) / 10000.0
             AS avg_token_len,
           CAST(FLOOR((n_stop * 1.0 / GREATEST(n_tok, 1)) * 10000.0) AS BIGINT) / 10000.0
             AS stopword_ratio,
           CAST(FLOOR(punct_r * 10000.0) AS BIGINT) / 10000.0 AS punct_ratio,
           {_QUALITY_SCORE_SQL} AS quality_score
    FROM f
    """,
    tags=("text", "quality"),
)
def x08_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features (token stats, punctuation/stopword
    ratios) + composite score — all JVM-side expressions, no UDFs."""
    d = table(spark, sf_dir, "documents")
    return with_quality(d).select(
        "doc_id", "n_tokens", "avg_token_len", "stopword_ratio", "punct_ratio", "quality_score"
    )


def _lang_oracle() -> str:
    score_exprs = []
    for lang, markers in LANG_MARKERS.items():
        lst = "[" + ", ".join(f"'{w}'" for w in markers) + "]"
        score_exprs.append(
            f"LEN(list_filter(toks, w -> list_contains({lst}, w))) AS score_{lang}"
        )
    greatest = "GREATEST(" + ", ".join(f"score_{lang}" for lang in LANG_MARKERS) + ")"
    case = "CASE " + " ".join(
        f"WHEN score_{lang} = {greatest} THEN '{lang}'" for lang in LANG_MARKERS
    ) + " END"
    return f"""
    WITH t AS (SELECT doc_id, lang,
                      list_filter(string_split(LOWER(text), ' '), w -> w <> '') AS toks
               FROM documents),
    s AS (SELECT doc_id, lang, {", ".join(score_exprs)} FROM t)
    SELECT lang, {case} AS pred_lang, COUNT(*) AS cnt
    FROM s GROUP BY 1, 2
    """


@register("x09_lang_id", oracle=_lang_oracle(), tags=("text", "langid"))
def x09_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-lexicon language ID vs the labeled lang column: confusion-matrix
    counts per (lang, pred_lang)."""
    d = table(spark, sf_dir, "documents")
    return with_lang_id(d).groupBy("lang", "pred_lang").agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "x10_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(LEN(list_filter(string_split(LOWER(text), ' '), w -> w <> '')) AS BIGINT)
             AS n_tokens,
           CAST(LEN(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS BIGINT) AS n_regex_tokens,
           CAST(LENGTH(text) AS BIGINT) AS n_chars_actual
    FROM documents
    """,
    tags=("text", "tokens"),
)
def x10_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + regex (BPE-ish pre-tokenizer pattern) token counts."""
    d = table(spark, sf_dir, "documents")
    return with_token_stats(d).select("doc_id", "n_tokens", "n_regex_tokens", "n_chars_actual")


@register(
    "x11_fingerprint",
    oracle=r"""
    WITH n AS (SELECT doc_id,
                      TRIM(regexp_replace(LOWER(text), '\s+', ' ', 'g')) AS norm
               FROM documents)
    SELECT doc_id,
           md5(norm) AS fp_md5,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
                                    list_transform(string_split(norm, ''),
                                                   ch -> CAST(ascii(ch) AS BIGINT))),
                       (acc, x) -> (acc * 31 + x) % 2147483647) AS fp_roll
    FROM n
    """,
    tags=("text", "fingerprint"),
)
def x11_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: md5 of normalized text + 31-ary rolling
    polynomial hash mod 2^31-1 (both engine-exact)."""
    d = table(spark, sf_dir, "documents")
    return with_fingerprint(d).select("doc_id", "fp_md5", "fp_roll")


def _sentiment_oracle() -> str:
    pos = "[" + ", ".join(f"'{w}'" for w in SENTIMENT_POS) + "]"
    neg = "[" + ", ".join(f"'{w}'" for w in SENTIMENT_NEG) + "]"
    return f"""
    WITH t AS (SELECT doc_id, source,
                      list_filter(string_split(LOWER(COALESCE(text, '')), ' '),
                                  w -> w <> '') AS toks
               FROM documents),
    s AS (SELECT doc_id, source,
                 LEN(list_filter(toks, w -> list_contains({pos}, w))) AS n_pos,
                 LEN(list_filter(toks, w -> list_contains({neg}, w))) AS n_neg,
                 LEN(toks) AS n_tok
          FROM t),
    p AS (SELECT doc_id, source,
                 CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
                 CAST(FLOOR((n_pos - n_neg) * 1000000.0 / GREATEST(n_tok, 1)) AS BIGINT)
                   AS polarity_micro
          FROM s),
    w AS (SELECT doc_id, source, n_pos, n_neg, polarity_micro,
                 SUM(polarity_micro) OVER (PARTITION BY source) AS ws,
                 COUNT(*) OVER (PARTITION BY source) AS wc
          FROM p)
    SELECT doc_id, source, n_pos, n_neg, polarity_micro,
           CASE WHEN polarity_micro > 0 THEN 'positive'
                WHEN polarity_micro < 0 THEN 'negative'
                ELSE 'neutral' END AS sentiment,
           CAST((ws - ((ws % wc) + wc) % wc) // wc AS BIGINT) AS source_mean_micro
    FROM w
    """


@register("x69_sentiment", oracle=_sentiment_oracle(), tags=("text", "sentiment"))
def x69_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon sentiment polarity per document + per-source mean — the last
    SURVEY §2C text-analysis row (mirrors the EDBT-2016 tweet-sentiment
    workload; reference data analog: FakeTweetProducer.java:40-65 +
    src/main/avro/twitter.avsc:5-17).  Scoring is zero-shuffle per-row JVM
    expressions with the lexicon folded in as a literal; the only exchange
    is the per-source window (hash partition by source).  Integer micro-unit
    polarity so DuckDB replays exactly; the per-source mean is pure bigint
    arithmetic too — floor(sum/count) as (sum - pmod(sum, count)) DIV count,
    never floor(AVG(...)): avg accumulates bigints as doubles, so past 2^53
    per-source polarity mass (~9e9 docs/source) it would turn
    partition-order-sensitive and floor could land on a boundary.  The
    declared pandas-UDF twin (`with_sentiment_pandas`) is pinned equal in
    tests/test_operators.py."""
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents")
    scored = with_sentiment(d).select(
        "doc_id", "source", "n_pos", "n_neg", "polarity_micro", "sentiment"
    )
    w = Window.partitionBy("source")
    return (
        scored.withColumn("_ws", F.sum("polarity_micro").over(w).cast("bigint"))
        .withColumn("_wc", F.count(F.lit(1)).over(w).cast("bigint"))
        .withColumn(
            "source_mean_micro",
            F.expr("(_ws - pmod(_ws, _wc)) DIV _wc").cast("bigint"),
        )
        .drop("_ws", "_wc")
    )


@register(
    "x12_multimodal_meta",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           CAST(doc_id % 64 + 16 AS INTEGER) AS width,
           CAST(doc_id % 48 + 16 AS INTEGER) AS height
    FROM documents
    """,
    tags=("multimodal",),
)
def x12_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal column plumbing: text fixture -> binary content + typed
    metadata struct; verifies the binary length and metadata derivation.  The
    pandas-UDF decode path over the same table is exercised in tests/."""
    d = table(spark, sf_dir, "documents")
    media = M.synthesize_media(d, "doc_id", "text")
    return media.select(
        "media_id",
        F.length("content").cast("bigint").alias("byte_len"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


@register(
    "x14_avro_wire_roundtrip",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang
    """,
    tags=("kafka", "avro", "ingest"),
)
def x14_avro_wire_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole value proposition on the correctness gate: rows
    -> raw-framed Avro binary (BaseProducer.java:44-54; the sink the reference
    stubs at KafkaOutputFormat.java:28-39) -> wire decode against the declared
    schema (KafkaAvroMessageDecoder.java:153-177) -> SQL aggregation on the
    decoded columns.  The oracle aggregates the source table directly, so any
    codec corruption breaks the hash match.  Arrow-batched mapInPandas both
    directions — per-batch Python cost, no per-row pickling."""
    from hiveka_spark.schema import struct_to_avro
    from hiveka_spark.sources.avro_codec import decode_avro_df, encode_avro_df

    d = table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    avro = struct_to_avro(d.schema, "document")
    wire = encode_avro_df(d, avro)
    decoded = decode_avro_df(wire, avro)
    return decoded.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
    )


@register(
    "x17_pandas_udf_density",
    oracle="""
    SELECT doc_id,
           CAST(FLOOR(LEN(list_filter(string_split(text, ' '), w -> w <> ''))
                      * 10000.0 / (LENGTH(text) + 1)) AS BIGINT) / 10000.0 AS density
    FROM documents
    """,
    tags=("udf", "pandas", "vectorized"),
)
def x17_pandas_udf_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF (Arrow-batched) with a pure-SQL oracle:
    proves the Python escape hatch computes exactly what the JVM path would."""
    from hiveka_spark.functions.udfs import py_density

    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", py_density("text").alias("density"))


@register(
    "x18_grouped_zscore",
    oracle="""
    SELECT doc_id, lang,
           CAST(FLOOR((n_chars - AVG(n_chars) OVER (PARTITION BY lang))
                      / STDDEV_SAMP(n_chars) OVER (PARTITION BY lang)
                      * 10000.0) AS BIGINT) / 10000.0 AS z
    FROM documents
    """,
    tags=("udf", "pandas", "grouped-map"),
)
def x18_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-language z-score of document length
    (sample std).  One shuffle on lang; oracle is the SQL window twin."""
    from hiveka_spark.functions.udfs import zscore_per_group

    d = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return zscore_per_group(d, "lang", "n_chars")


@register(
    "x19_pandas_udaf",
    oracle="""
    SELECT lang, ROUND(AVG(n_chars), 4) AS mean_chars, COUNT(*) AS n_docs
    FROM documents GROUP BY lang
    """,
    tags=("udf", "pandas", "udaf"),
)
def x19_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDAFs (mean + count): whole groups ship to
    Python as Arrow batches (Spark forbids mixing pandas and JVM aggregates
    in one agg, so both are pandas here)."""
    from hiveka_spark.functions.udfs import py_count, py_mean

    d = table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.round(py_mean("n_chars"), 4).alias("mean_chars"),
        py_count("n_chars").alias("n_docs"),
    )


@register(
    "x20_mapinpandas_tokens",
    oracle="""
    SELECT LENGTH(t.w) AS token_len, COUNT(*) AS n_tokens
    FROM documents d,
         UNNEST(list_filter(string_split(d.text, ' '), w -> w <> '')) AS t(w)
    GROUP BY 1
    """,
    tags=("udf", "pandas", "mapinpandas", "udtf"),
)
def x20_mapinpandas_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas fan-out (the UDTF-ish surface): each document row yields
    one row per whitespace token inside the scan partition (no shuffle from
    the fan-out itself), then a JVM aggregate over token lengths.  Oracle is
    the pure-SQL UNNEST twin."""
    from hiveka_spark.functions.udfs import tokenize_map_in_pandas

    d = table(spark, sf_dir, "documents")
    toks = tokenize_map_in_pandas(d, "text")
    return toks.groupBy("token_len").agg(F.count(F.lit(1)).alias("n_tokens"))


@register(
    "x21_python_udtf_bigrams",
    oracle="""
    WITH words AS (
      SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
      FROM documents
    ),
    bigrams AS (
      SELECT doc_id, ws[t.i] || ' ' || ws[t.i + 1] AS bigram
      FROM words, UNNEST(range(1, len(ws))) AS t(i)
    )
    SELECT doc_id, COUNT(*) AS n_bigrams, COUNT(DISTINCT bigram) AS n_distinct
    FROM bigrams GROUP BY doc_id
    """,
    tags=("udf", "udtf", "sql"),
)
def x21_python_udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True Python UDTF called from SQL via LATERAL: word bigrams per
    document, aggregated to per-doc totals.  Oracle rebuilds the bigrams
    with UNNEST(range(...)) over the split word list."""
    from hiveka_spark.functions.udfs import ngram_udtf

    spark.udtf.register("ngrams", ngram_udtf())
    table(spark, sf_dir, "documents").createOrReplaceTempView("x21_docs")
    return spark.sql(
        """
        SELECT t.doc_id, COUNT(*) AS n_bigrams, COUNT(DISTINCT t.bigram) AS n_distinct
        FROM x21_docs d, LATERAL ngrams(d.doc_id, d.text) t
        GROUP BY t.doc_id
        """
    )


@register(
    "x22_multimodal_features",
    # The fake decode tiles the sha256 digest across the pixel buffer, so the
    # per-image mean is pure integer arithmetic on the 32 digest bytes:
    # n = w*h*3 pixels use each digest byte n//32 times plus the first n%32
    # bytes once more; mean_pixel = floor(total / n).
    oracle="""
    WITH b AS (
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
             sha256(text) AS sha,
             CAST(doc_id % 64 + 16 AS INTEGER) AS width,
             CAST(doc_id % 48 + 16 AS INTEGER) AS height
      FROM documents
    ),
    d AS (
      SELECT *,
             list_transform(range(0, 32),
               k -> strpos('0123456789abcdef', substr(sha, CAST(k*2+1 AS INT), 1)) * 16
                  + strpos('0123456789abcdef', substr(sha, CAST(k*2+2 AS INT), 1)) - 17
             ) AS dig,
             CAST(width AS BIGINT) * height * 3 AS n
      FROM b
    )
    SELECT doc_id AS media_id,
           byte_len,
           sha AS content_sha,
           CAST(((n // 32) * list_sum(dig)
                 + COALESCE(list_sum(list_slice(dig, 1, CAST(n % 32 AS INT))), 0))
                // n AS BIGINT) AS mean_pixel,
           width,
           height
    FROM d
    """,
    tags=("multimodal", "mapinpandas"),
)
def x22_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multimodal plumbing run: documents → binary media table (content
    bytes + typed metadata struct) → per-image decode + feature extraction
    via Arrow-batched mapInPandas.  The decode body is the clearly-marked
    deterministic fake (real codecs aren't in this environment); the Spark
    plumbing — schema, batch shape, partition-parallel decode — is the real
    pattern for CLIP-embed/OCR/EXIF at 100 TB.  The fake is digest-tiling
    arithmetic, so the DuckDB oracle replays the decode exactly — full
    value-hash parity, not a rows-only check."""
    from hiveka_spark.operators.multimodal import decode_image_features, synthesize_media

    d = table(spark, sf_dir, "documents")
    media = synthesize_media(d, "doc_id", "text")
    return decode_image_features(media)


@register(
    "x16_salted_distinct",
    oracle="""
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct_user_id
    FROM events
    GROUP BY event_type
    """,
    tags=("agg", "distinct", "skew"),
)
def x16_salted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof exact count-distinct: salt = hash(user_id) % 16 splits each
    event_type's distinct-user work across 16 disjoint buckets whose counts
    sum exactly.  Identical answer to COUNT(DISTINCT) — the salt only moves
    work — which is the point of the plain SQL oracle."""
    from hiveka_spark.operators.skew import salted_count_distinct

    e = table(spark, sf_dir, "events")
    return salted_count_distinct(e, ["event_type"], "user_id", salt_n=16)


@register(
    "x13_asof_join",
    oracle="""
    WITH clicks AS (SELECT user_id, event_id, epoch_ms(ts) AS ms
                    FROM events WHERE event_type = 'click'),
    purchases AS (SELECT user_id, event_id, epoch_ms(ts) AS ms
                  FROM events WHERE event_type = 'purchase')
    SELECT p.event_id AS purchase_id, p.user_id AS user_id,
           c.event_id AS click_id,
           p.ms - c.ms AS asof_gap_ms
    FROM purchases p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ms >= c.ms
    """,
    tags=("join", "asof"),
)
def x13_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (union + ordered-window carry-forward — no
    collect, no UDF): each purchase matched to the user's most recent
    preceding click."""
    e = table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    joined = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts",
        right_value_cols=["click_id"],
    )
    return joined.select("purchase_id", "user_id", "click_id", "asof_gap_ms")


_MIX_RATES = {"en": 10, "zh": 50, "es": 30, "de": 100, "fr": 25}


@register(
    "x23_stratified_sample",
    # generated by hiveka_spark.operators.sampling.stratified_sample_sql
    # ("lang", _MIX_RATES, "CAST(doc_id AS VARCHAR)")
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE (CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100)
          < (CASE lang WHEN 'en' THEN 10 WHEN 'zh' THEN 50 WHEN 'es' THEN 30
                       WHEN 'de' THEN 100 WHEN 'fr' THEN 25 ELSE 0 END)
    """,
    tags=("sampling", "mixing"),
)
def x23_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling / data mixing: per-language keep
    rates (en 10%, zh 50%, es 30%, de 100%, fr 25%) decided by the
    md5-derived hash bucket of doc_id — reproducible row-for-row across
    runs, task retries, and engines (unlike df.sample's RNG).  Zero
    shuffles: one codegen'd CASE predicate at the scan."""
    from hiveka_spark.operators.sampling import stratified_sample

    d = table(spark, sf_dir, "documents")
    return stratified_sample(d, "lang", _MIX_RATES, "doc_id").select(
        "doc_id", "lang", "source"
    )


@register(
    "x24_decontamination",
    oracle="""
    WITH w AS (SELECT doc_id, list_filter(string_split(LOWER(text), ' '), x -> x <> '') AS ws
               FROM documents),
    sh AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS s
           FROM (SELECT doc_id, ws, UNNEST(generate_series(1, GREATEST(LEN(ws) - 2, 1))) AS i
                 FROM w)),
    ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 20 = 0),
    tr AS (SELECT doc_id, s FROM sh WHERE doc_id % 20 <> 0),
    sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM tr GROUP BY doc_id),
    hits AS (SELECT tr.doc_id, COUNT(*) AS n_overlap FROM tr JOIN ev USING (s) GROUP BY tr.doc_id)
    SELECT h.doc_id AS doc_id,
           CAST(z.n_shingles AS BIGINT) AS n_shingles,
           CAST(h.n_overlap AS BIGINT) AS n_overlap,
           FLOOR(h.n_overlap * 10000.0 / z.n_shingles) / 10000.0 AS overlap_ratio
    FROM hits h JOIN sizes z USING (doc_id)
    WHERE h.n_overlap >= 1
    """,
    tags=("decontamination", "dedup", "shingle"),
)
def x24_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: every 20th document plays the eval set;
    each remaining training doc is scored by how many of its word-3-gram
    shingles appear anywhere in the eval corpus.  The eval shingle set is
    DISTINCT-collapsed and broadcast (eval corpora are tiny next to 100 TB
    of training data), so training shingles never shuffle — the only
    exchange is the per-doc overlap count."""
    d = table(spark, sf_dir, "documents")
    ev = d.filter(F.col("doc_id") % 20 == 0)
    tr = d.filter(F.col("doc_id") % 20 != 0)
    out = D.contamination_overlap(tr, ev, "doc_id", "text", k=3, min_overlap=1)
    return out.select(
        F.col("doc").alias("doc_id"), "n_shingles", "n_overlap", "overlap_ratio"
    )


@register(
    "x25_pack_chunks",
    oracle="""
    WITH t AS (SELECT doc_id, source,
                      LEN(list_filter(string_split(LOWER(text), ' '), x -> x <> '')) AS n_tokens
               FROM documents),
    c AS (SELECT doc_id, source, n_tokens,
                 SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tokens AS cum_before
          FROM t)
    SELECT source,
           CAST(FLOOR(cum_before / 256.0) AS BIGINT) AS chunk,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS chunk_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM c
    GROUP BY source, chunk
    """,
    tags=("packing", "tokens"),
)
def x25_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: lay documents out in doc_id order within each
    source and cut contiguous chunks every 256 tokens (cumulative-sum
    window, bounded overflow of one doc).  Partitioning the window by
    source keeps packing state distributed — no global sort, which is the
    only packing formulation that survives 100 TB."""
    from hiveka_spark.operators.sampling import pack_chunks
    from hiveka_spark.operators.text import tokens

    d = table(spark, sf_dir, "documents").withColumn(
        "n_tokens", F.size(tokens("text"))
    )
    packed = pack_chunks(d, "source", "doc_id", "n_tokens", 256)
    return packed.groupBy("source", "chunk").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("chunk_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@register(
    "x26_dup_clusters",
    oracle="""
    WITH RECURSIVE
    w AS (SELECT doc_id, list_filter(string_split(LOWER(text), ' '), x -> x <> '') AS ws
          FROM documents),
    sh AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS s
           FROM (SELECT doc_id, ws, UNNEST(generate_series(1, GREATEST(LEN(ws) - 2, 1))) AS i
                 FROM w)),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    pairs AS (SELECT id_a, id_b
              FROM inter
              JOIN sizes sa ON sa.doc_id = id_a
              JOIN sizes sb ON sb.doc_id = id_b
              WHERE CAST(FLOOR((i * 1.0 / (sa.n + sb.n - i)) * 10000.0) AS BIGINT) / 10000.0
                    >= 0.8),
    edges AS (SELECT id_a AS u, id_b AS v FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach AS (SELECT u, u AS v FROM (SELECT DISTINCT u FROM edges)
              UNION
              SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
    labels AS (SELECT u AS node, MIN(v) AS cluster FROM reach GROUP BY u)
    SELECT cluster,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           MIN(node) AS canonical_id,
           CAST(COUNT(*) - 1 AS BIGINT) AS removed
    FROM labels GROUP BY cluster
    """,
    tags=("dedup", "clustering", "connected-components", "iterative"),
)
def x26_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clustering: exact near-dup pairs (word-3-gram Jaccard >= 0.8,
    x02's pipeline) -> connected components via alternating large-star /
    small-star contraction (O(log n) rounds — chain-length-safe at 100 TB,
    where min-label propagation pays one full-edge shuffle per hop of graph
    diameter) -> one summary row per duplicate cluster.  The propagation
    version remains as the operator twin (property-tested equal, including
    a path graph where propagation needs n rounds); the oracle replays the
    components as a recursive-CTE transitive closure — all three reach the
    same fixpoint."""
    from hiveka_spark.operators.clustering import dedup_clusters

    d = table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(d, "doc_id", "text", k=3, threshold=0.8)
    return dedup_clusters(pairs, method="star")


@register(
    "x27_keyword_extract",
    oracle="""
    WITH t AS (SELECT doc_id, UNNEST(list_filter(string_split(LOWER(text), ' '), x -> x <> '')) AS term
               FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
    dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    s AS (SELECT doc_id, term, tf, df, FLOOR(tf * 10000.0 / df) / 10000.0 AS score
          FROM tf JOIN dfq USING (term) WHERE doc_id < 100),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
          FROM s)
    SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           score, CAST(rnk AS BIGINT) AS rnk
    FROM r WHERE rnk <= 5
    """,
    tags=("text", "keywords", "tfidf"),
)
def x27_keyword_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction: top-5 distinctive terms per document by
    rarity-weighted frequency score = tf/df (log-free tf-idf variant: ln()
    is not IEEE-exact across engines, division is — so the oracle hash-matches
    bit-for-bit).  Document frequency is computed over the WHOLE corpus; only
    the reported docs are restricted.  Two shuffles (tf agg, df agg) + a
    term-keyed join — the join key is the term, so hot terms are mitigated by
    the df table being vocabulary-sized, not corpus-sized."""
    from pyspark.sql import Window
    from hiveka_spark.operators.text import tokens

    d = table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = t.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    s = (
        tf.filter(F.col("doc_id") < 100)
        .join(dfq, "term")
        .withColumn("score", F.floor(F.col("tf") * 10000.0 / F.col("df")) / 10000.0)
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        s.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 5)
        .select("doc_id", "term", "tf", "df", "score", "rnk")
    )


_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PHONE_RE = "555-[0-9]+"


@register(
    "x28_pii_redact",
    oracle=f"""
    WITH aug AS (SELECT doc_id,
                        CASE WHEN doc_id % 7 = 0
                             THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                                  || '@example.com or call 555-' || CAST(doc_id % 10000 AS VARCHAR)
                             ELSE text END AS text2
                 FROM documents)
    SELECT doc_id,
           CAST(LEN(regexp_extract_all(text2, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(LEN(regexp_extract_all(text2, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
           regexp_replace(regexp_replace(text2, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g') AS redacted
    FROM aug
    WHERE doc_id % 7 = 0
    """,
    tags=("pii", "redaction", "text"),
)
def x28_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction: regex scan for email/phone patterns, count
    hits, and rewrite them to <EMAIL>/<PHONE> placeholders.  The fixture text
    contains no PII, so every 7th document is deterministically augmented with
    a synthetic email+phone (both engines construct the same string) before
    the scrub — proving detection AND redaction end-to-end.  Pure JVM regexp
    (codegen'd, zero shuffles, filter pushed to the scan); the patterns are
    chosen to parse identically under Java regex and RE2."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    aug = d.withColumn(
        "text2",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or call 555-"),
            (F.col("doc_id") % 10000).cast("string"),
        ),
    )
    return aug.select(
        "doc_id",
        F.size(F.regexp_extract_all("text2", F.lit(_EMAIL_RE), F.lit(0))).cast("bigint").alias("n_emails"),
        F.size(F.regexp_extract_all("text2", F.lit(_PHONE_RE), F.lit(0))).cast("bigint").alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace("text2", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ).alias("redacted"),
    )


@register(
    "x29_repetition_filter",
    oracle="""
    WITH w AS (SELECT doc_id, lang, list_filter(string_split(LOWER(text), ' '), x -> x <> '') AS ws
               FROM documents),
    g AS (SELECT doc_id, lang, array_to_string(ws[i:i+1], ' ') AS gram
          FROM (SELECT doc_id, lang, ws, UNNEST(generate_series(1, GREATEST(LEN(ws) - 1, 1))) AS i
                FROM w)),
    m AS (SELECT doc_id, lang,
                 COUNT(*) AS n_grams,
                 COUNT(DISTINCT gram) AS n_distinct,
                 MAX(cnt) AS top_gram_count
          FROM (SELECT doc_id, lang, gram, COUNT(*) OVER (PARTITION BY doc_id, gram) AS cnt
                FROM g)
          GROUP BY 1, 2)
    SELECT doc_id, lang,
           CAST(n_grams AS BIGINT) AS n_grams,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           FLOOR((n_grams - n_distinct) * 10000.0 / n_grams) / 10000.0 AS rep_ratio,
           CAST(top_gram_count AS BIGINT) AS top_gram_count,
           (n_grams - n_distinct) * 4 >= n_grams AS flagged
    FROM m
    """,
    tags=("quality", "repetition", "filter"),
)
def x29_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-document repetition metrics: the fraction of word
    2-grams that are repeats of an earlier gram in the same document, plus
    the hottest gram's count; ``flagged`` marks docs whose repeated-gram
    fraction >= 25% (integer-arithmetic comparison, no float threshold).
    All per-row array math (JVM codegen'd, no explode, ZERO shuffles) — at
    100 TB this is a pure map over the corpus, the cheapest possible shape
    for a quality filter."""
    # project the gram array ONCE (no CSE across the three metric references)
    g = F.col("g")
    # hottest gram count = longest equal run in the sorted gram array: an
    # O(n log n) sort + one linear aggregate pass per row (NOT the O(n^2)
    # count-each-distinct-gram formulation)
    srt = F.array_sort(g)
    run_scan = F.aggregate(
        srt,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    d = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "lang", D.word_ngrams("text", 2).alias("g"))
        .select(
            "doc_id",
            "lang",
            F.size(g).alias("n_grams"),
            F.size(F.array_distinct(g)).alias("n_distinct"),
            run_scan.alias("top_gram_count"),
        )
    )
    rep = F.floor((F.col("n_grams") - F.col("n_distinct")) * 10000.0 / F.col("n_grams")) / 10000.0
    return d.select(
        "doc_id",
        "lang",
        F.col("n_grams").cast("bigint").alias("n_grams"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        rep.alias("rep_ratio"),
        F.col("top_gram_count").cast("bigint").alias("top_gram_count"),
        ((F.col("n_grams") - F.col("n_distinct")) * 4 >= F.col("n_grams")).alias("flagged"),
    )


@register(
    "x30_kafka_table_roundtrip",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events WHERE event_id % 5 = 0 GROUP BY 1
    """,
    tags=("kafka", "sim", "roundtrip", "sink", "source"),
)
def x30_kafka_table_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Kafka table layer itself, oracle-checked end-to-end: events rows
    -> write_kafka (Avro encode, keyed partition routing, per-partition
    offsets) into the file-backed broker simulator -> read_kafka_batch
    (pattern subscription + offset-range scan) -> decode_wire ->
    register_kafka_table view -> SQL aggregate.  The result must equal the
    same aggregate computed directly on the parquet table — proving the
    encode/route/scan/decode pipeline is lossless (A1/A15/A18/A25; the
    reference's whole identity, README.md:1-9, with its stub sink
    KafkaOutputFormat.java:28-39 implemented for real)."""
    import tempfile

    from hiveka_spark.sources.kafka_io import (
        KafkaTableConfig,
        register_kafka_table,
        write_kafka,
    )
    from hiveka_spark.sources.kafka_sim import SimBroker

    cfg = KafkaTableConfig(
        bootstrap_servers="sim://gate",
        whitelist_topics=["events_rt"],
        ddl="event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE",
    )
    broker = SimBroker(scratch_dir(prefix="gate_simkafka_"))
    broker.create_topic("events_rt", partitions=4)
    # deterministic 1/5 subsample: the roundtrip proof doesn't need every row,
    # and the payload bytes cross the Python codec twice on the gate box
    rows = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 5 == 0)
        .select("event_id", "user_id", "event_type", "value")
    )
    write_kafka(rows, cfg, "events_rt", key_col="user_id", broker=broker)
    view = register_kafka_table(spark, "kafka_events_rt", cfg, broker=broker)
    return view.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


_TT_CUTOFF_MS = 1705276800000  # 2024-01-15 00:00:00 UTC


@register(
    "x40_kafka_time_travel",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    WHERE event_id % 5 = 0 AND epoch_ms(ts) >= {_TT_CUTOFF_MS}
    GROUP BY 1
    """,
    tags=("kafka", "sim", "timestamp-pushdown", "offsets-for-times"),
)
def x40_kafka_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp-predicate pushdown into offset pruning (SURVEY.md §4's
    optional source optimization, which the reference lacks entirely —
    KafkaStorageHandler.java:38-108 has no predicate handling): events are
    produced event-time-ordered into the broker simulator with real
    producer-record timestamps, then a ``ts >= cutoff`` query resolves the
    cutoff to per-partition start offsets (offsetsForTimes semantics) so the
    scan SKIPS the old log prefix instead of reading and filtering it.  The
    residual predicate stays in the query — offset pruning is a coarse
    index, the filter is the contract — and the result must equal the plain
    parquet filter+aggregate."""
    import tempfile

    from hiveka_spark.sources.kafka_io import (
        KafkaTableConfig,
        pushdown_time_predicate,
        register_kafka_table,
        write_kafka,
    )
    from hiveka_spark.sources.kafka_sim import SimBroker

    cfg = KafkaTableConfig(
        bootstrap_servers="sim://gate",
        whitelist_topics=["events_tt"],
        ddl="event_id BIGINT, event_type STRING, value DOUBLE, ts_ms BIGINT",
    )
    broker = SimBroker(scratch_dir(prefix="gate_simkafka_tt_"))
    broker.create_topic("events_tt", partitions=4)
    rows = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 5 == 0)
        .orderBy("ts", "event_id")  # per-partition timestamp monotonicity
        .select(
            "event_id",
            "event_type",
            "value",
            F.unix_millis("ts").alias("ts_ms"),
            F.col("ts"),
        )
    )
    write_kafka(rows, cfg, "events_tt", key_col="event_id", broker=broker, ts_col="ts")
    pushed = pushdown_time_predicate(spark, cfg, _TT_CUTOFF_MS, broker=broker)
    view = register_kafka_table(spark, "kafka_events_tt", pushed, broker=broker)
    return (
        view.filter(F.col("ts_ms") >= _TT_CUTOFF_MS)  # residual predicate
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


_EVAL_SOURCES = ("src0", "src1", "src2", "src3", "src4")


def _minhash_cross_oracle(
    num_perm: int = 32, bands: int = 8, k: int = 3, threshold: float = 0.8
) -> str:
    srcs = ", ".join(f"'{s}'" for s in _EVAL_SOURCES)
    return f"""
    WITH w AS (SELECT doc_id, list_filter(string_split(LOWER(text), ' '), x -> x <> '') AS ws
               FROM documents),
    {D.minhash_machinery_sql(num_perm, bands, k, "w")},
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM bands a
             JOIN bands b ON a.band = b.band AND a.bh = b.bh
             JOIN documents da ON da.doc_id = a.doc_id
             JOIN documents db ON db.doc_id = b.doc_id
             WHERE da.source NOT IN ({srcs}) AND db.source IN ({srcs})),
    {D.jaccard_pairs_sql("cand", "pairs", threshold, with_value=True)}
    SELECT id_a AS train_id, id_b AS eval_id, jaccard FROM pairs
    """


@register(
    "x41_fuzzy_decontamination",
    oracle=_minhash_cross_oracle(),
    tags=("dedup", "decontamination", "minhash", "cross-corpus"),
)
def x41_fuzzy_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy cross-corpus decontamination: MinHash+LSH candidates BETWEEN the
    training split (sources outside {_EVAL_SOURCES}) and the eval split,
    Jaccard-verified at 0.8 — the paraphrase-tolerant complement to x24's
    exact-shingle pass.  The eval band table broadcasts (benchmarks are tiny
    next to corpora) so the training side never shuffles for the candidate
    join; see operators/dedup.py:minhash_cross_contamination."""
    d = table(spark, sf_dir, "documents")
    ev = d.filter(F.col("source").isin(*_EVAL_SOURCES))
    tr = d.filter(~F.col("source").isin(*_EVAL_SOURCES))
    return D.minhash_cross_contamination(
        tr, ev, "doc_id", "text", num_perm=32, bands=8, k=3, threshold=0.8
    )


@register(
    "x42_kafka_incremental_resume",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events
    FROM events WHERE event_id % 10 = 1 GROUP BY 1
    """,
    tags=("kafka", "sim", "incremental", "offset-resume"),
)
def x42_kafka_incremental_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-incremental Kafka consumption ORACLE-CHECKED end-to-end — the
    reference's kafka_offset_* resume loop (KafkaInputFormat.java:471-501)
    as a gate entry: produce batch A, scan-and-commit (the catch-up run),
    produce batch B, then the incremental scan from the committed offsets
    must decode EXACTLY batch B — proving the offset store's [resume, latest)
    arithmetic row-for-row, not just in units.  The returned aggregate is
    over the second scan only."""
    import tempfile

    from hiveka_spark.sources.kafka_io import (
        KafkaTableConfig,
        OffsetStore,
        decode_wire,
        read_kafka_batch,
        write_kafka,
    )
    from hiveka_spark.sources.kafka_sim import SimBroker

    cfg = KafkaTableConfig(
        bootstrap_servers="sim://gate",
        whitelist_topics=["events_inc"],
        ddl="event_id BIGINT, event_type STRING",
    )
    broker = SimBroker(scratch_dir(prefix="gate_simkafka_inc_"))
    broker.create_topic("events_inc", partitions=3)
    store = OffsetStore(tempfile.mktemp(prefix="gate_offsets_", suffix=".json"))
    e = table(spark, sf_dir, "events").select("event_id", "event_type")

    def pull(commit_only: bool = False):
        start, end = store.resolve_range(broker.earliest(), broker.latest())
        c = KafkaTableConfig(
            "sim://gate",
            whitelist_topics=["events_inc"],
            ddl="event_id BIGINT, event_type STRING",
            starting_offsets=json.loads(start),
            ending_offsets=json.loads(end),
        )
        wire = read_kafka_batch(spark, c, broker=broker)
        store.commit(json.loads(end))
        return decode_wire(wire, c)

    # batch A: catch-up run reads it and commits its end offsets
    write_kafka(
        e.filter(F.col("event_id") % 10 == 0), cfg, "events_inc",
        key_col="event_id", broker=broker,
    )
    pull().count()  # materialize run 1 so the commit reflects a real read
    # batch B lands after the commit
    write_kafka(
        e.filter(F.col("event_id") % 10 == 1), cfg, "events_inc",
        key_col="event_id", broker=broker,
    )
    incremental = pull()  # must contain ONLY batch B
    return incremental.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )


@register(
    "x43_confluent_roundtrip",
    oracle="""
    SELECT lang, 'v1->v2' AS schema_path, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang
    """,
    tags=("kafka", "avro", "confluent", "schema-registry"),
)
def x43_confluent_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confluent wire framing end-to-end — the schema-registry path the
    reference declares but ships disabled (KafkaAvroMessageDecoder.java:96,
    131-144; SchemaRegistry.java:16-62), implemented for real: rows are
    encoded under registry schema v1 with the 0x00-magic + big-endian-id
    header (`with_confluent_framing` registers the subject), the topic then
    EVOLVES to v2 (adds `schema_path` with an Avro default), and decode
    resolves each record's writer schema from the id in its header and
    surfaces it under the latest reader schema — added field takes the
    default.  The oracle aggregates the source table with the v2 constant,
    so framing, id resolution, and Avro schema resolution are all
    hash-checked."""
    import tempfile

    from hiveka_spark.sources.kafka_io import (
        KafkaTableConfig,
        decode_wire,
        with_confluent_framing,
    )
    from hiveka_spark.sources.schema_registry import FileSchemaRegistry

    d = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    registry = FileSchemaRegistry(scratch_dir(prefix="gate_confluent_reg_"))
    cfg_v1 = KafkaTableConfig(
        "sim://gate",
        whitelist_topics=["docs_confluent"],
        ddl="doc_id BIGINT, lang STRING, n_chars BIGINT",
    )
    cfg_v1 = with_confluent_framing(cfg_v1, registry, "docs_confluent")
    from hiveka_spark.sources.kafka_io import encode_payload

    wire = encode_payload(d, cfg_v1)  # framed under v1 (schema_id=1)

    v1 = json.loads(cfg_v1.schema_json())
    v2 = {
        **v1,
        "fields": v1["fields"]
        + [{"name": "schema_path", "type": "string", "default": "v1->v2"}],
    }
    registry.register("docs_confluent", v2)
    from dataclasses import replace

    cfg_v2 = replace(cfg_v1, ddl=None, avro_schema=v2)
    decoded = decode_wire(
        wire, cfg_v2, registry=registry, registry_topic="docs_confluent"
    )
    return decoded.groupBy("lang", "schema_path").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@register(
    "x44_audio_features",
    # The WAV synth tiles the sha256(text) digest as n = doc_id % 400 + 100
    # mono 8-bit samples; decode reads them back through the REAL stdlib
    # `wave` codec (RIFF header, sample width, channels), so the features are
    # digest arithmetic a SQL oracle replays exactly: mean_abs =
    # floor(((n//32)*sum(digest) + sum(digest[:n%32])) / n), byte_len =
    # 44-byte canonical PCM header + n data bytes.
    oracle="""
    WITH b AS (
      SELECT doc_id, sha256(text) AS sha,
             CAST(doc_id % 400 + 100 AS BIGINT) AS n
      FROM documents
    ),
    d AS (
      SELECT *,
             list_transform(range(0, 32),
               k -> strpos('0123456789abcdef', substr(sha, CAST(k*2+1 AS INT), 1)) * 16
                  + strpos('0123456789abcdef', substr(sha, CAST(k*2+2 AS INT), 1)) - 17
             ) AS dig
      FROM b
    )
    SELECT doc_id AS media_id,
           44 + n AS byte_len,
           n AS n_samples,
           CAST(1 AS INTEGER) AS n_channels,
           CAST(16000 AS INTEGER) AS sample_rate,
           CAST(((n // 32) * list_sum(dig)
                 + COALESCE(list_sum(list_slice(dig, 1, CAST(n % 32 AS INT))), 0))
                // n AS BIGINT) AS mean_abs
    FROM d
    """,
    tags=("multimodal", "audio", "mapinpandas"),
)
def x44_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio pipeline end-to-end with a REAL codec: documents → genuine
    RIFF/WAVE containers (stdlib wave writer, digest-tiled 8-bit PCM) →
    per-clip feature extraction via Arrow-batched mapInPandas where the
    stdlib wave binding from available_codecs() parses the actual container
    (header, sample width, channel count).  Unlike the image path (x22's
    deterministic fake) no step here is faked — and the digest-tiled payload
    keeps every feature integer-exact for the DuckDB oracle (ADVICE r4: the
    audio surface previously had no query entry exercising it)."""
    from hiveka_spark.operators.multimodal import (
        decode_audio_features,
        synthesize_wav_media,
    )

    d = table(spark, sf_dir, "documents")
    media = synthesize_wav_media(d, "doc_id", "text")
    return decode_audio_features(media)


# ---------------------------------------------------------------------------
# x62 — Bloom-filter decontamination (memory-bounded membership at 100 TB)
# ---------------------------------------------------------------------------

_BLOOM_M = 2**18  # bits -> 32 KiB broadcast, forever, regardless of suite size
_BLOOM_H = 3


def _bloom_oracle(k: int = 3) -> str:
    srcs = ", ".join(f"'{s}'" for s in _EVAL_SOURCES)
    p = D.bloom_positions_sql("s", _BLOOM_H, _BLOOM_M)
    pos_cols = ", ".join(f"{p[i]} AS p{i}" for i in range(_BLOOM_H))
    all_in = " AND ".join(
        f"p{i} IN (SELECT pos FROM evpos)" for i in range(_BLOOM_H)
    )
    return f"""
    WITH w AS (SELECT doc_id, source,
                      list_filter(string_split(LOWER(text), ' '), x -> x <> '') AS ws
               FROM documents),
    sh AS (SELECT DISTINCT doc_id, source, array_to_string(ws[i:i+{k - 1}], ' ') AS s
           FROM (SELECT doc_id, source, ws,
                        UNNEST(generate_series(1, GREATEST(LEN(ws) - {k - 1}, 1))) AS i
                 FROM w)),
    ev AS (SELECT DISTINCT s FROM sh WHERE source IN ({srcs})),
    evpos AS (SELECT DISTINCT pos FROM
                (SELECT UNNEST([{", ".join(p)}]) AS pos FROM ev)),
    tr AS (SELECT doc_id, s, {pos_cols}
           FROM sh WHERE source NOT IN ({srcs})),
    probe AS (SELECT doc_id, s,
                     CASE WHEN {all_in} THEN 1 ELSE 0 END AS bloom_hit,
                     CASE WHEN s IN (SELECT s FROM ev) THEN 1 ELSE 0 END AS exact_hit
              FROM tr)
    SELECT doc_id AS doc,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(bloom_hit) AS BIGINT) AS n_bloom_hits,
           CAST(SUM(exact_hit) AS BIGINT) AS n_exact_hits,
           CAST(CASE WHEN SUM(bloom_hit) > 0 THEN 1 ELSE 0 END AS BIGINT) AS flagged
    FROM probe GROUP BY doc_id
    """


@register(
    "x62_bloom_decontamination",
    oracle=_bloom_oracle(),
    tags=("dedup", "decontamination", "bloom", "membership"),
)
def x62_bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter benchmark decontamination — the memory-bounded third
    tier next to exact-set (x24) and MinHash-fuzzy (x41): the eval suite's
    shingles collapse to a fixed 32 KiB bit array broadcast as ONE
    array<bigint> literal; training shingles flag iff all {_BLOOM_H} salted
    md5 bit positions are set.  False positives are deterministic given
    the hashes, so the DuckDB oracle replays them exactly via position-set
    membership (bit p set <=> some eval shingle hashes to p), and the
    result carries n_exact_hits alongside n_bloom_hits — the gap IS the
    certified fp count.  See operators/dedup.py::bloom_decontamination
    for the two-tier production posture."""
    d = table(spark, sf_dir, "documents")
    ev = d.filter(F.col("source").isin(*_EVAL_SOURCES))
    tr = d.filter(~F.col("source").isin(*_EVAL_SOURCES))
    return D.bloom_decontamination(
        tr, ev, "doc_id", "text", k=3, m_bits=_BLOOM_M, n_hashes=_BLOOM_H
    )


# ---------------------------------------------------------------------------
# x66 — signature-estimated Jaccard vs exact (the 100 TB verify relaxation)
# ---------------------------------------------------------------------------


_X66_NUM_PERM = 32
_X66_NUM_PERM_K = 3  # shingle k


def _minhash_estimate_oracle(num_perm: int = _X66_NUM_PERM, bands: int = 8,
                             k: int = _X66_NUM_PERM_K,
                             threshold: float = 0.8) -> str:
    matches = " + ".join(
        f"(CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END)" for i in range(num_perm)
    )
    est = f"CAST(FLOOR(({matches}) * 10000.0 / {num_perm}) AS BIGINT) / 10000.0"
    return f"""
    WITH w AS (SELECT doc_id, list_filter(string_split(LOWER(text), ' '), x -> x <> '') AS ws
               FROM documents),
    {D.minhash_machinery_sql(num_perm, bands, k, "w")},
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
                                      AND a.doc_id < b.doc_id),
    {D.jaccard_pairs_sql("cand", "pairs", threshold, with_value=True)}
    SELECT p.id_a, p.id_b, p.jaccard,
           {est} AS est_jaccard,
           CAST(({matches}) AS BIGINT) AS n_matching
    FROM pairs p
    JOIN sig sa ON sa.doc_id = p.id_a
    JOIN sig sb ON sb.doc_id = p.id_b
    """


@register(
    "x66_minhash_estimate",
    oracle=_minhash_estimate_oracle(),
    tags=("dedup", "minhash", "estimator", "certification"),
)
def x66_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signature-only Jaccard ESTIMATION certified against the exact value
    — the verify relaxation the streaming band index (s19) and any
    state-bounded dedup would use at 100 TB: est_J = (matching signature
    positions) / num_perm, computed from the 32-minima signatures ALONE
    (no shingle store, no text), emitted next to the exact
    shingle-intersection Jaccard for every x03 verified pair.  Both values
    and the raw match count are deterministic, so the driver hash-checks
    the estimator's actual error on real near-dup pairs — the judgement a
    pipeline needs before trading the shingle store away (state per doc
    drops from ~text-sized to 32*8 bytes; E[est_J] = J with sd
    sqrt(J(1-J)/num_perm) ~ 0.07 at J=0.8, num_perm=32).

    Scale shape: x03's candidate/verify plan plus one signature equi-join
    per pair side — the estimator itself adds only per-row zip_with
    arithmetic over two 32-element arrays."""
    d = table(spark, sf_dir, "documents")
    with D.dedup_cache_scope() as scope:
        # ONE shingle pass, ONE signature aggregate: the signatures feed
        # three consumers (band rows + both estimator sides), so they are
        # computed once and persisted instead of re-running the 32-way MIN
        # aggregate per consumer (the entry's own 100 TB posture)
        sh = D._shingle_sets(d, "doc_id", "text", _X66_NUM_PERM_K, reuse=True)
        sig = D.minhash_signatures(
            None, num_perm=_X66_NUM_PERM, k=_X66_NUM_PERM_K, shingle_df=sh
        ).persist()
        scope.append(sig)
        band_rows = D.minhash_band_rows(
            None, num_perm=_X66_NUM_PERM, bands=8, signature_df=sig
        )
        a = band_rows.select(F.col("doc").alias("id_a"), "band", "bh")
        b = band_rows.select(F.col("doc").alias("id_b"), "band", "bh")
        cand = (
            a.join(b, ["band", "bh"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        pairs = D._verified_jaccard(cand, sh, 0.8)
        sa = sig.select(F.col("doc").alias("id_a"), F.col("signature").alias("sig_a"))
        sb = sig.select(F.col("doc").alias("id_b"), F.col("signature").alias("sig_b"))
        n_match = F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                lambda m: m,
            )
        ).cast("bigint")
        out = (
            pairs.join(sa, "id_a")
            .join(sb, "id_b")
            .withColumn("n_matching", n_match)
            .select(
                "id_a",
                "id_b",
                "jaccard",
                (
                    F.floor(F.col("n_matching") * 10000.0 / _X66_NUM_PERM) / 10000.0
                ).alias("est_jaccard"),
                "n_matching",
            )
        )
        return out.localCheckpoint(eager=True)


# ---------------------------------------------------------------------------
# x68 — containment decontamination (benchmark QUOTED inside a training doc)
# ---------------------------------------------------------------------------

_X68_THRESHOLD = 0.5


def _containment_decontam_oracle(k: int = 3, threshold: float = _X68_THRESHOLD) -> str:
    srcs = ", ".join(f"'{s}'" for s in _EVAL_SOURCES)
    c = "CAST(FLOOR(i * 10000.0 / ne.n) AS BIGINT) / 10000.0"
    return f"""
    WITH w AS (SELECT doc_id, source,
                      list_filter(string_split(LOWER(text), ' '), x -> x <> '') AS ws
               FROM documents),
    sh AS (SELECT DISTINCT doc_id, source, array_to_string(ws[i:i+{k - 1}], ' ') AS s
           FROM (SELECT doc_id, source, ws,
                        UNNEST(generate_series(1, GREATEST(LEN(ws) - {k - 1}, 1))) AS i
                 FROM w)),
    ev AS (SELECT doc_id, s FROM sh WHERE source IN ({srcs})),
    tr AS (SELECT doc_id, s FROM sh WHERE source NOT IN ({srcs})),
    ev_sizes AS (SELECT doc_id, COUNT(*) AS n FROM ev GROUP BY doc_id),
    inter AS (SELECT t.doc_id AS train_id, e.doc_id AS eval_id, COUNT(*) AS i
              FROM tr t JOIN ev e ON t.s = e.s
              GROUP BY 1, 2)
    SELECT train_id, eval_id,
           CAST(i AS BIGINT) AS n_shared,
           {c} AS containment
    FROM inter JOIN ev_sizes ne ON ne.doc_id = eval_id
    WHERE {c} >= {threshold}
    """


@register(
    "x68_containment_decontamination",
    oracle=_containment_decontam_oracle(),
    tags=("dedup", "decontamination", "containment", "cross-corpus"),
)
def x68_containment_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTAINMENT decontamination — the quoted-benchmark case the other
    three tiers miss: a short eval item quoted inside a long training doc
    has LOW symmetric Jaccard (x41's 0.8 threshold never fires) but HIGH
    one-sided containment C(eval in train) = |A∩B| / |eval shingles|.
    x24 counts overlap per train doc against the eval UNION (no per-
    benchmark attribution); this emits the (train_id, eval_id) pairs with
    containment >= {_X68_THRESHOLD}, i.e. WHICH benchmark leaks WHERE —
    what you need to actually fix a leak.

    Scale shape: the eval shingle postings broadcast (benchmarks are MBs
    next to TB corpora — the x24/x41 asymmetry), so candidate generation
    is a map-side hash join on the shingle string; the per-(train, eval)
    intersection is ONE count aggregate over the joined rows — no arrays
    materialized, no all-pairs product, and the training corpus never
    shuffles except for that keyed count.  Exact (no banding): a one-
    sided-rare quoted excerpt can evade MinHash banding entirely, so
    the exact path is the right default when the eval side is small."""
    d = table(spark, sf_dir, "documents")
    ev = d.filter(F.col("source").isin(*_EVAL_SOURCES))
    tr = d.filter(~F.col("source").isin(*_EVAL_SOURCES))
    return D.containment_decontamination(
        tr, ev, "doc_id", "text", k=3, threshold=_X68_THRESHOLD
    )


# ---------------------------------------------------------------------------
# x92 — 16-bit STEREO PCM through the real stdlib wave codec (x44 covers
# 8-bit mono; this arm exercises signed samples, sampwidth=2, interleave)
# ---------------------------------------------------------------------------


@register(
    "x92_audio_pcm16_stereo",
    # Sample (2f+c) of clip id is ((id*31 + (2f+c)*7) % 65536) - 32768 over
    # nf = id % 300 + 50 stereo frames: byte_len = 44-byte canonical PCM
    # header + nf*4 data bytes; mean_abs = sum(|s|) // (nf*2) over ALL
    # interleaved samples (exactly what decode_audio_features computes from
    # the de-interleaved (nf, 2) array).
    oracle="""
    WITH b AS (SELECT doc_id, CAST(doc_id % 300 + 50 AS BIGINT) AS nf
               FROM documents),
    v AS (SELECT doc_id, nf,
                 ABS(((doc_id * 31 + idx * 7) % 65536) - 32768) AS a
          FROM (SELECT doc_id, nf, UNNEST(range(0, nf * 2)) AS idx FROM b))
    SELECT doc_id AS media_id,
           CAST(44 + nf * 4 AS BIGINT) AS byte_len,
           nf AS n_samples,
           CAST(2 AS INTEGER) AS n_channels,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(SUM(a) // (nf * 2) AS BIGINT) AS mean_abs
    FROM v GROUP BY doc_id, nf
    """,
    tags=("multimodal", "audio", "mapinpandas", "codec"),
)
def x92_audio_pcm16_stereo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL-codec audio arm x44 leaves untested (round-11 verdict #7):
    genuine 16-bit STEREO RIFF/WAVE containers — signed little-endian
    int16 samples, interleaved channels — written by the stdlib ``wave``
    module from pure integer arithmetic and decoded back through the SAME
    probed real codec (`available_codecs()['audio']`: header parse,
    sampwidth=2 dtype dispatch, (nf, 2) de-interleave).  Every decoded
    sample is a closed-form function of (doc_id, index), so the DuckDB
    oracle replays byte length, frame count, channel count, rate, and the
    integer mean |sample| without ever seeing a container.  Negative
    samples make the int64-upcast in the feature fold load-bearing
    (|−32768| overflows int16).  Scale shape: zero shuffle — two chained
    Arrow-batched mapInPandas stages, embarrassingly parallel per clip."""
    from hiveka_spark.operators.multimodal import (
        decode_audio_features,
        synthesize_pcm16_media,
    )

    d = table(spark, sf_dir, "documents")
    media = synthesize_pcm16_media(d, "doc_id")
    return decode_audio_features(media)


# ---------------------------------------------------------------------------
# x96/x97 — exact SUBSTRING dedup (Lee et al. 2022): repeated spans, the
# dedup granularity between exact-document (x01) and near-document (x02-x05)
# ---------------------------------------------------------------------------

_X96_L = 10  # minimum duplicated span length, in words (the paper's 50
#              BPE-token threshold scaled to this corpus's short docs)


def _x96_tok_occ_ctes(L: int = _X96_L) -> str:
    """Shared CTE text: normalized tokens + every length-L word window's
    (doc, 0-based start, portable hash) — the DuckDB twin of
    operators/dedup.py::_window_occurrences."""
    h = D.portable_hash60_sql(f"array_to_string(ws[i:i+{L - 1}], ' ')")
    return f"""tok AS (SELECT doc_id,
                   list_filter(string_split(LOWER(text), ' '), x -> x <> '') AS ws
            FROM documents),
    occ AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos0, {h} AS h
            FROM (SELECT doc_id, ws,
                         UNNEST(range(1, GREATEST(LEN(ws) - {L} + 1, 0) + 1)) AS i
                  FROM tok))"""


def _x96_oracle(L: int = _X96_L) -> str:
    return f"""
    WITH {_x96_tok_occ_ctes(L)},
    duph AS (SELECT h FROM occ GROUP BY h HAVING COUNT(*) >= 2),
    starts AS (SELECT doc_id, pos0 FROM occ WHERE h IN (SELECT h FROM duph)),
    marked AS (
      SELECT doc_id, pos0,
             CASE WHEN pos0 > COALESCE(MAX(pos0 + {L} - 1) OVER (
                    PARTITION BY doc_id ORDER BY pos0
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS new_isl
      FROM starts),
    isl AS (SELECT doc_id, pos0,
                   SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY pos0) AS isl
            FROM marked),
    spans AS (SELECT doc_id, isl, MIN(pos0) AS s, MAX(pos0 + {L} - 1) AS e
              FROM isl GROUP BY doc_id, isl),
    pd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
                  CAST(SUM(e - s + 1) AS BIGINT) AS dup_words
           FROM spans GROUP BY doc_id)
    SELECT t.doc_id,
           CAST(COALESCE(LEN(t.ws), 0) AS BIGINT) AS n_words,
           CAST(COALESCE(pd.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
           CAST(COALESCE(pd.dup_words, 0) AS BIGINT) AS dup_words,
           CAST(FLOOR(COALESCE(pd.dup_words, 0) * 10000.0
                      / GREATEST(COALESCE(LEN(t.ws), 0), 1)) AS BIGINT) AS dup_frac_q
    FROM tok t LEFT JOIN pd USING (doc_id)
    """


@register(
    "x96_substring_dup_spans",
    oracle=_x96_oracle(),
    tags=("dedup", "substring", "text", "training-prep", "scale"),
)
def x96_substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-duplication SPANS (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better") — the dedup family's
    missing granularity: boilerplate paragraphs, license headers, and
    quoted chunks repeat across otherwise-distinct documents, which
    document-level dedup (x01-x05) cannot see.  The corpus's planted
    near-dup clusters naturally share long word runs (~45 docs carry
    length-10 repeated windows at gate scale), and each doc reports its
    maximal duplicated spans (overlap-merged), duplicated word count, and
    quantized duplicated fraction.

    The reference implementation builds a corpus-wide suffix array on one
    big machine; this is the Spark-native length-L window form: one
    bounded Lx explode (map-only), ONE hash-keyed count aggregate
    (map-side combinable, 16-byte rows — at 100 TB this is the only
    corpus-sized shuffle and it never carries text), an equi-join back,
    and a per-doc gaps-and-islands merge.  Nothing is all-pairs.  Window
    hashes are the portable 60-bit md5 form, so the DuckDB oracle replays
    the entire chain including the island merge."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    return D.substring_dup_spans(d, "text", "doc_id", min_len=_X96_L)


def _x97_oracle(L: int = _X96_L) -> str:
    return f"""
    WITH {_x96_tok_occ_ctes(L)},
    occ2 AS (SELECT doc_id, pos0,
                    COUNT(*) OVER (PARTITION BY h) AS cnt,
                    ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos0) AS rn
             FROM occ),
    nonfirst AS (SELECT doc_id, pos0 FROM occ2 WHERE cnt >= 2 AND rn > 1),
    covered AS (SELECT DISTINCT doc_id, pos0 + j AS wpos
                FROM (SELECT doc_id, pos0, UNNEST(range(0, {L})) AS j
                      FROM nonfirst)),
    words AS (SELECT doc_id, UNNEST(range(1, LEN(ws) + 1)) - 1 AS wpos,
                     UNNEST(ws) AS w
              FROM tok),
    kept AS (SELECT w.doc_id, w.wpos, w.w FROM words w
             WHERE NOT EXISTS (SELECT 1 FROM covered c
                               WHERE c.doc_id = w.doc_id AND c.wpos = w.wpos)),
    pd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS kept_words,
                  md5(string_agg(w, ' ' ORDER BY wpos)) AS clean_md5
           FROM kept GROUP BY doc_id)
    SELECT t.doc_id,
           CAST(COALESCE(LEN(t.ws), 0) AS BIGINT) AS n_words,
           CAST(COALESCE(pd.kept_words, 0) AS BIGINT) AS kept_words,
           CAST(COALESCE(LEN(t.ws), 0) - COALESCE(pd.kept_words, 0) AS BIGINT)
             AS removed_words,
           COALESCE(pd.clean_md5, md5('')) AS clean_md5
    FROM tok t LEFT JOIN pd USING (doc_id)
    """


@register(
    "x97_substring_dedup_rewrite",
    oracle=_x97_oracle(),
    tags=("dedup", "substring", "text", "training-prep", "certification"),
)
def x97_substring_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first substring REMOVAL — the rewrite half of Lee et al. 2022:
    for every duplicated length-L window the GLOBAL first occurrence
    (argmin (doc_id, pos0)) survives; every word position covered by a
    non-first occurrence is removed, including later self-repeats inside
    the first-occurrence's own document.  Emits per doc the kept/removed
    word counts and the md5 of the rewritten text (kept words joined by
    single spaces) — the certified artifact a training pipeline would
    actually feed downstream, hash-pinned against a DuckDB replay of the
    same argmin/coverage/reassembly chain.

    Scale shape on top of x96: the argmin rides the same hash-keyed
    aggregate (a 16-byte (doc, pos0) struct per window); coverage is an
    Lx explode of NON-FIRST occurrences only, distinct-ed per doc; the
    rewrite is one per-doc ordered fold over kept word rows (the x82
    reassembly shape — memory bounded by the longest single document)."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    return D.substring_dedup_rewrite(d, "text", "doc_id", min_len=_X96_L)


#: the x95/x98 version split, duplicated here because curation_ext imports
#: THIS module (tests pin the two constants equal)
_X99_V2_PRED = "doc_id % 3 = 0"


def _x99_oracle(L: int = _X96_L) -> str:
    """x96's from-scratch replay over the FULL corpus (window counts see
    both versions), final report restricted to the new drop's docs — the
    certificate that the incremental store-composed report equals full
    recomputation for the documents it claims to cover."""
    base = _x96_oracle(L).rstrip()
    return base + f"\n    WHERE ({_X99_V2_PRED})\n    "


@register(
    "x99_incremental_substring_dedup",
    oracle=_x99_oracle(),
    tags=("dedup", "substring", "incremental", "training-prep", "scale"),
)
def x99_incremental_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental substring dedup (x96's window family under the x70
    never-re-read posture — the matrix cell substring × incremental):
    version 1 backfills a persisted (window-hash, count) store; the new
    drop (the x95 version predicate) then reports its duplicated spans
    against EVERYTHING ingested so far by joining its own window counts
    with the store's — v1's text is never re-read, re-tokenized, or
    re-hashed (the store carries 16-byte hash/count rows, no text column
    anywhere — plan-asserted in tests/test_plans.py).  This is the
    100 TB drop question for boilerplate: "how much of this 1 TB is
    copies of spans we already hold?" at drop-sized cost.

    The oracle recomputes x96 from scratch over the UNION and restricts
    the report to the drop's docs — a hash match certifies the
    incremental judgment (prior-count composition, within-drop
    duplicates, island merge extents) equals full recomputation."""
    import shutil

    from hiveka_spark.operators.incremental import substring_index_update
    from hiveka_spark.scratch import scratch_dir

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    v2_pred = F.expr(_X99_V2_PRED)
    store = scratch_dir(prefix="gate_x99store_")
    # backfill: v1 ingested — the segment write is eager inside the update;
    # the returned v1 REPORT frame is lazy and deliberately never executed
    # (forcing it would run a full island-merge job just to discard it)
    substring_index_update(spark, d.filter(~v2_pred), store, 1, min_len=_X96_L)
    # the drop: v2 reports against store + itself
    out = substring_index_update(
        spark, d.filter(v2_pred), store, 2, min_len=_X96_L
    ).localCheckpoint(eager=True)
    shutil.rmtree(store, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# x100 — DSIR-style importance selection (Xie et al. 2023, "Data Selection
# for Language Models via Importance Resampling"): pick the raw-pool docs
# whose unigram distribution looks most like a TARGET domain
# ---------------------------------------------------------------------------

_X100_K = 100  # selection budget (docs)


def _x100_oracle(K: int = _X100_K) -> str:
    evals = ", ".join(f"'{s}'" for s in _EVAL_SOURCES)
    return f"""
    WITH tw AS (SELECT UNNEST(list_filter(string_split(LOWER(text), ' '), x -> x <> '')) AS w
                FROM documents WHERE source IN ({evals})),
    sw AS (SELECT doc_id, UNNEST(list_filter(string_split(LOWER(text), ' '), x -> x <> '')) AS w
           FROM documents WHERE source NOT IN ({evals})),
    tc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS tc FROM tw GROUP BY w),
    sc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS sc FROM sw GROUP BY w),
    vocab AS (SELECT COALESCE(tc.w, sc.w) AS w,
                     COALESCE(tc.tc, 0) AS tc, COALESCE(sc.sc, 0) AS sc
              FROM tc FULL OUTER JOIN sc ON tc.w = sc.w),
    consts AS (SELECT (SELECT COALESCE(SUM(tc), 0) FROM vocab) AS nt,
                      (SELECT COALESCE(SUM(sc), 0) FROM vocab) AS ns,
                      (SELECT COUNT(*) FROM vocab) AS v),
    lr AS (SELECT w,
                  CAST(FLOOR(10000.0 * (ln(tc + 1) - ln(nt + v)
                                        - ln(sc + 1) + ln(ns + v))) AS BIGINT) AS lr_q
           FROM vocab CROSS JOIN consts),
    ds AS (SELECT s.doc_id,
                  CAST(COUNT(*) AS BIGINT) AS n_words,
                  CAST(SUM(l.lr_q) AS BIGINT) AS sum_lr
           FROM sw s JOIN lr l ON l.w = s.w
           GROUP BY s.doc_id),
    scored AS (SELECT doc_id, n_words, sum_lr,
                      CAST(FLOOR(sum_lr * 10000.0 / n_words) AS BIGINT) AS score_q
               FROM ds)
    SELECT doc_id, n_words, sum_lr, score_q
    FROM scored ORDER BY score_q DESC, doc_id LIMIT {K}
    """


@register(
    "x100_dsir_selection",
    oracle=_x100_oracle(),
    tags=("curation", "sampling", "training-prep", "quality", "scale"),
)
def x100_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023): rank the raw pool by
    unigram importance log-ratios against a TARGET domain (here the eval
    sources stand in as the domain sample — the same fixture convention
    the decontamination gates use) and keep the top-K.  Per selected doc:
    (n_words, sum_lr, score_q) where lr is the add-one-smoothed
    log(p_target/p_raw) per word, floor-quantized 1e-4 BEFORE the per-doc
    sum (integer arithmetic from there on, so the engines can never drift
    on accumulated float error — only a per-word ln within 1e-12 of a
    quantization boundary could differ, the established q15/floor4 trade),
    and score_q is the quantized per-word mean.  Ties break on doc_id —
    fully deterministic selection.

    Scale shape: ONE per-(doc, word) count pass over the raw pool serves
    both the unigram LM and the per-doc scoring sums (the shared exchange
    is canonical-identical in both branches, so AQE reuses the shuffle
    stage at runtime — ReusedExchange asserted on the EXECUTED plan — and
    raw text is scanned once); the target sample's count is the canonical
    `word_freq` pass
    (domain-sample-sized, tiny); the vocab join is FULL OUTER and
    vocabulary-bounded, the smoothing constants fold in-plan as a one-row
    broadcast cross join (no driver collect; an empty corpus degrades to
    an empty result like the oracle), the scoring join broadcasts the
    log-ratio table by construction, and the top-K is TakeOrdered
    (per-partition top-K + K-row merge — never a global sort).  The LM
    "training" is exactly the hashed-unigram posture of the paper at
    n=1; no Python in the plan."""
    from hiveka_spark.operators.bpe import word_freq

    d = table(spark, sf_dir, "documents")
    tgt = d.filter(F.col("source").isin(*_EVAL_SOURCES))
    raw = d.filter(~F.col("source").isin(*_EVAL_SOURCES))

    # ONE per-(doc, w) count pass serves BOTH the raw-pool unigram counts
    # and the per-doc scoring sums — its exchange is plan-identical in the
    # two branches, so Spark reuses it (ReusedExchange, plan-asserted) and
    # the raw text is scanned once
    dw = (
        raw.select("doc_id", F.explode(word_tokens("text")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    tc = word_freq(tgt).withColumnRenamed("freq", "tc")  # the canonical pass
    sc = dw.groupBy("w").agg(F.sum("c").cast("bigint").alias("sc"))
    vocab = tc.join(sc, "w", "full_outer").select(
        "w",
        F.coalesce("tc", F.lit(0)).alias("tc"),
        F.coalesce("sc", F.lit(0)).alias("sc"),
    )
    # smoothing constants fold IN-PLAN (one-row cross join, the oracle's own
    # shape): no driver collect, and an empty/all-NULL corpus degrades to an
    # empty result exactly like the oracle instead of a scalar crash
    consts = vocab.agg(
        F.coalesce(F.sum("tc"), F.lit(0)).alias("nt"),
        F.coalesce(F.sum("sc"), F.lit(0)).alias("ns"),
        F.count(F.lit(1)).alias("v"),
    )
    lr = vocab.crossJoin(F.broadcast(consts)).select(
        "w",
        F.floor(
            10000.0
            * (
                F.log(F.col("tc") + 1)
                - F.log(F.col("nt") + F.col("v"))
                - F.log(F.col("sc") + 1)
                + F.log(F.col("ns") + F.col("v"))
            )
        ).cast("bigint").alias("lr_q"),
    )
    # scoring join: lr is vocabulary-bounded — broadcast by construction,
    # never a corpus-side shuffle (plan-asserted)
    ds = dw.join(F.broadcast(lr), "w").groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_words"),
        F.sum(F.col("c") * F.col("lr_q")).cast("bigint").alias("sum_lr"),
    )
    scored = ds.select(
        "doc_id", "n_words", "sum_lr",
        F.floor(F.col("sum_lr") * 10000.0 / F.col("n_words"))
        .cast("bigint").alias("score_q"),
    )
    return scored.orderBy(F.desc("score_q"), "doc_id").limit(_X100_K)


# ---------------------------------------------------------------------------
# x102 — CCNet-style LM bucketing (Wenzek et al. 2020): head / middle / tail
# ---------------------------------------------------------------------------


def _x102_oracle() -> str:
    evals = ", ".join(f"'{s}'" for s in _EVAL_SOURCES)
    return f"""
    WITH tw AS (SELECT UNNEST(list_filter(string_split(LOWER(text), ' '), x -> x <> '')) AS w
                FROM documents WHERE source IN ({evals})),
    sw AS (SELECT doc_id, lang,
                  UNNEST(list_filter(string_split(LOWER(text), ' '), x -> x <> '')) AS w
           FROM documents WHERE source NOT IN ({evals})),
    tc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS tc FROM tw GROUP BY w),
    sc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS sc FROM sw GROUP BY w),
    vocab AS (SELECT COALESCE(tc.w, sc.w) AS w, COALESCE(tc.tc, 0) AS tc
              FROM tc FULL OUTER JOIN sc ON tc.w = sc.w),
    consts AS (SELECT (SELECT COALESCE(SUM(tc), 0) FROM vocab) AS nt,
                      (SELECT COUNT(*) FROM vocab) AS v),
    lp AS (SELECT w,
                  CAST(FLOOR(10000.0 * (ln(tc + 1) - ln(nt + v))) AS BIGINT) AS lp_q
           FROM vocab CROSS JOIN consts),
    ds AS (SELECT s.doc_id, MIN(s.lang) AS lang,
                  CAST(COUNT(*) AS BIGINT) AS n_words,
                  CAST(SUM(l.lp_q) AS BIGINT) AS sum_lp
           FROM sw s JOIN lp l ON l.w = s.w
           GROUP BY s.doc_id),
    scored AS (SELECT doc_id, lang, n_words, sum_lp,
                      CAST(FLOOR(sum_lp * 10000.0 / n_words) AS BIGINT) AS score_q
               FROM ds),
    dist AS (SELECT lang, score_q, CAST(COUNT(*) AS BIGINT) AS cnt
             FROM scored GROUP BY lang, score_q),
    cum AS (SELECT lang, score_q,
                   CAST(SUM(cnt) OVER (PARTITION BY lang ORDER BY score_q DESC)
                        AS BIGINT) AS cum,
                   CAST(SUM(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
            FROM dist),
    cuts AS (SELECT lang,
                    MAX(CASE WHEN 3 * cum >= n THEN score_q END) AS head_cut,
                    MAX(CASE WHEN 3 * cum >= 2 * n THEN score_q END) AS tail_cut
             FROM cum GROUP BY lang)
    SELECT s.doc_id, s.lang, s.n_words, s.sum_lp, s.score_q,
           CASE WHEN s.score_q >= c.head_cut THEN 'head'
                WHEN s.score_q >= c.tail_cut THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM scored s JOIN cuts c USING (lang)
    """


@register(
    "x102_lm_quality_buckets",
    oracle=_x102_oracle(),
    tags=("curation", "quality", "lm", "training-prep", "scale"),
)
def x102_lm_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style language-model quality bucketing (Wenzek et al. 2020):
    score every raw-pool document by its mean per-word log-probability
    under a TARGET-domain unigram LM (add-one smoothed, trained on the
    eval sources — the stand-in for CCNet's Wikipedia LM; CCNet's 5-gram
    KenLM is approximated at n=1, the same honest posture as x100's DSIR
    estimator), then split each LANGUAGE into head / middle / tail
    thirds — the dataset partition CCNet ships and pretraining recipes
    consume (keep head+middle, drop tail).

    Bucketing is CUTOFF-based, not rank-based, exactly like CCNet's
    published percentile thresholds: head_cut(lang) is the largest score
    s with |{{score >= s}}| >= ceil(n/3) (ties make buckets minimally
    larger, never smaller).  That choice is what makes the operator
    scale: the cutoffs come from windows over the (lang, distinct score)
    AGGREGATE — corpus-sized data is never globally sorted; the corpus
    touches one groupBy(doc) pass, one broadcast-join against the
    score-quantized LM table, and one broadcast-join against the
    per-language cutoffs.  The per-(doc, word) count pass is shared
    between the LM's corpus-side vocabulary and the per-doc scoring sums
    (the x100 shared-exchange discipline).  All arithmetic after the
    per-word ln is bigint (lp quantized 1e-4 BEFORE the per-doc sum)."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    tgt = d.filter(F.col("source").isin(*_EVAL_SOURCES))
    raw = d.filter(~F.col("source").isin(*_EVAL_SOURCES))

    dw = (
        raw.select("doc_id", "lang", F.explode(word_tokens("text")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(
            F.min("lang").alias("lang"),
            F.count(F.lit(1)).cast("bigint").alias("c"),
        )
    )
    from hiveka_spark.operators.bpe import word_freq

    tc = word_freq(tgt).withColumnRenamed("freq", "tc")
    sc = dw.groupBy("w").agg(F.sum("c").cast("bigint").alias("sc"))
    vocab = tc.join(sc, "w", "full_outer").select(
        "w", F.coalesce("tc", F.lit(0)).alias("tc")
    )
    consts = vocab.agg(
        F.coalesce(F.sum("tc"), F.lit(0)).alias("nt"),
        F.count(F.lit(1)).alias("v"),
    )
    lp = vocab.crossJoin(F.broadcast(consts)).select(
        "w",
        F.floor(
            10000.0 * (F.log(F.col("tc") + 1) - F.log(F.col("nt") + F.col("v")))
        ).cast("bigint").alias("lp_q"),
    )
    ds = dw.join(F.broadcast(lp), "w").groupBy("doc_id").agg(
        F.min("lang").alias("lang"),
        F.sum("c").cast("bigint").alias("n_words"),
        F.sum(F.col("c") * F.col("lp_q")).cast("bigint").alias("sum_lp"),
    )
    scored = ds.select(
        "doc_id", "lang", "n_words", "sum_lp",
        F.floor(F.col("sum_lp") * 10000.0 / F.col("n_words"))
        .cast("bigint").alias("score_q"),
    )
    # cutoffs from the (lang, DISTINCT score) aggregate — never a
    # corpus-sized sort; the window input is score-cardinality-bounded
    dist = scored.groupBy("lang", "score_q").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    w_cum = Window.partitionBy("lang").orderBy(F.desc("score_q"))
    cum = dist.select(
        "lang", "score_q",
        F.sum("cnt").over(w_cum).cast("bigint").alias("cum"),
        F.sum("cnt").over(Window.partitionBy("lang")).cast("bigint").alias("n"),
    )
    cuts = cum.groupBy("lang").agg(
        F.max(F.when(3 * F.col("cum") >= F.col("n"), F.col("score_q")))
        .alias("head_cut"),
        F.max(F.when(3 * F.col("cum") >= 2 * F.col("n"), F.col("score_q")))
        .alias("tail_cut"),
    )
    return scored.join(F.broadcast(cuts), "lang").select(
        "doc_id", "lang", "n_words", "sum_lp", "score_q",
        F.when(F.col("score_q") >= F.col("head_cut"), F.lit("head"))
        .when(F.col("score_q") >= F.col("tail_cut"), F.lit("middle"))
        .otherwise(F.lit("tail")).alias("bucket"),
    )


# ---------------------------------------------------------------------------
# x106 — leakage-safe train/val/test split (duplicate-cluster-aware)
# ---------------------------------------------------------------------------

_X106_TRAIN_PCT = 80
_X106_VAL_PCT = 90  # train < 80 <= val < 90 <= test


def _x106_oracle() -> str:
    h = D.portable_hash60_sql("concat('split_', CAST(cluster_rep AS VARCHAR))")
    return f"""
    WITH RECURSIVE
    w AS (SELECT doc_id, list_filter(string_split(LOWER(text), ' '), x -> x <> '') AS ws
          FROM documents),
    sh AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS s
           FROM (SELECT doc_id, ws, UNNEST(generate_series(1, GREATEST(LEN(ws) - 2, 1))) AS i
                 FROM w)),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    pairs AS (SELECT id_a, id_b
              FROM inter
              JOIN sizes sa ON sa.doc_id = id_a
              JOIN sizes sb ON sb.doc_id = id_b
              WHERE CAST(FLOOR((i * 1.0 / (sa.n + sb.n - i)) * 10000.0) AS BIGINT) / 10000.0
                    >= 0.8),
    edges AS (SELECT id_a AS u, id_b AS v FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach AS (SELECT u, u AS v FROM (SELECT DISTINCT u FROM edges)
              UNION
              SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
    labels AS (SELECT u AS node, MIN(v) AS cluster FROM reach GROUP BY u),
    assigned AS (SELECT d.doc_id,
                        CAST(COALESCE(l.cluster, d.doc_id) AS BIGINT) AS cluster_rep
                 FROM documents d LEFT JOIN labels l ON l.node = d.doc_id)
    SELECT doc_id, cluster_rep,
           CASE WHEN {h} % 100 < {_X106_TRAIN_PCT} THEN 'train'
                WHEN {h} % 100 < {_X106_VAL_PCT} THEN 'val'
                ELSE 'test' END AS split
    FROM assigned
    """


@register(
    "x106_leakage_safe_split",
    oracle=_x106_oracle(),
    tags=("curation", "dedup", "split", "training-prep", "certification"),
)
def x106_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster-aware train/val/test split: a naive per-doc hash
    split leaks — near-duplicate pairs land in different splits and the
    eval set scores memorization (the contamination x24/x41/x68 hunt
    AFTER the fact).  Here the split key is the near-dup CLUSTER: exact
    word-3-gram Jaccard pairs (x02's lossless prefix-filtered pipeline)
    -> connected components (large-star/small-star, O(log n) rounds) ->
    every doc hashes to train/val/test by its cluster representative
    (singletons by their own id), so an entire duplicate cluster moves
    as one unit and NO near-dup pair can straddle a split boundary — by
    construction, and pinned by a property test.

    Scale shape: the component labels table is dup-population-sized
    (typically a few % of the corpus), equi-joined back on the id key;
    the split decision is a JVM hash expression on cluster_rep —
    adding/removing unrelated documents never reshuffles an existing
    cluster's split (stable under corpus growth, the x57 determinism
    discipline).  80/10/10 by salted md5, engine-portable."""
    from hiveka_spark.operators.clustering import connected_components_star

    d = table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(d, "doc_id", "text", k=3, threshold=0.8)
    labels, _ = connected_components_star(pairs.select("id_a", "id_b"))
    assigned = (
        d.select("doc_id")
        .join(labels.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster", "doc_id").cast("bigint").alias("cluster_rep"),
        )
    )
    hb = D.portable_hash60(
        F.concat(F.lit("split_"), F.col("cluster_rep").cast("string"))
    ) % 100
    return assigned.select(
        "doc_id", "cluster_rep",
        F.when(hb < _X106_TRAIN_PCT, F.lit("train"))
        .when(hb < _X106_VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test")).alias("split"),
    )


# ---------------------------------------------------------------------------
# x114 — quality-signal agreement: rule-based (x45) x LM-based (x102)
# contingency — the filter-calibration table (Wenzek et al. 2020 §5;
# Penedo et al. 2024's FineWeb ensemble-filter comparisons)
# ---------------------------------------------------------------------------


def _x114_oracle() -> str:
    from hiveka_spark.queries.pipeline_ext import _x45_oracle

    return f"""
    WITH lmq AS ({_x102_oracle()}),
    gq AS ({_x45_oracle()}),
    j AS (SELECT g.keep, l.bucket, g.n_words
          FROM lmq l JOIN gq g USING (doc_id)),
    ct AS (SELECT keep, bucket,
                  CAST(COUNT(*) AS BIGINT) AS n_docs,
                  CAST(SUM(n_words) AS BIGINT) AS sum_words
           FROM j GROUP BY keep, bucket),
    tot AS (SELECT keep, CAST(SUM(n_docs) AS BIGINT) AS kt
            FROM ct GROUP BY keep)
    SELECT ct.keep, ct.bucket, ct.n_docs, ct.sum_words,
           CAST(ct.n_docs * 10000 // t.kt AS BIGINT) AS pct_of_keep_q
    FROM ct JOIN tot t USING (keep)
    """


@register(
    "x114_quality_agreement",
    oracle=_x114_oracle(),
    tags=("curation", "quality", "lm", "calibration"),
)
def x114_quality_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter CALIBRATION: the contingency between the two
    families of quality signals every pipeline runs — rule-based (x45's
    Gopher keep flag) and model-based (x102's CCNet LM tercile) — per
    (keep, bucket): doc count, token mass, and each cell's share of its
    keep-group (micro-units).  This is the table you read before
    composing filters (Wenzek et al. 2020 compare exactly these two;
    FineWeb's ablations do the ensemble version): if keep=1 docs are not
    LM-head-heavy, the rule chain and the LM disagree about this corpus
    and thresholds need revisiting BEFORE a training run bakes them in.

    Scale shape: both signals are existing certified operators (zero-
    shuffle rules; x102's shared-exchange LM scoring with cutoffs from
    the (lang, distinct score) aggregate); the agreement join is id-
    keyed; the contingency is a 6-row table and its keep-group shares a
    2-row broadcast join.  The oracle embeds BOTH gates' oracles as CTEs
    — one SQL text replays rules, LM training, scoring, bucketing, and
    the contingency."""
    from hiveka_spark.operators.text import with_gopher_rules

    lm = x102_lm_quality_buckets(spark, sf_dir).select("doc_id", "bucket")
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    gq = with_gopher_rules(d).select("doc_id", "keep", "n_words")
    ct = (
        lm.join(gq, "doc_id")
        .groupBy("keep", "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("sum_words"),
        )
    )
    # the share branch re-references ct's subtree: static plan counts double,
    # but the single action reuses the contingency exchange at runtime
    # (ReusedExchange pinned on the executed plan in tests/test_plans.py —
    # the x100/x102 posture; an eager checkpoint here measured SLOWER)
    tot = ct.groupBy("keep").agg(F.sum("n_docs").cast("bigint").alias("kt"))
    return ct.join(F.broadcast(tot), "keep").select(
        "keep", "bucket", "n_docs", "sum_words",
        F.expr("CAST(n_docs * 10000 DIV kt AS BIGINT)").alias("pct_of_keep_q"),
    )


# ---------------------------------------------------------------------------
# x116 — audio content dedup through the REAL codec: decoded-prefix
# fingerprint groups trimmed/extended copies of the same recording
# ---------------------------------------------------------------------------

_X116_GROUP = 7  # clips per planted recording group


def _x116_oracle() -> str:
    return f"""
    WITH b AS (
      SELECT doc_id,
             CAST(doc_id // {_X116_GROUP} AS BIGINT) AS gid,
             CAST(doc_id % 400 + 100 AS BIGINT) AS n
      FROM documents),
    k AS (SELECT doc_id, n,
                 -- the first 64 decoded uint8 samples widened to
                 -- little-endian int32 (the engine's <i4 normalization):
                 -- each payload byte -> its hex + '000000'; the digest
                 -- tiles, so samples 32..63 repeat samples 0..31
                 array_to_string(list_transform(range(0, 64),
                     i -> substr(sha256(CAST(gid AS VARCHAR)), 2*(i % 32) + 1, 2)
                          || '000000'), '') AS prefix_hex
          FROM b)
    SELECT prefix_hex,
           CAST(COUNT(*) AS BIGINT) AS n_clips,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_id,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_dups,
           CAST(SUM(n) AS BIGINT) AS sum_samples
    FROM k GROUP BY prefix_hex
    """


@register(
    "x116_audio_prefix_dedup",
    oracle=_x116_oracle(),
    tags=("multimodal", "audio", "dedup", "mapinpandas"),
)
def x116_audio_prefix_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio content dedup with a REAL codec in the loop (the audio-side
    x49): clips are keyed by the hex of their first 64 DECODED samples
    normalized to little-endian int32 —
    container bytes never enter the key, so trimmed or extended copies
    of the same recording (different RIFF lengths, same PCM prefix)
    group together while any byte-level container comparison would not.
    The fixture plants its own ground truth: every {_X116_GROUP}
    consecutive docs synthesize clips from the same source digest at
    DIFFERENT lengths (n = doc_id % 400 + 100), so each group is a
    planted duplicate cluster the exact-container hash cannot see.
    Per fingerprint: clip count, keep-first keeper, dup count, total
    samples.

    Scale shape: synth and decode are Arrow-batched mapInPandas through
    the stdlib wave codec (real RIFF parse, x44's discipline); the dedup
    is ONE hash aggregate on the 512-hex-char key — x01's shape, the
    shuffle carries fingerprints, never audio bytes.  The oracle replays
    the digest-tiling arithmetic through the ``<i4`` key normalization:
    the key is the first 64 decoded uint8 samples (= the 32-byte
    sha256(gid) tiled twice) each widened to 4 little-endian bytes, so
    prefix_hex is the digest's hex pairs, tiled, each suffixed
    '000000' — certified without the oracle ever seeing a container."""
    from hiveka_spark.operators.multimodal import (
        audio_prefix_signature,
        synthesize_wav_media,
    )

    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(f"CAST(doc_id DIV {_X116_GROUP} AS STRING)").alias("text"),
    )
    media = synthesize_wav_media(d, "doc_id", "text")
    sig = audio_prefix_signature(media, prefix_samples=64)
    return sig.groupBy("prefix_hex").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clips"),
        F.min("media_id").cast("bigint").alias("keeper_id"),
        (F.count(F.lit(1)) - 1).cast("bigint").alias("n_dups"),
        F.sum("n_samples").cast("bigint").alias("sum_samples"),
    )


# ---------------------------------------------------------------------------
# x117 — INCREMENTAL IVF index across corpus versions (ANN x incremental)
# ---------------------------------------------------------------------------

_X117_STRIDE = 31
_X117_CELLS = 8
_X117_PROBE = 3
_X117_CAND_LIM = 31 * 64  # candidate-id window bounding the centroid rank


def _x117_oracle(
    k: int = 5,
    n_cells: int = _X117_CELLS,
    n_probe: int = _X117_PROBE,
    stride: int = _X117_STRIDE,
    lim: int = _X117_CAND_LIM,
) -> str:
    return f"""
    WITH q AS (SELECT vec_id,
                 list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
          FROM embeddings),
    nn AS (SELECT vec_id, list_transform(qv, x -> CAST(x AS DOUBLE)) AS qvd,
                  list_dot_product(list_transform(qv, x -> CAST(x AS DOUBLE)),
                                   list_transform(qv, x -> CAST(x AS DOUBLE))) AS n2
           FROM q),
    cc AS (SELECT vec_id, qvd, n2,
                  CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell
           FROM nn
           WHERE vec_id % {stride} = 0 AND vec_id < {lim} AND vec_id % 7 <> 0),
    cents AS (SELECT cell, qvd AS cvd, n2 AS cn2 FROM cc WHERE cell < {n_cells}),
    assign AS (SELECT vec_id, qvd, n2, cell,
                      ROW_NUMBER() OVER (PARTITION BY vec_id
                                         ORDER BY c_cos DESC, cell) AS c_rank
               FROM (SELECT nn.vec_id, nn.qvd, nn.n2, c.cell,
                            list_dot_product(nn.qvd, c.cvd)
                              / (sqrt(nn.n2) * sqrt(c.cn2)) AS c_cos
                     FROM nn CROSS JOIN cents c)),
    corpus AS (SELECT vec_id AS neighbor_id, qvd, n2, cell FROM assign WHERE c_rank = 1),
    probes AS (SELECT vec_id AS query_id, qvd, n2, cell
               FROM assign WHERE c_rank <= {n_probe} AND vec_id < 10),
    scored AS (
      SELECT p.query_id, c.neighbor_id,
             CAST(FLOOR((list_dot_product(p.qvd, c.qvd)
                         / (sqrt(p.n2) * sqrt(c.n2))) * 10000.0) AS BIGINT) / 10000.0
               AS cosine
      FROM probes p JOIN corpus c ON p.cell = c.cell AND c.neighbor_id <> p.query_id)
    SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= {k}
    """


@register(
    "x117_incremental_ivf",
    oracle=_x117_oracle(),
    tags=("similarity", "ann", "ivf", "incremental", "versioned-corpus"),
)
def x117_incremental_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL IVF serving across corpus versions — the ANN-side
    never-re-read posture (x70's for dedup, x95's for tokens): v1
    vectors (vec_id % 7 != 0) are assigned to FROZEN centroids and
    persisted as an index segment carrying their quantized payload; the
    v2 drop lands later and appends its own segment against the SAME
    centroids — v1 embeddings are never re-read (an IVF index stores
    the vectors, so serving reads only committed segments: the probe
    plan's corpus side is the read-back ``v=*`` union, asserted in
    tests).  Frozen parameters are what make the increment valid —
    exactly x95's frozen tokenizer; drift shows up as per-cell occupancy
    skew across segments, and the fix is an offline retrain + REBUILD,
    never a silent partial re-assignment.

    Centroids: the first {_X117_CELLS} stride-{_X117_STRIDE} vectors
    that belong to v1 (dense rank over a FIXED candidate-id window of
    {_X117_CAND_LIM} — the rank window is bounded by construction, and
    the provenance constraint matters: parameters may not peek at a
    version that hasn't arrived).  The DuckDB oracle replays the
    one-shot IVF answer over the FULL corpus under the same frozen
    centroids — the convergence contract: incremental serving must
    equal from-scratch serving."""
    from pyspark.sql import Window

    from hiveka_spark.operators.similarity import (
        ivf_index_topk,
        ivf_index_update,
        ivf_topk,  # noqa: F401  (the one-shot twin, equality-pinned in tests)
    )
    from hiveka_spark.scratch import scratch_dir

    root = scratch_dir(prefix="gate_x117_")
    e = table(spark, sf_dir, "embeddings")
    cand = e.filter(
        (F.col("vec_id") % _X117_STRIDE == 0)
        & (F.col("vec_id") < _X117_CAND_LIM)
        & (F.col("vec_id") % 7 != 0)
    )
    # bounded window: the candidate-id filter admits <= 64 rows
    w = Window.orderBy("vec_id")
    cents = (
        cand.withColumn("cell", (F.row_number().over(w) - 1).cast("bigint"))
        .filter(F.col("cell") < _X117_CELLS)
        .select("cell", "embedding")
        .localCheckpoint(eager=True)  # frozen parameters (k-row table)
    )
    ivf_index_update(spark, e.filter(F.col("vec_id") % 7 != 0), root, 1, cents)
    ivf_index_update(spark, e.filter(F.col("vec_id") % 7 == 0), root, 2, cents)
    return ivf_index_topk(
        spark, root, e.filter(F.col("vec_id") < 10), cents,
        k=5, n_probe=_X117_PROBE,
    ).localCheckpoint(eager=True)  # materialize before scratch cleanup


# ---------------------------------------------------------------------------
# x118 — IVF occupancy drift report: the rebuild trigger for the frozen-
# centroid incremental index (x117/s29)
# ---------------------------------------------------------------------------


def _x118_oracle(
    n_cells: int = _X117_CELLS, stride: int = _X117_STRIDE,
    lim: int = _X117_CAND_LIM,
) -> str:
    return f"""
    WITH q AS (SELECT vec_id,
                 list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
          FROM embeddings),
    nn AS (SELECT vec_id, list_transform(qv, x -> CAST(x AS DOUBLE)) AS qvd,
                  list_dot_product(list_transform(qv, x -> CAST(x AS DOUBLE)),
                                   list_transform(qv, x -> CAST(x AS DOUBLE))) AS n2
           FROM q),
    cc AS (SELECT vec_id, qvd, n2,
                  CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell
           FROM nn
           WHERE vec_id % {stride} = 0 AND vec_id < {lim} AND vec_id % 7 <> 0),
    cents AS (SELECT cell, qvd AS cvd, n2 AS cn2 FROM cc WHERE cell < {n_cells}),
    assign AS (SELECT vec_id, cell,
                      ROW_NUMBER() OVER (PARTITION BY vec_id
                                         ORDER BY c_cos DESC, cell) AS c_rank
               FROM (SELECT nn.vec_id, c.cell,
                            list_dot_product(nn.qvd, c.cvd)
                              / (sqrt(nn.n2) * sqrt(c.cn2)) AS c_cos
                     FROM nn CROSS JOIN cents c)),
    a AS (SELECT vec_id, cell,
                 CAST(CASE WHEN vec_id % 7 <> 0 THEN 1 ELSE 2 END AS BIGINT)
                   AS version
          FROM assign WHERE c_rank = 1),
    per AS (SELECT cell,
                   CAST(SUM(CASE WHEN version = 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_v1,
                   CAST(SUM(CASE WHEN version = 2 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_v2,
                   CAST(COUNT(*) AS BIGINT) AS n_total
            FROM a GROUP BY cell),
    tot AS (SELECT CAST(SUM(n_total) AS BIGINT) AS t,
                   CAST(COUNT(*) AS BIGINT) AS k FROM per)
    SELECT per.cell, per.n_v1, per.n_v2, per.n_total,
           CAST(per.n_total * 10000 // (t.t // t.k) AS BIGINT) AS load_q,
           CAST(CASE WHEN per.n_total * t.k > 2 * t.t THEN 1 ELSE 0 END
                AS BIGINT) AS rebuild_flag
    FROM per CROSS JOIN tot t
    """


@register(
    "x118_ivf_occupancy_drift",
    oracle=_x118_oracle(),
    tags=("similarity", "ann", "ivf", "monitoring", "incremental"),
)
def x118_ivf_occupancy_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF occupancy-drift report — the REBUILD TRIGGER for the frozen-
    centroid incremental index (x117 batch, s29 live): frozen parameters
    make increments valid, but a drifting corpus piles new vectors into
    few cells, degrading probe selectivity until a retrain+rebuild pays
    for itself.  Per cell: v1 and v2 member counts, total, load relative
    to the mean cell (micro-units, bigint DIV), and the rebuild flag
    (total > 2x mean — the FAISS imbalance-factor heuristic reduced to
    an exact integer test: n_total * k > 2 * t avoids the division
    entirely).

    Scale shape: one broadcast-centroid argmax over the corpus (zero
    corpus shuffle) + one cell-keyed count aggregate (k rows) + a 1-row
    broadcast total.  The oracle replays assignment and every
    threshold."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "embeddings")
    cand = e.filter(
        (F.col("vec_id") % _X117_STRIDE == 0)
        & (F.col("vec_id") < _X117_CAND_LIM)
        & (F.col("vec_id") % 7 != 0)
    )
    cents = (
        cand.withColumn(
            "cell",
            (F.row_number().over(Window.orderBy("vec_id")) - 1).cast("bigint"),
        )
        .filter(F.col("cell") < _X117_CELLS)
        .select("cell", "embedding")
        .localCheckpoint(eager=True)
    )
    from hiveka_spark.operators.similarity import ivf_assign

    a = ivf_assign(e, cents).select(
        "vec_id", "cell",
        F.when(F.col("vec_id") % 7 != 0, 1).otherwise(2)
        .cast("bigint").alias("version"),
    )
    per = a.groupBy("cell").agg(
        F.sum(F.when(F.col("version") == 1, 1).otherwise(0))
        .cast("bigint").alias("n_v1"),
        F.sum(F.when(F.col("version") == 2, 1).otherwise(0))
        .cast("bigint").alias("n_v2"),
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
    )
    tot = per.agg(
        F.sum("n_total").cast("bigint").alias("t"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "cell", "n_v1", "n_v2", "n_total",
        F.expr("CAST(n_total * 10000 DIV (t DIV k) AS BIGINT)").alias("load_q"),
        F.when(F.col("n_total") * F.col("k") > 2 * F.col("t"), 1)
        .otherwise(0).cast("bigint").alias("rebuild_flag"),
    )


# ---------------------------------------------------------------------------
# x119 — distributed power iteration: top principal direction of the
# embedding covariance, integer-exact (the PCA/whitening preprocessing of
# Jegou et al. 2011's PQ pipelines; Halko et al. 2011 randomized SVD is the
# many-components scale path)
# ---------------------------------------------------------------------------

_X119_DIM = 64
_X119_ITERS = 3


def _x119_matvec_sql(vprev: str, w: str) -> str:
    """One unrolled integer matvec CTE (shared by x119 and x129)."""
    return (
        f"{w} AS MATERIALIZED (SELECT ap.i, CAST(SUM(ap.a * {vprev}.val) AS BIGINT) AS wv"
        f" FROM ap JOIN {vprev} ON ap.j = {vprev}.i GROUP BY ap.i)"
    )


def _x119_rescale_sql(w: str, v: str) -> str:
    """The deterministic max-abs-to-1e4 integer rescale CTE (// truncates
    toward zero in DuckDB, matching Spark's DIV on negatives)."""
    return (
        f"{v} AS MATERIALIZED (SELECT i, CAST(wv * 10000 // GREATEST((SELECT MAX(ABS(wv))"
        f" FROM {w}), 1) AS BIGINT) AS val FROM {w})"
    )


def _x119_scatter_ctes(dim: int = _X119_DIM) -> str:
    """The centered-scatter replay CTEs (q/e/s/m/cn/amat/ap) shared by the
    x119 and x129 oracles — the SQL twin of :func:`_x119_scatter_local`."""
    return f"""q AS (SELECT vec_id,
                 list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
          FROM embeddings),
    e AS (SELECT vec_id, g.i, qv[CAST(g.i AS INT)] AS v
          FROM q CROSS JOIN (SELECT UNNEST(range(1, {dim + 1})) AS i) g),
    s AS (SELECT a.i, b.i AS j, CAST(SUM(a.v * b.v) AS BIGINT) AS sv
          FROM e a JOIN e b USING (vec_id) GROUP BY a.i, b.i),
    m AS (SELECT i, CAST(SUM(v) AS BIGINT) AS mv FROM e GROUP BY i),
    cn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM q),
    amat AS MATERIALIZED (SELECT s.i, s.j,
                    CAST(cn.n * s.sv - mi.mv * mj.mv AS BIGINT) AS a
             FROM s JOIN m mi ON mi.i = s.i JOIN m mj ON mj.i = s.j
             CROSS JOIN cn),
    ap AS MATERIALIZED (SELECT i, j,
                  CAST(a // ((SELECT MAX(ABS(a)) FROM amat) // 10000 + 1)
                       AS BIGINT) AS a
           FROM amat)"""


def _x119_oracle(dim: int = _X119_DIM) -> str:
    # one matvec + deterministic integer rescale per iteration, unrolled
    matvec, rescale = _x119_matvec_sql, _x119_rescale_sql
    return f"""
    WITH {_x119_scatter_ctes(dim)},
    v0 AS (SELECT i, CAST(1 AS BIGINT) AS val
           FROM (SELECT UNNEST(range(1, {dim + 1})) AS i)),
    {matvec("v0", "w1")}, {rescale("w1", "v1")},
    {matvec("v1", "w2")}, {rescale("w2", "v2")},
    {matvec("v2", "w3")}, {rescale("w3", "v3")}
    SELECT CAST(i AS BIGINT) AS pos, val AS dir_q FROM v3
    """


@register(
    "x119_power_iteration",
    oracle=_x119_oracle(),
    tags=("similarity", "linear-algebra", "iterative", "pca"),
)
def x119_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed POWER ITERATION over the embedding covariance — the
    top-principal-direction probe that fronts PQ/OPQ preprocessing
    (Jegou et al. 2011; rotate/whiten before subspace quantization) and
    embedding-drift dashboards, as engine-exact iterative linear
    algebra: the centered scatter n*S - m m^T is computed WITHOUT
    centering the data (S = one (i,j)-keyed aggregate of per-row outer
    products, m = one component sum — all bigint, no float
    accumulation), rescaled once to ~1e4 magnitude by integer DIV, and
    three matvec+rescale iterations run as 64-row joins — every
    intermediate provably under 2^63, every step replayed by the
    oracle's unrolled CTEs (the x52 discipline applied to linear
    algebra instead of Lloyd).

    Scale shape: ONE corpus pass builds S and m (the outer-product
    explode is map-side pre-aggregated; dim^2 = {_X119_DIM * _X119_DIM}
    result rows); everything after runs on dim-sized frames.  At much
    larger n the n*S term needs a pre-DIV by n to stay in int64 — the
    rescale step already in the chain is where that lands; many-
    component variants go to Halko et al. randomized SVD with the same
    aggregate shape.

    r16 optimization (guide §5 — the bounded-driver-finish posture the
    tokenizer trainers already use): the corpus pass and the dim^2
    scatter are unchanged, but the dim-sized matvec/rescale iterations
    run DRIVER-LOCALLY in exact integer Python over the collected
    scatter (4096 bounded rows) instead of as 64-row Spark joins —
    bit-identical arithmetic (truncating DIV), zero per-iteration jobs."""
    dim = _X119_DIM
    a = _x119_scatter_local(spark, sf_dir)
    v = [1] * dim
    for _ in range(_X119_ITERS):
        v = _x119_rescale_local(_x119_matvec_local(a, v))
    return spark.createDataFrame(
        [(i + 1, int(v[i])) for i in range(dim)], "pos bigint, dir_q bigint"
    )


def _trunc_div(a: int, b: int) -> int:
    """Truncating integer division — Spark ``DIV`` / DuckDB ``//``
    semantics (toward zero); Python's ``//`` floors toward -inf and
    would drift on negatives."""
    q = a // b
    if q < 0 and q * b != a:
        q += 1
    return q


def _x119_matvec_local(a: list[list[int]], v: list[int]) -> list[int]:
    """Driver-local integer matvec w = A v — exact twin of the oracle's
    matvec CTE (:func:`_x119_matvec_sql`) over the bounded dim^2 scatter."""
    return [sum(ar * vr for ar, vr in zip(row, v)) for row in a]


def _x119_rescale_local(w: list[int]) -> list[int]:
    """Deterministic integer rescale of a dim-sized vector to ~1e4
    magnitude (max-abs to 10000, truncating DIV toward zero — the exact
    twin of :func:`_x119_rescale_sql`)."""
    s = max(max(abs(x) for x in w), 1)
    return [_trunc_div(x * 10000, s) for x in w]


def _x119_ortho_local(u: list[int], v: list[int]) -> list[int]:
    """Integer Gram-Schmidt deflation o = u - (num * v) DIV den with
    num = <u, v>, den = <v, v> — the exact twin of the oracle's ortho
    CTEs (x129's deflation step), truncating toward zero."""
    num = sum(x * y for x, y in zip(u, v))
    den = sum(y * y for y in v)
    return [x - _trunc_div(num * y, den) for x, y in zip(u, v)]


def _x119_scatter_local(spark: SparkSession, sf_dir: str) -> list[list[int]]:
    """The rescaled centered-scatter matrix as a DRIVER-LOCAL dim x dim
    integer matrix (|a| <= ~1e4), shared by x119 (single top direction)
    and x129 (block top-k): ONE corpus pass builds S and m, the
    int64-headroom guard, the centering and the single integer rescale
    run driver-side over the collected bounded parts (dim^2 + dim + 1
    rows — the centroid-collect posture), so the two gates can never
    drift on the matrix they iterate and no dim-sized Spark frame ever
    round-trips the driver (r16: was 3 eager checkpoints + per-iteration
    64-row join jobs).

    The pass is per-PARTITION Gramian accumulation (round-14 verdict #4,
    closing SCALE.md's documented cutover): each task folds its rows into
    ONE dim^2 int64 matrix (numpy ``M.T @ M`` — exact: |qv| <= 2e4,
    products <= 4e8, far under int64 per partition) plus the component
    sums and the row count, and emits dim^2 + dim + 1 rows.  The shuffle
    is therefore n_partitions * dim^2 rows instead of the old per-ROW
    explode's n_rows * dim^2 (at dim 1024 the explode writes 1M rows per
    input row — the seam is what survives an embedding-width increase).
    Integer sums commute, so the result — and the x119/x122/x129 oracles,
    which replay S as a plain join-aggregate — is bit-identical."""
    from hiveka_spark.operators.similarity import quantized

    dim = _X119_DIM
    e = table(spark, sf_dir, "embeddings")
    q = e.select("vec_id", quantized("embedding").alias("qv"))

    def partials(batches):
        import numpy as np
        import pandas as pd

        g = np.zeros((dim, dim), dtype=np.int64)
        mv = np.zeros(dim, dtype=np.int64)
        n_part = 0
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(
                [np.asarray(v, dtype=np.int64) for v in pdf["qv"]]
            )
            g += mat.T @ mat
            mv += mat.sum(axis=0)
            n_part += len(pdf)
        if not n_part:
            return
        ii, jj = np.meshgrid(
            np.arange(1, dim + 1), np.arange(1, dim + 1), indexing="ij"
        )
        out = pd.DataFrame(
            {
                "kind": np.zeros(dim * dim, dtype=np.int32),
                "i": ii.reshape(-1).astype(np.int64),
                "j": jj.reshape(-1).astype(np.int64),
                "val": g.reshape(-1),
            }
        )
        mrows = pd.DataFrame(
            {
                "kind": np.ones(dim, dtype=np.int32),
                "i": np.arange(1, dim + 1, dtype=np.int64),
                "j": np.zeros(dim, dtype=np.int64),
                "val": mv,
            }
        )
        nrow = pd.DataFrame(
            {"kind": [2], "i": [0], "j": [0], "val": [n_part]}
        )
        yield pd.concat([out, mrows, nrow], ignore_index=True)

    # ONE job: the corpus pass + the bounded (dim^2 + dim + 1)-row collect;
    # everything below is exact integer Python (Spark's bigint ops and
    # Python ints agree inside the guard's headroom bound)
    rows = (
        q.mapInPandas(partials, "kind int, i long, j long, val long")
        .groupBy("kind", "i", "j")
        .agg(F.sum("val").cast("bigint").alias("val"))
        .collect()
    )
    s: dict[tuple[int, int], int] = {}
    m: dict[int, int] = {}
    n_rows = 0
    for r in rows:
        if r["kind"] == 0:
            s[(r["i"], r["j"])] = int(r["val"])
        elif r["kind"] == 1:
            m[r["i"]] = int(r["val"])
        else:
            n_rows = int(r["val"])
    # int64-headroom guard (round-13 advice): |qv_k| <= 2e4 after 1e-4
    # quantization of unit-ish embeddings, so |sv| <= n*4e8 and the
    # centered term |n*sv| <= n^2*4e8 — under 2^63 only for n <= ~4.8e6.
    # Fail LOUDLY past the bound instead of silently wrapping; the fix at
    # that scale is the pre-DIV-by-n rescale noted below.
    if n_rows > 4_000_000:
        raise ValueError(
            f"x119_power_iteration: n={n_rows} rows exceeds the int64 "
            "headroom of the uncentered n*S - m m^T form at 1e-4 "
            "quantization (bound ~4e6); apply the pre-DIV-by-n rescale "
            "before the centered-scatter join"
        )
    amat = [
        [
            n_rows * s.get((i, j), 0) - m.get(i, 0) * m.get(j, 0)
            for j in range(1, dim + 1)
        ]
        for i in range(1, dim + 1)
    ]
    mx = max(abs(c) for row in amat for c in row)
    d = _trunc_div(mx, 10000) + 1
    return [[_trunc_div(c, d) for c in row] for row in amat]


# ---------------------------------------------------------------------------
# x121 — decontamination-detector AGREEMENT matrix: exact x bloom x
# containment over one eval suite (method comparison, Brown et al. 2020
# App. C's n-gram decontamination lineage)
# ---------------------------------------------------------------------------


def _x121_oracle() -> str:
    return f"""
    WITH blm AS ({_bloom_oracle()}),
    cp AS ({_containment_decontam_oracle()}),
    cids AS (SELECT DISTINCT train_id AS doc FROM cp)
    SELECT CAST(CASE WHEN b.n_exact_hits > 0 THEN 1 ELSE 0 END AS BIGINT)
             AS exact_flag,
           CAST(b.flagged AS BIGINT) AS bloom_flag,
           CAST(CASE WHEN c.doc IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
             AS cont_flag,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(b.n_shingles) AS BIGINT) AS sum_shingles
    FROM blm b LEFT JOIN cids c ON c.doc = b.doc
    GROUP BY 1, 2, 3
    """


@register(
    "x121_decontam_agreement",
    oracle=_x121_oracle(),
    tags=("decontamination", "calibration", "bloom", "containment"),
)
def x121_decontam_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination-method AGREEMENT matrix — before trusting one
    detector at 100 TB you measure where the tiers disagree on the same
    eval suite (the methodology question since Brown et al. 2020's
    App. C n-gram pass): per training doc, the EXACT shingle-membership
    flag, the memory-bounded BLOOM flag (x62 — 32 KiB regardless of
    suite size, but with false positives), and the one-sided CONTAINMENT
    flag (x68 — catches quoted benchmarks symmetric measures miss),
    rolled to the 8-cell contingency with doc counts and shingle mass.
    Two structural facts the matrix certifies: Bloom has NO false
    negatives (an (exact=1, bloom=0) cell can never be populated —
    test-pinned), and its false-positive mass is exactly the
    (exact=0, bloom=1) cells — the operating-cost readout for the 32 KiB
    memory bound.

    Scale shape: both inputs are existing certified gates (x62's pure
    map probe; x68's broadcast eval postings); the agreement join is
    id-keyed on the flagged-population side, and the contingency is an
    8-row rollup.  The oracle embeds BOTH gates' oracles as CTEs."""
    bl = x62_bloom_decontamination(spark, sf_dir)
    cont = (
        x68_containment_decontamination(spark, sf_dir)
        .select(F.col("train_id").alias("doc"))
        .distinct()
        .withColumn("c1", F.lit(1).cast("bigint"))
    )
    j = bl.join(cont, "doc", "left")
    return j.groupBy(
        F.when(F.col("n_exact_hits") > 0, 1).otherwise(0)
        .cast("bigint").alias("exact_flag"),
        F.col("flagged").cast("bigint").alias("bloom_flag"),
        F.coalesce("c1", F.lit(0)).cast("bigint").alias("cont_flag"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_shingles").cast("bigint").alias("sum_shingles"),
    )


# ---------------------------------------------------------------------------
# x122 — subpopulation drift along the principal axis: project embeddings
# onto x119's direction, report per-label location/spread
# ---------------------------------------------------------------------------

_X122_S = 100000  # projection downscale before squaring (int64 headroom)


def _x122_oracle(dim: int = _X119_DIM) -> str:
    body = _x119_oracle(dim)
    return f"""
    WITH pr AS ({body}),
    q AS (SELECT vec_id, label,
                 list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
          FROM embeddings),
    e AS (SELECT vec_id, label, g.i, qv[CAST(g.i AS INT)] AS v
          FROM q CROSS JOIN (SELECT UNNEST(range(1, {dim + 1})) AS i) g),
    proj AS (SELECT e.vec_id, MIN(e.label) AS label,
                    CAST(SUM(e.v * p.dir_q) AS BIGINT) AS pj
             FROM e JOIN pr p ON p.pos = e.i GROUP BY e.vec_id),
    sc AS (SELECT label, CAST(pj // {_X122_S} AS BIGINT) AS s FROM proj)
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(s) AS BIGINT) AS sum_s,
           CAST(SUM(s) // COUNT(*) AS BIGINT) AS mean_s,
           CAST((COUNT(*) * SUM(s * s) - SUM(s) * SUM(s))
                // (COUNT(*) * COUNT(*)) AS BIGINT) AS var_s
    FROM sc GROUP BY label
    """


@register(
    "x122_principal_drift",
    oracle=_x122_oracle(),
    tags=("similarity", "monitoring", "pca", "drift"),
)
def x122_principal_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subpopulation drift along the PRINCIPAL axis — the 1-D embedding
    dashboard: project every vector onto x119's dominant direction and
    report per label the count, location (integer mean), and spread
    (integer population variance) of the projections.  Two labels whose
    projection distributions separate along the top component are the
    first thing a drift monitor should catch (the same reduction
    FAISS-style pipelines use to sanity-check an embedding space before
    committing to an index layout).  Projections are downscaled by
    {_X122_S} before squaring so n * sum(s^2) stays in int64 at this
    corpus; the variance uses the (n*Sxx - Sx^2) DIV n^2 integer form —
    no float moments anywhere.

    Scale shape: the direction comes from x119 (one corpus aggregate +
    dim-sized iterations); the projection is a per-row dot against the
    broadcast 64-row direction (zero corpus shuffle) and the report is
    one label-keyed aggregate.  The oracle embeds x119's full unrolled
    replay and recomputes every projection and both moments."""
    from hiveka_spark.operators.similarity import quantized

    # bounded driver handoff (64 rows — the centroid-collect posture):
    # the direction becomes an array literal, so the projection is a
    # per-row zip_with dot with ZERO corpus shuffle (a posexplode +
    # pos-join + vec-keyed re-aggregate would exchange the whole corpus)
    pr = x119_power_iteration(spark, sf_dir).collect()
    dir_arr = F.array(
        *[
            F.lit(v).cast("bigint")
            for _, v in sorted((r.pos, r.dir_q) for r in pr)
        ]
    )
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", quantized("embedding").alias("qv")
    )
    proj = e.select(
        "label",
        F.aggregate(
            F.zip_with("qv", dir_arr, lambda a, b: a * b),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("pj"),
    )
    sc = proj.select(
        "label", F.expr(f"CAST(pj DIV {_X122_S} AS BIGINT)").alias("s")
    )
    return sc.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("s").cast("bigint").alias("sum_s"),
        F.expr("CAST(SUM(s) DIV COUNT(*) AS BIGINT)").alias("mean_s"),
        F.expr(
            "CAST((COUNT(*) * SUM(s * s) - SUM(s) * SUM(s))"
            " DIV (COUNT(*) * COUNT(*)) AS BIGINT)"
        ).alias("var_s"),
    )


# ---------------------------------------------------------------------------
# x124 — lexical-diversity report per source (type/token, hapax mass —
# the Heaps/Zipf corpus-QC table)
# ---------------------------------------------------------------------------


@register(
    "x124_lexical_diversity",
    oracle="""
    WITH w AS (SELECT source,
                      UNNEST(list_filter(string_split(LOWER(text), ' '),
                                         x -> x <> '')) AS w
               FROM documents),
    sw AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
           FROM w GROUP BY source, w)
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           CAST(COUNT(*) * 10000 // SUM(c) AS BIGINT) AS ttr_q,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 10000
                // COUNT(*) AS BIGINT) AS hapax_q,
           CAST(MAX(c) AS BIGINT) AS top_word_count
    FROM sw GROUP BY source
    """,
    tags=("text", "quality", "corpus-stats"),
)
def x124_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity report per source — the Heaps/Zipf corpus-QC
    table: type/token ratio (low TTR at a given size = repetitive or
    template-heavy source — the aggregate-level signal behind x29's
    per-doc repetition filter), hapax fraction (high = noisy/OCR-ish
    vocabulary; low = tight template vocabulary), and the hottest word's
    count (a Zipf head check).  Ratios are bigint DIV micro-units on the
    source-level sums.  Diversity collapses under boilerplate BEFORE
    quality classifiers notice, so this is the first per-source number a
    corpus card shows after raw counts (x50).

    Scale shape: ONE (source, word)-keyed count (map-side combinable —
    the word explode collapses before any shuffle leaves the task) and
    one source rollup; no joins, no windows."""
    d = table(spark, sf_dir, "documents")
    sw = (
        d.select("source", F.explode(word_tokens("text")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    return sw.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("bigint").alias("n_hapax"),
        F.expr("CAST(COUNT(*) * 10000 DIV SUM(c) AS BIGINT)").alias("ttr_q"),
        F.expr(
            "CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 10000"
            " DIV COUNT(*) AS BIGINT)"
        ).alias("hapax_q"),
        F.max("c").cast("bigint").alias("top_word_count"),
    )


# ---------------------------------------------------------------------------
# x129 — BLOCK power iteration: top-k principal directions with per-step
# integer Gram-Schmidt (x119 at width — the OPQ/whitening front at k > 1)
# ---------------------------------------------------------------------------


def _x129_chain_ctes(
    dim: int = _X119_DIM, iters: int = _X119_ITERS
) -> tuple[str, str, str]:
    """The x129 block-power-iteration CTE chain (a0/b0 seeds + the
    per-iteration matvec/rescale/Gram-Schmidt blocks) WITHOUT the scatter
    prefix or final select — shared by the x129 oracle and x140's OPQ
    rotation front, which consumes the two direction tables it produces.
    Returns ``(ctes_text, dir1_cte_name, dir2_cte_name)``."""
    matvec, rescale = _x119_matvec_sql, _x119_rescale_sql

    def ortho(u2: str, v1: str, dots: str, o2: str) -> str:
        """Integer Gram-Schmidt of rescaled u2 against rescaled v1:
        o2 = u2 - (num * v1) // den with num = <u2, v1>, den = <v1, v1>
        (// truncates toward zero in both engines)."""
        return f"""{dots} AS MATERIALIZED (
      SELECT CAST(SUM(a.val * b.val) AS BIGINT) AS num,
             CAST(SUM(b.val * b.val) AS BIGINT) AS den
      FROM {u2} a JOIN {v1} b USING (i)),
    {o2} AS MATERIALIZED (
      SELECT a.i, CAST(a.val - (d.num * b.val) // d.den AS BIGINT) AS wv
      FROM {u2} a JOIN {v1} b USING (i) CROSS JOIN {dots} d)"""

    steps = [
        f"""a0 AS (SELECT i, CAST(1 AS BIGINT) AS val
           FROM (SELECT UNNEST(range(1, {dim + 1})) AS i))""",
        f"""b0 AS (SELECT i, CAST(CASE WHEN i % 2 = 1 THEN 1 ELSE -1 END AS BIGINT)
                    AS val
           FROM (SELECT UNNEST(range(1, {dim + 1})) AS i))""",
    ]
    p1, p2 = "a0", "b0"
    for t in range(1, iters + 1):
        steps += [
            matvec(p1, f"aw{t}"), rescale(f"aw{t}", f"a{t}"),
            matvec(p2, f"bw{t}"), rescale(f"bw{t}", f"bu{t}"),
            ortho(f"bu{t}", f"a{t}", f"bd{t}", f"bo{t}"),
            rescale(f"bo{t}", f"b{t}"),
        ]
        p1, p2 = f"a{t}", f"b{t}"
    return ",\n    ".join(steps), p1, p2


def _x129_oracle(dim: int = _X119_DIM, iters: int = _X119_ITERS) -> str:
    chain, p1, p2 = _x129_chain_ctes(dim, iters)
    return f"""
    WITH {_x119_scatter_ctes(dim)},
    {chain}
    SELECT CAST(v1.i AS BIGINT) AS pos, v1.val AS dir1_q, v2.val AS dir2_q
    FROM {p1} v1 JOIN {p2} v2 USING (i)
    """


@register(
    "x129_block_power_iteration",
    oracle=_x129_oracle(),
    tags=("similarity", "linear-algebra", "iterative", "pca", "opq"),
)
def x129_block_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOCK power iteration — x119 at width (round-13 verdict #6): the
    TOP-2 principal directions of the embedding covariance via
    simultaneous iteration with per-step integer Gram-Schmidt, the
    orthogonalized basis an OPQ-style rotation front (Ge et al. 2014) for
    x84's residual quantization arm and a 2-axis drift dashboard (x122's
    projection table at k=2).  Same engine-exact arithmetic as x119: the
    shared rescaled scatter (``_x119_scatter_local`` — one corpus pass, dim^2
    rows, int64-guarded), then per iteration two dim-sized matvecs, the
    max-abs-to-1e4 rescale, and the deflation step
    v2 <- v2 - (<v2, v1> * v1) DIV <v1, v1> in truncating integer
    division (DuckDB // agrees on negatives), every step unrolled in the
    oracle.  Rescale-before-orthogonalize keeps every product under 2^63:
    |num| <= dim * 1e8, |num * v1_i| <= dim * 1e12.

    Scale shape: identical to x119 — the corpus is touched once for the
    scatter; all iteration state is dim-sized and (r16) runs
    DRIVER-LOCALLY in exact integer Python over the collected scatter
    (the bounded-driver-finish posture; was ~3 eager dim-row checkpoint
    jobs per iteration).  At dim >= ~1024 the per-row dim^2
    outer-product explode must move to per-PARTITION Gramian
    accumulation (aggregate dim^2 cells per partition, not per row) and
    k grows via Halko et al. randomized SVD on the same aggregate shape
    — documented in SCALE.md (round-14 row)."""
    dim = _X119_DIM
    a = _x119_scatter_local(spark, sf_dir)
    v1 = [1] * dim
    v2 = [1 if i % 2 == 0 else -1 for i in range(dim)]
    for _ in range(_X119_ITERS):
        v1 = _x119_rescale_local(_x119_matvec_local(a, v1))
        u2 = _x119_rescale_local(_x119_matvec_local(a, v2))
        v2 = _x119_rescale_local(_x119_ortho_local(u2, v1))
    return spark.createDataFrame(
        [(i + 1, int(v1[i]), int(v2[i])) for i in range(dim)],
        "pos bigint, dir1_q bigint, dir2_q bigint",
    )


#: width of the OPQ rotation front consumed by x140/x145 (round-15 verdict
#: #3 — raised from the 2 directions x129's gate reports; the m Walsh seeds
#: below stay mutually orthogonal at any power-of-two dim >= 2^(m-1))
_X129_TOPM = 4


def _x129m_seed_sql(j: int, dim: int, name: str) -> str:
    """Deterministic Walsh-pattern seed for block direction ``j``: sign
    flips every 2^(j-1) coordinates (j=0 all ones = x129's a0; j=1
    alternating = x129's b0) — mutually orthogonal, so the block starts
    independent without any randomness."""
    if j == 0:
        return (f"{name} AS (SELECT i, CAST(1 AS BIGINT) AS val "
                f"FROM (SELECT UNNEST(range(1, {dim + 1})) AS i))")
    half = 2 ** (j - 1)
    return (f"{name} AS (SELECT i, CAST(CASE WHEN ((i - 1) // {half}) % 2 = 0 "
            "THEN 1 ELSE -1 END AS BIGINT) AS val "
            f"FROM (SELECT UNNEST(range(1, {dim + 1})) AS i))")


def _x129m_ortho_sql(u2: str, v1: str, dots: str, o2: str) -> str:
    """Integer Gram-Schmidt of rescaled ``u2`` against rescaled ``v1`` —
    x129's deflation step, shared by the width-m chain."""
    return f"""{dots} AS MATERIALIZED (
      SELECT CAST(SUM(a.val * b.val) AS BIGINT) AS num,
             CAST(SUM(b.val * b.val) AS BIGINT) AS den
      FROM {u2} a JOIN {v1} b USING (i)),
    {o2} AS MATERIALIZED (
      SELECT a.i, CAST(a.val - (d.num * b.val) // d.den AS BIGINT) AS wv
      FROM {u2} a JOIN {v1} b USING (i) CROSS JOIN {dots} d)"""


def _x129m_chain_ctes(
    dim: int = _X119_DIM, iters: int = _X119_ITERS, m: int = _X129_TOPM
) -> tuple[str, list[str]]:
    """x129's block power iteration generalized to WIDTH m (round-15
    verdict #3): per iteration, every direction takes one matvec + the
    max-abs rescale, then deflates sequentially against each
    already-finished direction of the SAME iteration (ortho + rescale per
    deflation — rescale-before-orthogonalize keeps |num| <= dim * 1e8 and
    |num * v_i| <= dim * 1e12, the x129 headroom argument unchanged at
    any m).  Returns ``(ctes_text, [dir_cte_names])`` — m direction
    tables, every step unrolled for the oracle."""
    matvec, rescale = _x119_matvec_sql, _x119_rescale_sql
    steps: list[str] = []
    prev: list[str] = []
    for j in range(m):
        name = f"g{j}s"
        steps.append(_x129m_seed_sql(j, dim, name))
        prev.append(name)
    for t in range(1, iters + 1):
        cur: list[str] = []
        for j in range(m):
            steps.append(matvec(prev[j], f"g{j}w{t}"))
            steps.append(rescale(f"g{j}w{t}", f"g{j}u{t}_0"))
            name = f"g{j}u{t}_0"
            for l in range(j):
                steps.append(
                    _x129m_ortho_sql(
                        name, cur[l], f"g{j}d{t}_{l}", f"g{j}o{t}_{l}"
                    )
                )
                steps.append(rescale(f"g{j}o{t}_{l}", f"g{j}u{t}_{l + 1}"))
                name = f"g{j}u{t}_{l + 1}"
            cur.append(name)
        prev = cur
    return ",\n    ".join(steps), prev


def _x129m_basis(
    spark: SparkSession, sf_dir: str, m: int = _X129_TOPM
) -> list[list[int]]:
    """Driver-local twin of :func:`_x129m_chain_ctes`: the top-m
    quantized principal directions as m plain dim-sized int lists —
    x129's loop at width m in exact integer Python over the collected
    scatter (r16: was ~(m + m(m-1)/2) eager dim-row checkpoint jobs PER
    iteration plus m collects in the consumer; now zero jobs past the
    scatter's one corpus pass)."""
    dim = _X119_DIM
    a = _x119_scatter_local(spark, sf_dir)
    vs: list[list[int]] = []
    for j in range(m):
        if j == 0:
            vs.append([1] * dim)
        else:
            half = 2 ** (j - 1)
            vs.append(
                [1 if (i // half) % 2 == 0 else -1 for i in range(dim)]
            )
    for _ in range(_X119_ITERS):
        cur: list[list[int]] = []
        for j in range(m):
            u = _x119_rescale_local(_x119_matvec_local(a, vs[j]))
            for l in range(j):
                u = _x119_rescale_local(_x119_ortho_local(u, cur[l]))
            cur.append(u)
        vs = cur
    return vs


# ---------------------------------------------------------------------------
# x135 — IVF index COMPACTION: segment fold with serving-equality certificate
# ---------------------------------------------------------------------------


@register(
    "x135_ivf_index_compaction",
    oracle=_x117_oracle(),
    tags=("similarity", "ann", "ivf", "incremental", "compaction"),
)
def x135_ivf_index_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index segment COMPACTION — the ANN lifecycle's fold step
    (x117/s29 append one ``v=<version>`` segment per drop/micro-batch; a
    long-running ingest accumulates dirs forever and every probe pays the
    listing + small-file overhead): THREE version drops land under x117's
    frozen centroids, the index is compacted into ONE cell-sorted
    segment (atomic publish under a fresh version with a _COMPACTED
    marker; crash retries finish deletes instead of re-folding — the
    band-index compaction's ordering rules), and serving runs FROM THE
    COMPACTED SEGMENT.  The oracle is the from-scratch one-shot answer
    over the full corpus (x117's convergence contract) — so the hash
    match certifies compaction invariance: fold + relayout changed
    nothing a query can observe.

    Scale shape: the fold is one read-rewrite of index rows (quantized
    payloads, never source embeddings), sorted by cell so probe reads
    touch contiguous row groups; serving stays the broadcast-probe +
    cell equi-join."""
    from pyspark.sql import Window

    from hiveka_spark.operators.similarity import (
        ivf_index_compact,
        ivf_index_topk,
        ivf_index_update,
        ivf_index_versions,
    )
    from hiveka_spark.scratch import scratch_dir

    root = scratch_dir(prefix="gate_x135_")
    e = table(spark, sf_dir, "embeddings")
    cand = e.filter(
        (F.col("vec_id") % _X117_STRIDE == 0)
        & (F.col("vec_id") < _X117_CAND_LIM)
        & (F.col("vec_id") % 7 != 0)
    )
    w = Window.orderBy("vec_id")
    cents = (
        cand.withColumn("cell", (F.row_number().over(w) - 1).cast("bigint"))
        .filter(F.col("cell") < _X117_CELLS)
        .select("cell", "embedding")
        .localCheckpoint(eager=True)
    )
    ivf_index_update(spark, e.filter(F.col("vec_id") % 7 != 0), root, 1, cents)
    ivf_index_update(
        spark,
        e.filter((F.col("vec_id") % 7 == 0) & (F.col("vec_id") % 2 == 0)),
        root, 2, cents,
    )
    ivf_index_update(
        spark,
        e.filter((F.col("vec_id") % 7 == 0) & (F.col("vec_id") % 2 == 1)),
        root, 3, cents,
    )
    nxt = ivf_index_compact(spark, root)
    vs = ivf_index_versions(root)
    assert vs == [4] and nxt == 5, f"compaction left {vs}, next={nxt}"
    return ivf_index_topk(
        spark, root, e.filter(F.col("vec_id") < 10), cents,
        k=5, n_probe=_X117_PROBE,
    ).localCheckpoint(eager=True)


# ---------------------------------------------------------------------------
# x139 — BULK kNN graph: every corpus vector's IVF top-k, on the
# non-broadcast cell join (the corpus-sized-query serving path)
# ---------------------------------------------------------------------------

_X139_K = 3


@register(
    "x139_bulk_knn_graph",
    oracle=_ann_ivf_oracle(k=_X139_K, query_pred="TRUE"),
    tags=("similarity", "ann", "ivf", "knn-graph", "scale"),
)
def x139_bulk_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BULK kNN GRAPH — every corpus vector's IVF top-{_X139_K}, the
    edge list behind SemDeDup-style clustering, related-document packing
    (x107), and graph-based curation at corpus scale.  The query side IS
    the corpus, so this gate certifies the NON-broadcast serving path the
    round-13 advice asked to expose (``ivf_topk(broadcast_queries=
    False)``): both sides shuffle on ``cell`` — the only plan that
    survives a corpus-sized query table, where the default
    driver-broadcast contract would OOM.  Same probe/score/rank
    semantics as x15 (the oracle is x15's replay with the probe
    predicate opened to every vector), so the graph is certified
    edge-for-edge.

    Scale shape: one broadcast-centroid argmax per side, ONE cell-keyed
    shuffle join (candidates per query ~ corpus * n_probe / n_cells),
    per-query top-k window.  At 100 TB the cell join is exactly the
    co-partitioned layout x135's cell-sorted compaction feeds."""
    e = table(spark, sf_dir, "embeddings")
    return S.ivf_topk(
        e, e, "vec_id", "embedding",
        k=_X139_K, n_cells=16, n_probe=4, centroid_stride=31,
        broadcast_queries=False,
    )


# ---------------------------------------------------------------------------
# x142 — mutual-kNN graph dedup/clustering: the consumer of x139's edge list
# (connected components over mutual edges via the x26 star machinery)
# ---------------------------------------------------------------------------


def _x142_label_ctes(k: int = _X139_K) -> str:
    """The mutual-kNN component chain (x139's certified edge replay ->
    mutual pairs -> transitive closure -> per-node labels) WITHOUT the
    leading WITH RECURSIVE or the final select — shared by the x142
    summary oracle and x146's keep-best rewrite oracle."""
    return f"""{_ann_ivf_ctes(k=k, query_pred="TRUE")},
    fwd AS MATERIALIZED (SELECT query_id, neighbor_id FROM knnf),
    mpairs AS (
      SELECT a.query_id AS id_a, a.neighbor_id AS id_b
      FROM fwd a JOIN fwd b
        ON a.query_id = b.neighbor_id AND a.neighbor_id = b.query_id
      WHERE a.query_id < a.neighbor_id),
    edges AS (SELECT id_a AS u, id_b AS v FROM mpairs
              UNION SELECT id_b, id_a FROM mpairs),
    reach AS (SELECT u, u AS v FROM (SELECT DISTINCT u FROM edges)
              UNION
              SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
    labels AS (SELECT u AS node, MIN(v) AS cluster FROM reach GROUP BY u)"""


def _x142_oracle(k: int = _X139_K) -> str:
    return f"""
    WITH RECURSIVE {_x142_label_ctes(k)}
    SELECT cluster,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           MIN(node) AS canonical_id,
           CAST(COUNT(*) - 1 AS BIGINT) AS removed
    FROM labels GROUP BY cluster
    """


@register(
    "x142_mutual_knn_components",
    oracle=_x142_oracle(),
    tags=("similarity", "knn-graph", "dedup", "clustering",
          "connected-components", "iterative"),
)
def x142_mutual_knn_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MUTUAL-kNN graph clustering — the consumer of x139's bulk kNN edge
    list (round-14 verdict #3): an undirected edge (a, b) exists iff b is
    in a's IVF top-{_X139_K} AND a is in b's (the mutuality filter that
    makes kNN graphs symmetric and prunes hub edges — the standard
    SemDeDup-alternative construction), then connected components over
    those edges via the x26 large-star/small-star machinery give one
    summary row per cluster (n_members, keep-first canonical, removed).
    Where x37's semantic dedup approximates neighborhoods with IVF cells,
    this clusters on certified TRUE neighbors.

    Scale shape: the graph build is x139's non-broadcast cell join (both
    sides shuffle on cell — the corpus-sized-query plan), the edge list
    (corpus x {_X139_K} rows, ids only) is materialized once and
    self-joined on the two id columns (equi-join, never text or vectors),
    and components run in O(log n) star-contraction rounds.  At 100 TB
    the edge list persists as parquet between the build and the join —
    here localCheckpoint stands in (bounded: n x k id rows).  The oracle
    embeds x139's certified replay chain as its input CTE and closes the
    components with the x26 transitive-closure recursion — the whole
    consumer certified end to end, edges included."""
    from hiveka_spark.operators.clustering import dedup_clusters

    e = table(spark, sf_dir, "embeddings")
    mutual = S.mutual_knn_pairs(
        e, "vec_id", "embedding",
        k=_X139_K, n_cells=16, n_probe=4, centroid_stride=31,
    )
    return dedup_clusters(mutual, method="star").select(
        "cluster",
        F.col("n_members").cast("bigint").alias("n_members"),
        "canonical_id",
        F.col("removed").cast("bigint").alias("removed"),
    )


# ---------------------------------------------------------------------------
# x146 — graph-dedup TERMINAL consumer: keep-best removal over mutual-kNN
# components, emitting the deduped corpus with md5-certified output text
# ---------------------------------------------------------------------------


def _x146_oracle(k: int = _X139_K) -> str:
    from hiveka_spark.queries.pipeline_ext import _quality_cte

    return f"""
    WITH RECURSIVE {_x142_label_ctes(k)},
    {_quality_cte()},
    m AS (SELECT l.node AS doc_id, l.cluster, q.quality_score
          FROM labels l JOIN quality q ON q.doc_id = l.node),
    r AS MATERIALIZED (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster
                                   ORDER BY quality_score DESC, doc_id) AS rnk
      FROM m),
    clus AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members
             FROM r GROUP BY cluster)
    SELECT d.doc_id,
           CAST(COALESCE(r.cluster, -1) AS BIGINT) AS cluster,
           CAST(COALESCE(c.n_members, 1) AS BIGINT) AS n_members,
           CAST(COALESCE(c.n_members, 1) - 1 AS BIGINT) AS n_removed,
           md5(d.text) AS out_md5
    FROM documents d
    LEFT JOIN r ON r.doc_id = d.doc_id
    LEFT JOIN clus c ON c.cluster = r.cluster
    WHERE r.doc_id IS NULL OR r.rnk = 1
    """


@register(
    "x146_graph_dedup_rewrite",
    oracle=_x146_oracle(),
    tags=("similarity", "knn-graph", "dedup", "quality", "rewrite",
          "training-prep", "certification"),
)
def x146_graph_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRAPH-DEDUP TERMINAL CONSUMER (round-15 verdict #2) — x142 emits
    mutual-kNN clusters but nothing rewrote the corpus from them; this
    gate closes the loop: connected components over certified TRUE
    mutual neighbors (:func:`~hiveka_spark.operators.similarity.
    mutual_knn_pairs` — x139's edge replay, hub edges pruned by the
    mutuality filter), then x33's keep-best resolution policy (highest
    x08 quality score per cluster, ties to the smaller doc id — real
    duplicates differ in truncation/boilerplate, so min-id keep throws
    away the best copy), emitting the SURVIVING corpus with x97's
    discipline: one row per kept document carrying its cluster audit
    (cluster, n_members, n_removed) and the md5 of the text a training
    pipeline would actually feed downstream.  Where x37's SemDeDup
    removes by cell-approximate neighborhoods, this removes only on
    certified mutual top-k edges (the removal-count comparison is pinned
    on a planted-cluster fixture in tests/test_graph_dedup.py).

    Scale shape: the edge build is x139's non-broadcast cell join; the
    mutual filter and components run on n x k id-only rows; the quality
    join touches the label set (duplicate-volume-sized) against the
    corpus-sized score projection; the final anti-join/left-join pair is
    id-keyed.  No text ever shuffles except the one md5 projection.  The
    oracle embeds x142's full chain (which embeds x139's) + x33's
    quality CTE and closes with the same keep-best window."""
    from pyspark.sql import Window

    from hiveka_spark.operators.clustering import connected_components_star
    from hiveka_spark.operators.text import with_quality

    e = table(spark, sf_dir, "embeddings")
    mutual = S.mutual_knn_pairs(
        e, "vec_id", "embedding",
        k=_X139_K, n_cells=16, n_probe=4, centroid_stride=31,
    )
    # star contraction, not min-label propagation: mutual-kNN graphs form
    # long chains (O(diameter) propagation rounds would both miss the
    # fixpoint cap and multiply the shuffle count at 100 TB)
    cc, _rounds = connected_components_star(mutual)  # (node, cluster)
    d = table(spark, sf_dir, "documents")
    q = with_quality(d).select("doc_id", "quality_score")
    m = cc.join(q, cc["node"] == q["doc_id"]).select(
        "doc_id", "cluster", "quality_score"
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col("quality_score").desc(), "doc_id"
    )
    r = m.withColumn("rnk", F.row_number().over(w)).localCheckpoint(
        eager=True
    )  # duplicate-volume-sized; referenced by keepers, removals, and sizes
    clus = r.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )
    keepers = (
        r.filter(F.col("rnk") == 1)
        .join(clus, "cluster")
        .select("doc_id", "cluster", "n_members")
    )
    removed = r.filter(F.col("rnk") > 1).select("doc_id")
    return (
        d.join(removed, "doc_id", "left_anti")
        .join(keepers, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster", F.lit(-1)).cast("bigint").alias("cluster"),
            F.coalesce("n_members", F.lit(1)).cast("bigint")
            .alias("n_members"),
            (F.coalesce("n_members", F.lit(1)) - 1).cast("bigint")
            .alias("n_removed"),
            F.md5(F.col("text")).alias("out_md5"),
        )
    )
