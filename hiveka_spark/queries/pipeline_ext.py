"""SURVEY.md §2C (continued) — higher-level training-data-pipeline entries.

Round-2 widening beyond the first extension batch (extensions.py): the
composite curation steps a production corpus pipeline runs AFTER the
primitive dedup/quality passes —

- x31 boilerplate removal: cross-document repeated-paragraph (word-chunk)
  detection + per-document text reconstruction (CCNet-style line dedup,
  re-expressed over fixed word windows because the fixture text is single
  line).
- x32 URL canonicalization + dedup: scheme/www/tracking-params/fragment
  stripping, then keep-min-id per canonical URL (Common-Crawl-style refetch
  dedup).
- x34 source mixing to a token budget: compute per-source deterministic
  keep-rates from target mixture weights and a global token budget, then
  sample with the engine-portable md5 predicate (the distributed version of
  the "data mixture" step in LLM corpus construction).

All arithmetic is engine-exact (integer token counts, floor-quantized
rationals, md5-derived sampling), so every entry carries a full DuckDB
oracle.  No reference analog (the reference is a Kafka scan layer); designed
Spark-first.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hiveka_spark.catalog import table
from hiveka_spark.operators.sampling import sample_bucket, sample_bucket_sql
from hiveka_spark.operators.text import tokens
from hiveka_spark.queries import register

# ---------------------------------------------------------------------------
# x31 — boilerplate (repeated word-chunk) removal
# ---------------------------------------------------------------------------

_CHUNK = 8  # words per pseudo-paragraph


@register(
    "x31_boilerplate_removal",
    oracle=f"""
    WITH w AS (SELECT doc_id, list_filter(string_split(LOWER(text), ' '), x -> x <> '') AS ws
               FROM documents),
    c AS (SELECT doc_id, i,
                 array_to_string(ws[(i-1)*{_CHUNK}+1:(i-1)*{_CHUNK}+{_CHUNK}], ' ') AS chunk
          FROM (SELECT doc_id, ws,
                       UNNEST(generate_series(1, CAST(FLOOR(LEN(ws) / {_CHUNK}.0) AS BIGINT))) AS i
                FROM w)),
    f AS (SELECT chunk, COUNT(DISTINCT doc_id) AS n_docs FROM c GROUP BY 1),
    j AS (SELECT c.doc_id, c.i, c.chunk, f.n_docs FROM c JOIN f USING (chunk))
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
           COALESCE(string_agg(CASE WHEN n_docs < 2 THEN chunk END, ' ' ORDER BY i), '')
             AS cleaned_text
    FROM j GROUP BY doc_id
    """,
    tags=("text", "dedup", "boilerplate"),
)
def x31_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate removal: split each document into fixed
    8-word chunks (pseudo-paragraphs — the fixture text has no newlines), mark
    every chunk that occurs in >= 2 distinct documents as boilerplate, and
    rebuild each document from its non-boilerplate chunks in order.

    Scale shape: chunking is a narrow per-row explode; the only shuffles are
    the chunk-frequency aggregate and the chunk-keyed join back — both keyed
    on the chunk text (at 100 TB you'd key on xxhash64(chunk) to cut shuffle
    bytes; the oracle keeps the string key for engine-exactness).  The
    reconstruction is a per-document sort of an in-memory array (array_sort
    over (position, chunk) structs), never a global sort.  Documents shorter
    than one full chunk drop out in both engines (no partial-chunk rows).
    """
    d = table(spark, sf_dir, "documents")
    ws = tokens("text")
    n_full = F.floor(F.size(ws) / F.lit(float(_CHUNK))).cast("int")
    seq = F.when(n_full >= 1, F.sequence(F.lit(1), n_full)).otherwise(
        F.array().cast("array<int>")
    )
    c = d.select(
        "doc_id", ws.alias("ws"), F.explode(seq).alias("i")
    ).select(
        "doc_id",
        "i",
        F.array_join(
            F.slice("ws", (F.col("i") - 1) * _CHUNK + 1, F.lit(_CHUNK)), " "
        ).alias("chunk"),
    )
    freq = c.groupBy("chunk").agg(F.count_distinct("doc_id").alias("n_docs"))
    j = c.join(freq, "chunk")
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.sum((F.col("n_docs") >= 2).cast("bigint")).alias("n_boiler"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("n_docs") < 2, F.struct("i", "chunk"))
                    )
                ),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("cleaned_text"),
    )


# ---------------------------------------------------------------------------
# x32 — URL canonicalization + dedup
# ---------------------------------------------------------------------------


@register(
    "x32_url_dedup",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'example.com/' || source || '/page' || CAST(doc_id % 40 AS VARCHAR) AS base,
             doc_id % 3 AS v
      FROM documents),
    raw AS (
      SELECT doc_id,
             CASE v WHEN 0 THEN 'https://' || base
                    WHEN 1 THEN 'HTTPS://WWW.' || base || '/'
                    ELSE 'http://' || base || '?utm_source=feed&utm_id=9#frag'
             END AS url
      FROM u),
    canon AS (
      SELECT doc_id, url,
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(url, '^[A-Za-z]+://', ''),
                   '^[Ww][Ww][Ww]\\.', ''),
                 '[?#].*', ''),
               '/$', '') AS canonical_url
      FROM raw)
    SELECT canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT url) AS BIGINT) AS n_variants,
           MIN(doc_id) AS keep_doc_id
    FROM canon GROUP BY canonical_url
    """,
    tags=("dedup", "url", "canonicalization"),
)
def x32_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + dedup (Common-Crawl-style refetch collapse).

    The fixture has no URL column, so each document gets a deterministic
    synthetic URL (both engines construct the same string) in one of three
    wire variants: plain https, upper-scheme + WWW + trailing slash, and http
    with tracking params + fragment.  The canonicalizer strips scheme, leading
    www., query/fragment (the synthetic query is all tracking params), and the
    trailing slash — then groups by canonical URL keeping the minimum doc_id.

    Pure codegen'd regexp chain + ONE hash aggregate on the canonical URL —
    zero joins, the same plan shape at any scale.  Patterns are chosen to
    parse identically under Java regex and RE2 (no lookaround, no (?i)).
    """
    d = table(spark, sf_dir, "documents")
    base = F.concat(
        F.lit("example.com/"),
        F.col("source"),
        F.lit("/page"),
        (F.col("doc_id") % 40).cast("string"),
    )
    v = F.col("doc_id") % 3
    raw = (
        F.when(v == 0, F.concat(F.lit("https://"), base))
        .when(v == 1, F.concat(F.lit("HTTPS://WWW."), base, F.lit("/")))
        .otherwise(
            F.concat(F.lit("http://"), base, F.lit("?utm_source=feed&utm_id=9#frag"))
        )
    )
    canon = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(raw, "^[A-Za-z]+://", ""), r"^[Ww][Ww][Ww]\.", ""
            ),
            r"[?#].*",
            "",
        ),
        "/$",
        "",
    )
    return (
        d.select("doc_id", raw.alias("url"), canon.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count_distinct("url").cast("bigint").alias("n_variants"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )


# ---------------------------------------------------------------------------
# x34 — source mixing to a token budget
# ---------------------------------------------------------------------------

# Target mixture weights (percent of the sampled budget) for the weighted
# sources; sources absent from the map get rate 0 (dropped from the mix).
_MIX_WEIGHTS: dict[str, int] = {"src0": 40, "src1": 30, "src2": 20, "src3": 10}
_BUDGET_PCT = 30  # sampled corpus target size: 30% of total corpus tokens


def _mix_weight_sql() -> str:
    whens = " ".join(f"WHEN '{k}' THEN {v}" for k, v in _MIX_WEIGHTS.items())
    return f"(CASE source {whens} ELSE 0 END)"


@register(
    "x34_source_mixing",
    oracle=f"""
    WITH d AS (SELECT doc_id, source,
                      LEN(list_filter(string_split(LOWER(text), ' '), x -> x <> ''))
                        AS n_tok
               FROM documents),
    per_src AS (SELECT source, SUM(n_tok) AS src_tokens FROM d GROUP BY source),
    grand AS (SELECT SUM(n_tok) AS total_tokens FROM d),
    rates AS (
      SELECT source, src_tokens,
             CAST(LEAST(100, FLOOR(
               FLOOR(total_tokens * {_BUDGET_PCT} * {_mix_weight_sql()} / 10000.0)
               * 100.0 / src_tokens)) AS BIGINT) AS rate_pct
      FROM per_src, grand),
    kept AS (
      SELECT d.source, COUNT(*) AS n_kept, SUM(d.n_tok) AS tokens_kept
      FROM d JOIN rates USING (source)
      WHERE {sample_bucket_sql("CAST(doc_id AS VARCHAR)")} < rate_pct
      GROUP BY d.source)
    SELECT r.source,
           CAST(r.src_tokens AS BIGINT) AS src_tokens,
           r.rate_pct,
           CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(COALESCE(k.tokens_kept, 0) AS BIGINT) AS tokens_kept
    FROM rates r LEFT JOIN kept k USING (source)
    """,
    tags=("sampling", "mixing", "tokens"),
)
def x34_source_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source mixing to a global token budget: given target mixture weights
    per source (percent of the sampled budget) and a corpus-level budget
    ({_BUDGET_PCT}% of total tokens), derive a deterministic per-source
    keep-rate and sample documents with the engine-portable md5 bucket
    predicate — the "data mixture" step of LLM corpus construction, with
    every decision a pure function of (weights, corpus token counts, doc_id).

    budget_s  = floor(total_tokens * budget_pct * weight_s / 10000)
    rate_s    = min(100, floor(budget_s * 100 / src_tokens))   [percent]
    keep(doc) = md5_bucket(doc_id) < rate_s

    Scale shape: one per-source token aggregate (map-side combined), a
    1-row grand total broadcast into the 20-row rate table, the rate table
    broadcast into the corpus-sized filter (zero shuffle on the big side),
    and a final per-source aggregate.  Unweighted sources report rate 0 /
    n_kept 0 instead of vanishing, so the mixing report is total.
    """
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(tokens("text")).cast("bigint").alias("n_tok")
    )
    per_src = d.groupBy("source").agg(F.sum("n_tok").alias("src_tokens"))
    grand = d.agg(F.sum("n_tok").alias("total_tokens"))
    weight = F.coalesce(
        F.create_map(*[F.lit(x) for kv in _MIX_WEIGHTS.items() for x in kv])[
            F.col("source")
        ],
        F.lit(0),
    )
    rates = (
        per_src.crossJoin(F.broadcast(grand))
        .withColumn(
            "budget",
            F.floor(F.col("total_tokens") * _BUDGET_PCT * weight / 10000.0),
        )
        .withColumn(
            "rate_pct",
            F.least(
                F.lit(100).cast("bigint"),
                F.floor(F.col("budget") * 100.0 / F.col("src_tokens")),
            ),
        )
        .select("source", "src_tokens", "rate_pct")
    )
    kept = (
        d.join(F.broadcast(rates), "source")
        .filter(sample_bucket("doc_id") < F.col("rate_pct"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.sum("n_tok").alias("tokens_kept"),
        )
    )
    return (
        rates.join(kept, "source", "left")
        .select(
            "source",
            "src_tokens",
            "rate_pct",
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            F.coalesce("tokens_kept", F.lit(0)).cast("bigint").alias("tokens_kept"),
        )
    )


# ---------------------------------------------------------------------------
# x33 — duplicate-cluster resolution keeping the best-quality member
# ---------------------------------------------------------------------------

def _quality_cte(src: str = "documents") -> str:
    """DuckDB CTEs computing (doc_id, quality_score) — the x08 formula —
    over ``src`` (any (doc_id, text) relation; x148 hands in its
    augmented media corpus)."""
    from hiveka_spark.operators.text import EN_STOPWORDS

    stop = "[" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + "]"
    return f"""
    qt AS (SELECT doc_id,
                  LENGTH(text) AS len_text,
                  list_filter(string_split(LOWER(text), ' '), x -> x <> '') AS toks,
                  LENGTH(regexp_replace(LOWER(text), '[^a-z0-9 ]', '', 'g')) AS n_alnum_space
           FROM {src}),
    qf AS (SELECT doc_id,
                  LEN(toks) AS n_tok,
                  LEN(list_filter(toks, w -> list_contains({stop}, w))) AS n_stop,
                  (len_text - n_alnum_space) * 1.0 / GREATEST(len_text, 1) AS punct_r
           FROM qt),
    quality AS (SELECT doc_id,
                       CAST(FLOOR((LEAST(n_tok / 100.0, 1.0) * 0.5 + (1.0 - punct_r) * 0.3
                                   + LEAST(n_stop * 1.0 / GREATEST(n_tok, 1) * 5.0, 1.0) * 0.2)
                                  * 10000.0) AS BIGINT) / 10000.0 AS quality_score
                FROM qf)
    """


def _x33_oracle() -> str:
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
    {_quality_cte()},
    m AS (SELECT l.node AS doc_id, l.cluster, q.quality_score
          FROM labels l JOIN quality q ON q.doc_id = l.node),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster
                                       ORDER BY quality_score DESC, doc_id) AS rnk
          FROM m)
    SELECT cluster,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           MIN(CASE WHEN rnk = 1 THEN doc_id END) AS keep_doc_id,
           MIN(CASE WHEN rnk = 1 THEN quality_score END) AS keep_quality
    FROM r GROUP BY cluster
    """


@register(
    "x33_cluster_keep_best",
    oracle=_x33_oracle(),
    tags=("dedup", "clustering", "quality"),
)
def x33_cluster_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster resolution with a QUALITY tiebreak: near-dup pairs
    (x02's 3-gram Jaccard >= 0.8 pipeline, plan-cached) -> connected
    components -> keep the highest-quality member per cluster (x08's score,
    ties to the smaller doc_id) instead of the naive min-id — what a real
    curation pipeline does, since duplicates often differ in truncation or
    boilerplate.

    Scale shape: the component labels live on the (tiny) near-dup pair graph,
    so the quality join broadcasts the label set against the corpus-sized
    score projection; the per-cluster argmax is a window over cluster — state
    proportional to duplicate volume, never corpus size."""
    from pyspark.sql import Window

    from hiveka_spark.operators import dedup as D
    from hiveka_spark.operators.clustering import connected_components
    from hiveka_spark.operators.text import with_quality

    d = table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(d, "doc_id", "text", k=3, threshold=0.8)
    cc = connected_components(pairs)
    q = with_quality(d).select("doc_id", "quality_score")
    m = cc.join(q, cc["node"] == q["doc_id"]).select("doc_id", "cluster", "quality_score")
    w = Window.partitionBy("cluster").orderBy(F.col("quality_score").desc(), "doc_id")
    r = m.withColumn("rnk", F.row_number().over(w))
    return r.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.min(F.when(F.col("rnk") == 1, F.col("doc_id"))).alias("keep_doc_id"),
        F.min(F.when(F.col("rnk") == 1, F.col("quality_score"))).alias("keep_quality"),
    )


# ---------------------------------------------------------------------------
# x35 — BM25 keyword search
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "hash", "window")
_BM25_K = 20


def _bm25_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return f"""
    WITH d AS (SELECT doc_id, list_filter(string_split(LOWER(text), ' '), x -> x <> '') AS ws
               FROM documents),
    dl AS (SELECT doc_id, LEN(ws) AS dl, ws FROM d),
    stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_tok FROM dl),
    t AS (SELECT doc_id, dl, UNNEST(ws) AS term FROM dl),
    tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf
           FROM t WHERE term IN ({terms}) GROUP BY 1, 2, 3),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    sc AS (SELECT doc_id,
                  CAST(FLOOR(((n_docs - df + 0.5) / (df + 0.5))
                             * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / (total_tok * 1.0 / n_docs)))))
                             * 1000000.0) AS BIGINT) AS micro
          FROM tf JOIN dfreq USING (term) CROSS JOIN stats),
    agg AS (SELECT doc_id, SUM(micro) AS score_micro FROM sc GROUP BY 1)
    SELECT doc_id, CAST(score_micro AS BIGINT) AS score_micro, CAST(rnk AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY score_micro DESC, doc_id) AS rnk FROM agg)
    WHERE rnk <= {_BM25_K}
    """


@register("x35_bm25_search", oracle=_bm25_oracle(), tags=("search", "bm25", "text"))
def x35_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword search: top-{k} documents for a fixed multi-term query,
    k1=1.2, b=0.75, with a RATIONAL idf = (N - df + 0.5)/(df + 0.5) instead of
    the usual log(...) — ln() is not bit-identical across engines while +-*/
    are, so the oracle hash-matches exactly.  Per-(doc,term) scores are
    quantized to integer micro-units BEFORE the per-doc sum, making the
    aggregation exact bigint arithmetic — associativity-proof under any
    partitioning (the same trick the dedup oracles use).

    Scale shape: the term filter prunes the exploded postings to query terms
    at the scan (predicate pushdown on the exploded side), df and the corpus
    stats are tiny broadcasts, and the final top-k is TakeOrdered — no global
    sort.  This is distributed BM25 without an inverted index; at 100 TB
    you'd persist the (term, doc, tf) postings table bucketed by term and
    reuse it across queries, with the identical scoring plan."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("ws")
    ).select("doc_id", F.size("ws").cast("bigint").alias("dl"), "ws")
    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_tok")
    )
    t = d.select("doc_id", "dl", F.explode("ws").alias("term")).filter(
        F.col("term").isin(*_BM25_TERMS)
    )
    tf = t.groupBy("doc_id", "dl", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    sc = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "micro",
            F.floor(
                ((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * (
                    (F.col("tf") * 2.2)
                    / (
                        F.col("tf")
                        + 1.2
                        * (
                            0.25
                            + 0.75
                            * (F.col("dl") / (F.col("total_tok") * 1.0 / F.col("n_docs")))
                        )
                    )
                )
                * 1000000.0
            ).cast("bigint"),
        )
    )
    agg = sc.groupBy("doc_id").agg(F.sum("micro").cast("bigint").alias("score_micro"))
    w = Window.orderBy(F.col("score_micro").desc(), "doc_id")
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= _BM25_K)
        .select("doc_id", "score_micro", "rank")
    )


# ---------------------------------------------------------------------------
# x36 — model-based quality filter (fixed-weight linear classifier)
# ---------------------------------------------------------------------------

_QC_THRESHOLD = 0.45


def _x36_oracle() -> str:
    return f"""
    WITH {_quality_cte()},
    feats AS (SELECT q.doc_id, q.quality_score,
                     CAST(FLOOR((LEN(qt.toks) * 1.0) * 10000.0) AS BIGINT) / 10000.0 AS n_tok
              FROM quality q JOIN qt USING (doc_id)),
    logits AS (SELECT doc_id,
                      CAST(FLOOR((-0.2 + 1.2 * quality_score
                                  + 0.1 * LEAST(n_tok / 100.0, 1.0)) * 10000.0) AS BIGINT)
                        / 10000.0 AS logit
               FROM feats)
    SELECT doc_id, logit,
           CAST(CASE WHEN logit >= {_QC_THRESHOLD} THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM logits
    """


@register("x36_quality_classifier", oracle=_x36_oracle(), tags=("quality", "classifier", "text"))
def x36_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering: a fixed-weight linear classifier over
    the x08 feature vector (the deployable stand-in for a fastText/logreg
    quality model — same plan shape, weights frozen for reproducibility).
    logit = -0.2 + 1.2*quality_score + 0.1*min(n_tokens/100, 1), keep when
    logit >= {_QC_THRESHOLD}.  No sigmoid: exp() is not bit-identical across
    engines and a monotone transform never changes the decision boundary.
    Pure per-row JVM expressions — zero shuffles, scales with input bytes."""
    from hiveka_spark.operators.text import with_quality

    d = table(spark, sf_dir, "documents")
    q = with_quality(d)
    ntok4 = F.floor(F.col("n_tokens") * 1.0 * 10000.0) / 10000.0
    logit = (
        F.floor(
            (
                -0.2
                + 1.2 * F.col("quality_score")
                + 0.1 * F.least(ntok4 / 100.0, F.lit(1.0))
            )
            * 10000.0
        )
        / 10000.0
    )
    return q.select(
        "doc_id",
        logit.alias("logit"),
        F.when(logit >= _QC_THRESHOLD, 1).otherwise(0).cast("bigint").alias("keep"),
    )


# ---------------------------------------------------------------------------
# x37 — SemDeDup (semantic deduplication via centroid cells)
# ---------------------------------------------------------------------------

_SEM_CELLS = 16
_SEM_THRESHOLD = 0.3
# Explicit centroid stride (ids dense from 0 at every SF) — a literal, not
# COUNT(*)-derived: centroid choice must not cost a full corpus pass
# (VERDICT r4 #4; offline-trained centroids are the production path).
_SEM_STRIDE = 31


def _x37_oracle() -> str:
    return f"""
    WITH q AS (SELECT vec_id,
                 list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
          FROM embeddings),
    nn AS (SELECT vec_id, list_transform(qv, x -> CAST(x AS DOUBLE)) AS qvd,
                  list_dot_product(list_transform(qv, x -> CAST(x AS DOUBLE)),
                                   list_transform(qv, x -> CAST(x AS DOUBLE))) AS n2
           FROM q),
    cents AS (SELECT CAST(vec_id / {_SEM_STRIDE} AS BIGINT) AS cell, qvd AS cvd, n2 AS cn2
              FROM nn WHERE vec_id % {_SEM_STRIDE} = 0 AND vec_id / {_SEM_STRIDE} < {_SEM_CELLS}),
    assign AS (SELECT vec_id, qvd, n2, cell
               FROM (SELECT nn.vec_id, nn.qvd, nn.n2, c.cell,
                            ROW_NUMBER() OVER (PARTITION BY nn.vec_id ORDER BY c_cos DESC, c.cell)
                              AS c_rank
                     FROM (SELECT nn.vec_id, nn.qvd, nn.n2, c.cell,
                                  list_dot_product(nn.qvd, c.cvd) / (sqrt(nn.n2) * sqrt(c.cn2))
                                    AS c_cos
                           FROM nn CROSS JOIN cents c) AS s(vec_id, qvd, n2, cell, c_cos),
                          nn, cents c
                     WHERE nn.vec_id = s.vec_id AND c.cell = s.cell)
               WHERE c_rank = 1),
    pairs AS (SELECT a.cell, a.vec_id AS id_a, b.vec_id AS id_b,
                     CAST(FLOOR((list_dot_product(a.qvd, b.qvd) / (sqrt(a.n2) * sqrt(b.n2)))
                                * 10000.0) AS BIGINT) / 10000.0 AS cosine
              FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id),
    hits AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY id_b ORDER BY id_a) AS rn
             FROM pairs WHERE cosine >= {_SEM_THRESHOLD})
    SELECT id_b AS vec_id, cell, id_a AS kept_by, cosine FROM hits WHERE rn = 1
    """


@register("x37_semdedup", oracle=_x37_oracle(), tags=("dedup", "semantic", "embeddings"))
def x37_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): centroid-cell clustering of the
    embedding corpus, then keep-first semantic dedup WITHIN each cell —
    drop every vector whose cosine to a lower-id cell-mate is >=
    {_SEM_THRESHOLD}.  Output is the dropped-row audit trail (vec_id, cell,
    kept_by, cosine).  See operators/similarity.py:semantic_dedup for the
    cell-bounded join scale argument."""
    from hiveka_spark.operators.similarity import semantic_dedup

    e = table(spark, sf_dir, "embeddings")
    return semantic_dedup(
        e, "vec_id", "embedding", n_cells=_SEM_CELLS, threshold=_SEM_THRESHOLD,
        centroid_stride=_SEM_STRIDE,
    )


# ---------------------------------------------------------------------------
# x38 — token-rarity (surprisal-proxy) document scoring
# ---------------------------------------------------------------------------


@register(
    "x38_token_rarity",
    oracle="""
    WITH t AS (SELECT doc_id, UNNEST(list_filter(string_split(LOWER(text), ' '), x -> x <> ''))
                 AS term
               FROM documents),
    vocab AS (SELECT term, COUNT(*) AS tf FROM t GROUP BY 1),
    tot AS (SELECT SUM(tf) AS total FROM vocab),
    s AS (SELECT t.doc_id,
                 CAST(FLOOR(1000000.0 * total / tf) AS BIGINT) AS micro
          FROM t JOIN vocab USING (term) CROSS JOIN tot)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(FLOOR(SUM(micro) * 1.0 / COUNT(*)) AS BIGINT) AS rarity_micro
    FROM s GROUP BY doc_id
    """,
    tags=("text", "rarity", "scoring"),
)
def x38_token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-rarity scoring — the log-free stand-in for unigram-LM surprisal
    used to surface rare/novel documents in curation: each token occurrence
    scores inverse corpus frequency (total/tf) in integer micro-units, the
    document score is the per-token average.  Inverse frequency is a monotone
    transform of -log p, so rankings match an LM-perplexity filter while the
    arithmetic stays engine-exact (micro-unit floors before the bigint sum —
    associativity-proof, same discipline as x35).

    Scale shape: ONE vocabulary aggregate (map-side combined; vocabulary is
    sublinear in corpus size), a term-keyed join of postings to vocab (hot
    terms mitigated by the vocab side being vocabulary-sized), the 1-row
    total broadcast, then a per-doc aggregate."""
    d = table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.explode(tokens("text")).alias("term"))
    vocab = t.groupBy("term").agg(F.count(F.lit(1)).alias("tf"))
    tot = vocab.agg(F.sum("tf").alias("total"))
    s = (
        t.join(vocab, "term")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "micro",
            F.floor(1000000.0 * F.col("total") / F.col("tf")).cast("bigint"),
        )
    )
    return s.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.floor(F.sum("micro") * 1.0 / F.count(F.lit(1))).cast("bigint").alias(
            "rarity_micro"
        ),
    )


# ---------------------------------------------------------------------------
# x39 — vocabulary coverage curve
# ---------------------------------------------------------------------------

_VOCAB_TOP = 50


@register(
    "x39_vocab_coverage",
    oracle=f"""
    WITH t AS (SELECT UNNEST(list_filter(string_split(LOWER(text), ' '), x -> x <> '')) AS term
               FROM documents),
    vocab AS (SELECT term, COUNT(*) AS tf FROM t GROUP BY 1),
    tot AS (SELECT SUM(tf) AS total FROM vocab),
    top AS (SELECT term, tf, ROW_NUMBER() OVER (ORDER BY tf DESC, term) AS rnk
            FROM vocab QUALIFY rnk <= {_VOCAB_TOP}),
    c AS (SELECT term, tf, rnk,
                 SUM(tf) OVER (ORDER BY rnk ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_tf
          FROM top)
    SELECT term, CAST(tf AS BIGINT) AS tf, CAST(rnk AS BIGINT) AS rnk,
           CAST(FLOOR(cum_tf * 10000.0 / total) AS BIGINT) / 10000.0 AS coverage
    FROM c CROSS JOIN tot
    """,
    tags=("text", "vocabulary", "tokenizer"),
)
def x39_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: the top-{k} corpus tokens by frequency with
    the cumulative fraction of all token occurrences they cover — the
    tokenizer-design / vocab-truncation diagnostic (what % of the stream the
    top-N vocab explains).

    Scale shape: one vocabulary aggregate, then TakeOrdered top-{k} — the
    running-sum window runs over ONLY those {k} rows (never the full
    vocabulary) with the grand total as a 1-row broadcast."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    t = d.select(F.explode(tokens("text")).alias("term"))
    vocab = t.groupBy("term").agg(F.count(F.lit(1)).alias("tf"))
    tot = vocab.agg(F.sum("tf").alias("total"))
    w_rank = Window.orderBy(F.col("tf").desc(), "term")
    top = (
        vocab.withColumn("rnk", F.row_number().over(w_rank).cast("bigint"))
        .filter(F.col("rnk") <= _VOCAB_TOP)
    )
    w_cum = Window.orderBy("rnk").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        top.withColumn("cum_tf", F.sum("tf").over(w_cum))
        .crossJoin(F.broadcast(tot))
        .select(
            "term",
            "tf",
            "rnk",
            (F.floor(F.col("cum_tf") * 10000.0 / F.col("total")) / 10000.0).alias(
                "coverage"
            ),
        )
    )


# ---------------------------------------------------------------------------
# x45 — Gopher/C4-style composite rule filter
# ---------------------------------------------------------------------------


def _x45_oracle() -> str:
    from hiveka_spark.operators.text import EN_STOPWORDS

    stop_sql = "[" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + "]"
    return f"""
    WITH t AS (
      SELECT doc_id, list_filter(string_split(LOWER(text), ' '), w -> w <> '') AS toks
      FROM documents),
    f AS (
      SELECT doc_id,
             CAST(LEN(toks) AS BIGINT) AS n_words,
             CAST(FLOOR(list_sum(list_transform(toks, w -> LENGTH(w))) * 1.0
                        / GREATEST(LEN(toks), 1) * 10000.0) AS BIGINT) / 10000.0
               AS mean_word_len,
             CAST(FLOOR(LEN(list_filter(toks, w -> regexp_matches(w, '[a-z]'))) * 1.0
                        / GREATEST(LEN(toks), 1) * 10000.0) AS BIGINT) / 10000.0
               AS alpha_frac,
             CAST(LEN(list_intersect(list_distinct(toks), {stop_sql})) AS BIGINT)
               AS n_stop_distinct
      FROM t)
    SELECT doc_id, n_words, mean_word_len, alpha_frac, n_stop_distinct,
           CAST(CASE WHEN n_words BETWEEN 15 AND 5000 THEN 1 ELSE 0 END AS BIGINT) AS wc_ok,
           CAST(CASE WHEN mean_word_len BETWEEN 3.0 AND 10.0 THEN 1 ELSE 0 END AS BIGINT) AS len_ok,
           CAST(CASE WHEN alpha_frac >= 0.7 THEN 1 ELSE 0 END AS BIGINT) AS alpha_ok,
           CAST(CASE WHEN n_stop_distinct >= 2 THEN 1 ELSE 0 END AS BIGINT) AS stop_ok,
           CAST(CASE WHEN n_words BETWEEN 15 AND 5000 THEN 1 ELSE 0 END
                * CASE WHEN mean_word_len BETWEEN 3.0 AND 10.0 THEN 1 ELSE 0 END
                * CASE WHEN alpha_frac >= 0.7 THEN 1 ELSE 0 END
                * CASE WHEN n_stop_distinct >= 2 THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM f
    """


@register("x45_gopher_rules", oracle=_x45_oracle(), tags=("quality", "filter", "rules"))
def x45_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-based filter chain (word-count bounds, mean word
    length, alphabetic-word fraction, >=2 distinct stopwords) with per-rule
    flags + the conjunction — the pre-model curation pass every corpus
    pipeline runs.  Zero shuffles, all JVM expressions; ratios floor4-
    quantized so the DuckDB oracle replays every decision.  See
    operators/text.py::with_gopher_rules."""
    from hiveka_spark.operators.text import with_gopher_rules

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    return with_gopher_rules(d).select(
        "doc_id", "n_words", "mean_word_len", "alpha_frac", "n_stop_distinct",
        "wc_ok", "len_ok", "alpha_ok", "stop_ok", "keep",
    )


# ---------------------------------------------------------------------------
# x46 — shingle novelty (first-introduction fraction per doc)
# ---------------------------------------------------------------------------


@register(
    "x46_shingle_novelty",
    oracle="""
    WITH w AS (SELECT doc_id, list_filter(string_split(LOWER(text), ' '), x -> x <> '') AS ws
               FROM documents),
    sh AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS s
           FROM (SELECT doc_id, ws, UNNEST(generate_series(1, GREATEST(LEN(ws) - 2, 1))) AS i
                 FROM w)),
    first AS (SELECT s, MIN(doc_id) AS first_doc FROM sh GROUP BY s)
    SELECT sh.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN sh.doc_id = first.first_doc THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel,
           CAST(FLOOR(SUM(CASE WHEN sh.doc_id = first.first_doc THEN 1 ELSE 0 END) * 1.0
                      / COUNT(*) * 10000.0) AS BIGINT) / 10000.0 AS novelty
    FROM sh JOIN first ON sh.s = first.s
    GROUP BY sh.doc_id
    """,
    tags=("dedup", "metrics", "novelty"),
)
def x46_shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc shingle novelty — fraction of a doc's distinct 3-gram
    shingles first introduced by it (corpus-wide min doc id).  The 'how much
    of this crawl is new' dedup-rate metric: exact copies score 0, fresh
    docs ~1.  Shingle-keyed min aggregate + linear join-back — no pairwise
    work (see operators/dedup.py::shingle_novelty for the scale argument)."""
    from hiveka_spark.operators.dedup import shingle_novelty

    d = table(spark, sf_dir, "documents")
    return shingle_novelty(d, "doc_id", "text", k=3)


# ---------------------------------------------------------------------------
# x112 — unique-secret detection + scrub (memorization-risk mitigation:
# Carlini et al. 2021, "Extracting Training Data from Large Language
# Models"; the detect-secrets pass of The Stack, Kocetkov et al. 2022)
# ---------------------------------------------------------------------------

_X112_MIN_LEN = 16  # candidate-secret minimum length
_X112_MARK = "[SECRET]"


def _x112_oracle(min_len: int = _X112_MIN_LEN) -> str:
    return f"""
    WITH aug AS (
      SELECT doc_id,
             concat(text,
                    CASE WHEN doc_id % 3 = 0
                         THEN concat(' sk0', md5(CAST(doc_id AS VARCHAR)))
                         ELSE '' END,
                    CASE WHEN doc_id % 5 = 0
                         THEN ' SHARED0000token00001' ELSE '' END) AS text
      FROM documents),
    w AS (SELECT doc_id, UNNEST(list_filter(string_split(text, ' '),
                                            x -> x <> '')) AS w
          FROM aug),
    cand AS (SELECT DISTINCT doc_id, w FROM w
             WHERE LENGTH(w) >= {min_len}
               AND regexp_matches(w, '[A-Za-z]')
               AND regexp_matches(w, '[0-9]')
               AND regexp_matches(w, '^[A-Za-z0-9_-]+$')),
    dfreq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM cand GROUP BY w),
    per AS (SELECT c.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_candidates,
                   CAST(SUM(CASE WHEN f.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_secrets,
                   list(c.w ORDER BY c.w) FILTER (f.df = 1) AS secrets
            FROM cand c JOIN dfreq f USING (w)
            GROUP BY c.doc_id)
    SELECT a.doc_id,
           CAST(COALESCE(p.n_candidates, 0) AS BIGINT) AS n_candidates,
           CAST(COALESCE(p.n_secrets, 0) AS BIGINT) AS n_secrets,
           md5(list_reduce(
                 list_prepend(a.text, COALESCE(p.secrets, CAST([] AS VARCHAR[]))),
                 (acc, s) -> replace(acc, s, '{_X112_MARK}'))) AS scrubbed_md5
    FROM aug a LEFT JOIN per p USING (doc_id)
    """


@register(
    "x112_secret_scrub",
    oracle=_x112_oracle(),
    tags=("privacy", "pii", "memorization", "quality"),
)
def x112_secret_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unique-secret detection and scrubbing — the memorization-risk pass
    (Carlini et al. 2021; The Stack's detect-secrets step): a long
    mixed-alphanumeric token that occurs in EXACTLY ONE document
    corpus-wide is the extraction-attack surface (an API key, a session
    token) — df=1 is what makes it a secret rather than jargon, which
    x28's pattern-only PII pass cannot distinguish.  The gate synthesizes
    its own ground truth (the x49/x64 pattern): every doc_id % 3 == 0 doc
    gains a unique planted key, every doc_id % 5 == 0 doc a SHARED
    candidate token (df > 1), so the df=1 filter provably separates the
    two.  Emits per doc the candidate count, the unique-secret count,
    and the md5 of the SCRUBBED text (each secret replaced by
    '{_X112_MARK}' in sorted order — the certified downstream artifact),
    with LEFT-join row parity for secret-free docs.

    Scale shape: candidate extraction is a zero-shuffle filter (length +
    two character-class rlikes + charset anchor — no lookahead, so Java
    regex and RE2/DuckDB agree); the frequency table aggregates the
    (doc, candidate) DISTINCT pairs (candidate-population-sized, a tiny
    fraction of the corpus — never full text); the scrub is a per-row
    fold over the doc's own sorted secret list.  Case-sensitive tokens
    throughout (secrets are case-sensitive)."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.lit(" sk0"), F.md5(F.col("doc_id").cast("string"))),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 5 == 0, F.lit(" SHARED0000token00001"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    ws = aug.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
        ).alias("w"),
    )
    cand = (
        ws.filter(
            (F.length("w") >= _X112_MIN_LEN)
            & F.col("w").rlike("[A-Za-z]")
            & F.col("w").rlike("[0-9]")
            & F.col("w").rlike("^[A-Za-z0-9_-]+$")
        )
        .distinct()
    )
    dfreq = cand.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    per = (
        cand.join(dfreq, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
            .cast("bigint").alias("n_secrets"),
            F.sort_array(
                F.collect_list(F.when(F.col("df") == 1, F.col("w")))
            ).alias("secrets"),
        )
    )
    out = aug.join(per, "doc_id", "left")
    scrub = F.aggregate(
        F.coalesce(F.col("secrets"), F.array().cast("array<string>")),
        F.col("text"),
        lambda acc, s: F.replace(acc, s, F.lit(_X112_MARK)),
    )
    return out.select(
        "doc_id",
        F.coalesce("n_candidates", F.lit(0)).cast("bigint").alias("n_candidates"),
        F.coalesce("n_secrets", F.lit(0)).cast("bigint").alias("n_secrets"),
        F.md5(scrub).alias("scrubbed_md5"),
    )
