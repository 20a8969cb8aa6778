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
