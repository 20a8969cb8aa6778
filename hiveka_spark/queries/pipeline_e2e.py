"""x60 — the composed end-to-end curation pipeline as ONE gate entry.

Every stage below already has its own green single-stage gate (x51 ingest,
x45 rules, x01/x03 dedup, x41 decontamination, x34 mixing, x47 chunking,
x50 report), but a real curation run is their COMPOSITION — and that is
where inter-stage column-contract bugs, cache-lifecycle bugs under nested
scopes, and cumulative plan-size problems hide.  This entry chains them
over one corpus inside one ``dedup_cache_scope`` and certifies the final
per-source report with a single DuckDB oracle that replays every stage:

    JSONL ingest -> Gopher rules -> exact dedup -> MinHash near-dup dedup
    -> fuzzy eval-decontamination -> source mixing -> overlap chunking
    -> per-source report

The oracle is exact because every probabilistic decision in the chain is a
pure function of engine-portable md5-derived hashes (portable_hash60) and
integer arithmetic — the same property each stage oracle relies on — and
because per-doc MinHash signatures depend only on the doc's text, so the
oracle computes ONE signature/shingle table over the ingested corpus and
filters it per stage, while Spark computes them per stage input (identical
values either way).

Reference parity: the reference's own headline is a composed
scan->decode->query flow (README.md:7-16, TODO.md:6-9); this is the
curation-pipeline analog, Spark-first.

Scale shape: each stage keeps its single-stage plan (documented in its own
entry); composition adds only (a) membership semi/anti-joins between
stages — keyed on doc_id, the natural partitioning — and (b) one persist
per surviving frontier so per-stage report counts never recompute the
corpus.  All persists are owned by the outer ``dedup_cache_scope`` (the
operators' internal shingle persists register with the same scope), so a
long-lived session releases everything at entry exit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from hiveka_spark.catalog import table
from hiveka_spark.operators import dedup as D
from hiveka_spark.operators.sampling import sample_bucket, sample_bucket_sql
from hiveka_spark.operators.text import tokens, with_gopher_rules
from hiveka_spark.queries import register
from hiveka_spark.scratch import scratch_dir

# Stage parameters — deliberately identical to the single-stage gates so a
# divergence between composed and single-stage behavior is a real bug, not
# a config delta.
EVAL_SOURCES = ("src0", "src1", "src2", "src3", "src4")  # x41's eval split
CORE_SOURCES = ("src5", "src6", "src7", "src8", "src9")  # mix weight 10
_TAIL_WEIGHT = 5  # every other non-eval source
_CORE_WEIGHT = 10
_BUDGET_PCT = 40  # sampled-corpus target: 40% of surviving tokens
_NUM_PERM, _BANDS, _K, _THRESH = 32, 8, 3, 0.8  # x03/x41 MinHash params
_WIN, _STRIDE = 32, 24  # x47 chunking params


def _minhash_ctes() -> str:
    """Shared CTE block over the ``tok`` CTE — delegated to the CANONICAL
    SQL builder in operators/dedup.py (one copy of the replay math for
    x03/x41/s19/x60), computed once over the ingested corpus (per-doc
    pure) and filtered by stage membership downstream."""
    return D.minhash_machinery_sql(_NUM_PERM, _BANDS, _K, tok_cte="tok")


def _jaccard_pairs_cte(cand: str, out: str) -> str:
    """Canonical floor4-quantized Jaccard verification (operators/dedup.py
    builder) of a candidate CTE with columns (id_a, id_b)."""
    return D.jaccard_pairs_sql(cand, out, _THRESH)


def _curation_stage_ctes() -> str:
    """Stage 1-5 CTE text shared by the x60 and x90 oracles — ingest,
    Gopher rules, exact dedup, MinHash near-dup dedup, fuzzy eval
    decontamination — ending at the decontaminated training split ``n5``.
    One SQL text so the composed replays cannot drift."""
    from hiveka_spark.operators.text import EN_STOPWORDS

    stop_sql = "[" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + "]"
    evals = ", ".join(f"'{s}'" for s in EVAL_SOURCES)
    return f"""ing AS (SELECT doc_id, text, lang, source, n_chars FROM documents),
    tok AS (SELECT doc_id, source,
                   list_filter(string_split(LOWER(text), ' '), x -> x <> '') AS ws
            FROM ing),
    -- stage 2: Gopher rule chain (x45's exact formulas)
    gf AS (SELECT doc_id,
                  CAST(LEN(ws) AS BIGINT) AS n_words,
                  CAST(FLOOR(list_sum(list_transform(ws, w -> LENGTH(w))) * 1.0
                             / GREATEST(LEN(ws), 1) * 10000.0) AS BIGINT) / 10000.0
                    AS mean_word_len,
                  CAST(FLOOR(LEN(list_filter(ws, w -> regexp_matches(w, '[a-z]'))) * 1.0
                             / GREATEST(LEN(ws), 1) * 10000.0) AS BIGINT) / 10000.0
                    AS alpha_frac,
                  CAST(LEN(list_intersect(list_distinct(ws), {stop_sql})) AS BIGINT)
                    AS n_stop_distinct
           FROM tok),
    q AS (SELECT i.* FROM ing i JOIN gf USING (doc_id)
          WHERE n_words BETWEEN 15 AND 5000
            AND mean_word_len BETWEEN 3.0 AND 10.0
            AND alpha_frac >= 0.7 AND n_stop_distinct >= 2),
    -- stage 3: exact dedup, keep min doc_id per identical text
    canon AS (SELECT MIN(doc_id) AS doc_id FROM q GROUP BY text),
    e AS (SELECT q.* FROM q JOIN canon USING (doc_id)),
    -- shared MinHash machinery (per-doc pure; filtered per stage below)
    {_minhash_ctes()},
    -- stage 4: near-dup dedup WITHIN the exact-surviving corpus
    cand4 AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM bands a
              JOIN bands b ON a.band = b.band AND a.bh = b.bh
                          AND a.doc_id < b.doc_id
              JOIN e ea ON ea.doc_id = a.doc_id
              JOIN e eb ON eb.doc_id = b.doc_id),
    {_jaccard_pairs_cte("cand4", "pairs4")},
    n4 AS (SELECT e.* FROM e
           WHERE doc_id NOT IN (SELECT id_b FROM pairs4)),
    -- stage 5: fuzzy decontamination of the training split vs the RAW eval
    -- split (benchmarks are given, not curated)
    train AS (SELECT * FROM n4 WHERE source NOT IN ({evals})),
    evald AS (SELECT * FROM ing WHERE source IN ({evals})),
    cand5 AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM bands a
              JOIN bands b ON a.band = b.band AND a.bh = b.bh
              JOIN train t ON t.doc_id = a.doc_id
              JOIN evald v ON v.doc_id = b.doc_id),
    {_jaccard_pairs_cte("cand5", "pairs5")},
    n5 AS (SELECT * FROM train
           WHERE doc_id NOT IN (SELECT id_a FROM pairs5))"""


def _x60_oracle() -> str:
    evals = ", ".join(f"'{s}'" for s in EVAL_SOURCES)
    cores = ", ".join(f"'{s}'" for s in CORE_SOURCES)
    weight = f"(CASE WHEN source IN ({cores}) THEN {_CORE_WEIGHT} ELSE {_TAIL_WEIGHT} END)"
    return f"""
    WITH {_curation_stage_ctes()},
    -- stage 6: source mixing to a token budget (x34's rate formula)
    ntok AS (SELECT t.doc_id, t.source, t.ws, CAST(LEN(t.ws) AS BIGINT) AS n_tok
             FROM tok t JOIN n5 USING (doc_id)),
    per_src AS (SELECT source, SUM(n_tok) AS src_tokens FROM ntok GROUP BY source),
    grand AS (SELECT SUM(n_tok) AS total_tokens FROM ntok),
    rates AS (SELECT source, src_tokens,
                     CAST(LEAST(100, FLOOR(
                       FLOOR(total_tokens * {_BUDGET_PCT} * {weight} / 10000.0)
                       * 100.0 / src_tokens)) AS BIGINT) AS rate_pct
              FROM per_src, grand),
    kept AS (SELECT n.* FROM ntok n JOIN rates USING (source)
             WHERE {sample_bucket_sql("CAST(doc_id AS VARCHAR)")} < rate_pct),
    kept_stats AS (SELECT source, COUNT(*) AS n_kept, SUM(n_tok) AS tokens_kept
                   FROM kept GROUP BY source),
    -- stage 7: overlap chunking of the kept docs (x47's window arithmetic)
    chunks AS (SELECT source,
                      LEAST(i * {_STRIDE} + {_WIN}, n_tok) - i * {_STRIDE} AS c_tok
               FROM (SELECT source, n_tok,
                            UNNEST(generate_series(0,
                              CASE WHEN n_tok >= 1
                                   THEN (GREATEST(n_tok - {_WIN}, 0) + {_STRIDE - 1})
                                        // {_STRIDE}
                                   ELSE -1 END)) AS i
                     FROM kept)),
    chunk_stats AS (SELECT source, COUNT(*) AS n_chunks, SUM(c_tok) AS chunk_tokens
                    FROM chunks GROUP BY source),
    -- stage 8: per-source report with per-stage survivor counts
    s1 AS (SELECT source, COUNT(*) AS n_ingested FROM ing GROUP BY source),
    s2 AS (SELECT source, COUNT(*) AS n_quality FROM q GROUP BY source),
    s3 AS (SELECT source, COUNT(*) AS n_exact FROM e GROUP BY source),
    s4 AS (SELECT source, COUNT(*) AS n_neardup FROM n4 GROUP BY source),
    s5 AS (SELECT source, COUNT(*) AS n_decontam FROM n5 GROUP BY source)
    SELECT s1.source,
           CAST(s1.n_ingested AS BIGINT) AS n_ingested,
           CAST(COALESCE(s2.n_quality, 0) AS BIGINT) AS n_quality,
           CAST(COALESCE(s3.n_exact, 0) AS BIGINT) AS n_exact,
           CAST(COALESCE(s4.n_neardup, 0) AS BIGINT) AS n_neardup,
           CAST(COALESCE(s5.n_decontam, 0) AS BIGINT) AS n_decontam,
           CAST(COALESCE(r.src_tokens, 0) AS BIGINT) AS src_tokens,
           CAST(COALESCE(r.rate_pct, 0) AS BIGINT) AS rate_pct,
           CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(COALESCE(k.tokens_kept, 0) AS BIGINT) AS tokens_kept,
           CAST(COALESCE(c.n_chunks, 0) AS BIGINT) AS n_chunks,
           CAST(COALESCE(c.chunk_tokens, 0) AS BIGINT) AS chunk_tokens
    FROM s1
    LEFT JOIN s2 USING (source)
    LEFT JOIN s3 USING (source)
    LEFT JOIN s4 USING (source)
    LEFT JOIN s5 USING (source)
    LEFT JOIN rates r USING (source)
    LEFT JOIN kept_stats k USING (source)
    LEFT JOIN chunk_stats c USING (source)
    WHERE s1.source NOT IN ({evals})
    """


def _keep(df: DataFrame, scope: list[DataFrame]) -> DataFrame:
    """Materialize a stage frontier with an EAGER localCheckpoint so
    downstream consumers read the materialized rows instead of recomputing
    the corpus at every stage boundary — AND so the composed plan's
    LINEAGE is truncated at each stage (r17, guide §3.3/§5: with the r16
    lazy persist the 8-stage chain's analyzed tree kept nesting, and each
    downstream join/select/persist py4j call paid JVM plan analysis +
    CacheManager canonicalization over the whole tree — measured 16.9 s
    of pure driver plan construction plus 27.5 s of cache-era
    materialization at sf0.1, vs 7.1 s total with checkpoints, identical
    report rows).  localCheckpoint stands in for the parquet
    materialization a 100 TB run would use between curation stages (the
    mutual_knn_pairs convention): storage is MEMORY_AND_DISK either way;
    what persist kept that checkpoints drop is lineage-based recompute on
    executor loss — which a production run gets back from the on-disk
    parquet frontier.  Frames still register with the scope (unpersist is
    a no-op on checkpoints; block cleanup rides GC, as every
    localCheckpoint in the engine does)."""
    df = df.localCheckpoint(eager=True)
    scope.append(df)
    return df


def curation_frontiers(ing: DataFrame, scope: list[DataFrame]) -> dict[str, DataFrame]:
    """Stages 1-5 of the curation chain — ingest, Gopher rules, exact
    dedup, MinHash near-dup dedup, fuzzy eval decontamination — shared by
    the x60 report and the x90 training-run capstone (the Spark twin of
    the oracles' shared ``_curation_stage_ctes`` text).  Returns the
    materialized stage frontiers {ing, q, e, n4, train, n5} (eager
    localCheckpoints — see ``_keep``); every frame registers with
    ``scope``."""

    def keep(df: DataFrame) -> DataFrame:
        return _keep(df, scope)

    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    ing = keep(ing)
    # stage 2 — Gopher rule chain
    q = with_gopher_rules(ing).filter(F.col("keep") == 1).select(*cols)
    # stage 3 — exact dedup (keep min doc_id per identical text)
    canon = D.exact_dedup(q, ["text"], "doc_id").select(
        F.col("canonical_id").alias("doc_id")
    )
    e = keep(q.join(canon, "doc_id", "left_semi"))
    # Shared MinHash machinery for stages 4+5, computed ONCE over every
    # doc either stage needs (e ∪ the raw eval split) and filtered per
    # stage by id membership — per-doc signatures don't depend on the
    # stage input, so this mirrors the oracle's single sig/bands tables
    # and halves the pipeline's dominant cost (tokenize+shingle+signature)
    # vs calling the two single-stage operators back to back.
    evald = ing.filter(F.col("source").isin(*EVAL_SOURCES))
    need = e.select("doc_id").unionByName(evald.select("doc_id")).distinct()
    mh_corpus = ing.join(need, "doc_id", "left_semi")
    # reuse=True on both: CacheManager keys on the canonicalized plan, so
    # band rows and the verify join read ONE cached shingle-set frame
    sh_all = D._shingle_sets(mh_corpus, "doc_id", "text", _K, reuse=True)
    bands_all = keep(
        D.minhash_band_rows(
            mh_corpus, "doc_id", "text",
            num_perm=_NUM_PERM, bands=_BANDS, k=_K, reuse=True,
        )
    )

    def bands_of(ids: DataFrame) -> DataFrame:
        member = ids.select(F.col("doc_id").alias("doc"))
        return bands_all.join(member, "doc", "left_semi")

    # stage 4 — MinHash+LSH near-dup dedup WITHIN e, greedy min-id keep:
    # every doc appearing as the LARGER id of a verified pair is dropped
    # (one anti-join; deterministic, order-free)
    be = bands_of(e)
    cand4 = (
        be.select(F.col("doc").alias("id_a"), "band", "bh")
        .join(be.select(F.col("doc").alias("id_b"), "band", "bh"), ["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    pairs4 = D._verified_jaccard(cand4, sh_all, _THRESH)
    near_drop = pairs4.select(F.col("id_b").alias("doc_id")).distinct()
    n4 = keep(e.join(near_drop, "doc_id", "left_anti"))
    # stage 5 — fuzzy decontamination of the training split vs the RAW
    # eval split (benchmarks are given, not curated); eval side broadcast
    # (tiny next to corpora), same asymmetry as minhash_cross_contamination
    train = keep(n4.filter(~F.col("source").isin(*EVAL_SOURCES)))
    cand5 = (
        bands_of(train)
        .select(F.col("doc").alias("id_a"), "band", "bh")
        .join(
            F.broadcast(
                bands_of(evald).select(F.col("doc").alias("id_b"), "band", "bh")
            ),
            ["band", "bh"],
        )
        .select("id_a", "id_b")
        .distinct()
    )
    pairs5 = D._verified_jaccard(cand5, sh_all, _THRESH)
    contam_ids = pairs5.select(F.col("id_a").alias("doc_id")).distinct()
    n5 = keep(train.join(contam_ids, "doc_id", "left_anti"))
    return {"ing": ing, "q": q, "e": e, "n4": n4, "train": train, "n5": n5}


def build_curation_report(ing: DataFrame, scope: list[DataFrame]) -> DataFrame:
    """Build the LAZY stage-2..8 report plan from an ingested corpus.

    ``scope`` is the live frame list yielded by ``dedup_cache_scope`` —
    every stage frontier is an eager localCheckpoint registered with it,
    so the report plan reads each frontier's materialized rows (a slim
    ``Scan ExistingRDD``) instead of recomputing the corpus at every
    stage boundary, and the composed plan stays ANALYSIS-BOUNDED (asserted
    by tests/test_plans.py::test_x60_no_stage_recomputation).  Exposed
    separately from the gate entry so the plan can be inspected before
    materialization."""

    def keep(df: DataFrame) -> DataFrame:
        return _keep(df, scope)

    fr = curation_frontiers(ing, scope)
    ing, q, e, n4, n5 = fr["ing"], fr["q"], fr["e"], fr["n4"], fr["n5"]
    # stage 6 — source mixing to a token budget (x34's rate formula)
    ntok = keep(
        n5.select(
            "doc_id", "source", tokens("text").alias("ws")
        ).withColumn("n_tok", F.size("ws").cast("bigint"))
    )
    per_src = ntok.groupBy("source").agg(F.sum("n_tok").alias("src_tokens"))
    grand = ntok.agg(F.sum("n_tok").alias("total_tokens"))
    weight = F.when(
        F.col("source").isin(*CORE_SOURCES), F.lit(_CORE_WEIGHT)
    ).otherwise(F.lit(_TAIL_WEIGHT))
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
    kept = keep(
        ntok.join(F.broadcast(rates), "source").filter(
            sample_bucket("doc_id") < F.col("rate_pct")
        )
    )
    kept_stats = kept.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.sum("n_tok").cast("bigint").alias("tokens_kept"),
    )
    # stage 7 — overlap chunking of the kept docs (x47's real window
    # explode + slice, aggregated per source)
    n = F.col("n_tok")
    n_windows = F.floor(
        (F.greatest(n - _WIN, F.lit(0)) + (_STRIDE - 1)) / _STRIDE
    )
    seq = F.when(n >= 1, F.sequence(F.lit(0).cast("bigint"), n_windows)).otherwise(
        F.array().cast("array<bigint>")
    )
    start = (F.col("chunk_idx") * _STRIDE + 1).cast("int")
    chunk_stats = (
        kept.select("source", "ws", "n_tok", F.explode(seq).alias("chunk_idx"))
        .select(
            "source", F.size(F.slice("ws", start, _WIN)).cast("bigint").alias("c_tok")
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum("c_tok").cast("bigint").alias("chunk_tokens"),
        )
    )
    # stage 8 — the report.  The five per-stage survivor counts come from
    # ONE union + ONE conditional aggregate (each frontier contributes
    # slim (source, stage) rows read from its cache) instead of five
    # aggregates + four joins — at gate scale each extra AQE stage costs
    # more wall-clock than the data itself, and at cluster scale one
    # exchange of tagged rows beats five exchanges of the same keys.
    tagged = None
    for stage_name, frontier in (
        ("ing", ing), ("q", q), ("e", e), ("n4", n4), ("n5", n5)
    ):
        t = frontier.select("source", F.lit(stage_name).alias("stage"))
        tagged = t if tagged is None else tagged.unionByName(t)

    def stage_cnt(name: str) -> Column:
        return (
            F.count(F.when(F.col("stage") == name, 1)).cast("bigint")
        )

    base = (
        tagged.filter(~F.col("source").isin(*EVAL_SOURCES))
        .groupBy("source")
        .agg(
            stage_cnt("ing").alias("n_ingested"),
            stage_cnt("q").alias("n_quality"),
            stage_cnt("e").alias("n_exact"),
            stage_cnt("n4").alias("n_neardup"),
            stage_cnt("n5").alias("n_decontam"),
        )
    )
    report = (
        base.join(rates, "source", "left")
        .join(kept_stats, "source", "left")
        .join(chunk_stats, "source", "left")
        .select(
            "source",
            "n_ingested",
            *[
                F.coalesce(c, F.lit(0)).cast("bigint").alias(c)
                for c in (
                    "n_quality", "n_exact", "n_neardup", "n_decontam",
                    "src_tokens", "rate_pct", "n_kept", "tokens_kept",
                    "n_chunks", "chunk_tokens",
                )
            ],
        )
    )
    return report


@register(
    "x60_curation_pipeline",
    oracle=_x60_oracle(),
    tags=("pipeline", "e2e", "dedup", "decontamination", "mixing", "chunking"),
)
def x60_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation run (see module docstring for the stage chain).

    Returns the per-source report over the 15 non-eval sources: survivor
    counts after every stage plus mixing rates, kept-sample stats, and
    chunk stats — all bigint, so the hash certifies every inter-stage
    contract exactly.  Any column-contract or cache-lifecycle bug between
    stages moves at least one count.  The report is materialized INSIDE
    the cache scope (localCheckpoint) so the driver's later collect reads
    the 15-row result, not a recomputation of the unpersisted chain.
    """

    out = scratch_dir(prefix="gate_x60_jsonl_")
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    table(spark, sf_dir, "documents").select(*cols).write.mode("overwrite").json(out)
    with D.dedup_cache_scope() as scope:
        ing = spark.read.schema(
            "doc_id bigint, text string, lang string, source string, n_chars bigint"
        ).json(out)
        return build_curation_report(ing, scope).localCheckpoint(eager=True)


# ---------------------------------------------------------------------------
# x90 — the CAPSTONE: one certified end-to-end training-data run.
# x60 proved the CURATION half composes (ingest -> rules -> dedup ->
# decontamination -> mixing); this runs the TRAINER half on top — curate ->
# temperature-mix -> ONE tokenize pass -> fixed-length packing -> PHYSICAL
# export — and certifies the shipped example bytes with one DuckDB oracle
# replaying every stage.  The literal product of the engine: the descendant
# of the reference's own composed scan->decode->query ambition (TODO.md:9),
# taken all the way to the file a trainer opens.
# ---------------------------------------------------------------------------

_X90_SHARDS = 8
_X90_CONTEXT = 128


def _x90_oracle() -> str:
    """ONE oracle for the whole run: the shared stage-1..5 curation text
    (`_curation_stage_ctes` — byte-identical to x60's), the x73
    temperature-rate chain over the decontaminated split (m-prefixed CTE
    names: the tokenizer machinery owns `r`), and the shared packing
    replay (`curation_ext._packing_oracle`) with its shards built over
    the surviving ``kept`` frontier instead of the whole corpus.  The
    tokenizer trains on the full corpus (the per-gate convention — a real
    pipeline trains its tokenizer once, upstream of any one curation
    run); only surviving docs are tokenized/packed."""
    from hiveka_spark.operators.sampling import sample_bucket_sql
    from hiveka_spark.queries.curation_ext import _packing_oracle

    bucket = sample_bucket_sql("CAST(doc_id AS VARCHAR)")
    extra = f"""{_curation_stage_ctes()},
    -- stage 6: temperature mixing (x73's alpha=0.5 bigint-exact formula)
    mtok AS (SELECT t.doc_id, t.source, CAST(LEN(t.ws) AS BIGINT) AS n_tok
             FROM tok t JOIN n5 USING (doc_id)),
    mps AS (SELECT source, CAST(SUM(n_tok) AS BIGINT) AS src_tokens
            FROM mtok GROUP BY source),
    mpw AS (SELECT source, src_tokens,
                   CAST(FLOOR(SQRT(CAST(src_tokens AS DOUBLE)) * 1000.0) AS BIGINT)
                     AS w_int
            FROM mps),
    mtot AS (SELECT CAST(SUM(w_int) AS BIGINT) AS w_sum,
                    CAST(SUM(src_tokens) AS BIGINT) AS total_tokens
             FROM mpw),
    mr1 AS (SELECT source, src_tokens, w_int,
                   CAST(w_int * 1000000 // w_sum AS BIGINT) AS share_micro,
                   CAST(total_tokens * {_BUDGET_PCT} // 100 AS BIGINT) AS tb
            FROM mpw CROSS JOIN mtot),
    mr2 AS (SELECT source, src_tokens, share_micro,
                   CAST((tb // 1000000) * share_micro
                        + ((tb % 1000000) * share_micro // 1000000) AS BIGINT)
                     AS budget_tokens
            FROM mr1),
    mr3 AS (SELECT source, src_tokens, budget_tokens,
                   CAST(LEAST(100, budget_tokens * 100
                              // GREATEST(src_tokens, 1)) AS BIGINT) AS rate_pct
            FROM mr2),
    kept AS (SELECT m.doc_id FROM mtok m JOIN mr3 USING (source)
             WHERE {bucket} < rate_pct)"""
    return _packing_oracle(
        None, salt="x90pack_", n_shards=_X90_SHARDS, C=_X90_CONTEXT,
        src="kept", extra_ctes=extra,
    )


def build_training_export(
    spark: SparkSession, sf_dir: str, scope: list[DataFrame]
) -> DataFrame:
    """The LAZY curate -> mix -> tokenize -> pack plan, exposed separately
    from the gate so tests can assert its shape before the physical write:
    exactly ONE tokenize mapInPandas, no stage recomputation (every
    frontier is a persisted InMemoryTableScan owned by ``scope``), no
    SinglePartition exchange (tests/test_plans.py::
    test_x90_single_tokenize_no_stage_recomputation).

    Scale shape: stages 1-5 keep x60's per-stage plans; mixing is a
    broadcast rate-table filter (zero shuffle on the corpus side);
    tokenization is x79's flat broadcast mapInPandas over the persisted
    kept frontier; packing is x87's never-explode slice composition.  The
    tokenizer trains on the full ingested corpus (one unit-frequency pass
    + bounded driver merge loop — trained once, upstream of any one
    curation run, like a real pipeline)."""
    from hiveka_spark.operators.bpe import bpe_encode_ids
    from hiveka_spark.operators.sampling import (
        epoch_shards,
        pack_token_example_rows,
        temperature_rates,
    )
    from hiveka_spark.queries.curation_ext import _trained_merge_vocab

    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    d = table(spark, sf_dir, "documents").select(*cols)
    fr = curation_frontiers(d, scope)
    # stage 6 — temperature mixing over the decontaminated split (x73's
    # derived weights, not x60's given weights: the capstone exercises the
    # from-corpus path)
    ntok = fr["n5"].select(
        "doc_id", "source", "text",
        F.size(tokens("text")).cast("bigint").alias("n_tok"),
    )
    rates = temperature_rates(ntok, "doc_id", "source", "n_tok", _BUDGET_PCT)
    kept = _keep(
        ntok.join(F.broadcast(rates.select("source", "rate_pct")), "source")
        .filter(sample_bucket("doc_id") < F.col("rate_pct"))
        .select("doc_id", "text"),
        scope,
    )
    # stage 7 — tokenizer (trained on the persisted ingested corpus) +
    # ONE tokenize pass over the survivors.  Tokenize BEFORE sharding (the
    # x89/s25 ordering): MapInPandas does not preserve its child's
    # partitioning, so shard-then-tokenize would pay a second corpus-sized
    # exchange; tokenizing first lets the ids ride the ONE shard exchange
    # and the packer's window + groupBy share that partitioning
    merges, vocab = _trained_merge_vocab(fr["ing"])
    enc = bpe_encode_ids(kept, merges, vocab, "text", "doc_id", units=True)
    staged = epoch_shards(enc, "doc_id", "x90pack_", _X90_SHARDS, keep_cols=("ids",))
    # stage 8 — fixed-length packing, physical example rows
    return pack_token_example_rows(staged, _X90_CONTEXT)


@register(
    "x90_training_run",
    oracle=_x90_oracle(),
    tags=("pipeline", "e2e", "dedup", "decontamination", "mixing",
          "tokenizer", "packing", "export", "certification"),
)
def x90_training_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end TRAINING-DATA RUN as one gate (round-11 verdict #1):

        ingest -> Gopher rules -> exact dedup -> MinHash near-dup dedup
        -> fuzzy eval decontamination -> temperature mixing (alpha=0.5)
        -> ONE tokenize pass -> 128-token example packing -> PHYSICAL
        shard-partitioned parquet export -> read back -> manifest

    The manifest — (shard, ex_idx, n_tokens, n_docs, ids_digest,
    starts_digest) per packed example — is derived ENTIRELY from the
    WRITTEN-AND-READ-BACK example rows (the x88 discipline), and the one
    DuckDB oracle replays every stage from the source table, so a single
    hash match certifies every curation decision, the mixing rates, every
    token id and its position, and every attention-mask boundary in the
    bytes a trainer would actually open.  x60 proved per-stage gates miss
    composition bugs (stage-frontier recomputation, column-contract
    drift); this extends that certificate through the trainer half, which
    had only ever been certified piecewise (x73/x79/x87/x88).

    Everything runs inside one ``dedup_cache_scope``; plan shape (one
    tokenize mapInPandas, no stage recomputation, no SinglePartition) is
    pinned in tests/test_plans.py."""
    import shutil

    from hiveka_spark.operators.sampling import read_back_example_manifest

    out_dir = scratch_dir(prefix="gate_x90export_")
    with D.dedup_cache_scope() as scope:
        packed = build_training_export(spark, sf_dir, scope)
        packed.write.mode("overwrite").partitionBy("shard").parquet(out_dir)

    back = spark.read.parquet(out_dir)
    manifest = read_back_example_manifest(back).localCheckpoint(eager=True)
    shutil.rmtree(out_dir, ignore_errors=True)
    return manifest
