"""SURVEY.md §2C (round-14 widening) — the unigram-LM tokenizer family.

The round-13 verdict's #1 gap: the tokenizer surface was BPE-only
(operators/bpe.py), while SentencePiece's DEFAULT algorithm — the one most
modern multilingual pipelines ship — is the EM-trained unigram LM (Kudo
2018).  This module certifies the new family (operators/unigram.py) with
the x76 discipline: every training step (substring seed, hard-EM Viterbi
iterations, deterministic pruning, final counts) is replayed by a DuckDB
oracle built from recursive CTEs, and application is the flat Arrow-batched
mapInPandas shape.

- x125 unigram-LM vocabulary training: seed -> E/M -> prune -> final E,
  integer micro-nat costs throughout, every Viterbi argmin tie-broken
  (cost ASC, length DESC, piece ASC) identically in Python and SQL.
- x126 unigram tokenization + round-trip certificate: per-doc 1-best piece
  counts over the marked unit stream with single-char UNK fallback, the
  reassembled segmentation CHECKED against the input (x82's discipline).
- x127 tokenizer-family fertility comparison: the x104 evaluation table
  with TWO families on the same corpus — the reason x104 exists finally
  has a second column.
- x130 ship artifact: persist + reload + behavior-preserving tokenize
  certification from read-back tables (x86's torn-save discipline).
- x131 token-ID encode: per-doc content-AND-order digests over the
  artifact id space with UNK fallback (x80's certificate).

No reference analog (the reference is a Kafka scan layer); designed
Spark-first from the public algorithm (Kudo 2018; Kudo & Richardson 2018).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hiveka_spark.catalog import table
from hiveka_spark.operators.text import tokens
from hiveka_spark.queries import register
from hiveka_spark.queries.curation_ext import (
    _SP_UNITS_SQL,
    _X76_MAX_WORDS,
    _X76_MERGES,
    _bpe_apply_ctes,
    _units_src_sql,
)

# training knobs — shared by every unigram gate so the trained vocabulary
# cannot drift between them (the _X76_* discipline)
_UG_MAX_WORDS = 400
_UG_MAX_PIECE = 5
_UG_SEED = 256
_UG_KEEP_MULTI = 128


def _ug_viterbi_ctes(vit: str, seg: str, cnt: str, cost: str, units: str,
                     mpl: int = _UG_MAX_PIECE) -> str:
    """One Viterbi E-step as recursive CTEs, name-parameterized so the
    chain can unroll per EM iteration (the _bpe_train_rec discipline).

    ``{vit}``: DP forward pass — at each end position the candidate set is
    the <= mpl suffixes present in ``{cost}`` (an equi-join on the piece
    string, never a scan of the vocabulary), the winner the ROW_NUMBER=1
    row under (path cost ASC, piece length DESC, piece ASC) — exactly
    operators/unigram.py::_viterbi's tie order.  dp/bp ride along as
    BIGINT lists (dp[j+1] = best cost of the length-j prefix; bp[j] = the
    winning piece length ending at j).  ``{seg}``: the backpointer walk;
    ``{cnt}``: piece counts from the 1-best segmentations weighted by unit
    frequency (the M-step input)."""
    return f"""{vit} AS (
      SELECT w, freq, CAST(0 AS BIGINT) AS pos,
             [CAST(0 AS BIGINT)] AS dp, CAST([] AS BIGINT[]) AS bp
      FROM {units}
      UNION ALL
      SELECT w, freq, pos + 1 AS pos,
             list_append(dp, cand_cost) AS dp, list_append(bp, pl) AS bp
      FROM (
        SELECT e.w, e.freq, e.pos, e.dp, e.bp, c.pl,
               e.dp[e.pos + 2 - c.pl] + c.cq AS cand_cost,
               ROW_NUMBER() OVER (PARTITION BY e.w
                                  ORDER BY e.dp[e.pos + 2 - c.pl] + c.cq ASC,
                                           c.pl DESC, c.piece ASC) AS rn
        FROM (
          SELECT v.w, v.freq, v.pos, v.dp, v.bp, CAST(v.l AS BIGINT) AS l,
                 substr(v.w, v.pos + 2 - v.l, v.l) AS cand
          FROM (SELECT *, UNNEST(range(1, LEAST({mpl}, pos + 1) + 1)) AS l
                FROM {vit} WHERE pos < LEN(w)) v
        ) e JOIN {cost} c ON c.piece = e.cand AND c.pl = e.l
      ) z WHERE rn = 1
    ),
    {seg} AS (
      SELECT w, freq, CAST(LEN(w) AS BIGINT) AS pos, bp
      FROM {vit} WHERE pos = LEN(w)
      UNION ALL
      SELECT w, freq, pos - bp[pos] AS pos, bp FROM {seg} WHERE pos > 0
    ),
    {cnt} AS (
      SELECT substr(w, pos - bp[pos] + 1, bp[pos]) AS piece,
             CAST(SUM(freq) AS BIGINT) AS cnt
      FROM {seg} WHERE pos > 0 GROUP BY 1
    )"""


def _ug_cost_sql(src: str) -> str:
    """Laplace-smoothed floor-quantized micro-nat cost table over a
    (piece, cnt) CTE — operators/unigram.py::_cost_table's twin (ln over
    exact-integer doubles, the x100 agreement discipline)."""
    return f"""
      SELECT piece, CAST(LEN(piece) AS BIGINT) AS pl,
             CAST(FLOOR(1000000.0 *
                        (ln(CAST((SELECT SUM(cnt + 1) FROM {src}) AS DOUBLE))
                         - ln(CAST(cnt + 1 AS DOUBLE)))) AS BIGINT) AS cq
      FROM {src}"""


def _ug_seed_ctes(
    max_words: int = _UG_MAX_WORDS,
    mpl: int = _UG_MAX_PIECE,
    n_seed: int = _UG_SEED,
) -> str:
    """The shared training PREFIX of the hard (x125) and soft (x141)
    trainers: capped unit table (the shared raw-mode unit source —
    _units_src_sql, so the pre-tokenizer can never drift from the BPE
    gates'), substring seed, and the seeded piece table with its cost
    table (ug_p1 / ug_cost1) — identical up to the first E-step, exactly
    as operators/unigram.py's two trainers share _seed_counts."""
    units_src = _units_src_sql("documents", raw=True)
    return f"""ug_uf AS MATERIALIZED (
      SELECT u AS w, CAST(COUNT(*) AS BIGINT) AS freq FROM {units_src}
      GROUP BY u ORDER BY freq DESC, w LIMIT {max_words}),
    ug_seed AS MATERIALIZED (
      SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
        SELECT substr(w, i, l) AS piece, freq FROM (
          SELECT w, freq, i,
                 UNNEST(range(1, LEAST({mpl}, LEN(w) - i + 1) + 1)) AS l
          FROM (SELECT w, freq, UNNEST(range(1, LEN(w) + 1)) AS i FROM ug_uf)))
      GROUP BY piece),
    ug_chars0 AS (SELECT piece, cnt FROM ug_seed WHERE LEN(piece) = 1),
    ug_multi0 AS (SELECT piece, cnt FROM ug_seed WHERE LEN(piece) > 1
                  ORDER BY cnt DESC, piece LIMIT {n_seed}),
    ug_p1 AS (SELECT * FROM ug_chars0 UNION ALL SELECT * FROM ug_multi0),
    ug_cost1 AS MATERIALIZED ({_ug_cost_sql("ug_p1")})"""


def _ug_train_ctes(
    max_words: int = _UG_MAX_WORDS,
    mpl: int = _UG_MAX_PIECE,
    n_seed: int = _UG_SEED,
    keep_multi: int = _UG_KEEP_MULTI,
) -> str:
    """The full HARD unigram-LM training replay: the shared seed prefix,
    EM iteration 1 (Viterbi), count-ranked pruning, final EM iteration.
    Produces ug_vocab2 (the shipped piece set with EM-1 counts), ug_cost2
    (its cost table) and ug_c2 (final counts)."""
    return f"""{_ug_seed_ctes(max_words, mpl, n_seed)},
    {_ug_viterbi_ctes("ug_vit1", "ug_seg1", "ug_c1", "ug_cost1", "ug_uf", mpl)},
    ug_kept AS (SELECT piece, cnt FROM ug_c1 WHERE LEN(piece) > 1
                ORDER BY cnt DESC, piece LIMIT {keep_multi}),
    ug_vocab2 AS (
      SELECT c0.piece, COALESCE(n.cnt, 0) AS cnt
      FROM ug_chars0 c0 LEFT JOIN ug_c1 n USING (piece)
      UNION ALL
      SELECT piece, cnt FROM ug_kept),
    ug_cost2 AS MATERIALIZED ({_ug_cost_sql("ug_vocab2")}),
    {_ug_viterbi_ctes("ug_vit2", "ug_seg2", "ug_c2", "ug_cost2", "ug_uf", mpl)}"""


# ---------------------------------------------------------------------------
# x125 — unigram-LM tokenizer training (SentencePiece's default algorithm)
# ---------------------------------------------------------------------------


def _x125_oracle() -> str:
    return f"""
    WITH RECURSIVE {_ug_train_ctes()}
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY (LEN(v.piece) > 1), v.piece) - 1
                AS BIGINT) AS piece_id,
           v.piece,
           CAST(CASE WHEN LEN(v.piece) = 1 THEN 1 ELSE 0 END AS BIGINT)
             AS is_char,
           CAST(COALESCE(f.cnt, 0) AS BIGINT) AS cnt,
           k.cq AS cost_q
    FROM ug_vocab2 v
    JOIN ug_cost2 k ON k.piece = v.piece
    LEFT JOIN ug_c2 f ON f.piece = v.piece
    """


@register(
    "x125_unigram_train",
    oracle=_x125_oracle(),
    tags=("text", "tokenizer", "unigram", "training-prep", "scale"),
)
def x125_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM tokenizer TRAINING (Kudo 2018 — SentencePiece's default
    algorithm, the second tokenizer family next to x76's BPE): substring
    seed over the capped unit table, a hard-EM (Viterbi) refinement
    iteration, deterministic pruning to all-chars + top-{_UG_KEEP_MULTI}
    pieces, and a final E-step producing the shipped counts.  Costs are
    floor-quantized integer micro-nats under Laplace +1 smoothing, every
    Viterbi argmin tie-broken (cost ASC, length DESC, piece ASC), so the
    whole training — both EM iterations included — is replayed exactly by
    the DuckDB oracle's recursive-CTE DP.

    Scale shape (the x76 discipline): ONE distributed map-side-combinable
    corpus pass reduces to the capped unit-frequency table; the EM finish
    is driver-local and bounded (max_words={_UG_MAX_WORDS} units x unit
    length x {_UG_MAX_PIECE} candidate suffixes per position — no
    per-iteration Spark job).  Hard EM + count-ranked pruning is the
    deterministic stand-in for SentencePiece's forward-backward E-step and
    likelihood-loss pruning; documented, not hidden."""
    from hiveka_spark.operators.unigram import unigram_train

    d = table(spark, sf_dir, "documents")
    rows = unigram_train(
        d, "text",
        max_words=_UG_MAX_WORDS, max_piece_len=_UG_MAX_PIECE,
        n_seed=_UG_SEED, keep_multi=_UG_KEEP_MULTI,
    )
    return spark.createDataFrame(
        [
            (i, p, 1 if len(p) == 1 else 0, cnt, cq)
            for i, (p, cnt, cq) in enumerate(rows)
        ],
        "piece_id bigint, piece string, is_char bigint, cnt bigint, cost_q bigint",
    )


# ---------------------------------------------------------------------------
# x126 — unigram tokenization + round-trip certificate
# ---------------------------------------------------------------------------


def _ug_apply_ctes(src: str = "documents", cost: str = "ug_cost2",
                   vocab: str = "ug_vocab2", p: str = "ug_") -> str:
    """The APPLY replay chain shared by x126/x127/x130/x131/x137/x138 (and
    x144's soft arm via the name parameters): per-doc marked units with
    positions ({p}du), the distinct-unit set ({p}dus), the candidate cost
    table with single-char UNK fallback rows ({p}appc), a Viterbi
    recursion over the distinct corpus units, and per-unit token counts
    ({p}ut).  ``src``: the (doc_id, text) table the units come from —
    x138 applies the FROZEN vocabulary to augmented out-of-corpus text
    while training stays on ``documents``.  ``cost``/``vocab``/``p``
    re-point the chain at a different trained table (x141's soft
    vocabulary) without name collisions."""
    vit = _ug_viterbi_ctes(
        f"{p}vit3", f"{p}seg3", f"{p}c3", f"{p}appc", f"{p}dus"
    )
    return f"""{p}du AS MATERIALIZED (
      SELECT doc_id, upos, replace(u, ' ', '▁') AS u
      FROM (SELECT doc_id,
                   UNNEST(range(1, LEN(us) + 1)) AS upos,
                   UNNEST(us) AS u
            FROM (SELECT doc_id, {_SP_UNITS_SQL.format(col="text")} AS us
                  FROM {src}))),
    {p}dus AS MATERIALIZED (
      SELECT DISTINCT u AS w, CAST(1 AS BIGINT) AS freq FROM {p}du),
    {p}appc AS MATERIALIZED (
      SELECT piece, pl, cq FROM {cost}
      UNION ALL
      SELECT c AS piece, CAST(1 AS BIGINT) AS pl,
             CAST(40000000 AS BIGINT) AS cq
      FROM (SELECT DISTINCT UNNEST(string_split(w, '')) AS c FROM {p}dus)
      WHERE c NOT IN (SELECT piece FROM {vocab})),
    {vit},
    {p}ut AS (SELECT w AS u, CAST(COUNT(*) AS BIGINT) AS n_tok
              FROM {p}seg3 WHERE pos > 0 GROUP BY w)"""


def _x126_oracle() -> str:
    return f"""
    WITH RECURSIVE {_ug_train_ctes()},
    {_ug_apply_ctes()}
    SELECT d.doc_id,
           CAST(COALESCE(SUM(t.n_tok), 0) AS BIGINT) AS n_tokens,
           CAST(1 AS BIGINT) AS roundtrip_ok
    FROM documents d
    LEFT JOIN ug_du du ON du.doc_id = d.doc_id
    LEFT JOIN ug_ut t ON t.u = du.u
    GROUP BY d.doc_id
    """


@register(
    "x126_unigram_tokenize",
    oracle=_x126_oracle(),
    tags=("text", "tokenizer", "unigram", "mapinpandas", "certification"),
)
def x126_unigram_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production unigram-LM tokenization with the x125-trained vocabulary
    plus the ROUND-TRIP certificate (x82's discipline for the new family):
    per doc, the 1-best Viterbi piece count over the marked unit stream —
    characters outside the vocabulary segment as single-char UNK pieces at
    a fixed worse-than-anything cost (the coverage floor), and the
    reassembled segmentation is CHECKED against each input unit (exact
    cover by construction, but certified, not assumed — the oracle pins
    the expected all-1 column while n_tokens exercises the whole
    trained-cost DP per doc).

    Scale shape: training as x125 (one corpus pass + bounded driver EM);
    tokenization is bpe_apply_fast's flat plan — piece->cost broadcast
    once, ONE Arrow-batched zero-shuffle mapInPandas, per-partition memo
    on distinct units.  The oracle replays training AND application with a
    third Viterbi recursion over the distinct corpus units, UNK rows
    union-ed into the candidate table."""
    from hiveka_spark.operators.unigram import unigram_apply_fast, unigram_train

    d = table(spark, sf_dir, "documents")
    vocab = unigram_train(
        d, "text",
        max_words=_UG_MAX_WORDS, max_piece_len=_UG_MAX_PIECE,
        n_seed=_UG_SEED, keep_multi=_UG_KEEP_MULTI,
    )
    out = unigram_apply_fast(
        d, vocab, "text", "doc_id", max_piece_len=_UG_MAX_PIECE
    )
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("roundtrip_ok").cast("bigint").alias("roundtrip_ok"),
    )


# ---------------------------------------------------------------------------
# x127 — tokenizer-FAMILY fertility comparison (BPE vs unigram-LM)
# ---------------------------------------------------------------------------


def _x127_oracle() -> str:
    """x104's evaluation chain for BPE (its exact CTEs) UNION ALL the
    unigram chain — one SQL text replaying BOTH trainings and both
    applications on the same corpus."""
    return f"""
    WITH RECURSIVE {_bpe_apply_ctes(_X76_MERGES, _X76_MAX_WORDS)},
    bpe_ut AS (
      SELECT w AS u, CAST(COUNT(*) AS BIGINT) AS n_tok
      FROM ap WHERE it = (SELECT MAX(merge_rank) FROM merges) GROUP BY w),
    {_ug_train_ctes()},
    {_ug_apply_ctes()},
    words AS (
      SELECT doc_id, lang,
             CAST(LEN(list_filter(string_split(LOWER(text), ' '),
                                  x -> x <> '')) AS BIGINT) AS n_words
      FROM documents),
    bpe_pd AS (
      SELECT w.doc_id, MIN(w.lang) AS lang, MIN(w.n_words) AS n_words,
             CAST(COALESCE(SUM(t.n_tok), 0) AS BIGINT) AS n_tok
      FROM words w
      LEFT JOIN docunits du ON du.doc_id = w.doc_id
      LEFT JOIN bpe_ut t ON t.u = du.u
      GROUP BY w.doc_id),
    ug_pd AS (
      SELECT w.doc_id, MIN(w.lang) AS lang, MIN(w.n_words) AS n_words,
             CAST(COALESCE(SUM(t.n_tok), 0) AS BIGINT) AS n_tok
      FROM words w
      LEFT JOIN ug_du du ON du.doc_id = w.doc_id
      LEFT JOIN ug_ut t ON t.u = du.u
      GROUP BY w.doc_id),
    both_pd AS (
      SELECT 'bpe' AS tokenizer, * FROM bpe_pd
      UNION ALL
      SELECT 'unigram' AS tokenizer, * FROM ug_pd)
    SELECT tokenizer, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS sum_words,
           CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
           CAST(SUM(n_tok) AS BIGINT) * 10000
             // CAST(SUM(n_words) AS BIGINT) AS fertility_q
    FROM both_pd GROUP BY tokenizer, lang
    """


@register(
    "x127_tokenizer_family_fertility",
    oracle=_x127_oracle(),
    tags=("text", "tokenizer", "unigram", "bpe", "evaluation", "multilingual"),
)
def x127_tokenizer_family_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-FAMILY fertility comparison — the reason x104's
    evaluation table exists finally has a second family to grade: BPE
    (x76's merge table through bpe_apply_fast) and unigram-LM (x125's
    vocabulary through unigram_apply_fast) on the SAME corpus, per
    language: doc count, word count, token count, and fertility
    (tokens per word, bigint-DIV 1e4 on the language-level sums — never
    per-doc floats).  This is the table a pipeline reads to pick the
    family before committing a 100 TB tokenize run.

    Scale shape: each family trains via its one-pass + bounded driver
    finish, applies via its flat zero-shuffle mapInPandas, joins per-doc
    metadata on the id key, one map-side-combinable per-(family, lang)
    rollup; the two families' plans are independent until the final
    union of language-sized frames.  The oracle replays BOTH trainings
    and BOTH applications in one SQL text (x104's CTEs + the unigram
    chain)."""
    from hiveka_spark.operators.bpe import bpe_apply_fast, bpe_train_capped_rows
    from hiveka_spark.operators.unigram import unigram_apply_fast, unigram_train

    d = table(spark, sf_dir, "documents")
    meta = d.select(
        "doc_id", "lang",
        F.coalesce(F.size(tokens("text")), F.lit(0))
        .cast("bigint").alias("n_words"),
    )

    merges = [
        (lhs, rhs)
        for (_r, lhs, rhs, _m, _c) in bpe_train_capped_rows(
            d, "text", n_merges=_X76_MERGES, max_words=_X76_MAX_WORDS, units=True
        )
    ]  # bounded: n_merges; rows seam (r16)
    bpe_counts = bpe_apply_fast(d, merges, "text", "doc_id", units=True).select(
        "doc_id", F.col("n_bpe_tokens").alias("n_tok")
    )

    vocab = unigram_train(
        d, "text",
        max_words=_UG_MAX_WORDS, max_piece_len=_UG_MAX_PIECE,
        n_seed=_UG_SEED, keep_multi=_UG_KEEP_MULTI,
    )
    ug_counts = unigram_apply_fast(
        d, vocab, "text", "doc_id", max_piece_len=_UG_MAX_PIECE
    ).select("doc_id", F.col("n_tokens").alias("n_tok"))

    both = bpe_counts.withColumn("tokenizer", F.lit("bpe")).unionByName(
        ug_counts.withColumn("tokenizer", F.lit("unigram"))
    )
    per = (
        meta.join(both, "doc_id")
        .groupBy("tokenizer", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("sum_words"),
            F.sum("n_tok").cast("bigint").alias("sum_tokens"),
        )
    )
    return per.select(
        "tokenizer", "lang", "n_docs", "sum_words", "sum_tokens",
        F.expr("sum_tokens * 10000 DIV sum_words")
        .cast("bigint").alias("fertility_q"),
    )


# ---------------------------------------------------------------------------
# x130 — unigram-LM tokenizer SHIP artifact: persist + reload + certify
# ---------------------------------------------------------------------------


def _x130_oracle() -> str:
    from hiveka_spark.operators.dedup import portable_hash60_sql

    hv = portable_hash60_sql(
        "concat(CAST(piece_id AS VARCHAR), ':', piece, ':', "
        "CAST(cost_q AS VARCHAR))"
    )
    ht = portable_hash60_sql(
        "concat(CAST(doc_id AS VARCHAR), ':', CAST(n_tokens AS VARCHAR))"
    )
    fold = (
        "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list({h} ORDER BY {o})), "
        "(acc, x) -> (acc * 31 + x) % 2147483647) AS BIGINT)"
    )
    return f"""
    WITH RECURSIVE {_ug_train_ctes()},
    {_ug_apply_ctes()},
    vrows AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY (LEN(v.piece) > 1), v.piece)
                  - 1 AS BIGINT) AS piece_id,
             v.piece, k.cq AS cost_q
      FROM ug_vocab2 v JOIN ug_cost2 k ON k.piece = v.piece),
    pd AS (
      SELECT d.doc_id,
             CAST(COALESCE(SUM(t.n_tok), 0) AS BIGINT) AS n_tokens
      FROM documents d
      LEFT JOIN ug_du du ON du.doc_id = d.doc_id
      LEFT JOIN ug_ut t ON t.u = du.u
      GROUP BY d.doc_id)
    SELECT 'vocab' AS part, CAST(COUNT(*) AS BIGINT) AS n_rows,
           {fold.format(h=hv, o="piece_id")} AS digest
    FROM vrows
    UNION ALL
    SELECT 'meta' AS part, CAST(1 AS BIGINT) AS n_rows,
           {portable_hash60_sql(f"'{_UG_MAX_PIECE}'")} AS digest
    UNION ALL
    SELECT 'tok' AS part, CAST(COUNT(*) AS BIGINT) AS n_rows,
           {fold.format(h=ht, o="doc_id")} AS digest
    FROM pd
    """


@register(
    "x130_unigram_artifact",
    oracle=_x130_oracle(),
    tags=("text", "tokenizer", "unigram", "export", "artifact",
          "certification"),
)
def x130_unigram_artifact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unigram-LM tokenizer as a SHIPPED, RELOADABLE artifact — x86's
    discipline for the new family: train x125's vocabulary, persist it
    (vocab: piece_id/piece/cnt/cost_q; one-row meta carrying the
    max_piece_len contract + a length-prefixed sha256 content token; a
    commit marker written LAST so a torn save fails loudly at load), read
    it back, and certify from the READ-BACK frames only:

    - 'vocab' row: ordered 31-ary digest over portable_hash60 of each
      reloaded row's canonical rendering — any lost/reordered/corrupted
      piece or cost changes the digest the oracle derives from the
      training recursion itself (the oracle never sees the parquet).
    - 'meta' row: the persisted max_piece_len contract (a reloaded
      tokenizer knows its own candidate width — the caller never guesses).
    - 'tok' row: the RELOADED vocabulary drives a full corpus tokenize
      (unigram_apply_fast under the persisted max_piece_len) and the
      per-doc token counts fold into one ordered digest the oracle
      re-derives through the apply recursion — the artifact is certified
      BEHAVIOR-preserving, not just byte-preserving.

    Scale shape: the artifact is vocabulary-bounded; the tokenize check
    is the one flat zero-shuffle corpus pass.  Scratch dir deleted
    eagerly (bench reruns)."""
    import shutil

    from hiveka_spark.operators.dedup import portable_hash60
    from hiveka_spark.operators.sampling import rolling_digest
    from hiveka_spark.operators.unigram import (
        load_unigram,
        save_unigram,
        unigram_apply_fast,
        unigram_train,
    )
    from hiveka_spark.scratch import scratch_dir

    d = table(spark, sf_dir, "documents")
    vocab = unigram_train(
        d, "text",
        max_words=_UG_MAX_WORDS, max_piece_len=_UG_MAX_PIECE,
        n_seed=_UG_SEED, keep_multi=_UG_KEEP_MULTI,
    )
    art_dir = scratch_dir(prefix="gate_x130art_")
    save_unigram(spark, art_dir, vocab, _UG_MAX_PIECE)

    vback = spark.read.parquet(f"{art_dir}/vocab")
    loaded_rows, mpl = load_unigram(spark, art_dir)  # torn-save verified
    if mpl != _UG_MAX_PIECE:
        raise RuntimeError(f"unigram artifact meta corrupted: {mpl}")

    vdig = (
        vback.select(
            "piece_id",
            portable_hash60(
                F.concat(
                    F.col("piece_id").cast("string"), F.lit(":"),
                    F.col("piece"), F.lit(":"),
                    F.col("cost_q").cast("string"),
                )
            ).alias("hv"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            rolling_digest("piece_id", "hv").alias("digest"),
        )
        .select(F.lit("vocab").alias("part"), "n_rows", "digest")
    )
    mdig = spark.createDataFrame([(str(mpl),)], "m string").select(
        F.lit("meta").alias("part"),
        F.lit(1).cast("bigint").alias("n_rows"),
        portable_hash60(F.col("m")).alias("digest"),
    )
    counts = unigram_apply_fast(d, loaded_rows, "text", "doc_id",
                                max_piece_len=mpl)
    tdig = (
        counts.select(
            "doc_id",
            portable_hash60(
                F.concat(
                    F.col("doc_id").cast("string"), F.lit(":"),
                    F.col("n_tokens").cast("string"),
                )
            ).alias("hv"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            rolling_digest("doc_id", "hv").alias("digest"),
        )
        .select(F.lit("tok").alias("part"), "n_rows", "digest")
    )
    out = vdig.unionByName(mdig).unionByName(tdig).localCheckpoint(eager=True)
    shutil.rmtree(art_dir, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# x131 — unigram token-ID encode artifact: per-doc content-AND-order digest
# ---------------------------------------------------------------------------


def _x131_oracle() -> str:
    return f"""
    WITH RECURSIVE {_ug_train_ctes()},
    {_ug_apply_ctes()},
    vrows AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY (LEN(v.piece) > 1), v.piece)
                  - 1 AS BIGINT) AS piece_id, v.piece
      FROM ug_vocab2 v),
    nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS unk_id FROM vrows),
    upieces AS (
      SELECT s.w, s.pos,
             COALESCE(vr.piece_id, nv.unk_id) AS pid
      FROM (SELECT w, pos,
                   substr(w, pos - bp[pos] + 1, bp[pos]) AS piece
            FROM ug_seg3 WHERE pos > 0) s
      LEFT JOIN vrows vr ON vr.piece = s.piece
      CROSS JOIN nv),
    seq AS (
      SELECT du.doc_id, up.pid,
             ROW_NUMBER() OVER (PARTITION BY du.doc_id
                                ORDER BY du.upos, up.pos) AS rn
      FROM ug_du du JOIN upieces up ON up.w = du.u),
    pd AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                                           list(pid + 1 ORDER BY rn)),
                  (acc, x) -> (acc * 31 + x) % 2147483647) AS BIGINT)
               AS ids_digest
      FROM seq GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(pd.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(COALESCE(pd.ids_digest, 0) AS BIGINT) AS ids_digest
    FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id
    """


@register(
    "x131_unigram_encode",
    oracle=_x131_oracle(),
    tags=("text", "tokenizer", "unigram", "mapinpandas", "export",
          "certification"),
)
def x131_unigram_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram token-ID ENCODING with a per-doc content-AND-order digest —
    x80's certificate for the new family, completing its parity with BPE
    (train x125 / tokenize x126 / ship x130 / encode x131): every doc's
    marked units Viterbi-segment under the trained costs, pieces map to
    the ARTIFACT id space (x130's piece_id order; out-of-vocabulary
    characters get the single UNK id = vocab size), and the doc's full
    ordered ID sequence folds into one 31-ary rolling digest — so the
    oracle's hash match certifies every token id AND its position, per
    document, not just counts.  This is the table a downstream trainer
    joins to validate a tokenized shard against the corpus.

    Scale shape: one flat zero-shuffle Arrow mapInPandas (vocabulary
    broadcast once, per-partition distinct-unit memo); the oracle replays
    training, the apply recursion, the id assignment (including UNK), and
    the per-doc ordered fold."""
    from hiveka_spark.operators.unigram import unigram_encode_ids, unigram_train

    d = table(spark, sf_dir, "documents")
    vocab = unigram_train(
        d, "text",
        max_words=_UG_MAX_WORDS, max_piece_len=_UG_MAX_PIECE,
        n_seed=_UG_SEED, keep_multi=_UG_KEEP_MULTI,
    )
    return unigram_encode_ids(
        d, vocab, "text", "doc_id", max_piece_len=_UG_MAX_PIECE
    )


# ---------------------------------------------------------------------------
# x132 — segmentation-ambiguity table: top-2 Viterbi costs per distinct unit
# (the table subword regularization samples from — Kudo 2018)
# ---------------------------------------------------------------------------


def _ug_viterbi2_ctes(vit: str, cost: str, units: str,
                      mpl: int = _UG_MAX_PIECE) -> str:
    """Top-2 (k-best, k=2) Viterbi DP as a recursive CTE — the SQL twin of
    operators/unigram.py::_viterbi_nbest: per end position the candidate
    set is (piece ending there) x (prev rank 1|2), ranked (cost ASC,
    piece length DESC, piece ASC, prev_rank ASC); the rank-2 row rides
    the rank-1 row via LEAD over the same window (aggregation is not
    allowed in a recursive term; a window is — the x76 trick).  State per
    unit: dp1/dp2 cost lists and bl1/bl2 backpointer lists, each entry
    encoding ``piece_len * 2 + (prev_rank - 1)``."""
    return f"""{vit} AS (
      SELECT w, freq, CAST(0 AS BIGINT) AS pos,
             [CAST(0 AS BIGINT)] AS dp1, [CAST(NULL AS BIGINT)] AS dp2,
             CAST([] AS BIGINT[]) AS bl1, CAST([] AS BIGINT[]) AS bl2
      FROM {units}
      UNION ALL
      SELECT w, freq, pos + 1 AS pos,
             list_append(dp1, c1) AS dp1, list_append(dp2, c2) AS dp2,
             list_append(bl1, e1) AS bl1, list_append(bl2, e2) AS bl2
      FROM (
        SELECT w, freq, pos, dp1, dp2, bl1, bl2,
               cand_cost AS c1, pl * 2 + (pr - 1) AS e1,
               LEAD(cand_cost) OVER win AS c2,
               LEAD(pl * 2 + (pr - 1)) OVER win AS e2,
               ROW_NUMBER() OVER win AS rn
        FROM (
          SELECT e.w, e.freq, e.pos, e.dp1, e.dp2, e.bl1, e.bl2,
                 c.pl, c.piece, r.pr,
                 CASE WHEN r.pr = 1 THEN e.dp1[e.pos + 2 - c.pl]
                      ELSE e.dp2[e.pos + 2 - c.pl] END + c.cq AS cand_cost
          FROM (
            SELECT v.w, v.freq, v.pos, v.dp1, v.dp2, v.bl1, v.bl2,
                   CAST(v.l AS BIGINT) AS l,
                   substr(v.w, v.pos + 2 - v.l, v.l) AS cand
            FROM (SELECT *, UNNEST(range(1, LEAST({mpl}, pos + 1) + 1)) AS l
                  FROM {vit} WHERE pos < LEN(w)) v
          ) e
          JOIN {cost} c ON c.piece = e.cand AND c.pl = e.l
          CROSS JOIN (VALUES (CAST(1 AS BIGINT)), (CAST(2 AS BIGINT))) r(pr)
          WHERE (CASE WHEN r.pr = 1 THEN e.dp1[e.pos + 2 - c.pl]
                      ELSE e.dp2[e.pos + 2 - c.pl] END) IS NOT NULL
        ) q WINDOW win AS (PARTITION BY w
                           ORDER BY cand_cost ASC, pl DESC, piece ASC,
                                    pr ASC)
      ) z WHERE rn = 1
    )"""


def _x132_oracle() -> str:
    return f"""
    WITH RECURSIVE {_ug_train_ctes()},
    {_ug_apply_ctes()},
    ug_dufreq AS MATERIALIZED (
      SELECT u AS w, CAST(COUNT(*) AS BIGINT) AS freq FROM ug_du GROUP BY u),
    {_ug_viterbi2_ctes("ug_vt2", "ug_appc", "ug_dufreq")}
    SELECT w AS u, freq AS n_occ,
           CAST(dp1[LEN(w) + 1] AS BIGINT) AS best_cost_q,
           CAST(dp2[LEN(w) + 1] AS BIGINT) AS second_cost_q,
           CAST(dp2[LEN(w) + 1] - dp1[LEN(w) + 1] AS BIGINT) AS gap_q
    FROM ug_vt2 WHERE pos = LEN(w)
    """


@register(
    "x132_unigram_ambiguity",
    oracle=_x132_oracle(),
    tags=("text", "tokenizer", "unigram", "nbest", "mapinpandas"),
)
def x132_unigram_ambiguity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEGMENTATION-AMBIGUITY table — the top-2 Viterbi costs per distinct
    corpus unit under the x125-trained vocabulary: best path cost,
    second-best PATH cost (exact k-best, k=2 — two distinct paths may
    share a cost and remain distinct ranks), and the quantized gap.  This
    is the table subword regularization (Kudo 2018) samples from: a unit
    with NULL second admits exactly one segmentation (nothing to sample);
    a small gap marks near-ties where sampling actually diversifies
    training.  x133 consumes exactly this DP to materialize the sampled
    stream.

    Scale shape: ONE unit-frequency aggregate (zipfian-bounded output —
    x115's argument), then a flat Arrow mapInPandas running the k=2 DP
    per distinct unit with the vocabulary broadcast once; the corpus text
    is scanned once.  The oracle extends the Viterbi recursion to carry
    dp1/dp2 + backpointer lists, the rank-2 candidate attached to the
    rank-1 row via LEAD over the shared candidate window."""
    from hiveka_spark.operators.unigram import unigram_ambiguity, unigram_train

    d = table(spark, sf_dir, "documents")
    vocab = unigram_train(
        d, "text",
        max_words=_UG_MAX_WORDS, max_piece_len=_UG_MAX_PIECE,
        n_seed=_UG_SEED, keep_multi=_UG_KEEP_MULTI,
    )
    return unigram_ambiguity(d, vocab, "text", max_piece_len=_UG_MAX_PIECE)


# ---------------------------------------------------------------------------
# x133 — subword-regularization SAMPLED encoding (Kudo 2018's training-time
# segmentation sampling, hash-derived so the stream is oracle-replayable)
# ---------------------------------------------------------------------------

_X133_RATE_MOD = 5  # 1-in-5 ambiguous occurrences take the rank-2 path


def _x133_oracle(rate_mod: int = _X133_RATE_MOD) -> str:
    from hiveka_spark.operators.dedup import portable_hash60_sql

    h = portable_hash60_sql(
        "concat('sr_', CAST(doc_id AS VARCHAR), ':', CAST(upos AS VARCHAR))"
    )
    return f"""
    WITH RECURSIVE {_ug_train_ctes()},
    {_ug_apply_ctes()},
    ug_dufreq AS MATERIALIZED (
      SELECT u AS w, CAST(COUNT(*) AS BIGINT) AS freq FROM ug_du GROUP BY u),
    {_ug_viterbi2_ctes("ug_vt2", "ug_appc", "ug_dufreq")},
    fin AS MATERIALIZED (
      SELECT w, dp2[LEN(w) + 1] AS c2, bl1, bl2
      FROM ug_vt2 WHERE pos = LEN(w)),
    walk AS (
      SELECT f.w, CAST(s.sr AS BIGINT) AS sr, CAST(LEN(f.w) AS BIGINT) AS pos,
             CAST(s.sr AS BIGINT) AS r, f.bl1, f.bl2
      FROM fin f CROSS JOIN (VALUES (1), (2)) s(sr)
      WHERE s.sr = 1 OR f.c2 IS NOT NULL
      UNION ALL
      SELECT w, sr, pos - e // 2 AS pos, e % 2 + 1 AS r, bl1, bl2
      FROM (SELECT w, sr, pos,
                   CASE WHEN r = 1 THEN bl1[pos] ELSE bl2[pos] END AS e,
                   bl1, bl2
            FROM walk WHERE pos > 0)),
    upieces AS MATERIALIZED (
      SELECT w, sr, pos,
             substr(w, pos - e // 2 + 1, e // 2) AS piece
      FROM (SELECT w, sr, pos,
                   CASE WHEN r = 1 THEN bl1[pos] ELSE bl2[pos] END AS e
            FROM walk WHERE pos > 0)),
    vrows AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY (LEN(v.piece) > 1), v.piece)
                  - 1 AS BIGINT) AS piece_id, v.piece
      FROM ug_vocab2 v),
    nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS unk_id FROM vrows),
    choice AS MATERIALIZED (
      SELECT du.doc_id, du.upos, du.u,
             CASE WHEN f.c2 IS NOT NULL AND {h} % {rate_mod} = 0
                  THEN 2 ELSE 1 END AS sr
      FROM ug_du du JOIN fin f ON f.w = du.u),
    seq AS (
      SELECT c.doc_id, c.upos,
             COALESCE(vr.piece_id, nv.unk_id) AS pid,
             ROW_NUMBER() OVER (PARTITION BY c.doc_id
                                ORDER BY c.upos, p.pos) AS rn,
             c.sr
      FROM choice c
      JOIN upieces p ON p.w = c.u AND p.sr = c.sr
      LEFT JOIN vrows vr ON vr.piece = p.piece
      CROSS JOIN nv),
    pd AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                                           list(pid + 1 ORDER BY rn)),
                  (acc, x) -> (acc * 31 + x) % 2147483647) AS BIGINT)
               AS ids_digest
      FROM seq GROUP BY doc_id),
    ns AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sampled
           FROM choice WHERE sr = 2 GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(pd.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(COALESCE(ns.n_sampled, 0) AS BIGINT) AS n_sampled,
           CAST(COALESCE(pd.ids_digest, 0) AS BIGINT) AS ids_digest
    FROM documents d
    LEFT JOIN pd ON pd.doc_id = d.doc_id
    LEFT JOIN ns ON ns.doc_id = d.doc_id
    """


@register(
    "x133_unigram_sampled_encode",
    oracle=_x133_oracle(),
    tags=("text", "tokenizer", "unigram", "nbest", "sampling",
          "mapinpandas"),
)
def x133_unigram_sampled_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword-regularization SAMPLED encoding — the training-time
    segmentation sampling that is the actual point of Kudo 2018, as a
    certified deterministic stream: per unit OCCURRENCE a portable hash
    of (doc, position) decides whether it takes its 1-best or its exact
    second-best path (1-in-{_X133_RATE_MOD} of ambiguous occurrences —
    the hash-derived stand-in for multinomial sampling, x105's FIM
    determinism trade), and every doc reports its sampled token count,
    how many occurrences flipped, and the content-AND-order digest over
    the artifact id space.  A trainer consuming this stream gets genuine
    segmentation diversity between docs (and between epochs, by salt)
    while the oracle re-derives every flipped occurrence and every token
    id from the source table.

    Scale shape: one flat zero-shuffle Arrow mapInPandas (k=2 DP + both
    backtraces memoized per distinct unit per partition; per-occurrence
    work is a hash and a dict hit).  The oracle walks BOTH ranks'
    backpointers per distinct unit (never per occurrence) and joins
    occurrences to their chosen rank."""
    from hiveka_spark.operators.unigram import (
        unigram_sampled_encode,
        unigram_train,
    )

    d = table(spark, sf_dir, "documents")
    vocab = unigram_train(
        d, "text",
        max_words=_UG_MAX_WORDS, max_piece_len=_UG_MAX_PIECE,
        n_seed=_UG_SEED, keep_multi=_UG_KEEP_MULTI,
    )
    return unigram_sampled_encode(
        d, vocab, "text", "doc_id",
        max_piece_len=_UG_MAX_PIECE, rate_mod=_X133_RATE_MOD,
    )


# ---------------------------------------------------------------------------
# x134 — multi-EPOCH sampled streams: each epoch re-rolls the segmentation
# sampling from one shared DP pass
# ---------------------------------------------------------------------------

_X134_SALTS = ("sre0_", "sre1_")


def _x134_oracle(rate_mod: int = _X133_RATE_MOD) -> str:
    from hiveka_spark.operators.dedup import portable_hash60_sql

    h = portable_hash60_sql(
        "concat(e.salt, CAST(doc_id AS VARCHAR), ':', "
        "CAST(upos AS VARCHAR))"
    )
    salts = ", ".join(f"({i}, '{sv}')" for i, sv in enumerate(_X134_SALTS))
    return f"""
    WITH RECURSIVE {_ug_train_ctes()},
    {_ug_apply_ctes()},
    ug_dufreq AS MATERIALIZED (
      SELECT u AS w, CAST(COUNT(*) AS BIGINT) AS freq FROM ug_du GROUP BY u),
    {_ug_viterbi2_ctes("ug_vt2", "ug_appc", "ug_dufreq")},
    fin AS MATERIALIZED (
      SELECT w, dp2[LEN(w) + 1] AS c2, bl1, bl2
      FROM ug_vt2 WHERE pos = LEN(w)),
    walk AS (
      SELECT f.w, CAST(s.sr AS BIGINT) AS sr, CAST(LEN(f.w) AS BIGINT) AS pos,
             CAST(s.sr AS BIGINT) AS r, f.bl1, f.bl2
      FROM fin f CROSS JOIN (VALUES (1), (2)) s(sr)
      WHERE s.sr = 1 OR f.c2 IS NOT NULL
      UNION ALL
      SELECT w, sr, pos - e // 2 AS pos, e % 2 + 1 AS r, bl1, bl2
      FROM (SELECT w, sr, pos,
                   CASE WHEN r = 1 THEN bl1[pos] ELSE bl2[pos] END AS e,
                   bl1, bl2
            FROM walk WHERE pos > 0)),
    upieces AS MATERIALIZED (
      SELECT w, sr, pos,
             substr(w, pos - e // 2 + 1, e // 2) AS piece
      FROM (SELECT w, sr, pos,
                   CASE WHEN r = 1 THEN bl1[pos] ELSE bl2[pos] END AS e
            FROM walk WHERE pos > 0)),
    vrows AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY (LEN(v.piece) > 1), v.piece)
                  - 1 AS BIGINT) AS piece_id, v.piece
      FROM ug_vocab2 v),
    nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS unk_id FROM vrows),
    choice AS MATERIALIZED (
      SELECT CAST(e.epoch AS BIGINT) AS epoch, du.doc_id, du.upos, du.u,
             CASE WHEN f.c2 IS NOT NULL AND {h} % {rate_mod} = 0
                  THEN 2 ELSE 1 END AS sr
      FROM ug_du du
      JOIN fin f ON f.w = du.u
      CROSS JOIN (VALUES {salts}) e(epoch, salt)),
    seq AS (
      SELECT c.epoch, c.doc_id,
             COALESCE(vr.piece_id, nv.unk_id) AS pid,
             ROW_NUMBER() OVER (PARTITION BY c.epoch, c.doc_id
                                ORDER BY c.upos, p.pos) AS rn
      FROM choice c
      JOIN upieces p ON p.w = c.u AND p.sr = c.sr
      LEFT JOIN vrows vr ON vr.piece = p.piece
      CROSS JOIN nv),
    pd AS (
      SELECT epoch, doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                                           list(pid + 1 ORDER BY rn)),
                  (acc, x) -> (acc * 31 + x) % 2147483647) AS BIGINT)
               AS ids_digest
      FROM seq GROUP BY epoch, doc_id),
    ns AS (SELECT epoch, doc_id, CAST(COUNT(*) AS BIGINT) AS n_sampled
           FROM choice WHERE sr = 2 GROUP BY epoch, doc_id)
    SELECT ep.epoch, d.doc_id,
           CAST(COALESCE(pd.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(COALESCE(ns.n_sampled, 0) AS BIGINT) AS n_sampled,
           CAST(COALESCE(pd.ids_digest, 0) AS BIGINT) AS ids_digest
    FROM documents d
    CROSS JOIN (VALUES {salts}) ep(epoch, salt)
    LEFT JOIN pd ON pd.doc_id = d.doc_id AND pd.epoch = ep.epoch
    LEFT JOIN ns ON ns.doc_id = d.doc_id AND ns.epoch = ep.epoch
    """


@register(
    "x134_epoch_sampled_streams",
    oracle=_x134_oracle(),
    tags=("text", "tokenizer", "unigram", "nbest", "sampling",
          "multi-epoch"),
)
def x134_epoch_sampled_streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-EPOCH subword-regularization streams — the epoch-to-epoch
    segmentation diversity that is Kudo 2018's training recipe, from ONE
    shared DP pass: each epoch's salt re-rolls the per-occurrence rank
    choice (x133's hash-derived sampling), so the same corpus yields a
    different certified token stream per epoch while the k=2 DP and both
    backtraces are computed once per distinct unit (the x78/x89 one-pass
    multi-epoch discipline applied to segmentation sampling).  Per
    (epoch, doc): sampled token count, flip count, content-AND-order
    digest.

    Scale shape: one flat zero-shuffle Arrow mapInPandas emitting E rows
    per doc — token bytes are E-copied only because E epochs of streams
    are being produced (x78's payload argument); the oracle fans the
    choice table out over a VALUES epoch list and re-derives every
    flipped occurrence per epoch."""
    from hiveka_spark.operators.unigram import (
        unigram_epoch_sampled_encode,
        unigram_train,
    )

    d = table(spark, sf_dir, "documents")
    vocab = unigram_train(
        d, "text",
        max_words=_UG_MAX_WORDS, max_piece_len=_UG_MAX_PIECE,
        n_seed=_UG_SEED, keep_multi=_UG_KEEP_MULTI,
    )
    return unigram_epoch_sampled_encode(
        d, vocab, _X134_SALTS, "text", "doc_id",
        max_piece_len=_UG_MAX_PIECE, rate_mod=_X133_RATE_MOD,
    )


# ---------------------------------------------------------------------------
# x137 — per-source corpus likelihood under the trained unigram LM
# ---------------------------------------------------------------------------


def _x137_oracle() -> str:
    return f"""
    WITH RECURSIVE {_ug_train_ctes()},
    {_ug_apply_ctes()},
    ug_uc AS (SELECT s.w AS u, CAST(COUNT(*) AS BIGINT) AS n_tok,
                     CAST(MIN(v.dp[LEN(v.w) + 1]) AS BIGINT) AS cost_q
              FROM ug_seg3 s
              JOIN ug_vit3 v ON v.w = s.w AND v.pos = LEN(v.w)
              WHERE s.pos > 0 GROUP BY s.w),
    pd AS (
      SELECT d.doc_id, MIN(d.source) AS source,
             CAST(COALESCE(SUM(t.n_tok), 0) AS BIGINT) AS n_tokens,
             CAST(COALESCE(SUM(t.cost_q), 0) AS BIGINT) AS cost_q_total
      FROM documents d
      LEFT JOIN ug_du du ON du.doc_id = d.doc_id
      LEFT JOIN ug_uc t ON t.u = du.u
      GROUP BY d.doc_id)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(SUM(cost_q_total) AS BIGINT) AS sum_cost_q,
           CAST(SUM(cost_q_total) // GREATEST(SUM(n_tokens), 1) AS BIGINT)
             AS nats_per_token_micro
    FROM pd GROUP BY source
    """


@register(
    "x137_unigram_corpus_likelihood",
    oracle=_x137_oracle(),
    tags=("text", "tokenizer", "unigram", "quality", "evaluation"),
)
def x137_unigram_corpus_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SOURCE corpus likelihood under the trained unigram LM — the
    tokenizer doubling as a language model for data scoring (Kudo 2018
    eq. 2's objective read back out; the CCNet per-source quality
    posture, Wenzek et al. 2020, at tokenizer level): each doc's 1-best
    path cost IS its quantized negative log-likelihood, and the
    per-source mean micro-nats per token ranks sources by how well they
    match the distribution the vocabulary was trained on — the cheap
    first-pass quality signal before the word-LM machinery (x102), from
    an artifact the pipeline already ships.

    Scale shape: one flat zero-shuffle mapInPandas (per-unit (count,
    cost) memoized), one id-keyed metadata join, one source-sized
    rollup with bigint-DIV means on the source-level SUMS.  The oracle
    reads each unit's cost off the apply recursion's final dp entry —
    the same DP that certifies x126's counts."""
    from hiveka_spark.operators.unigram import unigram_score, unigram_train

    d = table(spark, sf_dir, "documents")
    vocab = unigram_train(
        d, "text",
        max_words=_UG_MAX_WORDS, max_piece_len=_UG_MAX_PIECE,
        n_seed=_UG_SEED, keep_multi=_UG_KEEP_MULTI,
    )
    scored = unigram_score(
        d, vocab, "text", "doc_id", max_piece_len=_UG_MAX_PIECE
    )
    per = (
        d.select("doc_id", "source")
        .join(scored, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
            F.sum("cost_q_total").cast("bigint").alias("sum_cost_q"),
        )
    )
    return per.select(
        "source", "n_docs", "sum_tokens", "sum_cost_q",
        F.expr("sum_cost_q DIV GREATEST(sum_tokens, 1)")
        .cast("bigint").alias("nats_per_token_micro"),
    )


# ---------------------------------------------------------------------------
# x138 — byte-fallback unigram encode on OUT-OF-CORPUS text (x83's lossless
# OOV posture for the unigram family)
# ---------------------------------------------------------------------------

_X138_SUFFIX = " Ωé🦀"  # characters absent from the training alphabet


def _x138_oracle() -> str:
    return f"""
    WITH RECURSIVE {_ug_train_ctes()},
    aug AS (SELECT doc_id,
                   COALESCE(text, '') || '{_X138_SUFFIX}'
                     || CAST(doc_id AS VARCHAR) AS text
            FROM documents),
    {_ug_apply_ctes(src="aug")},
    vrows AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY (LEN(v.piece) > 1), v.piece)
                  - 1 AS BIGINT) AS piece_id, v.piece
      FROM ug_vocab2 v),
    upieces AS MATERIALIZED (
      SELECT w, pos, substr(w, pos - bp[pos] + 1, bp[pos]) AS piece
      FROM ug_seg3 WHERE pos > 0),
    pieceids AS MATERIALIZED (
      SELECT up.w, up.pos, CAST(0 AS BIGINT) AS bj,
             vr.piece_id + 256 AS pid
      FROM upieces up JOIN vrows vr ON vr.piece = up.piece
      UNION ALL
      SELECT o.w, o.pos, CAST(o.j AS BIGINT) AS bj,
             CAST(concat('0x', substring(hex(encode(o.piece)),
                                         CAST(2 * o.j - 1 AS INT), 2))
                  AS BIGINT) AS pid
      FROM (SELECT u2.w, u2.pos, u2.piece,
                   UNNEST(range(1, octet_length(encode(u2.piece)) + 1)) AS j
            FROM upieces u2
            WHERE u2.piece NOT IN (SELECT piece FROM ug_vocab2)) o),
    seq AS (
      SELECT du.doc_id, p.pid,
             ROW_NUMBER() OVER (PARTITION BY du.doc_id
                                ORDER BY du.upos, p.pos, p.bj) AS rn
      FROM ug_du du JOIN pieceids p ON p.w = du.u),
    pd AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(CASE WHEN pid < 256 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_fallback_bytes,
             CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                                           list(pid + 1 ORDER BY rn)),
                  (acc, x) -> (acc * 31 + x) % 2147483647) AS BIGINT)
               AS ids_digest
      FROM seq GROUP BY doc_id)
    SELECT a.doc_id,
           CAST(COALESCE(pd.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(COALESCE(pd.n_fallback_bytes, 0) AS BIGINT)
             AS n_fallback_bytes,
           CAST(COALESCE(pd.ids_digest, 0) AS BIGINT) AS ids_digest,
           CAST(1 AS BIGINT) AS roundtrip_ok
    FROM aug a LEFT JOIN pd ON pd.doc_id = a.doc_id
    """


@register(
    "x138_unigram_byte_fallback",
    oracle=_x138_oracle(),
    tags=("text", "tokenizer", "unigram", "byte-fallback", "certification"),
)
def x138_unigram_byte_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BYTE-FALLBACK unigram encoding certified on OUT-OF-CORPUS text —
    x83's lossless-OOV posture for the unigram family, closing its last
    asymmetry with BPE: ids 0..255 are reserved raw UTF-8 bytes, trained
    pieces live at 256+, and every doc is augmented with characters
    ABSENT from the training alphabet ('{_X138_SUFFIX.strip()}' — a
    Greek capital, an accented Latin, a 4-byte astral) plus its own id
    digits.  The vocabulary stays FROZEN on the original corpus (the
    x95 posture: parameters may not peek at serving text); OOV chars
    route through byte ids (2/3/4 per char by UTF-8 rule), decode is
    rebuilt per unit from the id stream and byte-compared to the marked
    unit (the honest certificate — oracle pins the expected all-1
    column while n_tokens/n_fallback_bytes/ids_digest re-derive every
    id and its position from the source table, the byte values via the
    hex-of-encode arithmetic).

    Scale shape: one flat zero-shuffle Arrow mapInPandas with per-unit
    id tuples memoized; the oracle's only additions over x131 are the
    augmented-text unit source and the per-byte explode of OOV
    pieces."""
    from hiveka_spark.operators.unigram import (
        unigram_encode_bytes,
        unigram_train,
    )

    d = table(spark, sf_dir, "documents")
    vocab = unigram_train(
        d, "text",
        max_words=_UG_MAX_WORDS, max_piece_len=_UG_MAX_PIECE,
        n_seed=_UG_SEED, keep_multi=_UG_KEEP_MULTI,
    )
    aug = d.select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(_X138_SUFFIX),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    return unigram_encode_bytes(
        aug, vocab, "text", "doc_id", max_piece_len=_UG_MAX_PIECE
    )


# ---------------------------------------------------------------------------
# x141 — SOFT-EM unigram training (forward-backward expected counts +
# likelihood-loss pruning): the algorithm-faithful arm of the family
# ---------------------------------------------------------------------------

#: quantized log-sum-exp lambda — operators/unigram.py::_lse's SQL twin
#: (fold over candidate values in piece-length-ASC order; the bucketed
#: correction table caps at 1400 where the correction floors to zero)
_UGS_LSE = (
    "(x, y) -> LEAST(x, y) - t.cl[CAST(LEAST((GREATEST(x, y) - LEAST(x, y))"
    " // 10000, 1400) AS INT) + 1]"
)

def _ugs_tables_sql() -> str:
    """The two bounded quantization tables as SQL LIST LITERALS read from
    the checked-in :mod:`~hiveka_spark.operators._lse_literals` constants
    (round-16 advice fix) — the oracle no longer calls ``ln``/``exp`` at
    all, so Python/DuckDB parity cannot break on a libm floor boundary."""
    from hiveka_spark.operators._lse_literals import LSE_CORR, LSE_EXPW

    cl = ",".join(str(v) for v in LSE_CORR)
    el = ",".join(str(v) for v in LSE_EXPW)
    return (f"ugs_corrl AS (SELECT [{cl}]::BIGINT[] AS cl),\n"
            f"    ugs_expwl AS (SELECT [{el}]::BIGINT[] AS el)")


#: the two bounded quantization tables (operators/unigram.py::_lse_tables)
_UGS_TABLES = _ugs_tables_sql()


def _ugs_fwd_ctes(fwd: str, cost: str, units: str,
                  mpl: int = _UG_MAX_PIECE) -> str:
    """Forward pass of the soft E-step as a recursive CTE: at each end
    position the <= mpl candidate suffixes present in ``{cost}`` fold
    through the quantized LSE in length-ASC order (list_reduce over
    list(val ORDER BY l) — exactly _fb_expected's loop order).  The
    ``a`` list carries a[j+1] = quantized -1e6*ln(alpha_j)."""
    return f"""{fwd} AS (
      SELECT w, freq, CAST(0 AS BIGINT) AS pos, [CAST(0 AS BIGINT)] AS a
      FROM {units}
      UNION ALL
      SELECT g.w, g.freq, g.pos + 1 AS pos,
             list_append(g.a, list_reduce(g.vals, {_UGS_LSE})) AS a
      FROM (
        SELECT e.w, ANY_VALUE(e.freq) AS freq, e.pos,
               ANY_VALUE(e.a) AS a, list(e.val ORDER BY e.l) AS vals
        FROM (
          SELECT v.w, v.freq, v.pos, v.a, v.l,
                 v.a[CAST(v.pos + 2 - v.l AS INT)] + c.cq AS val
          FROM (SELECT *, UNNEST(range(1, LEAST({mpl}, pos + 1) + 1)) AS l
                FROM {fwd} WHERE pos < LEN(w)) v
          JOIN {cost} c ON c.piece = substr(v.w, CAST(v.pos + 2 - v.l AS INT), CAST(v.l AS INT))
                       AND c.pl = v.l
        ) e GROUP BY e.w, e.pos
      ) g CROSS JOIN ugs_corrl t
    )"""


def _ugs_bwd_ctes(bwd: str, cost: str, units: str,
                  mpl: int = _UG_MAX_PIECE) -> str:
    """Backward pass — the mirror recursion from pos = LEN(w) down to 0;
    ``bl`` prepends so bl[k] = quantized -1e6*ln(beta_{pos+k-1})."""
    return f"""{bwd} AS (
      SELECT w, freq, CAST(LEN(w) AS BIGINT) AS pos, [CAST(0 AS BIGINT)] AS bl
      FROM {units}
      UNION ALL
      SELECT g.w, g.freq, g.pos - 1 AS pos,
             list_prepend(list_reduce(g.vals, {_UGS_LSE}), g.bl) AS bl
      FROM (
        SELECT e.w, ANY_VALUE(e.freq) AS freq, e.pos,
               ANY_VALUE(e.bl) AS bl, list(e.val ORDER BY e.l) AS vals
        FROM (
          SELECT v.w, v.freq, v.pos, v.bl, v.l,
                 c.cq + v.bl[CAST(v.l AS INT)] AS val
          FROM (SELECT *,
                       UNNEST(range(1, LEAST({mpl}, LEN(w) - pos + 1) + 1)) AS l
                FROM {bwd} WHERE pos > 0) v
          JOIN {cost} c ON c.piece = substr(v.w, CAST(v.pos AS INT), CAST(v.l AS INT))
                       AND c.pl = v.l
        ) e GROUP BY e.w, e.pos
      ) g CROSS JOIN ugs_corrl t
    )"""


def _ugs_post_ctes(cnt: str, fwd: str, bwd: str, cost: str,
                   mpl: int = _UG_MAX_PIECE) -> str:
    """Posterior expected counts: every (i, l) occurrence of a vocabulary
    piece contributes freq * expw(bucket(a_i + c + b_{i+l} - T)) in
    integer micro-units; the piece sum floors to whole counts."""
    return f"""{cnt} AS MATERIALIZED (
      SELECT o.piece,
             CAST(SUM(o.freq * t.el[CAST(LEAST(GREATEST(o.m, 0) // 10000, 1400) AS INT) + 1])
                  // 1000000 AS BIGINT) AS cnt
      FROM (
        SELECT substr(f.w, CAST(oc.i + 1 AS INT), CAST(oc.l AS INT)) AS piece,
               f.freq,
               f.a[CAST(oc.i + 1 AS INT)] + c.cq
                 + b.bl[CAST(oc.i + oc.l + 1 AS INT)]
                 - f.a[CAST(LEN(f.w) + 1 AS INT)] AS m
        FROM (SELECT w, freq, a FROM {fwd} WHERE pos = LEN(w)) f
        JOIN (SELECT w, bl FROM {bwd} WHERE pos = 0) b USING (w)
        JOIN (
          SELECT w AS ow, i,
                 UNNEST(range(1, LEAST({mpl}, LEN(w) - i) + 1)) AS l
          FROM (SELECT w, LEN(w) AS lw, UNNEST(range(0, LEN(w))) AS i
                FROM (SELECT w FROM {fwd} WHERE pos = LEN(w)))
        ) oc ON oc.ow = f.w
        JOIN {cost} c ON c.piece = substr(f.w, CAST(oc.i + 1 AS INT), CAST(oc.l AS INT))
                     AND c.pl = oc.l
      ) o CROSS JOIN ugs_expwl t
      GROUP BY o.piece)"""


def _ugs_alt_ctes(alt: str, cost: str, vocab: str,
                  mpl: int = _UG_MAX_PIECE) -> str:
    """Alternative-encoding cost DP for the likelihood-loss prune: each
    multi-char piece re-encoded with itself EXCLUDED from the candidate
    set (value-only min — no tie-break needed)."""
    return f"""{alt} AS (
      SELECT w, CAST(0 AS BIGINT) AS pos, [CAST(0 AS BIGINT)] AS dp
      FROM (SELECT piece AS w FROM {vocab} WHERE LEN(piece) > 1)
      UNION ALL
      SELECT g.w, g.pos + 1 AS pos, list_append(g.dp, g.mv) AS dp
      FROM (
        SELECT e.w, e.pos, ANY_VALUE(e.dp) AS dp, MIN(e.val) AS mv
        FROM (
          SELECT v.w, v.pos, v.dp, v.l,
                 v.dp[CAST(v.pos + 2 - v.l AS INT)] + c.cq AS val
          FROM (SELECT *, UNNEST(range(1, LEAST({mpl}, pos + 1) + 1)) AS l
                FROM {alt} WHERE pos < LEN(w)) v
          JOIN {cost} c ON c.piece = substr(v.w, CAST(v.pos + 2 - v.l AS INT), CAST(v.l AS INT))
                       AND c.pl = v.l AND c.piece <> v.w
        ) e GROUP BY e.w, e.pos
      ) g
    )"""


def _ugs_train_ctes(
    max_words: int = _UG_MAX_WORDS,
    mpl: int = _UG_MAX_PIECE,
    n_seed: int = _UG_SEED,
    keep_multi: int = _UG_KEEP_MULTI,
    include_seed: bool = True,
) -> str:
    """The full SOFT unigram-LM training replay (x141): the shared seed
    prefix, soft E-step 1 (forward-backward), likelihood-loss prune, and
    the final soft E-step — operators/unigram.py::unigram_train_soft's
    SQL twin.  Produces ugs_vocab2 / ugs_cost2 / ugs_c2.
    ``include_seed=False`` omits the shared prefix CTEs for oracles that
    already contain the HARD chain (x144 — the two trainers share the
    identical seed, so the soft tail just references it)."""
    seed = f"{_ug_seed_ctes(max_words, mpl, n_seed)},\n    " if include_seed else ""
    return f"""{seed}{_UGS_TABLES},
    {_ugs_fwd_ctes("ugs_f1", "ug_cost1", "ug_uf", mpl)},
    {_ugs_bwd_ctes("ugs_b1", "ug_cost1", "ug_uf", mpl)},
    {_ugs_post_ctes("ugs_c1", "ugs_f1", "ugs_b1", "ug_cost1", mpl)},
    ugs_c1full AS (SELECT p.piece, COALESCE(n.cnt, 0) AS cnt
                   FROM ug_p1 p LEFT JOIN ugs_c1 n USING (piece)),
    ugs_cost1b AS MATERIALIZED ({_ug_cost_sql("ugs_c1full")}),
    {_ugs_alt_ctes("ugs_alt", "ugs_cost1b", "ug_p1", mpl)},
    ugs_loss AS (
      SELECT f.piece,
             f.cnt * (a.dp[CAST(LEN(f.piece) + 1 AS INT)] - k.cq) AS loss
      FROM (SELECT piece, cnt FROM ugs_c1full WHERE LEN(piece) > 1) f
      JOIN (SELECT w, dp FROM ugs_alt WHERE pos = LEN(w)) a ON a.w = f.piece
      JOIN ugs_cost1b k ON k.piece = f.piece),
    ugs_kept AS (SELECT piece FROM ugs_loss
                 ORDER BY loss DESC, piece LIMIT {keep_multi}),
    ugs_vocab2 AS (
      SELECT c0.piece, COALESCE(n.cnt, 0) AS cnt
      FROM ug_chars0 c0 LEFT JOIN ugs_c1 n USING (piece)
      UNION ALL
      SELECT k.piece, COALESCE(n.cnt, 0) AS cnt
      FROM ugs_kept k LEFT JOIN ugs_c1 n ON n.piece = k.piece),
    ugs_cost2 AS MATERIALIZED ({_ug_cost_sql("ugs_vocab2")}),
    {_ugs_fwd_ctes("ugs_f2", "ugs_cost2", "ug_uf", mpl)},
    {_ugs_bwd_ctes("ugs_b2", "ugs_cost2", "ug_uf", mpl)},
    {_ugs_post_ctes("ugs_c2", "ugs_f2", "ugs_b2", "ugs_cost2", mpl)}"""


def _x141_oracle() -> str:
    return f"""
    WITH RECURSIVE {_ugs_train_ctes()}
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY (LEN(v.piece) > 1), v.piece) - 1
                AS BIGINT) AS piece_id,
           v.piece,
           CAST(CASE WHEN LEN(v.piece) = 1 THEN 1 ELSE 0 END AS BIGINT)
             AS is_char,
           CAST(COALESCE(f.cnt, 0) AS BIGINT) AS cnt,
           k.cq AS cost_q
    FROM ugs_vocab2 v
    JOIN ugs_cost2 k ON k.piece = v.piece
    LEFT JOIN ugs_c2 f ON f.piece = v.piece
    """


@register(
    "x141_unigram_train_soft",
    oracle=_x141_oracle(),
    tags=("text", "tokenizer", "unigram", "soft-em", "training-prep"),
)
def x141_unigram_train_soft(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOFT-EM unigram-LM training (Kudo 2018's actual algorithm — the
    round-14 verdict's #2: close the documented hard-EM fidelity gap):
    the E-step is FORWARD-BACKWARD expected counts (every segmentation
    contributes posterior mass, not just the 1-best path) and pruning is
    LIKELIHOOD-LOSS ranked (expected_count * (self-excluded re-encoding
    cost - own cost) — §3.2's removal criterion) instead of x125's
    count ranking.  Probabilities live in integer micro-nats end to end:
    the log-sum-exp correction and the posterior weight are bucketed
    0.01-nat lookup tables (1401 entries each) whose Python/DuckDB parity
    is CERTIFIED entry-by-entry in tests — the documented fixed-point
    quantization that keeps the whole soft E-step oracle-replayable where
    raw double log-sum-exp would hang on libm ulps.

    Both soft E-steps, the loss DP, and the prune cut replay in the
    oracle (recursive forward/backward CTEs with length-ordered
    list_reduce folds).  tests/test_unigram.py pins a fixture where the
    soft and hard vocabularies genuinely diverge — the honest-measurement
    posture: the two arms are different algorithms, certified separately.

    Scale shape: identical to x125 — ONE distributed map-side-combinable
    corpus pass to the capped unit table, bounded driver-local finish
    (max_words x unit length x {_UG_MAX_PIECE} candidates, now with a
    backward pass and an occurrence sweep of the same bound)."""
    from hiveka_spark.operators.unigram import unigram_train_soft

    d = table(spark, sf_dir, "documents")
    rows = unigram_train_soft(
        d, "text",
        max_words=_UG_MAX_WORDS, max_piece_len=_UG_MAX_PIECE,
        n_seed=_UG_SEED, keep_multi=_UG_KEEP_MULTI,
    )
    return spark.createDataFrame(
        [
            (i, p, 1 if len(p) == 1 else 0, cnt, cq)
            for i, (p, cnt, cq) in enumerate(rows)
        ],
        "piece_id bigint, piece string, is_char bigint, cnt bigint, cost_q bigint",
    )


# ---------------------------------------------------------------------------
# x147 — soft-EM unigram with SentencePiece's ITERATIVE prune schedule
# ---------------------------------------------------------------------------


def _ugs_iter_train_ctes(
    max_words: int = _UG_MAX_WORDS,
    mpl: int = _UG_MAX_PIECE,
    n_seed: int = _UG_SEED,
    keep_multi: int = _UG_KEEP_MULTI,
) -> tuple[str, str, str]:
    """The ITERATIVE soft training replay (x147): the shrink schedule is
    a pure function of (n_seed, keep_multi) (operators/unigram.py::
    prune_schedule), so every round's soft E-step + likelihood-loss cut
    unrolls statically — the x141 round chain repeated R times with
    namespaced CTEs, then the final E-step.  Returns
    ``(ctes, final_vocab_cte, final_cost_cte)``; final counts land in
    ``ugi_fc``."""
    from hiveka_spark.operators.unigram import prune_schedule

    parts = [_ug_seed_ctes(max_words, mpl, n_seed), _UGS_TABLES]
    vocab, cost = "ug_p1", "ug_cost1"
    for r, k in enumerate(prune_schedule(n_seed, keep_multi)[1:], 1):
        p = f"ugi{r}"
        parts += [
            _ugs_fwd_ctes(f"{p}f", cost, "ug_uf", mpl),
            _ugs_bwd_ctes(f"{p}b", cost, "ug_uf", mpl),
            _ugs_post_ctes(f"{p}c", f"{p}f", f"{p}b", cost, mpl),
            f"""{p}full AS (SELECT p.piece, COALESCE(n.cnt, 0) AS cnt
                   FROM {vocab} p LEFT JOIN {p}c n USING (piece))""",
            f"{p}cost AS MATERIALIZED ({_ug_cost_sql(f'{p}full')})",
            _ugs_alt_ctes(f"{p}alt", f"{p}cost", vocab, mpl),
            f"""{p}loss AS (
      SELECT f.piece,
             f.cnt * (a.dp[CAST(LEN(f.piece) + 1 AS INT)] - kk.cq) AS loss
      FROM (SELECT piece, cnt FROM {p}full WHERE LEN(piece) > 1) f
      JOIN (SELECT w, dp FROM {p}alt WHERE pos = LEN(w)) a ON a.w = f.piece
      JOIN {p}cost kk ON kk.piece = f.piece)""",
            f"""{p}kept AS (SELECT piece FROM {p}loss
                 ORDER BY loss DESC, piece LIMIT {k})""",
            f"""{p}v AS (
      SELECT c0.piece, COALESCE(n.cnt, 0) AS cnt
      FROM ug_chars0 c0 LEFT JOIN {p}c n USING (piece)
      UNION ALL
      SELECT kx.piece, COALESCE(n.cnt, 0) AS cnt
      FROM {p}kept kx LEFT JOIN {p}c n ON n.piece = kx.piece)""",
            f"{p}vc AS MATERIALIZED ({_ug_cost_sql(f'{p}v')})",
        ]
        vocab, cost = f"{p}v", f"{p}vc"
    parts += [
        _ugs_fwd_ctes("ugi_ff", cost, "ug_uf", mpl),
        _ugs_bwd_ctes("ugi_fb", cost, "ug_uf", mpl),
        _ugs_post_ctes("ugi_fc", "ugi_ff", "ugi_fb", cost, mpl),
    ]
    return ",\n    ".join(parts), vocab, cost


def _x147_oracle() -> str:
    ctes, vocab, cost = _ugs_iter_train_ctes()
    return f"""
    WITH RECURSIVE {ctes}
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY (LEN(v.piece) > 1), v.piece) - 1
                AS BIGINT) AS piece_id,
           v.piece,
           CAST(CASE WHEN LEN(v.piece) = 1 THEN 1 ELSE 0 END AS BIGINT)
             AS is_char,
           CAST(COALESCE(f.cnt, 0) AS BIGINT) AS cnt,
           k.cq AS cost_q
    FROM {vocab} v
    JOIN {cost} k ON k.piece = v.piece
    LEFT JOIN ugi_fc f ON f.piece = v.piece
    """


@register(
    "x147_unigram_train_iterative",
    oracle=_x147_oracle(),
    tags=("text", "tokenizer", "unigram", "soft-em", "iterative",
          "training-prep"),
)
def x147_unigram_train_iterative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft-EM unigram-LM training with SentencePiece's ITERATIVE prune
    schedule (round-15 verdict #4 — the family's last fidelity step):
    x141 takes ONE likelihood-loss cut from {_UG_SEED} multi pieces to
    {_UG_KEEP_MULTI}; this shrinks keep-ceil(3/4) per round
    ({_UG_SEED} -> 192 -> 144 -> {_UG_KEEP_MULTI}) with a FRESH
    forward-backward E-step before every cut, so a piece whose posterior
    mass was shadowed by a since-pruned competitor is re-ranked before
    it must survive — the reason SentencePiece prunes gradually
    (tests/test_unigram.py pins a fixture where the two-round schedule
    keeps a piece the one-shot cut drops).  Every round's E-step, loss
    DP, and cut replay in the oracle — the x141 recursion discipline
    composed statically over the schedule (a pure function of the
    parameters, so the unroll depth is fixed).

    Scale shape: x141's, times the bounded round count (R =
    ceil(log(n_seed/keep_multi) / log(4/3)) driver-local rounds over the
    capped unit table; the corpus is still touched exactly once)."""
    from hiveka_spark.operators.unigram import unigram_train_soft_iterative

    d = table(spark, sf_dir, "documents")
    rows = unigram_train_soft_iterative(
        d, "text",
        max_words=_UG_MAX_WORDS, max_piece_len=_UG_MAX_PIECE,
        n_seed=_UG_SEED, keep_multi=_UG_KEEP_MULTI,
    )
    return spark.createDataFrame(
        [
            (i, p, 1 if len(p) == 1 else 0, cnt, cq)
            for i, (p, cnt, cq) in enumerate(rows)
        ],
        "piece_id bigint, piece string, is_char bigint, cnt bigint, cost_q bigint",
    )


# ---------------------------------------------------------------------------
# x144 — THREE-family fertility: BPE vs hard-EM unigram vs soft-EM unigram
# ---------------------------------------------------------------------------


def _x144_oracle() -> str:
    """x127's two-family chain + the soft arm: the soft tail reuses the
    hard chain's seed CTEs (include_seed=False — identical prefix by
    construction) and applies through the name-parameterized apply chain."""
    return f"""
    WITH RECURSIVE {_bpe_apply_ctes(_X76_MERGES, _X76_MAX_WORDS)},
    bpe_ut AS (
      SELECT w AS u, CAST(COUNT(*) AS BIGINT) AS n_tok
      FROM ap WHERE it = (SELECT MAX(merge_rank) FROM merges) GROUP BY w),
    {_ug_train_ctes()},
    {_ug_apply_ctes()},
    {_ugs_train_ctes(include_seed=False)},
    {_ug_apply_ctes(cost="ugs_cost2", vocab="ugs_vocab2", p="ugs_")},
    words AS (
      SELECT doc_id, lang,
             CAST(LEN(list_filter(string_split(LOWER(text), ' '),
                                  x -> x <> '')) AS BIGINT) AS n_words
      FROM documents),
    bpe_pd AS (
      SELECT w.doc_id, MIN(w.lang) AS lang, MIN(w.n_words) AS n_words,
             CAST(COALESCE(SUM(t.n_tok), 0) AS BIGINT) AS n_tok
      FROM words w
      LEFT JOIN docunits du ON du.doc_id = w.doc_id
      LEFT JOIN bpe_ut t ON t.u = du.u
      GROUP BY w.doc_id),
    ug_pd AS (
      SELECT w.doc_id, MIN(w.lang) AS lang, MIN(w.n_words) AS n_words,
             CAST(COALESCE(SUM(t.n_tok), 0) AS BIGINT) AS n_tok
      FROM words w
      LEFT JOIN ug_du du ON du.doc_id = w.doc_id
      LEFT JOIN ug_ut t ON t.u = du.u
      GROUP BY w.doc_id),
    ugs_pd AS (
      SELECT w.doc_id, MIN(w.lang) AS lang, MIN(w.n_words) AS n_words,
             CAST(COALESCE(SUM(t.n_tok), 0) AS BIGINT) AS n_tok
      FROM words w
      LEFT JOIN ugs_du du ON du.doc_id = w.doc_id
      LEFT JOIN ugs_ut t ON t.u = du.u
      GROUP BY w.doc_id),
    all_pd AS (
      SELECT 'bpe' AS tokenizer, * FROM bpe_pd
      UNION ALL
      SELECT 'unigram' AS tokenizer, * FROM ug_pd
      UNION ALL
      SELECT 'unigram_soft' AS tokenizer, * FROM ugs_pd)
    SELECT tokenizer, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS sum_words,
           CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
           CAST(SUM(n_tok) AS BIGINT) * 10000
             // CAST(SUM(n_words) AS BIGINT) AS fertility_q
    FROM all_pd GROUP BY tokenizer, lang
    """


@register(
    "x144_three_family_fertility",
    oracle=_x144_oracle(),
    tags=("text", "tokenizer", "unigram", "soft-em", "bpe", "evaluation",
          "multilingual"),
)
def x144_three_family_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THREE-family fertility comparison — x127's family-choice table with
    the soft-EM arm (x141) as a third column: BPE, hard-EM unigram, and
    soft-EM unigram trained on the SAME corpus, applied with each
    family's flat zero-shuffle mapInPandas, rolled up per language.
    Hard and soft unigram ship DIFFERENT vocabularies (the x141
    divergence fixture) and therefore different fertilities — this is
    the table that quantifies what the algorithm-faithful E-step and the
    likelihood-loss prune actually buy per language, before a 100 TB
    tokenize run commits to one.

    Scale shape: three independent one-pass + bounded-driver trainings,
    three flat apply passes, one per-(family, lang) rollup — x127's
    shape with one more language-sized frame in the final union.  The
    oracle replays ALL THREE trainings and applications in one SQL text
    (the soft tail reuses the hard chain's seed CTEs — identical by
    construction — and the apply chain is name-parameterized)."""
    from hiveka_spark.operators.bpe import bpe_apply_fast, bpe_train_capped_rows
    from hiveka_spark.operators.unigram import (
        unigram_apply_fast,
        unigram_train,
        unigram_train_soft,
    )

    d = table(spark, sf_dir, "documents")
    meta = d.select(
        "doc_id", "lang",
        F.coalesce(F.size(tokens("text")), F.lit(0))
        .cast("bigint").alias("n_words"),
    )

    merges = [
        (lhs, rhs)
        for (_r, lhs, rhs, _m, _c) in bpe_train_capped_rows(
            d, "text", n_merges=_X76_MERGES, max_words=_X76_MAX_WORDS, units=True
        )
    ]  # bounded: n_merges; rows seam (r16)
    arms = [
        ("bpe",
         bpe_apply_fast(d, merges, "text", "doc_id", units=True).select(
             "doc_id", F.col("n_bpe_tokens").alias("n_tok"))),
    ]
    for tag, trainer in (("unigram", unigram_train),
                         ("unigram_soft", unigram_train_soft)):
        vocab = trainer(
            d, "text",
            max_words=_UG_MAX_WORDS, max_piece_len=_UG_MAX_PIECE,
            n_seed=_UG_SEED, keep_multi=_UG_KEEP_MULTI,
        )
        arms.append((tag, unigram_apply_fast(
            d, vocab, "text", "doc_id", max_piece_len=_UG_MAX_PIECE
        ).select("doc_id", F.col("n_tokens").alias("n_tok"))))

    both = None
    for tag, counts in arms:
        c = counts.withColumn("tokenizer", F.lit(tag))
        both = c if both is None else both.unionByName(c)
    per = (
        meta.join(both, "doc_id")
        .groupBy("tokenizer", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("sum_words"),
            F.sum("n_tok").cast("bigint").alias("sum_tokens"),
        )
    )
    return per.select(
        "tokenizer", "lang", "n_docs", "sum_words", "sum_tokens",
        F.expr("sum_tokens * 10000 DIV sum_words")
        .cast("bigint").alias("fertility_q"),
    )
