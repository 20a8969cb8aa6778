"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are JVM-side built-ins (split/filter/transform/
aggregate) — no Python UDFs — so they stay inside whole-stage codegen and
scale linearly with input bytes.  SURVEY.md §2C; no reference analog (the
reference has zero scalar-function code), designed Spark-first.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401  (resolves pandas-UDF type hints under future-annotations)
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# Small per-language marker lexicons for the n-gram/stopword language-ID
# heuristic.  Order matters: deterministic tie-break is list order.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "is", "in", "it"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "es"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "人"],
}

EN_STOPWORDS = ["the", "a", "an", "of", "and", "to", "in", "is", "it", "for", "on", "with"]

# Word-ish tokenization pattern, valid in both Java regex and RE2 (DuckDB):
# letter runs, digit runs, or single non-space symbols — a BPE-ish pre-tokenizer.
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of lowercased text, empties removed."""
    return F.filter(F.split(F.lower(col), " "), lambda w: w != F.lit(""))


def floor4(col: Column) -> Column:
    """Deterministic 4-dp quantization: floor(x*1e4)/1e4.

    ROUND() on small-denominator rationals (token ratios etc.) lands on exact
    decimal half-boundaries where engines disagree (HALF_UP vs HALF_EVEN);
    floor of an identical IEEE-754 double is engine-independent.
    """
    return F.floor(col * 10000.0) / 10000.0


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace + regex token counts and char count."""
    toks = tokens(text_col)
    return df.withColumns(
        {
            "n_tokens": F.size(toks).cast("bigint"),
            "n_regex_tokens": F.size(
                F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_PATTERN), 0)
            ).cast("bigint"),
            "n_chars_actual": F.length(text_col).cast("bigint"),
        }
    )


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document-quality features + composite score.

    Features are exact small-int rationals quantized with floor4 so the DuckDB
    oracle reproduces them bit-for-bit.
    """
    toks = tokens(text_col)
    n_tok = F.size(toks)
    # sum of token lengths via JVM-side fold (no UDF)
    sum_len = F.aggregate(
        F.transform(toks, lambda w: F.length(w).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    n_stop = F.size(F.filter(toks, lambda w: w.isin(EN_STOPWORDS)))
    n_alnum_space = F.length(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", ""))
    punct_ratio = (F.length(text_col) - n_alnum_space) * 1.0 / F.greatest(
        F.length(text_col), F.lit(1)
    )
    return df.withColumns(
        {
            "n_tokens": n_tok.cast("bigint"),
            "avg_token_len": floor4(sum_len * 1.0 / F.greatest(n_tok, F.lit(1))),
            "stopword_ratio": floor4(n_stop * 1.0 / F.greatest(n_tok, F.lit(1))),
            "punct_ratio": floor4(punct_ratio),
            "quality_score": floor4(
                F.least(n_tok / 100.0, F.lit(1.0)) * 0.5
                + (1.0 - punct_ratio) * 0.3
                + F.least(n_stop * 1.0 / F.greatest(n_tok, F.lit(1)) * 5.0, F.lit(1.0)) * 0.2
            ),
        }
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-lexicon language ID: per-language marker-token counts, argmax
    with deterministic tie-break (lexicon declaration order).

    A production system would use char-n-gram profiles; the operator shape
    (per-language score columns -> greatest -> case) is identical and all
    JVM-side.
    """
    toks = tokens(text_col)

    def marker_filter(markers: list[str]):
        # NB: the lambda must take exactly ONE arg — pyspark interprets a
        # second lambda parameter as the array index column.
        return lambda w: w.isin(markers)

    scores = {
        lang: F.size(F.filter(toks, marker_filter(markers))).alias(f"score_{lang}")
        for lang, markers in LANG_MARKERS.items()
    }
    out = df.withColumns({f"score_{lang}": c for lang, c in scores.items()})
    best = F.greatest(*[F.col(f"score_{lang}") for lang in LANG_MARKERS])
    pred = F.lit(None).cast("string")
    # reversed so earlier languages win ties (last when() wins in a chain
    # evaluated front-to-back; build with when-first-match instead)
    expr = None
    for lang in LANG_MARKERS:
        cond = F.col(f"score_{lang}") == best
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    pred = expr
    return out.withColumn("pred_lang", pred)


def with_gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 15,
    max_words: int = 5000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    min_alpha_frac: float = 0.7,
    min_stop_distinct: int = 2,
) -> DataFrame:
    """Gopher/C4-style composite rule filter (Rae et al. 2021 §A1.1): the
    rule chain every large-scale curation pipeline runs before any model-
    based scoring.  Per doc: word-count bounds, mean-word-length bounds,
    alphabetic-word fraction, and the >=N-distinct-stopwords rule; ``keep``
    is the conjunction.  Pure JVM column expressions (zero shuffles, scales
    with input bytes); every ratio is floor4-quantized so a SQL oracle
    replays the decisions bit-for-bit.  Emits per-rule flags, not just
    ``keep`` — production pipelines log WHICH rule dropped a doc."""
    toks = tokens(text_col)
    n = F.size(toks)
    sum_len = F.aggregate(
        F.transform(toks, lambda w: F.length(w).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    mean_len = floor4(sum_len * 1.0 / F.greatest(n, F.lit(1)))
    alpha_frac = floor4(
        F.size(F.filter(toks, lambda w: w.rlike("[a-z]"))) * 1.0
        / F.greatest(n, F.lit(1))
    )
    n_stop = F.size(
        F.array_intersect(F.array_distinct(toks), F.lit(EN_STOPWORDS))
    )
    flag = lambda c: F.when(c, 1).otherwise(0).cast("bigint")  # noqa: E731
    out = df.withColumns(
        {
            "n_words": n.cast("bigint"),
            "mean_word_len": mean_len,
            "alpha_frac": alpha_frac,
            "n_stop_distinct": n_stop.cast("bigint"),
        }
    )
    out = out.withColumns(
        {
            "wc_ok": flag(F.col("n_words").between(min_words, max_words)),
            "len_ok": flag(
                F.col("mean_word_len").between(min_mean_len, max_mean_len)
            ),
            "alpha_ok": flag(F.col("alpha_frac") >= min_alpha_frac),
            "stop_ok": flag(F.col("n_stop_distinct") >= min_stop_distinct),
        }
    )
    return out.withColumn(
        "keep",
        (F.col("wc_ok") * F.col("len_ok") * F.col("alpha_ok") * F.col("stop_ok"))
        .cast("bigint"),
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints:

    - ``fp_md5``: md5 of whitespace-normalized lowercase text (exactly
      reproducible in any engine);
    - ``fp_roll``: 31-ary rolling polynomial hash mod 2^31-1 over the
      normalized text's characters, folded JVM-side — the classic rolling
      fingerprint, kept in bigint range so ANSI mode never overflows.
    """
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    chars = F.split(norm, "")
    p = F.lit(2147483647).cast("bigint")
    roll = F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % p,
    )
    return df.withColumns({"fp_md5": F.md5(norm), "fp_roll": roll})


# Sentiment polarity lexicon (SURVEY.md §2C text-analysis row; mirrors the
# EDBT-2016 tweet-sentiment workload in PAPERS.md and the reference's fake
# tweet data, FakeTweetProducer.java:40-65 + src/main/avro/twitter.avsc:5-17).
# Words are drawn from the synthetic corpus vocabulary so the fixture scores
# are non-trivial; the operator is lexicon-agnostic.
SENTIMENT_POS = ["fast", "big", "merge", "join", "good", "great", "love"]
SENTIMENT_NEG = ["slow", "small", "dup", "scan", "bad", "sad", "hate"]


def with_sentiment(
    df: DataFrame,
    text_col: str = "text",
    pos: list[str] | None = None,
    neg: list[str] | None = None,
) -> DataFrame:
    """Lexicon-based sentiment polarity — the x09 lang-id shape: the lexicon
    is a tiny array LITERAL folded into the plan (the broadcast-lexicon
    posture at any scale), the score is pure per-row JVM expressions (zero
    shuffles, scales with input bytes), and polarity is an integer
    micro-unit (floor((n_pos-n_neg)*1e6/n_tokens)) so a SQL oracle replays
    it bit-for-bit.

    Emits ``n_pos``, ``n_neg``, ``polarity_micro`` (bigint, [-1e6, 1e6]) and
    the ternary ``sentiment`` label.
    """
    pos = SENTIMENT_POS if pos is None else pos
    neg = SENTIMENT_NEG if neg is None else neg
    # NULL text scores as empty (0/0/0/neutral) so the pandas-UDF twin —
    # where None naturally maps to "" — stays pinned equal row-for-row
    toks = tokens(F.coalesce(F.col(text_col), F.lit("")))
    n_pos = F.size(F.filter(toks, lambda w: w.isin(pos)))
    n_neg = F.size(F.filter(toks, lambda w: w.isin(neg)))
    n_tok = F.size(toks)
    polarity = F.floor(
        (n_pos - n_neg) * 1000000.0 / F.greatest(n_tok, F.lit(1))
    ).cast("bigint")
    return df.withColumns(
        {
            "n_pos": n_pos.cast("bigint"),
            "n_neg": n_neg.cast("bigint"),
            "polarity_micro": polarity,
            "sentiment": F.when(polarity > 0, "positive")
            .when(polarity < 0, "negative")
            .otherwise("neutral"),
        }
    )


def with_sentiment_pandas(
    df: DataFrame,
    text_col: str = "text",
    pos: list[str] | None = None,
    neg: list[str] | None = None,
) -> DataFrame:
    """Pandas-UDF twin of :func:`with_sentiment` — the "sentiment via pandas
    UDF" surface SURVEY.md §2C declares.  Arrow-batched (never per-row); the
    JVM-expression version is the hot path, this is the seam where a real
    model (e.g. a scikit/torch scorer) would plug in.  Tests pin both
    implementations equal row-for-row.
    """
    from pyspark.sql.functions import pandas_udf

    pos = SENTIMENT_POS if pos is None else pos
    neg = SENTIMENT_NEG if neg is None else neg
    pos_set, neg_set = frozenset(pos), frozenset(neg)

    @pandas_udf("struct<n_pos:bigint,n_neg:bigint,polarity_micro:bigint,sentiment:string>")
    def score(texts: pd.Series) -> pd.DataFrame:
        import math

        rows = []
        for t in texts:
            toks = [w for w in (t or "").lower().split(" ") if w]
            np_, nn = sum(w in pos_set for w in toks), sum(w in neg_set for w in toks)
            pol = math.floor((np_ - nn) * 1000000.0 / max(len(toks), 1))
            lab = "positive" if pol > 0 else ("negative" if pol < 0 else "neutral")
            rows.append((np_, nn, pol, lab))
        return pd.DataFrame(rows, columns=["n_pos", "n_neg", "polarity_micro", "sentiment"])

    out = df.withColumn("_s", score(F.col(text_col)))
    return out.select("*", "_s.n_pos", "_s.n_neg", "_s.polarity_micro", "_s.sentiment").drop("_s")
