"""Distributed BPE (byte-pair-encoding) vocabulary training.

The tokenizer-training step of a training-data pipeline (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units"),
expressed Spark-first.  SURVEY.md §2C's text-analysis surface counts
tokens with a BPE-ish regex; this trains the merge table itself.

Scale shape — the classic BPE trick is what makes 100 TB feasible:

1. ONE corpus-sized pass reduces the corpus to a (word, freq) table —
   a map-side-combinable aggregate.  Everything after runs on the word
   table, whose size is vocabulary-bounded (zipfian), not corpus-bounded;
   at 100 TB you additionally cap it to the top-K words (``max_words``),
   which changes counts negligibly and bounds every later stage.
2. Per merge: pair counts are one (sym, next_sym)-keyed aggregate over
   the symbol table weighted by word freq; the argmax is a ONE-ROW
   driver collect (the bounded-collect posture, like centroid handoff);
   the merge application is a per-word window pass (words are short, the
   partition key is the word — embarrassingly parallel).

Determinism (oracle-replayable, the repo discipline): the best pair is
argmax over (count DESC, left ASC, right ASC); merge application is the
standard greedy leftmost-first rule, implemented WITHOUT a sequential
fold: for left != right, adjacent matches can never overlap, so the
match test is per-position; for left == right (an ``aa`` run), greedy
merging takes the even offsets within each maximal run — a
gaps-and-islands window, identical in Spark and SQL.  This is what lets
the DuckDB oracle replay every merge bit-for-bit (gate x72).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from hiveka_spark.operators.text import tokens


def word_freq(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, freq): the corpus reduced to its word-frequency table — the one
    corpus-sized pass of BPE training."""
    return (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    max_words: int | None = None,
) -> DataFrame:
    """Train ``n_merges`` BPE merges over the corpus; returns the ordered
    merge table (merge_rank, lhs, rhs, merged, pair_count) — the artifact
    a tokenizer ships.  ``max_words``: optional top-K word-frequency cap
    ((freq, w) DESC/ASC total order, deterministic) — the 100 TB knob.
    """
    wf = word_freq(docs, text_col)
    if max_words is not None:
        # distributed exact top-K: orderBy + limit plans as
        # TakeOrderedAndProject (per-partition top-K then a K-row merge) —
        # never a single-partition sort of the uncapped vocabulary, which
        # is exactly the case max_words exists for
        wf = wf.orderBy(F.desc("freq"), "w").limit(max_words)
    syms = wf.select(
        "w", "freq", F.posexplode(F.split("w", "")).alias("pos", "s")
    ).localCheckpoint(eager=True)

    wspec = Window.partitionBy("w").orderBy("pos")
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        withnext = syms.withColumn("nxt", F.lead("s").over(wspec))
        best = (
            withnext.filter(F.col("nxt").isNotNull())
            .groupBy("s", "nxt")
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.desc("c"), "s", "nxt")
            .limit(1)
            .collect()
        )
        if not best:
            break  # every word is a single symbol already
        a, b, c = best[0]["s"], best[0]["nxt"], int(best[0]["c"])
        merges.append((rank, a, b, a + b, c))

        t = withnext
        if a == b:
            # greedy over an 'aa' run = merge at even offsets within each
            # maximal run (gaps-and-islands: grp is constant per run)
            t = t.withColumn("isa", (F.col("s") == a).cast("int"))
            rn = F.row_number().over(Window.partitionBy("w", "isa").orderBy("pos"))
            t = t.withColumn("grp", F.col("pos") - rn)
            off = (
                F.row_number().over(
                    Window.partitionBy("w", "isa", "grp").orderBy("pos")
                )
                - 1
            )
            is_left = (F.col("isa") == 1) & (F.col("nxt") == a) & (off % 2 == 0)
        else:
            # distinct pair: adjacent matches cannot overlap, test per row
            is_left = (F.col("s") == a) & (F.col("nxt") == b)
        t = t.withColumn("is_left", is_left)
        t = t.withColumn(
            "consumed", F.coalesce(F.lag("is_left").over(wspec), F.lit(False))
        )
        syms = (
            t.filter(~F.col("consumed"))
            .select(
                "w",
                "freq",
                F.row_number().over(wspec).alias("pos"),
                F.when(F.col("is_left"), F.lit(a + b)).otherwise(F.col("s")).alias("s"),
            )
            .localCheckpoint(eager=True)  # truncate the iterative lineage
        )

    spark = docs.sparkSession
    return spark.createDataFrame(
        merges,
        "merge_rank bigint, lhs string, rhs string, merged string, pair_count bigint",
    )


def bpe_apply(
    docs: DataFrame,
    merge_table: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize documents with a trained merge list: per doc, whitespace
    words -> characters -> apply each merge in rank order (same greedy
    window rule as training).  Returns (<id_col>, n_bpe_tokens) for EVERY
    input document: ids whose text is NULL or tokenizes to zero words
    (posexplode of an empty array emits no rows) come back with 0 via a
    left join against the id set, the same row-parity discipline
    with_sentiment follows by coalescing NULL text.  Corpus-sized but
    embarrassingly parallel: every pass is per-(doc, word) windows, no
    cross-doc shuffle; the final left join is id-keyed (the aggregate side
    is one row per doc)."""
    wspec = Window.partitionBy(id_col, "wi").orderBy("pos")
    t = docs.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("wi", "w")
    ).select(
        id_col, "wi", F.posexplode(F.split("w", "")).alias("pos", "s")
    )
    for a, b in merge_table:
        t = t.withColumn("nxt", F.lead("s").over(wspec))
        if a == b:
            t = t.withColumn("isa", (F.col("s") == a).cast("int"))
            rn = F.row_number().over(
                Window.partitionBy(id_col, "wi", "isa").orderBy("pos")
            )
            t = t.withColumn("grp", F.col("pos") - rn)
            off = (
                F.row_number().over(
                    Window.partitionBy(id_col, "wi", "isa", "grp").orderBy("pos")
                )
                - 1
            )
            is_left = (F.col("isa") == 1) & (F.col("nxt") == a) & (off % 2 == 0)
        else:
            is_left = (F.col("s") == a) & (F.col("nxt") == b)
        t = t.withColumn("is_left", is_left)
        t = t.withColumn(
            "consumed", F.coalesce(F.lag("is_left").over(wspec), F.lit(False))
        )
        t = (
            t.filter(~F.col("consumed"))
            .select(
                id_col,
                "wi",
                F.row_number().over(wspec).alias("pos"),
                F.when(F.col("is_left"), F.lit(a + b)).otherwise(F.col("s")).alias("s"),
            )
        )
    counts = t.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bpe_tokens")
    )
    return docs.select(id_col).join(counts, id_col, "left").select(
        id_col, F.coalesce("n_bpe_tokens", F.lit(0)).cast("bigint").alias("n_bpe_tokens")
    )
