"""Semantic checks for the pipeline_ext entries (beyond oracle hash parity)."""

from __future__ import annotations

import pyspark.sql.functions as F

from hiveka_spark.queries import REGISTRY, _ensure_loaded

from .conftest import SF_SMOKE

_ensure_loaded()


def test_boilerplate_removal_consistent(spark):
    """Boilerplate is actually detected, and the rebuilt text always has
    exactly (n_chunks - n_boiler) * 8 words."""
    out = REGISTRY["x31_boilerplate_removal"].fn(spark, SF_SMOKE)
    assert out.filter(F.col("n_boiler") > 0).count() > 0, "no boilerplate found"
    kept_words = F.when(
        F.col("cleaned_text") == "", F.lit(0)
    ).otherwise(F.size(F.split("cleaned_text", " ")))
    bad = out.filter(kept_words != (F.col("n_chunks") - F.col("n_boiler")) * 8)
    assert bad.count() == 0


def test_boilerplate_unique_docs_untouched(spark):
    """A document with no cross-doc chunk collisions keeps its full text."""
    out = REGISTRY["x31_boilerplate_removal"].fn(spark, SF_SMOKE)
    clean = out.filter(F.col("n_boiler") == 0)
    assert clean.count() > 0
    # cleaned_text must contain exactly n_chunks * 8 words
    bad = clean.filter(
        F.size(F.split("cleaned_text", " ")) != F.col("n_chunks") * 8
    )
    assert bad.count() == 0


def test_url_dedup_variants_collapse(spark):
    """All three wire variants of the same base URL share one canonical form."""
    out = REGISTRY["x32_url_dedup"].fn(spark, SF_SMOKE).toPandas()
    assert (out["n_variants"] <= 3).all()
    assert not out["canonical_url"].str.contains("://|\\?|#|[A-Z]").any()
    assert not out["canonical_url"].str.endswith("/").any()
    # keep_doc_id must be a member of its group: min over >=1 docs
    assert (out["keep_doc_id"] >= 0).all()
    assert (out["n_docs"] >= out["n_variants"]).all()


def test_source_mixing_budget_respected(spark):
    """Weighted sources sample at most their budget rate; others keep nothing."""
    out = REGISTRY["x34_source_mixing"].fn(spark, SF_SMOKE).toPandas().set_index("source")
    from hiveka_spark.queries.pipeline_ext import _MIX_WEIGHTS

    for src, row in out.iterrows():
        if src not in _MIX_WEIGHTS:
            assert row["rate_pct"] == 0 and row["n_kept"] == 0 and row["tokens_kept"] == 0
        else:
            assert 0 < row["rate_pct"] <= 100
            assert row["tokens_kept"] <= row["src_tokens"]
    # the mix must actually downsample: total kept < total budgeted corpus
    kept = out["tokens_kept"].sum()
    total = out["src_tokens"].sum()
    assert 0 < kept < total


def test_cluster_keep_best_member_quality(spark):
    """keep_doc_id is a member with the cluster's max quality score."""
    from hiveka_spark.operators.text import with_quality

    out = REGISTRY["x33_cluster_keep_best"].fn(spark, SF_SMOKE).toPandas()
    assert len(out) > 0
    assert (out["n_members"] >= 2).all()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    q = {r["doc_id"]: r["quality_score"] for r in with_quality(docs).select("doc_id", "quality_score").collect()}
    for _, row in out.iterrows():
        assert abs(q[row["keep_doc_id"]] - row["keep_quality"]) < 1e-9


def test_bm25_scores_monotone(spark):
    out = REGISTRY["x35_bm25_search"].fn(spark, SF_SMOKE).toPandas().sort_values("rank")
    assert (out["score_micro"].diff().dropna() <= 0).all()
    assert out["rank"].tolist() == list(range(1, len(out) + 1))


def test_semdedup_drops_are_within_cells(spark):
    """Every dropped vector's keeper has a smaller id, and cosine >= threshold."""
    out = REGISTRY["x37_semdedup"].fn(spark, SF_SMOKE).toPandas()
    assert len(out) > 0
    assert (out["kept_by"] < out["vec_id"]).all()
    assert (out["cosine"] >= 0.3).all()
    # a keeper must never itself be dropped by a member of the same cell pair
    # chain with a smaller id AND appear as kept_by for that same pair — i.e.
    # dropped set and audit keepers may overlap across cells but each row's
    # keeper differs from the row itself
    assert (out["kept_by"] != out["vec_id"]).all()


def test_token_rarity_bounds(spark):
    """Rarity >= 1e6 * total/max_tf per token average is >= 1e6/(max share);
    the floor of any inverse frequency is >= 1 (tf <= total)."""
    out = REGISTRY["x38_token_rarity"].fn(spark, SF_SMOKE).toPandas()
    assert (out["rarity_micro"] >= 1_000_000).all()  # every tf < total
    assert (out["n_tokens"] > 0).all()


def test_vocab_coverage_monotone(spark):
    out = REGISTRY["x39_vocab_coverage"].fn(spark, SF_SMOKE).toPandas().sort_values("rnk")
    assert (out["coverage"].diff().dropna() >= 0).all()
    assert (out["tf"].diff().dropna() <= 0).all()
    assert out["coverage"].iloc[-1] <= 1.0


def test_boilerplate_synthetic_planted(spark):
    """Plant a known boilerplate chunk across docs and assert exactly it is
    removed: docs share an 8-word header, each has a unique 8-word body."""
    header = "terms of service apply to this web page"
    rows = [
        (i, f"{header} " + " ".join(f"w{i}x{j}" for j in range(8)))
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.createOrReplaceTempView("_planted")

    import pyspark.sql.functions as F

    from hiveka_spark.operators.text import tokens

    ws = tokens("text")
    n_full = F.floor(F.size(ws) / F.lit(8.0)).cast("int")
    seq = F.when(n_full >= 1, F.sequence(F.lit(1), n_full)).otherwise(
        F.array().cast("array<int>")
    )
    c = df.select("doc_id", ws.alias("ws"), F.explode(seq).alias("i")).select(
        "doc_id", "i",
        F.array_join(F.slice("ws", (F.col("i") - 1) * 8 + 1, F.lit(8)), " ").alias("chunk"),
    )
    freq = c.groupBy("chunk").agg(F.count_distinct("doc_id").alias("n_docs"))
    j = c.join(freq, "chunk")
    out = (
        j.groupBy("doc_id")
        .agg(
            F.sum((F.col("n_docs") >= 2).cast("bigint")).alias("n_boiler"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.when(F.col("n_docs") < 2, F.struct("i", "chunk")))
                    ),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("cleaned_text"),
        )
        .collect()
    )
    for r in out:
        assert r["n_boiler"] == 1
        assert header not in r["cleaned_text"]
        assert r["cleaned_text"].startswith(f"w{r['doc_id']}x0")


def test_x64_entity_decode_order_not_double_unescaped(spark):
    """'&amp;lt;' must extract as the literal '&lt;', never '<' — decoding
    &amp; before the angle entities would re-interpret its output (the
    classic double-unescape bug).  The gate's synthesized page carries a
    double-escaped token, so the oracle also pins this; here the extracted
    string is checked directly."""
    from hiveka_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    out = REGISTRY["x64_html_extract"].fn(spark, SF_SMOKE)
    # reproduce the extraction on one doc and check the literal substring
    import pyspark.sql.functions as F  # noqa: F811

    row = out.limit(1).collect()[0]
    assert row["clean_len"] > 0
    # direct unit-level check of the decode chain on a crafted page
    from hiveka_spark.queries.curation_ext import (
        _SCRIPT_RE, _STYLE_RE, _TAG_RE, _WS_RE,
    )

    page = "<p>a &amp;lt; b and x &amp; y</p>"
    df = spark.createDataFrame([(page,)], "html string")
    untagged = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(F.col("html"), _SCRIPT_RE, ""), _STYLE_RE, ""),
        _TAG_RE,
        " ",
    )
    txt = F.trim(
        F.regexp_replace(
            F.replace(
                F.replace(
                    F.replace(
                        F.replace(untagged, F.lit("&lt;"), F.lit("<")),
                        F.lit("&gt;"), F.lit(">"),
                    ),
                    F.lit("&quot;"), F.lit('"'),
                ),
                F.lit("&amp;"), F.lit("&"),
            ),
            _WS_RE, " ",
        )
    )
    got = df.select(txt.alias("t")).collect()[0]["t"]
    assert got == "a &lt; b and x & y", got


def test_leakage_safe_split_no_pair_straddles(spark):
    """x106's core invariant: no near-dup pair (the x02 Jaccard >= 0.8
    pipeline, the same edge set the split clusters on) may cross a split
    boundary, and every split label is one of train/val/test."""
    import pyspark.sql.functions as F

    from hiveka_spark.catalog import table
    from hiveka_spark.operators import dedup as D
    from hiveka_spark.queries.extensions import x106_leakage_safe_split

    sf = "/root/testdata/sf0.001"
    out = x106_leakage_safe_split(spark, sf)
    d = table(spark, sf, "documents")
    pairs = D.ngram_jaccard_pairs(d, "doc_id", "text", k=3, threshold=0.8)
    a = out.withColumnRenamed("doc_id", "id_a").select("id_a", F.col("split").alias("sa"))
    b = out.withColumnRenamed("doc_id", "id_b").select("id_b", F.col("split").alias("sb"))
    joined = pairs.join(a, "id_a").join(b, "id_b")
    assert joined.count() > 0  # the fixture plants near-dups
    assert joined.filter(F.col("sa") != F.col("sb")).count() == 0
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"}


# ------------------------------------------------- x112 secret scrub


def test_x112_planted_secrets_separate(spark):
    """Every planted unique key (doc_id % 3 == 0) is detected as a secret;
    the planted SHARED token (doc_id % 5 == 0) is a candidate but never a
    secret — df=1 is the separating rule."""
    from .conftest import SF_SMOKE
    from hiveka_spark.queries import REGISTRY

    rows = {r.doc_id: r for r in
            REGISTRY["x112_secret_scrub"].fn(spark, SF_SMOKE).collect()}
    assert rows
    for doc_id, r in rows.items():
        if doc_id % 3 == 0:
            assert r.n_secrets >= 1
        if doc_id % 5 == 0:
            assert r.n_candidates >= 1
        if doc_id % 5 == 0 and doc_id % 3 != 0:
            assert r.n_secrets == 0
        assert r.n_secrets <= r.n_candidates


# ------------------------------------------------- x114 quality agreement


def test_x114_contingency_partitions_raw_pool(spark):
    """Cells partition the raw pool (doc counts sum to x102's row count),
    shares within each keep-group sum to ~10000 (DIV truncation), and
    every cell is a valid (keep, bucket) pair."""
    from .conftest import SF_SMOKE
    from hiveka_spark.queries import REGISTRY

    rows = REGISTRY["x114_quality_agreement"].fn(spark, SF_SMOKE).collect()
    assert rows
    n_scored = REGISTRY["x102_lm_quality_buckets"].fn(spark, SF_SMOKE).count()
    assert sum(r.n_docs for r in rows) == n_scored
    for keep in {r.keep for r in rows}:
        cells = [r for r in rows if r.keep == keep]
        s = sum(r.pct_of_keep_q for r in cells)
        assert 10000 - len(cells) < s <= 10000
    assert all(r.keep in (0, 1) and r.bucket in ("head", "middle", "tail")
               for r in rows)


# ------------------------------------------------- x121 decontam agreement


def test_x121_bloom_never_misses_exact(spark):
    """The structural property the matrix certifies: no populated cell has
    exact=1 with bloom=0 (Bloom filters have no false negatives), and the
    (exact=0, bloom=1) cells are the measured false-positive mass."""
    from .conftest import SF_SMOKE
    from hiveka_spark.queries import REGISTRY

    rows = REGISTRY["x121_decontam_agreement"].fn(spark, SF_SMOKE).collect()
    assert rows
    assert not any(r.exact_flag == 1 and r.bloom_flag == 0 for r in rows)
    total = sum(r.n_docs for r in rows)
    assert total > 0
