"""Deterministic sampling, mixing, packing, and decontamination semantics."""

from __future__ import annotations

import pyspark.sql.functions as F

from hiveka_spark.catalog import table
from hiveka_spark.operators import dedup as D
from hiveka_spark.operators.sampling import (
    pack_chunks,
    sample_bucket,
    stratified_sample,
)

from .conftest import SF_SMOKE


# --------------------------------------------------------- stratified sample
def test_stratified_sample_deterministic_and_rated(spark):
    """Same input -> identical row set across runs; per-stratum keep rate is
    within sampling slack of the requested rate; rate-0/absent strata drop."""
    docs = table(spark, SF_SMOKE, "documents")
    rates = {"en": 20, "zh": 100}
    a = {r["doc_id"] for r in stratified_sample(docs, "lang", rates, "doc_id").collect()}
    b = {r["doc_id"] for r in stratified_sample(docs, "lang", rates, "doc_id").collect()}
    assert a == b and a, "hash-based sampling must be run-stable and non-empty"

    kept = stratified_sample(docs, "lang", rates, "doc_id")
    n_zh = docs.filter(F.col("lang") == "zh").count()
    assert kept.filter(F.col("lang") == "zh").count() == n_zh  # 100% stratum
    n_en = docs.filter(F.col("lang") == "en").count()
    k_en = kept.filter(F.col("lang") == "en").count()
    assert abs(k_en / n_en - 0.20) < 0.08, (k_en, n_en)
    assert kept.filter(~F.col("lang").isin("en", "zh")).count() == 0


def test_sample_bucket_uniform(spark):
    """Hash buckets of sequential ids spread roughly uniformly (chi-ish)."""
    df = spark.range(2000).select(sample_bucket("id", 10).alias("b"))
    counts = {r["b"]: r["n"] for r in df.groupBy("b").agg(F.count("*").alias("n")).collect()}
    assert len(counts) == 10
    assert all(120 < n < 280 for n in counts.values()), counts


# ----------------------------------------------------------------- packing
def test_pack_chunks_invariants(spark):
    """Chunks are contiguous in order_col within each group, start at 0,
    and every chunk except possibly the last in its group reaches the
    budget (bounded overflow of one doc)."""
    rows = [("a", i, 7) for i in range(30)] + [("b", i, 13) for i in range(10)]
    df = spark.createDataFrame(rows, ["src", "i", "tok"])
    out = pack_chunks(df, "src", "i", "tok", 20).collect()
    by_group: dict[str, list] = {}
    for r in sorted(out, key=lambda r: (r["src"], r["i"])):
        by_group.setdefault(r["src"], []).append(r)
    for src, rs in by_group.items():
        chunks = [r["chunk"] for r in rs]
        assert chunks[0] == 0
        assert chunks == sorted(chunks), "chunk ids must be monotone in order"
        # cumulative-before semantics: row enters chunk floor(cum_before/20)
        cum = 0
        for r in rs:
            assert r["chunk"] == cum // 20, (src, r)
            cum += r["tok"]


# --------------------------------------------------------- decontamination
def test_contamination_overlap_exact(spark):
    train = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "totally novel words here now")],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame([(9, "a cat sat on a mat")], ["doc_id", "text"])
    out = {r["doc"]: r for r in D.contamination_overlap(train, ev, k=3).collect()}
    # doc 1 shares the 3-gram "cat sat on"; doc 2 shares nothing -> filtered
    assert set(out) == {1}
    r = out[1]
    assert r["n_shingles"] == 4 and r["n_overlap"] == 1
    assert abs(r["overlap_ratio"] - 0.25) < 1e-9


def test_temperature_mix_upweights_low_resource_sources(spark):
    """alpha=0.5 must give a low-resource source a LARGER share than its
    proportional token share, and a high-resource source a smaller one;
    keep-rates never exceed 100 and kept tokens respect the budget shape."""
    import pyspark.sql.functions as F

    from hiveka_spark.operators.sampling import temperature_mix

    rows = [(i, "big_src", 10) for i in range(900)] + [
        (1000 + i, "small_src", 10) for i in range(100)
    ]
    d = spark.createDataFrame(rows, "doc_id bigint, source string, n_tok bigint")
    out = {r["source"]: r for r in temperature_mix(d, budget_pct=40).collect()}
    big, small = out["big_src"], out["small_src"]
    # proportional shares: 90% / 10%; sqrt shares: 75% / 25%
    assert small["share_micro"] > 100_000 * 2  # > 2x proportional
    assert big["share_micro"] < 900_000
    assert abs(big["share_micro"] + small["share_micro"] - 1_000_000) <= 2
    for r in out.values():
        assert 0 <= r["rate_pct"] <= 100
        assert r["n_kept"] <= (
            d.filter(F.col("source") == r["source"]).count()
        )


def test_global_order_rank_composite_key(spark):
    """Arbitrary composite ascending order must yield the dense global
    1..n rank a naive single-partition sort would give."""
    from hiveka_spark.operators.dedup import dedup_cache_scope
    from hiveka_spark.operators.sampling import global_order_rank

    rows = [(i, i % 3, (i * 7) % 11) for i in range(60)]
    df = spark.createDataFrame(rows, "id bigint, band bigint, h bigint")
    with dedup_cache_scope():
        got = {
            r["id"]: r["pos"]
            for r in global_order_rank(df, ["band", "h", "id"], "pos").collect()
        }
    want = {
        rid: rank + 1
        for rank, (rid, _, _) in enumerate(sorted(rows, key=lambda r: (r[1], r[2], r[0])))
    }
    assert got == want


def test_export_order_digest_detects_reorder_and_drop(spark):
    """The manifest digest (the PRODUCTION rolling_digest, not a copy)
    must change when a row is dropped OR when two rows swap within-shard
    positions (content alone wouldn't catch that)."""

    from hiveka_spark.operators.sampling import rolling_digest

    def manifest(rows):
        df = spark.createDataFrame(rows, "shard bigint, shard_pos bigint, dd bigint")
        return {
            r["shard"]: r["d"]
            for r in df.groupBy("shard")
            .agg(rolling_digest("shard_pos", "dd").alias("d"))
            .collect()
        }

    base = [(0, 1, 111), (0, 2, 222), (0, 3, 333)]
    ref = manifest(base)
    assert manifest([(0, 1, 111), (0, 2, 222)])[0] != ref[0]  # drop
    assert manifest([(0, 1, 222), (0, 2, 111), (0, 3, 333)])[0] != ref[0]  # swap


def test_segmented_digest_equals_one_buffer_digest(spark):
    """The PRODUCTION segment-composed digest (bounded seg_size buffers +
    affine 31^len carries) must equal the one-buffer rolling_digest on
    groups much larger than seg_size — i.e. the composition path itself,
    including ragged last segments and multi-group inputs, is what this
    pins.  Uses 60-bit hash-scale values to exercise the int64 headroom
    the docstring claims."""
    from hiveka_spark.operators.sampling import rolling_digest, segmented_order_digest

    rows = []
    for g in range(3):
        n = [37, 64, 129][g]  # non-multiple, exact-multiple, 2 full + 1 ragged
        for p in range(1, n + 1):
            rows.append((g, p, ((p * 2654435761 + g) ** 2) % (1 << 60)))
    df = spark.createDataFrame(rows, "shard bigint, shard_pos bigint, dd bigint")
    one = {
        r["shard"]: r["d"]
        for r in df.groupBy("shard").agg(rolling_digest("shard_pos", "dd").alias("d")).collect()
    }
    seg = {
        r["shard"]: r["d"]
        for r in segmented_order_digest(df, "shard", "shard_pos", "dd", "d", seg_size=64).collect()
    }
    assert seg == one and len(seg) == 3


def test_composed_order_digest_equals_flat_concat_fold(spark):
    """The variable-length affine composition (x81's shard token digest:
    per-row (digest, length) pairs folded with 31^len carries in bounded
    segments) must equal the flat 31-ary fold over the CONCATENATED
    element stream — including zero-length rows (empty docs: digest 0 /
    power 1, exact no-ops), ragged segment boundaries, and multi-group
    inputs."""
    import random

    from hiveka_spark.operators.sampling import _DIGEST_MOD, composed_order_digest

    rng = random.Random(81)
    rows, flat = [], {}
    for g in range(3):
        stream = []
        n = [9, 16, 23][g]
        for pos in range(1, n + 1):
            length = rng.choice([0, 1, 2, 5, 11])  # zero-length rows included
            seq = [rng.randrange(50_000) for _ in range(length)]
            d = 0
            for x in seq:
                d = (d * 31 + x) % _DIGEST_MOD
            rows.append((g, pos, d, length))
            stream.extend(seq)
        acc = 0
        for x in stream:
            acc = (acc * 31 + x) % _DIGEST_MOD
        flat[g] = acc
    df = spark.createDataFrame(
        rows, "shard bigint, shard_pos bigint, dd bigint, n_tok bigint"
    )
    got = {
        r["shard"]: r["ids_digest"]
        for r in composed_order_digest(
            df, "shard", "shard_pos", "dd", "n_tok", seg_size=4
        ).collect()
    }
    assert got == flat and len(got) == 3


def test_bpe_encode_ids_matches_digest_form(spark):
    """The raw array<bigint> artifact and the digest certification form
    must describe the same sequences: size(ids) == n_tokens and the
    31-ary fold of ids == ids_digest doc by doc, with pass-through
    columns intact and empty-array (not NULL) parity for NULL text."""
    from hiveka_spark.operators.bpe import (
        bpe_encode,
        bpe_encode_ids,
        bpe_train_capped,
        bpe_vocab,
    )
    from hiveka_spark.operators.sampling import _DIGEST_MOD

    texts = [
        (0, "the cat sat on the mat", 7),
        (1, "banana bandana the band", 3),
        (2, None, 9),
        (3, "", 4),
        (4, "aaaa aaa the cattle", 5),
    ]
    df = spark.createDataFrame(texts, "doc_id bigint, text string, extra bigint")
    mt = [
        (r["lhs"], r["rhs"])
        for r in bpe_train_capped(df, n_merges=16, max_words=40, units=True).collect()
    ]
    alphabet = sorted({c for _, t, _ in texts if t for c in t.lower() if c != " "} | {"_"})
    vocab = bpe_vocab(mt, alphabet)
    dig = {
        r["doc_id"]: (r["n_tokens"], r["ids_digest"])
        for r in bpe_encode(df, mt, vocab, units=True).collect()
    }
    raw = {
        r["doc_id"]: (r["ids"], r["extra"])
        for r in bpe_encode_ids(
            df, mt, vocab, units=True, keep_cols=("extra",)
        ).collect()
    }
    assert set(raw) == set(dig) == {0, 1, 2, 3, 4}
    for did, (ids, extra) in raw.items():
        assert ids is not None  # empty list, never NULL
        d = 0
        for x in ids:
            d = (d * 31 + x) % _DIGEST_MOD
        assert (len(ids), d) == dig[did], did
        assert extra == dict((i, e) for i, _, e in texts)[did]
    assert raw[2][0] == [] and raw[3][0] == []


def test_bpe_decode_inverts_encode_per_unit(spark):
    """bpe_decode_ids must be the exact inverse of bpe_encode_ids at unit
    granularity: for adversarial units (aa-runs, merge-heavy, single
    chars, the '_' marker itself) decode(encode(u)) == u byte-for-byte,
    and an id outside the vocabulary decodes to the U+FFFD sentinel."""
    from hiveka_spark.operators.bpe import (
        bpe_decode_ids,
        bpe_encode_ids,
        bpe_train_capped,
        bpe_vocab,
    )

    units = ["the_cat", "aaaa", "a", "banana_band", "xy_xyxy", "t_h_e"]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(units)], "doc_id bigint, text string"
    )
    mt = [
        (r["lhs"], r["rhs"])
        for r in bpe_train_capped(df, n_merges=12, max_words=30, units=False).collect()
    ]
    alphabet = sorted({c for u in units for c in u})
    vocab = bpe_vocab(mt, alphabet)
    enc = bpe_encode_ids(df, mt, vocab)
    got = {
        r["doc_id"]: r["text_rt"]
        for r in bpe_decode_ids(enc, vocab).collect()
    }
    assert got == {i: u for i, u in enumerate(units)}
    # out-of-vocabulary id -> sentinel, never a silent wrong symbol
    bad = spark.createDataFrame(
        [(0, [0, 10**6])], "doc_id bigint, ids array<bigint>"
    )
    (row,) = bpe_decode_ids(bad, vocab).collect()
    assert row["text_rt"][1] == "�" and len(row["text_rt"]) == 2


def test_multi_epoch_shards_epoch0_pins_to_single_epoch_path(spark):
    """x78's fan-out must be a strict superset of x75's single-epoch
    export: epoch 0 row-identical to epoch_shards under the same salt, and
    each epoch's (shard, shard_pos) space independently dense."""
    from hiveka_spark.operators.sampling import epoch_shards, multi_epoch_shards

    d = table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    multi = multi_epoch_shards(d, "doc_id", ("epoch0_", "epoch1_"), 4,
                               keep_cols=("text",))
    single = epoch_shards(d, "doc_id", "epoch0_", 4, keep_cols=("text",))
    got0 = {
        (r["doc_id"], r["shard"], r["shard_pos"], r["text"])
        for r in multi.filter(F.col("epoch") == 0).drop("epoch").collect()
    }
    want = {
        (r["doc_id"], r["shard"], r["shard_pos"], r["text"])
        for r in single.collect()
    }
    assert got0 == want
    # epoch 1 is a DIFFERENT order (salted differently) over the same ids
    n = d.count()
    e1 = multi.filter(F.col("epoch") == 1)
    assert e1.count() == n
    assert {r["doc_id"] for r in e1.select("doc_id").collect()} == {
        r["doc_id"] for r in d.select("doc_id").collect()
    }
    pos1 = {(r["shard"], r["shard_pos"]) for r in e1.collect()}
    assert len(pos1) == n  # dense, collision-free positions per epoch
    # and the two epochs genuinely differ in assignment
    a0 = {(r["doc_id"], r["shard"]) for r in multi.filter(F.col("epoch") == 0).collect()}
    a1 = {(r["doc_id"], r["shard"]) for r in e1.collect()}
    assert a0 != a1


def test_segmented_digest_multi_column_group(spark):
    """segmented_order_digest with a composite group key must equal the
    one-buffer rolling_digest per (epoch, shard) group."""
    from hiveka_spark.operators.sampling import (
        multi_epoch_shards,
        rolling_digest,
        segmented_order_digest,
    )

    d = table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    staged = multi_epoch_shards(d, "doc_id", ("ea_", "eb_"), 3)
    vals = staged.select(
        "epoch", "shard", "shard_pos",
        (F.col("doc_id") % 1000).cast("bigint").alias("v"),
    )
    seg = segmented_order_digest(vals, ("epoch", "shard"), "shard_pos", "v",
                                 seg_size=7)
    one = vals.groupBy("epoch", "shard").agg(
        rolling_digest("shard_pos", "v").alias("order_digest")
    )
    got = {(r["epoch"], r["shard"], r["order_digest"]) for r in seg.collect()}
    want = {(r["epoch"], r["shard"], r["order_digest"]) for r in one.collect()}
    assert got == want


def test_pack_token_examples_equals_flat_reference(spark):
    """pack_token_examples must equal the naive flat pack: concatenate the
    shard's id stream in shard_pos order, slice into C-token windows, fold
    each window's digest per token.  The fixture forces every edge: docs
    spanning example boundaries, a doc longer than C (contributing to 3+
    examples), empty-ids docs interleaved (must shift nothing), multiple
    shards, and trailing partial examples."""
    from hiveka_spark.operators.sampling import _DIGEST_MOD, pack_token_examples

    C = 8
    rows = [
        # (shard, shard_pos, ids)
        (0, 1, [1, 2, 3]),
        (0, 2, []),                       # empty: shifts nothing
        (0, 5, None),                     # NULL ids: must also shift nothing
        (0, 3, list(range(10, 30))),      # 20 tokens: spans 3+ examples
        (0, 4, [7]),
        (1, 1, [5] * 8),                  # exactly one full example
        (1, 2, [6, 6, 6]),                # trailing partial
        (2, 1, []),                       # all-empty shard: no examples
    ]
    df = spark.createDataFrame(
        rows, "shard bigint, shard_pos bigint, ids array<bigint>"
    )
    got = {
        (r["shard"], r["ex_idx"]): (
            r["n_tokens"], r["n_docs"], r["ids_digest"], r["starts_digest"]
        )
        for r in pack_token_examples(df, C).collect()
    }

    want = {}
    for shard in (0, 1, 2):
        stream, doc_of, doc_starts = [], [], []
        for _, _, ids in sorted(
            (r for r in rows if r[0] == shard), key=lambda r: r[1]
        ):
            ids = ids or []
            if ids:
                doc_starts.append(len(stream))
            stream.extend(ids)
            doc_of.extend([id(ids)] * len(ids))
        for k in range(0, (len(stream) + C - 1) // C):
            win = stream[k * C : (k + 1) * C]
            d = 0
            for x in win:
                d = (d * 31 + x) % _DIGEST_MOD
            sd = 0
            for g in doc_starts:
                if k * C <= g < k * C + len(win):
                    sd = (sd * 31 + (g - k * C) + 1) % _DIGEST_MOD
            want[(shard, k)] = (
                len(win),
                len(set(doc_of[k * C : (k + 1) * C])),
                d,
                sd,
            )
    assert got == want
    # boundary metadata is non-trivial: at least one example has no doc
    # start inside it (mid-long-doc) and one has a start past position 0
    assert any(v[3] == 0 for v in got.values())
    assert any(v[3] not in (0, 1) for v in got.values())
    # doc-boundary spanning actually happened: some example covers >1 doc,
    # and the 20-token doc alone fills at least one example (n_docs == 1)
    assert any(v[1] > 1 for v in got.values())
    assert any(v[1] == 1 and v[0] == C for v in got.values())


def test_pack_token_example_rows_matches_digest_form(spark):
    """The physical packer (actual ids + starts arrays) must agree with the
    digest manifest row-for-row: folding each emitted example's ids/starts
    reproduces pack_token_examples' digests, sizes match n_tokens, and
    every example except a shard's last is exactly context_len tokens."""
    from hiveka_spark.operators.sampling import (
        _DIGEST_MOD,
        pack_token_example_rows,
        pack_token_examples,
    )

    C = 8
    rows = [
        (0, 1, [1, 2, 3]),
        (0, 2, []),
        (0, 3, list(range(10, 30))),
        (0, 4, [7]),
        (1, 1, [5] * 8),
        (1, 2, [6, 6, 6]),
    ]
    df = spark.createDataFrame(
        rows, "shard bigint, shard_pos bigint, ids array<bigint>"
    )
    dig = {
        (r["shard"], r["ex_idx"]): r
        for r in pack_token_examples(df, C).collect()
    }
    phys = {
        (r["shard"], r["ex_idx"]): r
        for r in pack_token_example_rows(df, C).collect()
    }
    assert set(dig) == set(phys)
    last_ex = {}
    for (s, k) in phys:
        last_ex[s] = max(last_ex.get(s, -1), k)
    for key, r in phys.items():
        d = 0
        for x in r["ids"]:
            d = (d * 31 + x) % _DIGEST_MOD
        sd = 0
        for wpos in r["starts"]:
            sd = (sd * 31 + wpos + 1) % _DIGEST_MOD
        assert d == dig[key]["ids_digest"], key
        assert sd == dig[key]["starts_digest"], key
        assert len(r["ids"]) == dig[key]["n_tokens"], key
        assert r["n_docs"] == dig[key]["n_docs"], key
        if key[1] != last_ex[key[0]]:
            assert len(r["ids"]) == C, key


def test_pack_token_examples_property_random_corpora(spark):
    """Hypothesis sweep of the packer against the flat reference: random
    shard layouts, doc lengths (incl. empty and None), and context sizes —
    the boundary arithmetic (offsets, slice starts/lengths, boundary
    positions, trailing partials) must match the naive pack everywhere."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hiveka_spark.operators.sampling import _DIGEST_MOD, pack_token_examples

    docs = st.lists(
        st.one_of(
            st.none(),
            st.lists(st.integers(min_value=0, max_value=500), max_size=17),
        ),
        min_size=1,
        max_size=8,
    )

    @settings(max_examples=6, deadline=None)
    @given(docs=docs, c=st.integers(min_value=1, max_value=9))
    def run(docs, c):
        rows = [(i % 2, i, ids) for i, ids in enumerate(docs)]
        df = spark.createDataFrame(
            rows, "shard bigint, shard_pos bigint, ids array<bigint>"
        )
        got = {
            (r["shard"], r["ex_idx"]): (
                r["n_tokens"], r["n_docs"], r["ids_digest"], r["starts_digest"]
            )
            for r in pack_token_examples(df, c).collect()
        }
        want = {}
        for shard in (0, 1):
            stream, owner, starts = [], [], []
            for _, pos, ids in sorted(
                (r for r in rows if r[0] == shard), key=lambda r: r[1]
            ):
                ids = ids or []
                if ids:
                    starts.append(len(stream))
                stream.extend(ids)
                owner.extend([pos] * len(ids))
            for k in range((len(stream) + c - 1) // c):
                win = stream[k * c : (k + 1) * c]
                d = 0
                for x in win:
                    d = (d * 31 + x) % _DIGEST_MOD
                sd = 0
                for g in starts:
                    if k * c <= g < k * c + len(win):
                        sd = (sd * 31 + (g - k * c) + 1) % _DIGEST_MOD
                want[(shard, k)] = (
                    len(win), len(set(owner[k * c : (k + 1) * c])), d, sd
                )
        assert got == want

    run()


def test_pack_token_examples_composite_group_equals_per_group(spark):
    """The composite (epoch, shard) group key (x89) must equal running the
    single-key packer on each epoch's slice independently."""
    from hiveka_spark.operators.sampling import pack_token_examples

    C = 4
    rows = []
    for ep in (0, 1):
        # different orders per epoch: reversed positions in epoch 1
        for i in range(5):
            pos = i if ep == 0 else 5 - i
            rows.append((ep, i % 2, pos, [ep * 100 + i * 3 + j for j in range(i + 1)]))
    df = spark.createDataFrame(
        rows, "epoch bigint, shard bigint, shard_pos bigint, ids array<bigint>"
    )
    combined = {
        (r["epoch"], r["shard"], r["ex_idx"]): tuple(r)[3:]
        for r in pack_token_examples(df, C, shard_col=("epoch", "shard")).collect()
    }
    split = {}
    for ep in (0, 1):
        part = df.filter(F.col("epoch") == ep).drop("epoch")
        for r in pack_token_examples(part, C).collect():
            split[(ep, r["shard"], r["ex_idx"])] = tuple(r)[2:]
    assert combined == split and combined


def test_knn_chain_improves_adjacency_over_centroid_order(spark):
    """Round-14 verdict #3's 'must improve' clause: the greedy
    true-neighbor chain (x143) must produce a STRICTLY larger summed
    adjacent-pair dot than x107's distance-to-centroid order on the same
    segments, and both must beat the arrival order — otherwise the
    true-neighbor repack isn't buying anything over the surrogate."""
    import pyspark.sql.functions as FF

    from hiveka_spark.queries import REGISTRY, _ensure_loaded

    from .conftest import SF_SMOKE

    _ensure_loaded()
    x107 = REGISTRY["x107_related_packing"].fn(spark, SF_SMOKE)
    x143 = REGISTRY["x143_knn_chain_packing"].fn(spark, SF_SMOKE)
    cent = x107.agg(FF.sum("rel_adj_dot")).collect()[0][0]
    chain = x143.agg(FF.sum("chain_adj_dot")).collect()[0][0]
    arrival = x143.agg(FF.sum("arr_adj_dot")).collect()[0][0]
    assert chain > cent, (chain, cent)
    assert chain > arrival, (chain, arrival)
    # same segments: doc counts and token sums must agree exactly
    a = {(r.cell, r.seg): (r.n_docs, r.sum_len) for r in x107.collect()}
    b = {(r.cell, r.seg): (r.n_docs, r.sum_len) for r in x143.collect()}
    assert a == b


def test_greedy_chain_segments_tie_and_guard(spark):
    """The chain's argmax tie breaks to the MIN vec_id (the oracle's
    ROW_NUMBER order), a single-doc segment yields zero pairs, and the
    max_seg guard trips on oversized segments."""
    import pytest

    from hiveka_spark.operators.sampling import greedy_chain_segments

    # three docs: doc 0 starts (crank 1); docs 1 and 2 have EQUAL dots to
    # doc 0 (tie) -> chain must visit vec_id 1 before 2
    rows = [
        (0, 0, 0, 1, 10, [10000, 0]),
        (0, 0, 2, 2, 10, [10000, 10000]),
        (0, 0, 1, 3, 10, [10000, -10000]),
        (5, 0, 9, 1, 7, [1, 1]),  # singleton segment
    ]
    df = spark.createDataFrame(
        rows, "cell bigint, seg bigint, vec_id bigint, crank bigint,"
        " len bigint, qv array<bigint>"
    )
    out = {(r.cell, r.seg): r for r in
           greedy_chain_segments(df, budget=15).collect()}
    t = out[(0, 0)]
    # tie at dot=1e8 -> vec 1 first, then from vec 1: dot(1,2) = 1e8-1e8=0
    assert t.n_pairs == 2 and t.chain_adj_dot == 10**8 + 0
    assert t.n_chunks == 2  # lens 10,10,10 over budget 15 -> chunks 0,1,1
    s = out[(5, 0)]
    assert s.n_docs == 1 and s.n_pairs == 0 and s.chain_adj_dot == 0
    with pytest.raises(Exception, match="max_seg"):
        greedy_chain_segments(df.filter("cell = 0"), 15, max_seg=2).collect()
