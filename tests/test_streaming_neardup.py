"""Batch-split invariance of the streaming MinHash band-index dedup.

The convergence contract s19's oracle checks for ONE split (4 batches vs
DuckDB) must hold for ANY split: each pair is discovered exactly once —
when the later doc arrives — so the union of per-batch emissions equals
the one-shot batch operator's answer regardless of how the corpus is cut
into micro-batches.  A violation here means the index probe either
misses cross-batch pairs (under-merge) or double-emits (over-merge)."""

from __future__ import annotations

import pyspark.sql.functions as F

from hiveka_spark.catalog import table
from hiveka_spark.operators.dedup import minhash_lsh_pairs
from hiveka_spark.streaming.neardup import stream_minhash_dedup

from .conftest import SF_SMOKE


def _pairset(df):
    return {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in df.select("id_a", "id_b", "jaccard").collect()
    }


def test_stream_equals_batch_for_any_split(spark):
    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    expected = _pairset(
        minhash_lsh_pairs(
            docs, num_perm=32, bands=8, k=3, verify_threshold=0.8, reuse=False
        )
    )
    assert expected, "fixture must contain planted near-dups"
    for n_batches in (1, 2, 7):
        got = _pairset(stream_minhash_dedup(spark, docs, n_batches=n_batches))
        assert got == expected, (
            f"split into {n_batches} batches diverged: "
            f"missing={expected - got}, extra={got - expected}"
        )


def test_continuation_through_compaction(spark, tmp_path):
    """The multi-run ingest story: stream half the corpus, COMPACT the band
    index, stream the other half into the same state root (id_offset above
    the old versions).  The accumulated pair set must equal the one-shot
    batch answer over the full corpus — compaction changed the index's
    file layout but not its content, and the second run's cross-batch
    probes found every old-corpus partner."""
    import os

    from hiveka_spark.streaming.neardup import compact_band_index

    root = str(tmp_path / "state")
    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    half1 = docs.filter(F.col("doc_id") % 2 == 0)
    half2 = docs.filter(F.col("doc_id") % 2 == 1)

    stream_minhash_dedup(spark, half1, n_batches=2, state_root=root)
    n_dirs_before = len(os.listdir(os.path.join(root, "bands")))
    compact_band_index(spark, root)
    n_dirs_after = len(os.listdir(os.path.join(root, "bands")))
    assert n_dirs_before == 2 and n_dirs_after == 1

    got = _pairset(
        stream_minhash_dedup(
            spark, half2, n_batches=2, state_root=root, id_offset=1000
        )
    )
    expected = _pairset(
        minhash_lsh_pairs(
            docs, num_perm=32, bands=8, k=3, verify_threshold=0.8, reuse=False
        )
    )
    assert got == expected, (
        f"missing={expected - got}, extra={got - expected}"
    )


def test_bucketed_compacted_segment_prunes_probe(spark, tmp_path):
    """Round-10 realization of the 'at 100 TB bucket by bh' comment: the
    compacted c-segment is laid out partitioned by bh_bucket, and a probe
    that passes its batch's bucket set (read_bands) must (a) show a
    PARTITION filter on bh_bucket in the physical scan — pruning happens
    at the directory level, before any file I/O — and (b) return exactly
    the rows a flat read + row filter returns, so the layout cannot
    change results."""
    import os

    from hiveka_spark.streaming.neardup import (
        N_BH_BUCKETS,
        committed_versions,
        compact_band_index,
        read_bands,
        stream_minhash_dedup,
    )

    root = str(tmp_path / "state")
    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    stream_minhash_dedup(spark, docs, n_batches=3, state_root=root)
    compact_band_index(spark, root)
    bands_root = os.path.join(root, "bands")
    dirs = committed_versions(bands_root, 10**9)
    assert [os.path.basename(d)[:1] for d in dirs] == ["c"]
    # partition layout on disk
    assert any(
        n.startswith("bh_bucket=") for n in os.listdir(dirs[0])
    ), os.listdir(dirs[0])

    everything = read_bands(spark, dirs)
    buckets = [0, 3, 17]
    pruned = read_bands(spark, dirs, bh_buckets=buckets)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bh_bucket" in plan, plan
    want = {
        (r["doc"], r["band"], r["bh"])
        for r in everything.filter(
            F.pmod(F.col("bh"), F.lit(N_BH_BUCKETS)).isin(buckets)
        ).collect()
    }
    got = {(r["doc"], r["band"], r["bh"]) for r in pruned.collect()}
    assert got == want and got  # non-vacuous: some rows land in the buckets
    # mixed layout (c-segment + fresh b-delta) reads and filters coherently
    sub = docs.limit(40)
    stream_minhash_dedup(spark, sub, n_batches=1, state_root=root, id_offset=2000)
    dirs2 = committed_versions(bands_root, 10**9)
    assert {os.path.basename(d)[:1] for d in dirs2} == {"b", "c"}
    mixed = read_bands(spark, dirs2, bh_buckets=buckets)
    flat = read_bands(spark, dirs2).filter(
        F.pmod(F.col("bh"), F.lit(N_BH_BUCKETS)).isin(buckets)
    )
    assert {tuple(r) for r in mixed.collect()} == {tuple(r) for r in flat.collect()}


def test_auto_compaction_mid_stream(spark, tmp_path):
    """compact_after folds the band index DURING the stream (between
    micro-batches): the run must still produce exactly the one-shot batch
    pair set, and the state must end folded into a single c{top} segment
    per probed store — the bounded-listing policy the x70 batch index got
    in round 8, now on the streaming index."""
    import os

    from hiveka_spark.streaming.neardup import committed_versions

    root = str(tmp_path / "state")
    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    expected = _pairset(
        minhash_lsh_pairs(
            docs, num_perm=32, bands=8, k=3, verify_threshold=0.8, reuse=False
        )
    )
    got = _pairset(
        stream_minhash_dedup(
            spark, docs, n_batches=4, state_root=root, compact_after=2
        )
    )
    assert got == expected, f"missing={expected - got}, extra={got - expected}"
    for sub in ("bands", "sh"):
        names = sorted(
            os.path.basename(p)
            for p in committed_versions(os.path.join(root, sub), 10**9)
        )
        # steady state: one folded segment of every PRIOR batch + the
        # last batch's own delta (never folded while it could replay)
        assert names == ["b3", "c2"], names
    # pairs store is an emission log, never probed: stays per-batch
    assert len(committed_versions(os.path.join(root, "pairs"), 10**9)) == 4


def test_auto_compaction_continuation_and_replay_retry(spark, tmp_path):
    """(a) a run continued INTO auto-compacted state (id_offset above the
    c segment) still accumulates the full-corpus pair set; (b) the
    crash-after-publish retry: a checkpoint-replayed batch recreates its
    b-dir next to the c segment that already folded it — the next
    compaction must delete the duplicate without changing index content."""
    import os

    from hiveka_spark.streaming.neardup import (
        committed_versions,
        compact_band_index,
        read_bands,
    )

    root = str(tmp_path / "state")
    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    half1 = docs.filter(F.col("doc_id") % 2 == 0)
    half2 = docs.filter(F.col("doc_id") % 2 == 1)

    stream_minhash_dedup(
        spark, half1, n_batches=3, state_root=root, compact_after=2
    )
    bands_root = os.path.join(root, "bands")
    assert [
        os.path.basename(p) for p in committed_versions(bands_root, 10**9)
    ] == ["b2", "c1"]

    # (b) simulate the replayed-batch duplicate: a copy of already-folded
    # content reappears as b9 (content identity is what matters — a real
    # replayed delta is written FLAT by the sink, so the duplicate is
    # materialized flat via read_bands, not copied with the c-segment's
    # partitioned layout); the clean between-runs compaction must fold
    # the duplicate away
    distinct_before = (
        read_bands(spark, committed_versions(bands_root, 10**9))
        .distinct()
        .count()
    )
    read_bands(spark, [os.path.join(bands_root, "c1")]).write.parquet(
        os.path.join(bands_root, "b9")
    )
    compact_band_index(spark, root)
    after = [os.path.basename(p) for p in committed_versions(bands_root, 10**9)]
    assert after == ["c9"], after
    # union keeps duplicate rows (documented-harmless); the SET is unchanged
    assert (
        read_bands(spark, [os.path.join(bands_root, "c9")]).distinct().count()
        == distinct_before
    )

    # (a) continuation: second half streams into the compacted state
    got = _pairset(
        stream_minhash_dedup(
            spark, half2, n_batches=2, state_root=root, id_offset=1000,
            compact_after=2,
        )
    )
    expected = _pairset(
        minhash_lsh_pairs(
            docs, num_perm=32, bands=8, k=3, verify_threshold=0.8, reuse=False
        )
    )
    assert got == expected, f"missing={expected - got}, extra={got - expected}"


def test_compaction_tmp_dir_is_invisible_and_recoverable(spark, tmp_path):
    """Crash-window semantics: a leftover _compact_tmp (crash before the
    publish rename) must be invisible to committed_versions — the old
    committed dirs remain the source of truth — and a subsequent
    compaction still works."""
    import os

    from hiveka_spark.streaming.neardup import (
        committed_versions,
        compact_band_index,
        stream_minhash_dedup,
    )

    root = str(tmp_path / "state")
    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "text").limit(60)
    stream_minhash_dedup(spark, docs, n_batches=2, state_root=root)
    bands_root = os.path.join(root, "bands")
    before = committed_versions(bands_root, 10**9)
    assert len(before) == 2
    rows_before = spark.read.parquet(*before).count()
    # simulate a crash that left a half-written tmp dir
    os.makedirs(os.path.join(bands_root, "_compact_tmp"))
    assert committed_versions(bands_root, 10**9) == before  # invisible
    compact_band_index(spark, root)
    after = committed_versions(bands_root, 10**9)
    assert len(after) == 1
    assert spark.read.parquet(*after).count() == rows_before


# ---------------------------------------------------------------------------
# Streaming SUBSTRING dedup (s30): split invariance + kill-and-resume
# ---------------------------------------------------------------------------


def _substr_rowset(df):
    return sorted(tuple(r) for r in df.collect())


def test_substring_stream_equals_batch_for_any_split(spark):
    """The converged streaming report equals the one-shot batch operator
    for several micro-batch splits (batch-split invariance — the retro
    emission rule is what makes 1-batch == 2-batch == 5-batch)."""
    from hiveka_spark.operators.dedup import substring_dup_spans
    from hiveka_spark.streaming.neardup import stream_substring_dedup

    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    expected = _substr_rowset(substring_dup_spans(docs, min_len=10))
    for n in (1, 2, 5):
        got = _substr_rowset(
            stream_substring_dedup(spark, docs, n_batches=n, min_len=10)
        )
        assert got == expected, f"split into {n} batches diverged"


def test_substring_stream_kill_and_resume(spark, tmp_path):
    """Kill before batch 1 runs (batch 0 committed), resume with a FRESH
    sink + query object on the same src/checkpoint/state roots: the
    resumed run's converged report equals the uninterrupted control."""
    from hiveka_spark.operators.dedup import substring_dup_spans
    from hiveka_spark.streaming.neardup import (
        committed_versions,
        make_substring_sink,
        stream_substring_dedup,
    )

    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    expected = _substr_rowset(substring_dup_spans(docs, min_len=10))

    state = str(tmp_path / "state")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    class CrashBefore:
        def __init__(self, inner, crash_on):
            self.inner, self.crash_on, self.tripped = inner, crash_on, False

        def __call__(self, batch_df, batch_id):
            if batch_id == self.crash_on and not self.tripped:
                self.tripped = True
                raise RuntimeError("injected kill")
            self.inner(batch_df, batch_id)

    crash = CrashBefore(make_substring_sink(state, 10), crash_on=1)
    try:
        stream_substring_dedup(
            spark, docs, n_batches=4, min_len=10,
            state_root=state, src_dir=src, checkpoint_dir=ckpt, sink_fn=crash,
        )
        raise AssertionError("injected kill did not propagate")
    except Exception as e:
        assert "injected kill" in str(e) or crash.tripped

    import os

    committed = committed_versions(os.path.join(state, "starts"), 10**9)
    assert len(committed) == 1, f"expected only batch 0 committed: {committed}"

    # resume: docs=None (no source rewrite), fresh sink, same roots
    got = _substr_rowset(
        stream_substring_dedup(
            spark, None, min_len=10,
            state_root=state, src_dir=src, checkpoint_dir=ckpt,
        )
    )
    assert got == expected


def test_substring_stream_compaction_preserves_answer(spark, tmp_path):
    """Auto-compaction mid-stream (wc segments folded into c{top} with the
    aggregating fold) leaves the converged report equal to both the
    uncompacted stream and the one-shot batch operator, and actually
    compacted (a c-dir exists, fewer committed dirs)."""
    import os

    from hiveka_spark.operators.dedup import substring_dup_spans
    from hiveka_spark.streaming.neardup import stream_substring_dedup

    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    expected = _substr_rowset(substring_dup_spans(docs, min_len=10))
    state = str(tmp_path / "state")
    got = _substr_rowset(
        stream_substring_dedup(
            spark, docs, n_batches=5, min_len=10,
            state_root=state, compact_after=2,
        )
    )
    assert got == expected
    wc = os.path.join(state, "wc")
    names = sorted(os.listdir(wc))
    assert any(n.startswith("c") for n in names), names


def test_substring_compaction_crash_retry_finishes_deletes(spark, tmp_path):
    """A crash between the c-dir publish and the input deletes must not
    re-fold on retry: the second call just finishes the deletes and the
    folded counts stay exactly the segment sums (no duplication)."""
    import os

    import pyspark.sql.functions as FF

    from hiveka_spark.streaming.neardup import (
        committed_versions,
        compact_window_counts,
    )

    wc = str(tmp_path / "state" / "wc")
    os.makedirs(wc)
    for b, rows in ((0, [(11, 1, 100, 0), (22, 2, 101, 3)]),
                    (1, [(11, 2, 102, 5)])):
        spark.createDataFrame(
            rows, "h bigint, cnt bigint, first_doc bigint, first_pos bigint"
        ).write.mode("overwrite").parquet(f"{wc}/b{b}")

    # simulate crash-after-publish: build the fold by hand as c1 while the
    # input dirs b0/b1 are still on disk (exactly the window between the
    # atomic rename and the input deletes)
    import shutil

    agg = (
        spark.read.parquet(f"{wc}/b0", f"{wc}/b1")
        .groupBy("h")
        .agg(
            FF.sum("cnt").cast("bigint").alias("cnt"),
            FF.min(FF.struct(FF.col("first_doc").alias("doc"),
                             FF.col("first_pos").alias("pos0"))).alias("f"),
        )
        .select("h", "cnt", FF.col("f.doc").alias("first_doc"),
                FF.col("f.pos0").alias("first_pos"))
    )
    agg.write.mode("overwrite").parquet(f"{wc}/_compact_tmp")
    os.rename(f"{wc}/_compact_tmp", f"{wc}/c1")
    assert len(committed_versions(wc, 10**9)) == 3  # b0, b1, c1 all visible

    # retry: the target-exists guard must SKIP the fold (re-folding would
    # union c1 with its own inputs and double every count) and just
    # finish the deletes; the count equality below is the tripwire
    compact_window_counts(spark, str(tmp_path / "state"))
    dirs = committed_versions(wc, 10**9)
    assert len(dirs) == 1 and os.path.basename(dirs[0]).startswith("c")
    got = {r.h: (r.cnt, r.first_doc, r.first_pos)
           for r in spark.read.parquet(dirs[0]).collect()}
    assert got[11] == (3, 100, 0)   # 1 + 2, min first kept
    assert got[22] == (2, 101, 3)
    assert len(got) == 2


def test_wc_probe_shadows_stale_deltas_in_crash_window(spark, tmp_path):
    """Round-14 advice regression: with BOTH the published c-dir and its
    not-yet-deleted b-dir inputs on disk (the crash window between
    compact_window_counts' rename and its deletes), the next batch's
    prior probe must see each folded window ONCE.  Summing both would
    give a once-seen window pcnt=2, the pcnt==1 retro rule would skip
    emitting the stored first occurrence, and the corrupted starts/b{id}
    would be overwritten permanently."""
    import os
    import shutil

    from hiveka_spark.streaming.neardup import (
        committed_versions,
        make_substring_sink,
        wc_committed_versions,
    )

    state = str(tmp_path / "state")
    sink = make_substring_sink(state, min_len=10)
    wc = os.path.join(state, "wc")
    starts = os.path.join(state, "starts")

    text = "a b c d e f g h i j"  # 10 words: exactly one length-10 window
    sink(spark.createDataFrame([(100, text)],
                               "doc_id bigint, text string"), 0)

    # crash window: c0 (fold of b0) published, b0's delete unfinished
    shutil.copytree(os.path.join(wc, "b0"), os.path.join(wc, "c0"))
    assert len(committed_versions(wc, 10**9)) == 2
    live = wc_committed_versions(wc, 10**9)
    assert [os.path.basename(d) for d in live] == ["c0"]

    # batch 1 brings the second copy: prior pcnt must be 1, so the stored
    # first occurrence (100, 0) is retro-emitted alongside (200, 0)
    sink(spark.createDataFrame([(200, text)],
                               "doc_id bigint, text string"), 1)
    got = {
        (r.doc, r.pos0)
        for r in spark.read.parquet(os.path.join(starts, "b1")).collect()
    }
    assert got == {(100, 0), (200, 0)}


def test_ivf_serving_shadows_crash_window_duplicates(spark, tmp_path):
    """Round-14 advice regression: in ivf_index_compact's crash window
    (published _COMPACTED segment + not-yet-deleted inputs), serving must
    NOT read every index row twice — a duplicated neighbor would occupy
    two of the k slots and evict a true neighbor.  Also: a half-written
    segment (no _SUCCESS) never enters the plan, and the compact retry
    just finishes the deletes."""
    import os
    import shutil

    import pyspark.sql.functions as FF
    from pyspark.sql import Window

    from hiveka_spark.catalog import table
    from hiveka_spark.operators.similarity import (
        ivf_index_compact,
        ivf_index_segments,
        ivf_index_topk,
        ivf_index_update,
        ivf_index_versions,
    )

    root = str(tmp_path / "ivf")
    e = table(spark, SF_SMOKE, "embeddings")
    w = Window.orderBy("vec_id")
    cents = (
        e.filter(FF.col("vec_id") % 31 == 0)
        .withColumn("cell", (FF.row_number().over(w) - 1).cast("bigint"))
        .filter(FF.col("cell") < 4)
        .select("cell", "embedding")
        .localCheckpoint(eager=True)
    )
    ivf_index_update(spark, e.filter(FF.col("vec_id") % 2 == 0), root, 1, cents)
    ivf_index_update(spark, e.filter(FF.col("vec_id") % 2 == 1), root, 2, cents)
    q = e.filter(FF.col("vec_id") < 5)

    def serve():
        return sorted(
            (r.query_id, r.rank, r.neighbor_id, r.cosine)
            for r in ivf_index_topk(
                spark, root, q, cents, k=5, n_probe=2
            ).collect()
        )

    baseline = serve()

    # build the crash window by hand: fold v1+v2 into a _COMPACTED v=3,
    # leave the inputs on disk (rename done, deletes not)
    segs = ivf_index_segments(root)
    tmp = os.path.join(root, "_compact_tmp")
    spark.read.parquet(*segs).sort("cell").write.mode("overwrite").parquet(tmp)
    open(os.path.join(tmp, "_COMPACTED"), "w").close()
    os.rename(tmp, os.path.join(root, "v=3"))
    assert ivf_index_versions(root) == [1, 2, 3]

    live = ivf_index_segments(root)
    assert [os.path.basename(d) for d in live] == ["v=3"]
    assert serve() == baseline, "crash-window serving diverged"

    # half-written append (no _SUCCESS) is invisible to serving
    shutil.copytree(os.path.join(root, "v=3"), os.path.join(root, "v=4"))
    os.remove(os.path.join(root, "v=4", "_SUCCESS"))
    assert [os.path.basename(d) for d in ivf_index_segments(root)] == ["v=3"]
    assert serve() == baseline
    shutil.rmtree(os.path.join(root, "v=4"))

    # retry finishes the deletes without re-folding
    n_rows = spark.read.parquet(*ivf_index_segments(root)).count()
    nxt = ivf_index_compact(spark, root)
    assert ivf_index_versions(root) == [3] and nxt == 4
    assert spark.read.parquet(os.path.join(root, "v=3")).count() == n_rows
    assert serve() == baseline
