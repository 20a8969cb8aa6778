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
    import shutil

    from hiveka_spark.streaming.neardup import (
        committed_versions,
        compact_band_index,
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
    # content reappears as b9 (content identity is what matters); the
    # clean between-runs compaction must fold the duplicate away
    distinct_before = (
        spark.read.parquet(*committed_versions(bands_root, 10**9))
        .distinct()
        .count()
    )
    shutil.copytree(os.path.join(bands_root, "c1"), os.path.join(bands_root, "b9"))
    compact_band_index(spark, root)
    after = [os.path.basename(p) for p in committed_versions(bands_root, 10**9)]
    assert after == ["c9"], after
    # union keeps duplicate rows (documented-harmless); the SET is unchanged
    assert (
        spark.read.parquet(os.path.join(bands_root, "c9")).distinct().count()
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
