"""Batch incremental MinHash dedup across corpus versions (operators/incremental.py)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from hiveka_spark.catalog import table
from hiveka_spark.operators import dedup as D
from hiveka_spark.operators.incremental import minhash_index_update
from hiveka_spark.plans.inspect import formatted_plan

from .conftest import SF_SMOKE


def _pairs(df):
    return {(r["id_a"], r["id_b"], r["jaccard"]) for r in df.collect()}


def test_incremental_equals_oneshot_across_three_versions(spark, tmp_path):
    """Split-invariance: three version drops must accumulate to exactly the
    one-shot batch answer over the union."""
    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    root = str(tmp_path / "idx")
    with D.dedup_cache_scope():
        for v, pred in (
            (1, F.col("doc_id") % 3 == 0),
            (2, F.col("doc_id") % 3 == 1),
            (3, F.col("doc_id") % 3 == 2),
        ):
            acc = minhash_index_update(spark, docs.filter(pred), root, v)
        oneshot = D.minhash_lsh_pairs(
            docs, "doc_id", "text", num_perm=32, bands=8, verify_threshold=0.8
        )
        assert _pairs(acc) == _pairs(oneshot)
        assert _pairs(acc), "fixture should contain planted near-duplicates"


def test_incremental_update_never_rereads_old_text(spark, tmp_path):
    """Two proofs that v1 text cannot be re-processed by the v2 update:
    (a) structural — no text column exists anywhere in the persisted index;
    (b) plan — the v2 update's accumulated-pairs plan scans only the state
    root (the original corpus parquet never appears)."""
    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    root = str(tmp_path / "idx")
    with D.dedup_cache_scope():
        minhash_index_update(spark, docs.filter(F.col("doc_id") % 2 == 0), root, 1)
        # (a) the index holds shingle arrays / band hashes / pairs only
        for store in ("sh", "bands", "pairs"):
            stored = spark.read.parquet(os.path.join(root, store, "b1"))
            assert "text" not in stored.columns, (store, stored.columns)
        acc = minhash_index_update(
            spark, docs.filter(F.col("doc_id") % 2 == 1), root, 2
        )
        plan = formatted_plan(acc)
        assert "documents.parquet" not in plan, plan
        assert _pairs(acc)


def test_incremental_version_guard(spark, tmp_path):
    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "text").limit(20)
    root = str(tmp_path / "idx")
    with D.dedup_cache_scope():
        minhash_index_update(spark, docs, root, 3)
        with pytest.raises(ValueError, match="version"):
            minhash_index_update(spark, docs, root, 3)
        with pytest.raises(ValueError, match="version"):
            minhash_index_update(spark, docs, root, 1)


def test_incremental_manifest_pins_parameters(spark, tmp_path):
    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "text").limit(20)
    root = str(tmp_path / "idx")
    with D.dedup_cache_scope():
        minhash_index_update(spark, docs, root, 1, num_perm=32, bands=8, k=3)
        with pytest.raises(ValueError, match="incomparable"):
            minhash_index_update(
                spark, docs.limit(5), root, 2, num_perm=64, bands=16, k=3
            )


def test_incremental_partial_version_is_retryable_and_invisible(spark, tmp_path):
    """A crash between the bands and pairs writes must leave a version that
    (a) does not block its own retry, (b) is never probed as a prior, and
    (c) after the retry the accumulated answer equals the one-shot run."""
    import shutil

    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    v1, v2 = docs.filter(F.col("doc_id") % 2 == 0), docs.filter(F.col("doc_id") % 2 == 1)
    root = str(tmp_path / "idx")
    with D.dedup_cache_scope():
        minhash_index_update(spark, v1, root, 1)
        # simulate the crash window: run v2 fully, then delete its pairs
        minhash_index_update(spark, v2, root, 2)
        shutil.rmtree(os.path.join(root, "pairs", "b2"))
        from hiveka_spark.operators.incremental import complete_versions

        assert complete_versions(root) == [1]
        # retry under the SAME id must be allowed and heal the index
        acc = minhash_index_update(spark, v2, root, 2)
        assert complete_versions(root) == [1, 2]
        oneshot = D.minhash_lsh_pairs(
            docs, "doc_id", "text", num_perm=32, bands=8, verify_threshold=0.8
        )
        assert _pairs(acc) == _pairs(oneshot) and _pairs(acc)


def test_batch_index_continues_into_streaming_dedup(spark, tmp_path):
    """Batch/streaming interop: a corpus version ingested by the BATCH
    index builder (x70) and a later version ingested by the STREAMING
    band-index sink (s19's stream_minhash_dedup, id_offset continuation)
    share one state layout — the combined pair set must equal the one-shot
    batch answer over the union.  This is the production handoff: backfill
    the index in batch, then keep deduping live drops as a stream."""
    from hiveka_spark.streaming.neardup import stream_minhash_dedup

    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    v1 = docs.filter(F.col("doc_id") % 2 == 0)
    v2 = docs.filter(F.col("doc_id") % 2 == 1)
    root = str(tmp_path / "idx")
    with D.dedup_cache_scope():
        minhash_index_update(spark, v1, root, 1)
        streamed = stream_minhash_dedup(
            spark, v2, n_batches=2,
            num_perm=32, bands=8, k=3, threshold=0.8,
            state_root=root, id_offset=2,
        )
        oneshot = D.minhash_lsh_pairs(
            docs, "doc_id", "text", num_perm=32, bands=8, verify_threshold=0.8
        )
        assert _pairs(streamed) == _pairs(oneshot) and _pairs(streamed)


def test_batch_continuation_through_compaction(spark, tmp_path):
    """Compaction between updates must be invisible to results: v1+v2 ->
    compact (three stores folded into ONE version each) -> v3 ingest probes
    the compacted index, and the accumulated answer still equals the
    one-shot batch run over the union."""
    from hiveka_spark.operators.incremental import (
        compact_minhash_index,
        complete_versions,
    )

    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    root = str(tmp_path / "idx")
    with D.dedup_cache_scope():
        minhash_index_update(spark, docs.filter(F.col("doc_id") % 3 == 0), root, 1)
        minhash_index_update(spark, docs.filter(F.col("doc_id") % 3 == 1), root, 2)
        new_id = compact_minhash_index(spark, root)
        assert new_id == 3 and complete_versions(root) == [3]
        for store in ("sh", "bands", "pairs"):
            dirs = os.listdir(os.path.join(root, store))
            assert [d for d in dirs if d.startswith("b")] == ["b3"], (store, dirs)
        acc = minhash_index_update(spark, docs.filter(F.col("doc_id") % 3 == 2), root, 4)
        oneshot = D.minhash_lsh_pairs(
            docs, "doc_id", "text", num_perm=32, bands=8, verify_threshold=0.8
        )
        assert _pairs(acc) == _pairs(oneshot) and _pairs(acc)


def test_batch_compaction_crash_window_is_retryable(spark, tmp_path):
    """Model the compactor's worst crash point — sh and bands for the new
    folded version published, crash BEFORE the pairs publish (pairs is
    deliberately last) and before any deletes: every old version must
    still be complete and live, the next ingest must keep working, and a
    compaction retry must converge under a fresh id."""
    from hiveka_spark.operators.incremental import (
        compact_minhash_index,
        complete_versions,
    )

    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    root = str(tmp_path / "idx")
    with D.dedup_cache_scope():
        minhash_index_update(spark, docs.filter(F.col("doc_id") % 3 == 0), root, 1)
        a2 = minhash_index_update(spark, docs.filter(F.col("doc_id") % 3 == 1), root, 2)
        before = _pairs(a2)

        # reproduce the compactor's first two publishes by hand (union of
        # complete versions -> b3), stopping where the crash would: pairs
        # untouched, no deletes run
        for store in ("sh", "bands"):
            sroot = os.path.join(root, store)
            spark.read.parquet(
                os.path.join(sroot, "b1"), os.path.join(sroot, "b2")
            ).write.parquet(os.path.join(sroot, "b3"))

        # partial b3 is invisible; the old state is fully live
        assert complete_versions(root) == [1, 2]
        acc = minhash_index_update(spark, docs.limit(0), root, 4)
        assert _pairs(acc) == before

        # retry: picks an id above EVERY existing dir (b3 partial, b4
        # ingest), folds the complete versions, cleans up the stale partial
        new_id = compact_minhash_index(spark, root)
        assert new_id == 5
        assert complete_versions(root) == [5]
        for store in ("sh", "bands", "pairs"):
            dirs = [d for d in os.listdir(os.path.join(root, store)) if d.startswith("b")]
            assert dirs == ["b5"], (store, dirs)
        acc = minhash_index_update(spark, docs.filter(F.col("doc_id") % 3 == 2), root, 6)
        oneshot = D.minhash_lsh_pairs(
            docs, "doc_id", "text", num_perm=32, bands=8, verify_threshold=0.8
        )
        assert _pairs(acc) == _pairs(oneshot) and _pairs(acc)


def test_auto_compaction_policy_bounds_version_dirs(spark, tmp_path):
    """compact_after=2: every time the complete-version count reaches 2 the
    stores fold to one dir, so the dir count stays bounded on a long
    ingest cadence and results are unchanged."""
    from hiveka_spark.operators.incremental import complete_versions

    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    root = str(tmp_path / "idx")
    with D.dedup_cache_scope():
        minhash_index_update(
            spark, docs.filter(F.col("doc_id") % 3 == 0), root, 1, compact_after=2
        )
        assert complete_versions(root) == [1]  # below the bound: no fold
        minhash_index_update(
            spark, docs.filter(F.col("doc_id") % 3 == 1), root, 2, compact_after=2
        )
        assert complete_versions(root) == [3]  # folded 1+2 -> 3
        acc = minhash_index_update(
            spark, docs.filter(F.col("doc_id") % 3 == 2), root, 4, compact_after=2
        )
        assert complete_versions(root) == [5]  # folded 3+4 -> 5
        oneshot = D.minhash_lsh_pairs(
            docs, "doc_id", "text", num_perm=32, bands=8, verify_threshold=0.8
        )
        assert _pairs(acc) == _pairs(oneshot) and _pairs(acc)


def test_substring_index_update_cross_version_and_guard(spark, tmp_path):
    """Incremental substring dedup: a v2 doc repeating a v1 span is flagged
    dup against the STORE (v1 text absent from the probe), within-v2
    repeats are flagged, novel v2 text is not, and a stale version id is
    rejected."""
    import pytest

    from hiveka_spark.operators.incremental import substring_index_update

    v1 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "one two three four five")],
        "doc_id bigint, text string",
    )
    v2 = spark.createDataFrame(
        [
            (10, "x alpha beta gamma delta y"),   # repeats a v1 window
            (11, "p q r s t"),                    # novel
            (12, "u v w z u v w z"),              # repeats within itself
        ],
        "doc_id bigint, text string",
    )
    store = str(tmp_path / "store")
    substring_index_update(spark, v1, store, 1, min_len=4).count()
    out = {
        r["doc_id"]: (r["n_dup_spans"], r["dup_words"])
        for r in substring_index_update(spark, v2, store, 2, min_len=4).collect()
    }
    # doc 10: windows 'alpha beta gamma delta' (pos 1) matches v1 doc 1's
    # window at pos 0 -> one 4-word span
    assert out[10] == (1, 4)
    assert out[11] == (0, 0)
    # doc 12: 'u v w z' at pos 0 and 4 (cnt 2 within the version) plus the
    # overlapping bridging windows ('v w z u' etc. occur once) -> spans
    # from the two duplicated starts, non-overlapping -> 2 spans, 8 words
    assert out[12] == (2, 8)

    with pytest.raises(ValueError, match="already holds version"):
        substring_index_update(spark, v2, store, 2, min_len=4)
