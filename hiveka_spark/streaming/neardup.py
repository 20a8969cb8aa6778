"""Streaming MinHash near-dup dedup over a persisted band index.

The streaming twin of ``operators.dedup.minhash_lsh_pairs`` (see s19 in
queries/streaming_queries.py for the gate-entry framing).  Each
micro-batch:

1. computes MinHash band rows + shingle sets for ITS docs only,
2. writes them to per-batch versioned dirs (``bands/b{id}``, ``sh/b{id}``,
   overwrite — a checkpoint-replayed batch rewrites its own version),
3. probes the committed band index of all PRIOR batches for cross-batch
   candidates and self-joins for within-batch candidates,
4. Jaccard-verifies both against the accumulated shingle store, and
5. emits verified pairs to ``pairs/b{id}``.

Convergence contract (batch-split invariance): a pair (a, b) is
discovered exactly once — when the later doc arrives — so the union of
per-batch emissions equals the one-shot batch ``minhash_lsh_pairs``
result REGARDLESS of how the corpus is split into micro-batches.  The
s19 oracle checks one split against DuckDB; ``tests/test_streaming_
neardup.py`` checks several splits against the batch operator.

Scale shape: per batch one signature aggregate over the batch only (the
index is never recomputed), one (band, bh)-keyed equi-join against the
index.  The compacted segment is partitioned by ``bh_bucket`` so probes
prune to the batch's own buckets (:func:`read_bands`), and per-batch
dirs fold periodically (``compact_after``).  The remaining 100 TB knob:
relax the shingle-store verify to signature-estimated Jaccard if
exactness can be traded for state size.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hiveka_spark.scratch import scratch_dir


#: partition fan-out of the compacted band segment: c{top} is laid out as
#: bh_bucket=pmod(bh, N)/ dirs so a probe that knows its batch's buckets
#: prunes the committed index to matching directories before any read.
#: 64 keeps per-bucket files large at gate scale; at 100 TB raise it with
#: index size (it only changes the DIRECTORY fan-out, not results).
N_BH_BUCKETS = 64


def read_bands(
    s: SparkSession, dirs: list[str], bh_buckets: list[int] | None = None
) -> DataFrame:
    """Read band-index version dirs as one (doc, band, bh) frame.
    Per-batch ``b{id}`` deltas are flat parquet; compacted ``c{top}``
    segments are partitioned by ``bh_bucket`` — the two layouts cannot
    share one ``spark.read.parquet(*paths)`` call (partition discovery
    needs a uniform structure), so they read separately and union.
    With ``bh_buckets`` (the probing batch's own bucket set — at most
    :data:`N_BH_BUCKETS` values), the c-segment scan is PARTITION-PRUNED
    to matching directories (plan-asserted in
    tests/test_streaming_neardup.py) and the deltas take the equivalent
    row filter; without it, everything is read."""
    cs = [d for d in dirs if os.path.basename(d).startswith("c")]
    bs = [d for d in dirs if os.path.basename(d).startswith("b")]
    frames = []
    if bs:
        f = s.read.parquet(*bs)
        if bh_buckets is not None:
            f = f.filter(
                F.pmod(F.col("bh"), F.lit(N_BH_BUCKETS)).isin(bh_buckets)
            )
        frames.append(f.select("doc", "band", "bh"))
    if cs:
        f = s.read.parquet(*cs)
        if bh_buckets is not None:
            f = f.filter(F.col("bh_bucket").isin(bh_buckets))
        frames.append(f.select("doc", "band", "bh"))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def committed_versions(root: str, before: int) -> list[str]:
    """Committed (``_SUCCESS``-marked) version dirs with id < ``before`` —
    the disk-derived predecessor rule (the s16 discipline).  Two dir
    kinds, one namespace of ids: ``b{id}`` per-batch deltas and ``c{id}``
    compacted base segments (the fold of every version <= id); a c-dir's
    id is the HIGHEST batch it contains, so the ``id < before`` probe
    guard applies to both unchanged."""
    return [
        os.path.join(root, n)
        for n in sorted(os.listdir(root))
        if n[:1] in ("b", "c")
        and n[1:].isdigit()
        and int(n[1:]) < before
        and os.path.exists(os.path.join(root, n, "_SUCCESS"))
    ]


def compact_band_index(
    spark: SparkSession, state_root: str, before: int = 10**9
) -> None:
    """Merge committed versions of the band index (and the shingle store)
    with id < ``before`` into ONE compacted segment ``c{top}`` (top =
    highest folded id), deleting the inputs.

    The per-batch dirs grow without bound on a long-running ingest (one
    dir per micro-batch; 8 band rows per doc forever), and each new batch
    reads ALL of them — at some point the file-listing and small-file
    overhead dominates the probe.  Index CONTENT is a set of per-doc
    rows, so the merge is a pure union — probe results before and after
    are identical (pinned by
    tests/test_streaming_neardup.py::test_continuation_through_compaction).
    The bands rewrite is laid out partitioned by ``bh_bucket`` =
    pmod(bh, :data:`N_BH_BUCKETS`) so probes prune to matching
    directories (:func:`read_bands`); results are layout-independent.

    Safe to run BETWEEN batches of a live stream (foreachBatch calls are
    serialized — the ``compact_after`` knob of stream_minhash_dedup /
    StreamCurationSink does exactly this) as well as between runs.  Two
    rules make it replay-safe:

    - the compacted segment lives under the ``c`` prefix so a FUTURE
      batch id can never collide with it (publishing under b{top+1}
      would be overwritten by the stream's next micro-batch);
    - in-stream callers pass ``before = current batch id`` so the
      CURRENT batch's own dir is never folded: folding it would name the
      segment c{batch_id}, and a checkpoint REPLAY of that batch — whose
      prior-probe excludes ids >= batch_id — would see an empty index
      and silently re-emit fewer pairs into its overwritten output.
      With the guard, a replayed batch probes exactly the segment its
      first run probed.  (Run the unbounded default only between CLEANLY
      terminated runs, where no replay can be pending.)

    Crash ordering: materialize the merged copy, PUBLISH it atomically as
    ``c{top}`` (fresh name — rename is atomic), only then delete the
    inputs.  A crash before the rename leaves the old dirs intact (tmp is
    invisible to committed_versions); a crash after it leaves duplicate
    rows, which every consumer tolerates (candidate/pair ``.distinct()``,
    identical re-verified jaccards), and the retry path detects the
    published ``c{top}`` and just finishes the deletes — c{top} by
    construction contains every committed version with id <= top."""
    import shutil

    for sub in ("bands", "sh"):
        root = os.path.join(state_root, sub)
        dirs = committed_versions(root, before)
        if len(dirs) <= 1:
            continue
        top = max(int(os.path.basename(d)[1:]) for d in dirs)
        target = os.path.join(root, f"c{top}")
        if not os.path.exists(target):
            tmp = os.path.join(root, "_compact_tmp")
            if sub == "bands":
                # the probed store: lay the fold out partitioned by
                # bh_bucket so future probes prune directories (the
                # round-9 "at 100 TB" comment, made real); read_bands
                # handles the delta/segment layout split on the way in
                read_bands(spark, dirs).withColumn(
                    "bh_bucket", F.pmod(F.col("bh"), F.lit(N_BH_BUCKETS))
                ).write.mode("overwrite").partitionBy("bh_bucket").parquet(tmp)
            else:
                spark.read.parquet(*dirs).write.mode("overwrite").parquet(tmp)
            os.rename(tmp, target)
        # finish (or retry after a crash-after-publish): every other
        # committed dir with id <= top is already folded into c{top}
        for d in dirs:
            if os.path.abspath(d) != os.path.abspath(target):
                shutil.rmtree(d)


def stream_minhash_dedup(
    spark: SparkSession,
    docs: DataFrame,
    n_batches: int = 4,
    num_perm: int = 32,
    bands: int = 8,
    k: int = 3,
    threshold: float = 0.8,
    state_root: str | None = None,
    id_offset: int = 0,
    compact_after: int | None = None,
) -> DataFrame:
    """Run ``docs`` (doc_id, text) through the streaming band-index dedup
    as ``n_batches`` REAL micro-batches; returns the distinct verified
    (id_a, id_b, jaccard) pair set — accumulated across ALL runs sharing
    ``state_root``, not just this one.  See module docstring.

    ``id_offset`` shifts this run's version-dir ids: a RESUMED stream
    (same checkpoint) continues Spark's batch ids automatically, but a
    NEW stream over newly landed files restarts at 0 — pass an offset
    above every existing version so the new run's state sorts after (and
    probes) the old corpus instead of overwriting it.  This is the
    multi-run ingest story: run -> compact_band_index -> run again.

    ``compact_after``: AUTO-compaction policy (the x70 batch index's knob
    on the streaming index): when set and the number of committed band
    versions reaches it at the end of a micro-batch, the bands+sh stores
    are folded into one ``c{top}`` segment before the next batch — safe
    mid-stream because foreachBatch calls are serialized and the
    compacted segment's name can never collide with a future batch id.
    A long-running ingest otherwise pays O(batches) version-dir listing
    on every probe forever; N bounds it at a constant.  The pairs store
    (pure emission log, never probed) stays per-batch."""
    from hiveka_spark.operators import dedup as D

    src_dir = scratch_dir(prefix="sneardup_src_")
    state_root = state_root or scratch_dir(prefix="sneardup_state_")
    bands_root = os.path.join(state_root, "bands")
    sh_root = os.path.join(state_root, "sh")
    pairs_root = os.path.join(state_root, "pairs")
    for p in (bands_root, sh_root, pairs_root):
        os.makedirs(p, exist_ok=True)
    # Collision guard: this run's versions (starting at id_offset) must
    # sort strictly after every existing committed version, or batch 0
    # would OVERWRITE the prior corpus's b0 state and silently corrupt
    # the accumulated pair set.  Cheap (one listdir per store), and it
    # turns the forgotten-id_offset mistake into an error.
    existing = [
        int(os.path.basename(d)[1:])
        for root in (bands_root, sh_root, pairs_root)
        for d in committed_versions(root, 10**9)
    ]
    if existing and id_offset <= max(existing):
        raise ValueError(
            f"state_root already holds versions up to b{max(existing)}; "
            f"pass id_offset > {max(existing)} to continue into it "
            "(or a fresh state_root)"
        )

    docs.select("doc_id", "text").repartition(n_batches).write.mode(
        "overwrite"
    ).parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_id = batch_id + id_offset
        s = batch_df.sparkSession
        # write this batch's shingles FIRST, read them back, and derive
        # band rows FROM the read-back frame: one tokenization pass per
        # batch instead of two, and the parquet round trip doubles as the
        # persist (each frame feeds two consumers) while making replay
        # idempotent (overwrite by id)
        D._shingle_sets(batch_df, "doc_id", "text", k, reuse=False).write.mode(
            "overwrite"
        ).parquet(os.path.join(sh_root, f"b{batch_id}"))
        sh_cur = s.read.parquet(os.path.join(sh_root, f"b{batch_id}"))
        D.minhash_band_rows(
            None, "doc_id", "text",
            num_perm=num_perm, bands=bands, k=k, reuse=False, shingle_df=sh_cur,
        ).write.mode("overwrite").parquet(os.path.join(bands_root, f"b{batch_id}"))
        bands_cur = s.read.parquet(os.path.join(bands_root, f"b{batch_id}"))
        sh_all = s.read.parquet(
            os.path.join(sh_root, f"b{batch_id}"),
            *committed_versions(sh_root, batch_id),
        )
        a = bands_cur.select(F.col("doc").alias("id_a"), "band", "bh")
        b = bands_cur.select(F.col("doc").alias("id_b"), "band", "bh")
        cand = a.join(b, ["band", "bh"]).filter(F.col("id_a") < F.col("id_b"))
        prior_bands = committed_versions(bands_root, batch_id)
        if prior_bands:
            # the batch's own bucket set (<= N_BH_BUCKETS values, one tiny
            # aggregate over this batch's band rows): everything the probe
            # join could match lives in these buckets, so the committed
            # c-segment prunes to matching partition dirs before any read
            buckets = [
                r[0]
                for r in bands_cur.select(
                    F.pmod(F.col("bh"), F.lit(N_BH_BUCKETS)).alias("bk")
                )
                .distinct()
                .collect()
            ]
            idx = read_bands(s, prior_bands, bh_buckets=buckets).select(
                F.col("doc").alias("id_old"), "band", "bh"
            )
            new = bands_cur.select(F.col("doc").alias("id_new"), "band", "bh")
            cross = (
                idx.join(new, ["band", "bh"])
                # a doc_id re-ingested in a later batch/run matches its own
                # band index entries; without this filter it would emit a
                # degenerate self-pair (id_a == id_b, jaccard 1.0) the
                # one-shot batch operator can never produce, breaking
                # batch-split invariance for re-ingested ids
                .filter(F.col("id_old") != F.col("id_new"))
                .select(
                    F.least("id_old", "id_new").alias("id_a"),
                    F.greatest("id_old", "id_new").alias("id_b"),
                )
            )
            cand = cand.select("id_a", "id_b").unionByName(cross)
        cand = cand.select("id_a", "id_b").distinct()
        D._verified_jaccard(cand, sh_all, threshold).write.mode(
            "overwrite"
        ).parquet(os.path.join(pairs_root, f"b{batch_id}"))
        if (
            compact_after is not None
            and len(committed_versions(bands_root, 10**9)) >= compact_after
        ):
            # before=batch_id: never fold THIS batch's dir (replay safety,
            # see compact_band_index)
            compact_band_index(s, state_root, before=batch_id)

    q = (
        stream.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", scratch_dir(prefix="ckpt_sneardup_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = committed_versions(pairs_root, 10**9)
    assert emitted, "no micro-batch emitted pairs output"
    return spark.read.parquet(*emitted).distinct()
