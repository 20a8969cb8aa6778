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


def wc_committed_versions(root: str, before: int) -> list[str]:
    """LIVE committed window-count store dirs: :func:`committed_versions`
    with stale-delta SHADOWING — every dir (``b`` or older ``c``) whose id
    is <= the max committed c-dir id is dropped unless it IS that c-dir,
    because a c-dir by construction AGGREGATES every version <= its id.

    Why the wc store needs this and the band index does not: the band
    probe is distinct-on-pairs, so reading a folded b-dir alongside the
    c-dir that contains it only duplicates rows it then distincts away.
    The wc probe SUMS ``cnt`` — in the crash window between
    :func:`compact_window_counts`' atomic c{top} publish and its input
    deletes, summing both would double-count every folded window: a
    window truly seen once gets pcnt=2, the pcnt==1 retro rule in
    :func:`make_substring_sink` silently skips emitting its stored first
    occurrence, and the replayed batch overwrites ``starts/b{id}`` with
    the corrupted result permanently (round-14 advice).  Both the sink's
    prior probe and the compactor read through this wrapper, so that
    crash window costs only disk until the next fold finishes the
    deletes."""
    dirs = committed_versions(root, before)
    cids = [
        int(os.path.basename(d)[1:])
        for d in dirs
        if os.path.basename(d).startswith("c")
    ]
    if not cids:
        return dirs
    mc = max(cids)
    return [
        d
        for d in dirs
        if int(os.path.basename(d)[1:]) > mc
        or os.path.basename(d) == f"c{mc}"
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
        prior_bands = committed_versions(bands_root, batch_id)
        bands_out = D.minhash_band_rows(
            None, "doc_id", "text",
            num_perm=num_perm, bands=bands, k=k, reuse=False, shingle_df=sh_cur,
        )
        obs = None
        if prior_bands:
            # the batch's distinct bh_buckets ride the band-write job as an
            # Observation accumulator (r16, guide §1.2: replaces a separate
            # distinct+collect job per micro-batch for <= N_BH_BUCKETS ints)
            from pyspark.sql import Observation

            obs = Observation()
            bands_out = bands_out.observe(
                obs,
                F.collect_set(
                    F.pmod(F.col("bh"), F.lit(N_BH_BUCKETS))
                ).alias("bk"),
            )
        bands_out.write.mode("overwrite").parquet(
            os.path.join(bands_root, f"b{batch_id}")
        )
        bands_cur = s.read.parquet(os.path.join(bands_root, f"b{batch_id}"))
        sh_all = s.read.parquet(
            os.path.join(sh_root, f"b{batch_id}"),
            *committed_versions(sh_root, batch_id),
        )
        a = bands_cur.select(F.col("doc").alias("id_a"), "band", "bh")
        b = bands_cur.select(F.col("doc").alias("id_b"), "band", "bh")
        cand = a.join(b, ["band", "bh"]).filter(F.col("id_a") < F.col("id_b"))
        if prior_bands:
            # everything the probe join could match lives in the batch's
            # bucket set, so the committed c-segment prunes to matching
            # partition dirs before any read
            buckets = list(obs.get["bk"])
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


# ---------------------------------------------------------------------------
# Streaming SUBSTRING dedup over a persisted window-count store (gate s30) —
# the live arm of x96/x99, completing the live x incremental matrix for the
# substring family.
# ---------------------------------------------------------------------------


def make_substring_sink(state_root: str, min_len: int = 10,
                        compact_after: int | None = None):
    """foreachBatch sink for :func:`stream_substring_dedup` — exposed so
    the kill-and-resume test can wrap it (the s23 _CrashBefore pattern).

    Store layout (the s16/s19 versioned-dir discipline, everything
    overwrite-by-batch-id so checkpoint replay is idempotent):

    - ``wc/b{id}``: this batch's window-count segment — per distinct
      window hash (h, cnt, first_doc, first_pos).  The (doc, pos0) of the
      FIRST occurrence rides the 16-byte count row precisely so a later
      copy can RETRO-emit it: when a window's accumulated prior count is
      exactly 1 and this batch brings another copy, the single earlier
      occurrence becomes duplicated NOW and is emitted from the store —
      without it, convergence to the one-shot x96 answer would be
      impossible without re-reading old text (which this store exists to
      avoid; x99's no-reprocess contract).
    - ``starts/b{id}``: this batch's emitted duplicated-window starts
      (doc, pos0).

    Emission rule per batch (the occurrence-level analog of s19's
    "a pair is discovered when the later doc arrives"):
    1. every occurrence IN this batch of a window whose batch+prior
       count >= 2, plus
    2. the stored first occurrence of every window with prior count
       EXACTLY 1 that this batch touches (prior >= 2 means those
       occurrences were already emitted by earlier batches).
    Together: every occurrence of every globally duplicated window is
    emitted exactly once by the time the last batch commits, for ANY
    split of the corpus into micro-batches."""
    from hiveka_spark.operators.dedup import _window_occurrences

    wc_root = os.path.join(state_root, "wc")
    starts_root = os.path.join(state_root, "starts")
    for p in (wc_root, starts_root):
        os.makedirs(p, exist_ok=True)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        # checkpoint=True: the batch is tokenized ONCE; the segment write
        # and the starts probe both read the materialized frame
        _sizes, occ = _window_occurrences(
            batch_df, "text", "doc_id", min_len, checkpoint=True
        )
        occ.groupBy("h").agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.min(F.struct("doc", "pos0")).alias("first"),
        ).select(
            "h", "cnt",
            F.col("first.doc").alias("first_doc"),
            F.col("first.pos0").alias("first_pos"),
        ).write.mode("overwrite").parquet(os.path.join(wc_root, f"b{batch_id}"))
        own = s.read.parquet(os.path.join(wc_root, f"b{batch_id}"))

        prior_dirs = wc_committed_versions(wc_root, batch_id)
        if prior_dirs:
            prior = (
                s.read.parquet(*prior_dirs)
                .groupBy("h")
                .agg(
                    F.sum("cnt").cast("bigint").alias("pcnt"),
                    F.min(
                        F.struct(
                            F.col("first_doc").alias("doc"),
                            F.col("first_pos").alias("pos0"),
                        )
                    ).alias("pfirst"),
                )
            )
            j = own.join(prior, "h", "left")
            duph = j.filter(
                F.col("cnt") + F.coalesce("pcnt", F.lit(0)) >= 2
            ).select("h", "pcnt", "pfirst")
            new_starts = occ.join(duph.select("h"), "h").select("doc", "pos0")
            retro = duph.filter(F.col("pcnt") == 1).select(
                F.col("pfirst.doc").alias("doc"),
                F.col("pfirst.pos0").alias("pos0"),
            )
            starts_out = new_starts.unionByName(retro)
        else:
            duph0 = own.filter(F.col("cnt") >= 2).select("h")
            starts_out = occ.join(duph0, "h").select("doc", "pos0")
        starts_out.distinct().write.mode("overwrite").parquet(
            os.path.join(starts_root, f"b{batch_id}")
        )
        # trigger on COMMITTED dirs, not the shadowed live view: after a
        # crashed fold the live count collapses to 1 while the folded
        # b-dirs still sit on disk, and the fold pass is also what
        # finishes those deletes — it must keep firing until the listing
        # is actually bounded again (make_ivf_stream_sink's rule)
        if (
            compact_after is not None
            and len(committed_versions(wc_root, 10**9)) >= compact_after
        ):
            # before=batch_id: never fold THIS batch's dir (replay safety
            # — compact_band_index's in-stream rule)
            compact_window_counts(s, state_root, before=batch_id)

    return sink


def stream_substring_dedup(
    spark: SparkSession,
    docs: DataFrame | None,
    n_batches: int = 4,
    min_len: int = 10,
    state_root: str | None = None,
    src_dir: str | None = None,
    checkpoint_dir: str | None = None,
    sink_fn=None,
    compact_after: int | None = None,
) -> DataFrame:
    """Run ``docs`` (doc_id, text) through the streaming window-count
    substring dedup as ``n_batches`` REAL micro-batches and return the
    CONVERGED per-doc duplicated-span report — (doc_id, n_words,
    n_dup_spans, dup_words, dup_frac_q), equal to the one-shot
    :func:`~hiveka_spark.operators.dedup.substring_dup_spans` over the
    whole corpus for any batch split (gate s30's oracle pins one split
    against x96's DuckDB replay; the tests pin several splits against the
    batch operator and kill-and-resume).

    ``docs=None`` RESUMES on existing ``src_dir``/``checkpoint_dir``
    without rewriting the source (rewriting would mint new file names and
    desync the checkpoint's seen-file log).

    Scale shape per batch: one Lx window pass over the BATCH only, one
    map-side-combinable count aggregate persisted as the batch's 16-byte-
    row segment, one hash-keyed probe of the accumulated store, and the
    final report's island merge runs once per doc at read time.  Old text
    is never re-read — the retro emission rides the store's stored first
    occurrence.  Segment folding at long horizons is the same c-dir
    compaction recipe as the band index."""
    from hiveka_spark.operators.dedup import _dup_span_stats, _window_occurrences

    src_dir = src_dir or scratch_dir(prefix="ssubstr_src_")
    state_root = state_root or scratch_dir(prefix="ssubstr_state_")
    checkpoint_dir = checkpoint_dir or scratch_dir(prefix="ckpt_ssubstr_")
    if docs is not None:
        docs.select("doc_id", "text").repartition(n_batches).write.mode(
            "overwrite"
        ).parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    sink = sink_fn or make_substring_sink(state_root, min_len,
                                          compact_after=compact_after)
    q = (
        stream.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = committed_versions(os.path.join(state_root, "starts"), 10**9)
    assert emitted, "no micro-batch emitted starts output"
    starts = spark.read.parquet(*emitted).distinct()
    sizes, _occ = _window_occurrences(
        spark.read.parquet(src_dir), "text", "doc_id", min_len
    )
    return _dup_span_stats(sizes, starts, min_len, "doc_id")


def compact_window_counts(
    spark: SparkSession, state_root: str, before: int = 10**9
) -> None:
    """Fold committed window-count segments (``wc/b{id}``, id < before)
    into ONE compacted segment ``c{top}`` — :func:`compact_band_index`'s
    recipe for the substring store, with one difference: the fold
    AGGREGATES (per window hash: cnt = segment sum, first = min
    (doc, pos) struct) instead of unioning, so the store stays one row
    per distinct window.  Probe semantics are unchanged exactly because
    the probe already computes this aggregate over segment rows — cnt
    sums and the min-struct both commute with the fold (pinned by
    tests/test_streaming_neardup.py).  Same publish ordering as the band
    compaction (publish c{top} atomically, pass ``before = current batch
    id`` mid-stream) — but because summed counts do NOT tolerate the
    crash window between publish and input deletes the way the band
    index's distinct-on-pairs probe does, the fold reads through
    :func:`wc_committed_versions` (dirs already folded into a committed
    c-dir are shadowed, never re-summed) and FIRST finishes any stale
    deletes a crashed prior fold left behind."""
    import shutil

    root = os.path.join(state_root, "wc")
    all_dirs = committed_versions(root, before)
    dirs = wc_committed_versions(root, before)
    for d in set(all_dirs) - set(dirs):
        # crash-retry: these were folded into the committed c-dir by a
        # prior compaction that died before its deletes — finish them
        # (re-folding them would double-count every window permanently)
        shutil.rmtree(d, ignore_errors=True)
    if len(dirs) <= 1:
        return
    top = max(int(os.path.basename(d)[1:]) for d in dirs)
    target = os.path.join(root, f"c{top}")
    if not os.path.exists(target):
        tmp = os.path.join(root, "_compact_tmp")
        (
            spark.read.parquet(*dirs)
            .groupBy("h")
            .agg(
                F.sum("cnt").cast("bigint").alias("cnt"),
                F.min(
                    F.struct(
                        F.col("first_doc").alias("doc"),
                        F.col("first_pos").alias("pos0"),
                    )
                ).alias("first"),
            )
            .select(
                "h", "cnt",
                F.col("first.doc").alias("first_doc"),
                F.col("first.pos0").alias("first_pos"),
            )
            .write.mode("overwrite")
            .parquet(tmp)
        )
        os.rename(tmp, target)
    for d in dirs:
        if os.path.abspath(d) != os.path.abspath(target):
            shutil.rmtree(d)
