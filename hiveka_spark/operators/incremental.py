"""Batch incremental MinHash dedup across corpus versions.

The production pattern for a GROWING corpus: v1 was deduped last month;
v2 lands today.  Re-running the one-shot pair finder (x03) over v1 ∪ v2
re-tokenizes, re-hashes, and re-joins the entire history every release —
at 100 TB the old corpus dominates and that cost is almost all waste.
This module composes the streaming band index's state layout (s19,
``streaming/neardup.py``) with the batch pair finder: each corpus version
appends its shingle sets and LSH band rows to a persisted index, and new
pairs are found by (a) a self-join within the new version and (b) an
equi-join of the new version's band rows against the PERSISTED index —
the old corpus's text is never re-read, never re-shingled, never
re-hashed.  Invariant (oracle-checked by gate x70 and property-tested):
the accumulated pair set equals the one-shot batch answer over the union.

State layout (the s16/s19 versioned discipline): ``state_root/{sh,bands,
pairs}/b{version}`` parquet dirs, committed = ``_SUCCESS`` present,
priors re-derived from disk.  Version ids must increase; a stale or
repeated version id is an error (the neardup id_offset guard).  The
stored state holds shingle ARRAYS and band hashes only — no text column
exists anywhere in the index, which is the structural proof that old
text cannot be re-processed.

Scale shape per update: one shingle+signature pass over the NEW docs
only; one (band, bh)-keyed equi-join of new band rows against the index
(bucket-local, the only join touching old state); Jaccard verification
reads only candidate docs' shingle rows.  Index growth is linear in
corpus size; compaction (``streaming.neardup.compact_band_index``) folds
old versions together when the dir count matters.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hiveka_spark.operators import dedup as D
from hiveka_spark.streaming.neardup import committed_versions


def _existing_versions(state_root: str) -> list[int]:
    out: set[int] = set()
    for store in ("sh", "bands", "pairs"):
        root = os.path.join(state_root, store)
        if os.path.isdir(root):
            out.update(
                int(os.path.basename(p)[1:]) for p in committed_versions(root, 10**9)
            )
    return sorted(out)


def minhash_index_update(
    spark: SparkSession,
    docs: DataFrame,
    state_root: str,
    version: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    bands: int = 8,
    k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Add corpus ``version`` to the persisted MinHash index; return the
    ACCUMULATED verified near-dup pair set (id_a, id_b, jaccard) over every
    version ingested so far.  ``docs`` must contain ONLY the new version's
    documents (ids globally unique across versions — re-ingesting an id
    would pair it with itself; the cross probe filters the degenerate
    self-pair like streaming/neardup.py does)."""
    existing = _existing_versions(state_root)
    if existing and version <= max(existing):
        raise ValueError(
            f"index already holds version b{max(existing)}; pass a version "
            f"> {max(existing)} (or a fresh state_root)"
        )
    sh_root = os.path.join(state_root, "sh")
    bands_root = os.path.join(state_root, "bands")
    pairs_root = os.path.join(state_root, "pairs")

    # 1. shingle + band the NEW docs once; both stores are written from one
    #    persisted shingle frame, then re-read from disk so every downstream
    #    plan (including this update's own verify) runs off the index, not
    #    the text — the same no-recompute rule the index gives FUTURE runs.
    sh_new = D._shingle_sets(docs, id_col, text_col, k, reuse=True)
    sh_new.write.mode("overwrite").parquet(os.path.join(sh_root, f"b{version}"))
    sh_new_disk = spark.read.parquet(os.path.join(sh_root, f"b{version}"))
    D.minhash_band_rows(
        None, num_perm=num_perm, bands=bands, shingle_df=sh_new_disk
    ).write.mode("overwrite").parquet(os.path.join(bands_root, f"b{version}"))
    bands_new = spark.read.parquet(os.path.join(bands_root, f"b{version}"))

    # 2. candidates: within-version self-join + probe of the persisted index
    a = bands_new.select(F.col("doc").alias("id_a"), "band", "bh")
    b = bands_new.select(F.col("doc").alias("id_b"), "band", "bh")
    cand = a.join(b, ["band", "bh"]).filter(F.col("id_a") < F.col("id_b"))
    prior_bands = committed_versions(bands_root, version)
    sh_sources = [os.path.join(sh_root, f"b{version}")]
    if prior_bands:
        idx = spark.read.parquet(*prior_bands).select(
            F.col("doc").alias("id_old"), "band", "bh"
        )
        new = bands_new.select(F.col("doc").alias("id_new"), "band", "bh")
        cross = (
            idx.join(new, ["band", "bh"])
            .filter(F.col("id_old") != F.col("id_new"))
            .select(
                F.least("id_old", "id_new").alias("id_a"),
                F.greatest("id_old", "id_new").alias("id_b"),
            )
        )
        cand = cand.select("id_a", "id_b").unionByName(cross)
        sh_sources = [p for p in committed_versions(sh_root, version)] + sh_sources
    cand = cand.select("id_a", "id_b").distinct()

    # 3. exact-verify against the shingle STORE (old shingles come from the
    #    index; text never re-enters), emit this version's pairs
    sh_all = spark.read.parquet(*sh_sources)
    D._verified_jaccard(cand, sh_all, threshold).write.mode("overwrite").parquet(
        os.path.join(pairs_root, f"b{version}")
    )

    # 4. accumulated answer across every committed version
    return (
        spark.read.parquet(*committed_versions(pairs_root, 10**9))
        .select("id_a", "id_b", "jaccard")
        .distinct()
    )
