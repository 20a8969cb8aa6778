"""Plan-shape assertions: the 100-TB posture is checked here, not just
correctness — pushdown, pruning, broadcast, bounded shuffles."""

from __future__ import annotations

import pytest

from hiveka_spark.plans.inspect import (
    assert_column_pruned,
    assert_filter_pushed,
    codegen_stage_count,
    has_broadcast_join,
    pushed_filters,
    shuffle_count,
)
from hiveka_spark.queries.relational import (
    q01_pricing_summary,
    q02_filter_project,
    q04_brand_revenue,
    q10_top_orders,
    q24_regional_revenue,
)

from .conftest import SF_SMOKE


def test_q01_filter_reaches_scan(spark):
    df = q01_pricing_summary(spark, SF_SMOKE)
    assert_filter_pushed(df, "l_shipdate")
    # projection pruning: the scan must not read unused l_orderkey
    assert_column_pruned(df, "l_returnflag", "l_orderkey")


def test_q02_all_predicates_pushed(spark):
    df = q02_filter_project(spark, SF_SMOKE)
    pf = " ".join(pushed_filters(df))
    for col in ("o_orderstatus", "o_totalprice", "o_orderpriority"):
        assert col in pf, f"{col} missing from PushedFilters: {pf}"
    # 4-column projection: o_orderdate must be pruned from the scan
    assert_column_pruned(df, "o_orderkey", "o_orderdate")


def test_q04_broadcasts_dimension(spark):
    assert has_broadcast_join(q04_brand_revenue(spark, SF_SMOKE))


def test_q24_star_join_broadcasts(spark):
    df = q24_regional_revenue(spark, SF_SMOKE)
    assert has_broadcast_join(df)
    # star joins with broadcast dims: lineitem side must not shuffle for the
    # joins themselves; only the final groupBy aggregates (<= 3 exchanges:
    # join-side + partial/final agg; a plain sort-merge plan would need 5+)
    assert shuffle_count(df) <= 3, f"too many shuffles: {shuffle_count(df)}"


def test_q01_single_shuffle(spark):
    # scan -> partial agg -> exchange -> final agg: exactly one shuffle
    assert shuffle_count(q01_pricing_summary(spark, SF_SMOKE)) == 1


def test_q10_uses_take_ordered(spark):
    from hiveka_spark.plans.inspect import formatted_plan

    plan = formatted_plan(q10_top_orders(spark, SF_SMOKE))
    # global sort+limit must compile to TakeOrderedAndProject, not a full sort
    assert "TakeOrderedAndProject" in plan


def test_codegen_spans_exist(spark):
    assert codegen_stage_count(q01_pricing_summary(spark, SF_SMOKE)) >= 1


# ---------------------------------------------------------------- new surface
def test_q28_theta_join_is_broadcast_nlj(spark):
    from hiveka_spark.plans.inspect import formatted_plan
    from hiveka_spark.queries.relational_ext import q28_theta_join

    plan = formatted_plan(q28_theta_join(spark, SF_SMOKE))
    # pure inequality join against an O(1) side must broadcast, never
    # cartesian-shuffle
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_q35_pivot_broadcasts_nation(spark):
    from hiveka_spark.queries.relational_ext import q35_pivot

    assert has_broadcast_join(q35_pivot(spark, SF_SMOKE))


def test_q30_percentiles_single_shuffle(spark):
    from hiveka_spark.queries.relational_ext import q30_percentiles

    assert shuffle_count(q30_percentiles(spark, SF_SMOKE)) == 1


def test_x06_ann_broadcasts_queries(spark):
    from hiveka_spark.plans.inspect import formatted_plan
    from hiveka_spark.queries.extensions import x06_ann_topk

    plan = formatted_plan(x06_ann_topk(spark, SF_SMOKE))
    assert "Broadcast" in plan  # query side broadcast, corpus never shuffled
    assert "CartesianProduct" not in plan


def test_x05_neardup_no_all_pairs_product(spark):
    from hiveka_spark.plans.inspect import formatted_plan
    from hiveka_spark.queries.extensions import x05_embedding_neardup

    # the default near-dup plan is LSH blocking: candidate generation must be
    # an equi-join on (table, bucket) — never a self cross product
    plan = formatted_plan(x05_embedding_neardup(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_x02_no_cartesian(spark):
    from hiveka_spark.plans.inspect import formatted_plan
    from hiveka_spark.queries.extensions import x02_dedup_ngram_jaccard

    # prefix-filtered exact jaccard: equi-joins only, no all-pairs product
    assert "CartesianProduct" not in formatted_plan(x02_dedup_ngram_jaccard(spark, SF_SMOKE))


def test_q29_single_window_shuffle(spark):
    from hiveka_spark.queries.relational_ext import q29_window_frames

    # every analytic fn shares one per-customer ordering: exactly one exchange
    assert shuffle_count(q29_window_frames(spark, SF_SMOKE)) == 1


def test_x35_bm25_is_take_ordered(spark):
    """Top-k must be TakeOrderedAndProject (no global sort) and the postings
    filter on query terms must reach the scan residual."""
    from hiveka_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    df = REGISTRY["x35_bm25_search"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # row_number over a global window limited to k compiles to a window +
    # filter; what must NOT appear is a full Exchange-ranged global sort
    assert "rangepartitioning" not in plan.lower().replace(" ", "") or "Window" in plan


def test_x41_broadcasts_eval_side(spark):
    """The eval band table must broadcast — the training corpus never
    shuffles for the candidate join."""
    import pyspark.sql.functions as F

    from hiveka_spark.operators import dedup as D
    from hiveka_spark.catalog import table as t

    d = t(spark, SF_SMOKE, "documents")
    ev = d.filter(F.col("source").isin("src0", "src1"))
    tr = d.filter(~F.col("source").isin("src0", "src1"))
    cand = D.minhash_cross_contamination(tr, ev, threshold=0.8)
    assert has_broadcast_join(cand)


def test_q44_grid_is_broadcast_and_bounded_shuffles(spark):
    from hiveka_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    df = REGISTRY["q44_gap_fill"].fn(spark, SF_SMOKE)
    assert has_broadcast_join(df)
    assert shuffle_count(df) <= 4


def test_x37_semdedup_no_corpus_cartesian(spark):
    """The only nested-loop join is vs the broadcast centroid set (bounded);
    the pair search must be a cell equi-join, not an all-pairs product."""
    from hiveka_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    df = REGISTRY["x37_semdedup"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the verify join on (cell, ...) appears as SortMergeJoin or ShuffledHashJoin
    assert "Join" in plan


def test_ivf_and_semdedup_lazy_with_explicit_stride(spark):
    """VERDICT r4 #4: with an explicit centroid_stride (or centroids frame),
    ivf_topk/semantic_dedup must trigger NO Spark action at construction —
    the corpus.count() fallback is the only eager path and is small-scale
    only.  The corpus here poisons every action (mapInPandas raises), so
    merely BUILDING the plans proves no full-corpus pass happens before
    candidate generation."""
    import pyspark.sql.functions as F
    from hiveka_spark.operators.similarity import ivf_topk, semantic_dedup

    def poison(batches):
        raise RuntimeError("corpus was scanned at plan-construction time")
        yield  # pragma: no cover

    corpus = spark.range(100).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.rand(seed=1) for _ in range(4)]).alias("embedding"),
    ).mapInPandas(poison, "vec_id long, embedding array<double>")

    ivf = ivf_topk(
        corpus, corpus.filter(F.col("vec_id") < 5), "vec_id", "embedding",
        k=3, n_cells=4, n_probe=2, centroid_stride=7,
    )
    sem = semantic_dedup(
        corpus, "vec_id", "embedding", n_cells=4, threshold=0.3, centroid_stride=7
    )
    assert ivf.columns == ["query_id", "neighbor_id", "cosine", "rank"]
    assert sem.columns == ["vec_id", "cell", "kept_by", "cosine"]
    # sanity: the poison IS live — any action on these plans must raise
    with pytest.raises(Exception):
        ivf.count()


def test_ivf_explicit_centroids_frame(spark):
    """The production interface: offline-trained centroids handed in as a
    (cell, embedding) frame — results must match the stride derivation that
    would pick the same vectors."""
    import pyspark.sql.functions as F
    from hiveka_spark.operators.similarity import ivf_topk

    corpus = spark.range(40).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 7).cast("double"),
            (F.col("id") % 5).cast("double"),
            F.lit(1.0),
        ).alias("embedding"),
    ).cache()
    queries = corpus.filter(F.col("vec_id") < 3)
    by_stride = ivf_topk(
        corpus, queries, "vec_id", "embedding", k=3, n_cells=4, n_probe=2,
        centroid_stride=10, dim=3,
    )
    cents = corpus.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") / 10).cast("bigint").alias("cell"), "embedding"
    )
    by_frame = ivf_topk(
        corpus, queries, "vec_id", "embedding", k=3, n_cells=4, n_probe=2,
        centroids=cents, dim=3,
    )
    assert sorted(map(tuple, by_stride.collect())) == sorted(map(tuple, by_frame.collect()))


def test_x47_chunking_is_map_only(spark):
    """Tokenize -> window-count -> slice is all narrow expressions: the
    chunker must plan ZERO exchanges (it scales with input bytes only)."""
    from hiveka_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    assert shuffle_count(REGISTRY["x47_chunk_overlap"].fn(spark, SF_SMOKE)) == 0


def test_x48_pq_broadcasts_lut_no_cartesian(spark):
    """PQ/ADC: centroid join and the LUT join must both broadcast; nothing
    may plan as a cartesian/nested-loop product, and the keyed aggregates
    (ADC sum, rank window) bound the exchanges — plus one more when the
    degenerate-parallelism guard repartitions a single-file gate input (at
    scale that branch never fires), plus the CENTROID-SIZED candidate-array
    rollup (_pq_cands, r16: m * n_centroids rows, bounded at any corpus
    size — it replaced the corpus-sized SortAggregate argmin exchange)."""
    from hiveka_spark.plans.inspect import formatted_plan
    from hiveka_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    df = REGISTRY["x48_pq_ann"].fn(spark, SF_SMOKE)
    plan = formatted_plan(df)
    assert has_broadcast_join(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert shuffle_count(df) <= 5
    # the corpus-sized argmin SortAggregate is gone: no sort-based
    # aggregate should remain anywhere in the encode path
    assert "SortAggregate" not in plan


def test_x49_phash_band_join_no_cartesian(spark):
    """pHash dedup: candidate generation must be an equi-join on
    (band_idx, band_val) — never an all-pairs product over images."""
    from hiveka_spark.plans.inspect import formatted_plan
    from hiveka_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    plan = formatted_plan(REGISTRY["x49_image_phash_dedup"].fn(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_x50_report_window_feeds_groupby(spark):
    """The dataset-card report: both window functions and the final group-by
    stay keyed on source; the only extra exchanges are the multi-distinct
    Expand rewrite (3 total, all on slim rows)."""
    from hiveka_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    assert shuffle_count(REGISTRY["x50_corpus_report"].fn(spark, SF_SMOKE)) <= 3


def test_x52_kmeans_assignment_broadcasts(spark):
    """k-means assignment must broadcast the k-row centroid frame; the only
    joins are vs that broadcast — no CartesianProduct over the corpus."""
    from hiveka_spark.plans.inspect import formatted_plan
    from hiveka_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    df = REGISTRY["x52_kmeans_clusters"].fn(spark, SF_SMOKE)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "Broadcast" in plan


def test_x53_bucketed_join_zero_join_shuffles(spark):
    """The gate entry's returned frame reads two identically-bucketed tables:
    the join must plan with no Exchange on either side — the only shuffle is
    the final aggregate."""
    from hiveka_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    df = REGISTRY["x53_bucketed_join"].fn(spark, SF_SMOKE)
    assert shuffle_count(df) <= 1


def test_x54_partition_pruning_reaches_scan(spark):
    """The lang predicate must appear as a PartitionFilter (pruned at
    planning from directory names), not a post-scan Filter over all rows."""
    from hiveka_spark.plans.inspect import formatted_plan, partition_filters
    from hiveka_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    df = REGISTRY["x54_partitioned_layout"].fn(spark, SF_SMOKE)
    pf = " ".join(partition_filters(df))
    assert "lang" in pf, f"lang missing from PartitionFilters: {pf}"
    plan = formatted_plan(df)
    assert "PartitionFilters: []" not in plan


def test_x55_ivfpq_no_cartesian_bounded_shuffles(spark):
    """IVFPQ: centroids, probes, and the ADC LUT all broadcast; no
    CartesianProduct anywhere.  Exchanges are bounded (repartition guard,
    two cell-argmin windows, the build-time id-keyed cell join, ADC sum,
    rank) — all keyed, none corpus-squared — plus the CENTROID-SIZED
    candidate-array rollup (_pq_cands, r16: m * n_centroids rows, bounded
    at any corpus size — it replaced the corpus-sized SortAggregate code
    argmin exchange)."""
    from hiveka_spark.plans.inspect import formatted_plan
    from hiveka_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    df = REGISTRY["x55_ivfpq_ann"].fn(spark, SF_SMOKE)
    plan = formatted_plan(df)
    assert has_broadcast_join(df)
    assert "CartesianProduct" not in plan
    assert shuffle_count(df) <= 10
    # the corpus-sized argmin SortAggregate is gone from the encode path
    assert "SortAggregate" not in plan


def test_x60_no_stage_recomputation(spark):
    """The composed curation pipeline must read each stage frontier from
    its materialized checkpoint, never re-derive the corpus at a stage
    boundary: every stage consumer is a slim ``Scan ExistingRDD`` over the
    frontier's eager localCheckpoint (r17 — checkpoints also truncate the
    8-stage chain's analyzed lineage, the plan-size fix), and the corpus
    source appears NOWHERE in the report plan."""
    from hiveka_spark.catalog import table
    from hiveka_spark.operators.dedup import dedup_cache_scope
    from hiveka_spark.plans.inspect import formatted_plan
    from hiveka_spark.queries.pipeline_e2e import build_curation_report

    d = table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    with dedup_cache_scope() as scope:
        report = build_curation_report(d, scope)
        # materialize as the real run does
        report.count()
        plan = formatted_plan(report)
        frontier_reads = plan.count("Scan ExistingRDD")
        # 8+ consumers across the stage chain read materialized frontiers
        assert frontier_reads >= 8, f"only {frontier_reads} frontier reads:\n{plan}"
        # the corpus parquet never appears — every stage boundary reads a
        # checkpointed frontier, nothing recomputes the corpus
        corpus_scans = plan.count("documents.parquet")
        assert corpus_scans == 0, f"{corpus_scans} corpus scans:\n{plan}"
        assert len(scope) >= 7  # ing,e,n4,train,n5,ntok,kept + shingle sets


def test_x65_global_rank_has_no_single_partition_exchange(spark):
    """The epoch-shuffle rank must come from the distributed recipe
    (range-partition + local rank + broadcast offsets), never from a
    partitionBy-less global window — which plans as Exchange
    SinglePartition and funnels the whole corpus through one task.
    Asserted on the operator's lazy plan (the x65 entry localCheckpoints
    its small result, which hides the upstream plan — the x60 situation),
    plus a correctness pin against the naive single-partition rank."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from hiveka_spark.catalog import table
    from hiveka_spark.operators.dedup import dedup_cache_scope, portable_hash60
    from hiveka_spark.operators.sampling import global_hash_rank
    from hiveka_spark.plans.inspect import formatted_plan

    d = table(spark, SF_SMOKE, "documents")
    with dedup_cache_scope():
        ranked = global_hash_rank(d, "doc_id", "epoch0_", "pos")
        plan = formatted_plan(ranked)
        assert "SinglePartition" not in plan, plan
        assert "rangepartitioning" in plan.lower(), plan
        got = {(r["doc_id"], r["pos"]) for r in ranked.collect()}
    # the distributed rank must equal the naive global-window rank
    h = portable_hash60(F.concat(F.lit("epoch0_"), F.col("doc_id").cast("string")))
    naive = d.select(
        "doc_id",
        F.row_number().over(Window.orderBy(h, "doc_id")).cast("bigint").alias("pos"),
    )
    assert got == {(r["doc_id"], r["pos"]) for r in naive.collect()}


def test_x71_epoch_shards_no_single_partition_and_no_counts_collect(spark):
    """The production sharding variant must be pure shuffle-by-shard +
    per-shard window: no SinglePartition exchange, no range partitioning
    (that would mean a hidden global sort), and the x65 global rank's
    broadcast-offsets join must be absent."""
    from hiveka_spark.catalog import table
    from hiveka_spark.operators.sampling import epoch_shards
    from hiveka_spark.plans.inspect import formatted_plan

    d = table(spark, SF_SMOKE, "documents")
    out = epoch_shards(d, "doc_id", "epoch0_", 8)
    plan = formatted_plan(out)
    assert "SinglePartition" not in plan, plan
    assert "rangepartitioning" not in plan.lower(), plan
    assert "BroadcastHashJoin" not in plan, plan
    # shards partition the corpus and positions are dense 1..|shard|
    rows = out.collect()
    assert len(rows) == d.count()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["shard_pos"])
    assert set(by_shard) == set(range(8))
    for ps in by_shard.values():
        assert sorted(ps) == list(range(1, len(ps) + 1))


def test_bpe_max_words_cap_is_take_ordered(spark):
    """The vocab cap must plan as TakeOrderedAndProject (distributed
    per-partition top-K), never a SinglePartition sort of the full
    vocabulary."""
    from hiveka_spark.catalog import table
    from hiveka_spark.operators.bpe import word_freq
    from hiveka_spark.plans.inspect import formatted_plan

    import pyspark.sql.functions as F

    d = table(spark, SF_SMOKE, "documents")
    capped = word_freq(d).orderBy(F.desc("freq"), "w").limit(2000)
    plan = formatted_plan(capped)
    assert "TakeOrderedAndProject" in plan, plan
    assert "SinglePartition" not in plan, plan


def test_bpe_apply_fast_plan_is_flat(spark):
    """The production tokenizer's whole point: a two-node plan (scan ->
    mapInPandas) with ZERO shuffles and ZERO window operators at ANY merge
    count — vs the certification twin's 2-4 stacked windows per merge."""
    from hiveka_spark.catalog import table
    from hiveka_spark.operators.bpe import bpe_apply_fast
    from hiveka_spark.plans.inspect import formatted_plan

    d = table(spark, SF_SMOKE, "documents")
    mt = [("a", "b"), ("c", "d"), ("ab", "cd")] * 100  # size is irrelevant
    out = bpe_apply_fast(d, mt, units=True)
    plan = formatted_plan(out)
    assert "MapInPandas" in plan, plan
    assert "Window" not in plan, plan
    assert "Exchange" not in plan, plan
    assert shuffle_count(out) == 0, plan


def test_bpe_encode_decode_plans_are_flat(spark):
    """x80/x81/x82's ship paths share the tokenizer's scale shape: encode
    (digest form AND raw-ids form with pass-through columns) and decode
    must each plan as scan -> MapInPandas with zero shuffles and zero
    windows at any merge count — the broadcast-dict posture, end to end."""
    import pyspark.sql.functions as F

    from hiveka_spark.catalog import table
    from hiveka_spark.operators.bpe import (
        bpe_decode_ids,
        bpe_encode,
        bpe_encode_ids,
        bpe_vocab,
    )
    from hiveka_spark.plans.inspect import formatted_plan

    d = table(spark, SF_SMOKE, "documents").withColumn(
        "extra", F.lit(1).cast("bigint")
    )
    mt = [("a", "b"), ("c", "d"), ("ab", "cd")] * 100
    vocab = bpe_vocab(mt, [chr(c) for c in range(ord("a"), ord("z") + 1)])
    for out in (
        bpe_encode(d, mt, vocab, units=True),
        bpe_encode_ids(d, mt, vocab, units=True, keep_cols=("extra",)),
        bpe_decode_ids(
            bpe_encode_ids(d, mt, vocab, units=True), vocab
        ),
    ):
        plan = formatted_plan(out)
        assert "MapInPandas" in plan, plan
        assert "Window" not in plan and "Exchange" not in plan, plan
        assert shuffle_count(out) == 0, plan


def test_x78_multi_epoch_staged_scans_corpus_once(spark):
    """The multi-epoch export's whole point: E=2 epoch orders from ONE
    corpus scan.  The staged frame's plan must contain exactly one
    documents.parquet scan (the epoch fan-out is a generator, not a
    self-union), one hash exchange keyed on the epoch/shard, and no
    SinglePartition or range exchange (no hidden global sort)."""
    from hiveka_spark.plans.inspect import formatted_plan
    from hiveka_spark.queries.curation_ext import x78_staged

    staged = x78_staged(spark, SF_SMOKE)
    plan = formatted_plan(staged)
    assert plan.count("documents.parquet") == 1, plan
    assert "Generate" in plan, plan  # posexplode fan-out, not a union
    assert "SinglePartition" not in plan, plan
    assert "rangepartitioning" not in plan.lower(), plan
    assert shuffle_count(staged) == 1, plan


def test_x85_multi_epoch_token_manifest_tokenizes_once(spark):
    """The token manifest's multi-epoch composition (x85): per-doc token
    digests are epoch-invariant, so the tokenizer's mapInPandas must
    appear exactly ONCE in the staged plan for E=2 epochs — the epoch
    fan-out (a Generate over the slim per-doc digest rows) happens ABOVE
    the tokenize, never below it, and the corpus parquet is scanned once
    on the tokenize path.  No SinglePartition, no hidden global sort."""
    import re

    from hiveka_spark.plans.inspect import formatted_plan
    from hiveka_spark.queries.curation_ext import x85_staged

    staged = x85_staged(spark, SF_SMOKE)
    plan = formatted_plan(staged)
    # count detail-section node headers (each operator once, like
    # shuffle_count): ONE tokenize pass serving E=2 epochs
    assert len(re.findall(r"^\(\d+\) MapInPandas", plan, re.M)) == 1, plan
    assert "Generate" in plan, plan  # posexplode fan-out, not a union
    assert "SinglePartition" not in plan, plan
    assert "rangepartitioning" not in plan.lower(), plan
    assert shuffle_count(staged) == 1, plan  # the (epoch, shard) exchange


def test_x89_multi_epoch_packed_tokenizes_once_one_exchange(spark):
    """x89's whole point: E=2 epochs of packed examples from ONE tokenize
    pass (single MapInPandas) and ONE exchange — the cumsum window's hash
    partitioning on (epoch, shard) must satisfy the example-grouping
    distribution, so the groupBy adds no second shuffle."""
    import re

    from hiveka_spark.plans.inspect import formatted_plan
    from hiveka_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    packed = REGISTRY["x89_multi_epoch_packed"].fn(spark, SF_SMOKE)
    plan = formatted_plan(packed)
    assert len(re.findall(r"^\(\d+\) MapInPandas", plan, re.M)) == 1, plan
    assert "Generate" in plan, plan  # posexplode fan-out, not a union
    assert "SinglePartition" not in plan, plan
    assert shuffle_count(packed) == 1, plan  # window + groupBy share it


def test_x90_single_tokenize_no_stage_recomputation(spark):
    """The capstone training run (x90) must keep its composed plan honest:
    exactly ONE tokenize mapInPandas serves the packed export, every
    stage frontier is read from cache (no corpus recomputation at a stage
    boundary — the x60 lesson extended through the trainer half), and no
    SinglePartition exchange sneaks in anywhere."""
    import re

    from hiveka_spark.operators.dedup import dedup_cache_scope
    from hiveka_spark.plans.inspect import formatted_plan
    from hiveka_spark.queries.pipeline_e2e import build_training_export

    with dedup_cache_scope() as scope:
        packed = build_training_export(spark, SF_SMOKE, scope)
        packed.count()  # materialize the frontiers, as the real write does
        plan = formatted_plan(packed)
        assert len(re.findall(r"^\(\d+\) MapInPandas", plan, re.M)) == 1, plan
        # kept frontier (and everything upstream) reads its materialized
        # checkpoint; the corpus parquet appears at most once in the plan
        assert plan.count("documents.parquet") <= 1, plan
        assert plan.count("Scan ExistingRDD") >= 1, plan
        # the only SinglePartition exchanges allowed are the rate table's
        # grand-total aggregates (input: one row per SOURCE, ~20 rows —
        # bounded by construction); every corpus-sized exchange must be
        # hash partitioned.  The formatted detail section shows each
        # operator once under its ^(n) header.
        single = re.findall(
            r"^\(\d+\) Exchange\n(?:Input.*\n)?Arguments: SinglePartition",
            plan, re.M,
        )
        assert len(single) <= 2, plan
        assert len(scope) >= 7  # ing,e,n4,train,n5,kept + shingle machinery


def test_s25_live_packed_tokenizes_once_one_exchange(spark):
    """The live-packing composition (s25) keeps x87's scale shape per
    refresh: ONE tokenize mapInPandas over the read-back curated docs and
    ONE exchange for the packing (the cumsum window's hash partitioning
    satisfies the example grouping) — asserted on the lazy tokenize-and-
    pack plan, which is the per-refresh unit of work."""
    import re

    from hiveka_spark.catalog import table
    from hiveka_spark.plans.inspect import formatted_plan
    from hiveka_spark.queries.streaming_queries import s25_packed

    d = table(spark, SF_SMOKE, "documents")
    cur = d.select("doc_id", "text")  # stands in for read_compacted output
    packed = s25_packed(cur, d)
    plan = formatted_plan(packed)
    assert len(re.findall(r"^\(\d+\) MapInPandas", plan, re.M)) == 1, plan
    assert "SinglePartition" not in plan, plan
    assert shuffle_count(packed) == 1, plan


def test_x93_example_order_no_global_sort(spark):
    """The example-order gate must derive its per-epoch consumption order
    with ZERO global coordination: the rank window partitions by
    (epoch, ex_shard) — never a partitionBy-less window (Exchange
    SinglePartition, the classic scale killer) — the epoch fan-out is a
    generator explode over MANIFEST rows (one tokenize MapInPandas total,
    inherited from x87), and digests fold segmented."""
    import re

    from hiveka_spark.plans.inspect import formatted_plan
    from hiveka_spark.queries.curation_ext import _x93_ranked

    # the lazy ranked frame (the gate checkpoints it, which hides the
    # upstream plan — the x65 situation)
    ranked = _x93_ranked(spark, SF_SMOKE)
    plan = formatted_plan(ranked)
    assert "SinglePartition" not in plan, plan
    assert len(re.findall(r"^\(\d+\) MapInPandas", plan, re.M)) == 1, plan
    assert "Generate" in plan, plan  # epoch fan-out is an explode


def test_x95_incremental_export_never_rereads_or_retokenizes(spark, tmp_path):
    """The incremental token export's two scale claims, on the plans that
    make them: (a) a version drop's tokenize pass reads ONLY its own
    version (the version predicate is pushed to the parquet scan) with
    one MapInPandas; (b) the CURRENT shard manifest composes from the
    persisted per-doc manifests — its plan contains NO text column and NO
    tokenizer at all (the x70 'old text never re-read' posture, extended
    to 'nothing is ever re-tokenized')."""
    import re

    import pyspark.sql.functions as F

    from hiveka_spark.catalog import table
    from hiveka_spark.operators.bpe import bpe_train_capped, bpe_vocab, unit_expr
    from hiveka_spark.operators.sampling import composed_order_digest, epoch_shards
    from hiveka_spark.plans.inspect import formatted_plan
    from hiveka_spark.queries.curation_ext import _X95_V2_PRED, x95_doc_manifest

    d = table(spark, SF_SMOKE, "documents")
    v2_pred = F.expr(_X95_V2_PRED)
    v1, v2 = d.filter(~v2_pred), d.filter(v2_pred)
    mt = bpe_train_capped(v1, "text", n_merges=8, max_words=60, units=True)
    merges = [(r["lhs"], r["rhs"]) for r in mt.collect()]
    alphabet = [
        r["s"]
        for r in v1.select(F.explode(unit_expr("text")).alias("u"))
        .select(F.explode(F.split("u", "")).alias("s"))
        .distinct()
        .collect()
    ]
    vocab = bpe_vocab(merges, alphabet)

    # (a) the v2 drop's pass: version predicate pushed, one tokenize
    drop_plan = formatted_plan(x95_doc_manifest(v2, merges, vocab))
    assert "PushedFilters" in drop_plan and "doc_id" in drop_plan, drop_plan
    assert len(re.findall(r"^\(\d+\) MapInPandas", drop_plan, re.M)) == 1, drop_plan

    # (b) the compose pass over the persisted store
    store = str(tmp_path / "store")
    x95_doc_manifest(v1, merges, vocab).write.parquet(f"{store}/v=1")
    x95_doc_manifest(v2, merges, vocab).write.parquet(f"{store}/v=2")
    man = spark.read.parquet(f"{store}/v=1", f"{store}/v=2")
    staged = epoch_shards(
        man, "doc_id", "tokv_", 8, keep_cols=("n_tokens", "ids_digest", "n_unk")
    )
    digests = composed_order_digest(
        staged.withColumnRenamed("ids_digest", "dd"),
        "shard", "shard_pos", "dd", "n_tokens",
        out_col="ids_digest", seg_size=64,
    )
    compose_plan = formatted_plan(digests)
    assert "MapInPandas" not in compose_plan, compose_plan  # no tokenizer
    assert "text" not in re.findall(
        r"ReadSchema: \S+", compose_plan
    ).__str__(), compose_plan  # no text column read anywhere
    assert "documents.parquet" not in compose_plan, compose_plan

def test_s26_compose_never_rereads_or_retokenizes(spark, tmp_path):
    """The live×incremental gate's compose plan (s26_compose) holds x95's
    two scale claims against the LIVE key set: persisted manifests LEFT
    SEMI the topic's alive keys, sharded and digest-composed — NO text
    column, NO tokenizer (MapInPandas), NO document scan anywhere; and
    the delta read's offset predicate sits on the wire scan (prior
    batches' payloads are pruned before decode)."""
    import re

    import pyspark.sql.functions as F

    from hiveka_spark.plans.inspect import formatted_plan
    from hiveka_spark.queries.streaming_queries import s26_compose

    man = spark.createDataFrame(
        # batch 1 manifests every key; batch 2 RE-manifests keys 0 and 2
        # (a compaction payload overwrite) — the compose must take the
        # latest batch per key, never a stale row
        [(i, 1, 10 + i, 1234 + i) for i in range(20)]
        + [(0, 2, 100, 9999), (2, 2, 100, 8888)],
        "doc_id bigint, batch int, n_tokens bigint, ids_digest bigint",
    )
    store = str(tmp_path / "man")
    man.write.parquet(store)
    man_p = spark.read.parquet(store)
    alive = spark.createDataFrame(
        [(i,) for i in range(0, 20, 2)], "doc_id bigint"
    )
    out = s26_compose(man_p, alive)
    plan = formatted_plan(out)
    assert "MapInPandas" not in plan, plan  # no tokenizer
    assert "text" not in re.findall(r"ReadSchema: \S+", plan).__str__(), plan
    assert "documents.parquet" not in plan, plan
    # semantic spot-check: only alive keys contribute, and the re-upserted
    # keys carry their BATCH-2 token counts (100 each), not the stale ones
    agg = out.agg(F.sum("n_docs"), F.sum("n_tokens")).collect()[0]
    assert agg[0] == 10
    assert agg[1] == 200 + sum(10 + i for i in range(4, 20, 2)), agg[1]

    # the delta consume prunes old offsets BEFORE the compaction window +
    # decode: the filter must reference offset and the per-partition map
    from hiveka_spark.sources.kafka_io import KafkaTableConfig, write_kafka
    from hiveka_spark.sources.kafka_sim import SimBroker
    from hiveka_spark.streaming.curation import curated_topic_config, read_compacted

    broker = SimBroker(str(tmp_path / "broker"))
    cfg = curated_topic_config("sim://test", "t26", with_text=True)
    broker.create_topic("t26", partitions=2)
    rows = spark.createDataFrame(
        [(i, f"text {i}", "en", 7) for i in range(8)],
        "doc_id bigint, text string, lang string, n_chars bigint",
    )
    write_kafka(rows, cfg, "t26", key_col="doc_id", broker=broker)
    full = read_compacted(spark, cfg, broker=broker, payload_cols=("text",))
    hwm = {
        int(r["partition"]): int(r["hi"]) + 1
        for r in __import__("hiveka_spark.sources.kafka_io", fromlist=["read_kafka_batch"])
        .read_kafka_batch(spark, cfg, broker=broker)
        .groupBy("partition").agg(F.max("offset").alias("hi")).collect()
    }
    assert full.count() == 8
    # nothing new past the watermark -> empty delta
    assert read_compacted(
        spark, cfg, broker=broker, payload_cols=("text",), start_offsets=hwm
    ).count() == 0
    # append two more keys + a tombstone-shaped overwrite, delta sees ONLY them
    more = spark.createDataFrame(
        [(100, "new a", "en", 5), (101, "new b", "en", 5), (3, "text 3", "en", 7)],
        "doc_id bigint, text string, lang string, n_chars bigint",
    )
    write_kafka(more, cfg, "t26", key_col="doc_id", broker=broker)
    delta = read_compacted(
        spark, cfg, broker=broker, payload_cols=("text",), start_offsets=hwm
    )
    got = {r["doc_id"] for r in delta.collect()}
    assert got == {100, 101, 3}, got


def test_x99_incremental_substring_never_rereads(spark, tmp_path):
    """The incremental substring report's scale claims: (a) the drop's
    probe plan reads NO text column from prior versions — priors enter
    only as the persisted (h, cnt) store segments; (b) the version split
    constant duplicated in extensions.py (circular-import break) matches
    x95/x98's."""
    import re

    from hiveka_spark.catalog import table
    from hiveka_spark.operators.incremental import substring_index_update
    from hiveka_spark.plans.inspect import formatted_plan
    from hiveka_spark.queries.curation_ext import _X95_V2_PRED
    from hiveka_spark.queries.extensions import _X99_V2_PRED

    assert _X99_V2_PRED == _X95_V2_PRED

    import pyspark.sql.functions as F

    d = table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    pred = F.expr(_X99_V2_PRED)
    store = str(tmp_path / "store")
    substring_index_update(spark, d.filter(~pred), store, 1, min_len=10).count()
    out = substring_index_update(spark, d.filter(pred), store, 2, min_len=10)
    plan = formatted_plan(out)
    # the only text read is the drop's own (at most one text-bearing scan;
    # with the checkpoint=True posture the probe plan reads the
    # materialized window frame, so usually zero); prior versions appear
    # exclusively as the wc store segments — the store scan must exist and
    # its location must not be a text-bearing scan
    schemas = re.findall(r"ReadSchema: \S+", plan)
    text_scans = [s for s in schemas if "text" in s]
    assert len(text_scans) <= 1, schemas
    locations = re.findall(r"Location:.*", plan)
    assert any("/wc/" in loc for loc in locations), locations  # store probed
    assert "MapInPandas" not in plan, plan


def test_x100_dsir_takeordered_and_broadcast(spark):
    """DSIR selection: top-K must compile to TakeOrderedAndProject (never
    a global sort); the SCORING join must be a BroadcastHashJoin (a full
    outer vocab join can never broadcast-hash in Spark, so any BHJ in
    this plan IS the scoring join — the corpus side never shuffles for
    it); the shared per-(doc, w) exchange must be REUSED at runtime (AQE
    stage reuse — static formatted plans don't show it, so this asserts
    on the EXECUTED plan after a collect; one raw text scan serves LM
    counts and scoring); nothing goes cartesian."""
    import re

    from hiveka_spark.plans.inspect import formatted_plan
    from hiveka_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    df = REGISTRY["x100_dsir_selection"].fn(spark, SF_SMOKE)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert re.search(r"^\(\d+\) BroadcastHashJoin", plan, re.M), plan
    assert "CartesianProduct" not in plan
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in executed, executed


def test_x101_unimax_bounded_plan(spark):
    """UniMax: after the checkpointed language table, the final plan must
    touch the corpus exactly once more (the fractional-prefix selection) —
    the allocation arithmetic runs on LocalTableScan-sized data; quotas
    reach the corpus via broadcast, never a corpus-side shuffle join."""
    import re

    from hiveka_spark.plans.inspect import formatted_plan
    from hiveka_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    df = REGISTRY["x101_unimax_allocation"].fn(spark, SF_SMOKE)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    scans = len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M))
    assert scans == 1, f"expected 1 corpus scan post-checkpoint, got {scans}:\n{plan}"
    assert re.search(r"BroadcastExchange", plan), plan


def test_x102_lm_buckets_shared_exchange(spark):
    """CCNet bucketing: the per-(doc, word) count exchange feeds the LM
    vocabulary AND the per-doc scoring sums — canonical-identical
    branches, so AQE must reuse the stage at runtime (one corpus
    explode+count, the x100 discipline); the cutoff join must broadcast
    (cuts is language-bounded); nothing cartesian."""
    import re

    from hiveka_spark.plans.inspect import formatted_plan
    from hiveka_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    df = REGISTRY["x102_lm_quality_buckets"].fn(spark, SF_SMOKE)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert re.search(r"^\(\d+\) BroadcastHashJoin", plan, re.M), plan
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in executed, executed


def test_x114_agreement_reuses_contingency(spark):
    """Quality calibration: the keep-group share branch re-references the
    contingency subtree — static plan counts double, but the single
    action must REUSE the shared exchange at runtime (executed-plan
    assertion, the x100/x102 posture; an eager checkpoint measured
    slower); the share join broadcasts (tot is 2 rows); nothing
    cartesian."""
    import re

    from hiveka_spark.plans.inspect import formatted_plan
    from hiveka_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    df = REGISTRY["x114_quality_agreement"].fn(spark, SF_SMOKE)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert re.search(r"BroadcastExchange", plan), plan
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in executed, executed


def test_x108_allocation_plan_bounded(spark):
    """Repeat allocation: after the checkpointed source table, the final
    plan runs entirely on bounded frames — zero parquet scans, no
    cartesian product (the epoch fan-out and budget join are broadcast
    nested loops over RMAX-row / 1-row frames by construction)."""
    import re

    from hiveka_spark.plans.inspect import formatted_plan
    from hiveka_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    df = REGISTRY["x108_repeat_allocation"].fn(spark, SF_SMOKE)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    scans = len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M))
    assert scans == 0, f"expected 0 corpus scans post-checkpoint:\n{plan}"


def test_x110_no_single_reducer_window(spark):
    """Length batching: both policy ranks are the distributed range-sort
    recipe — the plan must contain NO Window operator at all (a global
    Window.orderBy would single-reducer the corpus) and no cartesian."""
    from hiveka_spark.plans.inspect import formatted_plan
    from hiveka_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    df = REGISTRY["x110_length_batching"].fn(spark, SF_SMOKE)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "Window" not in plan, plan


def test_x113_stream_no_corpus_explode(spark):
    """Mixture stream: the epoch fan-out must reach the corpus as a
    broadcast join (never a corpus-side explode/generator), and nothing
    goes cartesian.  Asserted on the pre-checkpoint composition by
    rebuilding the lazy stream plan."""
    import pyspark.sql.functions as FF

    from hiveka_spark.catalog import table
    from hiveka_spark.plans.inspect import formatted_plan
    from hiveka_spark.queries import _ensure_loaded
    from hiveka_spark.queries.curation_ext import (
        _X108_RMAX, x108_repeat_allocation,
    )

    _ensure_loaded()
    d = table(spark, SF_SMOKE, "documents").select("doc_id", "source", "text")
    rep = d.groupBy("source", FF.md5("text").alias("h")).agg(
        FF.min("doc_id").cast("bigint").alias("doc_id")
    ).select("source", "doc_id")
    alloc = x108_repeat_allocation(spark, SF_SMOKE).select("source", "n_epochs")
    epochs = spark.range(1, _X108_RMAX + 1).select(
        FF.col("id").cast("bigint").alias("epoch")
    )
    stream = (
        rep.join(FF.broadcast(alloc), "source")
        .join(FF.broadcast(epochs), FF.col("epoch") <= FF.col("n_epochs"))
        .select("doc_id", "source", "epoch")
    )
    plan = formatted_plan(stream)
    assert "CartesianProduct" not in plan
    assert "Generate" not in plan, plan  # no corpus-side explode
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


# --------------------------------------------------------------------------
# round-14: unigram family plan shapes


def test_unigram_apply_gates_are_flat_zero_shuffle(spark):
    """x126/x131/x133/x134's tokenize plans are the flat mapInPandas
    two-node shape — zero Exchange, corpus scanned once (training's
    bounded collects run at plan-BUILD time and are not part of the
    returned plan)."""
    from hiveka_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    for name in (
        "x126_unigram_tokenize",
        "x131_unigram_encode",
        "x133_unigram_sampled_encode",
        "x134_epoch_sampled_streams",
    ):
        df = REGISTRY[name].fn(spark, SF_SMOKE)
        assert shuffle_count(df) == 0, f"{name} plan shuffles"
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" in plan, f"{name} not Arrow-batched"


def test_x132_single_unit_aggregate(spark):
    """x132's only shuffle is the distinct-unit frequency aggregate."""
    from hiveka_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    df = REGISTRY["x132_unigram_ambiguity"].fn(spark, SF_SMOKE)
    assert shuffle_count(df) == 1


# round-16: the pair-unit lambda must reference a PROJECTED token array


def test_unit_pairs_generate_references_projected_tokens(spark):
    """The space-spanning-unit Generate consumes a pre-projected token
    array (__toks), never the inline split expression: referencing the
    split inside the transform lambda re-tokenizes the text once per
    element_at/size — O(words^2) per row, measured 6x slower (r16).  The
    split may appear ONCE (the projection that builds __toks); any
    occurrence inside the generator expression itself is the regression."""
    from hiveka_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    for name in ("x82_token_roundtrip", "x83_token_roundtrip_fallback"):
        df = REGISTRY[name].fn(spark, SF_SMOKE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            if "posexplode" in line.lower():
                assert "split(lower" not in line, (
                    f"{name}: generator re-evaluates the token split "
                    "per element (project tokens() first, see unit_pairs)"
                )


def test_unit_freq_single_tokenize(spark):
    """unit_freq's plan evaluates the token split exactly once (in the
    __toks projection), not once per pair element inside the explode."""
    from hiveka_spark.catalog import table
    from hiveka_spark.operators.bpe import unit_freq

    df = unit_freq(table(spark, SF_SMOKE, "documents"), "text")
    plan = df._jdf.queryExecution().executedPlan().toString()
    n = plan.count("split(lower")
    assert n == 1, f"expected exactly one tokenize in the plan, found {n}"
