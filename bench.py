"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"q01_...": sec, ...}, "sf": "<dir>"}

Headline set covers every engine pillar: full-scan agg (q01), star join
(q24), window top-k (q08) + analytic frames (q29), grouping sets (q33),
sketch percentiles (q39), time windows (q21) + their streaming twin (s01),
sessionization (q22), stream-static enrichment (s06), near-dup dedup (x02
exact-prefix-filtered + x03 minhash-LSH) with iterative duplicate
clustering (x26), ANN (x06 brute + x07 LSH + x15 IVF), text quality (x08),
mapInPandas fan-out (x20), as-of join (x13), and the Avro wire codec path
(x14).  Each query is timed around a full
materialization (collect) after one warm-up action amortizes JVM/session
startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q04_brand_revenue",
    "q05_customer_order_stats",
    "q08_topk_per_group",
    "q12_distinct_agg",
    "q21_hourly_windows",
    "q22_sessionization",
    "q24_regional_revenue",
    "q29_window_frames",
    "q33_grouping_sets",
    "q39_approx_percentile",
    "s01_stream_hourly_windows",
    "s06_stream_static_enrich",
    "x01_dedup_exact",
    "x02_dedup_ngram_jaccard",
    "x03_dedup_minhash",
    "x26_dup_clusters",
    "x06_ann_topk",
    "x07_ann_lsh",
    "x08_text_quality",
    "x15_ann_ivf",
    "x20_mapinpandas_tokens",
    "x13_asof_join",
    "x14_avro_wire_roundtrip",
    # added round 2 (perf-fixed entries now tracked; no r1 baseline):
    "x05_embedding_neardup",
    "s07_stateful_funnel",
    # round-2 widening (new operators; establish their floor this round):
    "x31_boilerplate_removal",
    "x35_bm25_search",
    "x37_semdedup",
    "s11_transform_with_state",
    "q44_gap_fill",
    "q46_exact_stats",
    # round-5 additions (no r1 baseline; floors established from r5 on):
    "x43_confluent_roundtrip",
    "x44_audio_features",
    "x45_gopher_rules",
    "x46_shingle_novelty",
    "x47_chunk_overlap",
    "x48_pq_ann",
    "x49_image_phash_dedup",
    "x50_corpus_report",
    "x51_jsonl_roundtrip",
    "x52_kmeans_clusters",
    "x55_ivfpq_ann",
    # round-6 additions (floors established from r6 on):
    "x56_salted_join",
    "x57_fixed_k_sample",
    "x58_shingle_containment",
    "x59_tfidf_doc_similarity",
    "x60_curation_pipeline",
    "s19_stream_minhash_dedup",
    "x61_ann_recall",
    "x62_bloom_decontamination",
    "x63_snapshot_diff",
    "x64_html_extract",
    "x65_epoch_shuffle",
    "s20_stream_bloom_decontam",
    "s21_stream_corpus_stats",
    "x66_minhash_estimate",
    "x67_cluster_balanced_sample",
    "x68_containment_decontamination",
    # round-7 additions (floors established from r7 on):
    "x69_sentiment",
    "s22_stream_kafka_sink",
    "x70_incremental_dedup",
    "x71_epoch_shards",
    "x72_bpe_train",
    "x73_temperature_mix",
    "x74_curriculum_order",
    "x75_dataset_export",
    "x76_bpe_train_capped",
    "x77_ann_recall_curve",
    # round-8 additions (floors established from r8 on):
    "x78_multi_epoch_export",
    # round-9 additions (floors established from r9 on):
    "x79_bpe_tokenize",
    "s23_stream_curation_e2e",
    # round-10 additions (floors established from r10 on):
    "x80_bpe_encode",
    "x81_token_export",
    "x82_token_roundtrip",
    # round-11 additions (floors established from r11 on; x77 re-floored —
    # its trained arms split into x84):
    "x83_token_roundtrip_fallback",
    "x84_ann_trained_cert",
    "x85_multi_epoch_token_manifest",
    "s24_curated_token_manifest",
    "x86_tokenizer_artifact",
    "x87_packed_examples",
    "x88_packed_export",
    "x89_multi_epoch_packed",
    # round-12 additions (floors established from r12 on):
    "x91_byte_exact_roundtrip",
    "x90_training_run",
    "s25_live_packed_examples",
    "x92_audio_pcm16_stereo",
    "x93_example_order",
    "x94_byte_exact_artifact",
    "x95_incremental_token_export",
    # round-13 additions (floors established from r13 on):
    "s26_live_incremental_tokens",
    "x96_substring_dup_spans",
    "x97_substring_dedup_rewrite",
    "x98_bpe_vocab_extension",
    "x99_incremental_substring_dedup",
    "x100_dsir_selection",
    "x101_unimax_allocation",
    "x102_lm_quality_buckets",
    "x103_bestfit_packing",
    "x104_tokenizer_fertility",
    "x105_fim_transform",
    "x106_leakage_safe_split",
    "x107_related_packing",
    "x108_repeat_allocation",
    "x109_resume_manifest",
    "x110_length_batching",
    "x111_frequent_ngrams",
    "s27_stream_fertility_drift",
    "x112_secret_scrub",
    "x113_mixture_stream",
    "x114_quality_agreement",
    "x115_vocab_utilization",
    "x116_audio_prefix_dedup",
    "s28_stream_secret_retraction",
    "x117_incremental_ivf",
    "x118_ivf_occupancy_drift",
    "x119_power_iteration",
    "x120_pruned_tokenizer",
    "s29_stream_ivf_index",
    "x121_decontam_agreement",
    "x122_principal_drift",
    "x123_devset_churn",
    "x124_lexical_diversity",
    # round-14 additions (floors established from r14 on):
    "x125_unigram_train",
    "x126_unigram_tokenize",
    "x127_tokenizer_family_fertility",
    "x128_bfd_export",
    "x129_block_power_iteration",
    "s30_stream_substring_dedup",
    "x130_unigram_artifact",
    "x131_unigram_encode",
    "x132_unigram_ambiguity",
    "x133_unigram_sampled_encode",
    "x134_epoch_sampled_streams",
    "x135_ivf_index_compaction",
    "x136_pq_reconstruction_error",
    "x137_unigram_corpus_likelihood",
    "s31_stream_likelihood_drift",
    "x138_unigram_byte_fallback",
    "x139_bulk_knn_graph",
    # round-15 additions (floors established from r15 on):
    "x140_opq_rotated_pq",
    "x141_unigram_train_soft",
    "x142_mutual_knn_components",
    "x143_knn_chain_packing",
    "s32_stream_ivf_compacting",
    "x144_three_family_fertility",
    "s33_stream_knn_graph",
    "x145_rotated_pq_recall",
    "x146_graph_dedup_rewrite",
    "x147_unigram_train_iterative",
    "x148_multimodal_curation",
]

# Ratio above which a query is re-measured (see _remeasure): round-5's
# "watch list" (x03 at 1.47x, x26/x31/x02 1.2-1.4x) turned out to be
# machine noise — back-to-back runs on an idle VM swing individual
# queries 0.9x <-> 1.6x (this box is a shared-host VM).  Min-of-k on
# the outliers only keeps the artifact honest without k-x'ing the
# whole suite's runtime.
_REMEASURE_OVER = 1.2
_REMEASURE_TRIES = 2

# Tail budget: flagged_over_2x lists at most this many (worst-first) —
# see build_artifact; flagged_count always carries the true total.
_FLAG_CAP = 16


def _check_prefix_unique(names) -> None:
    """The durable-tail ratio map keys entries by their "q01"/"x81"
    prefix; a collision would silently drop one entry from the record.
    Validated BEFORE any query runs (an error after the multi-minute
    suite has been measured discards all timings)."""
    prefixes = [n.split("_", 1)[0] for n in names]
    if len(set(prefixes)) != len(prefixes):
        dupes = sorted({p for p in prefixes if prefixes.count(p) > 1})
        raise RuntimeError(
            f"ratio-prefix collision across benched entries (HEADLINE + "
            f"baseline floors): {dupes}"
        )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from hiveka_spark.queries import REGISTRY, _ensure_loaded
    from hiveka_spark.session import get_spark

    _ensure_loaded()
    # the up-front check must cover the SAME name set build_artifact folds
    # into the ratios map — HEADLINE plus every baseline-floor entry
    # (round-12 advice): a collision surfacing only in build_artifact's
    # backstop would discard the whole multi-minute suite's timings
    base_keys: list[str] = []
    pre_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json"
    )
    if os.path.exists(pre_path):
        with open(pre_path) as fh:
            base_keys = list(json.load(fh).get("queries", {}))
    _check_prefix_unique(sorted(set(HEADLINE) | set(base_keys)))
    spark = get_spark("hiveka-bench")
    spark.conf.set("spark.sql.ansi.enabled", spark.conf.get("spark.sql.ansi.enabled"))

    # warm-up: JVM, parquet footer reads, codegen compiler
    from hiveka_spark.catalog import table

    table(spark, sf_dir, "lineitem").count()

    def timed(name: str) -> float:
        t0 = time.perf_counter()
        rows = REGISTRY[name].fn(spark, sf_dir).collect()
        assert rows is not None
        return round(time.perf_counter() - t0, 3)

    timings: dict[str, float] = {name: timed(name) for name in HEADLINE}
    first_pass = dict(timings)  # pre-remeasure snapshot (uniform single-shot)
    # Noise control: single-shot timings on this shared-host VM swing
    # individual queries by up to ~1.7x run-to-run.  Any query whose
    # first-pass ratio vs the recorded floor exceeds _REMEASURE_OVER is
    # re-run up to _REMEASURE_TRIES more times and the MIN kept (min over
    # identical runs estimates true cost; noise only ever adds).  All
    # observations are recorded in "remeasured" so a real regression —
    # which stays slow on every try — is still visible in the artifact.
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json")
    base: dict[str, float] = {}
    if os.path.exists(base_path):
        with open(base_path) as fh:
            base = json.load(fh).get("queries", {})
    remeasured: dict[str, list[float]] = {}
    for name, sec in list(timings.items()):
        floor = base.get(name)
        if not floor or sec / floor <= _REMEASURE_OVER:
            continue
        obs = [sec]
        for _ in range(_REMEASURE_TRIES):
            obs.append(timed(name))
            if obs[-1] / floor <= _REMEASURE_OVER:
                break
        remeasured[name] = obs
        timings[name] = min(obs)

    out, missing_floor = build_artifact(
        timings, first_pass, remeasured, base, sf_dir, headline=HEADLINE
    )
    # compact separators: the driver's durable record keeps only the LAST
    # 2000 chars of this line, and default ", "/": " separators waste ~18%
    # of that window (the r15 suite's all-flagged storm overflowed it)
    print(json.dumps(out, separators=(",", ":")))
    if missing_floor:
        print(
            "ERROR: HEADLINE entries without a BENCH_BASELINE.json floor: "
            + ", ".join(missing_floor),
            file=sys.stderr,
        )
        sys.exit(1)


def build_artifact(
    timings: dict[str, float],
    first_pass: dict[str, float],
    remeasured: dict[str, list[float]],
    base: dict[str, float],
    sf_dir: str,
    headline: list[str] | None = None,
) -> tuple[dict, list[str]]:
    """Assemble the one-line JSON artifact.  KEY ORDER IS LOAD-BEARING
    (round-10 verdict #1): the driver's durable BENCH_r{N}.json keeps only
    the LAST 2000 chars of the printed line, and by r10 the full-name
    ratio map had grown past that window — q01-q39's ratios fell out of
    the record.  So the full-name maps (queries seconds, baseline_ratios)
    come FIRST (complete in any local run, truncated in the durable
    tail), and the line ENDS with a block sized to stay inside 2000 chars
    for a ~150-entry suite: summary stats, missing_floor, a COMPACT ratio
    map keyed by each entry's unique "q01"/"x81"/"s23" prefix at 2
    decimals (~12 chars/entry), and flagged_over_2x last.  The tail
    property itself is pinned in tests/test_bench_artifact.py.

    Tail degradation order is deliberate: flagged_over_2x is LAST (and
    compact — prefixes, not full names, CAPPED at the _FLAG_CAP worst
    offenders with flagged_count carrying the true total; the full
    flagged set is recoverable from the ratios map as every prefix over
    2.0) and the summary stats sit just before the ratio map, so in a
    catastrophic many-flagged round the signal that gets partially cut
    is the per-entry ratio map's FRONT, never the flag list or the
    stats.  Budget arithmetic: ~13 chars per compact ratio + ~8 per
    flagged prefix (capped) + ~120 of stats — everything fits to ~135
    entries even with EVERYTHING flagged (pinned in
    tests/test_bench_artifact.py at the current size).  Round 15: the
    printed line uses COMPACT JSON separators (the driver truncates the
    printed text, so whitespace was burning ~18% of the window) and the
    summary stats moved AFTER the per-entry map — overflow now eats the
    map's front, never the stats or the flag list.

    Returns (artifact, missing_floor); a non-empty missing_floor is the
    caller's hard-error signal (round-9 verdict: new entries must land
    WITH their floor in the same commit)."""
    names = headline if headline is not None else HEADLINE
    out = {
        "metric": "headline_suite_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
    }
    if remeasured:
        out["remeasured"] = remeasured
        # Headline "value" mixes min-of-k (outliers) with single-shot
        # (everything else); record the uniform single-shot total alongside
        # so the two protocols are separable in the artifact.
        out["value_single_shot"] = round(sum(first_pass.values()), 3)
    missing_floor = [n for n in names if n not in base] if base else []
    if base:
        ratios = {
            name: round(sec / base[name], 3)
            for name, sec in timings.items()
            if base.get(name)
        }
        if ratios:
            vals = sorted(ratios.values())
            out["baseline_ratios"] = ratios
            if missing_floor:
                out["missing_floor"] = missing_floor
            # backstop of main()'s up-front _check_prefix_unique (which
            # runs before any query is measured); explicit raise, not
            # assert: under python -O an assert vanishes and the dict
            # below would silently drop one of the colliding entries from
            # the durable tail record
            _check_prefix_unique(list(ratios))
            out["ratios"] = {
                n.split("_", 1)[0]: round(r, 2) for n, r in ratios.items()
            }
            # summary stats AFTER the per-entry map (round-15): if a
            # future suite outgrows the tail window, truncation eats the
            # ratio map's FRONT — the stats and the flag list are the
            # last ~200 chars and survive any storm
            out["ratio_mean"] = round(sum(vals) / len(vals), 3)
            out["ratio_median"] = round(vals[len(vals) // 2], 3)
            out["ratio_worst"] = max(vals)
            # prefixes, not full names, and CAPPED at the worst offenders:
            # a many-flagged regression round must not blow the 2000-char
            # tail that carries the ratio map (at 120+ entries an
            # everything-flagged storm no longer fits uncapped — the full
            # flagged set is recoverable from the ratios map as every
            # prefix > 2.0, and flagged_count always carries the true
            # total).  Worst ratio first, name tiebreak.
            flagged = sorted(
                ((r, n.split("_", 1)[0]) for n, r in ratios.items() if r > 2.0),
                key=lambda t: (-t[0], t[1]),
            )
            out["flagged_count"] = len(flagged)
            out["flagged_over_2x"] = [p for _, p in flagged[:_FLAG_CAP]]
    if missing_floor and "missing_floor" not in out:
        out["missing_floor"] = missing_floor
    return out, missing_floor


if __name__ == "__main__":
    main()
