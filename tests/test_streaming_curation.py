"""Kill-and-resume + compaction-convergence pinning for the live curation
pipeline (streaming/curation.py) — the multi-part replay argument the s23
docstring makes, EXECUTED:

1. kill mid-stream, rebuild FRESH sink objects on the same checkpoint +
   state + commit roots, resume: the compacted read-back must equal the
   uninterrupted run's (checkpoint replay + versioned state overwrite +
   marker gating compose).
2. a checkpoint-replayed, already-committed batch must leave the curated
   log BYTE-IDENTICAL (marker gating).
3. a crash in the produce->marker window re-produces one batch: the log
   grows, but every duplicate compacts away (upsert payloads are a pure
   function of the doc; tombstones are key-only) — read_compacted is
   unchanged.
4. arrival-order convergence: ascending vs descending doc_id delivery
   must compact to the same answer — the descending order actually
   exercising retraction via REAL null-value tombstones on the wire.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from hiveka_spark.catalog import table
from hiveka_spark.operators import dedup as D
from hiveka_spark.operators.text import with_gopher_rules
from hiveka_spark.queries.extensions import _BLOOM_H, _BLOOM_M, _EVAL_SOURCES
from hiveka_spark.sources.kafka_io import KafkaTableConfig, write_kafka
from hiveka_spark.sources.kafka_sim import SimBroker
from hiveka_spark.streaming.curation import (
    StreamCurationSink,
    curated_topic_config,
    read_compacted,
)
from hiveka_spark.streaming.kafka_sink import KafkaStreamSink

from .conftest import SF_SMOKE

_INGEST_DDL = "doc_id BIGINT, text STRING, lang STRING, n_chars BIGINT"


def _fixtures(spark):
    """(raw participants frame, bitset, ev_sh) over the smoke corpus."""
    d = table(spark, SF_SMOKE, "documents")
    ev = d.filter(F.col("source").isin(*_EVAL_SOURCES))
    ev_sh = D.eval_shingle_set(ev, "text", k=3).localCheckpoint(eager=True)
    bitset = D.build_bloom_bitset(ev_sh, _BLOOM_M, _BLOOM_H)
    raw = d.filter(~F.col("source").isin(*_EVAL_SOURCES)).select(
        "doc_id", "text", "lang", F.col("n_chars").cast("bigint").alias("n_chars")
    )
    return raw, bitset, ev_sh


def _expected_batch_answer(raw, bitset, ev_sh):
    """The one-shot batch rule the stream must converge to: gopher pass,
    not containment-flagged, not the larger side of a verified pair."""
    g = (
        with_gopher_rules(raw)
        .filter(F.col("keep") == 1)
        .select("doc_id", "text", "lang", "n_chars")
    )
    flagged = (
        D.bloom_probe(
            g, bitset, ev_sh, "doc_id", "text",
            k=3, m_bits=_BLOOM_M, n_hashes=_BLOOM_H,
        )
        .filter(F.col("n_exact_hits") * 100 >= F.lit(50) * F.col("n_shingles"))
        .select(F.col("doc").alias("doc_id"))
    )
    part = g.join(flagged, "doc_id", "left_anti")
    pairs = D.minhash_lsh_pairs(
        part.select("doc_id", "text"),
        num_perm=32, bands=8, k=3, verify_threshold=0.8, reuse=False,
    )
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    return part.join(losers, "doc_id", "left_anti").select(
        "doc_id", "lang", "n_chars"
    )


def _rowset(df):
    return {(r["doc_id"], r["lang"], r["n_chars"]) for r in df.collect()}


def _mk_sink(
    spark, root: str, broker, bitset, ev_sh, compact_after: int | None = None
) -> StreamCurationSink:
    """FRESH sink objects every call — nothing carried over in memory, only
    the on-disk roots (state dirs, commit markers, broker log)."""
    return StreamCurationSink(
        os.path.join(root, "state"),
        KafkaStreamSink(
            curated_topic_config("sim://test", "docs_curated"),
            "docs_curated",
            os.path.join(root, "commits"),
            broker=broker,
            key_col="doc_id",
            tombstone_col="_tombstone",
        ),
        bitset, ev_sh,
        num_perm=32, bands=8, k=3, threshold=0.8,
        bloom_m=_BLOOM_M, bloom_h=_BLOOM_H,
        compact_after=compact_after,
    )


def _wire_rows(spark, broker):
    """The raw curated log as comparable tuples (key/value bytes + coords)."""
    scan = broker.scan(spark, "docs_curated")
    return sorted(
        (
            r["partition"], r["offset"],
            bytes(r["key"]) if r["key"] is not None else None,
            bytes(r["value"]) if r["value"] is not None else None,
        )
        for r in scan.collect()
    )


class _CrashBefore:
    """foreachBatch wrapper that simulates a process kill at batch N: the
    batch never runs, the stream dies, the checkpoint stays at N."""

    def __init__(self, inner, crash_on: int):
        self.inner, self.crash_on, self.tripped = inner, crash_on, False

    def __call__(self, batch_df, batch_id: int):
        if batch_id == self.crash_on and not self.tripped:
            self.tripped = True
            raise RuntimeError("injected kill")
        self.inner(batch_df, batch_id)


def _start(spark, broker, ckpt: str, fn):
    typed_wire = broker.stream(spark, "docs_raw", max_files_per_trigger=1)
    from hiveka_spark.sources.kafka_io import decode_wire

    cfg_in = KafkaTableConfig(
        bootstrap_servers="sim://test",
        whitelist_topics=["docs_raw"],
        ddl=_INGEST_DDL,
    )
    typed = decode_wire(typed_wire, cfg_in).select(
        "doc_id", "text", "lang", "n_chars"
    )
    return (
        typed.writeStream.foreachBatch(fn)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def _ingest(spark, broker, raw):
    cfg_in = KafkaTableConfig(
        bootstrap_servers="sim://test",
        whitelist_topics=["docs_raw"],
        ddl=_INGEST_DDL,
    )
    broker.create_topic("docs_raw", partitions=4)
    write_kafka(raw, cfg_in, "docs_raw", key_col="doc_id", broker=broker)


def test_kill_and_resume_equals_uninterrupted(spark, tmp_path):
    raw, bitset, ev_sh = _fixtures(spark)
    expected = _rowset(_expected_batch_answer(raw, bitset, ev_sh))
    assert expected, "fixture must keep at least one doc"

    # uninterrupted control run
    broker_a = SimBroker(str(tmp_path / "brokerA"))
    _ingest(spark, broker_a, raw)
    broker_a.create_topic("docs_curated", partitions=4)
    sink_a = _mk_sink(spark, str(tmp_path / "a"), broker_a, bitset, ev_sh)
    q = _start(spark, broker_a, str(tmp_path / "a" / "ckpt"), sink_a)
    q.awaitTermination()
    control = _rowset(read_compacted(
        spark, curated_topic_config("sim://test", "docs_curated"), broker=broker_a
    ))
    assert control == expected

    # killed run: dies BEFORE batch 1 runs (batch 0 committed), then a
    # FRESH sink + FRESH query object resume on the same on-disk roots
    broker_b = SimBroker(str(tmp_path / "brokerB"))
    _ingest(spark, broker_b, raw)
    broker_b.create_topic("docs_curated", partitions=4)
    sink_b1 = _mk_sink(spark, str(tmp_path / "b"), broker_b, bitset, ev_sh)
    crash = _CrashBefore(sink_b1, crash_on=1)
    q = _start(spark, broker_b, str(tmp_path / "b" / "ckpt"), crash)
    try:
        q.awaitTermination()
        raise AssertionError("injected kill did not propagate")
    except Exception:
        pass
    committed_mid = sink_b1.produce_sink.committed_batches()
    assert committed_mid == [0], f"expected only batch 0 committed, got {committed_mid}"

    sink_b2 = _mk_sink(spark, str(tmp_path / "b"), broker_b, bitset, ev_sh)
    q = _start(spark, broker_b, str(tmp_path / "b" / "ckpt"), sink_b2)
    q.awaitTermination()
    assert len(sink_b2.produce_sink.committed_batches()) >= 3
    resumed = _rowset(read_compacted(
        spark, curated_topic_config("sim://test", "docs_curated"), broker=broker_b
    ))
    assert resumed == control, (
        f"missing={control - resumed}, extra={resumed - control}"
    )


def test_read_compacted_drops_unkeyed_records(spark, tmp_path):
    """Compacted topics are keyed by contract — a real broker rejects an
    unkeyed produce to a compact topic, so read_compacted must DROP
    null-key rows an uncompacted simulator log happens to contain rather
    than letting them collapse into one shared window partition (where
    all but the max-offset row silently vanished before round 10)."""
    broker = SimBroker(str(tmp_path / "broker"))
    broker.create_topic("curated", partitions=2)
    cfg = curated_topic_config("sim://", "curated")
    rows = spark.createDataFrame(
        [(1, "en", 10), (2, "de", 20), (2, "de", 25)],
        "doc_id bigint, lang string, n_chars bigint",
    )
    write_kafka(rows, cfg, "curated", key_col="doc_id", broker=broker)
    # three UNKEYED records (no key_col): invalid on a compact topic
    write_kafka(
        spark.createDataFrame(
            [(7, "fr", 7), (8, "es", 8), (9, "it", 9)],
            "doc_id bigint, lang string, n_chars bigint",
        ),
        cfg, "curated", broker=broker,
    )
    got = {
        r["doc_id"]: (r["lang"], r["n_chars"])
        for r in read_compacted(spark, cfg, broker=broker).collect()
    }
    # keyed survivors compacted per key; unkeyed rows all dropped (the old
    # behavior kept exactly one of the three, nondeterministically)
    assert got == {1: ("en", 10), 2: ("de", 25)}


def test_marker_replay_leaves_log_byte_identical(spark, tmp_path):
    raw, bitset, ev_sh = _fixtures(spark)
    broker = SimBroker(str(tmp_path / "broker"))
    _ingest(spark, broker, raw)
    broker.create_topic("docs_curated", partitions=4)
    root = str(tmp_path / "run")
    sink = _mk_sink(spark, root, broker, bitset, ev_sh)
    q = _start(spark, broker, os.path.join(root, "ckpt"), sink)
    q.awaitTermination()
    committed = sink.produce_sink.committed_batches()
    assert committed

    before = _wire_rows(spark, broker)
    # checkpoint-replay of an already-committed batch through FRESH objects:
    # the marker must drop the produce before a single record is appended
    replayer = _mk_sink(spark, root, broker, bitset, ev_sh)
    replayer(raw.limit(20), committed[-1])
    assert _wire_rows(spark, broker) == before


def test_produce_marker_crash_window_compacts_away(spark, tmp_path):
    """Manual batch driving (foreachBatch is just a callable) so the
    re-delivered batch is EXACTLY the crashed one: delete the last marker
    (crash between produce and marker), re-deliver through fresh objects —
    the log grows by one duplicated batch, the compacted read-back doesn't
    change, and the replacement marker lands.  The sink runs with
    compact_after=2, so the re-delivered batch probes the AUTO-COMPACTED
    c-segment (replay-through-auto-compaction for the curation chain) and
    must still produce byte-identically."""
    raw, bitset, ev_sh = _fixtures(spark)
    expected = _rowset(_expected_batch_answer(raw, bitset, ev_sh))
    broker = SimBroker(str(tmp_path / "broker"))
    broker.create_topic("docs_curated", partitions=4)
    root = str(tmp_path / "run")

    parts = [
        raw.filter(F.col("doc_id") % 3 == i).localCheckpoint(eager=True)
        for i in range(3)
    ]
    sink = _mk_sink(spark, root, broker, bitset, ev_sh, compact_after=2)
    for i, p in enumerate(parts):
        sink(p, i)
    from hiveka_spark.streaming.neardup import committed_versions

    assert [
        os.path.basename(p)
        for p in committed_versions(os.path.join(root, "state", "bands"), 10**9)
    ] == ["b2", "c1"]  # auto-compaction ran mid-"stream"
    cfg_out = curated_topic_config("sim://test", "docs_curated")
    assert _rowset(read_compacted(spark, cfg_out, broker=broker)) == expected

    os.remove(os.path.join(root, "commits", "b2"))  # crash window: produce
    before = _wire_rows(spark, broker)               # happened, marker didn't
    redelivered = _mk_sink(spark, root, broker, bitset, ev_sh, compact_after=2)
    redelivered(parts[2], 2)
    after = _wire_rows(spark, broker)
    assert len(after) > len(before), "re-delivery must have re-produced"
    assert os.path.exists(os.path.join(root, "commits", "b2"))
    assert _rowset(read_compacted(spark, cfg_out, broker=broker)) == expected


def test_arrival_order_convergence_with_real_tombstones(spark, tmp_path):
    """Ascending vs descending doc_id delivery compact to the same answer;
    the descending run must retract at least once, and retractions must be
    REAL Kafka tombstones on the wire: key set, value NULL."""
    raw, bitset, ev_sh = _fixtures(spark)
    expected = _rowset(_expected_batch_answer(raw, bitset, ev_sh))
    cfg_out = curated_topic_config("sim://test", "docs_curated")

    results, tombstone_counts = [], []
    for tag, descending in (("asc", False), ("desc", True)):
        broker = SimBroker(str(tmp_path / f"broker_{tag}"))
        broker.create_topic("docs_curated", partitions=4)
        from pyspark.sql import Window

        ordered = raw.withColumn(
            "_bucket",
            F.ntile(3).over(
                Window.orderBy(
                    F.col("doc_id").desc() if descending else F.col("doc_id")
                )
            ),
        )
        parts = [
            ordered.filter(F.col("_bucket") == i + 1)
            .drop("_bucket")
            .localCheckpoint(eager=True)
            for i in range(3)
        ]
        sink = _mk_sink(spark, str(tmp_path / tag), broker, bitset, ev_sh)
        for i, p in enumerate(parts):
            sink(p, i)
        results.append(_rowset(read_compacted(spark, cfg_out, broker=broker)))
        wire = broker.scan(spark, "docs_curated")
        tombstone_counts.append(wire.filter(F.col("value").isNull()).count())
        assert wire.filter(
            F.col("value").isNull() & F.col("key").isNull()
        ).count() == 0, "tombstones must carry a key"

    assert results[0] == results[1] == expected
    # descending delivery makes some smaller partner arrive AFTER its dup
    # was produced -> at least one real retraction on the wire
    assert tombstone_counts[1] >= 1, "descending order produced no tombstone"


def test_text_payload_round_trips_and_tombstones_stay_keyed(spark, tmp_path):
    """The payload_cols seam (s24's text-carrying curated topic): the
    compacted read-back must return every kept doc's text BYTE-IDENTICAL
    to the source (the property the token manifest depends on), retraction
    tombstones must still be key-set/value-NULL wire records, and the kept
    id set must equal the default-payload pipeline's batch answer (the
    payload is along for the ride — it must not change any decision)."""
    raw, bitset, ev_sh = _fixtures(spark)
    expected = _rowset(_expected_batch_answer(raw, bitset, ev_sh))
    cfg_out = curated_topic_config("sim://test", "docs_curated", with_text=True)

    broker = SimBroker(str(tmp_path / "broker_txt"))
    broker.create_topic("docs_curated", partitions=4)
    from pyspark.sql import Window

    # descending delivery so at least one retraction fires with text payload
    ordered = raw.withColumn(
        "_bucket", F.ntile(3).over(Window.orderBy(F.col("doc_id").desc()))
    )
    parts = [
        ordered.filter(F.col("_bucket") == i + 1)
        .drop("_bucket")
        .localCheckpoint(eager=True)
        for i in range(3)
    ]
    sink = StreamCurationSink(
        str(tmp_path / "txt_state"),
        KafkaStreamSink(
            cfg_out, "docs_curated", str(tmp_path / "txt_commits"),
            broker=broker, key_col="doc_id", tombstone_col="_tombstone",
        ),
        bitset, ev_sh,
        num_perm=32, bands=8, k=3, threshold=0.8,
        bloom_m=_BLOOM_M, bloom_h=_BLOOM_H,
        payload_cols=("text", "lang", "n_chars"),
    )
    for i, p in enumerate(parts):
        sink(p, i)

    cur = read_compacted(
        spark, cfg_out, broker=broker, payload_cols=("text", "lang", "n_chars")
    )
    assert _rowset(cur.select("doc_id", "lang", "n_chars")) == expected
    src = {r["doc_id"]: r["text"] for r in raw.collect()}
    for r in cur.collect():
        assert r["text"] == src[r["doc_id"]], r["doc_id"]
    wire = broker.scan(spark, "docs_curated")
    assert wire.filter(F.col("value").isNull()).count() >= 1
    assert wire.filter(
        F.col("value").isNull() & F.col("key").isNull()
    ).count() == 0, "tombstones must carry a key"
