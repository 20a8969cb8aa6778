"""The transactional sink's chunked produce path, certified WITHOUT a
broker: the frame protocol (Python packing) and the Janino-compiled JVM
sender (parse + reflective send) are exactly the pieces that replaced the
per-record py4j loop, and both are broker-independent — the sender binds
to any object with a 1-arg ``send`` and any (String, Object, Object)
record constructor, so Janino-compiled fakes stand in for KafkaProducer /
ProducerRecord.  The transaction protocol itself stays env-gated in
tests/test_kafka_live.py.
"""

from __future__ import annotations

import pytest

from hiveka_spark.streaming.kafka_txn import _frames, compile_chunk_sender

_ROWS = [
    {"key": b"k1", "value": b"v1"},
    {"key": None, "value": b"v2"},  # null key
    {"key": b"k3", "value": None},  # tombstone: null VALUE must survive
    {"key": b"", "value": b""},  # empty-but-present is not null
]

_FAKES_SOURCE = """
public class HivekaFakeRecord {
    private String t;
    private Object k;
    private Object v;
    public HivekaFakeRecord(String t, Object k, Object v) {
        this.t = t;
        this.k = k;
        this.v = v;
    }
    public String topic() { return t; }
    public Object key() { return k; }
    public Object value() { return v; }
}

public class HivekaFakeProducer {
    private java.util.ArrayList sent = new java.util.ArrayList();
    public Object send(Object r) { sent.add(r); return null; }
    public int count() { return sent.size(); }
    public Object rec(int i) { return sent.get(i); }
}
"""


_FAKE_CLS: dict = {}  # compile fakes once per process: py4j's reflection
# cache is keyed by class NAME, so re-cooking the same names in fresh
# classloaders would poison it (same constraint production handles via
# kafka_txn._sender_class)


def _fake_producer(spark):
    if "cls" not in _FAKE_CLS:
        jvm = spark._jvm
        compiler = jvm.org.codehaus.janino.SimpleCompiler()
        compiler.setParentClassLoader(
            jvm.java.lang.Thread.currentThread().getContextClassLoader()
        )
        compiler.cook(_FAKES_SOURCE)
        _FAKE_CLS["cls"] = compiler.getClassLoader().loadClass(
            "HivekaFakeProducer"
        )
    return _FAKE_CLS["cls"].newInstance()


def test_frames_roundtrip_layout():
    """Pure-Python check of the length-prefixed layout: -1 marks null,
    0 marks empty-but-present, payload bytes verbatim."""
    frames = list(_frames(_ROWS))
    assert len(frames) == 1
    f = frames[0]
    # k1/v1, null/v2, k3/null, empty/empty
    assert f == (
        b"\x00\x00\x00\x02k1\x00\x00\x00\x02v1"
        b"\xff\xff\xff\xff\x00\x00\x00\x02v2"
        b"\x00\x00\x00\x02k3\xff\xff\xff\xff"
        b"\x00\x00\x00\x00\x00\x00\x00\x00"
    )


def test_frames_chunking_preserves_records_and_order():
    rows = [{"key": str(i).encode(), "value": b"x" * 100} for i in range(50)]
    frames = list(_frames(rows, max_bytes=256))
    assert len(frames) > 5  # actually chunked
    # reassembling the frames equals the unchunked single frame
    assert b"".join(frames) == b"".join(_frames(rows))


def test_jvm_chunk_sender_parses_and_sends(spark):
    """Compile the real sender against a Janino fake producer/record pair
    and drive one frame through it — every record lands JVM-side with the
    exact key/value bytes and null markers, in order, from ONE call."""
    fake = _fake_producer(spark)
    sender = compile_chunk_sender(spark._jvm, fake, "HivekaFakeRecord")
    (frame,) = _frames(_ROWS)
    assert sender.sendChunk("topic-a", frame) == 4
    assert fake.count() == 4
    want = [(r["key"], r["value"]) for r in _ROWS]
    for i, (wk, wv) in enumerate(want):
        rec = fake.rec(i)
        assert rec.topic() == "topic-a"
        gk, gv = rec.key(), rec.value()
        assert (None if gk is None else bytes(gk)) == wk
        assert (None if gv is None else bytes(gv)) == wv


def test_jvm_chunk_sender_multi_frame(spark):
    """Chunked frames drive N send calls per chunk but preserve total
    record count and order across chunk boundaries."""
    fake = _fake_producer(spark)
    sender = compile_chunk_sender(spark._jvm, fake, "HivekaFakeRecord")
    rows = [{"key": str(i).encode(), "value": b"y" * 64} for i in range(40)]
    total = 0
    for frame in _frames(rows, max_bytes=300):
        total += sender.sendChunk("t2", frame)
    assert total == 40 and fake.count() == 40
    got = [bytes(fake.rec(i).key()) for i in range(40)]
    assert got == [str(i).encode() for i in range(40)]


def test_jvm_chunk_sender_missing_send_raises(spark):
    """Binding to an object with no 1-arg send fails loudly at init, not
    silently at produce time."""
    jvm = spark._jvm
    obj = jvm.java.util.ArrayList()  # add() exists, send() does not
    with pytest.raises(Exception):
        compile_chunk_sender(jvm, obj, "HivekaFakeRecord")


def test_sink_warns_on_janino_fallback(spark, monkeypatch):
    """When chunk-sender compilation fails, the sink must WARN before
    reverting to per-record py4j sends (round-10 verdict #3): the slow
    path is correct but ~100x slower, and a live deployment needs the
    cliff in its driver logs, not a silent revert."""
    from hiveka_spark.sources.kafka_io import KafkaTableConfig
    from hiveka_spark.streaming import kafka_txn as KT

    monkeypatch.setattr(KT, "kafka_available", lambda s: True)
    monkeypatch.setattr(KT, "_jvm_producer", lambda s, b, t: object())

    def boom(jvm, producer, record_class):
        raise RuntimeError("janino drift")

    monkeypatch.setattr(KT, "compile_chunk_sender", boom)
    cfg = KafkaTableConfig(
        bootstrap_servers="fake:9092",
        whitelist_topics=["t"],
        ddl="doc_id BIGINT",
    )
    with pytest.warns(RuntimeWarning, match="per-record py4j sends"):
        sink = KT.TransactionalKafkaSink(spark, cfg, "t", "txn-warn-test")
    assert sink._sender is None
