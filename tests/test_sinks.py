"""Partitioned parquet sink: layout, small-files control, and the
write->filtered-read partition-pruning round trip."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from hiveka_spark.catalog import table
from hiveka_spark.plans.inspect import partition_filters, pushed_filters
from hiveka_spark.sources.sinks import read_partitioned, write_partitioned

from .conftest import SF_SMOKE


def test_partitioned_write_layout_and_pruning(spark, tmp_path):
    out = str(tmp_path / "events_by_type")
    events = table(spark, SF_SMOKE, "events")
    write_partitioned(events, out, ["event_type"])

    # hive-style directory layout, one file per partition value (repartition
    # routed each value to a single writer task)
    dirs = sorted(d for d in os.listdir(out) if d.startswith("event_type="))
    assert len(dirs) >= 3
    for d in dirs:
        files = [f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")]
        assert len(files) == 1, f"{d}: expected 1 file, got {len(files)}"

    back = read_partitioned(spark, out)
    filtered = back.filter(F.col("event_type") == "click")
    pf = partition_filters(filtered)
    assert any("event_type" in f for f in pf), f"no partition pruning: {pf}"
    # the partition-column filter must NOT appear as a data filter
    assert not any("event_type" in f for f in pushed_filters(filtered))

    # round-trip correctness
    expected = events.filter(F.col("event_type") == "click").count()
    assert filtered.count() == expected


def test_max_records_per_file_splits_hot_partition(spark, tmp_path):
    out = str(tmp_path / "events_capped")
    events = table(spark, SF_SMOKE, "events")
    write_partitioned(events, out, ["event_type"], max_records_per_file=100)

    counts = (
        events.groupBy("event_type").count().collect()
    )
    for row in counts:
        d = os.path.join(out, f"event_type={row['event_type']}")
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        import math

        assert len(files) == math.ceil(row["count"] / 100)


# --------------------------------------------------- streaming Kafka produce
def test_kafka_stream_sink_replay_is_dropped(spark, tmp_path):
    """A replayed (already-committed) batch id must never append to the log;
    new batch ids must."""
    from hiveka_spark.sources.kafka_io import KafkaTableConfig
    from hiveka_spark.sources.kafka_sim import SimBroker
    from hiveka_spark.streaming.kafka_sink import KafkaStreamSink

    cfg = KafkaTableConfig(
        bootstrap_servers="sim://t",
        whitelist_topics=["out"],
        ddl="id BIGINT, name STRING",
    )
    broker = SimBroker(str(tmp_path / "broker"))
    broker.create_topic("out", partitions=2)
    sink = KafkaStreamSink(cfg, "out", str(tmp_path / "commits"), broker=broker, key_col="id")
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id bigint, name string")

    sink(df, 0)
    after0 = dict(broker.latest()["out"])
    assert sum(after0.values()) == 3 and sink.committed_batches() == [0]

    sink(df, 0)  # checkpoint replay of batch 0
    assert dict(broker.latest()["out"]) == after0, "replay appended"

    sink(df, 1)
    assert sum(broker.latest()["out"].values()) == 6
    assert sink.committed_batches() == [0, 1]
