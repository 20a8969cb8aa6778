"""Transactional Kafka produce sink — END-TO-END exactly-once for the
streaming write path, upgrading KafkaStreamSink's marker protocol where a
real broker (and the kafka-clients jar) exists.

The marker-file protocol (streaming/kafka_sink.py) is exactly-once for
every batch that reached its marker, but a crash BETWEEN produce and
marker re-produces one batch.  Kafka transactions close that window the
classic way (the pattern Kafka Streams' EOS and Flink's KafkaSink use):

- ONE transactional producer per logical sink (``transactional.id`` fixed
  per query, so a restarted instance FENCES any zombie predecessor via
  the epoch bump in ``initTransactions``);
- each micro-batch is one transaction containing BOTH the data records
  and a commit-marker record on a side topic (``{topic}__commits``,
  key = batch id).  ``commitTransaction`` makes both visible atomically:
  a crash anywhere before it aborts everything (invisible to
  ``read_committed`` consumers), a crash after it leaves the marker
  visible so the replayed batch is skipped BEFORE producing.  There is no
  state outside Kafka — the marker lives in the same atomic commit as
  the data, which is what removes the window a filesystem marker cannot.

Throughput posture: records are encoded DISTRIBUTED (encode_payload —
same Arrow/JVM paths as every other produce) and then streamed through
the driver via ``toLocalIterator`` into the single transactional
producer.  That is deliberate: Kafka transactions are per-producer, so
atomic ALL-RECORDS-OR-NONE batches require one producer, and a curated
OUTPUT topic (post-filter volume) is driver-feedable.  For raw-volume
topics where per-partition atomicity suffices, run one transactional
producer per partition inside ``foreachPartition`` instead; the
marker-protocol sink remains the object-store-grade default everywhere a
broker-side guarantee isn't required.

Requires a live broker + the spark-sql-kafka package (which bundles
kafka-clients) on the JVM classpath; constructing the sink raises
cleanly otherwise.  Exercised by the env-gated live test
(tests/test_kafka_live.py::test_transactional_sink_exactly_once) — this
container has neither broker nor jar, so the test skips here and is the
first thing to run where they exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hiveka_spark.sources.kafka_io import (
    KafkaTableConfig,
    encode_payload,
    kafka_available,
)


def _jvm_producer(spark: SparkSession, bootstrap: str, txn_id: str):
    """Build the JVM transactional producer (ByteArray serializers — the
    wire frame is already encoded bytes) and fence predecessors."""
    jvm = spark._jvm
    props = jvm.java.util.Properties()
    props.setProperty("bootstrap.servers", bootstrap)
    props.setProperty("transactional.id", txn_id)
    props.setProperty("enable.idempotence", "true")
    props.setProperty("acks", "all")
    ser = "org.apache.kafka.common.serialization.ByteArraySerializer"
    props.setProperty("key.serializer", ser)
    props.setProperty("value.serializer", ser)
    producer = jvm.org.apache.kafka.clients.producer.KafkaProducer(props)
    # epoch bump: any still-running producer with the same transactional.id
    # (a zombie of a crashed driver) is fenced from here on
    producer.initTransactions()
    return producer


class TransactionalKafkaSink:
    """foreachBatch callable: produce each micro-batch as ONE Kafka
    transaction (data records + in-transaction commit marker).

    Parameters
    ----------
    cfg / topic:
        Table config (schema, framing) and destination topic.
    txn_id:
        ``transactional.id`` — fixed per logical query, NOT per batch, so
        restarts fence zombies instead of racing them.
    key_col / tombstone_col:
        As in KafkaStreamSink (tombstones are key-only null-value
        records inside the same transaction).
    commit_topic:
        Marker topic (default ``{topic}__commits``); must be created with
        the same durability as the data topic.
    """

    def __init__(
        self,
        spark: SparkSession,
        cfg: KafkaTableConfig,
        topic: str,
        txn_id: str,
        key_col: str | None = None,
        tombstone_col: str | None = None,
        commit_topic: str | None = None,
    ) -> None:
        if not kafka_available(spark):
            raise RuntimeError(
                "TransactionalKafkaSink needs the spark-sql-kafka package "
                "(bundles kafka-clients) on the JVM classpath; use the "
                "marker-protocol KafkaStreamSink otherwise"
            )
        self.spark = spark
        self.cfg = cfg
        self.topic = topic
        self.txn_id = txn_id
        self.key_col = key_col
        self.tombstone_col = tombstone_col
        self.commit_topic = commit_topic or f"{topic}__commits"
        self._producer = _jvm_producer(spark, cfg.bootstrap_servers, txn_id)

    # ---------------------------------------------------------------- state
    def committed_batches(self) -> set[int]:
        """Batch ids whose transaction committed — read from the marker
        topic under read_committed (aborted markers are invisible, exactly
        like aborted data)."""
        reader = (
            self.spark.read.format("kafka")
            .option("kafka.bootstrap.servers", self.cfg.bootstrap_servers)
            .option("subscribe", self.commit_topic)
            .option("startingOffsets", "earliest")
            .option("kafka.isolation.level", "read_committed")
        )
        rows = reader.load().select("key").collect()
        return {
            int(bytes(r["key"]).decode("utf-8"))
            for r in rows
            if r["key"] is not None
        }

    # -------------------------------------------------------------- produce
    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in self.committed_batches():
            # checkpoint-replayed batch whose transaction already
            # committed: skip before a single record is sent
            return
        payload = encode_payload(
            batch_df,
            self.cfg,
            key_col=self.key_col,
            tombstone_col=self.tombstone_col,
        )
        jvm = self.spark._jvm
        p = self._producer
        p.beginTransaction()
        try:
            for row in payload.toLocalIterator():
                key = bytes(row["key"]) if row["key"] is not None else None
                val = bytes(row["value"]) if row["value"] is not None else None
                p.send(
                    jvm.org.apache.kafka.clients.producer.ProducerRecord(
                        self.topic, key, val
                    )
                )
            # the marker rides INSIDE the transaction: visible iff every
            # data record is — this is what the filesystem marker can't do
            p.send(
                jvm.org.apache.kafka.clients.producer.ProducerRecord(
                    self.commit_topic,
                    str(batch_id).encode("utf-8"),
                    b"committed",
                )
            )
            p.commitTransaction()
        except Exception:
            p.abortTransaction()
            raise

    def close(self) -> None:
        try:
            self._producer.close()
        except Exception:
            pass
