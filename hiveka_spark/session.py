"""SparkSession factory with a 100-TB-minded default configuration.

The reference engine's only "physical tuning" is its LPT bin-packing of Kafka
partition ranges into <=30 map tasks (reference BaseAllocator.java:24-80) and
1-2 MB fetch buffers (KafkaReader.java:152-163).  On Spark the equivalents are
AQE (runtime shuffle-partition coalescing + skew-join splitting), adaptive
broadcast selection, and Arrow-backed Python interop; all set here once.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "hiveka-spark"

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def state_store_conf(provider: str = "rocksdb") -> dict[str, str]:
    """Streaming state-store posture as a config dict (pass to
    ``get_spark(extra_conf=...)`` or ``spark.conf.set`` before starting a
    query — Spark reads the provider from session conf at query start).

    ``rocksdb``: keep per-key state off the JVM heap in an embedded
    RocksDB per state partition.  This is the 100 TB posture for the
    stateful entries (s02 sessions, s07/s11 per-key funnels, s09 dedup
    keys, s13/s14 join buffers): state size is bounded by disk, not
    executor heap, GC pressure stays flat as key cardinality grows, and
    changelog checkpointing ships deltas instead of full snapshots.  The
    default HDFS-backed provider keeps every key in an in-heap map — fine
    at gate scale, an OOM at billions of keys.

    ``hdfs`` (or anything else): Spark's default in-heap provider.
    """
    if provider.lower() != "rocksdb":
        return {}
    return {
        "spark.sql.streaming.stateStore.providerClass": ROCKSDB_PROVIDER,
        # ship per-batch changelogs, snapshot in the background — the
        # production default for large state
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
    }


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession with the engine's default posture.

    Scale notes (local[] numbers are the CI stand-in; the configs are chosen to
    survive a 1000-executor cluster unchanged):

    - AQE on: runtime coalescing makes ``spark.sql.shuffle.partitions`` an upper
      bound, not a fixed fan-out, so the same job spec works at sf0.001 and 100 TB.
    - Skew-join handling on: hot keys (e.g. a viral topic/user) get split at
      runtime instead of stalling one reducer.
    - Arrow on: every pandas UDF / applyInPandas crossing is vectorized and
      batched instead of row-at-a-time pickling.
    - Nanos-as-long on: the fixture `events` table carries TIMESTAMP(NANOS)
      parquet, which Spark's vectorized reader rejects; we read the raw int64
      and convert in the catalog layer (see catalog.load_tables).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    # SPARK_GRAFT_STATE_STORE=rocksdb switches every stateful streaming
    # query to the RocksDB provider (see state_store_conf); default stays
    # Spark's in-heap provider so gate runs don't pay RocksDB setup per
    # tiny query.
    state_conf = state_store_conf(os.environ.get("SPARK_GRAFT_STATE_STORE", "hdfs"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in {**state_conf, **(extra_conf or {})}.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
