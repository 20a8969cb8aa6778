"""Table registration — the Spark-side analog of the reference's storage-handler
wiring (KafkaStorageHandler.java:53-91, KafkaBackedTableProperties.java:32-86).

In the reference, a table is bound to its scan by DDL + table properties; here a
table is a named catalog view over a DataFrame reader.  ``load_tables`` binds
the driver-generated parquet fixtures; ``register_kafka_table`` (in
sources.kafka_io) binds live Kafka topics the same way.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

# The fixture star schema (TESTDATA.md) — one parquet file per table.
TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Tables small enough to always broadcast in joins at ANY scale factor: these
# are bounded dimensions (5 regions, 25 nations), not scale-linear tables.
BROADCASTABLE = {"region", "nation"}


def _read_parquet_nanos_safe(spark: SparkSession, path: str) -> DataFrame:
    """Read parquet that may contain TIMESTAMP(NANOS) columns.

    Spark rejects INT64(TIMESTAMP(NANOS)) outright; with
    ``spark.sql.legacy.parquet.nanosAsLong`` the column arrives as a raw long
    (nanoseconds since epoch) which we convert to a proper TimestampType with
    microsecond truncation.  The conf is runtime-settable; set it defensively
    in case the session wasn't built by our factory.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # conf may be static on some builds; the read below will tell
    return spark.read.parquet(path)


def _normalize_events(df: DataFrame) -> DataFrame:
    """events.ts is TIMESTAMP(NANOS) in parquet -> long under nanosAsLong.

    Convert nanos -> microsecond timestamp (integer division, exact) so all
    downstream event-time logic sees a first-class TimestampType column.
    """
    if dict(df.dtypes).get("ts") == "bigint":
        # integer `div`, NOT `/`: epoch-nanos (~1.7e18) exceeds double's exact
        # integer range (2^53), so float division corrupts the low microseconds
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(
    spark: SparkSession,
    sf_dir: str,
    register: bool = True,
    prefix: str = "",
) -> dict[str, DataFrame]:
    """Load every fixture table under ``sf_dir`` and (optionally) register each
    as a temp view, mirroring how the reference exposes Kafka topics as named
    Hive tables (README.md:9).
    """
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = _read_parquet_nanos_safe(spark, path)
        if name == "events":
            df = _normalize_events(df)
        out[name] = df
        if register:
            df.createOrReplaceTempView(prefix + name)
    return out


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a single fixture table (no view registration)."""
    df = _read_parquet_nanos_safe(spark, os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = _normalize_events(df)
    return df


def dim(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a dimension table with a broadcast hint when it is bounded-size.

    At 100 TB the fact tables scale linearly but region/nation do not; pinning
    the broadcast here means every join against them is a map-side hash join
    with zero shuffle of the fact side, regardless of statistics quality.
    """
    df = table(spark, sf_dir, name)
    return F.broadcast(df) if name in BROADCASTABLE else df
