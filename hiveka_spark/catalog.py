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


def ensure_utc_session(spark: SparkSession) -> None:
    """Pin the session time zone to UTC before any TIMESTAMP_NTZ reinterpretation.

    ``to_utc_timestamp(ntz_col, 'UTC')`` is NOT session-independent: Spark
    implicitly casts NTZ -> TIMESTAMP using the *session* time zone first, so
    under e.g. America/New_York the naive value silently shifts by the TZ
    offset.  Our session factory pins UTC already; this guard makes every
    normalization path safe under a session we did not build (the driver
    builds its own).

    NOTE this mutates the caller's SESSION-WIDE timeZone as a side effect:
    any later timestamp *rendering* in that session is UTC too.  That is the
    engine's documented contract (all fixtures and oracles are UTC), and the
    alternative — per-expression TZ plumbing — cannot protect the implicit
    NTZ cast.  If the conf set fails, the NTZ bug this guards against comes
    back, so it must WARN, not silently pass (ADVICE r4).
    """
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception as exc:
        import warnings

        warnings.warn(
            f"could not pin spark.sql.session.timeZone=UTC ({exc}); "
            "TIMESTAMP_NTZ normalization will follow the session TZ "
            f"({spark.conf.get('spark.sql.session.timeZone', '?')}) and may "
            "shift naive timestamps",
            RuntimeWarning,
            stacklevel=2,
        )


def normalize_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to TimestampType (LTZ) whatever its
    physical parquet encoding turned out to be.

    The fixtures have shipped `events.ts` as TIMESTAMP(NANOS) (read as a raw
    bigint under nanosAsLong), as timestamp[us] (read as TIMESTAMP_NTZ), and
    may ship plain TIMESTAMP; downstream event-time logic (unix_millis,
    watermarks, as-of joins) must never care.  This mirrors the reference's
    posture of decoding against the declared reader schema regardless of wire
    layout (KafkaAvroMessageDecoder.java:153-177) — normalize ONCE at the
    source, in one shared place for batch and streaming.

    - bigint: epoch nanos -> integer `div` 1000 (NOT `/`: epoch-nanos ~1.7e18
      exceeds double's exact 2^53 range, float division corrupts the low
      microseconds) -> timestamp_micros.
    - timestamp_ntz: reinterpret the wall-clock value as UTC.  This requires
      the session TZ pinned to UTC (see ensure_utc_session) because the
      implicit NTZ->TIMESTAMP cast inside to_utc_timestamp is session-TZ
      dependent; the guard below enforces it even under a foreign session.
    - timestamp: already what we want.
    """
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    elif dtype == "timestamp_ntz":
        ensure_utc_session(df.sparkSession)
        df = df.withColumn(col, F.to_utc_timestamp(F.col(col), "UTC"))
    return df


def _normalize_events(df: DataFrame) -> DataFrame:
    return normalize_event_time(df, "ts")


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
