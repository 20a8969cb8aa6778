"""Event-time normalization and table loading invariants.

The round-3 advice flagged that TIMESTAMP_NTZ -> UTC reinterpretation via
to_utc_timestamp is only correct with the session TZ pinned to UTC (the
implicit NTZ->LTZ cast is session-TZ dependent).  These tests run the
normalizer under a hostile session TZ and assert the epoch value is the
naive wall-clock read as UTC regardless.
"""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from hiveka_spark.catalog import load_tables, normalize_event_time

from .conftest import SF_SMOKE


@pytest.fixture
def foreign_tz(spark):
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    yield spark
    spark.conf.set("spark.sql.session.timeZone", prev)


def test_ntz_normalization_session_independent(foreign_tz):
    spark = foreign_tz
    naive = datetime.datetime(2024, 1, 1, 0, 0, 0)
    df = spark.createDataFrame(
        [(naive,)], T.StructType([T.StructField("ts", T.TimestampNTZType())])
    )
    out = normalize_event_time(df, "ts")
    # normalize_event_time pins the session back to UTC as a side effect
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    millis = out.select(F.unix_millis("ts").alias("ms")).collect()[0]["ms"]
    epoch_utc = int(naive.replace(tzinfo=datetime.timezone.utc).timestamp() * 1000)
    assert millis == epoch_utc, "naive value must be read as UTC, not session TZ"
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")


def test_bigint_nanos_normalization(spark):
    nanos = 1_704_067_200_000_000_000  # 2024-01-01T00:00:00Z
    df = spark.createDataFrame([(nanos,)], "ts bigint")
    out = normalize_event_time(df, "ts")
    assert dict(out.dtypes)["ts"] == "timestamp"
    ms = out.select(F.unix_millis("ts").alias("ms")).collect()[0]["ms"]
    assert ms == nanos // 1_000_000


def test_asof_ms_session_independent(foreign_tz):
    from hiveka_spark.operators.asof import _ms

    spark = foreign_tz
    naive = datetime.datetime(2024, 1, 1, 0, 0, 0)
    df = spark.createDataFrame(
        [(naive,)], T.StructType([T.StructField("ts", T.TimestampNTZType())])
    )
    ms = df.select(_ms(df, "ts").alias("ms")).collect()[0]["ms"]
    epoch_utc = int(naive.replace(tzinfo=datetime.timezone.utc).timestamp() * 1000)
    assert ms == epoch_utc
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")


def test_events_stream_fallback_schema(spark, tmp_path):
    """A missing events.parquet must not fail stream construction — the
    stream starts on the documented fixture schema and picks the file up
    when it lands."""
    from hiveka_spark.streaming.pipeline import events_stream, run_available_now

    stream = events_stream(spark, str(tmp_path))
    assert dict(stream.dtypes)["ts"] in ("timestamp", "timestamp_ntz")
    out = run_available_now(
        stream, "t_fallback_empty", checkpoint=str(tmp_path / "ckpt")
    )
    assert out.count() == 0


def test_load_tables_registers_views(spark):
    tables = load_tables(spark, SF_SMOKE, register=True, prefix="tcat_")
    assert set(tables) == {
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
    }
    assert spark.table("tcat_events").count() > 0
    assert dict(tables["events"].dtypes)["ts"] == "timestamp"
