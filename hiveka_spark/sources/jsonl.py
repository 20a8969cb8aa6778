"""JSON-lines source with the same bad-record policy surface as the Avro
wire path (avro_codec.decode_avro_df): PERMISSIVE keeps corrupt lines as a
quarantine column, FAILFAST raises, DROPMALFORMED silently drops.

Raw LLM corpus dumps arrive as JSONL; at 100 TB the non-negotiables are an
EXPLICIT schema (inference is a full extra pass over text data) and a
corrupt-line policy decided up front (one malformed crawl record must not
kill a 1000-executor job — nor silently vanish when you need the audit).
Spark's JSON reader already implements all three policies; this module pins
the production configuration and makes the quarantine column a first-class
output instead of an option string buried at call sites.

Reference analog: the bad-record knob of the Kafka decoder path
(`KafkaAvroMessageDecoder.java:131-144`'s disabled skip-errors flag) —
re-expressed over Spark's native JSON source.  Designed Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    mode: str = "PERMISSIVE",
    multiline: bool = False,
) -> DataFrame:
    """Read line-delimited JSON with an explicit schema and bad-record policy.

    ``mode='PERMISSIVE'``: corrupt lines yield a row with all schema columns
    null and the raw line preserved in ``_corrupt_record`` (the quarantine
    column is appended to the schema automatically).  ``'FAILFAST'``: first
    corrupt line raises.  ``'DROPMALFORMED'``: corrupt lines are dropped.

    ``multiline=False`` keeps the input SPLITTABLE — one JSON doc per line
    means Spark can split files at byte boundaries and parse in parallel;
    multiline JSON forces one task per file and is the first thing to ban in
    a large-scale ingest.
    """
    mode = mode.upper()
    if mode not in ("PERMISSIVE", "FAILFAST", "DROPMALFORMED"):
        raise ValueError(f"unknown JSON bad-record mode: {mode}")
    full_schema = schema
    if mode == "PERMISSIVE" and CORRUPT_COL not in schema:
        full_schema = f"{schema}, {CORRUPT_COL} string"
    reader = (
        spark.read.schema(full_schema)
        .option("mode", mode)
        .option("multiLine", multiline)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    return reader.json(path)


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows, quarantined_raw_lines) from a PERMISSIVE read.

    Clean rows drop the quarantine column; quarantined rows keep only it —
    the frame a pipeline writes to a dead-letter location for audit/replay.

    The parsed frame is cached first: Spark refuses queries whose scan
    references ONLY the internal corrupt column (SPARK-21610 — the raw-line
    column exists only during parsing), and the cache also means the double
    consumption (clean sink + dead-letter sink) parses each input line once.
    The CALLER owns the lifecycle: unpersist the returned clean frame after
    both sinks are written (same caller-owned discipline as the dedup
    shingle cache).
    """
    import pyspark.sql.functions as F

    if CORRUPT_COL not in df.columns:
        raise ValueError("split_quarantine expects a PERMISSIVE read_jsonl frame")
    cached = df.cache()
    clean = cached.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = cached.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return clean, bad
