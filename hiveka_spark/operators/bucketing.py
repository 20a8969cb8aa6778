"""Bucketed (co-located) join support — the shuffle-elimination lever for
repeated big-big joins at 100 TB.

The reference engine has no join machinery at all (joins are delegated to
Hive, reference TODO.md:9); its only physical layout decision is LPT-packing
Kafka partition ranges into map tasks (reference BaseAllocator.java:24-80).
On Spark the analogous — and far stronger — layout tool is *bucketing*: write
both fact tables hash-partitioned into the same number of buckets on the join
key, and every subsequent equi-join on that key is planned with ZERO Exchange
operators on either side.  At 100 TB this turns the dominant cost of a
fact-fact join (two full shuffles of the big sides) into a local merge per
bucket; with ``sortBy`` on the same key the per-bucket Sort disappears too.

Usage pattern (one-time layout cost, amortized over every downstream join):

    prepare_bucketed_db(spark, "warehouse_db", "/path/on/dfs")
    write_bucketed(lineitem, "warehouse_db.lineitem_b", ["l_orderkey"], 64)
    write_bucketed(orders,   "warehouse_db.orders_b",   ["o_orderkey"], 64)
    joined = colocated_join(spark, "warehouse_db.lineitem_b",
                            "warehouse_db.orders_b",
                            left_on="l_orderkey", right_on="o_orderkey")
    assert bucket_join_shuffles(joined) == 0

Scale notes:
- Bucket count is a layout-time choice: pick ``total_size / target_bucket_size``
  (e.g. 100 TB / 256 MB ≈ 400k is too many files per write task — in practice
  bucket by the key's natural parallelism, 4k-16k, and let each bucket hold
  multiple row groups; Spark reads one task per bucket file per table).
- Both sides MUST use the same bucket count and the same key expression;
  otherwise Spark falls back to a plain shuffle join silently — which is why
  ``bucket_join_shuffles`` exists as an assertable audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hiveka_spark.plans.inspect import shuffle_count


def prepare_bucketed_db(spark: SparkSession, db: str, location: str) -> None:
    """Create (if needed) a catalog database whose tables live under
    ``location`` — keeps bucketed layouts isolated from other outputs."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{location}'")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed (and per-bucket sorted) on ``bucket_cols``.

    This is the pay-once shuffle: rows are routed to buckets by
    ``hash(bucket_cols) % num_buckets`` at write time so no later equi-join
    or aggregation on the same key ever shuffles this table again.
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_on: str,
    right_on: str,
    how: str = "inner",
) -> DataFrame:
    """Equi-join two identically-bucketed tables.

    The join itself is ordinary ``DataFrame.join`` — co-location is a property
    of the tables' layout, which Catalyst detects via their output partitioning
    (HashPartitioning on the bucket key) and plans a SortMergeJoin with no
    Exchange on either side.
    """
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_on] == right[right_on], how)


def bucket_join_shuffles(df: DataFrame) -> int:
    """Shuffle Exchange operators feeding ``df``'s plan — 0 for a true
    co-located join (BroadcastExchange is a different node and not counted).
    Use as the audit that a layout change didn't silently regress to a
    shuffle join."""
    return shuffle_count(df)
