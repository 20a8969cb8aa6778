"""File sinks: partitioned parquet output, the durable side of the engine.

The reference's write path is a stub (its OutputFormat returns a null
RecordWriter — reference KafkaOutputFormat.java:28-39); the Kafka sink is
implemented for real in ``kafka_io.write_kafka``.  This module is the other
half: landing query/stream output as partitioned parquet, laid out so the
NEXT reader prunes partitions instead of scanning.

Scale rules encoded here:
- **Partition by low-cardinality, always-filtered columns** (date, type,
  lang).  Directory count = product of partition-value cardinalities; at
  100 TB a date+hour layout is ~10^4 directories (fine), a user_id layout is
  10^8 (catastrophic).
- **Small-files control**: a naive ``df.write.partitionBy(c)`` has every
  task write one file per partition value it happens to hold — up to
  tasks × values files.  ``write_partitioned`` first repartitions on the
  partition columns so each output directory is written by as few tasks as
  possible, and caps rows per file with ``maxRecordsPerFile`` so a hot
  partition still splits into readable-sized files instead of one huge one.
- **Pruning is assertable**: ``plans.inspect.partition_filters`` shows the
  PartitionFilters a reader's plan pushes into the scan; tests assert the
  round-trip (write partitioned -> filtered read prunes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = 1_000_000,
    files_per_partition: int = 1,
) -> None:
    """Write ``df`` as parquet partitioned by ``partition_cols``.

    ``files_per_partition`` > 1 spreads a known-hot partition value across
    that many writer tasks (hash of the full row, so it stays deterministic
    in content, not in file assignment); the default routes each partition
    value to one task for the minimal file count.
    """
    out = df.repartition(*partition_cols) if files_per_partition == 1 else df.repartition(
        files_per_partition * max(1, len(partition_cols)), *partition_cols
    )
    writer = out.write.mode(mode).partitionBy(*partition_cols)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned layout back; partition columns come from directory
    names and filters on them become PartitionFilters (pruned before IO)."""
    return spark.read.parquet(path)
