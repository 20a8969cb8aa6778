"""Deterministic sampling / data-mixing / sequence-packing operators for
training-data pipelines.

No reference analog (the reference is a Kafka scan layer; SURVEY.md §2C
extension surface) — designed Spark-first:

- Sampling decisions are PURE FUNCTIONS of the row id (md5-derived
  portable_hash60 mod 100), never RNG state: a re-run, a retried task, a
  different executor count, or a different engine (the DuckDB oracle) all
  pick exactly the same rows.  That reproducibility is non-negotiable for
  training-data curation at 100 TB — `df.sample()` draws per-partition
  pseudo-random numbers that change under AQE re-planning / task retry.
- Stratified mixing is one codegen'd CASE over a map literal — no shuffle
  at all; the filter pushes to the scan's residual predicate.
- Sequence packing assigns documents to fixed token-budget chunks with a
  cumulative-sum window partitioned by a grouping key (source), so the
  window state is distributed per-key instead of a single global sort —
  the only formulation of packing that survives 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from hiveka_spark.operators.dedup import portable_hash60, portable_hash60_sql


def sample_bucket(id_col: Column | str, n_buckets: int = 100) -> Column:
    """Deterministic engine-portable bucket in [0, n_buckets) for a row id."""
    return F.pmod(portable_hash60(id_col), F.lit(n_buckets))


def sample_bucket_sql(expr: str, n_buckets: int = 100) -> str:
    """DuckDB twin of sample_bucket (hash60 is non-negative, so % == pmod)."""
    return f"({portable_hash60_sql(expr)} % {n_buckets})"


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates_pct: dict[str, int],
    id_col: str,
    default_pct: int = 0,
) -> DataFrame:
    """Keep rows of stratum s with probability rates_pct[s]/100, decided by
    the deterministic hash bucket of the row id.

    This is the data-mixing primitive: rates_pct encodes the target mixture
    weights (e.g. up-/down-weight languages or sources).  The predicate is a
    single codegen'd CASE + md5 — zero shuffles, zero state, reproducible
    row-for-row across runs and engines.
    """
    rate_map = F.create_map(
        *[F.lit(x) for kv in rates_pct.items() for x in kv]
    )
    rate = F.coalesce(rate_map[F.col(strata_col)], F.lit(default_pct))
    return df.filter(sample_bucket(id_col) < rate)


def stratified_sample_sql(
    strata_expr: str, rates_pct: dict[str, int], id_expr: str, default_pct: int = 0
) -> str:
    """DuckDB predicate twin of stratified_sample (for oracle SQL)."""
    whens = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in rates_pct.items()
    )
    return (
        f"{sample_bucket_sql(id_expr)} < "
        f"(CASE {strata_expr} {whens} ELSE {default_pct} END)"
    )


def pack_chunks(
    df: DataFrame,
    partition_col: str,
    order_col: str,
    token_col: Column | str,
    budget: int,
) -> DataFrame:
    """Assign each row to a token-budget chunk: within each partition_col
    group, rows are laid out in order_col order and chunk k covers the
    contiguous run whose preceding cumulative token count is in
    [k*budget, (k+1)*budget).

    Contiguous cumulative-sum packing (not bin-packing): deterministic,
    one window over (partition_col, order_col) — distributed per group key,
    no global sort, no driver loop.  A chunk may overflow by at most one
    document, the same bounded-overflow contract a streaming packer gives.
    Output adds ``chunk`` (bigint) to the input rows.
    """
    tok = token_col if isinstance(token_col, Column) else F.col(token_col)
    w = (
        Window.partitionBy(partition_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = F.sum(tok).over(w) - tok
    return df.withColumn("chunk", F.floor(cum_before / F.lit(budget)))


def global_hash_rank(
    df: DataFrame,
    id_col: str,
    salt: str,
    out_col: str = "pos",
) -> DataFrame:
    """Deterministic GLOBAL rank of every row by (portable_hash60(salt, id),
    id) — 1-based, dense, engine-reproducible — WITHOUT the single-reducer
    global window (``Window.orderBy`` with no partitionBy moves every row
    into ONE partition: the classic scale killer).

    The distributed recipe: range-partition on the order key and sort
    within partitions (Spark's scalable total sort), rank LOCALLY per
    partition (the window partitions on spark_partition_id, so every
    partition ranks in parallel), then add each partition's global offset
    — per-partition counts are a numPartitions-row collect (the bounded-
    driver-collect posture, like centroid handoff), broadcast back as a
    tiny join.  The final rank depends only on the TOTAL order (hash, id),
    not on where the sampled range boundaries fall, so the output is
    deterministic even though range-partitioner sampling is not.
    """
    h = portable_hash60(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    # no sortWithinPartitions: neither consumer needs intra-partition
    # order (the counts job is order-free; the rank window re-sorts after
    # its own _pid exchange anyway), so sorting here would be a full
    # per-partition sort of the corpus paid for nothing
    t = (
        df.select(F.col(id_col), h.alias("_h"))
        .repartitionByRange(F.col("_h"), F.col(id_col))
        .withColumn("_pid", F.spark_partition_id())
    )
    from hiveka_spark.operators.dedup import _persist_tracked

    # persisted because both the counts job and the final plan read the
    # sorted frame; registered with any active dedup_cache_scope so
    # long-lived sessions can release it (gate runs: freed at exit)
    t = _persist_tracked(t)
    counts = sorted(
        ((r["_pid"], r["cnt"]) for r in t.groupBy("_pid").agg(
            F.count(F.lit(1)).alias("cnt")).collect()),
    )
    offsets, acc = [], 0
    for pid, cnt in counts:
        offsets.append((pid, acc))
        acc += cnt
    off_df = df.sparkSession.createDataFrame(offsets, "_pid int, _off bigint")
    w = Window.partitionBy("_pid").orderBy("_h", id_col)
    out = (
        t.withColumn("_lr", F.row_number().over(w).cast("bigint"))
        .join(F.broadcast(off_df), "_pid")
        .select(id_col, (F.col("_lr") + F.col("_off")).alias(out_col))
    )
    # the persisted order frame backs only this plan; caller materializes
    return out
