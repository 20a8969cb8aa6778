"""As-of (point-in-time) join — an operator Spark lacks as a built-in.

Implemented as a composition of existing DataFrame ops (union + ordered
window + last-non-null carry-forward), NOT a per-key collect or a Python
UDF: one shuffle on the key column, sorted within partitions — survives any
scale where a single key's history fits a partition (salt keys beyond that).

Semantics match DuckDB/pandas ``ASOF JOIN`` (direction='backward'): each left
row picks the right row with the greatest right_ts <= left_ts for the same
key; equal timestamps match (right row sorts first).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def _ms(df: DataFrame, col: str) -> Column:
    # dtype-exact: "timestamp_ntz" also startswith("timestamp") but
    # unix_millis rejects it — reinterpret the naive value as UTC first.
    # The NTZ reinterpretation is only session-independent with the session
    # TZ pinned to UTC (implicit NTZ->LTZ cast); share the catalog guard.
    from hiveka_spark.catalog import ensure_utc_session

    dtype = dict(df.dtypes)[col]
    if dtype == "timestamp":
        return F.unix_millis(F.col(col))
    if dtype == "timestamp_ntz":
        ensure_utc_session(df.sparkSession)
        return F.unix_millis(F.to_utc_timestamp(F.col(col), "UTC"))
    return F.col(col).cast("bigint")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    tolerance_ms: int | None = None,
    how: str = "left",
) -> DataFrame:
    """Backward as-of join of ``left`` to ``right`` on key ``on``.

    Returns all left columns + the matched right value columns (null when no
    match) + ``asof_gap_ms`` (left_ts - matched right_ts, in epoch millis).
    ``tolerance_ms`` nulls out matches farther back than the window;
    ``how='inner'`` drops unmatched left rows.
    """
    from pyspark.sql import types as T

    lcols = left.columns
    ltypes = dict(left.dtypes)

    # ONE struct carries the right ts + every right value column, so a single
    # last(ignorenulls=True) propagates the whole match atomically — matched
    # columns can never mix values from different right rows (a per-column
    # carry would skip over a newer right row's NULL in one column and fill it
    # from an older row).
    r_struct_type = T.StructType(
        [T.StructField("ts", T.LongType())]
        + [T.StructField(c, right.schema[c].dataType) for c in right_value_cols]
    )
    l_tagged = left.select(
        F.col(on).alias("_k"),
        _ms(left, left_ts).alias("_ts_ms"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_struct_type).alias("_r"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        _ms(right, right_ts).alias("_ts_ms"),
        F.lit(0).alias("_side"),
        F.struct(
            _ms(right, right_ts).alias("ts"),
            *[F.col(c).alias(c) for c in right_value_cols],
        ).alias("_r"),
        *[F.lit(None).cast(ltypes[c]).alias(f"_l_{c}") for c in lcols],
    )
    # right rows sort BEFORE left rows at equal ts (side 0 < 1) => ties match
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts_ms", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "_k",
        "_ts_ms",
        "_side",
        F.last("_r", ignorenulls=True).over(w).alias("_m"),
        *[F.col(f"_l_{c}") for c in lcols],
    )
    gap = F.col("_ts_ms") - F.col("_m.ts")
    within = gap <= F.lit(tolerance_ms) if tolerance_ms is not None else F.lit(True)
    out = carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[F.when(within, F.col(f"_m.{c}")).alias(c) for c in right_value_cols],
        F.when(within, gap).cast("bigint").alias("asof_gap_ms"),
    )
    if how == "inner":
        out = out.filter(F.col("asof_gap_ms").isNotNull())
    return out
