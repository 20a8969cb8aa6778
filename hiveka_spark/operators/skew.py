"""Skew-mitigation helpers: salting for hot keys.

Where each belongs at 100 TB:
- Plain algebraic aggregates (sum/count/min/max) already survive skew —
  Spark's partial (map-side) aggregation bounds per-reducer input by the
  number of map partitions, and AQE splits skewed JOIN partitions at
  runtime (spark.sql.adaptive.skewJoin, on in session.py).
- What AQE does NOT fix: count(DISTINCT) under a hot group key (the expand
  + exchange ships every distinct value of the hot key to one reducer) and
  shuffle joins where one side's hot key defeats partial aggregation.
  Salting restructures those plans explicitly.

The salted results are EXACTLY equal to the unsalted ones (the salt only
re-partitions work), which is what lets x16 carry a plain SQL oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from hiveka_spark.operators.dedup import portable_hash60


def salted_count_distinct(
    df: DataFrame,
    keys: list[str],
    distinct_col: str,
    salt_n: int = 16,
    out_name: str | None = None,
) -> DataFrame:
    """Exact count-distinct per key, skew-proof.

    Salt = hash(distinct value) % salt_n, so each (key, salt) bucket owns a
    DISJOINT slice of the value space: per-bucket distinct counts are
    non-overlapping and their SUM is the exact global distinct count.  A hot
    key's distinct work spreads over salt_n reducers instead of one.
    Two shuffles of pre-aggregated data, no expand of the raw rows.
    """
    out = out_name or f"n_distinct_{distinct_col}"
    salt = F.pmod(portable_hash60(distinct_col), F.lit(salt_n))
    per_bucket = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(F.countDistinct(distinct_col).alias("_d"))
    )
    return per_bucket.groupBy(*keys).agg(F.sum("_d").cast("bigint").alias(out))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt_n: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Shuffle join with hot-key splitting when the broadcast path is
    unavailable and AQE's runtime split is insufficient (e.g. one key is
    most of the left side).

    Left rows get a salt derived from the whole row hash (any stable spread
    works — the salt never affects the result, only the partitioning);
    right rows are replicated once per salt value.  Join key becomes
    (on..., salt): the hot key's rows land on salt_n reducers.
    Cost: right side x salt_n — use only when right is the smaller side.

    ``how`` is restricted to left-preserving joins: under right/full outer
    joins the replicated right side would emit each unmatched right row
    salt_n times (one per salt value), silently corrupting the result —
    salt the LEFT side of a right join instead (swap the operands).
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "semi", "leftsemi",
               "left_semi", "anti", "leftanti", "left_anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} only, got {how!r}: the "
            "right side is replicated per salt, so right/full outer joins "
            "would duplicate unmatched right rows salt_n times"
        )
    lsalt = F.pmod(portable_hash60(F.concat_ws("\x1f", *[F.col(c) for c in left.columns])),
                   F.lit(salt_n))
    l = left.withColumn("_salt", lsalt)
    r = right.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_n)])))
    return l.join(r, [*on, "_salt"], how).drop("_salt")
