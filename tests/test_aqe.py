"""AQE posture proven at RUNTIME, not just configured.

session.py turns on adaptive execution, partition coalescing, and skew-join
splitting as the engine's 100 TB posture; these tests drive adversarial
inputs through real executions and assert the ADAPTIVE plan actually did
the thing — a conf typo or a Spark behavior change would flip them red
while every correctness gate stayed green."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


def _executed_plan(df) -> str:
    # materialize first: AQE rewrites the plan during execution
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def aqe_tuned(spark):
    """Lower AQE's size thresholds so gate-scale data can trip the
    runtime re-planning that production data trips at MB/GB sizes."""
    keys = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
        # honor advisory size instead of flooring at defaultParallelism —
        # with parallelismFirst (the default) AQE never coalesces BELOW
        # the cluster's parallelism, so tiny-data coalescing is invisible
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    }
    prev = {}
    for k, v in keys.items():
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    yield spark
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(aqe_tuned):
    """One key holding ~90% of the left side must be SPLIT at runtime by
    AQE's skew-join handling (the executed sort-merge join is marked
    skew=true) instead of stalling a single reducer — the adversarial
    shape a viral user/topic produces at 100 TB.

    The join is the LAST shuffle stage deliberately: by default Spark
    skips skew splitting when the join output feeds another shuffle
    (splitting would invalidate the downstream distribution) — an
    aggregate-after-join pipeline needs
    spark.sql.adaptive.forceOptimizeSkewedJoin, which trades one extra
    exchange for the split (checked by the companion test below)."""
    spark = aqe_tuned
    left = spark.range(0, 60_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    right = spark.range(0, 2_000).select(
        F.col("id").alias("k"), F.lit("dim").alias("tag")
    )
    # payload must survive to the join output: the hot key's values are
    # identical, so a pruned (k)-only shuffle compresses below the skew
    # threshold — high-entropy payload keeps the partition genuinely fat
    joined = left.join(right, "k").select("k", "tag", "payload")
    plan = _executed_plan(joined)
    assert "skew=true" in plan, plan


def test_force_skew_split_with_downstream_aggregate(aqe_tuned):
    """The agg-after-join shape: default AQE skips the skew split here, so
    the engine's posture for KNOWN-pathological keys is either the salted
    join (x56) or forceOptimizeSkewedJoin — this pins that the force flag
    genuinely produces the split under a downstream aggregate."""
    spark = aqe_tuned
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    try:
        left = spark.range(0, 60_000).select(
            F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        right = spark.range(0, 2_000).select(
            F.col("id").alias("k"), F.lit("dim").alias("tag")
        )
        agg = (
            left.join(right, "k")
            .groupBy("tag")
            .agg(F.count(F.lit(1)).alias("n"), F.max("payload").alias("mp"))
        )
        plan = _executed_plan(agg)
        assert "skew=true" in plan, plan
    finally:
        spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "false")


def test_aqe_coalesces_small_shuffle_partitions(aqe_tuned):
    """The session's shuffle fan-out (8 partitions in the test fixture;
    32+ in production) over a tiny aggregate must be COALESCED at
    runtime (AQEShuffleRead coalesced) — the mechanism that makes
    spark.sql.shuffle.partitions an upper bound rather than a fixed
    fan-out, so one job spec spans sf0.001 to 100 TB."""
    spark = aqe_tuned
    df = (
        spark.range(0, 10_000)
        .select((F.col("id") % 50).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = _executed_plan(df)
    assert "AQEShuffleRead" in plan and "coalesced" in plan, plan
