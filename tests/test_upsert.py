"""VersionedUpsertSink: MERGE-style idempotence across driver restarts.

The property under test is the one s16's docstring claims: a batch id
replayed after a driver crash (driver memory gone, checkpoint re-delivers
the batch) must produce the same serving snapshot as a crash-free run —
no double-counting (version key) and no silently dropped pre-restart
state (disk-derived predecessor)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from hiveka_spark.streaming.upsert import VersionedUpsertSink


def _reduce(df: DataFrame) -> DataFrame:
    return df.groupBy("k").agg(F.sum("v").cast("bigint").alias("total"))


def _merge(prev: DataFrame, b: DataFrame) -> DataFrame:
    return (
        prev.unionByName(b)
        .groupBy("k")
        .agg(F.sum("total").cast("bigint").alias("total"))
    )


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k string, v bigint")


def _snapshot(spark, sink) -> dict[str, int]:
    path = sink.latest_path()
    assert path is not None
    return {r["k"]: r["total"] for r in spark.read.parquet(path).collect()}


def test_replay_same_run_is_idempotent(spark, tmp_path):
    root = str(tmp_path / "state")
    os.makedirs(root)
    sink = VersionedUpsertSink(root, _reduce, _merge)
    sink(_batch(spark, [("a", 1), ("b", 2)]), 0)
    sink(_batch(spark, [("a", 10)]), 1)
    before = _snapshot(spark, sink)
    # replayed batch id overwrites its own version, merging from v0 again
    sink(_batch(spark, [("a", 10)]), 1)
    assert _snapshot(spark, sink) == before == {"a": 11, "b": 2}


def test_replay_after_driver_restart_keeps_prior_state(spark, tmp_path):
    root = str(tmp_path / "state")
    os.makedirs(root)
    run1 = VersionedUpsertSink(root, _reduce, _merge)
    run1(_batch(spark, [("a", 1), ("b", 2)]), 0)
    run1(_batch(spark, [("a", 10), ("c", 5)]), 1)

    # driver crashes: in-memory pointer lost; checkpoint replays batch 1,
    # then delivers batch 2.  A fresh sink object models the restart.
    run2 = VersionedUpsertSink(root, _reduce, _merge)
    run2(_batch(spark, [("a", 10), ("c", 5)]), 1)  # replay
    run2(_batch(spark, [("b", 100)]), 2)

    # equal to a crash-free run over batches 0..2: pre-restart state (v0)
    # survived the replay, and batch 1 was counted exactly once
    assert _snapshot(spark, run2) == {"a": 11, "b": 102, "c": 5}


def test_uncommitted_snapshot_is_ignored(spark, tmp_path):
    root = str(tmp_path / "state")
    os.makedirs(root)
    sink = VersionedUpsertSink(root, _reduce, _merge)
    sink(_batch(spark, [("a", 1)]), 0)
    # a torn write: version dir exists but no _SUCCESS marker
    os.makedirs(os.path.join(root, "v1"))
    assert sink.predecessor_path(2).endswith("v0")
    sink(_batch(spark, [("a", 2)]), 2)
    assert _snapshot(spark, sink) == {"a": 3}


def test_fresh_stream_over_v0_only_state_errors(spark, tmp_path):
    """A new stream (batch ids restarting at 0) over a state_root whose
    only committed version is v0 must error instead of silently replacing
    the merged v0 snapshot with batch-only data; the crash-replay case
    proceeds via the explicit opt-in."""
    import pytest

    root = str(tmp_path / "state")
    os.makedirs(root)
    run1 = VersionedUpsertSink(root, _reduce, _merge)
    run1(_batch(spark, [("a", 1), ("b", 2)]), 0)

    fresh = VersionedUpsertSink(root, _reduce, _merge)
    with pytest.raises(ValueError, match="v0"):
        fresh(_batch(spark, [("z", 9)]), 0)

    replay = VersionedUpsertSink(root, _reduce, _merge, allow_batch0_overwrite=True)
    replay(_batch(spark, [("a", 1), ("b", 2)]), 0)  # crash-window replay
    assert _snapshot(spark, replay) == {"a": 1, "b": 2}
