"""RocksDB state-store posture: the seam must actually switch providers.

The stateful streaming entries (s02 sessions, s07/s11 funnels, s09 dedup,
s13/s14 join buffers) run on Spark's default in-heap provider at gate
scale; at 100 TB key cardinalities the posture is RocksDB (state bounded
by disk, flat GC, changelog checkpoints).  These tests prove the
state_store_conf seam genuinely switches the provider — evidenced by the
on-disk state format, not just a conf echo — and that results are
identical under both providers."""

from __future__ import annotations

import glob
import os
import tempfile

import pyspark.sql.functions as F

from hiveka_spark.session import ROCKSDB_PROVIDER, state_store_conf

_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


def test_conf_seam_shape():
    conf = state_store_conf("rocksdb")
    assert conf[_PROVIDER_KEY] == ROCKSDB_PROVIDER
    assert (
        conf["spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"]
        == "true"
    )
    assert state_store_conf("hdfs") == {}
    assert state_store_conf("anything-else") == {}


def _run_stateful(spark, ckpt: str) -> dict[int, int]:
    src = tempfile.mkdtemp(prefix="ss_src_")
    spark.createDataFrame(
        [(i % 7, i) for i in range(210)], "k int, v int"
    ).write.mode("overwrite").parquet(src)
    name = f"ss_out_{os.path.basename(ckpt)}"
    q = (
        spark.readStream.schema("k int, v int")
        .parquet(src)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {r["k"]: r["n"] for r in spark.sql(f"select * from {name}").collect()}


def _state_files(ckpt: str) -> set[str]:
    return {
        os.path.basename(p)
        for p in glob.glob(os.path.join(ckpt, "state", "**", "*"), recursive=True)
        if os.path.isfile(p)
    }


def test_provider_switches_and_results_match(spark):
    prev = spark.conf.get(_PROVIDER_KEY, None)
    try:
        # default (in-heap HDFS-backed) provider: state files are .delta
        spark.conf.unset(_PROVIDER_KEY)
        ckpt_h = tempfile.mkdtemp(prefix="ss_ckpt_hdfs_")
        res_h = _run_stateful(spark, ckpt_h)
        files_h = _state_files(ckpt_h)
        assert any(f.endswith(".delta") for f in files_h), files_h
        assert not any(f.endswith(".sst") for f in files_h)

        # RocksDB provider: .changelog deltas (changelog checkpointing on;
        # snapshot .zip/.sst uploads happen lazily in the background) —
        # either format is RocksDB-only, the HDFS provider writes .delta
        for k, v in state_store_conf("rocksdb").items():
            spark.conf.set(k, v)
        ckpt_r = tempfile.mkdtemp(prefix="ss_ckpt_rocks_")
        res_r = _run_stateful(spark, ckpt_r)
        files_r = _state_files(ckpt_r)
        assert any(
            f.endswith((".sst", ".zip", ".changelog")) for f in files_r
        ), files_r
        assert not any(f.endswith(".delta") for f in files_r)

        # provider choice must never change the answer
        assert res_h == res_r == {k: 30 for k in range(7)}
    finally:
        if prev is None:
            spark.conf.unset(_PROVIDER_KEY)
        else:
            spark.conf.set(_PROVIDER_KEY, prev)
