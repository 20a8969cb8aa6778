"""RocksDB state-store posture exercised by the ACTUAL stateful pipelines
(round-12 verdict #3) — not the toy probe of test_state_store.py.

Each of the engine's real stateful streaming gates (stateful funnel /
running stats, transformWithState, streaming near-dup dedup, the full live
curation pipeline) runs once under the default in-heap provider and once
under the RocksDB provider (`session.state_store_conf` — the 100 TB
posture: per-key state off-heap, changelog checkpointing), and the two
answers are pinned EQUAL row-for-row.  The RocksDB run is additionally
verified to have engaged the provider for real: the streaming checkpoints
the gate created during that run carry RocksDB-format state files
(.sst/.zip/.changelog), never the HDFS provider's .delta.

Reference scale rationale: the band-index / sessionization state at 100 TB
key cardinalities cannot live on the JVM heap; this suite is the evidence
the pipelines themselves (foreachBatch stages + their writeStream state)
are provider-agnostic, so the posture is a config flip, not a rewrite.
"""

from __future__ import annotations

import glob
import os
import tempfile

import pytest

from hiveka_spark.session import state_store_conf

from .conftest import SF_SMOKE

_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"

#: the real stateful pipelines (registry names) and whether their state
#: lives in the streaming CHECKPOINT (writeStream stateful operators — the
#: provider-format assertion is REQUIRED there) or in operator-owned
#: parquet stores (foreachBatch band indexes — provider-independent by
#: design, so no checkpoint state files exist to inspect).  Everything
#: else in the streaming surface is stateless per micro-batch.
GATES = [
    ("s07_stateful_funnel", True),
    ("s08_stateful_running_stats", True),
    ("s11_transform_with_state", True),
    ("s19_stream_minhash_dedup", False),
    ("s23_stream_curation_e2e", False),
]


def _rowset(df):
    return sorted(tuple(r) for r in df.collect())


def _ckpt_state_files(since: set[str]) -> set[str]:
    """State-file basenames inside ckpt_* scratch dirs created after
    ``since`` — the gates build their checkpoints via scratch_dir, so the
    new dirs are observable under the temp root."""
    root = tempfile.gettempdir()
    out: set[str] = set()
    for d in set(glob.glob(os.path.join(root, "ckpt_*"))) - since:
        for p in glob.glob(os.path.join(d, "state", "**", "*"), recursive=True):
            if os.path.isfile(p):
                out.add(os.path.basename(p))
    return out


@pytest.mark.parametrize("gate,ckpt_state", GATES)
def test_pipeline_provider_agnostic(spark, gate, ckpt_state):
    from hiveka_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    fn = REGISTRY[gate].fn

    prev = spark.conf.get(_PROVIDER_KEY, None)
    try:
        # default provider run (control)
        if prev is not None:
            spark.conf.unset(_PROVIDER_KEY)
        control = _rowset(fn(spark, SF_SMOKE))

        # RocksDB run: same gate, same fixtures, provider flipped
        for k, v in state_store_conf("rocksdb").items():
            spark.conf.set(k, v)
        before = set(glob.glob(os.path.join(tempfile.gettempdir(), "ckpt_*")))
        rocks = _rowset(fn(spark, SF_SMOKE))
        files = _ckpt_state_files(before)

        assert rocks == control, (
            f"{gate}: provider changed the answer — "
            f"missing={set(control) - set(rocks)} extra={set(rocks) - set(control)}"
        )
        if ckpt_state:
            # writeStream stateful gate: state files MUST exist (an empty
            # set means the ckpt_* discovery broke — fail, don't skip) and
            # MUST be RocksDB-format
            assert files, (
                f"{gate}: no checkpoint state files found under "
                f"{tempfile.gettempdir()}/ckpt_* — the scratch-dir layout "
                "assumption broke; the provider-format check would be vacuous"
            )
            assert any(
                f.endswith((".sst", ".zip", ".changelog")) for f in files
            ), files
            assert not any(f.endswith(".delta") for f in files), files
        else:
            # foreachBatch gate: state lives in operator-owned parquet
            # stores; any checkpoint state files that DO appear must still
            # be RocksDB-format
            assert not any(f.endswith(".delta") for f in files), files
    finally:
        for k in state_store_conf("rocksdb"):
            spark.conf.unset(k)
        if prev is not None:
            spark.conf.set(_PROVIDER_KEY, prev)
