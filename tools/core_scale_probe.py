"""CORE-COUNT scaling probe (r17, verdict item 9): the sf0.1 bench is
overhead-bound (8-core suite ~= 32-core suite), so the driver's scaling
block cannot distinguish serial from parallel.  This probe replicates the
fixtures Nx in memory (tools/scale_probe.py's replicate — ids shifted per
replica) so the heavy operator shapes become WORK-dominated, then times
them under `local[$SPARK_GRAFT_CPUS]`.  Run it once per core count:

    SPARK_GRAFT_CPUS=8  python tools/core_scale_probe.py /root/testdata/sf0.1 64
    SPARK_GRAFT_CPUS=32 python tools/core_scale_probe.py /root/testdata/sf0.1 64

Each probe is materialized through the noop sink (guide §1.4), run twice,
second (warm) time reported.  Prints one JSON line:
  {"cpus": C, "replication": N, "times": {probe: sec, ...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: work-dominated shapes at 64x (from SCALE.md's data-scaling table):
#: these are the suite's heavy gates' dominant stages.
HEAVY = [
    "join_lineitem_orders",
    "minhash_signatures",
    "chunk_freq_agg",
    "bm25_postings",
    "semdedup_cell_assign",
    "pq_encode_adc",
    "kmeans_two_rounds",
    "ivfpq_e2e",
    "ivfpq_residual_e2e",
    "pack_examples_manifest",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    from tools.scale_probe import probes

    from hiveka_spark.catalog import table
    from hiveka_spark.session import get_spark

    # a REAL Nx-sized input arrives as many splits; the replicated fixture
    # is one tiny parquet whose default 128MB splits would cap the map
    # side at a handful of tasks regardless of core count — split the
    # scan so the probe measures the OPERATORS' parallelism, not an
    # artifact of the fixture's file size
    spark = get_spark(
        "core-scale-probe",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(256 * 1024),
            "spark.sql.files.openCostInBytes": str(64 * 1024),
        },
    )
    cpus = spark.sparkContext.defaultParallelism
    table(spark, sf_dir, "lineitem").count()  # warm-up

    times: dict[str, float] = {}
    for name, build in probes(spark, sf_dir, n):
        if name not in HEAVY:
            continue
        spark.sparkContext.setJobDescription(f"core-scale {name} x{n}")
        for _ in range(2):  # warm: 2nd run reported
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            sec = time.perf_counter() - t0
        times[name] = round(sec, 2)
        print(f"PROBE {name}: {sec:.2f}s", file=sys.stderr, flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"cpus": cpus, "replication": n, "times": times}))


if __name__ == "__main__":
    main()
