"""Job-level profile of one registered query: how many Spark jobs does the
gate run, and what is each one (description, duration, stage count)?

Reads the local Spark UI REST API (http://localhost:4040/api/v1) after the
gate's collect() — the measurement instrument guide §1.2/§1.5 asks for when
auditing composite/streaming gates whose wall time is job-count-bound
(one tiny job per micro-batch step costs more than the data at gate scale).

Usage:
    python tools/job_probe.py <sf_dir> <query_name>
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _get(base: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1/{path}") as r:
        return json.load(r)


def main() -> None:
    sf_dir, name = sys.argv[1], sys.argv[2]

    from hiveka_spark.catalog import table
    from hiveka_spark.queries import REGISTRY, _ensure_loaded
    from hiveka_spark.session import get_spark

    _ensure_loaded()
    # the engine session disables the UI; the probe needs its REST API
    spark = get_spark("job-probe", extra_conf={"spark.ui.enabled": "true"})
    table(spark, sf_dir, "lineitem").count()  # warm-up

    base = spark.sparkContext.uiWebUrl
    app = _get(base, "applications")[0]["id"]
    before = {j["jobId"] for j in _get(base, f"applications/{app}/jobs")}

    t0 = time.perf_counter()
    rows = REGISTRY[name].fn(spark, sf_dir).collect()
    wall = time.perf_counter() - t0

    jobs = [
        j
        for j in _get(base, f"applications/{app}/jobs")
        if j["jobId"] not in before
    ]
    jobs.sort(key=lambda j: j["jobId"])
    print(f"=== {name}: wall {wall:.2f}s, {len(rows)} rows, {len(jobs)} jobs ===")
    from collections import Counter

    by_desc: Counter = Counter()
    sec_by_desc: Counter = Counter()
    for j in jobs:
        desc = (j.get("description") or "?").split("\n")[0][:60]
        desc = f"{desc} | {(j.get('name') or '?')[:80]}"
        t_sub = j.get("submissionTime")
        t_end = j.get("completionTime")
        dur = ""
        if t_sub and t_end:
            from datetime import datetime

            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            try:
                d = (
                    datetime.strptime(t_end.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                    - datetime.strptime(t_sub.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                ).total_seconds()
                dur = f"{d:8.3f}s"
                sec_by_desc[desc] += d
            except ValueError:
                pass
        by_desc[desc] += 1
        print(f"  job {j['jobId']:5d} {dur:>9s}  stages={len(j.get('stageIds', []))}  {desc}")
    print("\n--- by description (count, total sec) ---")
    for desc, n in by_desc.most_common():
        print(f"  {n:4d}  {sec_by_desc[desc]:8.3f}s  {desc}")


if __name__ == "__main__":
    main()
