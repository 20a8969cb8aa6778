"""Dump .explain("formatted") for named registered queries to files —
the judge-facing before/after plan evidence for optimization rounds.

Usage:
    python tools/explain_to_file.py <sf_dir> <suffix> <query> [query ...]

Writes plans/r16/<query>_<suffix>.txt for each query (constructing the
gate's DataFrame runs any driver-side preamble the gate performs — eager
checkpoints, bounded collects — exactly as the bench does, then explains
the RETURNED frame).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]

    from hiveka_spark.plans.inspect import formatted_plan
    from hiveka_spark.queries import REGISTRY, _ensure_loaded
    from hiveka_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark("explain-dump")
    round_dir = os.environ.get("PLANS_ROUND", "r17")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", round_dir)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(formatted_plan(df))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
