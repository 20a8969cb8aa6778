"""Time named registered queries exactly as bench.py does (warm-up scan,
then collect() per query) — for before/after spot measurements during
optimization rounds without paying for the full suite.

Usage: python tools/time_queries.py <sf_dir> <query> [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]

    from hiveka_spark.catalog import table
    from hiveka_spark.queries import REGISTRY, _ensure_loaded
    from hiveka_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark("time-queries")
    table(spark, sf_dir, "lineitem").count()  # warm-up

    for name in names:
        t0 = time.perf_counter()
        rows = REGISTRY[name].fn(spark, sf_dir).collect()
        sec = time.perf_counter() - t0
        print(f"TIMED {name}: {sec:.3f}s ({len(rows)} rows)", flush=True)


if __name__ == "__main__":
    main()
