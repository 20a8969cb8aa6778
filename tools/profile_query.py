"""Driver-side profile of one registered query: where does the gate's wall
time go?  Runs the query under cProfile and prints the top call sites by
cumulative time, filtered to hiveka_spark plus the Spark action boundaries
(collect / save / awaitTermination / toPandas), so a composite gate's cost
splits into its sub-steps.

Usage:
    python tools/profile_query.py <sf_dir> <query_name> [top_n]
"""

from __future__ import annotations

import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    name = sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 40

    from hiveka_spark.queries import REGISTRY, _ensure_loaded
    from hiveka_spark.session import get_spark

    _ensure_loaded()
    spark = get_spark("hiveka-profile")
    from hiveka_spark.catalog import table

    table(spark, sf_dir, "lineitem").count()  # warm-up

    fn = REGISTRY[name].fn
    prof = cProfile.Profile()
    t0 = time.perf_counter()
    prof.enable()
    rows = fn(spark, sf_dir).collect()
    prof.disable()
    wall = time.perf_counter() - t0
    print(f"\n=== {name}: wall {wall:.2f}s, {len(rows)} rows ===")

    st = pstats.Stats(prof)
    st.sort_stats("cumulative")
    # show hiveka_spark call sites and JVM-boundary waits
    print("\n--- hiveka_spark call sites (cumulative) ---")
    st.print_stats("hiveka_spark", top_n)
    print("\n--- action boundaries ---")
    st.print_stats(r"collect|awaitTermination|save\b|parquet|toPandas", 25)


if __name__ == "__main__":
    main()
