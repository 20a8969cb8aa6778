"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB over the
same parquet fixtures, then compares row-count, schema (column names), and an
order-insensitive exact value comparison.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, ".")

from hiveka_spark.queries import REGISTRY, _ensure_loaded
from hiveka_spark.session import get_spark
from hiveka_spark.testing import compare_results, duck_connect


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    _ensure_loaded()
    spark = get_spark("oracle-check")
    con = duck_connect(sf_dir)
    n_pass = n_fail = n_rowsonly = 0
    for name, spec in sorted(REGISTRY.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: spark error\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"ROWS {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            ddf = con.sql(spec.oracle).df()
        except Exception:
            print(f"FAIL {name}: duckdb error\n{traceback.format_exc()}")
            n_fail += 1
            continue
        ok, msg = compare_results(sdf, ddf)
        status = "PASS" if ok else "FAIL"
        n_pass, n_fail = n_pass + ok, n_fail + (not ok)
        print(f"{status} {name}: {len(sdf)} rows; {msg} [{time.time()-t0:.1f}s]")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
