"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB over the
same parquet fixtures, then compares row-count, schema (column names), and an
order-insensitive value comparison (exact match after column-name sort + row
sort).  Floats are compared exactly (the queries round on both sides) with an
np.isclose fallback reported separately so boundary-rounding flake is visible.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from hiveka_spark.queries import REGISTRY, _ensure_loaded
from hiveka_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf_dir}/{t}.parquet')")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(spark_pd: pd.DataFrame, duck_pd: pd.DataFrame) -> tuple[bool, str]:
    if sorted(spark_pd.columns) != sorted(duck_pd.columns):
        return False, f"schema mismatch: spark={sorted(spark_pd.columns)} duck={sorted(duck_pd.columns)}"
    if len(spark_pd) != len(duck_pd):
        return False, f"row count mismatch: spark={len(spark_pd)} duck={len(duck_pd)}"
    a, b = normalize(spark_pd), normalize(duck_pd)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            af = av.astype(float)
            bf = bv.astype(float)
            nan_ok = np.isnan(af) & np.isnan(bf)
            if not np.all((af == bf) | nan_ok):
                close = np.all(np.isclose(af, bf, rtol=1e-9, atol=1e-9) | nan_ok)
                bad = np.where(~((af == bf) | nan_ok))[0][:3]
                return False, (
                    f"col {c}: exact-neq (close={close}) e.g. rows {bad.tolist()} "
                    f"spark={af[bad].tolist()} duck={bf[bad].tolist()}"
                )
        else:
            if not np.array_equal(av, bv):
                bad = np.where(av != bv)[0][:3]
                return False, f"col {c}: e.g. rows {bad.tolist()} spark={av[bad].tolist()} duck={bv[bad].tolist()}"
    return True, "ok"


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
        ok, msg = compare(sdf, ddf)
        status = "PASS" if ok else "FAIL"
        if ok:
            n_pass += 1
        else:
            n_fail += 1
        print(f"{status} {name}: {len(sdf)} rows; {msg} [{time.time()-t0:.1f}s]")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
