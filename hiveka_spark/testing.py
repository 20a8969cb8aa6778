"""Shared test/verification helpers: DuckDB oracle connection + the
order-insensitive result comparison used by the correctness gate replica."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

FIXTURE_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf_dir}/{t}.parquet')")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Column-name sort + row sort + object->str, mirroring a hash compare."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare_results(spark_pd: pd.DataFrame, duck_pd: pd.DataFrame) -> tuple[bool, str]:
    """Row-count + column-set + exact value equality (floats exact: queries
    quantize on both sides).  Returns (ok, message)."""
    if sorted(spark_pd.columns) != sorted(duck_pd.columns):
        return False, (
            f"schema mismatch: spark={sorted(spark_pd.columns)} duck={sorted(duck_pd.columns)}"
        )
    if len(spark_pd) != len(duck_pd):
        return False, f"row count mismatch: spark={len(spark_pd)} duck={len(duck_pd)}"
    a, b = normalize(spark_pd), normalize(duck_pd)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        # int-on-one-side / float-on-the-other means the two engines disagree
        # on the column's TYPE even when values compare equal (e.g. DuckDB
        # SUM(BIGINT) -> HUGEINT -> float64 in pandas vs Spark int64).  The
        # driver's hash covers value rendering, so "123" vs "123.0" fails
        # there — fail here too so it can't slip through locally (q41, r2).
        kinds = {av.dtype.kind, bv.dtype.kind}
        if kinds & {"i", "u"} and "f" in kinds:
            return False, (
                f"col {c}: dtype kind mismatch spark={av.dtype} duck={bv.dtype} "
                "(int vs float — pin with explicit CASTs on both sides)"
            )
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            af, bf = av.astype(float), bv.astype(float)
            nan_ok = np.isnan(af) & np.isnan(bf)
            if not np.all((af == bf) | nan_ok):
                close = np.all(np.isclose(af, bf, rtol=1e-9, atol=1e-9) | nan_ok)
                bad = np.where(~((af == bf) | nan_ok))[0][:3]
                return False, (
                    f"col {c}: exact-neq (close={close}) rows {bad.tolist()} "
                    f"spark={af[bad].tolist()} duck={bf[bad].tolist()}"
                )
        elif not np.array_equal(av, bv):
            bad = np.where(av != bv)[0][:3]
            return False, (
                f"col {c}: rows {bad.tolist()} spark={av[bad].tolist()} duck={bv[bad].tolist()}"
            )
    return True, "ok"
