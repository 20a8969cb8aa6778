"""Every registered query with an oracle must match DuckDB at sf0.001.

This mirrors the driver's t2 correctness gate (it runs at sf0.01; tests use
sf0.001 to stay fast — tools/check_oracle.py runs the bigger scale).
"""

from __future__ import annotations

import pytest

from hiveka_spark.queries import REGISTRY, _ensure_loaded
from hiveka_spark.testing import compare_results

from .conftest import SF_SMOKE

_ensure_loaded()

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if not s.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, duck, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_SMOKE).toPandas()
    ddf = duck.sql(spec.oracle).df()
    ok, msg = compare_results(sdf, ddf)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_SMOKE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_inventory_shape():
    # every oracle key must be a query key; inventory is non-trivial
    assert len(REGISTRY) >= 35
    assert all(s.fn is not None for s in REGISTRY.values())


def test_entry_contract(spark):
    import __spark_entry__ as m

    df = m.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(m.oracle_sql()) <= set(m.queries())
