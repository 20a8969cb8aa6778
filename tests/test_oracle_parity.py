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


def test_rotation_is_lru(tmp_path, monkeypatch):
    """The driver checks a 50-entry prefix; ordering must be least-recently-
    covered first so every entry is certified within ceil(N/50) rounds (the
    round-3 verdict caught s12 starved at position 51 forever)."""
    import json

    from hiveka_spark import queries as q

    hist = q._coverage_history()
    names = q._rotated_names()
    # never-covered entries lead, and coverage rounds are non-decreasing
    rounds = [hist.get(n, 0) for n in names]
    assert rounds == sorted(rounds)
    # simulate: everything the prefix covers this round moves behind the rest
    covered_now = dict(hist)
    next_round = max(rounds, default=0) + 1
    for n in names[:50]:
        covered_now[n] = next_round
    nxt = sorted(q.REGISTRY, key=lambda n: covered_now.get(n, 0))
    # every entry the 50-wide prefix MISSED this round must lead the next
    # ordering (sized to the actual remainder — the inventory grows)
    missed = set(names[50:])
    assert set(nxt[: len(missed)]) == missed, "starved entries must lead next round"
