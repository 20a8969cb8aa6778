"""Declared query inventory (SURVEY.md §2B relational surface + §2C extensions).

Every capability the engine claims is registered here as a named QuerySpec:
a ``(spark, sf_dir) -> DataFrame`` callable plus (when SQL-expressible) the
equivalent DuckDB oracle SQL.  The driver's correctness gate runs both sides
at sf0.01 and compares row-count + schema + order-insensitive value hash, so
every computed column is aliased identically on both sides and floating-point
aggregates are rounded to fixed decimals on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None => rows-only check (non-SQL-expressible)
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a query to the engine inventory."""

    def deco(fn):
        REGISTRY[name] = QuerySpec(name, fn, oracle, (fn.__doc__ or "").strip(), tags)
        return fn

    return deco


def _coverage_history() -> dict[str, int]:
    """Map entry name -> latest driver round that checked it.

    The driver checks only a fixed-size prefix of the inventory (50 entries),
    so the inventory is ordered least-recently-covered first to guarantee
    every entry is driver-verified within ceil(N/50) rounds.  Round 3 showed
    that sorting on the *last* round alone starves whichever uncovered entry
    registers last (s12 sat at position 51 of the 50-entry prefix forever);
    a full LRU over all CORRECTNESS_r*.json files fixes that."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    history: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except Exception:
            continue
        for name, row in rows.items():
            # only a GREEN row counts as coverage: an entry whose last
            # driver row was an error (e.g. q36's old no_oracle) is not
            # certified and must resurface at the front of the rotation
            # until it passes, not wait out a full LRU cycle (round 6:
            # q36's fixed oracle would otherwise have sat at position 64,
            # unverified for another round)
            ok = isinstance(row, dict) and not row.get("err") and all(
                row.get(k) is not False
                for k in ("rows_match", "schema_match", "hash_match")
            )
            if ok:
                history[name] = max(history.get(name, 0), rnd)
    return history


def _rotated_names() -> list[str]:
    history = _coverage_history()
    # stable sort: never-covered entries first (round 0), then ascending by the
    # last round the driver checked them; ties keep registration order
    return sorted(REGISTRY, key=lambda n: history.get(n, 0))


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: REGISTRY[name].fn for name in _rotated_names()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {
        name: REGISTRY[name].oracle
        for name in _rotated_names()
        if REGISTRY[name].oracle
    }


_loaded = False


def _ensure_loaded() -> None:
    global _loaded
    if not _loaded:
        # Imports populate REGISTRY via the decorator.
        from hiveka_spark.queries import (  # noqa: F401
            curation_ext,
            extensions,
            pipeline_e2e,
            pipeline_ext,
            relational,
            relational_ext,
            streaming_queries,
            tokenizer_ext,
        )

        _loaded = True
