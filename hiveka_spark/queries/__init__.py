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


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}


_loaded = False


def _ensure_loaded() -> None:
    global _loaded
    if not _loaded:
        # Imports populate REGISTRY via the decorator.
        from hiveka_spark.queries import (  # noqa: F401
            extensions,
            relational,
            relational_ext,
            streaming_queries,
        )

        _loaded = True
