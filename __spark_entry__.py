"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001 as a smoke check;
``queries()`` exposes the full declared inventory (SURVEY.md §2B + §2C) as
``(spark, sf_dir) -> DataFrame`` callables; ``oracle_sql()`` gives the DuckDB
oracle for every SQL-expressible entry.  All real logic lives in the
``hiveka_spark`` package — this module is only the wiring.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hiveka_spark.queries import all_oracles, all_queries  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    from hiveka_spark.queries.relational import q01_pricing_summary

    return q01_pricing_summary(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible entry in queries()."""
    return all_oracles()
