"""Bucketed co-located join: the pay-once layout that removes both shuffles
from a fact-fact equi-join (the 100 TB lever Spark has and the reference's
Hive-delegated joins lack)."""

from __future__ import annotations

import pytest

from hiveka_spark.catalog import table
from hiveka_spark.operators.bucketing import (
    bucket_join_shuffles,
    colocated_join,
    prepare_bucketed_db,
    write_bucketed,
)

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_db(spark, tmp_path_factory):
    db = "bucket_test_db"
    loc = tmp_path_factory.mktemp("bucketed_wh")
    prepare_bucketed_db(spark, db, str(loc))
    li = table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_bucketed(li, f"{db}.lineitem_b", ["l_orderkey"], 8)
    write_bucketed(orders, f"{db}.orders_b", ["o_orderkey"], 8)
    yield db
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_colocated_join_has_zero_shuffles(spark, bucketed_db):
    # Force the sort-merge path (a broadcast join would trivially have no
    # shuffle and prove nothing about the layout).
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(
            spark,
            f"{bucketed_db}.lineitem_b",
            f"{bucketed_db}.orders_b",
            left_on="l_orderkey",
            right_on="o_orderkey",
        )
        assert bucket_join_shuffles(joined) == 0, "bucketed join must not shuffle"

        # Same join on the raw (unbucketed) parquet shuffles both sides.
        li = table(spark, SF_SMOKE, "lineitem")
        orders = table(spark, SF_SMOKE, "orders")
        raw = li.join(orders, li.l_orderkey == orders.o_orderkey)
        assert bucket_join_shuffles(raw) >= 2

        # And the co-located result is still correct.
        assert joined.count() == raw.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_has_zero_shuffles(spark, bucketed_db):
    import pyspark.sql.functions as F

    agg = (
        spark.table(f"{bucketed_db}.lineitem_b")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    assert bucket_join_shuffles(agg) == 0, "agg on the bucket key must not shuffle"
