"""Connected-components / duplicate-cluster semantics."""

from __future__ import annotations

from hiveka_spark.operators.clustering import connected_components, dedup_clusters


def test_chain_and_islands(spark):
    # chain 1-2-3-4 (diameter 3), island pair 10-11, triangle 20-21-22
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["id_a", "id_b"],
    )
    cc = {r["node"]: r["cluster"] for r in connected_components(pairs).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}

    cl = {r["cluster"]: r for r in dedup_clusters(pairs).collect()}
    assert cl[1]["n_members"] == 4 and cl[1]["canonical_id"] == 1 and cl[1]["removed"] == 3
    assert cl[10]["n_members"] == 2 and cl[20]["n_members"] == 3


def test_long_chain_converges_within_max_iter(spark):
    # a 12-node path needs ~diameter rounds; max_iter must cover it
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["id_a", "id_b"]
    )
    cc = connected_components(pairs, max_iter=20).collect()
    assert {r["cluster"] for r in cc} == {0} and len(cc) == 13


def test_undirected_regardless_of_pair_order(spark):
    # edges given high->low must cluster the same as low->high
    pairs = spark.createDataFrame([(5, 3), (3, 9)], ["id_a", "id_b"])
    cc = {r["node"]: r["cluster"] for r in connected_components(pairs).collect()}
    assert cc == {3: 3, 5: 3, 9: 3}
