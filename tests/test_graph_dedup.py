"""x146 graph-dedup terminal consumer: keep-best removal over mutual-kNN
components, pinned on a planted-cluster fixture against x37's
cell-approximate SemDeDup (round-15 verdict #2's 'removal counts pinned
vs x37' clause) and against x33's resolution policy (the keeper is the
highest-QUALITY member, not the min id)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from hiveka_spark.operators.clustering import connected_components_star
from hiveka_spark.operators.similarity import mutual_knn_pairs, semantic_dedup
from hiveka_spark.operators.text import with_quality

NCLUST, PER = 4, 5
DIM = 8


def _planted(spark):
    """NCLUST well-separated clusters of PER near-identical vectors each
    (ids grouped: cluster c owns ids c*PER .. c*PER+PER-1, so stride-PER
    centroid seeding picks exactly one centroid per cluster), plus a
    documents table where the HIGHEST-quality member of each cluster is
    NOT the min id (id c*PER+2 gets the long text)."""
    rows, docs = [], []
    for c in range(NCLUST):
        for j in range(PER):
            i = c * PER + j
            vec = [0.0] * DIM
            vec[2 * c] = 1.0
            # tiny index-derived jitter, same scale for all members
            vec[2 * c + 1] = 0.001 * j
            rows.append((i, vec))
            text = (
                "the quick brown fox jumps over the lazy dog and then "
                "the fox runs away to the forest with a happy smile "
                "because it is a good day for every animal in the woods"
                if j == 2
                else f"short note {i}"
            )
            docs.append((i, text))
    e = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    d = spark.createDataFrame(docs, "doc_id bigint, text string")
    return e, d


def _graph_removed(spark, e, d, k):
    """The x146 chain on an arbitrary fixture: mutual-kNN components ->
    keep-best by quality -> removed id set."""
    mutual = mutual_knn_pairs(
        e, "vec_id", "embedding",
        k=k, n_cells=NCLUST, n_probe=1, centroid_stride=PER, dim=DIM,
    )
    cc, _rounds = connected_components_star(mutual)
    q = with_quality(d).select("doc_id", "quality_score")
    m = cc.join(q, cc["node"] == q["doc_id"]).select(
        "doc_id", "cluster", "quality_score"
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col("quality_score").desc(), "doc_id"
    )
    r = m.withColumn("rnk", F.row_number().over(w))
    removed = {x.doc_id for x in r.filter(F.col("rnk") > 1).collect()}
    keepers = {
        x.cluster: x.doc_id for x in r.filter(F.col("rnk") == 1).collect()
    }
    return removed, keepers


def test_graph_dedup_matches_semdedup_on_planted_clusters(spark):
    """On planted clusters (every member a certified TRUE neighbor of
    every other, clusters well separated), the mutual-kNN keep-best
    removal and x37's cell-approximate SemDeDup must agree on the
    removal COUNT: all-but-one per cluster."""
    e, d = _planted(spark)
    removed, _ = _graph_removed(spark, e, d, k=PER - 1)
    assert len(removed) == NCLUST * (PER - 1), sorted(removed)

    sem = semantic_dedup(
        e, "vec_id", "embedding",
        n_cells=NCLUST, threshold=0.9, centroid_stride=PER, dim=DIM,
    )
    sem_removed = {r.vec_id for r in sem.collect()}
    assert len(sem_removed) == len(removed), (
        sorted(sem_removed), sorted(removed),
    )


def test_graph_dedup_keeps_best_quality_not_min_id(spark):
    """x33's resolution policy on TRUE neighbors: the keeper is the
    highest-quality member (id c*PER+2's long text), which x37's
    keep-FIRST policy would have removed in favor of the min id."""
    e, d = _planted(spark)
    removed, keepers = _graph_removed(spark, e, d, k=PER - 1)
    for c in range(NCLUST):
        best = c * PER + 2
        assert keepers[min(keepers)] is not None
        assert best not in removed, f"cluster {c}: best-quality member removed"
        assert c * PER in removed, f"cluster {c}: min id should lose to quality"
    # SemDeDup's keep-first keeps min id instead — the policies differ
    sem = semantic_dedup(
        e, "vec_id", "embedding",
        n_cells=NCLUST, threshold=0.9, centroid_stride=PER, dim=DIM,
    )
    sem_removed = {r.vec_id for r in sem.collect()}
    assert all(c * PER not in sem_removed for c in range(NCLUST))
    assert all(c * PER + 2 in sem_removed for c in range(NCLUST))
