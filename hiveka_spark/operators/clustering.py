"""Duplicate clustering: connected components over a near-duplicate pair
graph, turning pairwise dedup output (x02/x03/x04) into canonical clusters —
the step a production pipeline actually acts on (keep one doc per cluster).

No reference analog (SURVEY.md §2C extension surface).  Spark-first design:

- Pregel-style minimum-label propagation: every node starts labeled with its
  own id; each round replaces a node's label with the minimum label in its
  closed neighborhood; fixpoint = connected components.  Each round is ONE
  shuffle (groupBy node) over the edge list — no driver-side graph state,
  no collect of edges.  Rounds needed = graph diameter, which for near-dup
  clusters is small (duplicates of a document are also near-duplicates of
  each other); `max_iter` bounds the worst case and convergence is detected
  with a one-scalar aggregate per round.
- At 100 TB the edge list is orders of magnitude smaller than the corpus
  (only near-dup pairs), so per-round cost is proportional to duplicate
  volume, not corpus size.  Labels are localCheckpoint()ed every round to
  truncate lineage (iterative plans otherwise grow unboundedly).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, cluster) for every node in ``pairs``; cluster = min node id of
    its connected component.  Deterministic, engine-portable (pure min).
    """
    # both edge directions from ONE scan of pairs (a union of two selects
    # would run the — possibly expensive — upstream pair pipeline twice)
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(id_a).alias("u"), F.col(id_b).alias("v")),
                    F.struct(F.col(id_b).alias("u"), F.col(id_a).alias("v")),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .distinct()
    )
    edges = edges.persist()
    # init = round 1: closed-neighborhood min straight off the edge list (one
    # shuffle instead of a distinct + a propagation round)
    labels = edges.groupBy(F.col("u").alias("node")).agg(
        F.least(F.min("v"), F.first("u")).alias("label")
    )
    for _ in range(max_iter):
        # min label over closed neighborhood: the node's own label union the
        # labels of its neighbors (one equi-join edge->label + one groupBy)
        nbr = (
            edges.join(labels.withColumnRenamed("node", "v"), "v")
            .select(F.col("u").alias("node"), "label")
            .union(labels)
            .groupBy("node")
            .agg(F.min("label").alias("new_label"))
        )
        # ONE job per round: checkpoint (node, old, new) once, then both the
        # convergence probe and next round's labels read the checkpointed
        # blocks instead of re-running the join.
        snap = labels.join(nbr, "node").localCheckpoint(eager=True)
        labels = snap.select("node", F.col("new_label").alias("label"))
        if snap.filter(F.col("new_label") < F.col("label")).limit(1).count() == 0:
            break
    edges.unpersist()
    return labels.select("node", F.col("label").alias("cluster"))


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Cluster summary per connected component of the near-dup graph:
    (cluster, n_members, canonical_id, removed) where canonical_id is the
    minimum member id (the doc a pipeline keeps) and removed = n_members - 1
    (the dedup yield metric)."""
    cc = connected_components(pairs, id_a, id_b, max_iter)
    return cc.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("node").alias("canonical_id"),
        (F.count(F.lit(1)) - 1).alias("removed"),
    )


def kmeans_lloyd(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_assign: int = 2,
    centroid_stride: int = 61,
) -> DataFrame:
    """Distributed Lloyd k-means over an embedding column, ENGINE-EXACT so a
    SQL oracle can replay every iteration: vectors are fixed-point-quantized
    (similarity.QUANT), distances are bigint squared-L2, centroid updates are
    truncating integer divisions (Spark DIV == DuckDB // semantics), and ties
    break (d2, cell) ascending.  ``n_assign`` assignment rounds run with an
    update between each pair — n_assign=2 is assign -> update -> assign.

    The topic-clustering step of a curation pipeline (cluster-balanced
    mixing, cluster-level dedup seeds, SemDeDup's codebook) expressed
    Spark-first:

    - ASSIGN: centroids are always a k-row broadcast; the argmin is a per-row
      expression + row_number over (d2, cell) — the corpus never shuffles.
    - UPDATE: posexplode to (cell, pos, component) and ONE map-side-combined
      aggregate keyed (cell, pos) — k*dim result rows — then collect_list/
      array_sort repacks the k centroid arrays.  No driver-side math, no
      collect: the centroid frame stays a DataFrame and re-broadcasts.
    - Initial centroids are deterministic id-stride rows (vec id = cell *
      stride) — the same offline-codebook posture as ivf_topk/pq_topk; at
      100 TB you'd seed with k-means|| output handed in the same shape.

    Returns the FINAL assignment, one row per vector: (<id_col>, cell, d2) —
    the frame downstream curation steps consume (cluster-balanced sampling,
    per-cluster dedup seeds).  Summaries are one aggregate away (see
    ``kmeans_summary``).  All bigint-exact.
    """
    from hiveka_spark.operators.similarity import with_quantized_norm

    v = with_quantized_norm(df, vec_col).select(
        F.col(id_col).alias("_id"), "qvec"
    )
    cents = v.filter(
        (F.col("_id") % centroid_stride == 0)
        & (F.col("_id") / centroid_stride < k)
    ).select(
        (F.col("_id") / centroid_stride).cast("bigint").alias("cell"),
        F.col("qvec").alias("cvec"),
    )

    def d2_expr(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )

    from pyspark.sql import Window

    def assign(cents_df: DataFrame) -> DataFrame:
        scored = v.crossJoin(F.broadcast(cents_df)).withColumn(
            "d2", d2_expr(F.col("qvec"), F.col("cvec"))
        )
        w = Window.partitionBy("_id").orderBy("d2", "cell")
        return (
            scored.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") == 1)
            .select("_id", "qvec", "cell", "d2")
        )

    asgn = assign(cents)
    for _ in range(n_assign - 1):
        comp = (
            asgn.select("cell", F.posexplode("qvec").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.expr("CAST(sum(val) DIV count(val) AS BIGINT)").alias("cval"))
        )
        cents = comp.groupBy("cell").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cval"))),
                lambda s: s["cval"],
            ).alias("cvec")
        )
        asgn = assign(cents)
    return asgn.select(F.col("_id").alias(id_col), "cell", "d2")


def kmeans_summary(assignments: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Per-cluster rollup of a kmeans_lloyd assignment frame:
    (cell, n_members, inertia, min_member_id) — the dashboard/gate shape."""
    return assignments.groupBy("cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.sum("d2").cast("bigint").alias("inertia"),
        F.min(id_col).cast("bigint").alias("min_member_id"),
    )
