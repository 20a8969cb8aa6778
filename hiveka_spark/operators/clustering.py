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


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> tuple[DataFrame, int]:
    """Connected components via alternating LARGE-STAR / SMALL-STAR
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) — provably O(log n) rounds, vs min-label
    propagation's O(diameter): a 100 TB dup graph with long chains (URL
    redirect chains, quote-of-quote-of-quote threads) multiplies
    :func:`connected_components`' full-edge shuffles by the chain length,
    while star contraction halves every path each alternation.

    - large-star(u): connect every neighbor v > u to m = min(N(u) ∪ {u});
    - small-star(u): over edges directed larger->smaller, connect u and
      all its smaller neighbors to their minimum.

    Each phase is one groupBy(u) + one equi-join of the edge list — the
    same per-round shuffle cost as one propagation round, but the round
    COUNT is logarithmic.  Fixpoint: the small-star output is a stable
    star forest (every edge points node -> component minimum); detected
    with an exact set-equality probe (count + one-sided exceptAll).

    Returns ((node, cluster), rounds) — the frame matches
    :func:`connected_components` exactly (property-tested, including a
    path graph where propagation needs n rounds); ``rounds`` is the number
    of large+small alternations executed, exposed so tests can assert the
    logarithmic behavior instead of trusting the docstring.
    """
    # symmetrized edge list; node universe captured BEFORE self-loops are
    # dropped so a node whose only edge is a self-pair still emits its
    # singleton cluster (matching connected_components — a self-pair is a
    # legal degenerate input, e.g. a re-ingested doc id paired with itself)
    both = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col(id_a).alias("u"), F.col(id_b).alias("v")),
                F.struct(F.col(id_b).alias("u"), F.col(id_a).alias("v")),
            )
        ).alias("e")
    ).select("e.u", "e.v")
    # the upstream pair pipeline feeds BOTH init checkpoints (node universe
    # and edge set); persist so it materializes once, not once per action
    both = both.persist()
    all_nodes = both.select(F.col("u").alias("node")).distinct().localCheckpoint(
        eager=True
    )
    from pyspark.sql import Observation

    init_obs = Observation()
    edges = (
        both.filter(F.col("u") != F.col("v"))
        .distinct()
        .observe(init_obs, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    both.unpersist()

    def min_nbr(e: DataFrame) -> DataFrame:
        # m(u) = min over the closed neighborhood N(u) ∪ {u}
        return e.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))

    rounds = 0
    prev_count = None  # carried ss.count() — saves one job per round (r16)
    for _ in range(max_iter):
        rounds += 1
        # LARGE-STAR over the SYMMETRIZED edge list: emit (v, m(u)) for
        # v in N(u), v > u.  Every emitted edge already points larger ->
        # smaller (m <= u < v), which is exactly small-star's input form.
        # Symmetrization needs no distinct shuffle (r16): round 1's init
        # edges are symmetric-by-construction (both directions of every
        # pair, distinct), and every later round's edges are a DISTINCT
        # strictly-directed (u > v) set, so the u>v rows and their u<v
        # reversals are disjoint and each half is internally distinct.
        if rounds == 1:
            sym = edges
        else:
            sym = edges.select(
                F.explode(
                    F.array(
                        F.struct("u", "v"),
                        F.struct(F.col("v").alias("u"), F.col("u").alias("v")),
                    )
                ).alias("e")
            ).select("e.u", "e.v")
        # no distinct on ls (r16): min_nbr is duplicate-insensitive and
        # small-star's output applies its own distinct, so deduping here
        # only traded one extra shuffle for a smaller (bounded-identical
        # order) join input.
        ls = (
            sym.join(min_nbr(sym), "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        # SMALL-STAR: attach u and all its smaller neighbors to their
        # minimum; output stays directed larger -> smaller.  The new edge
        # count rides the checkpoint job as an Observation accumulator
        # (r16, guide §1.2: the separate ss.count() job this replaces ran
        # once per round).
        obs = Observation()
        sm = min_nbr(ls)
        ss = (
            ls.join(sm, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(sm.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)  # truncate iterative lineage
        )
        # exact fixpoint probe: same edge count and no edge outside the old
        # set => identical sets (both sides are distinct).  Round 1 compares
        # against the symmetric init and is never stable — fine.  The old
        # set's count is carried from its own round (r16, guide §1.2: don't
        # recount a checkpointed frame every round).
        if prev_count is None:
            prev_count = int(init_obs.get["n"])
        ss_count = int(obs.get["n"])
        stable = (
            ss_count == prev_count
            and ss.exceptAll(edges).limit(1).count() == 0
        )
        edges = ss
        prev_count = ss_count
        if stable:
            break
    # terminal star forest: every edge is node -> component min; component
    # minima themselves carry their own label
    labels = (
        all_nodes.join(edges.withColumnRenamed("u", "node"), "node", "left")
        .groupBy("node")
        .agg(F.least(F.min("v"), F.first("node")).alias("cluster"))
    )
    return labels, rounds


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    method: str = "propagation",
) -> DataFrame:
    """Cluster summary per connected component of the near-dup graph:
    (cluster, n_members, canonical_id, removed) where canonical_id is the
    minimum member id (the doc a pipeline keeps) and removed = n_members - 1
    (the dedup yield metric).  ``method``: 'propagation' (min-label,
    O(diameter) rounds) or 'star' (large/small-star contraction, O(log n)
    rounds — the 100 TB long-chain-safe choice, see
    :func:`connected_components_star`); both reach the identical fixpoint
    (property-tested)."""
    if method == "star":
        cc, _ = connected_components_star(pairs, id_a, id_b, max_iter)
    else:
        cc = connected_components(pairs, id_a, id_b, max_iter)
    return cc.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("node").alias("canonical_id"),
        (F.count(F.lit(1)) - 1).alias("removed"),
    )


def kmeans_parallel_init(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    rounds: int = 3,
    oversample: int | None = None,
    local_iters: int = 20,
) -> DataFrame:
    """k-means‖ initialization (Bahmani et al., VLDB 2012): the distributed,
    few-pass seeding that replaces k-means++'s k sequential passes — the
    production posture kmeans_lloyd's docstring promises ("seed with
    k-means|| output handed in the same shape").

    Distributed part (everything corpus-sized): start from the min-id
    vector; each of ``rounds`` passes computes every point's squared
    distance to the CURRENT candidate set (candidates broadcast — they
    number at most 1 + rounds*l) and samples each point independently with
    probability min(1, l*d2/phi), where phi is the current total cost and
    l = ``oversample`` (default 2k).  The Bernoulli draw is the
    engine-portable hash of (id, round) scaled to [0,1) — deterministic,
    so runs are reproducible and property-testable, while distributionally
    equivalent to a uniform draw.

    Driver part (candidate-sized, the standard finish — Spark MLlib and
    FAISS do the same): the ~rounds*l surviving candidates are weighted by
    how many corpus points each one is closest to, pulled to the driver
    (hundreds of rows, NOT the corpus), and reduced to exactly k centers
    with deterministic weighted k-means++ followed by a few local Lloyd
    iterations.  Centers are re-quantized to bigint so the downstream
    distributed Lloyd stays engine-exact.

    Returns a k-row (cell, cvec) frame shaped exactly like kmeans_lloyd's
    internal centroid frame — hand it in via ``init_centroids``.

    Scale shape: per round, one broadcast-join distance pass over the
    corpus + one min-per-point aggregate + one scalar cost aggregate; the
    corpus never shuffles on anything but its own id.  The only collect is
    the candidate set (O(rounds * l) rows).
    """
    import hashlib

    from hiveka_spark.operators.similarity import with_quantized_norm

    l = oversample if oversample is not None else 2 * k
    v = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    v = with_quantized_norm(v, "_v").select("_id", "qvec")
    v = v.persist()
    try:
        first_id = v.agg(F.min("_id")).collect()[0][0]
        cand = v.filter(F.col("_id") == first_id).select("_id", "qvec")

        def d2_expr(a, b):
            return F.aggregate(
                F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            )

        def min_d2(cand_df: DataFrame) -> DataFrame:
            c = cand_df.select(F.col("qvec").alias("cvec"))
            return (
                v.crossJoin(F.broadcast(c))
                .select("_id", "qvec", d2_expr(F.col("qvec"), F.col("cvec")).alias("d2"))
                .groupBy("_id", "qvec")
                .agg(F.min("d2").alias("d2"))
            )

        for r in range(rounds):
            scored = min_d2(cand)
            phi = scored.agg(F.sum("d2").alias("phi"))
            # hash-of-(id, round) as the uniform draw: u in [0, 1) with 60
            # bits of resolution; sample iff u * phi < l * d2
            from hiveka_spark.operators.dedup import portable_hash60

            u = portable_hash60(
                F.concat_ws("_", F.lit("kmeanspar"), F.col("_id"), F.lit(r))
            ) / F.lit(float(2**60))
            picked = (
                scored.crossJoin(F.broadcast(phi))
                .filter((u * F.col("phi")) < (F.lit(float(l)) * F.col("d2")))
                .select("_id", "qvec")
            )
            cand = cand.unionByName(picked).dropDuplicates(["_id"])
        cand = cand.localCheckpoint(eager=True)  # candidates: O(rounds*l) rows

        # weight candidates by closest-point counts (ties -> min candidate id)
        cc = cand.select(F.col("_id").alias("cid"), F.col("qvec").alias("cvec"))
        from pyspark.sql import Window

        w = Window.partitionBy("_id").orderBy("d2", "cid")
        nearest = (
            v.crossJoin(F.broadcast(cc))
            .select("_id", "cid", d2_expr(F.col("qvec"), F.col("cvec")).alias("d2"))
            .withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") == 1)
        )
        weights = nearest.groupBy("cid").agg(F.count(F.lit(1)).alias("wt"))
        rows = (
            cc.join(weights, "cid", "left")
            .select("cid", "cvec", F.coalesce("wt", F.lit(0)).alias("wt"))
            .collect()
        )
        # collect() order is partition-dependent; every driver-side step
        # below (argmax first-match, rng.choice index mapping) is order-
        # sensitive, so pin a canonical order or runs on differently-
        # partitioned inputs would yield different centers
        rows.sort(key=lambda r: r["cid"])
    finally:
        v.unpersist()

    # ---- driver-local weighted k-means++ + Lloyd over the candidates ----
    import numpy as np

    pts = np.array([row["cvec"] for row in rows], dtype=np.float64)
    wts = np.array([row["wt"] for row in rows], dtype=np.float64)
    cids = [row["cid"] for row in rows]
    # deterministic seed derived from the candidate ids (stable across runs)
    seed = int(
        hashlib.md5(",".join(map(str, sorted(cids))).encode()).hexdigest()[:8], 16
    )
    rng = np.random.RandomState(seed)
    n = len(pts)
    if n < k:
        # returning fewer-than-k centers silently shrinks downstream
        # kmeans_lloyd's k with no signal; surface it to the caller instead
        raise ValueError(
            f"k-means|| candidate pool has only {n} points for k={k}; "
            "increase rounds/oversample (or lower k) so init can seed "
            "every requested center"
        )
    if n == k:
        centers = pts[np.argsort(cids)][:k]
    else:
        idx = [int(np.argmax(wts))]  # heaviest candidate first (deterministic)
        for _ in range(1, k):
            d2 = np.min(
                ((pts[:, None, :] - pts[idx][None, :, :]) ** 2).sum(axis=2), axis=1
            )
            p = wts * d2
            tot = p.sum()
            if tot <= 0:
                remaining = [i for i in range(n) if i not in idx]
                idx.append(remaining[0])
                continue
            idx.append(int(rng.choice(n, p=p / tot)))
        centers = pts[idx]
        for _ in range(local_iters):
            a = np.argmin(
                ((pts[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2), axis=1
            )
            new = centers.copy()
            for c in range(k):
                m = a == c
                if wts[m].sum() > 0:
                    new[c] = (pts[m] * wts[m, None]).sum(axis=0) / wts[m].sum()
            if np.allclose(new, centers):
                break
            centers = new
    spark = df.sparkSession
    out = [
        (int(cell), [int(x) for x in np.rint(vec)])
        for cell, vec in enumerate(centers)
    ]
    return spark.createDataFrame(out, "cell bigint, cvec array<bigint>")


def kmeans_lloyd(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_assign: int = 2,
    centroid_stride: int = 61,
    init_centroids: DataFrame | None = None,
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
    - Initial centroids: ``init_centroids`` (a (cell, cvec) frame, e.g.
      :func:`kmeans_parallel_init`'s output — the production posture) when
      given; otherwise deterministic id-stride rows (vec id = cell *
      stride), the oracle-exact mode the x52 gate replays in DuckDB.

    Returns the FINAL assignment, one row per vector: (<id_col>, cell, d2) —
    the frame downstream curation steps consume (cluster-balanced sampling,
    per-cluster dedup seeds).  Summaries are one aggregate away (see
    ``kmeans_summary``).  All bigint-exact.
    """
    from hiveka_spark.operators.similarity import with_quantized_norm

    v = with_quantized_norm(df, vec_col).select(
        F.col(id_col).alias("_id"), "qvec"
    )
    if init_centroids is not None:
        cents = init_centroids.select("cell", "cvec")
    else:
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
