"""K-means (Lloyd) clustering over an embedding column — the
curation/mixing primitive a training-data pipeline runs to group a
corpus by semantic neighborhood (topic balancing, per-cluster sampling,
diversity filtering). Complements the IVF index in
``operators/similarity.py`` (which uses a *sampled* codebook): here the
codebook is refined by alternating assign/update steps.

Everything is DataFrame algebra — no UDFs, no driver-side ``collect``:

- **init**: deterministic, RNG-free — the k corpus vectors with the
  lowest ``md5(id)`` (the trick ``ivf_topk`` uses), cluster ids 0..k-1
  in md5 order, so the oracle picks the identical codebook.
- **assign**: crossJoin against the BROADCAST k-row codebook + argmin
  by (squared-L2, cluster) — a map-side operation; the only shuffle is
  the argmin window keyed by vector id.
- **update**: per-dimension means via ``posexplode`` + partial-agg
  ``avg`` keyed by (cluster, dim) — k*d groups, map-side combined.
  Means are rounded to 6 decimals so the floating-sum order of a
  distributed aggregation cannot leak into the next assignment
  (the oracle rounds identically). Empty clusters keep their previous
  centroid.
- the k-row codebook is ``localCheckpoint``-ed each iteration, so the
  lineage stays one-iteration deep no matter how many rounds run (the
  iterative-algorithm discipline used by ``connected_components``).

At 100 TB the corpus-side cost is n_iter scans + one keyed window
each; the codebook never exceeds k*d doubles.

``kmeans_train`` (below) is the training counterpart: same
deterministic md5 init, but centroid updates sum integer-scaled
components (round(val * 1e9) as int64) so per-cluster sums are
EXACT and partitioning-independent, making the whole training run
oracle-checkable round by round.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from graphkb_spark.core.materialize import materialize


def _sq_l2(a: Column | str, b: Column | str) -> Column:
    """Squared Euclidean distance between two array<double> columns,
    summed left-to-right in index order (the oracle's list_sum order)."""
    av = F.col(a) if isinstance(a, str) else a
    bv = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(av, bv, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans_assign(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    n_iter: int = 2,
) -> DataFrame:
    """Run ``n_iter`` Lloyd iterations and return the final assignment:
    (id_col, cluster, dist2) with dist2 = squared L2 to the final
    centroid, rounded to 6 decimals. Deterministic end to end (md5
    init, (dist, cluster) tie-break, rounded means)."""
    vecs = corpus.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    # deterministic codebook: k lowest md5(id); ids 0..k-1 in md5 order.
    # The single-partition window runs on k rows only (post-limit).
    seed = (
        vecs.withColumn("__h", F.md5(F.col("__id").cast("string")))
        .orderBy("__h")
        .limit(k)
    )
    cents = seed.select(
        (
            F.row_number().over(
                Window.partitionBy(F.pmod(F.length("__h"), F.lit(1))).orderBy("__h")
            )
            - 1
        ).alias("cluster"),
        F.col("__v").alias("__c"),
    ).transform(materialize, eager=True)

    assigned = None
    for it in range(n_iter):
        scored = vecs.crossJoin(F.broadcast(cents)).select(
            "__id", "__v", "cluster", _sq_l2("__v", "__c").alias("__d")
        )
        w = Window.partitionBy("__id").orderBy(F.col("__d").asc(), F.col("cluster").asc())
        assigned = (
            scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("__id", "__v", "cluster", "__d")
        )
        if it == n_iter - 1:
            break
        means = (
            assigned.select("cluster", F.posexplode("__v").alias("__p", "__x"))
            .groupBy("cluster", "__p")
            .agg(F.round(F.avg("__x"), 6).alias("__m"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__p", "__m"))),
                    lambda s: s["__m"],
                ).alias("__new")
            )
        )
        cents = (
            cents.join(means, "cluster", "left")
            .select("cluster", F.coalesce("__new", "__c").alias("__c"))
            .transform(materialize, eager=True)
        )

    return assigned.select(
        F.col("__id").alias(id_col),
        "cluster",
        F.round("__d", 6).alias("dist2"),
    )


def _sq_dist(a: Column, b: Column) -> Column:
    """Euclidean distance via the same sequential fold an external
    engine's list_distance uses — identical summation order, identical
    bits."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def kmeans_train(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    rounds: int = 2,
    scale: int = 10**9,
) -> DataFrame:
    """Train k-means for ``rounds`` Lloyd iterations and return the
    final assignment (id, cluster, dist) — dist to the final centroid,
    rounded to 6. Clusters are numbered 0..k-1 in init-hash order; a
    cluster abandoned by every point simply disappears (standard Lloyd
    degeneracy — deterministic here, so reproducible).

    Fixed rounds, no convergence check (the ``transitive_closure``
    contract): each check is a full job, and training-data pipelines
    budget clustering passes, not epsilon convergence."""
    if k < 1 or rounds < 0:
        raise ValueError("k must be >= 1 and rounds >= 0")
    pts = (
        df.select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).cast("array<double>").alias("__v"),
        )
        .repartition("__id")
        .transform(materialize, eager=False)
    )
    final = _lloyd(pts, k, rounds, scale)
    return final.select(
        F.col("__id").alias(id_col),
        F.col("__cl").alias("cluster"),
        F.round("__d", 6).alias("dist"),
    )


def _init_hash() -> Column:
    """Deterministic init ordering hash: first 8 md5 hex chars of the
    id as a bigint (shared by flat and two-level training so the
    k_coarse=1 degenerate case is EXACTLY the flat run)."""
    return F.conv(
        F.substring(F.md5(F.col("__id").cast("string")), 1, 8), 16, 10
    ).cast("bigint")


def _lloyd(pts: DataFrame, k: int, rounds: int, scale: int) -> DataFrame:
    """The kmeans_train Lloyd loop over a prepared (__id, __v) frame;
    returns the final assignment (__id, __cl, __d)."""
    hh = _init_hash()
    init = pts.withColumn("__hh", hh).orderBy("__hh", "__id").limit(k)
    # ordinal cluster ids WITHOUT a window: triangular count over the
    # k-row table (broadcast both sides; k is tiny by construction)
    lhs = init.select("__id", "__hh", "__v")
    rhs = init.select(F.col("__hh").alias("__h2"), F.col("__id").alias("__i2"))
    centroids = (
        lhs.join(
            F.broadcast(rhs),
            (F.col("__h2") < F.col("__hh"))
            | ((F.col("__h2") == F.col("__hh")) & (F.col("__i2") < F.col("__id"))),
            "left",
        )
        .groupBy("__id", "__hh", "__v")
        .agg(F.count("__i2").alias("__cl"))
        .select(F.col("__cl").cast("int").alias("__cl"), F.col("__v").alias("__cv"))
    )

    def assign(cents: DataFrame) -> DataFrame:
        """(id, cluster) — argmin distance, ties to the lowest cluster.
        Only (id, dist, cluster) crosses the argmin exchange."""
        scored = pts.crossJoin(F.broadcast(cents)).select(
            "__id", "__cl", _sq_dist(F.col("__v"), F.col("__cv")).alias("__d")
        )
        return scored.groupBy("__id").agg(
            F.min(F.struct(F.col("__d"), F.col("__cl"))).alias("__m")
        ).select("__id", F.col("__m.__cl").alias("__cl"), F.col("__m.__d").alias("__d"))

    for _ in range(rounds):
        asn = assign(centroids).select("__id", "__cl")
        members = pts.join(asn, "__id")  # pts pre-partitioned by __id
        exploded = members.select(
            "__cl", F.posexplode("__v").alias("__pos", "__val")
        ).select(
            "__cl",
            "__pos",
            F.round(F.col("__val") * scale).cast("bigint").alias("__vi"),
        )
        dims = exploded.groupBy("__cl", "__pos").agg(
            F.round(
                F.sum("__vi").cast("double") / F.count(F.lit(1)) / F.lit(float(scale)),
                8,
            ).alias("__mean")
        )
        centroids = (
            dims.groupBy("__cl")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("__pos"), F.col("__mean")))
                    ),
                    lambda s: s["__mean"],
                ).alias("__cv")
            )
            .transform(materialize, eager=False)
        )
    return assign(centroids)


def kmeans_train_two_level(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k_coarse: int = 4,
    k_fine: int = 4,
    rounds: int = 2,
    scale: int = 10**9,
) -> DataFrame:
    """Hierarchical (two-level) Lloyd training — the bounded-flops
    assignment mode for cluster counts that grow with the corpus
    (VERDICT r11 #2). Flat Lloyd pays N*k distance evaluations per
    round; under the SemDeDup contract k grows with N, so the total is
    quadratic even though every step is map-only. Two-level restores
    linearity: train ``k_coarse`` coarse centroids on the corpus
    (N*k_coarse flops/round), then train ``k_fine`` centroids
    INDEPENDENTLY inside each coarse cell (each point only ever scores
    against its own cell's fine codebook — N*k_fine flops/round). With
    k_coarse = k_fine = sqrt(k) the per-round bill drops from N*k to
    2*N*sqrt(k) — the standard hierarchical k-means trade: the
    partition is no longer the flat Lloyd optimum (a point near a cell
    boundary may have a closer fine centroid in a neighboring cell),
    which SemDeDup tolerates by design (clustering is a blocking
    heuristic; the paper itself uses approximate k-means at scale).

    Determinism matches ``kmeans_train`` exactly: md5-prefix init
    ordering (per cell for the fine level — a row_number window keyed
    by cell), integer-scaled exact centroid sums, 8-decimal means,
    (dist, cluster) argmin tie-break. ``k_coarse=1`` degenerates to
    the flat run bit-for-bit (one cell holding everything, fine init =
    global init) — pinned by test. Returns (id, cluster, dist) with
    ``cluster = cell * k_fine + fine`` (flat numbering, disjoint across
    cells); cells with fewer than k_fine members simply train fewer
    fine centroids.

    Scale shape: the fine codebook is k_coarse*k_fine rows TOTAL and
    broadcasts whole; the per-cell equi-join is map-side against the
    already-materialized (id, v, cell) frame, so each fine round adds
    zero exchanges beyond the k*d-row centroid aggregation."""
    if k_coarse < 1 or k_fine < 1 or rounds < 0:
        raise ValueError("k_coarse/k_fine must be >= 1 and rounds >= 0")
    pts = (
        df.select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).cast("array<double>").alias("__v"),
        )
        .repartition("__id")
        .transform(materialize, eager=False)
    )
    cells = _lloyd(pts, k_coarse, rounds, scale).select(
        "__id", F.col("__cl").alias("__cell")
    )
    ptsc = pts.join(cells, "__id").transform(materialize, eager=False)

    # fine init: the k_fine members with the lowest (md5-prefix, id)
    # per cell — same ordering as the flat init, restricted to the cell
    wcell = Window.partitionBy("__cell").orderBy(F.col("__hh").asc(), F.col("__id").asc())
    fine = (
        ptsc.withColumn("__hh", _init_hash())
        .withColumn("__rn", F.row_number().over(wcell))
        .filter(F.col("__rn") <= k_fine)
        .select(
            "__cell",
            (F.col("__rn") - 1).cast("int").alias("__fcl"),
            F.col("__v").alias("__cv"),
        )
        .transform(materialize, eager=False)
    )

    def assign(cents: DataFrame) -> DataFrame:
        scored = ptsc.join(F.broadcast(cents), "__cell").select(
            "__id",
            "__cell",
            "__fcl",
            _sq_dist(F.col("__v"), F.col("__cv")).alias("__d"),
        )
        return (
            scored.groupBy("__id", "__cell")
            .agg(F.min(F.struct(F.col("__d"), F.col("__fcl"))).alias("__m"))
            .select(
                "__id",
                "__cell",
                F.col("__m.__fcl").alias("__fcl"),
                F.col("__m.__d").alias("__d"),
            )
        )

    for _ in range(rounds):
        asn = assign(fine).select("__id", "__cell", "__fcl")
        members = ptsc.join(asn.select("__id", "__fcl"), "__id")
        exploded = members.select(
            "__cell", "__fcl", F.posexplode("__v").alias("__pos", "__val")
        ).select(
            "__cell",
            "__fcl",
            "__pos",
            F.round(F.col("__val") * scale).cast("bigint").alias("__vi"),
        )
        dims = exploded.groupBy("__cell", "__fcl", "__pos").agg(
            F.round(
                F.sum("__vi").cast("double") / F.count(F.lit(1)) / F.lit(float(scale)),
                8,
            ).alias("__mean")
        )
        fine = (
            dims.groupBy("__cell", "__fcl")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("__pos"), F.col("__mean")))
                    ),
                    lambda s: s["__mean"],
                ).alias("__cv")
            )
            .transform(materialize, eager=False)
        )
    final = assign(fine)
    return final.select(
        F.col("__id").alias(id_col),
        (F.col("__cell").cast("bigint") * k_fine + F.col("__fcl")).alias("cluster"),
        F.round("__d", 6).alias("dist"),
    )
