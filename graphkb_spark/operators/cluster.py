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
