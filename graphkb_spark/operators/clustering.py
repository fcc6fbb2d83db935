"""Distributed k-means training (Lloyd's algorithm, fixed rounds).

Semantic clustering is how a training-data pipeline diversifies a
mixture (cluster-balanced sampling) and prunes semantic near-dups at
corpus scale; ``kmeans_assign`` (operators/similarity.py family)
covers inference against given centroids — this module TRAINS them,
deterministically, in pure DataFrame algebra:

- init: the k points with the smallest md5(id) — content-free,
  engine-reproducible, no RNG;
- assign: broadcast the k-row centroid table against the point scan,
  distance by the sequential-fold euclidean (bit-identical to an
  external engine's list_distance), argmin with cluster-id
  tie-breaks;
- update: centroid means over integer-scaled components (round(val *
  1e9) as int64), so the per-cluster sums are EXACT and
  partitioning-independent — the float-sum-order trap that makes
  naive distributed k-means non-reproducible is closed. Means are
  rounded to 8 digits, so every round's centroids are bit-identical
  in any engine and the whole training run is oracle-checkable.

Scale shape: point vectors are repartitioned by id ONCE and
checkpointed; each round shuffles only (id, dist, cluster) triples
for the argmin and (cluster, dim, int) triples for the update — the
wide vector column never re-enters an exchange. Per-round state is a
k-row DataFrame kept distributed (broadcast at use), never collected.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphkb_spark.core.materialize import materialize


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
    hh = F.conv(
        F.substring(F.md5(F.col("__id").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
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
    final = assign(centroids)
    return final.select(
        F.col("__id").alias(id_col),
        F.col("__cl").alias("cluster"),
        F.round("__d", 6).alias("dist"),
    )
