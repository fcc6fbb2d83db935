"""Batch statement reconciliation (reference ``contentMatching``,
src/civic/statement.js:56-178 — SURVEY §2.4 J9 / §2.9.2).

Per natural group (the reference groups by ``sourceId``), diff the new
batch against the stored rows:

1. exact match on the full content key -> update candidates;
2. leftover-vs-leftover match on a weaker key (the reference uses
   ``subject`` alone) — paired positionally within the weak key;
3. remaining leftovers paired positionally ("artificial" pairing,
   src/civic/statement.js:150-175) — deterministic here via row_number
   over an explicit ordering;
4. unpaired new rows -> create; unpaired stored rows -> delete.

Spark shape — **join-free linear pipeline**: both sides are unioned
once with a ``side`` tag; each matching tier is ONE window exchange
over the co-partitioned union.  All window functions of a tier share
the same partitioning ``(group, bucket-key)``: a ``row_number`` ordered
by ``(side, order)`` enumerates stored rows first, so the per-side
positional rank is ``rn`` for stored and ``rn - count(stored)`` for new
rows, and the per-side bucket counts come from unbounded-frame
``count(when(...))`` over the same partition — Spark plans all of it
behind a single hash exchange (same partition keys ⇒ one Exchange, the
unordered counts ride the sorted child).  A row is matched at tier *k*
iff ``rank <= least(count_stored, count_new)`` in its bucket; a single
final groupBy on the pairing key zips the matched stored/new rows
together.  Since round 17, ONE up-front exchange on the group key
serves all three tiers (hash-partitioning on a subset of a window's
partition keys satisfies its clustering requirement, so each tier
adds only a Sort) — total 2 exchanges (group repartition + pairing
aggregation), no full-outer joins, no persists, no plan fan-out — so
the operator scales linearly in data volume and its one data shuffle
is keyed by the group key (fine-grained in the reference usage).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from graphkb_spark.operators.skew import exchange_width

RECONCILE_ACTION = "_action"


def reconcile(
    stored: DataFrame,
    batch: DataFrame,
    group_key: Sequence[str],
    strong_key: Sequence[str],
    weak_key: Sequence[str],
    order: Sequence[str],
    id_col: str,
) -> DataFrame:
    """Classify every batch/stored row into ``_action`` in
    {update, create, delete}; updates carry the stored ``id_col`` onto
    the new row's content (the reference PATCHes the stored rid with
    the new content).

    ``strong_key``/``weak_key`` are content keys *within* ``group_key``;
    ``order`` makes positional pairing deterministic (``id_col`` is the
    final tiebreaker).
    """
    cols = list(batch.columns)
    gcols = [F.col(c) for c in group_key]
    order_cols = [F.col(c).asc_nulls_last() for c in order] + [F.col(id_col).asc_nulls_last()]

    # tier bucket keys are raw STRUCTS, not digests (r17): the window
    # only needs equality/ordering on the key, which struct columns
    # give natively — computing md5(to_json(...)) per row per tier was
    # the hot stage's dominant CPU (9.4 s over 75 k union rows at
    # sf0.1, profiled). The serialized form is needed only in the
    # __pair id of rows that actually MATCH, where a plain to_json
    # (no md5) is evaluated lazily inside the when() branch. Callers'
    # key columns must be hashable types (atomics/structs/arrays —
    # not maps), which both in-repo callers satisfy.
    def tier_struct(keys: Sequence[str]) -> F.Column:
        return F.struct(*[F.col(c) for c in keys])

    u = stored.select(*cols, F.lit(0).alias("__side")).unionByName(
        batch.select(*cols, F.lit(1).alias("__side"))
    )
    u = u.withColumn("__tier", F.lit(None).cast("int")).withColumn(
        "__pair", F.lit(None).cast("string")
    )
    # ONE exchange for all three tiers (guide §2.4): hash-partitioning
    # on the group key alone satisfies every tier window's
    # ClusteredDistribution((group, __k)) requirement (a partitioning
    # whose expressions are a subset of the clustering keys clusters
    # them too), so EnsureRequirements inserts only per-tier Sorts
    # below — 3 window exchanges collapse to this single one.  The
    # partitioning is coarser than (group, tier-key): all rows of one
    # group land in one partition, which is the right trade wherever
    # the group key is fine-grained (the reference groups by per-item
    # sourceId — high cardinality, bounded group size).  A corpus
    # whose single largest group outgrows a task would want the
    # per-tier (group, __k) exchanges back — that is the shape this
    # replaced, not a new requirement.  The partition count is pinned
    # (explicit N is exempt from AQE byte-coalescing) because the
    # fused downstream stage is CPU-dense — three tier-key sorts and
    # the window counts run behind this one exchange, and byte-based
    # coalescing of the ~MB-scale exchange would serialize those CPU
    # seconds onto a handful of cores (measured: 4 tasks / 2.4 s CPU
    # at sf0.1 when left to AQE).  Width follows
    # max(defaultParallelism, shuffle.partitions) so a deployment that
    # sizes shuffle.partitions to its data keeps fine-grained
    # partitions here too — a cores-wide pin at 100 TB would mean
    # multi-GB partitions and spill (opt r18, guide §5); locally the
    # two values are equal, so the plan is unchanged.
    u = u.repartition(exchange_width(u), *gcols)

    # tier key columns; identical strong/weak keys would re-rank the
    # pass-1 leftovers within the same buckets (each bucket's minority
    # side is already exhausted), so the pass is skipped
    tiers: list[tuple[int, F.Column]] = [(1, tier_struct(strong_key))]
    if list(strong_key) != list(weak_key):
        tiers.append((2, tier_struct(weak_key)))
    tiers.append((3, F.lit("")))

    for tier, key_col in tiers:
        # matched rows get a NULL bucket key -> they fall out of every
        # unmatched bucket and the window counts below see only live rows
        u = u.withColumn("__k", F.when(F.col("__tier").isNull(), key_col))
        # one exchange: both specs hash-partition on (group, __k); the
        # ordered row_number enumerates side 0 (stored) before side 1
        # (new), so subtracting the stored count recovers the per-side
        # rank without a second (group, __k, __side) exchange
        w_ord = Window.partitionBy(*gcols, "__k").orderBy(
            F.col("__side").asc(), *order_cols
        )
        w_key = Window.partitionBy(*gcols, "__k")
        u = (
            u.withColumn("__rn", F.row_number().over(w_ord))
            .withColumn("__cs", F.count(F.when(F.col("__side") == 0, 1)).over(w_key))
            .withColumn("__cn", F.count(F.when(F.col("__side") == 1, 1)).over(w_key))
            .withColumn(
                "__r",
                F.when(F.col("__side") == 0, F.col("__rn")).otherwise(
                    F.col("__rn") - F.col("__cs")
                ),
            )
        )
        newly = (
            F.col("__tier").isNull()
            & F.col("__k").isNotNull()
            & (F.col("__r") <= F.least("__cs", "__cn"))
        )
        # serialized bucket key, only for rows that match this tier
        pair_key = F.to_json(F.col("__k")) if tier < 3 else F.col("__k")
        u = u.withColumn(
            "__pair",
            F.when(
                newly,
                F.concat_ws("", F.lit(str(tier)), *gcols, pair_key, F.col("__r")),
            ).otherwise(F.col("__pair")),
        ).withColumn("__tier", F.when(newly, F.lit(tier)).otherwise(F.col("__tier")))

    # unmatched rows pair with themselves (unique key per row+side)
    u = u.withColumn(
        "__pair",
        F.coalesce(
            F.col("__pair"),
            F.concat_ws("", F.lit("u"), F.col("__side"), F.col(id_col)),
        ),
    )

    paired = u.groupBy("__pair").agg(
        F.max(F.when(F.col("__side") == 0, F.struct(*cols))).alias("__s"),
        F.max(F.when(F.col("__side") == 1, F.struct(*cols))).alias("__n"),
    )
    has_s = F.col("__s").isNotNull()
    has_n = F.col("__n").isNotNull()
    # updates = new content + stored id; creates = new row; deletes = stored row
    out_cols = [
        (
            F.when(has_s, F.col(f"__s.{c}")).otherwise(F.col(f"__n.{c}"))
            if c == id_col
            else F.when(has_n, F.col(f"__n.{c}")).otherwise(F.col(f"__s.{c}"))
        ).alias(c)
        for c in cols
    ]
    action = (
        F.when(has_s & has_n, F.lit("update"))
        .when(has_n, F.lit("create"))
        .otherwise(F.lit("delete"))
        .alias(RECONCILE_ACTION)
    )
    return paired.select(*out_cols, action)


def survivorship_merge(
    df: DataFrame,
    cluster_col: str,
    mode_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
) -> DataFrame:
    """Entity-resolution SURVIVORSHIP: build one golden record per
    cluster by merging fields across the cluster's rows — the step
    after matching/clustering that the reference performs implicitly
    when it updates a matched record field-by-field
    (src/graphkb.js:239-262 shouldUpdate); here it is explicit, with
    per-field strategies: ``mode_cols`` take the most frequent
    non-null value (ties break on the value ascending — deterministic,
    unlike a bare ``mode()``), ``max_cols``/``min_cols`` take the
    extreme. Returns one row per cluster.

    Scale shape: every strategy is an algebraic aggregate with
    map-side partials. The deterministic mode is
    ``min_by(value, (-count, value))`` over a pre-counted
    (cluster, value) table — two keyed aggregations per mode column,
    joined back on the cluster key (cluster-cardinality-sized
    tables; AQE picks the join build). No windows over raw rows."""
    aggs: list[Column] = []
    for c in max_cols:
        aggs.append(F.max(c).alias(c))
    for c in min_cols:
        aggs.append(F.min(c).alias(c))
    base = (
        df.groupBy(cluster_col).agg(*aggs)
        if aggs
        else df.select(cluster_col).distinct()
    )
    out = base
    for c in mode_cols:
        counts = (
            df.filter(F.col(c).isNotNull())
            .groupBy(cluster_col, c)
            .agg(F.count(F.lit(1)).alias("__n"))
        )
        pick = counts.groupBy(cluster_col).agg(
            F.min_by(
                F.col(c),
                F.struct((-F.col("__n")).alias("a"), F.col(c).alias("b")),
            ).alias(c)
        )
        out = out.join(pick, cluster_col, "left")
    return out
