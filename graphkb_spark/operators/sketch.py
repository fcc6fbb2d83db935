"""Sketch-based approximate aggregates with verifiable error bounds.

At 100 TB, exact ``count(DISTINCT)`` and exact quantiles are what you
replace first: exact distinct shuffles every distinct value, exact
quantiles sort. HyperLogLog++ (``approx_count_distinct``) and the
Greenwald-Khanna quantile sketch (``percentile_approx``) are
mergeable, fixed-size, one-pass — the scan-speed path.

Approximate answers are oracle-hostile (two engines' sketches never
hash-match), so these operators use the error-bound-check pattern:
emit the EXACT value alongside a boolean asserting the sketch landed
within its published bound. The boolean is deterministic — HLL is
merge-order-independent (register-max), and GK guarantees rank error
<= 1/accuracy regardless of partitioning — so the oracle simply
computes the exact value and ``TRUE``. The exact side is affordable at
verification scale; in production only the sketch runs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def approx_distinct_with_bound(
    df: DataFrame,
    group: Sequence[str],
    value_col: str,
    rsd: float = 0.05,
    sigmas: float = 3.0,
) -> DataFrame:
    """Per-group HLL++ distinct count, checked against the exact count.

    ``hll_ok`` asserts relative error <= ``sigmas * rsd`` (HLL error is
    ~normal with stddev ``rsd``; 3 sigma is a deterministic-in-practice
    bound for a fixed dataset since HLL itself is deterministic).
    """
    out = df.groupBy(*group).agg(
        F.countDistinct(value_col).alias("exact_distinct"),
        F.approx_count_distinct(value_col, rsd).alias("__approx"),
    )
    rel_err = F.abs(F.col("__approx") - F.col("exact_distinct")) / F.col(
        "exact_distinct"
    )
    return out.select(
        *group,
        "exact_distinct",
        (rel_err <= F.lit(float(sigmas * rsd))).alias("hll_ok"),
    )


def approx_quantiles_with_bound(
    df: DataFrame,
    group: Sequence[str],
    value_col: str,
    quantiles: Sequence[float] = (0.5, 0.95),
    accuracy: int = 10000,
    rank_margin: float = 0.02,
) -> DataFrame:
    """Per-group GK-sketch quantiles, each checked to lie between the
    exact quantiles at ``q -/+ rank_margin`` (GK guarantees rank error
    <= 1/accuracy; the margin leaves headroom for interpolation).

    Output: the exact quantile per requested q (rounded, oracle-able)
    plus ``ok_p<q>`` booleans.
    """
    qs = list(quantiles)
    lo = [max(q - rank_margin, 0.0) for q in qs]
    hi = [min(q + rank_margin, 1.0) for q in qs]
    probs = F.array(*[F.lit(p) for p in qs + lo + hi])

    agg = df.groupBy(*group).agg(
        F.percentile(value_col, probs).alias("__exact"),
        F.percentile_approx(value_col, F.array(*[F.lit(q) for q in qs]), accuracy).alias(
            "__approx"
        ),
    )
    n = len(qs)
    cols = []
    for i, q in enumerate(qs):
        tag = str(q).replace("0.", "p")
        exact = F.col("__exact")[i]
        cols.append(F.round(exact, 6).alias(f"exact_{tag}"))
        ok = (F.col("__approx")[i] >= F.col("__exact")[n + i]) & (
            F.col("__approx")[i] <= F.col("__exact")[2 * n + i]
        )
        cols.append(ok.alias(f"ok_{tag}"))
    return agg.select(*group, *cols)


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """K-minimum-values distinct-count sketch per group (Bar-Yossef et
    al. 2002): hash each value to a deterministic uniform in [0, 1)
    (md5 prefix / 2^32 — identical in any engine), keep the k smallest
    DISTINCT hashes per group, and estimate |D| as (k-1) / u_(k).
    Groups with fewer than k distinct values report the exact count.
    Returns (groups..., n_kept, est_distinct).

    Unlike HLL (engine-specific register layouts), the KMV estimate is
    a pure function of the md5 hashes — an external engine reproduces
    the estimate BIT-FOR-BIT, which is what makes a sketch auditable
    across a heterogeneous pipeline.

    Scale shape: one partial-aggregating distinct on (group, hash) —
    duplicate values collapse map-side, so the shuffle carries at most
    the distinct set — then a per-group ranking window over the
    distinct hashes and a k-row aggregate. The window input is
    cardinality-bounded (same class as the equi-depth histogram); for
    corpus-scale cardinalities use ``kmv_distinct_merged`` below — the
    fixed-k mergeable accumulator with bit-identical estimates."""
    u = (
        F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(float(2**32))
    )
    hashes = df.select(*group_cols, u.alias("__u")).distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("__u").asc())
    topk = hashes.withColumn("__rk", F.row_number().over(w)).filter(
        F.col("__rk") <= k
    )
    return topk.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.round(
            F.when(
                F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
            # the 2^-32 pathological hash u == 0.0 must not ANSI-fail
            # the job; the floor matches the oracle exactly
            ).otherwise(F.lit(k - 1) / F.greatest(F.max("__u"), F.lit(1e-12))),
            4,
        ).alias("est_distinct"),
    )


def kmv_distinct_merged(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """``kmv_distinct`` as a true MERGEABLE accumulator — the 100 TB
    shape the windowed variant's docstring promises: each Arrow batch
    emits its per-group k smallest distinct hashes (numpy partial
    sort), and one partial-aggregating merge keeps the global k
    minima per group. The shuffle carries at most
    O(batches x groups x k) hash rows — never the distinct set, which
    is what breaks the ranking-window variant at corpus-scale
    cardinalities. Bit-identical estimates to ``kmv_distinct`` (same
    md5-uniform hashes, same (k-1)/u_(k) with the zero-hash floor);
    the cross-check test asserts equality."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    u = (
        F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(float(2**32))
    )
    hashed = df.select(*group_cols, u.alias("__u"))
    schema = T.StructType(
        [next(f for f in hashed.schema.fields if f.name == c) for c in group_cols]
        + [T.StructField("__u", T.DoubleType())]
    )

    def partial_topk(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            # dropna=False: a NULL group key is a real group — the
            # Spark-groupBy sibling (kmv_distinct) emits its row, and
            # the bit-identical contract requires this variant to match
            for key, grp in pdf.groupby(list(group_cols), sort=False, dropna=False):
                vals = np.unique(grp["__u"].to_numpy())  # sorted distinct
                keep = vals[:k]
                key = key if isinstance(key, tuple) else (key,)
                key = tuple(None if pd.isna(kv) else kv for kv in key)
                for v in keep:
                    out.append((*key, float(v)))
            yield pd.DataFrame(out, columns=[*group_cols, "__u"])

    partials = hashed.mapInPandas(partial_topk, schema=schema)
    # global merge: distinct (duplicate hashes can reappear across
    # batches), then the k smallest per group — the merged accumulator
    # table is groups x (batches * k) rows at most, so the sort_array
    # over the collected minima is bounded by design
    merged = (
        partials.dropDuplicates([*group_cols, "__u"])
        .groupBy(*group_cols)
        .agg(F.slice(F.array_sort(F.collect_list("__u")), 1, k).alias("__ks"))
    )
    n_kept = F.size("__ks")
    return merged.select(
        *group_cols,
        n_kept.cast("long").alias("n_kept"),
        F.round(
            F.when(n_kept < k, n_kept.cast("double")).otherwise(
                F.lit(k - 1)
                / F.greatest(F.element_at("__ks", k), F.lit(1e-12))
            ),
            4,
        ).alias("est_distinct"),
    )


def count_min_estimate(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-Min sketch frequency estimation (Cormode & Muthukrishnan
    2005): ``depth`` hash rows of ``width`` counters; a key's estimate
    is the MINIMUM of its counters, which over-counts (collisions only
    add) and never under-counts. Returns one row per distinct key:
    (key, est_count, exact_count, cms_ok) with ``cms_ok`` asserting the
    one-sided guarantee est >= exact.

    The sketch is md5-derived and therefore deterministic across
    engines AND across partitionings (counter increments commute), so
    unlike HLL-style sketches the ESTIMATE itself is oracle-checkable,
    not just its error bound.

    Scale shape: the update stream is a ``depth``-way posexplode (a
    narrow map), partially aggregated into at most ``depth x width``
    counter rows — the shuffle carries the SKETCH, never the keys,
    which is the whole point at 100 TB. The per-key probe joins the
    distinct-key table to the (tiny, broadcast-able) counter table;
    exact counts ride the same distinct aggregation. In production
    the probe side is a handful of queried keys; here every key is
    probed so the oracle can verify the full sketch."""
    if depth <= 0 or width <= 0:
        raise ValueError("depth and width must be positive")
    k = F.col(key_col).cast("string")

    def bucket(d: int) -> Column:
        return F.pmod(
            F.conv(F.substring(F.md5(F.concat(F.lit(f"{d}:"), k)), 1, 8), 16, 10)
            .cast("bigint"),
            F.lit(width),
        )

    rows = df.select(
        k.alias("__key"),
        F.explode(
            F.array(*[F.struct(F.lit(d).alias("d"), bucket(d).alias("b"))
                      for d in range(depth)])
        ).alias("__cell"),
    ).select("__key", F.col("__cell.d").alias("d"), F.col("__cell.b").alias("b"))
    counters = rows.groupBy("d", "b").agg(F.count(F.lit(1)).alias("c"))
    keys = (
        df.groupBy(k.alias("__key"))
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    probes = keys.select(
        "__key",
        "exact_count",
        F.explode(
            F.array(*[F.struct(F.lit(d).alias("d"),
                               F.pmod(F.conv(F.substring(F.md5(F.concat(F.lit(f"{d}:"), F.col("__key"))), 1, 8), 16, 10).cast("bigint"), F.lit(width)).alias("b"))
                      for d in range(depth)])
        ).alias("__cell"),
    ).select("__key", "exact_count", F.col("__cell.d").alias("d"), F.col("__cell.b").alias("b"))
    est = (
        probes.join(counters, ["d", "b"])
        .groupBy("__key", "exact_count")
        .agg(F.min("c").alias("est_count"))
    )
    return est.select(
        F.col("__key").alias("key"),
        F.col("est_count").cast("bigint").alias("est_count"),
        F.col("exact_count").cast("bigint").alias("exact_count"),
        (F.col("est_count") >= F.col("exact_count")).alias("cms_ok"),
    )


def kmv_set_similarity(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    label_col: str,
    label_a: str,
    label_b: str,
    k: int = 64,
) -> DataFrame:
    """KMV sketch SET ALGEBRA per group (Beyer et al. 2007, "On
    synopses for distinct-value estimation"): from one pass over rows
    labeled A or B, estimate |A ∪ B|, the Jaccard resemblance, and
    |A ∩ B| — without ever materializing either set. The k smallest
    distinct hashes of the UNION form the union sketch; the fraction of
    those present in both sides estimates Jaccard; intersection =
    jaccard x union. Returns (groups..., n_kept, shared_kept,
    est_union, jaccard_est, est_intersection).

    Like ``kmv_distinct``, the sketch is md5-derived: bit-identical in
    any engine, so the ESTIMATES are oracle-checkable, not just their
    error bounds.

    Scale shape: one partial-aggregating groupBy on (group, hash) with
    two bool-or flags — duplicates collapse map-side, the shuffle
    carries at most the distinct set — then the per-group k-smallest
    ranking window over distinct hashes and a k-row aggregate (the
    kmv_distinct shape; use the merged-accumulator variant's
    mapInPandas partial top-k for corpus-scale cardinalities)."""
    u = (
        F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(float(2**32))
    )
    lab = F.col(label_col)
    flags = (
        df.filter(lab.isin([label_a, label_b]))
        .groupBy(*group_cols, u.alias("__u"))
        .agg(
            F.max((lab == label_a).cast("int")).alias("__a"),
            F.max((lab == label_b).cast("int")).alias("__b"),
        )
    )
    w = Window.partitionBy(*group_cols).orderBy(F.col("__u").asc())
    topk = flags.withColumn("__rk", F.row_number().over(w)).filter(F.col("__rk") <= k)
    n = F.count(F.lit(1))
    est_union = F.when(n < k, n.cast("double")).otherwise(
        F.lit(k - 1) / F.greatest(F.max("__u"), F.lit(1e-12))
    )
    shared = F.sum(F.col("__a") * F.col("__b"))
    jacc = shared / n
    return topk.groupBy(*group_cols).agg(
        n.alias("n_kept"),
        shared.cast("bigint").alias("shared_kept"),
        F.round(est_union, 4).alias("est_union"),
        F.round(jacc, 4).alias("jaccard_est"),
        F.round(jacc * est_union, 4).alias("est_intersection"),
    )


def join_size_estimate(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    sample_mod: int = 16,
) -> DataFrame:
    """Equi-join output-size estimation by deterministic key sampling
    (end-biased / coordinated sampling, Estan & Naughton 2006): the
    join size is sum over keys of fL(k) * fR(k); estimate it from the
    keys whose md5 lands in bucket 0 of ``sample_mod`` — BOTH sides
    sample the SAME keys (coordinated by the hash), so matched
    frequency products survive sampling intact and the estimator is
    unbiased with scale factor ``sample_mod``. The statistic a join
    planner wants before committing 100 TB to a shuffle. Returns one
    row: (sampled_keys, est_join_rows).

    Scale shape: the hash filter prunes ~(1 - 1/mod) of both inputs AT
    THE SCAN (narrow predicate), then two partial-agg key counts and a
    join of two shrunken key tables. Cost is 1/mod of the real join's
    build side, with zero wide rows moved."""
    if sample_mod < 1:
        raise ValueError("sample_mod must be >= 1")

    def sampled_counts(df: DataFrame, key: str) -> DataFrame:
        h = F.pmod(
            F.conv(
                F.substring(F.md5(F.col(key).cast("string")), 1, 8), 16, 10
            ).cast("bigint"),
            F.lit(sample_mod),
        )
        return (
            df.filter(h == 0)
            .groupBy(F.col(key).alias("__k"))
            .agg(F.count(F.lit(1)).alias("__c"))
        )
    lc = sampled_counts(left, left_key)
    rc = sampled_counts(right, right_key)
    prod = lc.join(rc.withColumnRenamed("__c", "__c2"), "__k")
    return prod.agg(
        F.count(F.lit(1)).cast("bigint").alias("sampled_keys"),
        (F.coalesce(F.sum(F.col("__c") * F.col("__c2")), F.lit(0)) * sample_mod)
        .cast("bigint")
        .alias("est_join_rows"),
    )
