"""Interval-overlap (range) join via binning.

A naive overlap join is an inequality join — Spark would fall back to
broadcast-nested-loop (or worse, cartesian) and die at scale. The
bucketed plan here is the standard genomic-interval strategy (the same
shape GenomicRanges/bedtools-on-Spark implementations use, and what a
variant-position overlap against exon/domain annotation needs):

1. explode every interval into the fixed-width bins it covers
   (``F.sequence`` of bin ids — pure Column algebra, no UDF),
2. equi-join on ``(key..., bin)`` — a plain shuffled hash join Catalyst
   and AQE handle like any other,
3. filter to exact overlap (``l_start <= r_end AND r_start <= l_end``),
4. de-duplicate pairs WITHOUT a distinct: a qualifying pair appears in
   every shared bin, so keep it only in the leftmost one —
   ``bin == greatest(l_start_bin, r_start_bin)``. Zero extra shuffle.

Cost: one shuffle per side on (key, bin). Bin width trades fan-out
(rows exploded per interval) against candidate selectivity; intervals
spanning many bins multiply rows linearly, so pick ``bin_size`` near
the median interval length. Long outliers still work — they just fan
out more.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _binned(
    df: DataFrame,
    start: str,
    end: str,
    bin_size: float,
    prefix: str,
    keys: Sequence[str],
) -> DataFrame:
    start_bin = F.floor(F.col(start) / F.lit(bin_size))
    end_bin = F.floor(F.col(end) / F.lit(bin_size))
    return df.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"{prefix}{c}") for c in df.columns if c not in keys],
        start_bin.alias(f"{prefix}_start_bin"),
        F.explode(F.sequence(start_bin, end_bin)).alias("__bin"),
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_range: tuple[str, str],
    right_range: tuple[str, str],
    on: Sequence[str] = (),
    bin_size: float = 1000.0,
    how: str = "inner",
) -> DataFrame:
    """Join rows whose ``[start, end]`` intervals overlap (closed
    bounds), optionally also matching equality keys ``on``.

    Column collisions are disambiguated as ``l_<col>`` / ``r_<col>``;
    equality keys keep their names. ``how`` supports only ``inner``
    (the scalable shape; emulate left-outer with an anti-join on the
    result if needed).
    """
    if how != "inner":
        raise ValueError("range_join supports how='inner' only")
    on = list(on)
    ls, le = left_range
    rs, re_ = right_range

    lb = _binned(left, ls, le, bin_size, "l_", on)
    rb = _binned(right, rs, re_, bin_size, "r_", on)

    joined = lb.join(rb, on=on + ["__bin"], how="inner")
    overlap = (F.col(f"l_{ls}") <= F.col(f"r_{re_}")) & (
        F.col(f"r_{rs}") <= F.col(f"l_{le}")
    )
    first_shared_bin = F.col("__bin") == F.greatest(
        F.col("l__start_bin"), F.col("r__start_bin")
    )
    return joined.filter(overlap & first_shared_bin).drop(
        "__bin", "l__start_bin", "r__start_bin"
    )


def overlap_length(
    l_start: Column, l_end: Column, r_start: Column, r_end: Column
) -> Column:
    """Length of the intersection of two closed intervals (>= 0)."""
    return F.greatest(
        F.least(l_end, r_end) - F.greatest(l_start, r_start), F.lit(0)
    )


def auto_bin_size(
    df: DataFrame,
    start: str,
    end: str,
    quantile: float = 0.5,
    floor: float = 1.0,
) -> float:
    """Measure, don't guess: the bin width that balances the range-join
    fan-out/selectivity trade is the MEDIAN interval length (a narrow
    interval joined at a huge bin scans everything in the bin; a wide
    one at a tiny bin explodes into thousands of rows). One
    ``approx_percentile`` aggregation (a mergeable sketch — single
    scan, no sort) over the interval lengths; the result only tunes
    the PHYSICAL plan, so any value preserves join results exactly."""
    row = df.select(
        F.percentile_approx(
            F.col(end).cast("double") - F.col(start).cast("double"),
            F.lit(quantile),
        ).alias("q")
    ).first()
    return max(float(row["q"] or floor), floor)


def range_join_auto(
    left: DataFrame,
    right: DataFrame,
    left_range: tuple[str, str],
    right_range: tuple[str, str],
    on: Sequence[str] = (),
    how: str = "inner",
) -> DataFrame:
    """``range_join`` with the bin width measured from the data: the
    median interval length of the LEFT side (usually the bigger,
    finer-grained side — variants against annotation spans). Two jobs:
    the percentile probe, then the join; results are identical to any
    fixed ``bin_size``."""
    return range_join(
        left,
        right,
        left_range,
        right_range,
        on=on,
        bin_size=auto_bin_size(left, *left_range),
        how=how,
    )
