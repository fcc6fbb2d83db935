"""Multi-dimensional data-layout clustering (Z-order / Morton curves).

At 100 TB the scan cost of a query is decided before it runs — by how
the data was LAID OUT when written. Sorting by one column prunes
predicates on that column only; interleaving the bits of two columns
(the Z-order curve Delta/Iceberg/Databricks use for OPTIMIZE ZORDER
BY) gives every interleaved column partial pruning power. These
operators compute the Morton index as pure Column algebra (64-bit
safe, JVM codegen) and report the per-file-bucket min/max ranges —
exactly the statistics a format's data-skipping index would hold, so
the clustering benefit is measurable as range tightness.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def morton_interleave(x: Column, y: Column, bits: int = 16) -> Column:
    """Bit-interleave two non-negative integer columns (x in even bit
    positions, y in odd) into a single Z-value. ``bits`` per input, so
    the result uses 2 x bits <= 62 bits. Inputs are masked to
    ``bits`` bits (callers quantize first). Pure shift/mask algebra —
    whole-stage-codegen friendly, no UDF."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    xm = x.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
    ym = y.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(xm, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(ym, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zorder_layout_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 16,
    n_buckets: int = 256,
) -> DataFrame:
    """Assign every row to its Z-order file bucket (top bits of the
    Morton index — the write path would range-partition on the
    z-value into ``n_buckets`` files) and report per-bucket row count
    and min/max of BOTH dimensions — the data-skipping statistics that
    show the layout's pruning power: tight per-bucket ranges on both
    columns mean a predicate on either prunes most buckets.

    Scale shape: the z-value is a narrow projection at scan speed; the
    stats are ONE partial-agg shuffle with ``n_buckets`` output rows.
    The actual reorganizing write at 100 TB is
    ``repartitionByRange(z)`` + write — the stats here are the audit
    of what that write would achieve."""
    x = F.col(x_col).cast("bigint")
    y = F.col(y_col).cast("bigint")
    z = morton_interleave(x, y, bits)
    shift = max(0, 2 * bits - (n_buckets - 1).bit_length())
    bucket = F.shiftright(z, shift)
    return (
        df.select(
            bucket.alias("bucket"),
            x.alias("__x"),
            y.alias("__y"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("__x").alias("x_min"),
            F.max("__x").alias("x_max"),
            F.min("__y").alias("y_min"),
            F.max("__y").alias("y_max"),
        )
    )


def compaction_plan(
    files: DataFrame,
    part_col: str,
    file_col: str,
    size_col: str,
    target_bytes: int,
) -> DataFrame:
    """Small-file compaction planner: within each partition, pack files
    (in deterministic (size desc, file) order) into output bins of
    ~``target_bytes`` by running-total assignment — bin =
    floor(cum_before / target). The maintenance pass every streaming
    landing zone needs: micro-batch writes leave thousands of KB-scale
    files per partition, and scan cost at 100 TB is dominated by file
    count, not bytes. Returns (part, file, size, bin, bin_bytes).

    Running-total packing overfills a bin by at most one file (vs
    first-fit-decreasing's optimality gap) but is a pure prefix sum —
    ONE shuffle on the partition key, one ordered window, no driver
    loop over files. Deterministic: reruns produce the identical plan,
    so a failed compaction job is safely re-entrant."""
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    w = Window.partitionBy(part_col).orderBy(
        F.col(size_col).desc(), F.col(file_col).asc()
    )
    cum_before = F.coalesce(
        F.sum(size_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    planned = files.select(
        F.col(part_col),
        F.col(file_col),
        F.col(size_col),
        F.floor(cum_before / target_bytes).cast("int").alias("bin"),
    )
    wb = Window.partitionBy(part_col, "bin")
    return planned.withColumn("bin_bytes", F.sum(size_col).over(wb))
