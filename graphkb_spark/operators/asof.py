"""Temporal as-of join — for each left row, the most recent right row
with ``right_time <= left_time`` on the same key (``direction
='backward'``; ``'forward'`` gives the earliest right row at-or-after).

The classic formulation is an inequality join (quadratic per key); the
scalable Spark plan used here is the union + window trick:

1. union left and right with a ``side`` tag; right rows carry their
   payload packed into ONE struct column (null on left rows),
2. ONE window ``last(payload_struct, ignorenulls=True)`` ordered by
   ``(time, side, tie_break)`` partitioned by key carries the latest
   right row forward onto every left row,
3. filter back to left rows and unpack the struct.

That is a single shuffle on the join key — the same cost as an
equi-join — and it never materializes per-key cross products, so it
survives keys with millions of rows on both sides. Skewed keys behave
like any other window (AQE handles partition sizing); nothing is
buffered beyond the running ``last()`` state.

Packing the payload into one struct guarantees all returned columns
come from the SAME right row even when individual payload values are
null. Same-instant right duplicates are resolved deterministically:
the sort places the greatest ``tie_break`` last among equal
timestamps, so it is the one carried — semantics DuckDB's ``ASOF
JOIN`` leaves unspecified (dedup the right side per (key, time) when
comparing against it).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    payload: Sequence[str],
    tie_break: str | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """As-of join ``left`` to ``right`` on key ``on``.

    Returns every ``left`` row (left-join semantics) plus ``asof_time``
    (the matched right timestamp, null when no match) and each right
    ``payload`` column as ``asof_<name>``. ``tolerance_seconds`` nulls
    out matches further than the tolerance from the left timestamp.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    payload = list(payload)
    left_cols = list(left.columns)

    match_type = T.StructType(
        [T.StructField("t", right.schema[right_time].dataType)]
        + [T.StructField(c, right.schema[c].dataType) for c in payload]
    )
    tb = F.col(tie_break) if tie_break is not None else F.lit(0)

    l_tagged = left.select(
        *[F.col(c) for c in on],
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__tb"),
        *[F.col(c).alias(f"__l_{c}") for c in left_cols],
        F.lit(None).cast(match_type).alias("__match"),
    )
    r_tagged = right.select(
        *[F.col(c) for c in on],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        tb.cast("long").alias("__tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in left_cols],
        F.struct(
            F.col(right_time).alias("t"), *[F.col(c) for c in payload]
        ).alias("__match"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    # backward: ascending time; right rows (side 0) sort before left rows
    # at the same instant, so a right row AT left_time is eligible
    # (<= semantics). Among same-instant right rows the greatest
    # tie_break sorts last and is the one carried by last().
    # forward: descending time gives the mirror (>= semantics, the
    # EARLIEST right row at-or-after is the last one seen).
    t_key = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(t_key, F.col("__side").asc(), F.col("__tb").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, 0)
    )

    carried = unioned.withColumn(
        "__m", F.last("__match", ignorenulls=True).over(w)
    ).filter(F.col("__side") == 1)

    m = F.col("__m")
    if tolerance_seconds is not None:
        gap = F.abs(F.col("__t").cast("double") - m["t"].cast("double"))
        m = F.when(m.isNotNull() & (gap <= F.lit(float(tolerance_seconds))), m)

    return carried.select(
        *[F.col(f"__l_{c}").alias(c) for c in left_cols],
        m["t"].alias("asof_time"),
        *[m[c].alias(f"asof_{c}") for c in payload],
    )


def interpolate_at(
    data: DataFrame,
    probes: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Linear interpolation of a per-key time series at probe
    timestamps — the temporal-alignment step that joins sensors /
    metrics sampled on different clocks (the two-sided sibling of the
    as-of join, which only looks backward). For each probe (key, ts):
    the value lerped between the surrounding observations,
    the observation itself at an exact hit, and NULL outside the
    observed range. Returns (key, ts, value_interp, method) with
    method in ('exact', 'lerp', NULL).

    Scale shape: probes and observations UNION into one stream, ONE
    shuffle on the key, and two frame-bounded windows (last
    observation at-or-before, first at-or-after) — never a range
    self-join (quadratic in observations x probes per key). The lerp
    is two correctly-rounded IEEE ops on an exact microsecond time
    base, rounded at the output, so any engine agrees."""
    obs = data.select(
        F.col(key_col).alias("__k"),
        F.col(ts_col).alias("__ts"),
        F.col(value_col).cast("double").alias("__v"),
        F.lit(1).alias("__is_obs"),
    )
    pr = probes.select(
        F.col(key_col).alias("__k"),
        F.col(ts_col).alias("__ts"),
        F.lit(None).cast("double").alias("__v"),
        F.lit(0).alias("__is_obs"),
    )
    # observations sort BEFORE a same-timestamp probe so both frames
    # see an exact hit; __is_obs desc makes the order total with ties
    both = obs.unionByName(pr)
    # __v tiebreak makes the order total when duplicate-timestamp
    # observations exist (probes carry null __v; nulls sort first and
    # duplicate probes are identical rows anyway)
    order = [F.col("__ts").asc(), F.col("__is_obs").desc(), F.col("__v").asc()]
    w_back = (
        Window.partitionBy("__k").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("__k").orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    ov = F.when(F.col("__is_obs") == 1, F.col("__v"))
    ot = F.when(F.col("__is_obs") == 1, F.unix_micros(F.col("__ts")))
    marked = (
        both.withColumn("__pv", F.last(ov, ignorenulls=True).over(w_back))
        .withColumn("__pt", F.last(ot, ignorenulls=True).over(w_back))
        .withColumn("__nv", F.first(ov, ignorenulls=True).over(w_fwd))
        .withColumn("__nt", F.first(ot, ignorenulls=True).over(w_fwd))
        .filter(F.col("__is_obs") == 0)
    )
    t = F.unix_micros(F.col("__ts"))
    frac = (t - F.col("__pt")) / (F.col("__nt") - F.col("__pt"))
    lerp = F.col("__pv") + frac * (F.col("__nv") - F.col("__pv"))
    exact = F.col("__pt") == t
    return marked.select(
        F.col("__k").alias(key_col),
        F.col("__ts").alias(ts_col),
        F.round(
            F.when(exact, F.col("__pv")).otherwise(
                F.when(
                    F.col("__pt").isNotNull() & F.col("__nt").isNotNull(), lerp
                )
            ),
            6,
        ).alias("value_interp"),
        F.when(exact, F.lit("exact"))
        .when(F.col("__pt").isNotNull() & F.col("__nt").isNotNull(), F.lit("lerp"))
        .alias("method"),
    )


def gap_fill(
    data: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int = 3600,
) -> DataFrame:
    """Regularize a per-key time series onto a fixed grid with
    forward-fill: for each key, emit one row per ``step_seconds`` tick
    from its first observation's bucket to its last, carrying the most
    recent observed value at-or-before the tick. Returns (key,
    grid_ts, value_filled, is_observed) — ``is_observed`` marks ticks
    whose bucket contains at least one observation. The resample/
    gap-fill primitive under rolling features and downsampled charts.

    Scale shape: a per-key span aggregation (one shuffle, two-column
    output), a NARROW ``explode(sequence(...))`` grid — never a
    generate-then-join against a global calendar table — then grid and
    observations UNION into one stream with a single keyed window doing
    the forward fill (the interpolate_at pattern: one shuffle, no
    range self-join). Grid size is data-bounded: a key spanning a year
    at hourly steps is 8,760 rows, independent of its observation
    count.

    Ordering runs on the exact MICROSECOND time base (the
    interpolate_at lesson): sub-second observations tie-break
    identically in any engine, so the fill is bit-deterministic."""
    k = F.col(key_col)
    step = F.lit(int(step_seconds))
    us = F.unix_micros(F.col(ts_col))
    step_us = F.lit(int(step_seconds) * 1_000_000)
    bucket = (F.floor(us / step_us) * step).cast("long")  # bucket start, seconds
    obs = data.select(
        k.alias("__k"),
        bucket.alias("__g"),
        us.alias("__ts"),
        F.col(value_col).cast("double").alias("__v"),
        F.lit(1).alias("__is_obs"),
    )
    spans = obs.groupBy("__k").agg(
        F.min("__g").alias("__lo"), F.max("__g").alias("__hi")
    )
    grid = spans.select(
        "__k",
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"), step)).alias("__g"),
    ).select(
        "__k",
        "__g",
        # tick sits at the last micro of its bucket, AFTER in-bucket obs
        ((F.col("__g") + step) * F.lit(1_000_000) - 1).alias("__ts"),
        F.lit(None).cast("double").alias("__v"),
        F.lit(0).alias("__is_obs"),
    )
    both = obs.unionByName(grid)
    # total order: time, then observations before the tick row at the
    # bucket edge, then value (duplicate-timestamp observations)
    order = [F.col("__ts").asc(), F.col("__is_obs").desc(), F.col("__v").asc()]
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ov = F.when(F.col("__is_obs") == 1, F.col("__v"))
    oo = F.when(F.col("__is_obs") == 1, F.col("__g"))
    filled = (
        both.withColumn("__fv", F.last(ov, ignorenulls=True).over(w))
        .withColumn("__fg", F.last(oo, ignorenulls=True).over(w))
        .filter(F.col("__is_obs") == 0)
    )
    return filled.select(
        F.col("__k").alias(key_col),
        F.timestamp_seconds(F.col("__g")).alias("grid_ts"),
        F.col("__fv").alias("value_filled"),
        (F.col("__fg") == F.col("__g")).alias("is_observed"),
    )
