"""Bloom-filter runtime pre-filtering for selective joins.

The 100 TB join problem this solves: a big fact table joins a small,
heavily-filtered dimension, and most fact rows match nothing — but a
shuffle join still shuffles ALL of them, paying the full exchange for
rows that are dropped on arrival. Engines inject runtime bloom
filters for exactly this (Spark's own ``InjectRuntimeFilter`` does it
when statistics allow); this operator is the explicit, always-on
version for when the optimizer can't see the selectivity — e.g. the
build side comes out of a REST prefetch or a computed key set.

The filter is a plain bit array built with md5-derived positions, so
it is deterministic across engines and partitionings. Bloom filters
have NO false negatives: the post-filter exact join returns exactly
the rows the plain join would, which is what the oracle checks — the
bloom machinery changes the plan, never the answer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """The ``num_hashes`` deterministic bit positions for a key."""
    return [
        F.pmod(
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"bloom{h}:"), key)), 1, 8), 16, 10
            ).cast("bigint"),
            F.lit(num_bits),
        )
        for h in range(num_hashes)
    ]


def bloom_prefilter_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    num_bits: int = 16384,
    num_hashes: int = 3,
) -> DataFrame:
    """Inner-join ``big`` to ``small`` with a bloom pre-filter on the
    big side: build a ``num_bits``-bit filter from the small side's
    keys, drop big rows that cannot match as a NARROW scan-speed
    predicate (pure column algebra, zero shuffle of the big side), then
    run the exact join on the survivors. Result is identical to the
    plain inner join (no false negatives); false positives only cost a
    little extra join input.

    The bitmap is ``num_bits / 64`` longs on the driver — 2 KiB at the
    default — the same bounded-driver-state class as the prefetch key
    lists (S14). Build-side distinct positions are at most
    ``num_bits``, so the collect is capped regardless of build-side row
    count; callers with build sides too big for ``num_bits`` bits
    should raise ``num_bits`` (the filter degrades to all-ones and the
    join silently becomes the plain join — still correct)."""
    if num_bits % 64 != 0:
        raise ValueError("num_bits must be a multiple of 64")
    skey = F.col(small_key).cast("string")
    pos_rows = (
        small.select(F.explode(F.array(*_positions(skey, num_bits, num_hashes))).alias("p"))
        .distinct()
        .collect()
    )
    words = [0] * (num_bits // 64)
    for r in pos_rows:
        words[r.p // 64] |= 1 << (r.p % 64)
    # signed-long literal array (Spark longs are signed; bit 63 wraps)
    lit_words = F.array(
        *[F.lit(w - (1 << 64) if w >= (1 << 63) else w).cast("long") for w in words]
    )
    bkey = F.col(big_key).cast("string")
    hit = F.lit(True)
    for p in _positions(bkey, num_bits, num_hashes):
        word = F.element_at(lit_words, (p / 64).cast("int") + 1)
        # F.shiftright only takes a literal shift; the SQL function
        # accepts a column
        shifted = F.call_function("shiftright", word, (p % 64).cast("int"))
        hit = hit & (shifted.bitwiseAND(F.lit(1)) == 1)
    survivors = big.filter(hit)
    return survivors.join(small, survivors[big_key] == small[small_key])
