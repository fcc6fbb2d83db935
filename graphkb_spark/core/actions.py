"""Benchmark-grade actions: force FULL evaluation of a DataFrame.

``df.count()`` is NOT a full-plan action. Catalyst optimizes the count
aggressively and legally: final projections are column-pruned (an
expensive expression in the last ``select`` never runs), and
``EliminateOuterJoin`` + column pruning remove a trailing left join
whose right side has provably-unique keys (every groupBy-aggregate
fill-in join in this package) — for those shapes ``count()`` degrades
to counting the LEFT side and the entire probe/aggregate pipeline is
skipped. Round 14 caught this live: ``benchmark_leak_report.count()``
at a 30x corpus measured 0.6 s / 0.07 MB shuffle because the corpus
probe never ran, while the value-hash oracle run of the same query
does full work. Numbers measured that way are floors of the harness,
not measurements of the plan — and they are unfair against a DuckDB
oracle that fully materializes its result.

``consume(df)`` is the honest action shared by bench.py,
tools/ab_bench.py (self-contained copy — it must not import from the
tree under test) and tools/scale_probe.py: ONE aggregate that hashes
EVERY output column of every row (xxhash64; map-typed columns go
through to_json first, since Spark cannot hash maps) and returns the
row count. Consuming the hash makes every column load-bearing, so no
projection, join, or window upstream can be pruned; the added per-row
hash is nanoseconds against the I/O it forces. The same trick DuckDB
comparisons already rely on (the oracle harness fetches full result
sets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _contains_map(dt: T.DataType) -> bool:
    """True iff the type has a MapType anywhere inside it — xxhash64
    cannot hash maps at any nesting depth, so those columns detour
    through to_json. Structural check, not a substring test on
    simpleString(): a struct FIELD merely named 'mapping' must not be
    routed through to_json (ADVICE r14)."""
    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def consume(df: DataFrame) -> int:
    """Fully evaluate ``df`` — every row, every column — and return
    the row count. See module docstring for why ``count()`` is not
    equivalent.

    Requires pyspark >= 3.5 (``F.bit_xor``). A zero-column frame has
    nothing to prune, so plain count() IS the full plan there — and
    ``xxhash64()`` with no args raises, so it is also the only option
    (ADVICE r14)."""
    if not df.schema.fields:
        return df.count()
    cols = [
        F.xxhash64(F.to_json(F.col(f.name)))
        if _contains_map(f.dataType)
        else F.col(f.name)
        for f in df.schema.fields
    ]
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        # bit_xor, not sum: a sum of 2^63-scale hashes overflows under
        # ANSI mode; XOR is closed over int64 and just as load-bearing
        F.bit_xor(F.xxhash64(*cols)).alias("h"),
    ).collect()[0]
    return row["n"]
