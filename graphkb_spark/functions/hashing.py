"""Deterministic surrogate ids (reference: ``hashRecordToId``,
src/util.js:186-193 — md5 of json-stable-stringify on a picked property
subset; used src/oncokb/index.js:538-541, src/cosmic/fusions.js:143-151).

``json-stable-stringify`` sorts object keys, so the Spark equivalent
must build the JSON from key-sorted columns. All JVM-side (md5 +
to_json are codegen'd) — no UDF, scales linearly with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# json-stable-stringify serializes null fields ({"a":null}); Spark's
# to_json drops them by default, which would make ids diverge from
# reference hashRecordToId whenever a picked property is null (e.g.
# sourceIdVersion: null). Remaining caveats vs the reference: JSON
# number formatting and string escaping must agree (they do for the
# ASCII ids/names used as natural keys).
_JSON_OPTS = {"ignoreNullFields": "false"}


def stable_hash_id(*cols: str | Column) -> Column:
    """md5 over the key-sorted JSON of the named columns.

    Columns given as strings are embedded under their own name; the
    names are sorted to replicate json-stable-stringify.
    """
    named = sorted(c for c in cols if isinstance(c, str))
    if len(named) != len(cols):
        raise ValueError("stable_hash_id takes column *names* so it can key-sort them")
    return F.md5(F.to_json(F.struct(*[F.col(c).alias(c) for c in named]), _JSON_OPTS))


def stable_hash_named(**named: str | Column) -> Column:
    """``stable_hash_id`` for computed columns: each kwarg is a JSON
    field; keys are sorted like json-stable-stringify."""
    items = sorted(named.items())
    fields = [
        (F.col(c) if isinstance(c, str) else c).alias(k) for k, c in items
    ]
    return F.md5(F.to_json(F.struct(*fields), _JSON_OPTS))


def content_fingerprint(col: str, n: int = 64) -> Column:
    """md5-based rolling-window document fingerprint: hash every
    ``n``-char shingle of the column to its first 16 md5 hex chars,
    keep the lexicographic min (== numeric min at fixed hex width) — a
    cheap 1-value MinHash usable as a near-dup prefilter. JVM-side only
    (higher-order array functions), no UDF, and ANSI-SQL-replicable so
    an external oracle can verify the signature exactly."""
    shingles = F.expr(
        f"transform(sequence(1, greatest(1, length({col}) - {n} + 1)),"
        f" i -> substring(md5(substring({col}, i, {n})), 1, 16))"
    )
    return F.array_min(shingles)
