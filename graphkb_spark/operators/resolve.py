"""Entity-resolution operators: preference-ranked unique lookup and
fallback-cascade joins.

Reference semantics:
- ``getUniqueRecordBy`` (src/graphkb.js:395-419): equi-filter; error if
  0 rows; if >1, sort by a preference comparator and require a *strict*
  winner (src/graphkb.js:410-413), else error.
- ``orderPreferredOntologyTerms`` (src/graphkb.js:133-196): the
  comparator — deprecated last, alias last, dependency-free first,
  unversioned sourceId first then newest version, newest source version,
  has-description first, then source ``sort`` rank.
- fallback cascades (src/graphkb.js:427-478 therapy by sourceId OR
  name with pluralization retries; src/cosmic/resistance.js:212-267
  disease by code -> exact name -> family name).

Spark-first shape: the per-record REST lookup becomes ONE broadcast
join per cascade level + a window top-1 per key. Errors become per-row
columns (a job must not die because one row is ambiguous — at 100 TB
there is always one ambiguous row).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

RESOLVE_ERROR_COL = "_resolve_error"


def preference_order(
    source_rank: str = "source_sort",
) -> list[Column]:
    """Column ordering replicating ``orderPreferredOntologyTerms``
    (src/graphkb.js:133-196) for ontology-shaped tables."""
    return [
        F.coalesce(F.col("deprecated"), F.lit(False)).asc(),
        F.coalesce(F.col("alias"), F.lit(False)).asc(),
        F.col("dependency").isNotNull().asc(),
        F.col("sourceIdVersion").isNotNull().asc(),  # unversioned first
        F.col("sourceIdVersion").desc_nulls_last(),
        F.col("source_version").desc_nulls_last(),
        F.col("description").isNotNull().desc(),
        F.coalesce(F.col(source_rank), F.lit(2**31 - 1)).asc(),
    ]


def resolve_unique(
    left: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | dict[str, str],
    prefer: Sequence[Column | str],
    broadcast_dim: bool = True,
    strict: bool = True,
) -> DataFrame:
    """Batch ``getUniqueRecordBy``: join ``left`` to dimension ``dim``,
    keep the single best match per left row by ``prefer`` ordering, and
    emit a ``_resolve_error`` column ('not found' / 'ambiguous' / NULL).

    ``on``: join keys — list of shared names, or {left_col: dim_col}.
    ``strict``: require a strict winner (tie on the full ``prefer`` key
    -> 'ambiguous'), mirroring src/graphkb.js:410-413.

    Plan shape: broadcast hash join (dim tables are small) followed by a
    single window over the left row id — one shuffle on the surrogate
    row key only if the join was not broadcast.
    """
    rid = "__resolve_rid"
    hit = "__dim_hit"
    lft = left.withColumn(rid, F.monotonically_increasing_id())
    dimh = dim.withColumn(hit, F.lit(True))
    pairs = on.items() if isinstance(on, dict) else [(k, k) for k in on]
    cond = None
    for lc, rc in pairs:
        c = lft[lc] == dimh[rc]
        cond = c if cond is None else (cond & c)

    right = F.broadcast(dimh) if broadcast_dim else dimh
    joined = lft.join(right, cond, "left")

    order = [c if isinstance(c, Column) else F.col(c) for c in prefer]
    w = Window.partitionBy(rid).orderBy(*order)
    ranked = joined.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__cnt", F.count(F.lit(1)).over(Window.partitionBy(rid))
    )
    if strict:
        # strict winner: rank the preference tuple densely; ambiguous if
        # the top two rows share the same dense rank.
        ranked = ranked.withColumn("__dr", F.dense_rank().over(w)).withColumn(
            "__top_ties",
            F.sum(F.when(F.col("__dr") == 1, 1).otherwise(0)).over(Window.partitionBy(rid)),
        )
        err = (
            F.when(F.col(hit).isNull() & (F.col("__cnt") == 1), F.lit("not found"))
            .when(F.col("__top_ties") > 1, F.lit("ambiguous"))
            .otherwise(F.lit(None))
        )
    else:
        err = F.when(
            F.col(hit).isNull() & (F.col("__cnt") == 1), F.lit("not found")
        ).otherwise(F.lit(None))

    out = (
        ranked.withColumn(RESOLVE_ERROR_COL, err)
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__cnt", "__dr", "__top_ties", rid, hit)
    )
    return out


def cascade_resolve(
    left: DataFrame,
    dim: DataFrame,
    levels: Sequence[tuple[Column, Sequence[Column | str]]],
    select: Sequence[str],
    broadcast_dim: bool = True,
) -> DataFrame:
    """Fallback-cascade join (reference J3): try each (condition,
    preference) level in order; first level that matches wins.

    ``levels``: [(join_condition(left, dim) as Column, prefer_order)].
    ``select``: dim columns to attach (prefixed ``resolved_``).

    Implemented as one join per level + ``coalesce`` across levels —
    each level is a broadcast join, so a K-level cascade is K map-side
    joins, not K shuffles.
    """
    rid = "__cascade_rid"
    out = left.withColumn(rid, F.monotonically_increasing_id())
    hit_cols: dict[str, list[str]] = {c: [] for c in select}
    for i, (cond, prefer) in enumerate(levels):
        right = F.broadcast(dim) if broadcast_dim else dim
        matched = out.join(right, cond, "left")
        order = [c if isinstance(c, Column) else F.col(c) for c in prefer]
        w = Window.partitionBy(rid).orderBy(*order)
        matched = matched.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
        keep = [matched[c].alias(f"__lvl{i}_{c}") for c in select]
        lvl = matched.select(matched[rid], *keep)
        out = out.join(lvl, rid, "left")
        for c in select:
            hit_cols[c].append(f"__lvl{i}_{c}")
    for c in select:
        out = out.withColumn(f"resolved_{c}", F.coalesce(*[F.col(h) for h in hit_cols[c]]))
    drop = [h for hs in hit_cols.values() for h in hs] + [rid]
    return out.drop(*drop)
