"""MERGE / upsert with field-level change detection — the reference's
signature write path (SURVEY §2.9).

Reference semantics:
- ``addRecord`` create-or-fetch-or-update (src/graphkb.js:545-612).
- ``shouldUpdate`` field diff (src/graphkb.js:57-101): links simplified
  to ids, extra fields dropped, null-likes ('' vs null) equal, ``subsets``
  compared order-insensitively (src/graphkb.js:78-86), excludable props
  via ``upsertCheckExclude`` (e.g. ['comment'] src/ncit/index.js:385-387).
- soft delete of rows missing from the new batch
  (src/graphkb.js:521-533; bulk src/civic/statement.js:272-297).
- created/updated/deleted counters (src/graphkb.js:315-330).

Spark-first shape: one full-outer join on the natural key; the change
predicate is a pure Column expression (codegen'd struct compare), so a
100 TB merge is scan + single shuffle on the key + write. Delta's
``MERGE INTO`` has the same plan; this implementation works on plain
parquet-backed tables (no Delta jars in this environment) and returns
the post-merge DataFrame plus an ``_action`` audit column.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ACTION_COL = "_action"


def mark_known_empty(df: DataFrame) -> DataFrame:
    """Tag a DataFrame the caller *knows* is empty (e.g. a fresh KB
    table) so MERGE can skip the full-outer join against it."""
    df._gkb_known_empty = True  # type: ignore[attr-defined]
    return df


def _known_empty(df: DataFrame) -> bool:
    """True iff the caller tagged ``df`` empty (``mark_known_empty``) or
    the optimizer can already prove it (an empty LocalRelation) — the
    plan check runs no job. Lets MERGE short-circuit the full-outer
    join on the common load-from-scratch path (an empty in-memory KB
    table); a parquet-backed table never matches (emptiness unknowable
    without a scan) and takes the normal path."""
    if getattr(df, "_gkb_known_empty", False):
        return True
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:  # pragma: no cover - py4j edge
        return False
    return plan.strip().startswith("LocalRelation <empty>")


def simplify_record_links(content, level: int = 0):
    """Clean-room port of the reference's ``simplifyRecordsLinks``
    (src/graphkb.js:28-47), pinned by test/graphkb.test.js:247-280:
    collapse nested linked records to their ``@rid`` string (only below
    the top level), map+sort arrays, recurse into plain dicts; scalars
    pass through. Driver-side record prep for REST-shaped payloads
    before they become flat MERGE rows — ``merge_upsert``'s change
    predicate assumes links are already rid strings (see module
    docstring)."""
    if isinstance(content, dict):
        if level and content.get("@rid") is not None:
            return str(content["@rid"])
        simple = {}
        for key, value in content.items():
            if isinstance(value, list):
                simple[key] = sorted(
                    (simplify_record_links(v, level + 1) for v in value),
                    key=str,  # JS Array.sort stringifies mixed elements
                )
            else:
                simple[key] = simplify_record_links(value, level + 1)
        return simple
    return content


def _norm_equal(tcol: Column, scol: Column, dtype: str) -> Column:
    """Null-safe normalized equality for change detection.

    ''/null are equal (src/graphkb.js:68-77); arrays compare sorted
    (src/graphkb.js:78-86).
    """
    if dtype.startswith("array"):
        t, s = F.array_sort(tcol), F.array_sort(scol)
        both_empty = (F.coalesce(F.size(tcol), F.lit(0)) == 0) & (
            F.coalesce(F.size(scol), F.lit(0)) == 0
        )
        return both_empty | t.eqNullSafe(s)
    if dtype == "string":
        t = F.when(F.trim(tcol) == "", F.lit(None)).otherwise(tcol)
        s = F.when(F.trim(scol) == "", F.lit(None)).otherwise(scol)
        return t.eqNullSafe(s)
    return tcol.eqNullSafe(scol)


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    on: Sequence[str],
    exclude: Sequence[str] = (),
    soft_delete_col: str | None = None,
    delete_missing: bool = False,
) -> DataFrame:
    """MERGE source into target on the natural key ``on``.

    - not matched by target -> insert (``_action='create'``)
    - matched and changed   -> update with source values ('update')
    - matched and unchanged -> keep target row ('noop')
    - not matched by source -> keep ('keep'), or when ``delete_missing``
      mark ``soft_delete_col=True`` ('delete') — the reference only ever
      soft-deletes (src/graphkb.js:521-533).

    ``exclude`` columns never trigger an update but are still refreshed
    when some other column changed (mirrors ``upsertCheckExclude``).
    """
    on = list(on)
    dtypes = dict(source.dtypes)
    data_cols = [c for c in source.columns if c not in on]
    tgt_extra = [c for c in target.columns if c not in source.columns]

    if _known_empty(target):
        # empty target => every source row is a create; skip the
        # full-outer join entirely (drops 2 exchanges + an SMJ per
        # merge on the load-from-scratch path)
        tgt_types = dict(target.dtypes)
        out = source.select(
            *on,
            *data_cols,
            *[F.lit(None).cast(tgt_types[c]).alias(c) for c in tgt_extra],
            F.lit("create").alias(ACTION_COL),
        )
        if soft_delete_col is not None and soft_delete_col not in out.columns:
            out = out.withColumn(soft_delete_col, F.lit(False))
        return out

    t = target.select([F.col(c).alias(f"__t_{c}") for c in target.columns])
    s = source.select([F.col(c).alias(f"__s_{c}") for c in source.columns])
    cond = None
    for k in on:
        c = t[f"__t_{k}"].eqNullSafe(s[f"__s_{k}"])
        cond = c if cond is None else (cond & c)
    j = t.join(s, cond, "full_outer")

    in_src = F.col(f"__s_{on[0]}").isNotNull() | F.lit(False)
    # a key present in source: any of its key parts non-null on the s side
    src_present = None
    tgt_present = None
    for k in on:
        sp = s[f"__s_{k}"].isNotNull()
        tp = t[f"__t_{k}"].isNotNull()
        src_present = sp if src_present is None else (src_present | sp)
        tgt_present = tp if tgt_present is None else (tgt_present | tp)
    # NB: all-null keys are pathological; natural keys are non-null here.

    compare_cols = [c for c in data_cols if c not in exclude]
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~_norm_equal(
            F.col(f"__t_{c}"), F.col(f"__s_{c}"), dtypes.get(c, "string")
        )

    action = (
        F.when(tgt_present & ~src_present, F.lit("delete" if delete_missing else "keep"))
        .when(~tgt_present & src_present, F.lit("create"))
        .when(changed, F.lit("update"))
        .otherwise(F.lit("noop"))
    )
    j = j.withColumn(ACTION_COL, action)

    take_source = F.col(ACTION_COL).isin("create", "update")
    out_cols: list[Column] = []
    for k in on:
        out_cols.append(F.coalesce(F.col(f"__s_{k}"), F.col(f"__t_{k}")).alias(k))
    for c in data_cols:
        out_cols.append(
            F.when(take_source, F.col(f"__s_{c}")).otherwise(F.col(f"__t_{c}")).alias(c)
        )
    for c in tgt_extra:
        out_cols.append(F.col(f"__t_{c}").alias(c))
    out = j.select(*out_cols, F.col(ACTION_COL))
    if soft_delete_col is not None:
        if soft_delete_col in out.columns:
            out = out.withColumn(
                soft_delete_col,
                F.when(F.col(ACTION_COL) == "delete", F.lit(True)).otherwise(
                    F.col(soft_delete_col)
                ),
            )
        else:
            out = out.withColumn(soft_delete_col, F.col(ACTION_COL) == "delete")
    return out


def merge_metrics(merged: DataFrame) -> DataFrame:
    """created/updated/deleted counters (src/graphkb.js:315-330)."""
    return merged.groupBy(ACTION_COL).count()


def scd2_build(
    mutations: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Slowly-changing-dimension type-2 build from a mutation log: for
    each key, collapse consecutive mutations whose tracked attributes
    did not change (the reference's ``shouldUpdate`` field-diff,
    src/graphkb.js:239-262, applied across history instead of against
    one snapshot), then derive validity intervals — (keys..., attrs...,
    valid_from, valid_to, is_current), ``valid_to`` NULL on the open
    current row. The versioned-dimension sibling of the soft-delete
    sink (K4).

    Scale shape: ONE shuffle on the key; both windows (the lag
    change-detect and the lead valid_to) share that partitioning, so
    Catalyst plans a single exchange. The mutation order must be total
    per key — ties on ``ts_col`` break on the attribute values to stay
    deterministic."""
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in attr_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    changed = F.lit(False)
    for c in attr_cols:
        prev = F.lag(c).over(w)
        # null-safe (IS DISTINCT FROM): a NULL<->value transition IS a
        # change; the plain ==-with-both-null special case evaluates to
        # NULL there and filter() would silently drop the version row
        changed = changed | ~F.col(c).eqNullSafe(prev)
    first_row = F.lag(ts_col).over(w).isNull()
    log = mutations.withColumn("__chg", first_row | changed).filter(F.col("__chg"))
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        log.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(*key_cols, *attr_cols, "valid_from", "valid_to", "is_current")
    )


def cdc_replay(
    log: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    op_col: str,
    attr_cols: list[str],
    delete_op: str = "D",
) -> DataFrame:
    """Replay a change-data-capture log (upserts + deletes) into the
    final snapshot: the LAST operation per key wins — an upsert
    contributes its attribute values, a delete removes the key. The
    log-structured generalization of the MERGE sink (K1/K3/K4): where
    ``merge_upsert`` applies one batch against a target, this folds an
    arbitrarily long history with no target at all (initial load /
    disaster rebuild from the log).

    ``order_cols`` must totally order each key's history (ts plus a
    log sequence number for same-timestamp ties).

    Scale shape: ONE shuffle on the key and a row_number window — no
    iterative per-batch application, which at 100 TB of log would be
    O(batches) passes. Late keys and hot keys partial-aggregate like
    any keyed shuffle; AQE splits a skewed reduce partition."""
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    return (
        log.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col(op_col) != delete_op))
        .select(*key_cols, *attr_cols)
    )


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    key_cols: list[str],
    fact_ts_col: str,
    attr_cols: list[str],
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """Point-in-time (as-of) join of a fact stream against an SCD2
    dimension: each fact row picks the dimension version whose
    [valid_from, valid_to) interval contains the fact timestamp —
    ``valid_from`` inclusive, ``valid_to`` exclusive, NULL valid_to
    open-ended. Facts before a key's first version are dropped (inner
    semantics). The consumption side of ``scd2_build``: together they
    are the warehouse effective-dated-dimension pattern.

    Scale shape: NOT a range join — an interval predicate would plan a
    broadcast-nested-loop (or an O(versions x facts) range join) at
    100 TB. Instead dim change points and facts UNION into one stream
    and a single keyed window forward-fills the latest version struct
    onto each fact (the ``gap_fill``/``interpolate_at`` pattern): ONE
    shuffle on the key, zero self-joins. Zero-length versions (tied
    ``valid_from`` from same-timestamp mutations) sort before the
    effective version via the valid_to tie-break, so the fill picks the
    same version the interval predicate would."""
    ver = F.struct(
        F.col(valid_from_col).alias("__vf"),
        F.col(valid_to_col).alias("__vt"),
        *[F.col(c) for c in attr_cols],
    )
    fact_struct = F.struct(*[F.col(c) for c in facts.columns])
    ver_type = dim.select(ver.alias("x")).schema["x"].dataType
    fact_type = facts.select(fact_struct.alias("x")).schema["x"].dataType
    d = dim.select(
        *[F.col(k) for k in key_cols],
        F.col(valid_from_col).alias("__ts"),
        F.lit(1).alias("__is_dim"),
        F.col(valid_to_col).alias("__order_vt"),
        ver.alias("__ver"),
        F.lit(None).cast(fact_type).alias("__fact"),
    )
    f = facts.select(
        *[F.col(k) for k in key_cols],
        F.col(fact_ts_col).alias("__ts"),
        F.lit(0).alias("__is_dim"),
        F.lit(None).cast("timestamp").alias("__order_vt"),
        F.lit(None).cast(ver_type).alias("__ver"),
        fact_struct.alias("__fact"),
    )
    # dim rows first at a tied timestamp (valid_from inclusive); among
    # tied dim rows the effective one (larger / open valid_to) LAST so
    # the forward fill keeps it
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(
            F.col("__ts").asc(),
            F.col("__is_dim").desc(),
            F.col("__order_vt").asc_nulls_last(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = d.unionByName(f).withColumn(
        "__pick", F.last("__ver", ignorenulls=True).over(w)
    )
    return (
        filled.filter(
            (F.col("__is_dim") == 0)
            & F.col("__pick").isNotNull()
            & (
                F.col("__pick.__vt").isNull()
                | (F.col("__ts") < F.col("__pick.__vt"))
            )
        )
        .select(
            *[F.col(f"__fact.{c}").alias(c) for c in facts.columns],
            *[F.col(f"__pick.{c}").alias(c) for c in attr_cols],
        )
    )
