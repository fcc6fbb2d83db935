"""Pluggable MERGE sink: real ``MERGE INTO`` on a lakehouse table
format, computed-merge + overwrite on plain parquet.

``merge_upsert`` (operators/merge.py) computes the reference's
create-or-fetch-or-update semantics (src/graphkb.js:545-612) as a
full-outer join — correct anywhere, but on a 100 TB target it rewrites
every file. A lakehouse format (Delta, Iceberg) executes the identical
logical MERGE while rewriting only the files that contain matched
keys, with ACID visibility. This module is the bridge:

- ``merge_into_sql`` renders the exact semantics of ``merge_upsert``
  — null-safe key equality, the ``_norm_equal`` change predicate
  (''≡null, order-insensitive arrays), ``exclude`` columns that never
  trigger but always refresh, soft delete of rows missing from the
  source — as one ANSI ``MERGE INTO`` statement that Delta ≥2.3 and
  Iceberg (Spark ≥3.4) both accept.
- ``get_merge_writer`` picks the execution path per session:
  ``SqlMergeWriter`` when a MERGE-capable extension is loaded,
  ``ComputedMergeWriter`` (merge_upsert + partitioned-parquet
  overwrite) otherwise. Both expose the same ``merge()`` call, so
  loader code is format-agnostic.

The sandbox has no Delta/Iceberg jars, so the SQL path is golden-
tested at the string level (tests/test_merge_sink.py) and the
fallback path end-to-end; on a real cluster the same code emits the
real MERGE. The generated statement intentionally has no engine-
specific syntax: `WHEN NOT MATCHED BY SOURCE` is ANSI SQL:2023 and
supported by both formats.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from graphkb_spark.core.materialize import materialize
from graphkb_spark.operators.merge import ACTION_COL, merge_upsert

_MERGE_EXTENSIONS = (
    "io.delta.sql.DeltaSparkSessionExtension",
    "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
)


def _q(name: str) -> str:
    """Backtick-quote an identifier (never trust column names in SQL)."""
    return "`" + name.replace("`", "``") + "`"


def _norm_equal_sql(t: str, s: str, dtype: str) -> str:
    """SQL mirror of merge._norm_equal: null-safe normalized equality.

    Must stay textually boring and semantically identical — the change
    predicate decides whether a 100 TB MERGE rewrites a file."""
    if dtype.startswith("array"):
        return (
            f"((coalesce(size({t}), 0) = 0 AND coalesce(size({s}), 0) = 0) "
            f"OR array_sort({t}) <=> array_sort({s}))"
        )
    if dtype == "string":
        tn = f"CASE WHEN trim({t}) = '' THEN NULL ELSE {t} END"
        sn = f"CASE WHEN trim({s}) = '' THEN NULL ELSE {s} END"
        return f"({tn} <=> {sn})"
    return f"({t} <=> {s})"


def merge_into_sql(
    target_table: str,
    source_ref: str,
    on: Sequence[str],
    source_cols: Sequence[str],
    dtypes: dict[str, str] | None = None,
    exclude: Sequence[str] = (),
    soft_delete_col: str | None = None,
    delete_missing: bool = False,
) -> str:
    """Render ``merge_upsert``'s semantics as one MERGE INTO statement.

    ``source_ref`` is a table/view name holding the source batch;
    ``source_cols`` its columns (keys first or not, order preserved for
    INSERT); ``dtypes`` maps column -> Spark simpleString type for the
    normalized change predicate (defaults to 'string' — the
    conservative normalization).

    Clause mapping (mirrors the _action audit column):
    - create: WHEN NOT MATCHED THEN INSERT
    - update: WHEN MATCHED AND <changed> THEN UPDATE SET <all data
      cols> (excluded columns refresh but never trigger)
    - noop/keep: no clause fires
    - delete: WHEN NOT MATCHED BY SOURCE THEN UPDATE SET
      <soft_delete_col> = true (the reference only soft-deletes,
      src/graphkb.js:521-533)
    """
    on = list(on)
    dtypes = dtypes or {}
    data_cols = [c for c in source_cols if c not in on]
    compare_cols = [c for c in data_cols if c not in exclude]

    on_clause = " AND ".join(f"t.{_q(k)} <=> s.{_q(k)}" for k in on)

    changed = " OR ".join(
        "NOT "
        + _norm_equal_sql(f"t.{_q(c)}", f"s.{_q(c)}", dtypes.get(c, "string"))
        for c in compare_cols
    )

    set_clause = ",\n    ".join(f"t.{_q(c)} = s.{_q(c)}" for c in data_cols)

    insert_cols = on + data_cols
    insert_names = ", ".join(_q(c) for c in insert_cols)
    insert_vals = ", ".join(f"s.{_q(c)}" for c in insert_cols)
    if soft_delete_col is not None and soft_delete_col not in insert_cols:
        insert_names += f", {_q(soft_delete_col)}"
        insert_vals += ", false"

    lines = [
        f"MERGE INTO {target_table} AS t",
        f"USING {source_ref} AS s",
        f"ON {on_clause}",
    ]
    if compare_cols and data_cols:
        lines.append(f"WHEN MATCHED AND ({changed}) THEN UPDATE SET")
        lines.append(f"    {set_clause}")
    elif data_cols:
        # everything excluded => any match refreshes nothing; skip the
        # UPDATE clause entirely (matched rows are noops)
        pass
    lines.append(f"WHEN NOT MATCHED THEN INSERT ({insert_names})")
    lines.append(f"    VALUES ({insert_vals})")
    if delete_missing:
        if soft_delete_col is None:
            raise ValueError(
                "delete_missing requires soft_delete_col (the reference "
                "only soft-deletes)"
            )
        lines.append(
            "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET "
            f"t.{_q(soft_delete_col)} = true"
        )
    return "\n".join(lines)


def merge_capable(spark: SparkSession) -> bool:
    """True when the session has a MERGE-INTO-capable extension loaded
    (Delta or Iceberg). Vanilla Spark parses MERGE but only these
    runtimes execute it against a table."""
    try:
        exts = spark.conf.get("spark.sql.extensions", "") or ""
    except Exception:  # pragma: no cover - conf access never fails in practice
        return False
    return any(e in exts for e in _MERGE_EXTENSIONS)


class SqlMergeWriter:
    """MERGE via the engine's native ``MERGE INTO`` (Delta/Iceberg).

    File-skipping, ACID, and concurrent-writer safety come from the
    format; this class only renders + submits the statement."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def merge(
        self,
        target_table: str,
        source: DataFrame,
        on: Sequence[str],
        exclude: Sequence[str] = (),
        soft_delete_col: str | None = None,
        delete_missing: bool = False,
    ) -> str:
        view = f"__merge_src_{abs(hash(target_table)) % 10**8}"
        source.createOrReplaceTempView(view)
        sql = merge_into_sql(
            target_table,
            view,
            on,
            source.columns,
            dtypes=dict(source.dtypes),
            exclude=exclude,
            soft_delete_col=soft_delete_col,
            delete_missing=delete_missing,
        )
        self.spark.sql(sql)
        return sql


class ComputedMergeWriter:
    """MERGE on plain parquet: read target, compute the merge as a
    full-outer join (merge_upsert), overwrite atomically-enough for a
    single writer. The audit ``_action`` column is dropped on write but
    returned for metrics."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def merge(
        self,
        target_path: str,
        source: DataFrame,
        on: Sequence[str],
        exclude: Sequence[str] = (),
        soft_delete_col: str | None = None,
        delete_missing: bool = False,
        partition_by: Sequence[str] = (),
    ) -> DataFrame:
        if os.path.exists(target_path):
            target = self.spark.read.parquet(target_path)
        else:
            target = self.spark.createDataFrame([], source.schema)
        merged = merge_upsert(
            target,
            source,
            on,
            exclude=exclude,
            soft_delete_col=soft_delete_col,
            delete_missing=delete_missing,
        )
        # materialize before overwriting files the plan still reads
        out = merged.transform(materialize, eager=True)
        writer = out.drop(ACTION_COL).write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(target_path)
        return out


def get_merge_writer(spark: SparkSession):
    """The session's MERGE execution path: native MERGE INTO when the
    runtime can execute it, computed merge otherwise."""
    return SqlMergeWriter(spark) if merge_capable(spark) else ComputedMergeWriter(spark)
