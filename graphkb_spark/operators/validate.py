"""Schema/spec validation with per-row quarantine (SURVEY §2.3 P5).

The reference validates every parsed record against a JSON Schema (ajv)
before processing (``checkSpec`` /root/reference/src/util.js:201-214)
and collects failures into error lists instead of aborting
(/root/reference/src/civic/evidenceItem.js:94-110).

Spark-first: a spec is a mapping column -> Column predicate; violations
accumulate into an ``array<string>`` error column built from pure
``when`` expressions — the whole validation is one codegen'd
projection, and the valid/quarantine split is two filters off the same
scan (Catalyst collapses them into the read).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SPEC_ERRORS_COL = "_spec_errors"


def check_spec(df: DataFrame, spec: Mapping[str, Column]) -> DataFrame:
    """Annotate ``df`` with ``_spec_errors``: for each (name ->
    predicate) entry, rows failing the predicate collect
    ``"<name>"`` into the error array; an empty array means valid."""
    parts = [
        F.when(~F.coalesce(pred, F.lit(False)), F.lit(name))
        for name, pred in spec.items()
    ]
    errors = F.filter(F.array(*parts), lambda e: e.isNotNull())
    return df.withColumn(SPEC_ERRORS_COL, errors)


def split_valid(df: DataFrame, spec: Mapping[str, Column]) -> tuple[DataFrame, DataFrame]:
    """(valid rows, quarantined rows) — quarantine keeps the error list
    for the K5 error sink."""
    checked = check_spec(df, spec)
    return (
        checked.filter(F.size(SPEC_ERRORS_COL) == 0).drop(SPEC_ERRORS_COL),
        checked.filter(F.size(SPEC_ERRORS_COL) > 0),
    )


def full_reload_diff(
    original: DataFrame,
    reloaded: DataFrame,
    id_col: str = "rid",
    suppress_delete: bool = False,
) -> DataFrame:
    """§2.9.3 full-reload diff (reference cosmic resistance,
    /root/reference/src/cosmic/resistance.js:334-397): sources without
    stable ids hash every row; after a reload, previously-stored ids
    not regenerated are deleted — unless errors occurred during the
    load (``suppress_delete``), in which case they are kept-flagged.

    Returns (id, action): retained ids -> 'keep', vanished ->
    'delete' (or 'keep-flagged' when suppressed), new -> 'create'.
    """
    o = original.select(F.col(id_col)).distinct().withColumn("__o", F.lit(True))
    r = reloaded.select(F.col(id_col)).distinct().withColumn("__r", F.lit(True))
    gone_action = "keep-flagged" if suppress_delete else "delete"
    return (
        o.join(r, id_col, "full_outer")
        .select(
            id_col,
            F.when(F.col("__o").isNotNull() & F.col("__r").isNotNull(), F.lit("keep"))
            .when(F.col("__o").isNotNull(), F.lit(gone_action))
            .otherwise(F.lit("create"))
            .alias("action"),
        )
    )
