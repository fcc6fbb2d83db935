"""KB persistence: parquet-backed save/load of the KnowledgeBase.

Partitioning strategy for scale (SURVEY §1.5): ``terms`` is partitioned
by ``cls`` — every loader and query touches one or few classes, so
partition pruning turns "resolve a Disease" into a scan of the Disease
directory only; ``edges`` by ``edge_class`` for the same reason.
``sources`` is tiny (one row per source).

Incremental upserts go through ``upsert_kb_table``, which dispatches on
the session's capabilities (operators/merge_sink.py): with a Delta /
Iceberg extension loaded it emits one native ``MERGE INTO`` (file-
skipping, ACID — the 100 TB path); on plain parquet it computes the
merge as a full-outer join and overwrites the table directory. Same
semantics either way (golden-tested in tests/test_merge_sink.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from graphkb_spark.core.materialize import materialize

from graphkb_spark.core.schemas import (
    EDGE_SCHEMA,
    ONTOLOGY_TERM_SCHEMA,
    SOURCE_SCHEMA,
)
from graphkb_spark.kb import KnowledgeBase, empty_kb


def save_kb(kb: KnowledgeBase, path: str) -> None:
    """Persist the KB. Tables are materialized (localCheckpoint) before
    the overwrite: a KB loaded from ``path`` and saved back to ``path``
    would otherwise overwrite files its own lazy plans still read
    (Delta's MVCC makes this safe for free; plain parquet needs the
    checkpoint)."""

    def snap(df):
        return df.transform(materialize, eager=True)

    snap(kb.sources).write.mode("overwrite").parquet(os.path.join(path, "sources"))
    snap(kb.terms).write.mode("overwrite").partitionBy("cls").parquet(
        os.path.join(path, "terms")
    )
    snap(kb.edges).write.mode("overwrite").partitionBy("edge_class").parquet(
        os.path.join(path, "edges")
    )
    if kb.features is not None:
        snap(kb.features).write.mode("overwrite").partitionBy("biotype").parquet(
            os.path.join(path, "features")
        )
    if kb.statements is not None:
        snap(kb.statements).write.mode("overwrite").parquet(
            os.path.join(path, "statements")
        )


def load_kb(spark: SparkSession, path: str) -> KnowledgeBase:
    if not os.path.exists(os.path.join(path, "terms")):
        return empty_kb(spark)
    # explicit schemas: an empty table writes no parquet footers, so
    # inference would fail on a KB with (say) no edges yet
    kb = KnowledgeBase(
        sources=spark.read.schema(SOURCE_SCHEMA).parquet(os.path.join(path, "sources")),
        terms=spark.read.schema(ONTOLOGY_TERM_SCHEMA).parquet(os.path.join(path, "terms")),
        edges=spark.read.schema(EDGE_SCHEMA).parquet(os.path.join(path, "edges")),
    )
    fpath = os.path.join(path, "features")
    if os.path.exists(fpath):
        kb.features = spark.read.parquet(fpath)
    spath = os.path.join(path, "statements")
    if os.path.exists(spath):
        kb.statements = spark.read.parquet(spath)
    return kb


_KB_TABLE_KEYS: dict[str, tuple[list[str], list[str]]] = {
    # table -> (natural key, partition columns)
    "sources": (["name"], []),
    "terms": (["cls", "sourceId", "sourceIdVersion"], ["cls"]),
    "edges": (["edge_class", "out_rid", "in_rid"], ["edge_class"]),
}


def upsert_kb_table(
    spark: SparkSession,
    kb_path: str,
    table: str,
    batch,
    exclude: tuple[str, ...] = (),
    delete_missing: bool = False,
):
    """MERGE a loader batch into one KB table, format-agnostically.

    The reference's addRecord loop (src/graphkb.js:545-612) upserts one
    record per round-trip; here the whole batch is ONE merge. With a
    lakehouse extension loaded this is a native ``MERGE INTO
    kb.<table>`` (only matched files rewrite); on plain parquet it is
    the computed merge against ``<kb_path>/<table>``. Returns the
    merged frame (computed path, with the ``_action`` audit column) or
    the submitted SQL text (native path).
    """
    from graphkb_spark.operators.merge_sink import (
        ComputedMergeWriter,
        get_merge_writer,
    )

    if table not in _KB_TABLE_KEYS:
        raise ValueError(f"unknown KB table {table!r}: {sorted(_KB_TABLE_KEYS)}")
    on, partition_by = _KB_TABLE_KEYS[table]
    writer = get_merge_writer(spark)
    if isinstance(writer, ComputedMergeWriter):
        return writer.merge(
            os.path.join(kb_path, table),
            batch,
            on=on,
            exclude=exclude,
            soft_delete_col="deletedAt",
            delete_missing=delete_missing,
            partition_by=partition_by,
        )
    return writer.merge(
        f"kb.{table}",
        batch,
        on=on,
        exclude=exclude,
        soft_delete_col="deletedAt",
        delete_missing=delete_missing,
    )
