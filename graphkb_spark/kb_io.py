"""KB persistence: parquet-backed save/load of the KnowledgeBase.

Partitioning strategy for scale (SURVEY §1.5): ``terms`` is partitioned
by ``cls`` — every loader and query touches one or few classes, so
partition pruning turns "resolve a Disease" into a scan of the Disease
directory only; ``edges`` by ``edge_class`` for the same reason.
``sources`` is tiny (one row per source). On a cluster these become
Delta tables and `merge_upsert` becomes ``DeltaTable.merge`` — the
layout and keys are identical.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

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
        return df.localCheckpoint(eager=True)

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
