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

from graphkb_spark.kb import KnowledgeBase, empty_kb


def save_kb(kb: KnowledgeBase, path: str) -> None:
    kb.sources.write.mode("overwrite").parquet(os.path.join(path, "sources"))
    kb.terms.write.mode("overwrite").partitionBy("cls").parquet(
        os.path.join(path, "terms")
    )
    kb.edges.write.mode("overwrite").partitionBy("edge_class").parquet(
        os.path.join(path, "edges")
    )
    if kb.features is not None:
        kb.features.write.mode("overwrite").partitionBy("biotype").parquet(
            os.path.join(path, "features")
        )


def load_kb(spark: SparkSession, path: str) -> KnowledgeBase:
    if not os.path.exists(os.path.join(path, "terms")):
        return empty_kb(spark)
    kb = KnowledgeBase(
        sources=spark.read.parquet(os.path.join(path, "sources")),
        terms=spark.read.parquet(os.path.join(path, "terms")),
        edges=spark.read.parquet(os.path.join(path, "edges")),
    )
    fpath = os.path.join(path, "features")
    if os.path.exists(fpath):
        kb.features = spark.read.parquet(fpath)
    return kb
