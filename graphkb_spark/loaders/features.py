"""Ensembl-style feature-hierarchy loader (SURVEY §2.4 J10 / §7.3;
reference /root/reference/src/ensembl/index.js:263-498,
src/refseq/index.js:22-146).

Reference behavior: each biomart row carries (gene, transcript,
protein) ids with versions; for every level a *versioned* Feature and a
*generic* (unversioned) Feature are created, linked versioned ->
generic with ``GeneralizationOf`` (src/ensembl/index.js:37-42), and
child generic -> parent generic with ``ElementOf`` (transcript in gene,
protein in transcript). The reference walks rows one-by-one with a
``visited`` cache; here each level is one ``dropDuplicates`` projection
and the edges are unioned selects — zero driver iteration, and the
deterministic rids mean the vertex and edge frames build independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphkb_spark.core.schemas import EDGE_SCHEMA
from graphkb_spark.functions.hashing import stable_hash_named
from graphkb_spark.kb import KnowledgeBase, source_rid
from graphkb_spark.operators.merge import merge_upsert

FEATURE_LEVELS = [
    # (id column, version column, biotype, parent biotype)
    ("gene_id", "gene_version", "gene", None),
    ("transcript_id", "transcript_version", "transcript", "gene"),
    ("protein_id", "protein_version", "protein", "transcript"),
]

FEATURE_COLS = ["rid", "cls", "biotype", "sourceId", "sourceIdVersion", "source_rid"]


def _feature_rid(biotype, sid, sid_version, src):
    return stable_hash_named(
        cls=F.lit("Feature"),
        biotype=biotype,
        sourceId=sid,
        sourceIdVersion=sid_version,
        source_rid=src,
    )


def load_feature_hierarchy(
    spark: SparkSession,
    kb: KnowledgeBase,
    rows: DataFrame,
    source_name: str = "ensembl",
) -> KnowledgeBase:
    """Input columns: ``gene_id``, ``gene_version``, ``transcript_id``,
    ``transcript_version``, ``protein_id``, ``protein_version``
    (versions nullable; protein columns nullable for non-coding rows).

    Emits per level: versioned + generic Feature vertices,
    ``GeneralizationOf`` (generic -> versioned is the reference's edge
    direction: out=generic, in=versioned per src/ensembl/index.js:37-42
    'generalizationof' out record) and ``ElementOf`` child->parent.
    """
    src = source_rid(source_name)

    feats = None
    for id_col, ver_col, biotype, _parent in FEATURE_LEVELS:
        base = rows.filter(F.col(id_col).isNotNull()).select(
            F.col(id_col).alias("sourceId"),
            F.col(ver_col).cast("string").alias("sourceIdVersion"),
        )
        versioned = base.filter(F.col("sourceIdVersion").isNotNull()).dropDuplicates(
            ["sourceId", "sourceIdVersion"]
        )
        generic = base.select("sourceId").dropDuplicates().withColumn(
            "sourceIdVersion", F.lit(None).cast("string")
        )
        lvl = versioned.unionByName(generic).select(
            _feature_rid(
                F.lit(biotype), F.col("sourceId"), F.col("sourceIdVersion"), src
            ).alias("rid"),
            F.lit("Feature").alias("cls"),
            F.lit(biotype).alias("biotype"),
            "sourceId",
            "sourceIdVersion",
            src.alias("source_rid"),
        )
        feats = lvl if feats is None else feats.unionByName(lvl)

    # GeneralizationOf: generic (out) -> versioned (in), one per level
    gen_edges = None
    for id_col, ver_col, biotype, _parent in FEATURE_LEVELS:
        e = (
            rows.filter(F.col(id_col).isNotNull() & F.col(ver_col).isNotNull())
            .select(F.col(id_col).alias("sid"), F.col(ver_col).cast("string").alias("ver"))
            .dropDuplicates()
            .select(
                _feature_rid(F.lit(biotype), F.col("sid"), F.lit(None).cast("string"), src)
                .alias("out_rid"),
                _feature_rid(F.lit(biotype), F.col("sid"), F.col("ver"), src)
                .alias("in_rid"),
                F.lit("GeneralizationOf").alias("edge_class"),
                src.alias("source_rid"),
            )
        )
        gen_edges = e if gen_edges is None else gen_edges.unionByName(e)

    # ElementOf: child generic (out) -> parent generic (in)
    elem_specs = [
        ("transcript_id", "transcript", "gene_id", "gene"),
        ("protein_id", "protein", "transcript_id", "transcript"),
    ]
    elem_edges = None
    for child_col, child_bt, parent_col, parent_bt in elem_specs:
        e = (
            rows.filter(F.col(child_col).isNotNull() & F.col(parent_col).isNotNull())
            .select(child_col, parent_col)
            .dropDuplicates()
            .select(
                _feature_rid(
                    F.lit(child_bt), F.col(child_col), F.lit(None).cast("string"), src
                ).alias("out_rid"),
                _feature_rid(
                    F.lit(parent_bt), F.col(parent_col), F.lit(None).cast("string"), src
                ).alias("in_rid"),
                F.lit("ElementOf").alias("edge_class"),
                src.alias("source_rid"),
            )
        )
        elem_edges = e if elem_edges is None else elem_edges.unionByName(e)

    new_edges = gen_edges.unionByName(elem_edges).select(
        [f.name for f in EDGE_SCHEMA.fields]
    )

    # features table lives alongside terms; store under kb.terms-style
    # merge keyed by rid (Feature rows carry biotype in place of name)
    existing = getattr(kb, "features", None)
    if existing is None:
        kb.features = feats
    else:
        merged = merge_upsert(existing, feats, ["rid"])
        kb.features = merged.drop("_action").select(FEATURE_COLS)
    kb.edges = kb.edges.unionByName(new_edges).dropDuplicates(
        ["out_rid", "in_rid", "edge_class"]
    )
    return kb
