"""KB table schemas (SURVEY §1.5 Spark mapping).

One DataFrame per vertex cluster + a single edges table
(GraphFrames-compatible). ``@rid`` becomes a deterministic surrogate
key (md5 of the key-sorted natural-key JSON, mirroring
``hashRecordToId`` src/util.js:186-193) so vertices and the edges
referencing them can be computed independently in the same batch —
replacing the reference's sequential create-then-link
(SURVEY §7 "what's hard").
"""

from __future__ import annotations

from pyspark.sql import types as T

SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("rid", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("displayName", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("usage", T.StringType(), True),
        T.StructField("version", T.StringType(), True),
        T.StructField("sort", T.IntegerType(), True),
    ]
)

ONTOLOGY_TERM_SCHEMA = T.StructType(
    [
        T.StructField("rid", T.StringType(), False),
        T.StructField("cls", T.StringType(), False),  # Disease|Therapy|Vocabulary|...
        T.StructField("sourceId", T.StringType(), True),
        T.StructField("sourceIdVersion", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("displayName", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("deprecated", T.BooleanType(), True),
        T.StructField("alias", T.BooleanType(), True),
        T.StructField("dependency", T.StringType(), True),
        T.StructField("subsets", T.ArrayType(T.StringType()), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("biotype", T.StringType(), True),
        T.StructField("comment", T.StringType(), True),
        T.StructField("source_rid", T.StringType(), True),
    ]
)

POSITION_SCHEMA = T.StructType(
    [
        T.StructField("cls", T.StringType(), True),  # GenomicPosition|ExonicPosition|...
        T.StructField("pos", T.IntegerType(), True),
        T.StructField("ref_aa", T.StringType(), True),
    ]
)

VARIANT_ROW_SCHEMA = T.StructType(
    [
        T.StructField("rid", T.StringType(), False),
        T.StructField("cls", T.StringType(), False),  # PositionalVariant|CategoryVariant
        T.StructField("type_rid", T.StringType(), True),
        T.StructField("reference1_rid", T.StringType(), True),
        T.StructField("reference2_rid", T.StringType(), True),
        T.StructField("break1_start", POSITION_SCHEMA, True),
        T.StructField("break2_start", POSITION_SCHEMA, True),
        T.StructField("ref_seq", T.StringType(), True),
        T.StructField("alt_seq", T.StringType(), True),
        T.StructField("displayName", T.StringType(), True),
        T.StructField("source_rid", T.StringType(), True),
    ]
)

STATEMENT_SCHEMA = T.StructType(
    [
        T.StructField("rid", T.StringType(), False),
        T.StructField("sourceId", T.StringType(), True),
        T.StructField("conditions", T.ArrayType(T.StringType()), True),  # rids, sorted
        T.StructField("evidence", T.ArrayType(T.StringType()), True),
        T.StructField("subject", T.StringType(), True),
        T.StructField("relevance", T.StringType(), True),
        T.StructField("evidenceLevel", T.ArrayType(T.StringType()), True),
        T.StructField("reviewStatus", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("source_rid", T.StringType(), True),
        T.StructField("deletedAt", T.TimestampType(), True),
    ]
)

EDGE_SCHEMA = T.StructType(
    [
        T.StructField("out_rid", T.StringType(), False),
        T.StructField("in_rid", T.StringType(), False),
        T.StructField("edge_class", T.StringType(), False),  # SubClassOf|AliasOf|...
        T.StructField("source_rid", T.StringType(), True),
    ]
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

# edge classes used by the reference (SURVEY §1.3); matched
# case-insensitively like the API does
EDGE_CLASSES = [
    "SubClassOf",
    "AliasOf",
    "DeprecatedBy",
    "CrossReferenceOf",
    "ElementOf",
    "GeneralizationOf",
    "Infers",
    "TargetOf",
    "OppositeOf",
]


def canonical_edge_class(name: str) -> str:
    """Class names are matched case-insensitively by the reference API
    (loaders use subclassof/SubclassOf/SubClassOf interchangeably —
    SURVEY §1.3)."""
    lookup = {c.lower(): c for c in EDGE_CLASSES}
    try:
        return lookup[name.lower()]
    except KeyError:
        raise ValueError(f"unknown edge class {name!r}") from None
