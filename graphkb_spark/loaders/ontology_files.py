"""File-format ontology loaders: OBO-graph JSON (disease ontology) and
OWL/RDF (uberon / sequence ontology / vario) — SURVEY §7.3.

Reference behavior:
- Disease Ontology (/root/reference/src/diseaseOntology/index.js):
  OBO-graph JSON ``graphs[0].nodes`` (id IRI, lbl, meta.definition,
  meta.deprecated, meta.subsets, meta.synonyms) and ``edges`` with
  ``pred == 'is_a'`` -> SubClassOf; synonyms become alias records with
  AliasOf edges; DOID iris parse to ``doid:NNN`` sourceIds.
- OWL loaders (/root/reference/src/uberon/index.js:67,
  src/sequenceOntology.js:80, src/vario.js:54): triples grouped by
  subject (``convertOwlGraphToJson`` src/util.js:22-66) then mapped
  from rdfs/obo predicates to term fields.

Spark shape: the whole document lands as ONE multiline-JSON row whose
nodes/edges arrays are exploded JVM-side — no driver-side node loop;
edges aggregate back to per-node link arrays with one groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphkb_spark.kb import KnowledgeBase, load_ontology_records


def _iri_to_source_id(col):
    """IRI tail -> curie-ish id: .../DOID_4 -> doid:4 (reference
    ``parseDoid`` src/diseaseOntology/index.js:22-30)."""
    tail = F.element_at(F.split(col, "/"), -1)
    return F.lower(F.regexp_replace(tail, "_", ":"))


def load_obograph(
    spark: SparkSession,
    kb: KnowledgeBase,
    path: str,
    source_name: str,
    cls: str = "Disease",
) -> KnowledgeBase:
    """Load an OBO-graph JSON file (DO shape) into the KB."""
    doc = spark.read.option("multiLine", "true").json(path)
    g = doc.select(F.explode("graphs").alias("g")).limit(1)

    raw_nodes = g.select(F.explode("g.nodes").alias("n"))

    # optional fields may be absent from the *inferred schema entirely*
    # when no node carries them — substitute typed nulls, don't fail
    def npath(path_: str, dtype: str):
        cur = dict(
            (f.name, f.dataType) for f in raw_nodes.schema["n"].dataType.fields
        )
        parts = path_.split(".")
        for i, p in enumerate(parts):
            if p not in cur:
                return F.lit(None).cast(dtype)
            dt = cur[p]
            if i < len(parts) - 1:
                if not hasattr(dt, "fields"):
                    return F.lit(None).cast(dtype)
                cur = {f.name: f.dataType for f in dt.fields}
        return F.col("n." + path_)

    nodes = raw_nodes.select(
        _iri_to_source_id(F.col("n.id")).alias("sourceId"),
        F.lower(F.col("n.lbl")).alias("name"),
        npath("meta.definition.val", "string").alias("description"),
        F.coalesce(npath("meta.deprecated", "boolean"), F.lit(False)).alias("deprecated"),
        F.transform(
            F.coalesce(npath("meta.subsets", "array<string>"), F.array()),
            lambda s: F.element_at(F.split(s, "#"), -1),
        ).alias("subsets"),
        F.transform(
            F.coalesce(
                npath("meta.synonyms", "array<struct<val:string>>"),
                F.array().cast("array<struct<val:string>>"),
            ),
            lambda s: F.lower(s["val"]),
        ).alias("synonyms"),
    ).filter(F.col("sourceId").isNotNull() & F.col("name").isNotNull())

    is_a = (
        g.select(F.explode("g.edges").alias("e"))
        .filter(F.col("e.pred") == "is_a")
        .select(
            _iri_to_source_id(F.col("e.sub")).alias("sourceId"),
            _iri_to_source_id(F.col("e.obj")).alias("parent"),
        )
        .groupBy("sourceId")
        .agg(F.collect_list("parent").alias("subclassof"))
    )

    main = nodes.join(is_a, "sourceId", "left")
    syn = nodes.select(
        F.col("sourceId").alias("__main_sid"), F.explode("synonyms").alias("name")
    ).select(
        F.concat(F.col("__main_sid"), F.lit("::"), F.col("name")).alias("sourceId"),
        "name",
        F.lit(None).cast("string").alias("description"),
        F.lit(False).alias("deprecated"),
        F.lit(None).cast("array<string>").alias("subsets"),
        F.lit(None).cast("array<string>").alias("subclassof"),
        F.array("__main_sid").alias("aliasof"),
        F.lit(True).alias("alias"),
    )
    records = main.drop("synonyms").withColumn(
        "aliasof", F.lit(None).cast("array<string>")
    ).unionByName(syn, allowMissingColumns=True)
    return load_ontology_records(spark, kb, records, source_name, cls=cls)


# rdfs/obo predicate -> term field (reference uberon/sequenceOntology
# mappings of the grouped-triple records)
OWL_PREDICATE_MAP = {
    "label": "name",
    "IAO_0000115": "description",  # obo definition annotation
    "hasExactSynonym": "synonyms",
    "subClassOf": "subclassof",
    "deprecated": "deprecated",
}


def load_owl(
    spark: SparkSession,
    kb: KnowledgeBase,
    path: str,
    source_name: str,
    cls: str = "Vocabulary",
) -> KnowledgeBase:
    """Load an OWL/RDF-XML ontology: pivot triples by subject
    (``read_owl_records``) then map predicates to term fields."""
    from graphkb_spark.sources.readers import read_owl_records

    recs = read_owl_records(spark, path)
    cols = set(recs.columns)

    def arr(pred):
        return F.coalesce(F.col(pred), F.array()) if pred in cols else F.array()

    main = recs.select(
        _iri_to_source_id(F.col("subject")).alias("sourceId"),
        F.lower(F.get(arr("label"), 0)).alias("name"),
        F.get(arr("IAO_0000115"), 0).alias("description"),
        F.coalesce(F.get(arr("deprecated"), 0) == "true", F.lit(False)).alias("deprecated"),
        F.transform(arr("subClassOf"), _iri_to_source_id).alias("subclassof"),
        F.transform(arr("hasExactSynonym"), F.lower).alias("synonyms"),
    ).filter(F.col("name").isNotNull())

    syn = main.select(
        F.col("sourceId").alias("__main_sid"), F.explode("synonyms").alias("name")
    ).select(
        F.concat(F.col("__main_sid"), F.lit("::"), F.col("name")).alias("sourceId"),
        "name",
        F.lit(None).cast("string").alias("description"),
        F.lit(False).alias("deprecated"),
        F.lit(None).cast("array<string>").alias("subclassof"),
        F.array("__main_sid").alias("aliasof"),
        F.lit(True).alias("alias"),
    )
    records = main.drop("synonyms").withColumn(
        "aliasof", F.lit(None).cast("array<string>")
    ).unionByName(syn, allowMissingColumns=True)
    return load_ontology_records(spark, kb, records, source_name, cls=cls)
