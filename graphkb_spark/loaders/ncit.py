"""NCIt-style flat-file ontology loader (SURVEY §7.3; reference
/root/reference/src/ncit/index.js).

Reference behavior reproduced set-oriented:
- ``cleanRawRow`` (src/ncit/index.js:95-160): '|'-split parents and
  synonyms, deprecation from obsolete/retired concept status or a
  deprecated parent, endpoint routing by semantic-type keyword
  (``pickEndpoint`` src/ncit/index.js:63-92 — a row lands in exactly
  one of Disease/Therapy/AnatomicalEntity or is quarantined);
- name-dedup (A3, src/ncit/index.js:255-308): a name claimed by more
  than one concept is not trustworthy as a primary name — those rows
  keep their sourceId as the display name and the shared name is
  demoted to a synonym;
- synonyms become alias terms + AliasOf edges; parents become
  SubClassOf edges.

Spark shape: every per-row decision is a Column expression; the only
shuffles are the name-dedup groupBy and the MERGEs. Endpoint routing is
a `when` chain over broadcastable keyword hits, so at 100 TB the whole
clean stage is one codegen'd scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from graphkb_spark.kb import KnowledgeBase, load_ontology_records

# keyword routing tables (semantic-type -> vertex class), mirroring the
# reference's anatomy/disease/therapeutic concept lists
ANATOMY_KEYWORDS = ["Anatomical", "Body Part", "Organ", "Tissue"]
DISEASE_KEYWORDS = ["Disease", "Neoplastic", "Syndrome", "Disorder"]
THERAPY_KEYWORDS = [
    "Drug", "Chemical", "Antibiotic", "Hormone", "Substance",
    "Pharmacologic", "Vitamin", "Steroid", "Preventive Procedure",
]
DEPRECATED_PARENT_CODES = ["c61063", "c85834"]  # obsolete / retired


def _contains_any(col: Column, keywords: list[str]) -> Column:
    hit = F.lit(False)
    for k in keywords:
        hit = hit | col.contains(k)
    return hit


def clean_rows(raw: DataFrame) -> DataFrame:
    """``cleanRawRow`` as one projection. Input columns: ``id``,
    ``name``, ``synonyms`` ('|'-joined), ``parents`` ('|'-joined),
    ``definition``, ``semanticType``, ``conceptStatus``.

    Output adds ``cls`` (routed endpoint), ``_load_error`` for rows in
    no/multiple categories (quarantine, never a throw)."""
    parents = F.filter(
        F.transform(F.split(F.coalesce("parents", F.lit("")), r"\|"),
                    lambda p: F.lower(F.trim(p))),
        lambda p: (p != "") & ~p.isin(DEPRECATED_PARENT_CODES),
    )
    raw_parents = F.transform(
        F.split(F.coalesce("parents", F.lit("")), r"\|"), lambda p: F.lower(F.trim(p))
    )
    synonyms = F.filter(
        F.transform(F.split(F.coalesce("synonyms", F.lit("")), r"\|"),
                    lambda s: F.trim(s)),
        lambda s: s != "",
    )
    dep = (
        F.arrays_overlap(raw_parents, F.array(*[F.lit(c) for c in DEPRECATED_PARENT_CODES]))
        | F.col("conceptStatus").isin("Obsolete_Concept", "Retired_Concept")
    )
    st = F.coalesce(F.col("semanticType"), F.lit(""))
    is_anat = _contains_any(st, ANATOMY_KEYWORDS)
    is_dis = _contains_any(st, DISEASE_KEYWORDS)
    is_ther = _contains_any(st, THERAPY_KEYWORDS)
    n_cats = is_anat.cast("int") + is_dis.cast("int") + is_ther.cast("int")
    cls = (
        F.when(n_cats > 1, F.lit(None))
        .when(is_anat, F.lit("AnatomicalEntity"))
        .when(is_dis, F.lit("Disease"))
        .when(is_ther, F.lit("Therapy"))
    )
    err = (
        F.when(n_cats > 1, F.concat(F.lit("concept in multiple categories: "), st))
        .when(n_cats == 0, F.concat(F.lit("concept not implemented: "), st))
    )
    return raw.select(
        F.lower(F.trim("id")).alias("sourceId"),
        F.trim("name").alias("name"),
        F.col("definition").alias("description"),
        dep.alias("deprecated"),
        parents.alias("subclassof"),
        synonyms.alias("synonyms"),
        cls.alias("cls"),
        err.alias("_load_error"),
    )


def dedup_names(cleaned: DataFrame) -> DataFrame:
    """A3: a (case-normalized) name held by >1 concept is demoted — the
    row keeps its sourceId as name and the contested name joins its
    synonyms (reference src/ncit/index.js:255-308)."""
    counts = cleaned.groupBy(F.lower("name").alias("__lname")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    out = cleaned.join(
        F.broadcast(counts.filter(F.col("__n") > 1)),
        F.lower(cleaned["name"]) == counts["__lname"],
        "left",
    )
    contested = F.col("__n").isNotNull()
    return out.select(
        "sourceId",
        F.when(contested, F.col("sourceId")).otherwise(F.col("name")).alias("name"),
        "description",
        "deprecated",
        "subclassof",
        F.when(contested, F.array_union("synonyms", F.array("name")))
        .otherwise(F.col("synonyms"))
        .alias("synonyms"),
        "cls",
        "_load_error",
    )


def load_ncit(
    spark: SparkSession, kb: KnowledgeBase, raw: DataFrame, source_name: str = "ncit"
) -> tuple[KnowledgeBase, DataFrame]:
    """Full pipeline: clean -> quarantine split -> name dedup -> terms +
    SubClassOf edges + synonym alias terms/edges. Returns (kb,
    quarantined rows)."""
    cleaned = clean_rows(raw)
    bad = cleaned.filter(F.col("_load_error").isNotNull())
    good = dedup_names(cleaned.filter(F.col("_load_error").isNull()))

    main = good.select(
        "sourceId", "name", "description", "deprecated", "cls", "subclassof"
    )
    # synonym rows: alias terms with their own sourceId-qualified key,
    # plus an AliasOf edge back to the main concept
    syn = good.select(
        "cls",
        F.col("sourceId").alias("__main_sid"),
        F.explode("synonyms").alias("name"),
    ).select(
        F.concat(F.col("__main_sid"), F.lit("::"), F.lower("name")).alias("sourceId"),
        "name",
        F.lit(None).cast("string").alias("description"),
        F.lit(False).alias("deprecated"),
        "cls",
        F.lit(None).cast("array<string>").alias("subclassof"),
        F.array("__main_sid").alias("aliasof"),
    )
    records = main.withColumn(
        "aliasof", F.lit(None).cast("array<string>")
    ).unionByName(syn.withColumn("alias", F.lit(True)), allowMissingColumns=True)
    kb = load_ontology_records(spark, kb, records, source_name)
    return kb, bad
