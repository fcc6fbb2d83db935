"""Therapy / evidence-record loaders: DrugBank XML and PubMed esummary
(reference /root/reference/src/drugbank/index.js and
/root/reference/src/entrez/pubmed.js).

The reference streams the multi-GB DrugBank XML element-by-element with
pause/resume backpressure (S4, src/drugbank/index.js:279-333); here the
file is read with Spark's native XML source (``rowTag='drug'``) so the
parse is partitioned across executors, and every record transform below
is Column algebra over the parsed structs — at 100 TB the whole loader
is scan -> project -> explode with no Python on the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# DrugBank
# ---------------------------------------------------------------------------

# explicit schema for rowTag='drug' (attribute prefix '_', text '_VALUE')
# — only the fields the reference reads (src/drugbank/index.js:36-76)
DRUGBANK_DRUG_SCHEMA = T.StructType(
    [
        T.StructField("_updated", T.StringType()),
        T.StructField(
            "drugbank-id",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("_VALUE", T.StringType()),
                        T.StructField("_primary", T.BooleanType()),
                    ]
                )
            ),
        ),
        T.StructField("name", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("mechanism-of-action", T.StringType()),
        T.StructField(
            "categories",
            T.StructType(
                [
                    T.StructField(
                        "category",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("category", T.StringType()),
                                    T.StructField("mesh-id", T.StringType()),
                                ]
                            )
                        ),
                    )
                ]
            ),
        ),
        T.StructField(
            "calculated-properties",
            T.StructType(
                [
                    T.StructField(
                        "property",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("kind", T.StringType()),
                                    T.StructField("value", T.StringType()),
                                ]
                            )
                        ),
                    )
                ]
            ),
        ),
        T.StructField(
            "atc-codes",
            T.StructType(
                [
                    T.StructField(
                        "atc-code",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("_code", T.StringType()),
                                    T.StructField(
                                        "level",
                                        T.ArrayType(
                                            T.StructType(
                                                [
                                                    T.StructField("_VALUE", T.StringType()),
                                                    T.StructField("_code", T.StringType()),
                                                ]
                                            )
                                        ),
                                    ),
                                ]
                            )
                        ),
                    )
                ]
            ),
        ),
        T.StructField(
            "products",
            T.StructType(
                [
                    T.StructField(
                        "product",
                        T.ArrayType(
                            T.StructType([T.StructField("name", T.StringType())])
                        ),
                    )
                ]
            ),
        ),
        T.StructField(
            "external-identifiers",
            T.StructType(
                [
                    T.StructField(
                        "external-identifier",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("resource", T.StringType()),
                                    T.StructField("identifier", T.StringType()),
                                ]
                            )
                        ),
                    )
                ]
            ),
        ),
    ]
)


def read_drugbank(spark: SparkSession, path: str) -> DataFrame:
    """Distributed parse of a DrugBank XML dump (S4)."""
    from graphkb_spark.sources.readers import read_xml_elements

    return read_xml_elements(spark, path, "drug", schema=DRUGBANK_DRUG_SCHEMA)


def load_drugbank(parsed: DataFrame) -> dict[str, DataFrame]:
    """Parsed drug structs -> Therapy rows + ATC terms + edges.

    Mirrors ``processRecord`` (src/drugbank/index.js:38-205):

    - ``sourceId`` = first ``drugbank-id`` text (:35);
    - therapy body: name, description, mechanismOfAction,
      ``sourceIdVersion`` = the ``updated`` attribute, ``subsets`` =
      category names, IUPAC name + molecular formula pulled from
      calculated-properties (:51-75);
    - ATC terms from the first atc-code's levels, ``SubClassOf`` ladder
      drug -> level0 -> level1 -> ... (:91-133);
    - commercial product names -> alias Therapy rows + ``AliasOf``
      edges, keeping only simple ``^[a-zA-Z]\\w+$`` names that differ
      from the drug name (:135-160);
    - ChEMBL external identifier -> ``CrossReferenceOf`` edge rows
      (:192-205 — emitted by (sourceId, chembl id) pair; resolution to
      rids is a later broadcast join, the batch-prefetch pattern S15).

    Returns ``{"therapies", "atc_terms", "edges"}`` — edges reference
    (out_sid, in_sid) natural keys.
    """
    base = parsed.select(
        F.get(F.col("`drugbank-id`"), 0)["_VALUE"].alias("sourceId"),
        F.col("_updated").alias("sourceIdVersion"),
        F.col("name"),
        F.col("description"),
        F.col("`mechanism-of-action`").alias("mechanismOfAction"),
        F.transform(F.col("categories.category"), lambda c: c["category"]).alias("subsets"),
        F.col("`calculated-properties`.property").alias("__props"),
        F.get(F.col("`atc-codes`.`atc-code`"), 0)["level"].alias("__atc"),
        F.col("products.product").alias("__products"),
        F.col("`external-identifiers`.`external-identifier`").alias("__xrefs"),
    )

    def prop(kind: str) -> F.Column:
        vals = F.filter(F.col("__props"), lambda p: p["kind"] == kind)
        return F.get(vals, 0)["value"]

    base = base.withColumn("iupacName", prop("IUPAC Name")).withColumn(
        "molecularFormula", prop("Molecular Formula")
    )

    therapies = base.select(
        "sourceId",
        "sourceIdVersion",
        F.col("name"),
        "description",
        "mechanismOfAction",
        "subsets",
        "iupacName",
        "molecularFormula",
    )

    atc = base.select("sourceId", F.posexplode("__atc").alias("pos", "lvl")).select(
        "sourceId",
        "pos",
        F.lower(F.col("lvl._code")).alias("atc_sid"),
        F.col("lvl._VALUE").alias("atc_name"),
    )
    atc_terms = atc.select(F.col("atc_sid").alias("sourceId"), F.col("atc_name").alias("name")).dropDuplicates(
        ["sourceId"]
    )

    # drug -> level0, then level_i -> level_{i+1}
    drug_to_l0 = atc.filter(F.col("pos") == 0).select(
        F.col("sourceId").alias("out_sid"),
        F.col("atc_sid").alias("in_sid"),
        F.lit("SubClassOf").alias("edge_class"),
    )
    nxt = atc.select(
        "sourceId", (F.col("pos") - 1).alias("pos"), F.col("atc_sid").alias("in_sid")
    )
    ladder = (
        atc.join(nxt, ["sourceId", "pos"])
        .select(
            F.col("atc_sid").alias("out_sid"),
            "in_sid",
            F.lit("SubClassOf").alias("edge_class"),
        )
        .dropDuplicates(["out_sid", "in_sid"])
    )

    alias_names = base.select(
        "sourceId",
        F.col("name").alias("__drug_name"),
        F.explode(
            F.array_distinct(F.transform(F.col("__products"), lambda p: p["name"]))
        ).alias("alias_name"),
    ).filter(
        F.col("alias_name").rlike("^[a-zA-Z]\\w+$")
        & (F.lower("alias_name") != F.lower("__drug_name"))
    )
    alias_therapies = alias_names.select(
        F.col("sourceId"),
        F.lower("alias_name").alias("name"),
        F.col("sourceId").alias("dependency"),
    ).dropDuplicates(["sourceId", "name"])
    alias_edges = alias_therapies.select(
        F.col("name").alias("out_sid"),
        F.col("sourceId").alias("in_sid"),
        F.lit("AliasOf").alias("edge_class"),
    )

    chembl_edges = base.select(
        F.col("sourceId").alias("out_sid"),
        F.explode(
            F.filter(F.col("__xrefs"), lambda x: F.lower(x["resource"]) == "chembl")
        ).alias("x"),
    ).select(
        "out_sid",
        F.col("x.identifier").alias("in_sid"),
        F.lit("CrossReferenceOf").alias("edge_class"),
    )

    edges = drug_to_l0.unionByName(ladder).unionByName(alias_edges).unionByName(chembl_edges)
    return {"therapies": therapies, "atc_terms": atc_terms, "edges": edges}


# ---------------------------------------------------------------------------
# PubMed
# ---------------------------------------------------------------------------


def parse_pubmed_records(raw: DataFrame) -> DataFrame:
    """esummary rows -> Publication rows (``parseRecord``,
    src/entrez/pubmed.js:32-59 + ``createDisplayName`` :62): title ->
    name, uid -> sourceId, year from the leading ``YYYY/`` of
    sortpubdate (falling back to sortdate), ``displayName`` =
    ``pmid:<uid>``.

    ``raw`` columns: ``uid``, ``title``, ``fulljournalname``,
    ``sortpubdate``, ``sortdate``.
    """
    year_src = F.coalesce(
        F.nullif(F.regexp_extract(F.col("sortpubdate"), r"^(\d{4})/", 1), F.lit("")),
        F.nullif(F.regexp_extract(F.col("sortdate"), r"^(\d{4})/", 1), F.lit("")),
    )
    return raw.select(
        F.col("uid").cast("string").alias("sourceId"),
        F.col("title").alias("name"),
        F.col("fulljournalname").alias("journalName"),
        year_src.cast("int").alias("year"),
        F.concat(F.lit("https://pubmed.ncbi.nlm.nih.gov/"), F.col("uid").cast("string")).alias(
            "url"
        ),
        F.concat(F.lit("pmid:"), F.col("uid").cast("string")).alias("displayName"),
    )
