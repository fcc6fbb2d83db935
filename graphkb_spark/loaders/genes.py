"""Gene / therapy dimension loaders: entrez gene, dbSNP, HGNC, RefSeq,
FDA-SRS (UNII) and ChEMBL (SURVEY §2.1 S14-S15, §7.3-§7.4).

Reference modules (all per-record awaited HTTP in the original):

- /root/reference/src/entrez/gene.js        (esummary -> Feature)
- /root/reference/src/entrez/snp.js         (esummary -> CatalogueVariant + Infers)
- /root/reference/src/hgnc/index.js         (Feature + DeprecatedBy/AliasOf/CrossReferenceOf)
- /root/reference/src/refseq/index.js       (versioned/generic transcript+protein ladder)
- /root/reference/src/fdaSrs/index.js       (UNII TSV -> Therapy + NCIt CrossReferenceOf)
- /root/reference/src/chembl/index.js       (Therapy + usan-stem SubClassOf parent)

Every loader here is pure Column algebra over rows already fetched by
``sources.readers`` / ``fetch_rest_batched`` — the reference's
record-at-a-time REST chains become one scan plus broadcast joins, so
each runs as a single narrow stage at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphkb_spark.functions.hashing import stable_hash_named
from graphkb_spark.loaders.features import load_feature_hierarchy

# ---------------------------------------------------------------------------
# entrez gene (src/entrez/gene.js:30-46 parseRecord)
# ---------------------------------------------------------------------------

ENTREZ_GENE_LINK_URL = "https://www.ncbi.nlm.nih.gov/gene"


def parse_entrez_genes(raw: DataFrame) -> DataFrame:
    """esummary gene records -> Feature rows.

    Required fields per the ajv spec (src/entrez/gene.js:19-28):
    ``uid`` (digits) and ``name``; rows failing the spec get ``_error``
    instead of failing the job (checkSpec error-list behavior).
    """
    bad = (
        F.col("uid").isNull()
        | ~F.col("uid").cast("string").rlike(r"^\d+$")
        | F.col("name").isNull()
    )
    return raw.select(
        F.lit("Feature").alias("cls"),
        F.lit("gene").alias("biotype"),
        F.col("uid").cast("string").alias("sourceId"),
        F.col("name").alias("name"),
        F.col("name").alias("displayName"),
        F.col("description").alias("longName"),
        F.col("summary").alias("description"),
        F.concat(F.lit(ENTREZ_GENE_LINK_URL + "/"), F.col("uid").cast("string")).alias(
            "url"
        ),
        F.when(bad, F.lit("spec: uid (^\\d+$) and name are required")).alias("_error"),
    )


# ---------------------------------------------------------------------------
# dbSNP (src/entrez/snp.js:107-150)
# ---------------------------------------------------------------------------


def parse_dbsnp_records(raw: DataFrame) -> DataFrame:
    """esummary snp records -> CatalogueVariant rows plus the HGVS cds /
    protein notations mined from ``docsum`` (src/entrez/snp.js:119-128):
    the ``HGVS=`` tag is split on ``,``, sorted descending, and the
    first ``NM_*:c.*`` / ``NP_*:p.*`` entries win.  The ``Infers`` edge
    to the parsed cds variant (snp.js:140-147) is emitted as a
    candidate column for the variant loader to resolve.

    Input columns: uid, snp_id, updatedate, docsum, genes (array<string>).
    All extraction is JVM-side array algebra — no UDF.
    """
    tags = F.split(F.replace(F.col("docsum"), F.lit("&gt;"), F.lit(">")), ";")
    hgvs_tag = F.get(F.filter(tags, lambda t: t.startswith("HGVS=")), 0)
    notations = F.reverse(
        F.array_sort(F.split(F.regexp_replace(hgvs_tag, "^HGVS=", ""), ","))
    )
    cds = F.get(F.filter(notations, lambda n: n.rlike(r"^NM_\d+.*:c\..*")), 0)
    protein = F.get(F.filter(notations, lambda n: n.rlike(r"^NP_\d+.*:p\..*")), 0)
    return raw.select(
        F.lit("CatalogueVariant").alias("cls"),
        F.col("uid").cast("string").alias("sourceId"),
        F.col("updatedate").alias("sourceIdVersion"),
        F.concat(F.lit("rs"), F.col("snp_id").cast("string")).alias("name"),
        F.concat(F.lit("rs"), F.col("snp_id").cast("string")).alias("displayName"),
        F.concat(
            F.lit("https://www.ncbi.nlm.nih.gov/snp/rs"),
            F.col("snp_id").cast("string"),
        ).alias("url"),
        F.col("genes").alias("gene_ids"),
        cds.alias("hgvs_cds"),
        protein.alias("hgvs_protein"),
        # Infers: out=parsed HGVS variant, in=this catalogue variant
        F.coalesce(cds, protein).alias("infers_notation"),
    )


# ---------------------------------------------------------------------------
# HGNC (src/hgnc/index.js:40-167)
# ---------------------------------------------------------------------------


def _hgnc_display(col: F.Column) -> F.Column:
    # createDisplayName, src/hgnc/index.js:40 (upper-case, ORF -> orf)
    return F.replace(F.upper(col), F.lit("ORF"), F.lit("orf"))


def _gene_rid(name: F.Column, sid: F.Column, src: str, deprecated=None) -> F.Column:
    return stable_hash_named(
        cls=F.lit("Feature"),
        biotype=F.lit("gene"),
        name=name,
        sourceId=sid,
        source=F.lit(src),
        deprecated=F.coalesce(deprecated, F.lit(False)) if deprecated is not None else F.lit(False),
    )


def load_hgnc(raw: DataFrame, source_name: str = "hgnc") -> dict[str, DataFrame]:
    """HGNC gene dump -> current Feature rows, deprecated prev-symbol
    rows (``DeprecatedBy`` -> current, src/hgnc/index.js:96-123), alias
    rows (``AliasOf`` -> current, :126-152), and ``CrossReferenceOf``
    candidates to ensembl (:73-94) and entrez (:154-166) by id.

    Input columns: hgnc_id, symbol, name, date_modified,
    ensembl_gene_id, entrez_id, prev_symbol (array), alias_symbol (array).
    Returns {'features': ..., 'edges': ..., 'xrefs': ...}; ``xrefs``
    carries (out_rid, ext_source, ext_sourceId) for resolution against
    the ensembl / entrez feature tables by the caller (broadcast join).
    """
    spec_bad = (
        F.col("hgnc_id").isNull()
        | ~F.col("hgnc_id").rlike(r"^HGNC:[0-9]+$")
        | F.col("symbol").isNull()
    )
    rows = raw.withColumn(
        "_error", F.when(spec_bad, F.lit("spec: hgnc_id (^HGNC:[0-9]+$) required"))
    )
    cur_rid = _gene_rid(F.col("symbol"), F.col("hgnc_id"), source_name)

    current = rows.select(
        cur_rid.alias("rid"),
        F.lit("Feature").alias("cls"),
        F.lit("gene").alias("biotype"),
        F.lit(False).alias("deprecated"),
        _hgnc_display(F.col("symbol")).alias("displayName"),
        F.col("name").alias("longName"),
        F.col("symbol").alias("name"),
        F.col("hgnc_id").alias("sourceId"),
        F.col("date_modified").alias("sourceIdVersion"),
        F.lit(None).cast("string").alias("dependency"),
        F.col("_error"),
    )

    def _satellite(sym_col: str, deprecated: bool, edge_class: str) -> tuple:
        ex = rows.filter(F.col("_error").isNull()).select(
            F.col("hgnc_id"),
            cur_rid.alias("current_rid"),
            F.explode_outer(F.col(sym_col)).alias("sym"),
        ).filter(F.col("sym").isNotNull())
        feats = ex.select(
            _gene_rid(
                F.col("sym"), F.col("hgnc_id"), source_name, F.lit(deprecated)
            ).alias("rid"),
            F.lit("Feature").alias("cls"),
            F.lit("gene").alias("biotype"),
            F.lit(deprecated).alias("deprecated"),
            _hgnc_display(F.col("sym")).alias("displayName"),
            F.lit(None).cast("string").alias("longName"),
            F.col("sym").alias("name"),
            F.col("hgnc_id").alias("sourceId"),
            F.lit(None).cast("string").alias("sourceIdVersion"),
            F.col("current_rid").alias("dependency"),
            F.lit(None).cast("string").alias("_error"),
        )
        edges = ex.select(
            _gene_rid(F.col("sym"), F.col("hgnc_id"), source_name, F.lit(deprecated))
            .alias("out_rid"),
            F.col("current_rid").alias("in_rid"),
            F.lit(edge_class).alias("edge_class"),
            F.lit(source_name).alias("source_rid"),
        )
        return feats, edges

    prev_feats, prev_edges = _satellite("prev_symbol", True, "DeprecatedBy")
    alias_feats, alias_edges = _satellite("alias_symbol", False, "AliasOf")

    xrefs = None
    for ext_col, ext_src in (("ensembl_gene_id", "ensembl"), ("entrez_id", "entrez gene")):
        x = rows.filter(F.col("_error").isNull() & F.col(ext_col).isNotNull()).select(
            cur_rid.alias("out_rid"),
            F.lit(ext_src).alias("ext_source"),
            F.col(ext_col).cast("string").alias("ext_sourceId"),
            F.lit("CrossReferenceOf").alias("edge_class"),
        )
        xrefs = x if xrefs is None else xrefs.unionByName(x)

    return {
        "features": current.unionByName(prev_feats).unionByName(alias_feats),
        "edges": prev_edges.unionByName(alias_edges),
        "xrefs": xrefs,
    }


def resolve_xrefs(xrefs: DataFrame, ext_features: DataFrame) -> DataFrame:
    """Resolve (ext_source, ext_sourceId) against an external feature
    table (broadcast — dimension-sized) -> concrete edge rows; misses
    are dropped exactly as the reference swallows the lookup error
    (src/hgnc/index.js:92-94)."""
    dim = F.broadcast(
        ext_features.select(
            F.col("source_name").alias("ext_source"),
            F.col("sourceId").alias("ext_sourceId"),
            F.col("rid").alias("in_rid"),
        )
    )
    return xrefs.join(dim, ["ext_source", "ext_sourceId"], "inner").select(
        "out_rid", "in_rid", "edge_class"
    )


# ---------------------------------------------------------------------------
# RefSeq (src/refseq/index.js:22-146)
# ---------------------------------------------------------------------------


def load_refseq(spark, kb, raw: DataFrame):
    """RefSeq TSV (columns RNA, GeneID, Protein; ids version-suffixed
    ``NM_000546.5``) -> the same versioned/generic ladder the ensembl
    loader builds: per level a generic (unversioned) and versioned
    Feature linked ``GeneralizationOf``, protein ``ElementOf``
    transcript (src/refseq/index.js:55-146).  Reuses
    ``load_feature_hierarchy`` after splitting the version suffix.
    """
    rows = raw.select(
        F.col("GeneID").cast("string").alias("gene_id"),
        F.lit(None).cast("string").alias("gene_version"),
        F.split_part(F.col("RNA"), F.lit("."), F.lit(1)).alias("transcript_id"),
        F.nullif(F.split_part(F.col("RNA"), F.lit("."), F.lit(2)), F.lit("")).alias(
            "transcript_version"
        ),
        F.split_part(F.coalesce(F.col("Protein"), F.lit("")), F.lit("."), F.lit(1)).alias(
            "_prot"
        ),
        F.nullif(
            F.split_part(F.coalesce(F.col("Protein"), F.lit("")), F.lit("."), F.lit(2)),
            F.lit(""),
        ).alias("protein_version"),
    ).withColumn("protein_id", F.nullif(F.col("_prot"), F.lit(""))).drop("_prot")
    return load_feature_hierarchy(spark, kb, rows, source_name="refseq")


# ---------------------------------------------------------------------------
# FDA-SRS / UNII (src/fdaSrs/index.js:10-108)
# ---------------------------------------------------------------------------

FDA_SRS_HEADER = {  # convertRowFields HEADER, src/fdaSrs/index.js:10-15
    "id": "UNII",
    "name": "PT",
    "ncit": "NCIT",
    "pubchem": "PUBCHEM",
}


def load_fda_srs(raw: DataFrame, ncit_therapies: DataFrame) -> dict[str, DataFrame]:
    """UNII TSV -> Therapy rows; rows lacking name or id are skipped
    (src/fdaSrs/index.js:52-56); the NCIT column resolves against the
    NCIt therapy table and yields ``CrossReferenceOf`` out=fda in=ncit
    (:92-99); a stated-but-unresolvable NCIt id becomes a row error
    (:66-79 error count).

    ``ncit_therapies`` needs (rid, sourceId) — dimension-sized, so the
    lookup is an explicit broadcast join.
    """
    mapped = raw.select(
        *[F.col(src).alias(dst) for dst, src in FDA_SRS_HEADER.items()]
    ).filter(F.col("name").isNotNull() & F.col("id").isNotNull())

    dim = F.broadcast(
        ncit_therapies.select(
            F.col("sourceId").alias("ncit"), F.col("rid").alias("ncit_rid")
        )
    )
    resolved = mapped.join(dim, "ncit", "left")
    rid = stable_hash_named(
        cls=F.lit("Therapy"), sourceId=F.col("id"), source=F.lit("fdaSrs")
    )
    therapies = resolved.select(
        rid.alias("rid"),
        F.lit("Therapy").alias("cls"),
        F.col("name"),
        F.col("id").alias("sourceId"),
        F.when(
            F.col("ncit").isNotNull() & F.col("ncit_rid").isNull(),
            F.concat(F.lit("ncit therapy not found: "), F.col("ncit")),
        ).alias("_error"),
    )
    edges = resolved.filter(F.col("ncit_rid").isNotNull()).select(
        rid.alias("out_rid"),
        F.col("ncit_rid").alias("in_rid"),
        F.lit("CrossReferenceOf").alias("edge_class"),
        F.lit("fdaSrs").alias("source_rid"),
    )
    return {"therapies": therapies, "edges": edges}


# ---------------------------------------------------------------------------
# ChEMBL (src/chembl/index.js:30-100)
# ---------------------------------------------------------------------------


def parse_chembl_records(raw: DataFrame) -> dict[str, DataFrame]:
    """ChEMBL molecule records -> Therapy rows.  name falls back to the
    molecular formula (src/chembl/index.js:49-52); displayName is
    ``<name> [<CHEMBLID upper>]`` (:55-59); a ``usan_stem_definition``
    becomes a parent Therapy linked ``SubClassOf`` out=drug in=parent
    (:76-99).

    Input columns: molecule_chembl_id, pref_name, full_molformula,
    usan_stem_definition.
    """
    name = F.coalesce(F.col("pref_name"), F.col("full_molformula"))
    sid = F.col("molecule_chembl_id")
    rid = stable_hash_named(cls=F.lit("Therapy"), sourceId=sid, source=F.lit("chembl"))
    therapies = raw.select(
        rid.alias("rid"),
        F.lit("Therapy").alias("cls"),
        name.alias("name"),
        sid.alias("sourceId"),
        F.when(name.isNotNull(), F.concat(name, F.lit(" ["), F.upper(sid), F.lit("]")))
        .otherwise(F.upper(sid))
        .alias("displayName"),
        F.col("full_molformula").alias("molecularFormula"),
        F.lit(None).cast("string").alias("comment"),
    )
    stems = (
        raw.filter(F.col("usan_stem_definition").isNotNull())
        .select(F.col("usan_stem_definition").alias("stem"))
        .dropDuplicates()
    )
    stem_rid = stable_hash_named(
        cls=F.lit("Therapy"), sourceId=F.col("stem"), source=F.lit("chembl")
    )
    parents = stems.select(
        stem_rid.alias("rid"),
        F.lit("Therapy").alias("cls"),
        F.col("stem").alias("name"),
        F.col("stem").alias("sourceId"),
        F.col("stem").alias("displayName"),
        F.lit(None).cast("string").alias("molecularFormula"),
        F.lit("usan stem definition").alias("comment"),
    )
    edges = raw.filter(F.col("usan_stem_definition").isNotNull()).select(
        rid.alias("out_rid"),
        stable_hash_named(
            cls=F.lit("Therapy"),
            sourceId=F.col("usan_stem_definition"),
            source=F.lit("chembl"),
        ).alias("in_rid"),
        F.lit("SubClassOf").alias("edge_class"),
        F.lit("chembl").alias("source_rid"),
    )
    return {"therapies": therapies.unionByName(parents), "edges": edges}


# ---------------------------------------------------------------------------
# entrez nucleotide / refseq esummary (src/entrez/refseq.js:24-63,74-108)
# ---------------------------------------------------------------------------


def parse_entrez_refseq(raw: DataFrame, versioned: bool = True) -> DataFrame:
    """Refseq/nucleotide esummary records -> Feature rows.

    Spec (src/entrez/refseq.js:24-35): ``accessionversion`` must match
    ``^N[A-Z]_\\d+\\.\\d+$`` and ``biomol`` one of genomic/rna/peptide/
    mRNA.  biotype mapping (:44-50): genomic -> chromosome, peptide ->
    protein, else transcript; chromosomes take ``subname`` as name
    (:58-60).  When ``versioned`` is False the reference strips the
    version and longName for ids requested without one (:96-106).
    """
    from graphkb_spark.operators.validate import compile_json_spec

    acc = F.col("accessionversion")
    # declarative replica of the reference recordSpec
    # (src/entrez/refseq.js:24-35) compiled to Column predicates;
    # required + pattern/enum covers the null cases three-valued logic
    # would otherwise let through quarantine
    spec = {
        "properties": {
            "accessionversion": {"type": "string",
                                 "pattern": r"^N[A-Z]_\d+\.\d+$"},
            "biomol": {"enum": ["genomic", "rna", "peptide", "mRNA"]},
            "title": {"type": "string"},
        },
        "required": ["accessionversion", "biomol", "title"],
    }
    compiled = compile_json_spec(spec, raw.schema)
    bad = compiled[0][1]
    for _, pred in compiled[1:]:
        bad = bad | pred
    biotype = (
        F.when(F.col("biomol") == "genomic", F.lit("chromosome"))
        .when(F.col("biomol") == "peptide", F.lit("protein"))
        .otherwise(F.lit("transcript"))
    )
    sid = F.split_part(acc, F.lit("."), F.lit(1))
    ver = F.split_part(acc, F.lit("."), F.lit(2))
    return raw.select(
        F.lit("Feature").alias("cls"),
        biotype.alias("biotype"),
        sid.alias("sourceId"),
        (F.nullif(ver, F.lit("")) if versioned else F.lit(None).cast("string")).alias(
            "sourceIdVersion"
        ),
        (F.upper(acc) if versioned else F.upper(sid)).alias("displayName"),
        (F.col("title") if versioned else F.lit(None).cast("string")).alias("longName"),
        F.when(biotype == "chromosome", F.col("subname")).alias("name"),
        F.when(
            bad, F.lit("spec: accessionversion (^N[A-Z]_\\d+\\.\\d+$) / biomol / title")
        ).alias("_error"),
    )


# ---------------------------------------------------------------------------
# GSC therapeutic ontology (src/gscTherapeuticOntology.js)
# ---------------------------------------------------------------------------

GSC_THERAPY_HEADER = {  # src/gscTherapeuticOntology.js:13-20
    "alias": "alias",
    "drugbank": "DrugBankID",
    "grandparent1": "Class_2",
    "grandparent2": "Class_3_pathway",
    "name": "source",
    "parent": "Class_1",
}

_GSC_TAGS = {  # src/gscTherapeuticOntology.js:22-26
    "parent": "specific drug class",
    "grandparent1": "general drug class",
    "grandparent2": "pathway drug class",
}


def _gsc_clean(col: F.Column) -> F.Column:
    # trim().toLowerCase().replace(/\binhibitors\b/, 'inhibitor'),
    # src/gscTherapeuticOntology.js:157-159
    return F.regexp_replace(F.lower(F.trim(col)), r"\binhibitors\b", "inhibitor")


def load_gsc_therapeutic_ontology(
    raw: DataFrame,
    external_therapies: DataFrame,
    source_name: str = "gsc therapeutic ontology",
) -> dict[str, DataFrame]:
    """BCGSC custom drug-class ontology TSV -> Therapy rows + edges.

    Reference flow (src/gscTherapeuticOntology.js:29-200): every name
    column is cleaned (lower/trim, inhibitors -> inhibitor); the drug
    and each alias resolve against DrugBank-then-ChEMBL by name and are
    created under this source only on miss, tagged with ``subsets``
    naming which class columns they equal (:33-76); the three class
    columns always become own-source Therapy rows cross-referenced to
    same-name DrugBank records (:80-133); edges: alias -(AliasOf)->
    drug, drug -(SubClassOf)-> parent, parent -(SubClassOf)->
    grandparent1 and grandparent2 — both grandparents hang off the
    parent (:181-200) — self-links skipped.

    ``external_therapies`` needs (name, rid, priority) with lower
    priority preferred (0=drugbank, 1=chembl, J3 cascade order); it is
    dimension-sized and broadcast.
    """
    from pyspark.sql.window import Window

    cols = {dst: _gsc_clean(F.col(src)) for dst, src in GSC_THERAPY_HEADER.items()}
    rows = raw.select(*[c.alias(n) for n, c in cols.items()])

    # best external match per cleaned name (drugbank beats chembl);
    # ext_priority kept so class xrefs can restrict to DrugBank matches
    w = Window.partitionBy("name").orderBy("priority")
    ext = F.broadcast(
        external_therapies.select(
            _gsc_clean(F.col("name")).alias("name"), "rid", "priority"
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("name", F.col("rid").alias("ext_rid"), F.col("priority").alias("ext_priority"))
    )

    def tags_for(name_col: F.Column):
        return F.filter(
            F.array(
                *[
                    F.when(name_col == F.col(slot), F.lit(tag))
                    for slot, tag in _GSC_TAGS.items()
                ]
            ),
            lambda t: t.isNotNull(),
        )

    def own_rid(name_col: F.Column) -> F.Column:
        return stable_hash_named(
            cls=F.lit("Therapy"), name=name_col, source=F.lit(source_name)
        )

    # drug + aliases: resolve-or-create (getDrugOrAdd, :33-76)
    drugs = (
        rows.select(
            F.explode(
                F.array_union(
                    F.array(F.col("name")),
                    F.filter(
                        F.split(F.coalesce(F.col("alias"), F.lit("")), r"\s*,\s*"),
                        lambda t: (t != "") & (t != F.col("name")),
                    ),
                )
            ).alias("term"),
            "parent", "grandparent1", "grandparent2",
        )
        .filter(F.col("term") != "")
        .withColumn("subsets", tags_for(F.col("term")))
    )
    drugs = drugs.join(ext.withColumnRenamed("name", "term"), "term", "left")
    created_drugs = (
        drugs.filter(F.col("ext_rid").isNull())
        .select(
            own_rid(F.col("term")).alias("rid"),
            F.lit("Therapy").alias("cls"),
            F.col("term").alias("name"),
            F.col("term").alias("sourceId"),
            F.array_sort("subsets").alias("subsets"),
            F.lit(source_name).alias("source_name"),
        )
        .dropDuplicates(["rid"])
    )

    # classes are always own-source rows (addDrugClass, :80-110)
    classes = None
    for slot in ("parent", "grandparent1", "grandparent2"):
        c = rows.filter(F.col(slot).isNotNull() & (F.col(slot) != "")).select(
            own_rid(F.col(slot)).alias("rid"),
            F.lit("Therapy").alias("cls"),
            F.col(slot).alias("name"),
            F.col(slot).alias("sourceId"),
            F.array_sort(tags_for(F.col(slot))).alias("subsets"),
            F.lit(source_name).alias("source_name"),
        )
        classes = c if classes is None else classes.unionByName(c)
    classes = classes.dropDuplicates(["rid"])

    resolved = rows.join(ext, "name", "left").withColumn(
        "drug_rid", F.coalesce(F.col("ext_rid"), own_rid(F.col("name")))
    )
    edges = None
    # drug -> parent, parent -> grandparent1/2 (SubClassOf, :181-200).
    # The grandparent legs hang off the parent, so they require a
    # non-empty parent (the reference links grandparents only inside
    # `if (parent)`, :185-205) — otherwise own_rid('') would produce
    # edges out of a Therapy node that is never created.
    for out_col, in_col in (
        ("drug_rid", "parent"),
        ("parent", "grandparent1"),
        ("parent", "grandparent2"),
    ):
        keep = F.col(in_col).isNotNull() & (F.col(in_col) != "")
        if out_col != "drug_rid":
            keep = keep & F.col(out_col).isNotNull() & (F.col(out_col) != "")
        out_rid = F.col(out_col) if out_col == "drug_rid" else own_rid(F.col(out_col))
        e = (
            resolved.filter(keep)
            .select(
                out_rid.alias("out_rid"),
                own_rid(F.col(in_col)).alias("in_rid"),
                F.lit("SubClassOf").alias("edge_class"),
                F.lit(source_name).alias("source_rid"),
            )
            .filter(F.col("out_rid") != F.col("in_rid"))
        )
        edges = e if edges is None else edges.unionByName(e)
    # alias -(AliasOf)-> drug (:176-180)
    alias_edges = (
        resolved.select(
            F.col("drug_rid"),
            F.explode(
                F.filter(
                    F.split(F.coalesce(F.col("alias"), F.lit("")), r"\s*,\s*"),
                    lambda t: (t != "") & (t != F.col("name")),
                )
            ).alias("term"),
        )
        .join(ext.withColumnRenamed("name", "term"), "term", "left")
        .select(
            F.coalesce(F.col("ext_rid"), own_rid(F.col("term"))).alias("out_rid"),
            F.col("drug_rid").alias("in_rid"),
            F.lit("AliasOf").alias("edge_class"),
            F.lit(source_name).alias("source_rid"),
        )
    )
    # class -(CrossReferenceOf)-> same-name external match (:113-133);
    # the reference restricts this lookup to DrugBank-source records
    # (priority 0), not the combined drugbank+chembl dimension
    xref_edges = (
        classes.join(ext.withColumnRenamed("name", "cname"),
                     classes["name"] == F.col("cname"), "inner")
        .filter(F.col("ext_priority") == 0)
        .select(
            F.col("rid").alias("out_rid"),
            F.col("ext_rid").alias("in_rid"),
            F.lit("CrossReferenceOf").alias("edge_class"),
            F.lit(source_name).alias("source_rid"),
        )
    )
    all_edges = edges.unionByName(alias_edges).unionByName(xref_edges)
    # drug -(CrossReferenceOf)-> DrugBank record keyed by DBxxxxx
    # sourceId (:213-239) — only when the external dimension carries a
    # sourceId column; self-links skipped
    if "sourceId" in external_therapies.columns:
        db_by_sid = F.broadcast(
            external_therapies.filter(F.col("priority") == 0).select(
                F.upper(F.col("sourceId")).alias("__dbid"),
                F.col("rid").alias("__db_rid"),
            )
        )
        db_edges = (
            resolved.filter(F.upper(F.col("drugbank")).rlike(r"^DB\d+$"))
            .join(db_by_sid, F.upper(F.col("drugbank")) == F.col("__dbid"), "inner")
            .select(
                F.col("drug_rid").alias("out_rid"),
                F.col("__db_rid").alias("in_rid"),
                F.lit("CrossReferenceOf").alias("edge_class"),
                F.lit(source_name).alias("source_rid"),
            )
            .filter(F.col("out_rid") != F.col("in_rid"))
        )
        all_edges = all_edges.unionByName(db_edges)
    return {
        "therapies": created_drugs.unionByName(classes).dropDuplicates(["rid"]),
        "edges": all_edges
        .dropDuplicates(["out_rid", "in_rid", "edge_class"]),
    }
