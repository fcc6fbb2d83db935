"""Tests for the gene/therapy dimension loaders (loaders/genes.py),
paper-supplement / curated-content loaders (loaders/papers.py), and the
DOCM / CGL statement loaders — each asserting the reference's golden
transform behavior (citations in the module docstrings)."""

import pytest
from pyspark.sql import Row, functions as F

from graphkb_spark.loaders.genes import (
    load_fda_srs,
    load_hgnc,
    load_refseq,
    parse_chembl_records,
    parse_dbsnp_records,
    parse_entrez_genes,
    resolve_xrefs,
)
from graphkb_spark.loaders.papers import (
    collapse_abstract_dups,
    load_asco_abstracts,
    load_fda_approvals,
    load_pmc4232638,
    load_pmc4468049_fusions,
    load_variant_list,
    reconstruct_merged_header,
)
from graphkb_spark.loaders.statements import load_cgl, load_docm


def rows(df):
    return [r.asDict() for r in df.collect()]


# ---------------------------------------------------------------------------
# genes.py
# ---------------------------------------------------------------------------


def test_parse_entrez_genes(spark):
    df = spark.createDataFrame(
        [
            ("673", "BRAF", "B-Raf proto-oncogene", "kinase summary"),
            ("not-digits", "X", None, None),
        ],
        "uid string, name string, description string, summary string",
    )
    out = {r["sourceId"]: r for r in rows(parse_entrez_genes(df))}
    good = out["673"]
    assert good["_error"] is None
    assert good["biotype"] == "gene"
    assert good["longName"] == "B-Raf proto-oncogene"
    assert good["description"] == "kinase summary"
    assert good["url"].endswith("/gene/673")
    assert out["not-digits"]["_error"] is not None


def test_parse_dbsnp_docsum_hgvs(spark):
    # descending sort means NM_ before NC_, NP_ picked independently
    docsum = (
        "GENE=BRAF;HGVS=NC_000007.14:g.140753336A&gt;T,"
        "NM_004333.6:c.1799T&gt;A,NP_004324.2:p.Val600Glu;LEN=1"
    )
    df = spark.createDataFrame(
        [Row(uid="121913529", snp_id=113488022, updatedate="2024/01/01",
             docsum=docsum, genes=["673"])]
    )
    (r,) = rows(parse_dbsnp_records(df))
    assert r["name"] == "rs113488022"
    assert r["hgvs_cds"] == "NM_004333.6:c.1799T>A"
    assert r["hgvs_protein"] == "NP_004324.2:p.Val600Glu"
    assert r["infers_notation"] == "NM_004333.6:c.1799T>A"


def test_load_hgnc_satellites_and_xrefs(spark):
    df = spark.createDataFrame(
        [
            Row(
                hgnc_id="HGNC:1097", symbol="BRAF", name="B-Raf proto-oncogene",
                date_modified="2024-01-01", ensembl_gene_id="ENSG00000157764",
                entrez_id="673", prev_symbol=["BRAF1"], alias_symbol=["B-RAF1"],
            )
        ]
    )
    out = load_hgnc(df)
    feats = rows(out["features"])
    by_name = {f["name"]: f for f in feats}
    assert by_name["BRAF"]["deprecated"] is False
    assert by_name["BRAF"]["displayName"] == "BRAF"
    assert by_name["BRAF1"]["deprecated"] is True
    assert by_name["BRAF1"]["dependency"] == by_name["BRAF"]["rid"]
    assert by_name["B-RAF1"]["deprecated"] is False
    edges = {(e["edge_class"]) for e in rows(out["edges"])}
    assert edges == {"DeprecatedBy", "AliasOf"}
    # xref resolution drops misses, keeps hits (src/hgnc/index.js:92-94)
    ext = spark.createDataFrame(
        [Row(source_name="ensembl", sourceId="ENSG00000157764", rid="ens-rid")]
    )
    resolved = rows(resolve_xrefs(out["xrefs"], ext))
    assert len(resolved) == 1
    assert resolved[0]["in_rid"] == "ens-rid"


def test_load_hgnc_orf_display(spark):
    df = spark.createDataFrame(
        [("HGNC:1", "C9orf72", None, None, None, None, [], [])],
        "hgnc_id string, symbol string, name string, date_modified string, "
        "ensembl_gene_id string, entrez_id string, "
        "prev_symbol array<string>, alias_symbol array<string>",
    )
    (r,) = [f for f in rows(load_hgnc(df)["features"]) if f["name"] == "C9orf72"]
    assert r["displayName"] == "C9orf72"


def test_load_refseq_ladder(spark):
    from graphkb_spark.kb import empty_kb

    raw = spark.createDataFrame(
        [Row(RNA="NM_000546.5", GeneID=7157, Protein="NP_000537.3")]
    )
    kb = load_refseq(spark, empty_kb(spark), raw)
    feats = rows(kb.features)
    keyed = {(f["biotype"], f["sourceId"], f["sourceIdVersion"]) for f in feats}
    assert ("transcript", "NM_000546", "5") in keyed
    assert ("transcript", "NM_000546", None) in keyed
    assert ("protein", "NP_000537", "3") in keyed
    assert ("protein", "NP_000537", None) in keyed
    classes = [e["edge_class"] for e in rows(kb.edges)]
    assert classes.count("GeneralizationOf") == 2
    assert "ElementOf" in classes


def test_load_fda_srs(spark):
    raw = spark.createDataFrame(
        [
            ("U1", "drugA", "C100", None),
            ("U2", "drugB", "C404", None),  # ncit id that resolves nowhere
            ("U3", None, None, None),  # skipped: no name
        ],
        "UNII string, PT string, NCIT string, PUBCHEM string",
    )
    ncit = spark.createDataFrame([Row(rid="ncit-rid", sourceId="C100")])
    out = load_fda_srs(raw, ncit)
    ther = {t["sourceId"]: t for t in rows(out["therapies"])}
    assert set(ther) == {"U1", "U2"}  # U3 skipped: no name
    assert ther["U1"]["_error"] is None
    assert "not found" in ther["U2"]["_error"]
    (edge,) = rows(out["edges"])
    assert edge["in_rid"] == "ncit-rid"
    assert edge["edge_class"] == "CrossReferenceOf"


def test_parse_chembl_records(spark):
    raw = spark.createDataFrame(
        [
            Row(molecule_chembl_id="CHEMBL553", pref_name="ERLOTINIB",
                full_molformula="C22H23N3O4", usan_stem_definition="-tinib"),
            Row(molecule_chembl_id="chembl999", pref_name=None,
                full_molformula="C2H6O", usan_stem_definition=None),
        ]
    )
    out = parse_chembl_records(raw)
    ther = {t["sourceId"]: t for t in rows(out["therapies"])}
    assert ther["CHEMBL553"]["displayName"] == "ERLOTINIB [CHEMBL553]"
    assert ther["chembl999"]["name"] == "C2H6O"  # molformula fallback
    assert ther["chembl999"]["displayName"] == "C2H6O [CHEMBL999]"
    assert ther["-tinib"]["comment"] == "usan stem definition"
    (edge,) = rows(out["edges"])
    assert edge["edge_class"] == "SubClassOf"
    assert edge["in_rid"] == ther["-tinib"]["rid"]


# ---------------------------------------------------------------------------
# papers.py
# ---------------------------------------------------------------------------


def test_reconstruct_merged_header():
    raw = [
        ["junk"],  # row 0 ignored by the reference (title row)
        ["Mutation", None, "TP53", None],
        [None, "Gene", "GOF", "LOF"],
        ["a", "BRAF", "yes", "----"],
    ]
    header, data = reconstruct_merged_header(raw)
    assert header == ["Mutation", "Mutation - Gene", "TP53 - GOF", "TP53 - LOF"]
    assert data == [["a", "BRAF", "yes", None]]


def test_load_pmc4232638_relevance(spark):
    cols = ("gene string, aa_change string, functional_classification string, "
            "type string, pmids string, kinase string, tp53_gof string, "
            "tp53_lof string, tp53_dominant_negative string")
    df = spark.createDataFrame(
        [
            # kinase oncogene -> likely gain of function
            ("BRAF", "V600E", "non-neutral", "Oncogene", "123, 456 (tag)", "yes", None, None, None),
            # TP53 gof + lof -> multi-category skip
            ("TP53", "R175H", "non-neutral", "TSG", None, "no", "yes", "yes", None),
            # TP53 lof + domneg -> dominant negative
            ("TP53", "R248W", "non-neutral", "TSG", None, "no", "no effect", "yes", "yes"),
            # TP53 lof only
            ("TP53", "R273H", "non-neutral", "TSG", None, "no", "no ", "yes", "no "),
            # neutral -> dropped
            ("KRAS", "G12D", "neutral", "Oncogene", None, "yes", None, None, None),
        ],
        cols,
    )
    out = {(r["gene"], r["variant_notation"]): r for r in rows(load_pmc4232638(df))}
    assert out[("BRAF", "p.V600E")]["relevance"] == "likely gain of function"
    assert out[("BRAF", "p.V600E")]["evidence_pmids"] == ["25348012", "123", "456"]
    assert ("TP53", "p.R175H") not in out  # multi-category
    assert out[("TP53", "p.R248W")]["relevance"] == "dominant negative"
    assert out[("TP53", "p.R273H")]["relevance"] == "loss of function"
    assert ("KRAS", "p.G12D") not in out
    assert out[("BRAF", "p.V600E")]["variant"]["variant_type"] == "missense"


def test_load_pmc4468049_fusions(spark):
    df = spark.createDataFrame(
        [
            Row(geneA="TPM3", geneB="NTRK1", kinaseA="no", kinaseB="yes",
                break1=154170400, break2=156874906, disease="thyroid"),
            Row(geneA="A", geneB="B", kinaseA="yes", kinaseB="yes",
                break1=1, break2=2, disease="x"),
        ]
    )
    out = rows(load_pmc4468049_fusions(df))
    good = [r for r in out if r["_error"] is None][0]
    assert good["subject_gene"] == "NTRK1"
    assert good["variant_displayName"] == "(TPM3,NTRK1):fusion(g.154170400,g.156874906)"
    assert good["break1Start"]["pos"] == 154170400
    bad = [r for r in out if r["_error"] is not None][0]
    assert "kinase partner" in bad["_error"]


def test_load_variant_list(spark):
    df = spark.createDataFrame([("p.G12D",), ("   ",), ("c.35G>A",)], "value string")
    out = rows(load_variant_list(df))
    assert len(out) == 2
    assert {r["notation"] for r in out} == {"p.G12D", "c.35G>A"}
    assert all(r["variant"]["error"] is None for r in out)


def test_collapse_abstract_dups_and_load(spark):
    df = spark.createDataFrame(
        [
            Row(id="a1", AbstID="8001", Year="2014", Meeting="ASCO 2014",
                Title="t", FirstAuthor="fa", AuthorString=None, url=None),
            Row(id="a1", AbstID="8001", Year="2014", Meeting="ASCO 2014",
                Title="t", FirstAuthor="fa", AuthorString="more filled", url="u"),
            Row(id="a2", AbstID="9000", Year="2015", Meeting="ASCO 2015",
                Title="t2", FirstAuthor="fb", AuthorString=None, url=None),
        ]
    )
    collapsed = rows(collapse_abstract_dups(df))
    assert len(collapsed) == 2
    winner = [r for r in collapsed if r["AbstID"] == "8001"][0]
    assert winner["AuthorString"] == "more filled"  # higher fill-score wins
    recs = {r["abstractNumber"]: r for r in rows(load_asco_abstracts(df))}
    assert recs["8001"]["displayName"] == "ASCO 2014 (abstract 8001)"
    assert recs["9000"]["year"] == 2015


def test_load_fda_approvals_consensus_year(spark):
    df = spark.createDataFrame(
        [
            Row(link="/a", title="Approval A",
                content="On May 4, 2023 the FDA approved.\nAction date May 5, 2023."),
            Row(link="/b", title="Approval B",
                content="On Jan 1, 2020 x.\nPreviously Dec 1, 2019."),
        ]
    )
    out = {r["sourceId"]: r for r in rows(load_fda_approvals(df))}
    assert out["/a"]["year"] == 2023
    assert out["/b"]["year"] is None  # no consensus
    assert out["/a"]["url"] == "https://www.fda.gov/a"
    assert out["/a"]["cls"] == "CuratedContent"


# ---------------------------------------------------------------------------
# DOCM / CGL
# ---------------------------------------------------------------------------


def test_load_docm(spark):
    schema = (
        "hgvs string, amino_acid string, gene string, chromosome string, "
        "reference_version string, start long, stop long, reference string, "
        "variant string, variant_type string, "
        "diseases array<struct<doid:int,source_pubmed_id:long,tags:array<string>>>"
    )
    df = spark.createDataFrame(
        [
            ("ENST1:c.1799T>A", "p.V600E", "BRAF", "7", "GRCh37",
             140453136, 140453136, "A", "T", "SNV",
             [Row(doid=1324, source_pubmed_id=123, tags=["lung"]),
              Row(doid=999, source_pubmed_id=456, tags=["a", "b"])]),
            ("x", "p.KK12-", "KRAS", "12", "GRCh37",
             25398284, 25398285, "AA", "", "DEL", []),
        ],
        schema,
    )
    out = rows(load_docm(df))
    snv = [r for r in out if r["disease_doid"] == "doid:1324"][0]
    assert snv["genomic_notation"] == "7:g.140453136A>T"
    assert snv["relevance"] == "recurrent"
    assert snv["_error"] is None
    multi_tag = [r for r in out if r["disease_doid"] == "doid:999"][0]
    assert multi_tag["_error"] is not None
    deletion = [r for r in out if r["gene"] == "KRAS"][0]
    # parseDocmVariant p.KK12- -> p.K12_K13delKK (src/docm/index.js:36-43)
    assert deletion["protein_notation"] == "p.K12_K13delKK"
    assert deletion["genomic_notation"] == "12:g.25398284_25398285delAA"


def test_load_cgl(spark):
    schema = (
        "transcript string, coding_hgvs string, gene string, protein_hgvs string, "
        "chr_CGL string, pos_CGL string, ref string, alt string"
    )
    df = spark.createDataFrame(
        [
            ("NM_000546.5", "c.524G>A", "TP53", "p.(R175H)", "17", "7578406", "C", "T"),
            ("NM_1.1", "c.1del", "G2", "p.L100*", "1", "100_101", "TAG", "T"),
            ("NM_2.1", "c.2del", "G3", None, "2", "5", "AC", "GT"),  # first-base mismatch
        ],
        schema,
    )
    out = {r["gene"]: r for r in rows(load_cgl(df))}
    sub = out["TP53"]
    assert sub["genomic_notation"] == "g.7578406C>T"
    assert sub["protein_notation"] == "p.R175H"  # parens stripped
    assert sub["transcript_id"] == "NM_000546" and sub["transcript_version"] == "5"
    assert sub["_error"] is None
    ter = out["G2"]
    assert ter["protein_notation"] == "p.L100Ter"  # * -> Ter for non-fs
    assert ter["genomic_notation"] == "g.100_101delAG"
    mismatch = out["G3"]
    assert mismatch["genomic_notation"] is None
    assert "ref vs alt" in mismatch["_error"]


# ---------------------------------------------------------------------------
# entrez refseq esummary + GSC therapeutic ontology
# ---------------------------------------------------------------------------


def test_parse_entrez_refseq(spark):
    from graphkb_spark.loaders.genes import parse_entrez_refseq

    df = spark.createDataFrame(
        [
            ("NM_000546.5", "rna", "tp53 transcript", None),
            ("NP_000537.3", "peptide", "tp53 protein", None),
            ("NC_000017.11", "genomic", "chr 17", "17"),
            ("bogus", "rna", "x", None),
        ],
        "accessionversion string, biomol string, title string, subname string",
    )
    out = {r["sourceId"]: r for r in rows(parse_entrez_refseq(df))}
    assert out["NM_000546"]["biotype"] == "transcript"
    assert out["NM_000546"]["sourceIdVersion"] == "5"
    assert out["NM_000546"]["displayName"] == "NM_000546.5"
    assert out["NP_000537"]["biotype"] == "protein"
    assert out["NC_000017"]["biotype"] == "chromosome"
    assert out["NC_000017"]["name"] == "17"
    assert out["bogus"]["_error"] is not None
    # unversioned request mode strips version + longName (refseq.js:96-106)
    unv = {r["sourceId"]: r for r in rows(parse_entrez_refseq(df, versioned=False))}
    assert unv["NM_000546"]["sourceIdVersion"] is None
    assert unv["NM_000546"]["displayName"] == "NM_000546"
    assert unv["NM_000546"]["longName"] is None


def test_load_gsc_therapeutic_ontology(spark):
    from graphkb_spark.loaders.genes import load_gsc_therapeutic_ontology

    raw = spark.createDataFrame(
        [
            ("Vemurafenib", "raf inhibitors", "kinase inhibitor",
             "mapk pathway", "DB0001", "PLX4032, vemurafenib"),
            # drug that IS its own specific class -> subsets tag, no self edge
            ("raf inhibitor", "raf inhibitor", "kinase inhibitor",
             "mapk pathway", None, ""),
        ],
        "source string, Class_1 string, Class_2 string, "
        "Class_3_pathway string, DrugBankID string, alias string",
    )
    ext = spark.createDataFrame(
        [Row(name="Vemurafenib", rid="db-vem", priority=0),
         Row(name="vemurafenib", rid="ch-vem", priority=1)]
    )
    out = load_gsc_therapeutic_ontology(raw, ext)
    ther = {t["name"]: t for t in rows(out["therapies"])}
    # resolved drug is NOT re-created; alias + classes are
    assert "vemurafenib" not in ther
    assert "plx4032" in ther
    # 'inhibitors' -> 'inhibitor' cleaning applied to class names
    assert ther["raf inhibitor"]["subsets"] == ["specific drug class"]
    assert ther["kinase inhibitor"]["subsets"] == ["general drug class"]
    assert ther["mapk pathway"]["subsets"] == ["pathway drug class"]
    edges = rows(out["edges"])
    by_cls = {}
    for e in edges:
        by_cls.setdefault(e["edge_class"], []).append(e)
    # drugbank match (priority 0) beats chembl for the drug rid
    alias_edge = by_cls["AliasOf"][0]
    assert alias_edge["in_rid"] == "db-vem"
    sub_pairs = {(e["out_rid"], e["in_rid"]) for e in by_cls["SubClassOf"]}
    raf_rid = ther["raf inhibitor"]["rid"]
    kin_rid = ther["kinase inhibitor"]["rid"]
    mapk_rid = ther["mapk pathway"]["rid"]
    assert ("db-vem", raf_rid) in sub_pairs          # drug -> parent
    assert (raf_rid, kin_rid) in sub_pairs           # parent -> grandparent1
    assert (raf_rid, mapk_rid) in sub_pairs          # parent -> grandparent2
    # self-link suppressed for the drug==parent row
    assert (raf_rid, raf_rid) not in sub_pairs


def test_gsc_drugbank_id_xref_and_empty_parent(spark):
    """DBxxxxx-keyed CrossReferenceOf edges + no dangling grandparent
    edges when parent is empty (src/gscTherapeuticOntology.js:185-239)."""
    from graphkb_spark.loaders.genes import load_gsc_therapeutic_ontology

    raw = spark.createDataFrame(
        [
            # unresolved drug with a DrugBankID -> xref edge to DB record
            ("NovelDrug", None, "kinase inhibitor", None, "DB0042", ""),
            # null biomol-equivalent: bad DrugBankID format -> no xref
            ("OtherDrug", "some class", None, None, "XX99", ""),
        ],
        "source string, Class_1 string, Class_2 string, "
        "Class_3_pathway string, DrugBankID string, alias string",
    )
    ext = spark.createDataFrame(
        [Row(name="unrelated", rid="db-42", priority=0, sourceId="DB0042"),
         Row(name="unrelated2", rid="ch-1", priority=1, sourceId="CHEMBL1")]
    )
    out = load_gsc_therapeutic_ontology(raw, ext)
    edges = out["edges"].collect()
    xrefs = [e for e in edges if e["edge_class"] == "CrossReferenceOf"]
    assert len(xrefs) == 1 and xrefs[0]["in_rid"] == "db-42"
    # NovelDrug has NO parent: its grandparent1 must not produce a
    # dangling parent->grandparent edge
    sub = [e for e in edges if e["edge_class"] == "SubClassOf"]
    created = {t["name"]: t["rid"] for t in out["therapies"].collect()}
    assert all(e["out_rid"] in set(created.values()) | {"db-42"} for e in sub)
