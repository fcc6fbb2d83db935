"""The bundled ``all_sources`` preset (loaders/pipeline.py): the
reference ``rule all`` DAG (/root/reference/Snakefile:32-47) run end to
end on fixture data — every non-optional source bound to its real
loader, dependency edges asserted against the executed order, and
per-class counts checked on the final KB state."""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import Row, functions as F

from graphkb_spark.kb import empty_kb, load_ontology_records, upsert_source
from graphkb_spark.loaders.civic import build_statements
from graphkb_spark.loaders.features import load_feature_hierarchy
from graphkb_spark.loaders.genes import load_fda_srs, load_refseq
from graphkb_spark.loaders.ncit import load_ncit
from graphkb_spark.loaders.oncotree import load_oncotree
from graphkb_spark.loaders.ontology_files import load_obograph, load_owl
from graphkb_spark.loaders.papers import (
    load_fda_approvals,
    load_pmc4232638,
    load_pmc4468049_fusions,
)
from graphkb_spark.loaders.pipeline import (
    AGGREGATOR_RULES,
    ALL_SOURCES_DEPS,
    DependencyError,
    LOCAL_SOURCES,
    OPTIONAL_SOURCES,
    all_sources_jobs,
    run_all_sources,
)
from graphkb_spark.loaders.statements import (
    load_cancerhotspots,
    load_cgi,
    load_dgidb,
    load_docm,
    load_moa,
)
from graphkb_spark.sources.registry import seed_sources

REC_SCHEMA = (
    "sourceId string, name string, description string, deprecated boolean,"
    " alias boolean, subclassof array<string>, aliasof array<string>"
)

NCIT_COLS = (
    "id string, name string, synonyms string, parents string,"
    " definition string, semanticType string, conceptStatus string"
)

DO_DOC = {
    "graphs": [
        {
            "nodes": [
                {"id": "http://purl.obolibrary.org/obo/DOID_4", "lbl": "Disease",
                 "meta": {"definition": {"val": "a disposition"}}},
                {"id": "http://purl.obolibrary.org/obo/DOID_1612", "lbl": "Breast Cancer",
                 "meta": {"synonyms": [{"val": "mammary cancer"}]}},
            ],
            "edges": [
                {"sub": "http://purl.obolibrary.org/obo/DOID_1612", "pred": "is_a",
                 "obj": "http://purl.obolibrary.org/obo/DOID_4"},
            ],
        }
    ]
}

UBERON_OWL = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:owl="http://www.w3.org/2002/07/owl#"
         xmlns:obo="http://purl.obolibrary.org/obo/"
         xmlns:oboInOwl="http://www.geneontology.org/formats/oboInOwl#">
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/UBERON_0000062">
    <rdfs:label>organ</rdfs:label>
  </owl:Class>
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/UBERON_0002107">
    <rdfs:label>liver</rdfs:label>
    <rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/UBERON_0000062"/>
  </owl:Class>
</rdf:RDF>
"""


def _local(spark, source, cls, rows, sort):
    """A ``load_local`` job: upsert the source row, run the generic
    ontology loader on the bundled records."""

    def fn(st):
        st["kb"] = load_ontology_records(
            spark,
            upsert_source(spark, st["kb"], {"name": source, "sort": sort}),
            spark.createDataFrame(rows, REC_SCHEMA),
            source,
            cls=cls,
        )
        return st

    return fn


@pytest.fixture(scope="module")
def dag_result(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("all_sources")
    do_path = str(tmp / "doid.json")
    with open(do_path, "w") as f:
        json.dump(DO_DOC, f)
    owl_path = str(tmp / "uberon.owl")
    with open(owl_path, "w") as f:
        f.write(UBERON_OWL)

    ncit_raw = spark.createDataFrame(
        [
            ("C1", "melanoma", "mel", "C3", "a skin cancer", "Neoplastic Process", "Active"),
            ("C2", "imatinib", "gleevec", "", "tki drug", "Pharmacologic Substance", "Active"),
            ("C3", "skin disease", "", "", None, "Disease or Syndrome", "Active"),
            ("C6", "mystery", "", "", None, "Conceptual Entity", "Active"),
        ],
        NCIT_COLS,
    )

    def j_sources(st):
        st["kb"] = seed_sources(spark, st["kb"])
        return st

    def j_ncit(st):
        kb = upsert_source(spark, st["kb"], {"name": "ncit", "sort": 1})
        st["kb"], st["out"]["ncit_bad"] = load_ncit(spark, kb, ncit_raw)
        return st

    def _ncit_therapies(st):
        return st["kb"].terms.filter(
            (F.col("cls") == "Therapy") & ~F.col("alias")
        ).select("rid", "sourceId")

    # ncit sourceIds are lowercased on load, so the xref column matches
    # the cleaned id
    fda_raw = spark.createDataFrame(
        [("U1", "drugA", "c2", None), ("U3", None, None, None)],
        "UNII string, PT string, NCIT string, PUBCHEM string",
    )

    def j_fda_srs(st):
        # faithful to the Snakefile, fda_srs waits only on vocab — ncit
        # may not be loaded yet, so a stated xref can miss here (the
        # reference records the same per-row lookup error)
        st["out"]["fda_srs"] = load_fda_srs(fda_raw, _ncit_therapies(st))
        return st

    def j_ncit_fda(st):
        # rule load_ncit_fda runs after load_ncit: resolve the
        # FDA<->NCIt subset xref against the now-loaded ncit table and
        # merge the CrossReferenceOf edges into the KB
        xref = load_fda_srs(fda_raw, _ncit_therapies(st))["edges"]
        kb = st["kb"]
        kb.edges = kb.edges.unionByName(xref, allowMissingColumns=True)
        st["kb"] = kb
        return st

    def j_refseq(st):
        raw = spark.createDataFrame(
            [Row(RNA="NM_000546.5", GeneID=7157, Protein="NP_000537.3")]
        )
        st["kb"] = load_refseq(spark, st["kb"], raw)
        return st

    def j_ensembl(st):
        rows = spark.createDataFrame(
            [Row(gene_id="ENSG01", gene_version="17", transcript_id="ENST01",
                 transcript_version="6", protein_id="ENSP01", protein_version="1")]
        )
        st["kb"] = load_feature_hierarchy(spark, st["kb"], rows, "ensembl")
        return st

    def j_do(st):
        kb = upsert_source(spark, st["kb"], {"name": "disease ontology", "sort": 5})
        st["kb"] = load_obograph(spark, kb, do_path, "disease ontology")
        return st

    def j_uberon(st):
        kb = upsert_source(spark, st["kb"], {"name": "uberon", "sort": 6})
        st["kb"] = load_owl(spark, kb, owl_path, "uberon", cls="AnatomicalEntity")
        return st

    def j_oncotree(st):
        recs = spark.createDataFrame(
            [
                ("2020_10_01", "mel", "Melanoma", "skin", []),
                ("2020_10_01", "skin", "Skin", None, []),
            ],
            "version string, code string, name string, parent string, history array<string>",
        )
        kb = upsert_source(spark, st["kb"], {"name": "oncotree", "sort": 7})
        st["kb"] = load_oncotree(spark, kb, recs)
        return st

    def j_approvals(st):
        pages = spark.createDataFrame(
            [Row(link="/a", title="Approval A",
                 content="On May 4, 2023 the FDA approved.\nAction date May 4, 2023.")]
        )
        st["out"]["approvals"] = load_fda_approvals(pages)
        return st

    def j_dgidb(st):
        raw = spark.createDataFrame(
            [Row(entrez_id=1956, concept_id="chembl:CHEMBL553",
                 interaction_types=["Inhibitor"], id="uuid-1")]
        )
        st["out"]["dgidb"] = load_dgidb(raw)
        return st

    def j_cancerhotspots(st):
        raw = spark.createDataFrame([Row(
            NCBI_Build="GRCh37", HGVSc="c.35G>A", Chromosome="12",
            CLIN_SIG="pathogenic", dbSNP_RS="rs121913529",
            oncotree_detailed="PAAD", Entrez_Gene_Id="3845", IMPACT="HIGH",
            HGVSp_Short="p.G12D", Reference_Allele="G",
            Start_Position="25398284", End_Position="25398284",
            Transcript_ID="ENST00000256078", Allele="A",
        )])
        st["out"]["cancerhotspots"] = load_cancerhotspots(raw)
        return st

    def j_pmc4232638(st):
        cols = ("gene string, aa_change string, functional_classification string, "
                "type string, pmids string, kinase string, tp53_gof string, "
                "tp53_lof string, tp53_dominant_negative string")
        df = spark.createDataFrame(
            [("BRAF", "V600E", "non-neutral", "Oncogene", None, "yes", None, None, None)],
            cols,
        )
        st["out"]["pmc4232638"] = load_pmc4232638(df)
        return st

    def j_pmc4468049(st):
        df = spark.createDataFrame(
            [Row(geneA="TPM3", geneB="NTRK1", kinaseA="no", kinaseB="yes",
                 break1=154170400, break2=156874906, disease="thyroid")]
        )
        st["out"]["pmc4468049"] = load_pmc4468049_fusions(df)
        return st

    def j_civic(st):
        evidence = spark.createDataFrame(
            [("EID1", "v1", ["imatinib"], None, "PREDICTIVE", "SUPPORTS",
              "RESISTANCE", "cml")],
            "sourceId string, profile_expr string, therapies array<string>,"
            " therapyInteractionType string, evidence_type string,"
            " direction string, significance string, disease string",
        )
        st["out"]["civic"] = build_statements(spark, evidence)
        return st

    def j_cgi(st):
        raw = spark.createDataFrame([Row(**{
            "Alteration": "a", "Biomarker": "KRAS (G12)", "cDNA": "c",
            "Primary Tumor type full name": "Any cancer type", "Drug": "Responsive drug",
            "Drug family": "f", "Source": "PMID:1", "Evidence level": "A",
            "Gene": "KRAS", "gDNA": "g", "Association": "Resistant",
            "Curation date": "d", "Curator": "c", "transcript": "t",
            "Alteration type": "MUT", "protein": "",
        })])
        st["out"]["cgi"] = load_cgi(raw)
        return st

    def j_docm(st):
        schema = (
            "hgvs string, amino_acid string, gene string, chromosome string, "
            "reference_version string, start long, stop long, reference string, "
            "variant string, variant_type string, "
            "diseases array<struct<doid:int,source_pubmed_id:long,tags:array<string>>>"
        )
        df = spark.createDataFrame(
            [("ENST1:c.1799T>A", "p.V600E", "BRAF", "7", "GRCh37",
              140453136, 140453136, "A", "T", "SNV",
              [Row(doid=1324, source_pubmed_id=123, tags=["lung"])])],
            schema,
        )
        st["out"]["docm"] = load_docm(df)
        return st

    def j_moa(st):
        df = spark.createDataFrame([
            Row(sourceId="a1", therapy_name="imatinib", therapy_resistance=True,
                therapy_sensitivity=None, favorable_prognosis=None,
                variants=[Row(name="ABL1:p.T315I", pathogenic="1.0")], disease="CML"),
            # nonsensical resistance+sensitivity -> quarantined
            Row(sourceId="a3", therapy_name="x", therapy_resistance=True,
                therapy_sensitivity=True, favorable_prognosis=1,
                variants=[Row(name="X:del", pathogenic="0.0")], disease="AML"),
        ])
        st["out"]["moa"] = load_moa(df)
        return st

    def j_drugbank(st):
        from graphkb_spark.loaders.evidence import load_drugbank, read_drugbank

        fixture = str(Path(__file__).parent / "data" / "drugbank_sample.xml")
        st["out"]["drugbank"] = load_drugbank(read_drugbank(spark, fixture))
        return st

    def j_cosmic_resistance(st):
        from graphkb_spark.loaders.statements import load_cosmic_resistance

        raw = spark.createDataFrame([Row(**{
            "HGVSC": "c.35G>A", "Histology Subtype 1": "adenocarcinoma",
            "Histology": "carcinoma", "Gene Name": "KRAS", "HGVSG": "g.1A>T",
            "LEGACY_MUTATION_ID": "COSM521", "HGVSP": "p.G12D", "Pubmed Id": "123",
            "Sample ID": "S1", "Sample Name": "s1", "Drug Name": "cetuximab",
            "Transcript": "ENST1",
        })])
        cls = spark.createDataFrame(
            [Row(diseaseFamily="carcinoma", disease="adenocarcinoma", ncit="C0001")]
        )
        st["out"]["cosmic_resistance"] = load_cosmic_resistance(raw, cls)
        return st

    def j_cosmic_fusions(st):
        from graphkb_spark.loaders.statements import load_cosmic_fusions

        rows = [
            Row(gene1="BCR", exon1="14", gene2="ABL1", exon2="2",
                sampleId=f"S{i}", fusionId="F1", disease="ALL",
                diseaseFamily="leukaemia")
            for i in range(3)
        ]
        st["out"]["cosmic_fusions"] = load_cosmic_fusions(spark.createDataFrame(rows))
        return st

    def j_clinicaltrialsgov(st):
        from graphkb_spark.loaders.statements import load_clinicaltrials

        rows = [Row(nctId="NCT1", officialTitle="Official", briefTitle="Brief",
                    overallStatus="RECRUITING", lastUpdatePosted="2024-01-02",
                    startDate="2020-01-01", completionDate="2024-12-31",
                    conditions=["cancer"], phases=["PHASE1/PHASE2"],
                    locations=[Row(city="Vancouver", country="Canada")])]
        st["out"]["clinicaltrialsgov"] = load_clinicaltrials(spark.createDataFrame(rows))
        return st

    loaders = {
        "drugbank": j_drugbank,
        "cosmic_resistance": j_cosmic_resistance,
        "cosmic_fusions": j_cosmic_fusions,
        "clinicaltrialsgov": j_clinicaltrialsgov,
        "vocab": _local(spark, "graphkb vocab", "Vocabulary",
                        [("v1", "resistance", None, False, False, [], []),
                         ("v2", "sensitivity", None, False, False, ["v1"], [])], 10),
        "signatures": _local(spark, "signatures", "Signature",
                             [("sig1", "apobec", None, False, False, [], [])], 11),
        "chromosomes": _local(spark, "chromosomes", "Feature",
                              [("chr7", "7", None, False, False, [], []),
                               ("chr12", "12", None, False, False, [], [])], 12),
        "evidenceLevels": _local(spark, "evidence levels", "EvidenceLevel",
                                 [("e1", "level 1", None, False, False, [], [])], 13),
        "aacr": _local(spark, "aacr", "EvidenceLevel",
                       [("aacr-1", "aacr level 1", None, False, False, [], [])], 14),
        "asco": _local(spark, "asco", "EvidenceLevel",
                       [("asco-1", "asco level 1", None, False, False, [], [])], 15),
        "sources": j_sources,
        "ncit": j_ncit,
        "fda_srs": j_fda_srs,
        "ncit_fda": j_ncit_fda,
        "refseq": j_refseq,
        "ensembl": j_ensembl,
        "do": j_do,
        "uberon": j_uberon,
        "oncotree": j_oncotree,
        "approvals": j_approvals,
        "dgidb": j_dgidb,
        "cancerhotspots": j_cancerhotspots,
        "pmc4232638": j_pmc4232638,
        "pmc4468049": j_pmc4468049,
        "civic": j_civic,
        "cgi": j_cgi,
        "docm": j_docm,
        "moa": j_moa,
    }
    state, order = run_all_sources(
        loaders, {"kb": empty_kb(spark), "out": {}},
        drugbank=True, cosmic=True, trials=True,
    )
    return state, order


def test_order_respects_every_snakefile_edge(dag_result):
    _, order = dag_result
    idx = {name: i for i, name in enumerate(order)}
    optional = {n for jobs in OPTIONAL_SOURCES.values() for n in jobs}
    assert set(idx) == set(ALL_SOURCES_DEPS) | optional
    for name, deps in ALL_SOURCES_DEPS.items():
        for d in deps:
            assert idx[d] < idx[name], f"{d} must run before {name}"
    # the reference's load-order landmarks: ncit before the disease/drug
    # families, which in turn precede the statement loaders
    assert idx["ncit"] < idx["do"] < idx["all_diseases"] < idx["cgi"]
    assert idx["fda_srs"] < idx["all_drugs"] < idx["cgi"]
    assert idx["ncit"] < idx["civic"]
    # optional edges: USE_DRUGBANK rewires all_drugs; cosmic/trials wait
    # on the disease/drug families
    assert idx["fda_srs"] < idx["drugbank"] < idx["all_drugs"]
    assert idx["all_diseases"] < idx["cosmic_fusions"]
    assert idx["all_drugs"] < idx["cosmic_resistance"]
    assert idx["all_drugs"] < idx["clinicaltrialsgov"]


def test_per_class_counts(dag_result):
    state, _ = dag_result
    kb = state["kb"]
    by_class = {
        r["cls"]: r["n"]
        for r in kb.terms.groupBy("cls").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # vocab(2) + ncit quarantines C6, demotes nothing here
    assert by_class["Vocabulary"] == 2
    assert by_class["Signature"] == 1
    assert by_class["EvidenceLevel"] == 3  # evidenceLevels + aacr + asco
    # ncit: melanoma + mel alias + skin disease; do: 2 diseases + 1
    # alias; oncotree versions load as Disease too: mel + skin
    assert by_class["Disease"] == 3 + 3 + 2
    # ncit therapy main + gleevec alias
    assert by_class["Therapy"] == 2
    assert by_class["AnatomicalEntity"] == 2  # uberon organ + liver
    # chromosomes local file (2 Features) live in terms; refseq+ensembl
    # features live in the features table: refseq NM/NP versioned +
    # generic + the entrez gene anchor (5), ensembl 3 levels x 2 (6)
    assert by_class["Feature"] == 2
    assert kb.features.count() == 5 + 6
    # the ncit_fda job merged the UNII->NCIt xref into the edge table
    assert kb.edges.filter(F.col("edge_class") == "CrossReferenceOf").count() == 1
    # statement loaders all produced clean rows
    out = state["out"]
    assert out["civic"].filter(F.col("_error").isNull()).count() == 1
    assert out["cgi"].filter(F.col("_error").isNull()).count() == 1
    assert out["docm"].filter(F.col("_error").isNull()).count() == 1
    # a1 explodes to pathogenic + resistance rows; a3 quarantined
    assert out["moa"].filter(F.col("_error").isNull()).count() == 2
    assert out["moa"].filter(F.col("_error").isNotNull()).count() == 1
    assert out["cancerhotspots"].count() == 1
    assert out["dgidb"].count() == 1
    assert out["approvals"].count() == 1
    assert out["pmc4232638"].count() == 1
    assert out["pmc4468049"].filter(F.col("_error").isNull()).count() == 1
    assert out["ncit_bad"].count() == 1  # C6 quarantined
    # optional sources ran with their real loaders
    assert out["drugbank"]["therapies"].count() == 1
    assert out["cosmic_resistance"].count() == 1
    assert out["cosmic_fusions"].filter(F.col("level") == 0).count() == 1
    assert out["clinicaltrialsgov"].count() == 1


def test_optional_sources_toggle_edges():
    base = all_sources_jobs(
        {n: (lambda st: st) for n in ALL_SOURCES_DEPS if n not in AGGREGATOR_RULES}
    )
    assert "drugbank" not in base and "cosmic_resistance" not in base
    names = {n: (lambda st: st) for n in ALL_SOURCES_DEPS if n not in AGGREGATOR_RULES}
    names.update({"drugbank": lambda st: st, "cosmic_resistance": lambda st: st,
                  "cosmic_fusions": lambda st: st, "clinicaltrialsgov": lambda st: st})
    full = all_sources_jobs(names, drugbank=True, cosmic=True, trials=True)
    # USE_DRUGBANK rewires all_drugs to wait on drugbank (get_drug_inputs)
    assert "drugbank" in full["all_drugs"].deps
    assert full["drugbank"].deps == ("fda_srs",)
    assert full["cosmic_fusions"].deps == ("all_diseases",)
    assert "all_drugs" in full["clinicaltrialsgov"].deps
    # optional maps stay out of the default DAG
    for flag_jobs in OPTIONAL_SOURCES.values():
        for n in flag_jobs:
            assert n not in ALL_SOURCES_DEPS


def test_missing_binding_is_an_error():
    with pytest.raises(DependencyError, match="no loader bound"):
        all_sources_jobs({"vocab": lambda st: st})


def _start_flaky_server():
    """Live-endpoint fixture: request #1 answers 429, request #3
    answers 500, everything else 200; /reject always 422. The request
    log is owned by the server thread of this same process (local-mode
    executors are threads here)."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    log: list[tuple[str, int]] = []
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            self.rfile.read(int(self.headers.get("Content-Length", 0)))
            with lock:
                n = len(log) + 1
                if self.path == "/reject":
                    status = 422
                elif n == 1:
                    status = 429
                elif n == 3:
                    status = 500
                else:
                    status = 200
                log.append((self.path, status))
            self.send_response(status)
            self.end_headers()

        def log_message(self, *a):  # quiet
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, log


def test_write_rest_live_endpoint_from_dag_output(dag_result):
    """C4/C5 against a real HTTP endpoint: the merged KB terms from the
    full all_sources run are POSTed through write_rest; the server
    injects a 429 then a 500 mid-stream and the retry policy absorbs
    both (quarantine empty, retry counters visible in the request log);
    a hard 4xx endpoint quarantines with attempts=1 (fail-fast)."""
    import urllib.error
    import urllib.request

    from graphkb_spark.sources.rest_sink import RetryPolicy, write_rest

    state, _ = dag_result
    terms = state["kb"].terms.select("cls", "name").repartition(1)
    n_batches = -(-terms.count() // 5)  # ceil
    assert n_batches >= 2  # the fixture must exercise >1 batch

    srv, log = _start_flaky_server()
    port = srv.server_address[1]
    try:
        def send(batch, _port=port, _path="/load"):
            body = ("\n".join(batch)).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{_port}{_path}", data=body, method="POST"
            )
            try:
                with urllib.request.urlopen(req) as resp:
                    return resp.status
            except urllib.error.HTTPError as e:
                return e.code

        policy = RetryPolicy(sleep=lambda s: None)
        failed = write_rest(terms, send, batch_size=5, policy=policy)
        assert failed.count() == 0
        # n_batches successes + exactly the two injected failures
        assert len(log) == n_batches + 2
        assert [s for _, s in log[:4]] == [429, 200, 500, 200]
        assert all(s == 200 for _, s in log[4:])

        log.clear()

        def send_reject(batch, _port=port):
            return send(batch, _port, "/reject")

        failed = write_rest(terms, send_reject, batch_size=5, policy=policy)
        rows = failed.collect()
        assert len(rows) == terms.count()
        assert all(r.error == "http 422" and r.attempts == 1 for r in rows)
        assert len(log) == n_batches  # fail-fast: one request per batch
    finally:
        srv.shutdown()
        srv.server_close()
