"""DrugBank + PubMed loaders (loaders/evidence.py) — golden-record
tests in the style of the reference's loadfile.test.js (full Therapy
content asserted from an XML fixture)."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import Row

from graphkb_spark.loaders.evidence import (
    load_drugbank,
    parse_pubmed_records,
    read_drugbank,
)

FIXTURE = str(Path(__file__).parent / "data" / "drugbank_sample.xml")


def test_drugbank_golden_record(spark):
    out = load_drugbank(read_drugbank(spark, FIXTURE))
    therapies = [r.asDict() for r in out["therapies"].collect()]
    assert len(therapies) == 1
    t = therapies[0]
    assert t == {
        "sourceId": "DB09999",
        "sourceIdVersion": "2024-03-02",
        "name": "Examplinib",
        "description": "A synthetic tyrosine kinase blocker used for testing loaders.",
        "mechanismOfAction": "Examplinib reversibly inhibits the EXK1 kinase domain.",
        "subsets": ["Antineoplastic Agents", "Protein Kinase Inhibitors"],
        "iupacName": "N-(3-examplyl)quinazolin-4-amine",
        "molecularFormula": "C22H23N3O4",
    }

    atc = {r["sourceId"]: r["name"] for r in out["atc_terms"].collect()}
    assert atc == {
        "l01ex": "Other protein kinase inhibitors",
        "l01e": "PROTEIN KINASE INHIBITORS",
        "l01": "ANTINEOPLASTIC AGENTS",
        "l": "ANTINEOPLASTIC AND IMMUNOMODULATING AGENTS",
    }

    edges = {(r["out_sid"], r["in_sid"], r["edge_class"]) for r in out["edges"].collect()}
    # drug -> most specific level, then the ladder up
    assert ("DB09999", "l01ex", "SubClassOf") in edges
    assert ("l01ex", "l01e", "SubClassOf") in edges
    assert ("l01e", "l01", "SubClassOf") in edges
    assert ("l01", "l", "SubClassOf") in edges
    # alias: only the simple product name, deduped, not the drug name itself
    assert ("examplara", "DB09999", "AliasOf") in edges
    assert not any(e[2] == "AliasOf" and e[0] != "examplara" for e in edges)
    # chembl xref only (pubchem filtered out)
    assert ("DB09999", "CHEMBL999999", "CrossReferenceOf") in edges
    assert len([e for e in edges if e[2] == "CrossReferenceOf"]) == 1


def test_pubmed_parse(spark):
    raw = spark.createDataFrame(
        [
            Row(uid=23945592, title="A study of things.",
                fulljournalname="Journal of Testing",
                sortpubdate="2013/08/01 00:00", sortdate=None),
            Row(uid=11111, title="Older paper", fulljournalname=None,
                sortpubdate=None, sortdate="1992/06/01 00:00"),
            Row(uid=22222, title="No date", fulljournalname="J", sortpubdate=None,
                sortdate=None),
        ]
    )
    out = {r["sourceId"]: r.asDict() for r in parse_pubmed_records(raw).collect()}
    assert out["23945592"]["name"] == "A study of things."
    assert out["23945592"]["year"] == 2013
    assert out["23945592"]["displayName"] == "pmid:23945592"
    assert out["23945592"]["url"].endswith("/23945592")
    assert out["11111"]["year"] == 1992
    assert out["22222"]["year"] is None
