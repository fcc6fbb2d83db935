"""OBO-graph JSON + OWL ontology file loaders (SURVEY §7.3)."""

import json

from pyspark.sql import functions as F

from graphkb_spark.kb import empty_kb, upsert_source
from graphkb_spark.loaders.ontology_files import load_obograph, load_owl

DO_DOC = {
    "graphs": [
        {
            "nodes": [
                {
                    "id": "http://purl.obolibrary.org/obo/DOID_4",
                    "lbl": "Disease",
                    "meta": {
                        "definition": {"val": "a disposition"},
                        "subsets": ["http://purl.obolibrary.org/obo/doid#DO_AGR_slim"],
                    },
                },
                {
                    "id": "http://purl.obolibrary.org/obo/DOID_1612",
                    "lbl": "Breast Cancer",
                    "meta": {
                        "definition": {"val": "a cancer of the breast"},
                        "synonyms": [{"val": "mammary cancer"}],
                    },
                },
                {
                    "id": "http://purl.obolibrary.org/obo/DOID_9999",
                    "lbl": "old term",
                    "meta": {"deprecated": True},
                },
            ],
            "edges": [
                {
                    "sub": "http://purl.obolibrary.org/obo/DOID_1612",
                    "pred": "is_a",
                    "obj": "http://purl.obolibrary.org/obo/DOID_4",
                },
                {
                    "sub": "http://purl.obolibrary.org/obo/DOID_1612",
                    "pred": "xref_ignored",
                    "obj": "http://purl.obolibrary.org/obo/DOID_4",
                },
            ],
        }
    ]
}

OWL_DOC = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:owl="http://www.w3.org/2002/07/owl#"
         xmlns:obo="http://purl.obolibrary.org/obo/"
         xmlns:oboInOwl="http://www.geneontology.org/formats/oboInOwl#">
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/SO_0000001">
    <rdfs:label>region</rdfs:label>
    <obo:IAO_0000115>A sequence feature region.</obo:IAO_0000115>
  </owl:Class>
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/SO_0000110">
    <rdfs:label>sequence_feature</rdfs:label>
    <rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/SO_0000001"/>
    <oboInOwl:hasExactSynonym>Located Feature</oboInOwl:hasExactSynonym>
  </owl:Class>
</rdf:RDF>
"""


def test_load_obograph(spark, tmp_path):
    p = str(tmp_path / "doid.json")
    with open(p, "w") as f:
        json.dump(DO_DOC, f)
    kb = empty_kb(spark)
    kb = upsert_source(spark, kb, {"name": "disease ontology", "sort": 3})
    kb = load_obograph(spark, kb, p, "disease ontology")
    terms = {r.sourceId: r for r in kb.terms.collect()}
    assert terms["doid:4"].name == "disease"
    assert terms["doid:4"].subsets == ["DO_AGR_slim"]
    assert terms["doid:1612"].description == "a cancer of the breast"
    assert terms["doid:9999"].deprecated is True
    assert terms["doid:1612::mammary cancer"].alias is True
    edges = {(r.edge_class,) for r in kb.edges.collect()}
    assert edges == {("SubClassOf",), ("AliasOf",)}
    sub = kb.edges.filter(F.col("edge_class") == "SubClassOf").collect()
    assert len(sub) == 1  # xref_ignored pred dropped
    assert sub[0].out_rid == terms["doid:1612"].rid
    assert sub[0].in_rid == terms["doid:4"].rid


def test_load_owl(spark, tmp_path):
    p = str(tmp_path / "so.owl")
    with open(p, "w") as f:
        f.write(OWL_DOC)
    kb = empty_kb(spark)
    kb = upsert_source(spark, kb, {"name": "sequence ontology", "sort": 4})
    kb = load_owl(spark, kb, p, "sequence ontology")
    terms = {r.sourceId: r for r in kb.terms.collect()}
    assert terms["so:0000001"].name == "region"
    assert terms["so:0000001"].description == "A sequence feature region."
    assert terms["so:0000110"].name == "sequence_feature"
    assert terms["so:0000110::located feature"].alias is True
    sub = kb.edges.filter(F.col("edge_class") == "SubClassOf").collect()
    assert len(sub) == 1
    assert sub[0].out_rid == terms["so:0000110"].rid
    assert sub[0].in_rid == terms["so:0000001"].rid
