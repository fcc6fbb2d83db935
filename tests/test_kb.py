"""End-to-end KB slice (SURVEY §7.2): ontology load -> terms + edges ->
vocabulary query through the filter DSL -> idempotent re-load.

Mirrors the reference flow: generic ontology loader
(/root/reference/src/ontology/index.js) feeding ``getVocabularyTerm``
(/root/reference/src/graphkb.js:484-498)."""

import pytest
from pyspark.sql import functions as F

from graphkb_spark.kb import (
    empty_kb,
    get_vocabulary_term,
    load_ontology_records,
    upsert_source,
)
from graphkb_spark.operators.resolve import RESOLVE_ERROR_COL

VOCAB = [
    # sourceId, name, description, deprecated, alias, subclassof, aliasof
    ("v1", "resistance", "no response to treatment", False, False, [], []),
    ("v2", "sensitivity", "responds to treatment", False, False, ["v1"], []),
    ("v3", "responsive", None, False, True, [], ["v2"]),
    # duplicate name, deprecated -> preference ranking must skip it
    ("v4", "resistance", "old copy", True, False, [], []),
    ("v5", "gain of function", "increased activity", False, False, [], []),
]


@pytest.fixture(scope="module")
def kb(spark):
    kb = empty_kb(spark)
    kb = upsert_source(
        spark, kb, {"name": "graphkb", "displayName": "GraphKB", "sort": 0}
    )
    records = spark.createDataFrame(
        VOCAB,
        "sourceId string, name string, description string, deprecated boolean,"
        " alias boolean, subclassof array<string>, aliasof array<string>",
    )
    return load_ontology_records(spark, kb, records, "graphkb", cls="Vocabulary")


def test_terms_loaded(kb):
    terms = kb.terms.collect()
    assert len(terms) == 5
    assert all(r.rid is not None and len(r.rid) == 32 for r in terms)
    assert all(r.cls == "Vocabulary" for r in terms)
    assert kb.counts["Vocabulary"]["create"] == 5


def test_edges_built(kb):
    edges = {(r.edge_class,) for r in kb.edges.collect()}
    assert edges == {("SubClassOf",), ("AliasOf",)}
    rid = {r.sourceId: r.rid for r in kb.terms.collect()}
    sub = kb.edges.filter(F.col("edge_class") == "SubClassOf").collect()
    assert len(sub) == 1 and sub[0].out_rid == rid["v2"] and sub[0].in_rid == rid["v1"]


def test_vocabulary_query_prefers_non_deprecated(spark, kb):
    names = spark.createDataFrame([("Resistance",), ("unknown term",)], ["name"])
    out = get_vocabulary_term(kb, names)
    got = {r.name: r for r in out.collect()}
    hit = got["Resistance"]
    assert hit[RESOLVE_ERROR_COL] is None
    assert hit.sourceId == "v1"  # not the deprecated v4
    assert got["unknown term"][RESOLVE_ERROR_COL] == "not found"


def test_dsl_query_over_kb(kb):
    out = kb.query(
        {
            "target": "terms",
            "filters": {
                "AND": [
                    {"deprecated": False},
                    {"source_rid": {"target": "sources", "filters": {"name": "graphkb"}}},
                ]
            },
            "returnProperties": ["sourceId", "name"],
            "orderBy": ["sourceId"],
        }
    )
    assert [r.sourceId for r in out.collect()] == ["v1", "v2", "v3", "v5"]


def test_reload_is_idempotent(spark, kb):
    records = spark.createDataFrame(
        VOCAB,
        "sourceId string, name string, description string, deprecated boolean,"
        " alias boolean, subclassof array<string>, aliasof array<string>",
    )
    kb2 = load_ontology_records(spark, kb, records, "graphkb", cls="Vocabulary")
    assert kb2.terms.count() == 5
    assert kb2.counts["Vocabulary"].get("noop", 0) == 5
    assert kb2.edges.count() == 2


def test_update_detected_on_changed_description(spark, kb):
    changed = [("v5", "gain of function", "CHANGED", False, False, [], [])]
    records = spark.createDataFrame(
        changed,
        "sourceId string, name string, description string, deprecated boolean,"
        " alias boolean, subclassof array<string>, aliasof array<string>",
    )
    kb2 = load_ontology_records(spark, kb, records, "graphkb", cls="Vocabulary")
    assert kb2.counts["Vocabulary"].get("update", 0) == 1
    row = kb2.terms.filter(F.col("sourceId") == "v5").collect()[0]
    assert row.description == "CHANGED"
