"""KB persistence round-trip + the CLI surface (reference bin/load.js)."""

import json

from pyspark.sql import functions as F

from graphkb_spark import cli
from graphkb_spark.kb import empty_kb, load_ontology_records, upsert_source
from graphkb_spark.kb_io import load_kb, save_kb


def test_kb_roundtrip(spark, tmp_path):
    kb = empty_kb(spark)
    kb = upsert_source(spark, kb, {"name": "graphkb", "sort": 0})
    records = spark.createDataFrame(
        [("v1", "alpha", ["v2"]), ("v2", "beta", [])],
        "sourceId string, name string, subclassof array<string>",
    )
    kb = load_ontology_records(spark, kb, records, "graphkb")
    save_kb(kb, str(tmp_path / "kb"))
    kb2 = load_kb(spark, str(tmp_path / "kb"))
    assert kb2.terms.count() == 2 and kb2.edges.count() == 1
    assert set(kb2.terms.columns) == set(kb.terms.columns)
    # partition pruning: cls filter reads only that partition directory
    plan = kb2.terms.filter(F.col("cls") == "Vocabulary")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "PartitionFilters: [isnotnull(cls" in plan


def test_cli_load_and_query(spark, tmp_path, capsys):
    vocab = [
        {"sourceId": "t1", "name": "resistance", "subclassof": []},
        {"sourceId": "t2", "name": "sensitivity", "subclassof": ["t1"]},
    ]
    inp = tmp_path / "vocab.json"
    inp.write_text(json.dumps(vocab))
    kb_dir = str(tmp_path / "kb")

    rc = cli.main(["load", "ontology", str(inp), "--kb", kb_dir,
                   "--source-name", "graphkb"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    summary = json.loads(out)
    assert summary["terms"] == 2 and summary["edges"] == 1

    rc = cli.main([
        "query",
        json.dumps({
            "target": "terms",
            "filters": {"AND": [
                {"name": "resistance"},
                {"source_rid": {"target": "sources", "filters": {"name": "graphkb"}}},
            ]},
            "returnProperties": ["sourceId", "name"],
        }),
        "--kb", kb_dir,
    ])
    assert rc == 0
    rows = [json.loads(line) for line in capsys.readouterr().out.strip().splitlines()]
    assert rows == [{"sourceId": "t1", "name": "resistance"}]


def test_kb_statements_roundtrip(spark, tmp_path):
    """Statements table persists and is queryable through the DSL."""
    kb = empty_kb(spark)
    kb = upsert_source(spark, kb, {"name": "civic", "sort": 1})
    kb.statements = spark.createDataFrame(
        [("EID1", ["cml", "v1"], "resistance", "rid_1"),
         ("EID2", ["aml"], "sensitivity", "rid_2")],
        "sourceId string, conditions array<string>, relevance string, rid string",
    )
    save_kb(kb, str(tmp_path / "kb"))
    kb2 = load_kb(spark, str(tmp_path / "kb"))
    assert kb2.statements.count() == 2
    out = kb2.query({"target": "statements", "filters": {"relevance": "resistance"},
                     "returnProperties": ["sourceId", "rid"]})
    assert [(r.sourceId, r.rid) for r in out.collect()] == [("EID1", "rid_1")]
