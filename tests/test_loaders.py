"""Loader pipeline tests (SURVEY §7.3/§7.6): ncit clean/dedup/route,
oncotree version ladder + DeprecatedBy, civic statement sync, DAG
runner. Fixture shapes mirror the reference's test/data samples."""

import pytest
from pyspark.sql import functions as F

from graphkb_spark.kb import empty_kb, upsert_source
from graphkb_spark.loaders.civic import build_statements, group_therapies, sync_statements
from graphkb_spark.loaders.ncit import clean_rows, dedup_names, load_ncit
from graphkb_spark.loaders.oncotree import deprecated_by, load_oncotree
from graphkb_spark.loaders.pipeline import DependencyError, Job, run_pipeline, topo_order

NCIT_COLS = "id string, name string, synonyms string, parents string, definition string, semanticType string, conceptStatus string"


@pytest.fixture(scope="module")
def ncit_raw(spark):
    return spark.createDataFrame(
        [
            ("C1", "melanoma", "mel|skin cancer", "C3", "a skin cancer",
             "Neoplastic Process", "Active"),
            ("C2", "imatinib", "gleevec", "", "tki drug",
             "Pharmacologic Substance", "Active"),
            ("C3", "skin disease", "", "", None, "Disease or Syndrome", "Active"),
            # deprecated via retired parent
            ("C4", "old term", "", "C85834", None, "Disease or Syndrome", "Active"),
            # same name as C1 -> both demoted to sourceId-named
            ("C5", "Melanoma", "", "C3", None, "Neoplastic Process", "Active"),
            # unroutable semantic type -> quarantined
            ("C6", "mystery", "", "", None, "Conceptual Entity", "Active"),
            # obsolete concept status -> deprecated
            ("C7", "gone", "", "", None, "Disease or Syndrome", "Obsolete_Concept"),
        ],
        NCIT_COLS,
    )


def test_ncit_clean_rows(spark, ncit_raw):
    rows = {r.sourceId: r for r in clean_rows(ncit_raw).collect()}
    assert rows["c1"].cls == "Disease" and rows["c1"].subclassof == ["c3"]
    assert rows["c2"].cls == "Therapy" and rows["c2"].synonyms == ["gleevec"]
    assert rows["c4"].deprecated is True and rows["c4"].subclassof == []
    assert rows["c7"].deprecated is True
    assert rows["c6"]._load_error is not None and "not implemented" in rows["c6"]._load_error
    assert rows["c1"]._load_error is None


def test_ncit_name_dedup(spark, ncit_raw):
    cleaned = clean_rows(ncit_raw).filter(F.col("_load_error").isNull())
    rows = {r.sourceId: r for r in dedup_names(cleaned).collect()}
    # contested 'melanoma' -> both keep sourceId as name, name demoted to synonym
    assert rows["c1"].name == "c1" and "melanoma" in rows["c1"].synonyms
    assert rows["c5"].name == "c5" and "Melanoma" in rows["c5"].synonyms
    assert rows["c2"].name == "imatinib"


def test_ncit_full_load(spark, ncit_raw):
    kb = empty_kb(spark)
    kb = upsert_source(spark, kb, {"name": "ncit", "sort": 1})
    kb, bad = load_ncit(spark, kb, ncit_raw)
    assert bad.count() == 1
    terms = kb.terms.collect()
    mains = [t for t in terms if not t.alias]
    aliases = [t for t in terms if t.alias]
    assert len(mains) == 6  # 7 raw - 1 quarantined
    assert len(aliases) == 5  # mel, skin cancer, gleevec, melanoma, Melanoma
    by_class = {r["cls"]: r["n"] for r in
                kb.terms.groupBy("cls").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_class["Therapy"] == 2  # imatinib + gleevec alias
    edges = {r.edge_class for r in kb.edges.collect()}
    assert edges == {"SubClassOf", "AliasOf"}
    sub = kb.edges.filter(F.col("edge_class") == "SubClassOf").count()
    assert sub == 2  # c1->c3, c5->c3 (c4's parent was retired-filtered)
    assert kb.edges.filter(F.col("edge_class") == "AliasOf").count() == 5


ONCO_COLS = "version string, code string, name string, parent string, history array<string>"


@pytest.fixture(scope="module")
def onco_records(spark):
    return spark.createDataFrame(
        [
            ("2019_03_01", "mel", "Melanoma", "skin", []),
            ("2019_03_01", "skin", "Skin", None, []),
            ("2019_03_01", "gist", "GI Stromal Tumor", None, []),
            # 2020: gist renamed -> gists (history carries old code)
            ("2020_10_01", "mel", "Melanoma", "skin", []),
            ("2020_10_01", "skin", "Skin", None, []),
            ("2020_10_01", "gists", "GI Stromal Tumors", None, ["gist"]),
        ],
        ONCO_COLS,
    )


def test_oncotree_deprecated_by(spark, onco_records):
    dep = deprecated_by(onco_records).collect()
    assert len(dep) == 1
    assert dep[0].old_code == "gist" and dep[0].new_code == "gists"
    assert dep[0].version == "2020_10_01"


def test_oncotree_load(spark, onco_records):
    kb = empty_kb(spark)
    kb = upsert_source(spark, kb, {"name": "oncotree", "sort": 2})
    kb = load_oncotree(spark, kb, onco_records)
    assert kb.terms.count() == 6
    dep_edges = kb.edges.filter(F.col("edge_class") == "DeprecatedBy").collect()
    assert len(dep_edges) == 1
    rid = {r.sourceId: r.rid for r in kb.terms.collect()}
    assert dep_edges[0].out_rid == rid["gist@2019_03_01"]
    assert dep_edges[0].in_rid == rid["gists@2020_10_01"]
    # SubClassOf within each version: mel->skin twice
    assert kb.edges.filter(F.col("edge_class") == "SubClassOf").count() == 2


EVID_COLS = (
    "sourceId string, profile_expr string, therapies array<string>,"
    " therapyInteractionType string, evidence_type string, direction string,"
    " significance string, disease string"
)


@pytest.fixture(scope="module")
def evidence(spark):
    return spark.createDataFrame(
        [
            # 2 conditions x 2 substitute therapies = 4 candidates
            ("EID1", "v1 AND (v2 OR v3)", ["dasatinib", "imatinib"], "SUBSTITUTES",
             "PREDICTIVE", "SUPPORTS", "RESISTANCE", "cml"),
            # combination -> single sorted group
            ("EID2", "v9", ["trametinib", "dabrafenib"], "COMBINATION",
             "PREDICTIVE", "SUPPORTS", "SENSITIVITYRESPONSE", "melanoma"),
            # no therapy
            ("EID3", "v5", [], None, "PROGNOSTIC", "SUPPORTS", "POOR_OUTCOME", "aml"),
            # bad interaction type for 2 therapies -> quarantined
            ("EID4", "v1", ["a", "b"], "WEIRD",
             "PREDICTIVE", "SUPPORTS", "RESISTANCE", "x"),
            # invalid profile -> quarantined
            ("EID5", "v1 AND NOT v2", ["a"], None,
             "PREDICTIVE", "SUPPORTS", "RESISTANCE", "y"),
        ],
        EVID_COLS,
    )


def test_group_therapies(spark, evidence):
    out = group_therapies(evidence)
    got = {}
    for r in out.collect():
        got.setdefault(r.sourceId, []).append(r.therapy_group)
    assert sorted(got["EID1"]) == [["dasatinib"], ["imatinib"]]
    assert got["EID2"] == [["dabrafenib", "trametinib"]]  # sorted combination
    assert got["EID3"] == [[None]]
    assert got["EID4"] == [None]  # error row


def test_build_statements(spark, evidence):
    out = build_statements(spark, evidence)
    ok = out.filter(F.col("_error").isNull())
    bad = out.filter(F.col("_error").isNotNull())
    assert bad.filter(F.col("sourceId").isin("EID4", "EID5")).count() == bad.count()
    rows = ok.filter(F.col("sourceId") == "EID1").collect()
    assert len(rows) == 4  # 2 conjuncts x 2 therapies
    conds = {tuple(r.conditions) for r in rows}
    assert ("cml", "dasatinib", "v1", "v2") in conds
    assert all(r.relevance == "resistance" for r in rows)
    eid2 = ok.filter(F.col("sourceId") == "EID2").collect()
    assert len(eid2) == 1
    assert eid2[0].therapy == "dabrafenib + trametinib"
    eid3 = ok.filter(F.col("sourceId") == "EID3").collect()
    assert eid3[0].conditions == ["aml", "v5"]


def test_sync_statements_actions(spark, evidence):
    stored = spark.createDataFrame(
        [
            # exact match for one EID1 candidate -> update (keeps rid)
            ("EID1", ["cml", "dasatinib", "v1", "v2"], "resistance", "rid_1"),
            # stale statement -> delete
            ("EID9", ["zzz"], "resistance", "rid_9"),
        ],
        "sourceId string, conditions array<string>, relevance string, rid string",
    )
    out = sync_statements(spark, stored, evidence)
    acts = {r["_action"] for r in out.collect()}
    assert acts == {"update", "create", "delete"}
    upd = out.filter(F.col("_action") == "update").collect()
    assert any(r.rid == "rid_1" and r.sourceId == "EID1" for r in upd)
    dele = out.filter(F.col("_action") == "delete").collect()
    assert len(dele) == 1 and dele[0].rid == "rid_9"
    # EID2/EID3 are brand new -> creates
    creates = out.filter(F.col("_action") == "create")
    assert creates.filter(F.col("sourceId").isin("EID2", "EID3")).count() == 2


def test_pipeline_topo_and_cycle():
    ran = []

    def mk(name):
        def fn(state):
            ran.append(name)
            return state
        return fn

    jobs = {
        "civic": Job("civic", mk("civic"), deps=("ncit", "vocab")),
        "ncit": Job("ncit", mk("ncit"), deps=("vocab",)),
        "vocab": Job("vocab", mk("vocab")),
        "oncotree": Job("oncotree", mk("oncotree"), deps=("vocab",)),
    }
    _, order = run_pipeline(jobs, None)
    assert order == ["vocab", "ncit", "oncotree", "civic"]
    assert ran == order

    with pytest.raises(DependencyError):
        topo_order({"a": Job("a", mk("a"), deps=("b",)), "b": Job("b", mk("b"), deps=("a",))})
    with pytest.raises(DependencyError):
        topo_order({"a": Job("a", mk("a"), deps=("zzz",))})


def test_feature_hierarchy(spark):
    """J10: ensembl-style gene/transcript/protein ladders — versioned +
    generic features, GeneralizationOf + ElementOf edges."""
    from graphkb_spark.loaders.features import load_feature_hierarchy

    rows = spark.createDataFrame(
        [
            ("ENSG1", "1", "ENST1", "2", "ENSP1", "1"),
            ("ENSG1", "1", "ENST2", "1", None, None),  # non-coding transcript
            ("ENSG1", "2", "ENST1", "2", "ENSP1", "1"),  # new gene version only
        ],
        "gene_id string, gene_version string, transcript_id string,"
        " transcript_version string, protein_id string, protein_version string",
    )
    kb = empty_kb(spark)
    kb = load_feature_hierarchy(spark, kb, rows, "ensembl")
    feats = kb.features.collect()
    by_bt = {}
    for r in feats:
        by_bt.setdefault(r.biotype, []).append((r.sourceId, r.sourceIdVersion))
    # gene: 2 versioned + 1 generic; transcript: 2 versioned + 2 generic;
    # protein: 1 versioned + 1 generic
    assert sorted(by_bt["gene"], key=lambda t: (t[0], t[1] or "")) == [
        ("ENSG1", None), ("ENSG1", "1"), ("ENSG1", "2")]
    assert len(by_bt["transcript"]) == 4
    assert len(by_bt["protein"]) == 2
    edges = kb.edges.groupBy("edge_class").count().collect()
    n = {r.edge_class: r["count"] for r in edges}
    assert n["GeneralizationOf"] == 5  # 2 gene vers + 2 transcript vers + 1 protein
    assert n["ElementOf"] == 3  # ENST1->ENSG1, ENST2->ENSG1, ENSP1->ENST1
    # all edge endpoints resolve to existing features
    rids = {r.rid for r in feats}
    for e in kb.edges.collect():
        assert e.out_rid in rids and e.in_rid in rids


def test_apply_statement_actions(spark, evidence):
    """§2.9.2 write half: reconcile actions applied back to the
    statements table; deletes suppressible."""
    from graphkb_spark.loaders.civic import apply_statement_actions

    stored = spark.createDataFrame(
        [
            ("EID1", ["cml", "dasatinib", "v1", "v2"], "resistance", "rid_1"),
            ("EID9", ["zzz"], "resistance", "rid_9"),
        ],
        "sourceId string, conditions array<string>, relevance string, rid string",
    )
    actions = sync_statements(spark, stored, evidence)
    new_table = apply_statement_actions(stored, actions)
    rows = {r.rid for r in new_table.collect()}
    assert "rid_9" not in rows            # deleted
    assert "rid_1" in rows                # updated in place (rid kept)
    n_creates = actions.filter(F.col("_action") == "create").count()
    assert new_table.count() == 1 + n_creates

    suppressed = apply_statement_actions(stored, actions, delete_suppressed=True)
    assert "rid_9" in {r.rid for r in suppressed.collect()}


def test_resolve_publications(spark):
    """Batch getPublication (src/civic/publication.js:30-77): PMID
    broadcast join, ASCO titlesMatch with exactly-one enforcement,
    per-row quarantine for unknown types."""
    from graphkb_spark.loaders.civic import resolve_publications

    ev = spark.createDataFrame(
        [
            ("E1", "PUBMED", "1", None, None, None, None),
            ("E2", "PUBMED", "99", None, None, None, None),
            ("E3", "ASCO", None, "10", 2020, "My <em>Abstract</em> Ten.",
             "https://x/asco-10"),
            ("E4", "ASCO", None, "11", 1999, "Abstract Eleven", None),
            ("E5", "ASCO", None, "12", 2021, "Abstract Twelve", None),
            ("E6", "WEB", None, None, None, None, None),
        ],
        "sourceId string, source_type string, citation_id string, "
        "asco_abstract_id string, publication_year int, source_title string, "
        "source_url string",
    )
    pubmed = spark.createDataFrame([("1", "pm_1")], "sourceId string, rid string")
    abstracts = spark.createDataFrame(
        [
            ("10", 2020, "my abstract ten", "asco-10", "ab_10"),
            ("11", 2020, "Abstract Eleven", "asco-11", "ab_11"),
            ("12", 2021, "Abstract Twelve.", "asco-12", "ab_12"),
            ("12", 2021, "abstract twelve", "asco-12b", "ab_12b"),
        ],
        "abstract_id string, year int, name string, sourceId string, rid string",
    )
    rows = {r.sourceId: r for r in resolve_publications(ev, pubmed, abstracts).collect()}
    assert len(rows) == 6  # one row per evidence item, fan-out collapsed
    assert rows["E1"].publication_rid == "pm_1" and rows["E1"]._pub_error is None
    assert "PMID 99 is not available" in rows["E2"]._pub_error
    assert rows["E3"].publication_rid == "ab_10" and rows["E3"]._pub_error is None
    assert "failed to select" in rows["E4"]._pub_error  # year mismatch
    assert "too many choices" in rows["E5"]._pub_error  # duplicate abstracts
    assert "non-pubmed/non-asco" in rows["E6"]._pub_error


def test_get_or_create_evidence_levels(spark):
    """Batch getEvidenceLevel (src/civic/evidenceLevel.js:30-56):
    level key = lower(level+rating), existing reused, rest created with
    VOCAB descriptions."""
    from graphkb_spark.loaders.civic import get_or_create_evidence_levels

    ev = spark.createDataFrame(
        [("E1", "A", 3), ("E2", "B", None), ("E3", "A", 3)],
        "sourceId string, evidence_level string, evidence_rating int",
    )
    existing = spark.createDataFrame(
        [("a3", "EL_a3")], "name string, rid string"
    )
    out, created = get_or_create_evidence_levels(ev, existing)
    rows = {r.sourceId: r for r in out.collect()}
    assert rows["E1"].evidence_level_rid == "EL_a3"
    assert rows["E3"].evidence_level_rid == "EL_a3"
    assert rows["E2"].evidence_level_rid is not None
    new = {r.name: r for r in created.collect()}
    assert set(new) == {"b"}  # a3 existed; only b is created
    assert "Clinical trial" in new["b"].description
    assert new["b"].displayName == "CIViC B"


def test_resolve_diseases(spark):
    """Batch getDisease (src/civic/disease.js:12-36): DOID rows match
    sourceId doid:<n>, the rest by name; unmatched quarantined."""
    from graphkb_spark.loaders.civic import resolve_diseases

    ev = spark.createDataFrame(
        [
            ("E1", "melanoma", 123),       # doid match
            ("E2", "Skin Cancer", None),   # name match (case-insensitive)
            ("E3", "no such disease", None),
        ],
        "sourceId string, disease string, doid int",
    )
    diseases = spark.createDataFrame(
        [
            ("doid:123", "melanoma", "d_mel"),
            ("doid:456", "skin cancer", "d_skin"),
        ],
        "sourceId string, name string, rid string",
    )
    rows = {r.sourceId: r for r in resolve_diseases(ev, diseases).collect()}
    assert rows["E1"].disease_rid == "d_mel" and rows["E1"]._disease_error is None
    assert rows["E2"].disease_rid == "d_skin"
    assert rows["E3"].disease_rid is None
    assert "disease not found" in rows["E3"]._disease_error
