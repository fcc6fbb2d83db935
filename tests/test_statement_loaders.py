"""Statement-loader family (loaders/statements.py) — golden-row tests
mirroring the reference's fixture-driven loader tests (SURVEY §5)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from graphkb_spark.loaders.statements import (
    load_cancerhotspots,
    load_cosmic_fusions,
    load_cosmic_resistance,
    load_dgidb,
    load_moa,
    load_oncokb,
)


def test_cancerhotspots_filters_and_notation(spark):
    rows = [
        # kept: HIGH + pathogenic, substitution
        dict(NCBI_Build="GRCh37", HGVSc="c.35G>A", Chromosome="12", CLIN_SIG="pathogenic",
             dbSNP_RS="rs121913529", oncotree_detailed="PAAD", Entrez_Gene_Id="3845",
             IMPACT="HIGH", HGVSp_Short="p.G12D", Reference_Allele="G", Start_Position="25398284",
             End_Position="25398284", Transcript_ID="ENST00000256078", Allele="A"),
        # dropped: benign
        dict(NCBI_Build="GRCh37", HGVSc="c.1A>T", Chromosome="1", CLIN_SIG="likely_benign",
             dbSNP_RS="", oncotree_detailed="LUAD", Entrez_Gene_Id="1",
             IMPACT="HIGH", HGVSp_Short="p.M1L", Reference_Allele="A", Start_Position="10",
             End_Position="10", Transcript_ID="T1", Allele="T"),
        # dropped: synonymous
        dict(NCBI_Build="GRCh37", HGVSc="c.2A>A", Chromosome="1", CLIN_SIG="pathogenic",
             dbSNP_RS="", oncotree_detailed="LUAD", Entrez_Gene_Id="1",
             IMPACT="HIGH", HGVSp_Short="p.M1=", Reference_Allele="A", Start_Position="11",
             End_Position="11", Transcript_ID="T1", Allele="A"),
        # dropped: MODERATE impact
        dict(NCBI_Build="GRCh37", HGVSc="c.3G>C", Chromosome="2", CLIN_SIG="pathogenic",
             dbSNP_RS="", oncotree_detailed="SKCM", Entrez_Gene_Id="2",
             IMPACT="MODERATE", HGVSp_Short="p.A2P", Reference_Allele="G", Start_Position="12",
             End_Position="12", Transcript_ID="T2", Allele="C"),
        # kept: deletion ('-' alt)
        dict(NCBI_Build="GRCh37", HGVSc="c.4del", Chromosome="7", CLIN_SIG="pathogenic",
             dbSNP_RS="", oncotree_detailed="GBM", Entrez_Gene_Id="7",
             IMPACT="HIGH", HGVSp_Short="p.E746del", Reference_Allele="GAA", Start_Position="100",
             End_Position="102", Transcript_ID="T7", Allele="-"),
    ]
    out = load_cancerhotspots(spark.createDataFrame([Row(**r) for r in rows]))
    got = {r["protein"]: r for r in (x.asDict() for x in out.collect())}
    assert set(got) == {"p.G12D", "p.E746del"}
    assert got["p.G12D"]["genomic"] == "12:g.25398284G>A"
    assert got["p.E746del"]["genomic"] == "7:g.100_102delGAA"
    assert got["p.G12D"]["conditions"] == ["ENST00000256078:p.G12D", "PAAD"]
    assert got["p.G12D"]["relevance"] == "mutation hotspot"


def test_cosmic_resistance_classification_and_skip(spark):
    raw = spark.createDataFrame(
        [
            Row(**{
                "HGVSC": "c.35G>A", "Histology Subtype 1": "adenocarcinoma",
                "Histology": "carcinoma", "Gene Name": "KRAS", "HGVSG": "g.1A>T",
                "LEGACY_MUTATION_ID": "COSM521", "HGVSP": "p.G12D", "Pubmed Id": "123",
                "Sample ID": "S1", "Sample Name": "s1", "Drug Name": "cetuximab",
                "Transcript": "ENST1",
            }),
            Row(**{
                "HGVSC": "c.?", "Histology Subtype 1": "NS", "Histology": "other",
                "Gene Name": "EGFR", "HGVSG": "g.2C>G", "LEGACY_MUTATION_ID": "COSM2",
                "HGVSP": "p.?", "Pubmed Id": "456", "Sample ID": "S2", "Sample Name": "s2",
                "Drug Name": "erlotinib", "Transcript": "ENST2",
            }),
        ]
    )
    cls = spark.createDataFrame(
        [Row(diseaseFamily="carcinoma", disease="adenocarcinoma", ncit="C0001")]
    )
    out = load_cosmic_resistance(raw, cls).collect()
    assert len(out) == 1  # p.? skipped
    row = out[0].asDict()
    assert row["ncit"] == "C0001"
    assert row["relevance"] == "resistance"
    assert row["conditions"] == ["C0001", "KRAS:p.G12D", "cetuximab"]
    assert row["_error"] is None
    # whole-row hash id is deterministic
    again = load_cosmic_resistance(raw, cls).collect()[0].asDict()
    assert again["sourceId"] == row["sourceId"]


def test_cosmic_fusions_recurrence_and_suppression(spark):
    def fus(g1, e1, g2, e2, sample, fid, disease="ALL", fam="leukaemia"):
        return Row(gene1=g1, exon1=e1, gene2=g2, exon2=e2, sampleId=sample,
                   fusionId=fid, disease=disease, diseaseFamily=fam)

    rows = (
        # specific fusion recurrent in 3 distinct samples -> level 0 keeps,
        # and levels 1/2 (same rows) are suppressed as covered
        [fus("BCR", "14", "ABL1", "2", f"S{i}", "F1") for i in range(3)]
        # different exon pair, same gene pair, only 2 samples each -> no
        # level-0 group, but level-1 (non-specific, same disease) has 5
        + [fus("BCR", "1", "ABL1", "2", f"T{i}", "F2") for i in range(2)]
    )
    out = load_cosmic_fusions(spark.createDataFrame(rows))
    got = out.select("level", "variant", "nonSpecificVariant", "n_samples").collect()
    by_level = {}
    for r in got:
        by_level.setdefault(r["level"], []).append(r.asDict())
    assert [r["variant"] for r in by_level.get(0, [])] == ["(BCR,ABL1):fusion(e.14,e.2)"]
    # level 1 survives: F2's rows are not covered by the level-0 group
    assert len(by_level.get(1, [])) == 1 and by_level[1][0]["n_samples"] == 5
    # level 2 fully covered by level 1 -> suppressed
    assert 2 not in by_level
    conds = {tuple(r["conditions"]) for r in out.select("conditions").collect()}
    assert ("(BCR,ABL1):fusion(e.14,e.2)", "ALL") in conds


def test_moa_relevance_terms(spark):
    rows = [
        Row(sourceId="a1", therapy_name="imatinib", therapy_resistance=True,
            therapy_sensitivity=None, favorable_prognosis=None,
            variants=[Row(name="ABL1:p.T315I", pathogenic="1.0")], disease="CML"),
        Row(sourceId="a2", therapy_name=None, therapy_resistance=None,
            therapy_sensitivity=None, favorable_prognosis=1,
            variants=[Row(name="X:del", pathogenic="0.0")], disease="AML"),
        Row(sourceId="a3", therapy_name="x", therapy_resistance=True,
            therapy_sensitivity=True, favorable_prognosis=None,
            variants=[], disease="d"),
        Row(sourceId="a4", therapy_name=None, therapy_resistance=None,
            therapy_sensitivity=None, favorable_prognosis=None,
            variants=[], disease="d"),
    ]
    out = load_moa(spark.createDataFrame(rows))
    rel = {
        r["sourceId"]: r["relevance"]
        for r in out.filter(F.col("_error").isNull()).collect()
    }
    # a1: resistance + pathogenic (two exploded rows)
    a1 = [r["relevance"] for r in out.filter("sourceId='a1'").collect()]
    assert sorted(a1) == ["pathogenic", "resistance"]
    assert rel["a2"] == "favourable prognosis"
    errs = {r["sourceId"]: r["_error"] for r in out.filter(F.col("_error").isNotNull()).collect()}
    assert "nonsensical" in errs["a3"]
    assert errs["a4"] == "statement has no relevance"
    a1row = out.filter("sourceId='a1' and relevance='resistance'").collect()[0]
    assert a1row["conditions"] == ["ABL1:p.T315I", "CML", "imatinib"]


def test_oncokb_level_and_drug_split(spark):
    rows = [
        Row(gene="EGFR", variant="L858R", disease="LUAD", level="1",
            drugs="Erlotinib, Gefitinib", pmids="1,2", abstracts="Abst 1; "),
        Row(gene="EGFR", variant="T790M", disease="LUAD", level="R1",
            drugs="erlotinib", pmids="", abstracts=None),
        Row(gene="BRAF", variant="V600E", disease="SKCM", level="weird",
            drugs="vemurafenib", pmids="3", abstracts=None),
    ]
    out = load_oncokb(spark.createDataFrame(rows))
    ok = out.filter(F.col("_error").isNull()).collect()
    by = {}
    for r in ok:
        by.setdefault((r["variant"], r["drug"]), r.asDict())
    assert by[("L858R", "erlotinib")]["relevance"] == "sensitivity"
    assert by[("L858R", "gefitinib")]["relevance"] == "sensitivity"
    assert by[("T790M", "erlotinib")]["relevance"] == "resistance"
    assert by[("L858R", "erlotinib")]["support"] == ["1", "2", "Abst 1"]
    # distinct drugs get distinct sourceIds; error rows quarantined
    assert by[("L858R", "erlotinib")]["sourceId"] != by[("L858R", "gefitinib")]["sourceId"]
    errs = out.filter(F.col("_error").isNotNull()).collect()
    assert len(errs) == 1 and "weird" in errs[0]["_error"]


def test_dgidb_edges(spark):
    raw = spark.createDataFrame(
        [Row(entrez_id=1956, concept_id="chembl:CHEMBL553",
             interaction_types=["Inhibitor", " antagonist "], id="uuid-1")]
    )
    row = load_dgidb(raw).collect()[0].asDict()
    assert row == {
        "out": "1956", "in": "CHEMBL553", "actionType": "antagonist;inhibitor",
        "uuid": "uuid-1", "edge_class": "TargetOf",
    }


def test_cgi_variant_combinations(spark):
    from graphkb_spark.loaders.statements import load_cgi

    rows = [
        Row(**{
            "Alteration": "a", "Biomarker": "KRAS (G12,G13)", "cDNA": "c",
            "Primary Tumor type full name": "Any cancer type", "Drug": "Responsive drug",
            "Drug family": "f", "Source": "PMID:1", "Evidence level": "A", "Gene": "KRAS",
            "gDNA": "g", "Association": "Resistant", "Curation date": "d", "Curator": "c",
            "transcript": "t", "Alteration type": "MUT", "protein": "",
        }),
        Row(**{
            "Alteration": "a", "Biomarker": "BCR-ABL1 fusion + EGFR amplification", "cDNA": "c",
            "Primary Tumor type full name": "Ovary;Endometrium", "Drug": "fluvestrant",
            "Drug family": "f", "Source": "PMID:2", "Evidence level": "A", "Gene": "BCR",
            "gDNA": "g", "Association": "Responsive", "Curation date": "d", "Curator": "c",
            "transcript": "t", "Alteration type": "FUS", "protein": "",
        }),
        Row(**{
            "Alteration": "a", "Biomarker": "A + B + C", "cDNA": "c",
            "Primary Tumor type full name": "thymic", "Drug": "x", "Drug family": "f",
            "Source": "PMID:3", "Evidence level": "A", "Gene": "A", "gDNA": "g",
            "Association": "Responsive", "Curation date": "d", "Curator": "c",
            "transcript": "t", "Alteration type": "MUT", "protein": "",
        }),
    ]
    out = load_cgi(spark.createDataFrame(rows).withColumn("protein", F.lit("")))
    ok = out.filter(F.col("_error").isNull()).collect()
    errs = out.filter(F.col("_error").isNotNull()).collect()
    # row 1: 2 protein variants x 1 disease; relevance typo fixed
    r1 = [r for r in ok if r["gene"] == "KRAS"]
    assert {tuple(r["condition_set"]) for r in r1} == {("KRAS:p.G12mut",), ("KRAS:p.G13mut",)}
    assert all(r["relevance"] == "resistance" for r in r1)
    assert all(r["disease_single"] == "cancer" for r in r1)
    # row 2: 1x1 combination across two diseases; therapy + disease typo maps
    r2 = [r for r in ok if r["gene"] == "BCR"]
    assert len(r2) == 2
    assert sorted(r["disease_single"] for r in r2) == ["endometrial cancer", "ovarian cancer"]
    assert all(r["therapy"] == "fulvestrant" for r in r2)
    assert all(r["condition_set"] == ["(BCR,ABL1):fusion", "EGFR:amplification"] for r in r2)
    assert all("(BCR,ABL1):fusion" in r["conditions"] for r in r2)
    # row 3: 3-way combination -> quarantined
    assert len(errs) == 1 and "3 or more" in errs[0]["_error"]


def test_clinicaltrials_consensus_and_phases(spark):
    from graphkb_spark.loaders.statements import load_clinicaltrials

    rows = [
        Row(nctId="NCT1", officialTitle="Official", briefTitle="Brief",
            overallStatus="RECRUITING", lastUpdatePosted="2024-01-02",
            startDate="2020-01-01", completionDate=None,
            conditions=["cancer"], phases=["PHASE1/PHASE2"],
            locations=[Row(city="Vancouver", country="Canada"),
                       Row(city="Toronto", country="CANADA")]),
        Row(nctId="NCT2", officialTitle=None, briefTitle="B2",
            overallStatus="COMPLETED", lastUpdatePosted="2024-02-03",
            startDate=None, completionDate="2023-12-31",
            conditions=["melanoma"], phases=["EARLY_PHASE1"],
            locations=[Row(city="Paris", country="France"),
                       Row(city="Boston", country="USA")]),
    ]
    out = {r["sourceId"]: r.asDict() for r in load_clinicaltrials(spark.createDataFrame(rows)).collect()}
    n1 = out["NCT1"]
    assert n1["name"] == "Official"
    assert n1["phase"] == "1/2"
    assert n1["country"] == "canada" and n1["city"] is None  # cities disagree
    assert n1["sourceIdVersion"] == "2024-01-02"
    n2 = out["NCT2"]
    assert n2["name"] == "B2"
    assert n2["phase"] == "1"
    assert n2["country"] is None and n2["city"] is None  # countries disagree
    assert n2["url"].endswith("/NCT2")
