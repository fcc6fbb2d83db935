"""F2/F3/F4/F9/F10/F11 normalizer tests (SURVEY §2.8), table-driven
like the reference's test/oncokb.test.js, test/civic/civic.variant.test.js."""

import pytest
from pyspark.sql import functions as F

from graphkb_spark.functions.variant_names import (
    canonical_phases,
    extract_year,
    fix_docm_variant,
    normalize_civic_variant,
    parse_abstract_citation,
    parse_oncokb_variant_name,
    translate_relevance,
)


@pytest.mark.parametrize(
    "name,ref1,expect",
    [
        ("G12D", None, {"type": "p.g12d"}),
        ("V600E", None, {"type": "p.v600e"}),
        ("X1010_splice", None, {"type": "p.x1010spl"}),
        ("e14_e15splice", None, {"type": "p.(e14_e15)spl"}),
        # fusion flip detection (reference test/oncokb.test.js)
        ("BCR-ABL1", "ABL1", {"type": "fusion", "reference2": "bcr", "flipped": True}),
        ("BCR-ABL1", "BCR", {"type": "fusion", "reference2": "abl1", "flipped": False}),
        ("exon 19 deletion", None, {"type": "e.19del"}),
        ("exon 20 insertions", None, {"type": "e.20ins"}),
        ("exon 14 deletion/insertion", None, {"type": "e.14delins"}),
        ("Exon 2 and 3 deletion", None, {"type": "e.2_3del"}),
        ("Amplification", None, {"type": "amplification"}),
        ("Truncating Mutations", None, {"type": "truncating"}),
        ("E55_K60trunc", None, {"type": "p.(e55_k60)*"}),
        ("E55_K60fs", None, {"type": "p.(e55_k60)fs"}),
    ],
)
def test_oncokb_parse(name, ref1, expect):
    out = parse_oncokb_variant_name(name, ref1)
    assert out["error"] is None, out
    for k, v in expect.items():
        assert out[k] == v, (k, out)


def test_oncokb_fusion_mismatch_is_error():
    out = parse_oncokb_variant_name("BCR-ABL1", "KRAS")
    assert out["error"] is not None and "do not match" in out["error"]


@pytest.mark.parametrize(
    "variant,expect",
    [
        ("p.K12-", "p.K12delK"),                 # single-aa trailing deletion
        ("p.KK12-", "p.K12_K13delKK"),           # multi-aa trailing deletion
        ("p.DI842VM", "p.D842_I843delDIinsVM"),  # delins
        ("p.KDI842KVM", "p.D843_I844delDIinsVM"),  # common prefix trimmed
        ("p.G12D", "p.G12D"),                    # standard passes through
        ("banana", "banana"),
    ],
)
def test_docm_fix(variant, expect):
    assert fix_docm_variant(variant) == expect


def test_civic_conjunction_split():
    out = normalize_civic_variant("V600E + AMPLIFICATION", "BRAF")
    assert len(out) == 2
    assert out[0]["variant"] == "p.v600e" and out[0]["positional"]
    assert out[1]["variant"] == "amplification" and not out[1]["positional"]


def test_civic_translocation():
    out = normalize_civic_variant("t(9;22)(q34;q11)", "BCR")
    assert out == [
        {"reference1": "9", "reference2": "22",
         "variant": "translocation(q34, q11)", "positional": True, "error": None,
         "link": None}
    ]


def test_civic_fusion_and_slash_error():
    # matching partner is replaced by the annotated gene (reference
    # test: BCR-ABL w/ ABL1 -> reference2 abl1)
    out = normalize_civic_variant("BCR-ABL", "ABL1")
    assert out[0]["variant"] == "fusion" and out[0]["reference2"] == "abl1"
    assert out[0]["reference1"] == "bcr"
    bad = normalize_civic_variant("one / two", "X")
    assert bad[0]["error"] is not None


def test_civic_fusion_partner_mismatch_is_error():
    out = normalize_civic_variant("EML4-ALK", "KRAS")
    assert out[0]["error"] is not None and "fusion partner" in out[0]["error"]


def test_civic_exon_range():
    out = normalize_civic_variant("exon 9-11 deletion", "KIT")
    assert out[0]["variant"] == "e.9_11del"


def test_civic_intron_and_frameshift():
    assert normalize_civic_variant("intron 3 mutation", "MET")[0]["variant"] == "i.3mut"
    assert (
        normalize_civic_variant("EXON 12 FRAMESHIFT", "GENE")[0]["variant"] == "e.12fs"
    )


def test_civic_phosphorylation_and_splice_site():
    out = normalize_civic_variant("Y1234 phosphorylation", "GENE")
    assert out == [
        {"reference1": "gene", "reference2": None, "variant": "p.y1234phos",
         "positional": True, "error": None, "link": None}
    ]
    out = normalize_civic_variant("F10 splice site mutation", "GENE")
    assert out[0]["variant"] == "p.f10spl" and out[0]["positional"]


def test_civic_fusion_with_resistance_mutation():
    # reference test 'ALK FUSION G1202R' -> category fusion + p.g1202r
    out = normalize_civic_variant("ALK FUSION G1202R", "ALK")
    assert len(out) == 2
    assert out[0]["variant"] == "fusion" and not out[0]["positional"]
    assert out[1]["variant"] == "p.g1202r" and out[1]["positional"]


def test_civic_exon_pair_fusions():
    # 'EWSR1-FLI1 e7-e6' and 'EML4-ALK E20;A20' -> positional fusion
    out = normalize_civic_variant("EWSR1-FLI1 e7-e6", "FLI1")
    assert out == [
        {"reference1": "ewsr1", "reference2": "fli1",
         "variant": "fusion(e.7,e.6)", "positional": True, "error": None,
         "link": None}
    ]
    out = normalize_civic_variant("EML4-ALK E20;A20", "ALK")
    assert out[0]["variant"] == "fusion(e.20,e.20)" and out[0]["positional"]
    # '::' separator variant of the same notation
    out = normalize_civic_variant("EML4::ALK E20;A20", "EML4")
    assert out[0]["variant"] == "fusion(e.20,e.20)"
    assert out[0]["reference1"] == "eml4" and out[0]["reference2"] == "alk"


def test_civic_fusion_with_trailing_mutations_splits():
    # SUBS fix: 'EML4-ALK G1202R-L1198F' -> fusion + two protein muts
    out = normalize_civic_variant("EML4-ALK G1202R-L1198F", "ALK")
    assert [r["variant"] for r in out] == ["fusion", "p.g1202r", "p.l1198f"]


def test_civic_protein_plus_cds():
    # combined notation: protein primary + cds as inferredBy link;
    # deprecated multi-base cds substitution rewritten to delins
    out = normalize_civic_variant("S111C (c.330CA>TT)", "NTRK1")
    assert out[0]["variant"] == "p.s111c" and out[0]["link"] is None
    assert out[1]["variant"] == "c.330_331delcainstt"
    assert out[1]["link"] == "inferredBy" and out[1]["positional"]
    out = normalize_civic_variant("E46* (c.136G>T)", "ALK")
    assert out[0]["variant"] == "p.e46*"
    assert out[1]["variant"] == "c.136g>t" and out[1]["link"] == "inferredBy"


def test_civic_splicing_alteration():
    out = normalize_civic_variant("Splicing alteration (c.463+2T>C)", "GENE")
    assert out[0]["variant"] == "c.463+2t>c" and out[0]["positional"]
    assert out[1]["variant"] == "splicing alteration" and out[1]["link"] == "infers"


def test_civic_category_fallbacks():
    # single-gene fusion, domain, deleterious, trailing '<gene> mutation',
    # and the final category fallback (reference returns a category
    # variant, never throws)
    assert normalize_civic_variant("NRG1 fusions", "NRG1")[0]["variant"] == "fusion"
    out = normalize_civic_variant("DNA BINDING DOMAIN MUTATION", "NTRK1")
    assert out[0]["variant"] == "dna binding domain mutation"
    assert normalize_civic_variant("DELETRIOUS MUTATION", "G")[0]["variant"] == \
        "deletrious mutation"
    assert normalize_civic_variant("NTRK1 mutations", "NTRK1")[0]["variant"] == \
        "mutation"
    assert normalize_civic_variant("UNDEREXPRESSION", "NTRK1")[0]["variant"] == \
        "underexpression"


def test_civic_spaced_cds_and_not_implemented():
    assert normalize_civic_variant("c.123 G>T", "ABL1")[0]["variant"] == "c.123g>t"
    assert normalize_civic_variant("Non-V600", "BRAF")[0]["error"] is not None


def test_citation_phase_year_columns(spark):
    df = spark.createDataFrame(
        [
            ("Abstract# 8001, ASCO 2014", ["EARLY_PHASE1", "PHASE1/PHASE2"], "2014 Jun 5"),
            ("no citation here", ["NA", "PH"], "not a date"),
        ],
        "citation string, phases array<string>, pubdate string",
    )
    rows = df.select(
        parse_abstract_citation("citation").alias("cit"),
        canonical_phases("phases").alias("phase"),
        extract_year("pubdate").alias("year"),
    ).collect()
    assert rows[0].cit.abstractNumber == "8001"
    assert rows[0].cit.source == "ASCO" and rows[0].cit.year == 2014
    assert rows[0].phase == "1/1/2"
    assert rows[0].year == 2014
    assert rows[1].cit is None and rows[1].phase == "" and rows[1].year is None


def test_relevance_translation_broadcast(spark):
    df = spark.createDataFrame(
        [
            ("PREDICTIVE", "SUPPORTS", "RESISTANCE"),
            ("PREDICTIVE", "DOES_NOT_SUPPORT", "SENSITIVITYRESPONSE"),
            ("NOPE", "SUPPORTS", "RESISTANCE"),
        ],
        "evidence_type string, direction string, significance string",
    )
    out = translate_relevance(df, spark)
    got = {(r.evidence_type, r.direction, r.significance): r.relevance for r in out.collect()}
    assert got[("PREDICTIVE", "SUPPORTS", "RESISTANCE")] == "resistance"
    assert got[("PREDICTIVE", "DOES_NOT_SUPPORT", "SENSITIVITYRESPONSE")] == "no response"
    assert got[("NOPE", "SUPPORTS", "RESISTANCE")] is None
