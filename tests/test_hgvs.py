"""HGVS parser cases (modeled on the reference's parser usage across
loaders — SURVEY §2.8 F1; e.g. test/oncokb.test.js fusion handling,
test/moa.test.js composeGenomicHgvs ins/del/sub/indel cases)."""

import pytest

from graphkb_spark.functions.hgvs import parse_variant


@pytest.mark.parametrize(
    "notation,expect",
    [
        ("p.G12D", {"prefix": "p", "variant_type": "missense", "break1_start": 12,
                    "ref_aa": "G", "alt_aa": "D"}),
        ("KRAS:p.G12D", {"reference1": "KRAS", "variant_type": "missense"}),
        ("p.R777fs", {"variant_type": "frameshift", "break1_start": 777}),
        ("p.E746_A750del", {"variant_type": "deletion", "break1_start": 746,
                            "break2_start": 750}),
        ("p.V600delinsEK", {"variant_type": "indel", "alt_seq": "EK"}),
        ("c.35G>A", {"prefix": "c", "variant_type": "substitution", "break1_start": 35,
                     "ref_seq": "G", "alt_seq": "A"}),
        ("g.140453136A>T", {"prefix": "g", "variant_type": "substitution",
                            "break1_start": 140453136}),
        ("c.123-2A>G", {"prefix": "c", "variant_type": "substitution", "break1_start": 123}),
        ("e.19del", {"prefix": "e", "variant_type": "deletion", "break1_start": 19}),
        ("c.67dup", {"variant_type": "duplication"}),
        ("c.35_37delinsAA", {"variant_type": "indel", "break1_start": 35,
                             "break2_start": 37, "alt_seq": "AA"}),
        ("fusion(e.13,e.3)", {"variant_type": "fusion", "break1_start": 13,
                              "break2_start": 3}),
        ("(EWSR1,FLI1):fusion(e.7,e.6)", {"reference1": "EWSR1", "reference2": "FLI1",
                                          "variant_type": "fusion"}),
        # extended grammar: cytoband / intronic / uncertain / ext / spl / phos
        ("translocation(q34, q11)", {"prefix": "y", "variant_type": "translocation",
                                     "break1_repr": "q34", "break2_repr": "q11"}),
        ("y.p26.3_p25.3del", {"prefix": "y", "variant_type": "deletion",
                              "break1_repr": "p26.3", "break2_repr": "p25.3"}),
        ("i.3mut", {"prefix": "i", "variant_type": "mutation", "break1_start": 3}),
        ("e.12fs", {"prefix": "e", "variant_type": "frameshift", "break1_start": 12}),
        ("p.X1010spl", {"variant_type": "splice-site", "break1_start": 1010}),
        ("p.Y1234phos", {"variant_type": "phosphorylation", "break1_start": 1234}),
        ("p.(G12_G13)mut", {"variant_type": "mutation", "break1_start": 12,
                            "break2_start": 13, "uncertain": True}),
        ("p.(E55_K60)fs", {"variant_type": "frameshift", "uncertain": True}),
        ("p.(E55_K60)*", {"variant_type": "truncating", "break1_start": 55,
                          "break2_start": 60, "uncertain": True}),
        ("p.?755_?759del", {"variant_type": "deletion", "break1_start": 755,
                            "break2_start": 759, "uncertain": True}),
        ("p.T1151_?1152insT", {"variant_type": "insertion", "alt_seq": "T",
                               "uncertain": True}),
        ("p.*807ext*101", {"variant_type": "extension", "break1_start": 807}),
        ("c.463+2T>C", {"prefix": "c", "variant_type": "substitution",
                        "break1_start": 463, "break1_repr": "463+2"}),
    ],
)
def test_parse_ok(notation, expect):
    out = parse_variant(notation)
    assert out["error"] is None, out
    for k, v in expect.items():
        assert out[k] == v, (k, out)


@pytest.mark.parametrize("notation", ["", "garbage!!", "p.12", None])
def test_parse_error_quarantined(notation):
    out = parse_variant(notation)
    assert out["error"] is not None
    assert out["variant_type"] is None


def test_compose_genomic_hgvs(spark):
    """Mirrors reference composeGenomicHgvs cases (src/moa/index.js:19-45)."""
    from pyspark.sql import functions as F

    from graphkb_spark.functions.hgvs import compose_genomic_hgvs

    df = spark.createDataFrame(
        [
            ("7", 140453136, 140453136, "A", "T"),   # sub
            ("7", 140453136, 140453137, "AC", ""),   # del
            ("7", 140453136, 140453136, "", "TT"),   # ins
            ("7", 140453136, 140453138, "ACG", "TT"),  # delins
        ],
        ["chrom", "start", "stop", "ref", "alt"],
    )
    rows = df.select(
        compose_genomic_hgvs(
            F.col("chrom"), F.col("start"), F.col("stop"), F.col("ref"), F.col("alt")
        ).alias("h")
    ).collect()
    assert [r.h for r in rows] == [
        "7:g.140453136A>T",
        "7:g.140453136_140453137del",
        "7:g.140453136insTT",
        "7:g.140453136_140453138delinsTT",
    ]
