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
