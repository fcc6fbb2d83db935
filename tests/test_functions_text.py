"""Scalar functions + text analysis + hashing + graph ops."""

import hashlib
import json

from pyspark.sql import functions as F


def test_stable_hash_id_matches_json_stable_stringify(spark):
    """md5 of key-sorted JSON (reference hashRecordToId,
    src/util.js:186-193)."""
    from graphkb_spark.functions.hashing import stable_hash_id

    df = spark.createDataFrame([("oncokb", 42)], ["name", "num"])
    got = df.select(stable_hash_id("num", "name").alias("h")).first().h
    expected = hashlib.md5(
        json.dumps({"name": "oncokb", "num": 42}, separators=(",", ":")).encode()
    ).hexdigest()
    assert got == expected


def test_normalizers(spark):
    from graphkb_spark.functions.normalize import (
        clean_disease_name,
        gene_name_key,
        norm_case_space,
        norm_title,
        null_like_to_null,
    )

    df = spark.createDataFrame(
        [("  Mixed   CASE  ", "Acute_Myeloid_Leukaemia", "The Title.", "ABL1", "None")],
        ["a", "b", "c", "d", "e"],
    )
    row = df.select(
        norm_case_space("a").alias("a"),
        clean_disease_name("b").alias("b"),
        norm_title("c").alias("c"),
        gene_name_key("d").alias("d"),
        null_like_to_null("e").alias("e"),
    ).first()
    assert row.a == "mixed case"
    assert row.b == "acute myeloid leukemia"
    assert row.c == "the title"
    assert row.d == "abl"
    assert row.e is None


def test_lang_id_and_tokens(spark):
    from graphkb_spark.operators.text import lang_id, token_count, whitespace_token_count

    df = spark.createDataFrame(
        [
            ("the cat and the dog is in that house",),
            ("der hund ist nicht in das haus und der garten",),
            ("xyzzy qwerty",),
        ],
        ["text"],
    )
    rows = df.select(
        lang_id("text").alias("lang"),
        whitespace_token_count("text").alias("ws"),
        token_count("text").alias("tok"),
    ).collect()
    assert rows[0].lang == "en"
    assert rows[1].lang == "de"
    assert rows[2].lang == "und"
    assert rows[0].ws == 9
    assert rows[0].tok == 9


def test_graph_expand_and_edge_exists(spark):
    from graphkb_spark.core.schemas import EDGE_SCHEMA
    from graphkb_spark.operators.graph import edge_exists, expand_neighbors

    edges = spark.createDataFrame(
        [("a", "b", "SubClassOf", None), ("b", "c", "SubClassOf", None),
         ("x", "y", "AliasOf", None)],
        EDGE_SCHEMA,
    )
    seeds = spark.createDataFrame([("a",)], ["rid"])
    got = {(r.rid, r.hop) for r in expand_neighbors(seeds, edges, "rid", 2).collect()}
    assert got == {("a", 0), ("b", 1), ("c", 2)}

    pairs = spark.createDataFrame([("a", "b"), ("a", "c")], ["o", "i"])
    ex = {(r.o, r.i): r.edge_exists for r in edge_exists(
        pairs, edges, "o", "i", "SubClassOf"
    ).collect()}
    assert ex == {("a", "b"): True, ("a", "c"): False}


def test_canonical_edge_class():
    import pytest

    from graphkb_spark.core.schemas import canonical_edge_class

    assert canonical_edge_class("subclassof") == "SubClassOf"
    assert canonical_edge_class("ALIASOF") == "AliasOf"
    with pytest.raises(ValueError):
        canonical_edge_class("nope")


def test_aggregate_ops(spark):
    from graphkb_spark.operators.aggregate import (
        consensus_value,
        recurrence_threshold,
        version_chain,
    )

    df = spark.createDataFrame(
        [("g1", "s1", "US"), ("g1", "s2", "US"), ("g1", "s3", "US"),
         ("g2", "s1", "US"), ("g2", "s1", "CA")],
        ["g", "sample", "country"],
    )
    rec = {r.g: r.n for r in recurrence_threshold(df, ["g"], "sample", 3, "n").collect()}
    assert rec == {"g1": 3}
    cons = {r.g: r.consensus_country for r in consensus_value(
        df, ["g"], "country"
    ).collect()}
    assert cons == {"g1": "US", "g2": None}

    versions = spark.createDataFrame([("v1",), ("v2",), ("v3",)], ["v"])
    chain = {r.v: r.previous for r in version_chain(versions, "v").collect()}
    assert chain == {"v1": None, "v2": "v1", "v3": "v2"}


def test_repetition_features(spark):
    from graphkb_spark.operators.text import repetition_features

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),        # one word repeated 4x
            (2, "all words here are unique"),  # no repetition
            (3, ""),                           # degenerate
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in repetition_features(df, "text").collect()}
    # doc 1: 2 identical 3-grams of 2 -> dup frac 0.5; top word 4/4
    assert got[1].r_dup_3gram_frac == 0.5
    assert got[1].r_top_word_frac == 1.0
    assert got[2].r_dup_3gram_frac == 0.0
    assert got[2].r_top_word_frac == 0.2
    assert got[3].r_dup_3gram_frac == 0.0 and got[3].r_top_word_frac == 0.0


def test_build_vocab_rank_and_ties(spark):
    from graphkb_spark.operators.corpus import build_vocab

    df = spark.createDataFrame(
        [(1, "b a a b c b"), (2, "a b . .")], ["doc_id", "text"]
    )
    got = {r.token: (r.token_id, r.freq) for r in build_vocab(df, "text", vocab_size=3).collect()}
    # freq: a=3 b=4 c=1 .=2 -> ranks: b(0), a(1), .(2); c cut by V=3
    assert got["b"] == (0, 4)
    assert got["a"] == (1, 3)
    assert got["."] == (2, 2)
    assert "c" not in got


def test_pack_sequences_splits_on_boundary(spark):
    from graphkb_spark.operators.corpus import pack_sequences

    docs = spark.createDataFrame(
        [(1, 300), (2, 300), (3, 0), (4, 600)], ["doc_id", "n_tokens"]
    )
    out = pack_sequences(docs, "doc_id", "n_tokens", capacity=512, shards=1)
    rows = sorted(
        ((r.doc_id, r.seq, r.doc_offset, r.seq_offset, r.span_len) for r in out.collect())
    )
    # shard order is doc_id asc: doc1 [0,300), doc2 [300,600) splits at
    # 512, doc4 [600,1200) splits at 1024; doc3 (0 tokens) dropped
    assert rows == [
        (1, 0, 0, 0, 300),
        (2, 0, 0, 300, 212),
        (2, 1, 212, 0, 88),
        (4, 1, 0, 88, 424),
        (4, 2, 424, 0, 176),
    ]
    # spans tile each document exactly
    spans = out.groupBy("doc_id").agg(F.sum("span_len").alias("s")).collect()
    assert {r.doc_id: r.s for r in spans} == {1: 300, 2: 300, 4: 600}


def test_redact_pii(spark):
    from graphkb_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@x-corp.io or root@10.0.0.1, server 10.0.0.2, call 604-555-0199"),
            (2, "clean text with numbers 42 and 3.14"),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in redact_pii(df, "text").collect()}
    r1 = got[1]
    # root@10.0.0.1 is NOT an email (numeric TLD) — its IP part redacts
    assert r1.n_email == 1 and r1.n_ip == 2 and r1.n_phone == 1
    assert r1.text_redacted == "mail <EMAIL> or root@<IP>, server <IP>, call <PHONE>"
    r2 = got[2]
    assert (r2.n_email, r2.n_ip, r2.n_phone) == (0, 0, 0)
    assert r2.text_redacted == r2.text
