"""Source readers + streaming/incremental operators + multimodal
plumbing (SURVEY §2.1, §2.10)."""

import textwrap

from pyspark.sql import functions as F


def test_read_delim_with_comments_and_header_map(spark, tmp_path):
    p = tmp_path / "x.tsv"
    p.write_text("## comment line\nGene Name\tSample ID\nKRAS_ENST1\tS1\nTP53_ENST2\tS2\n")
    from graphkb_spark.sources.readers import read_delim

    df = read_delim(
        spark, str(p), header_map={"Gene Name": "gene", "Sample ID": "sampleId"}
    )
    rows = df.collect()
    assert df.columns == ["gene", "sampleId"]
    assert rows[0].gene == "KRAS_ENST1"


def test_read_text_and_json(spark, tmp_path):
    from graphkb_spark.sources.readers import read_json_file, read_text_lines

    t = tmp_path / "v.txt"
    t.write_text("KRAS:p.G12D\n(EWSR1,FLI1):fusion(e.7,e.6)\n")
    assert read_text_lines(spark, str(t), "notation").count() == 2

    j = tmp_path / "o.json"
    j.write_text('{"records": {"r1": {"name": "resistance"}}}')
    df = read_json_file(spark, str(j))
    assert df.select("records.r1.name").first()[0] == "resistance"


def test_read_xml_elements(spark, tmp_path):
    from graphkb_spark.sources.readers import read_xml_elements

    p = tmp_path / "d.xml"
    p.write_text(
        textwrap.dedent(
            """\
            <drugbank>
              <drug updated="2024-01-01"><name>Erlotinib</name><unii>ABC</unii></drug>
              <drug updated="2024-02-01"><name>Imatinib</name><unii>DEF</unii></drug>
            </drugbank>"""
        )
    )
    df = read_xml_elements(spark, str(p), "drug")
    names = sorted(r["name"] for r in df.collect())
    assert names == ["Erlotinib", "Imatinib"]


def test_read_owl_records(spark, tmp_path):
    from graphkb_spark.sources.readers import read_owl_records

    p = tmp_path / "o.owl"
    p.write_text(
        textwrap.dedent(
            """\
            <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                     xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
                     xmlns:owl="http://www.w3.org/2002/07/owl#">
              <owl:Class rdf:about="http://x/VariO_0001">
                <rdfs:label>variation</rdfs:label>
                <rdfs:subClassOf rdf:resource="http://x/VariO_0000"/>
              </owl:Class>
            </rdf:RDF>"""
        )
    )
    df = read_owl_records(spark, str(p))
    row = df.collect()[0]
    assert row.subject.endswith("VariO_0001")
    assert row.label == ["variation"]
    assert row.subClassOf == ["http://x/VariO_0000"]


def test_read_ntriples(spark, tmp_path):
    from graphkb_spark.sources.readers import read_ntriples

    p = tmp_path / "t.nt"
    p.write_text(
        '<http://x/a> <http://x/label> "thing A" .\n'
        "<http://x/a> <http://x/subClassOf> <http://x/b> .\n"
    )
    rows = read_ntriples(spark, str(p)).collect()
    assert {(r.subject, r.predicate, r.object) for r in rows} == {
        ("http://x/a", "http://x/label", "thing A"),
        ("http://x/a", "http://x/subClassOf", "http://x/b"),
    }


def test_incremental_merge_watermark(spark):
    from graphkb_spark.streaming.incremental import incremental_merge

    target = spark.createDataFrame([("u1", 10, "old"), ("u2", 10, "old")], ["k", "v", "s"])
    source = spark.createDataFrame(
        [("u1", 5, "stale"), ("u1", 20, "fresh"), ("u3", 30, "new")], ["k", "v", "s"]
    )
    out = incremental_merge(target, source, ["k"], "v", 10)
    got = {r.k: (r.v, r.s, r._action) for r in out.collect()}
    assert got["u1"] == (20, "fresh", "update")
    assert got["u2"] == (10, "old", "keep")
    assert got["u3"] == (30, "new", "create")


def test_streaming_windowed_counts(spark, tmp_path):
    from graphkb_spark.session import load_table
    from graphkb_spark.streaming.incremental import streaming_windowed_counts

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    out = streaming_windowed_counts(
        spark, events, stage_dir=str(tmp_path / "stage"), query_name="t_counts"
    )
    batch = (
        events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .count()
    )
    assert out.count() == batch


def test_multimodal_features(spark):
    from graphkb_spark.multimodal.binary import MEDIA_SCHEMA, extract_features

    media = spark.createDataFrame(
        [
            (1, "image", "image/png", b"\x89PNG...", {}),
            (2, "video", "video/mp4", b"mp4", {}),
        ],
        MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in extract_features(media).collect()}
    assert rows[1].width is not None and rows[1].decode_error is None
    assert rows[2].decode_error is not None  # stubbed decoder quarantines


def test_load_table_normalizes_ntz_timestamps(spark):
    """The events parquet carries tz-less timestamp[us], which Spark 4
    reads as TIMESTAMP_NTZ — a type that rejects cast-to-long epoch
    math and withWatermark. load_table must hand out session-local
    timestamps, and the raw-NTZ path must still sessionize (the
    epoch cast stages through timestamp_ltz)."""
    from pyspark.sql import types as T

    from graphkb_spark.session import load_table, normalize_ntz
    from graphkb_spark.streaming.incremental import sessionize

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    assert not any(
        isinstance(f.dataType, T.TimestampNTZType) for f in events.schema.fields
    )
    # a raw (un-normalized) NTZ frame must also work end-to-end
    raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    if any(isinstance(f.dataType, T.TimestampNTZType) for f in raw.schema.fields):
        assert sessionize(raw, gap_minutes=30).count() == raw.count()
        assert normalize_ntz(raw).schema["ts"].dataType == T.TimestampType()


def test_resize_images_contract(spark):
    """resize_images: images re-encoded at the target dims with
    digest-derived size; non-image rows byte-identical pass-through."""
    from graphkb_spark.multimodal.binary import MEDIA_SCHEMA, resize_images

    media = spark.createDataFrame(
        [
            (1, "image", "image/png", b"\x89PNG-payload", {}),
            (2, "audio", "audio/wav", b"RIFF-payload", {}),
            (3, "image", None, None, {}),
        ],
        MEDIA_SCHEMA,
    )
    out = {r.media_id: r for r in resize_images(media, 224, 224).collect()}
    assert out[1].width == 224 and out[1].height == 224
    assert len(out[1].payload) == max(1, (224 * 224) // 256)
    assert out[1].resize_error is None
    # deterministic: same payload -> same resized bytes
    again = {r.media_id: r for r in resize_images(media, 224, 224).collect()}
    assert out[1].payload == again[1].payload
    # non-image passes through untouched, dims stay null
    assert out[2].payload == b"RIFF-payload"
    assert out[2].width is None and out[2].height is None
    # null payload resizes from b"" without error
    assert out[3].payload is not None and len(out[3].payload) == 196


def test_streaming_sessionize_closes_on_gap_and_timeout(spark, tmp_path):
    """Sessions close on in-data gap breaks AND on event-time timeout;
    sessions still open at end-of-input are not emitted."""
    from datetime import datetime

    from graphkb_spark.streaming.stateful import streaming_sessionize

    def ts(h, m):
        return datetime(2024, 1, 1, h, m)

    rows = [
        # user 1: session A (2 events), >30min gap, session B (2 events)
        (1, ts(0, 0)), (1, ts(0, 10)), (1, ts(1, 0)), (1, ts(1, 5)),
        # user 2: one late event pushes the watermark to 04:30 so user
        # 1's session B (ends 01:05) times out; user 2's own session
        # (ends 05:00) can never close and must not be emitted
        (2, ts(5, 0)),
    ]
    events = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = streaming_sessionize(
        spark, events, gap_minutes=30,
        stage_dir=str(tmp_path / "stage"), query_name="t_sessions",
    )
    got = {
        (r.user_id, r.session_start.minute + 60 * r.session_start.hour): r
        for r in out.collect()
    }
    assert set(got) == {(1, 0), (1, 60)}
    assert got[(1, 0)].n_events == 2 and got[(1, 0)].session_end == ts(0, 10)
    assert got[(1, 60)].n_events == 2 and got[(1, 60)].session_end == ts(1, 5)
