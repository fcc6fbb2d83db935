"""Degenerate-input pins for the round-7 operators: empty tables,
single-row groups, constant series, self-loops, and identical
mutation logs must produce well-defined results, never a crash (the
expectations empty-batch DIVIDE_BY_ZERO was found exactly this way)."""

import datetime as dt

from pyspark.sql import functions as F


def test_empty_and_degenerate_inputs(spark):
    from graphkb_spark.operators.aggregate import (
        page_hinkley_drift,
        rolling_distinct,
        winsorize_per_group,
    )
    from graphkb_spark.operators.corpus import (
        diversity_report,
        pmi_collocations,
        strip_boilerplate,
    )
    from graphkb_spark.operators.dedup import canonical_per_cluster, dedup_against
    from graphkb_spark.operators.graph import cooccurrence_edges, triangle_counts
    from graphkb_spark.operators.merge import scd2_build
    from graphkb_spark.operators.sketch import kmv_distinct

    empty_docs = spark.createDataFrame([], "doc_id long, source string, text string")
    assert strip_boilerplate(empty_docs, "doc_id", "text", "source").count() == 0
    assert diversity_report(empty_docs, "source", "text").count() == 0
    # a one-word doc has no bigrams
    one_word = spark.createDataFrame([("hello",)], "text string")
    assert pmi_collocations(one_word, "text").count() == 0

    # single-row group: the value IS both percentiles; nothing clips
    one = spark.createDataFrame([(1, "g", 5.0)], "id long, grp string, v double")
    r = winsorize_per_group(one, ["grp"], "v").collect()[0]
    assert r.value_w == 5.0 and not r.clipped_low and not r.clipped_high

    # constant series: sigma = 0 and the PH statistic never exceeds it
    const = spark.createDataFrame(
        [("g", t, 1.0) for t in range(10)], "g string, t long, v double"
    )
    assert page_hinkley_drift(const, ["g"], ["t"], "v").count() == 0

    assert kmv_distinct(
        spark.createDataFrame([], "v long, grp string"), ["grp"], "v"
    ).count() == 0

    docs = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    empty_ref = spark.createDataFrame([], "doc_id long, text string")
    assert dedup_against(docs, empty_ref, "text", "doc_id").count() == 0

    # no pairs: every row is its own singleton cluster
    solo = canonical_per_cluster(
        spark.createDataFrame([(1, 5)], "doc_id long, n long"),
        spark.createDataFrame([], "id_a long, id_b long"),
        "doc_id",
        [F.col("n").desc()],
    ).collect()
    assert len(solo) == 1 and solo[0].cluster_size == 1

    # self-loops are excluded; a lone edge has no triangles
    assert triangle_counts(
        spark.createDataFrame([(1, 1), (1, 2)], "src long, dst long")
    ).count() == 0
    assert cooccurrence_edges(
        spark.createDataFrame(
            [("a", "x"), ("b", "y")], "actor string, item string"
        ),
        "actor", "item", min_shared=1,
    ).count() == 0

    # identical mutations collapse to one open version
    same = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), "x")] * 3, "k long, ts timestamp, a string"
    )
    versions = scd2_build(same, ["k"], "ts", ["a"]).collect()
    assert len(versions) == 1 and versions[0].is_current

    assert rolling_distinct(
        spark.createDataFrame([], "ts timestamp, user_id long"), "ts", "user_id"
    ).count() == 0
