"""As-of join and range-join operator semantics."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from graphkb_spark.operators.asof import asof_join
from graphkb_spark.operators.rangejoin import overlap_length, range_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            ("A", _ts("2024-01-01T00:00:00"), 1, 10.0),
            ("A", _ts("2024-01-01T00:05:00"), 2, 11.0),
            ("A", _ts("2024-01-01T00:05:00"), 3, 12.0),  # same-instant dup
            ("B", _ts("2024-01-01T00:01:00"), 4, 99.0),
        ],
        "key string, ts timestamp, qid long, price double",
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            ("A", _ts("2024-01-01T00:04:00"), 100),
            ("A", _ts("2024-01-01T00:05:00"), 101),  # tie with quote ts
            ("A", _ts("2024-01-01T00:06:00"), 102),
            ("B", _ts("2024-01-01T00:00:30"), 103),  # before any B quote
            ("C", _ts("2024-01-01T00:00:00"), 104),  # key with no quotes
        ],
        "key string, ts timestamp, tid long",
    )


def test_asof_backward(spark, quotes, trades):
    out = asof_join(
        trades, quotes, on=["key"], left_time="ts", right_time="ts",
        payload=["qid", "price"], tie_break="qid",
    )
    rows = {r["tid"]: r for r in out.collect()}
    assert rows[100]["asof_qid"] == 1  # latest quote at/before 00:04
    # tie at the same instant is eligible; same-instant dup resolved by
    # greatest tie_break (qid 3 beats qid 2)
    assert rows[101]["asof_qid"] == 3
    assert rows[102]["asof_qid"] == 3
    assert rows[103]["asof_qid"] is None  # B quote is later than the trade
    assert rows[104]["asof_qid"] is None  # no quotes for key C
    assert out.count() == 5  # left join: every trade kept


def test_asof_forward(spark, quotes, trades):
    out = asof_join(
        trades, quotes, on=["key"], left_time="ts", right_time="ts",
        payload=["qid"], tie_break="qid", direction="forward",
    )
    rows = {r["tid"]: r for r in out.collect()}
    assert rows[100]["asof_qid"] == 3  # earliest quote at/after 00:04
    assert rows[101]["asof_qid"] == 3  # same instant eligible
    assert rows[102]["asof_qid"] is None  # nothing after 00:06
    assert rows[103]["asof_qid"] == 4


def test_asof_tolerance(spark, quotes, trades):
    out = asof_join(
        trades, quotes, on=["key"], left_time="ts", right_time="ts",
        payload=["qid"], tie_break="qid", tolerance_seconds=30.0,
    )
    rows = {r["tid"]: r for r in out.collect()}
    assert rows[101]["asof_qid"] == 3  # same-instant match: gap 0
    assert rows[100]["asof_qid"] is None  # matched quote is 240s back
    assert rows[102]["asof_qid"] is None  # matched quote is 60s back


def test_range_join_dedup_and_bounds(spark):
    left = spark.createDataFrame(
        [("a", 0.0, 2500.0), ("b", 900.0, 1100.0), ("c", -1500.0, -200.0)],
        "lid string, start double, end double",
    )
    right = spark.createDataFrame(
        [("x", 1000.0, 1001.0), ("y", 2500.0, 3000.0), ("z", -300.0, -250.0),
         ("w", 5000.0, 6000.0)],
        "rid string, start double, end double",
    )
    out = range_join(left, right, ("start", "end"), ("start", "end"), bin_size=1000.0)
    pairs = sorted((r["l_lid"], r["r_rid"]) for r in out.collect())
    # a spans bins 0..2 and overlaps x (shared bins 1) and y (closed-bound
    # touch at 2500); each pair must appear exactly once despite multi-bin
    # overlap; c overlaps z in negative coordinates; w matches nothing
    assert pairs == [("a", "x"), ("a", "y"), ("b", "x"), ("c", "z")]


def test_range_join_with_key(spark):
    left = spark.createDataFrame(
        [(1, "a", 0.0, 10.0), (2, "b", 0.0, 10.0)],
        "k int, lid string, start double, end double",
    )
    right = spark.createDataFrame(
        [(1, "x", 5.0, 15.0)], "k int, rid string, start double, end double"
    )
    out = range_join(left, right, ("start", "end"), ("start", "end"),
                     on=["k"], bin_size=4.0)
    rows = out.collect()
    assert [(r["k"], r["l_lid"], r["r_rid"]) for r in rows] == [(1, "a", "x")]


def test_overlap_length(spark):
    df = spark.range(1).select(
        overlap_length(F.lit(0.0), F.lit(10.0), F.lit(5.0), F.lit(20.0)).alias("o1"),
        overlap_length(F.lit(0.0), F.lit(1.0), F.lit(5.0), F.lit(6.0)).alias("o2"),
    )
    r = df.collect()[0]
    assert r["o1"] == 5.0 and r["o2"] == 0.0


def test_auto_bin_size_measures_median_and_preserves_results(spark):
    from graphkb_spark.operators.rangejoin import (
        auto_bin_size,
        range_join,
        range_join_auto,
    )

    left = spark.createDataFrame(
        [(i, i * 10, i * 10 + 4) for i in range(50)], "id long, s long, e long"
    )
    right = spark.createDataFrame(
        [(j, j * 25, j * 25 + 9) for j in range(20)], "id long, s long, e long"
    )
    assert abs(auto_bin_size(left, "s", "e") - 4.0) < 1e-9  # all lengths 4
    auto = sorted(
        (r.l_id, r.r_id)
        for r in range_join_auto(left, right, ("s", "e"), ("s", "e")).collect()
    )
    for bs in (3.0, 50.0, 1000.0):
        fixed = sorted(
            (r.l_id, r.r_id)
            for r in range_join(
                left, right, ("s", "e"), ("s", "e"), bin_size=bs
            ).collect()
        )
        assert fixed == auto  # bin width never changes the result set


def test_kfold_assign_partitions_and_determinism(spark):
    from pyspark.sql import functions as F

    from graphkb_spark.operators.sampling import kfold_assign

    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    out = kfold_assign(df, "doc_id", k=5)
    counts = {r.fold: r.n for r in
              out.groupBy("fold").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {0, 1, 2, 3, 4}
    assert sum(counts.values()) == 1000
    assert all(100 < n < 300 for n in counts.values())  # roughly balanced
    again = kfold_assign(df, "doc_id", k=5).withColumnRenamed("fold", "f2")
    assert out.join(again, "doc_id").filter(F.col("fold") != F.col("f2")).count() == 0


def test_interpolate_at_exact_lerp_and_range(spark):
    import datetime as dt

    from graphkb_spark.operators.asof import interpolate_at

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    data = spark.createDataFrame(
        [(1, t0, 10.0), (1, t0 + 10 * m, 20.0)], "k long, ts timestamp, v double"
    )
    probes = spark.createDataFrame(
        [(1, t0), (1, t0 + 4 * m), (1, t0 + 20 * m), (1, t0 - m)],
        "k long, ts timestamp",
    )
    out = {r.ts: (r.value_interp, r.method) for r in
           interpolate_at(data, probes, "k", "ts", "v").collect()}
    assert out[t0] == (10.0, "exact")
    assert out[t0 + 4 * m] == (14.0, "lerp")        # 10 + 0.4 * 10
    assert out[t0 + 20 * m] == (None, None)         # past the last obs
    assert out[t0 - m] == (None, None)              # before the first obs
