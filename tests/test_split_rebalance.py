"""Deterministic split assignment, priority sampling, domain
rebalancing (operators/sampling.py round-6 additions), and the native
session_window streaming sessionizer."""

from pyspark.sql import functions as F

from graphkb_spark.operators.sampling import (
    domain_rebalance,
    priority_sample,
    split_assign,
)


def test_split_assign_covers_everything_and_is_stable(spark):
    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    out = split_assign(df, "doc_id")
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 2000
    # 980/10/10 per mille with binomial wiggle
    assert counts["train"] > 1900
    assert 0 < counts.get("val", 0) < 100
    assert 0 < counts.get("test", 0) < 100
    # pure function of the id: a second run assigns identically
    again = split_assign(df, "doc_id").withColumnRenamed("split", "split2")
    joined = out.join(again, "doc_id")
    assert joined.filter(F.col("split") != F.col("split2")).count() == 0


def test_split_assign_salt_gives_independent_split(spark):
    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    a = split_assign(df, "doc_id", salt="a")
    b = split_assign(df, "doc_id", salt="b").withColumnRenamed("split", "split_b")
    moved = a.join(b, "doc_id").filter(F.col("split") != F.col("split_b")).count()
    assert moved > 0  # different salt -> different assignment


def test_split_assign_custom_widths(spark):
    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    out = split_assign(df, "doc_id", splits={"a": 1, "b": 1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) <= {"a", "b"}
    assert sum(counts.values()) == 1000


def test_priority_sample_prefers_heavy_rows(spark):
    # weights 1 vs 1000: the heavy minority should dominate the sample
    rows = [(i, 1000 if i < 100 else 1) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    out = priority_sample(df, "doc_id", "w", n=100)
    assert out.count() == 100
    heavy = out.filter(F.col("w") == 1000).count()
    assert heavy > 80
    # deterministic: same call -> same set
    ids1 = {r.doc_id for r in out.collect()}
    ids2 = {r.doc_id for r in priority_sample(df, "doc_id", "w", n=100).collect()}
    assert ids1 == ids2


def test_priority_sample_without_replacement(spark):
    df = spark.createDataFrame([(i, 5) for i in range(50)], "doc_id long, w long")
    out = priority_sample(df, "doc_id", "w", n=200)
    ids = [r.doc_id for r in out.collect()]
    assert len(ids) == 50  # n > population: everything, once
    assert len(set(ids)) == 50


def test_domain_rebalance_caps_hot_domains_only(spark):
    rows = [(i, "hot" if i < 9000 else "cold") for i in range(10000)]
    df = spark.createDataFrame(rows, "event_id long, domain string")
    kept = domain_rebalance(df, "event_id", "domain", cap=500)
    counts = {r["domain"]: r["n"] for r in
              kept.groupBy("domain").agg(F.count(F.lit(1)).alias("n")).collect()}
    # cold domain (1000 rows > cap... actually 1000 > 500: both thinned)
    # hot thinned to ~cap with binomial wiggle; subset property holds
    assert 350 < counts["hot"] < 650
    assert 350 < counts["cold"] < 650
    # under-cap domains keep everything
    df2 = df.filter(F.col("event_id") < 9300)  # cold has 300 <= cap
    kept2 = domain_rebalance(df2, "event_id", "domain", cap=500)
    counts2 = {r["domain"]: r["n"] for r in
               kept2.groupBy("domain").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts2["cold"] == 300
    # determinism: kept set is a pure function of ids
    ids1 = sorted(r.event_id for r in kept.collect())
    ids2 = sorted(r.event_id for r in
                  domain_rebalance(df, "event_id", "domain", cap=500).collect())
    assert ids1 == ids2


def test_streaming_sessionize_native_matches_batch_semantics(spark, tmp_path):
    """Native session_window output == batch gap-split (break at
    gap > 30 min; the exact-gap boundary MERGES) restricted to
    watermark-emittable sessions."""
    import datetime as dt

    from graphkb_spark.streaming.stateful import streaming_sessionize_native

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    mins = lambda m: base + dt.timedelta(minutes=m)  # noqa: E731
    rows = [
        # user 1: two sessions split by a 40-min gap; both emit
        (1, mins(0)), (1, mins(10)), (1, mins(50)),
        # user 2: events exactly 30 min apart -> ONE session (closed
        # window boundary: [t, t+30] touches [t+30, t+60])
        (2, mins(0)), (2, mins(30)),
        # user 2: 31 min later -> splits
        (2, mins(61)),
        # user 3: late activity -> open session, never emitted
        (3, mins(200)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = streaming_sessionize_native(
        spark, ev, gap_minutes=30,
        stage_dir=str(tmp_path / "native_stage"),
        query_name="t_native_sessions", state_partitions=2,
    )
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in out.collect()
    }
    # max(ts) = 200 min; emit iff end + 60 <= 200
    expected = {
        (1, mins(0), mins(10), 2),    # ends 10, emitted
        (1, mins(50), mins(50), 1),   # ends 50, emitted
        (2, mins(0), mins(30), 2),    # exact-gap pair merged
        (2, mins(61), mins(61), 1),   # 31-min gap split; emitted
        # user 3 session (200) stays open
    }
    assert got == expected


def test_pagerank_matches_pure_python_fixed_point(spark):
    from graphkb_spark.operators.graph import pagerank

    # small digraph incl. a dangling node (4) and a hub (1)
    edges = [(2, 1), (3, 1), (4, 1), (1, 2), (3, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df, n_iter=3).collect()}

    scale, d = 10**12, 85
    nodes = {n for e in edges for n in e}
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    rank = {n: scale for n in nodes}
    for _ in range(3):
        sm = {n: 0 for n in nodes}
        for s, t in edges:
            sm[t] += rank[s] // deg[s]
        rank = {n: (100 - d) * scale // 100 + (d * sm[n]) // 100 for n in nodes}
    expected = {n: round(rank[n] / scale, 6) for n in nodes}
    assert got == expected
    # the hub receives mass from 3 nodes; the dangling node only the base
    assert got[1] > got[4]
    assert abs(got[4] - 0.15) < 1e-9


def test_bpe_encode_matches_pure_python(spark):
    from graphkb_spark.operators.corpus import bpe_encode

    merges = [("a", "b"), ("ab", "c"), ("d", "d")]
    docs = [
        (1, "abc abcd ab"),
        (2, "dddd xyz"),
        (3, "AB Cabc"),  # lowercased before encoding
        (4, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.n_tokens for r in bpe_encode(df, "doc_id", "text", merges).collect()}

    def encode_word(word, merges):
        syms = list(word)
        for left, right in merges:
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    import re
    for doc_id, text in docs:
        words = [w for w in re.split(r"\s+", text.lower()) if w]
        n = sum(len(encode_word(w, merges)) for w in words)
        assert got[doc_id] == n, (doc_id, got[doc_id], n)
    # spot-check the values the reference derivation predicts:
    # "abc"->[abc], "abcd"->[abc,d], "ab"->[ab] = 4; "dddd"->[dd,dd]+xyz(3)=5
    assert got[1] == 4
    assert got[2] == 5


def test_temperature_sample_flattens_the_mix(spark):
    from graphkb_spark.operators.sampling import temperature_sample

    rows = [(i, "big" if i < 9000 else "small") for i in range(10000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = temperature_sample(df, "doc_id", "lang", alpha_pct=50)
    counts = {r["lang"]: r["n"] for r in
              kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    # rate ∝ 1/sqrt(n): the SMALL stratum has the max rate (1.0) and
    # keeps everything; big keeps sqrt(1000/9000) = 1/3 of its rows
    assert counts["small"] == 1000
    assert 2600 < counts["big"] < 3400
    share_small = counts["small"] / (counts["big"] + counts["small"])
    assert share_small > 0.2  # natural share was 0.10 -> strictly flatter
    # determinism
    c2 = {r["lang"]: r["n"] for r in
          temperature_sample(df, "doc_id", "lang", alpha_pct=50)
          .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert c2 == counts


def test_temperature_sample_alpha100_keeps_everything(spark):
    from graphkb_spark.operators.sampling import temperature_sample

    rows = [(i, "a" if i % 3 else "b") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = temperature_sample(df, "doc_id", "lang", alpha_pct=100)
    # alpha=1: rate = n/n / max(n/n) = 1 for every stratum
    assert kept.count() == 300


def test_temperature_sample_target_total(spark):
    from graphkb_spark.operators.sampling import temperature_sample

    rows = [(i, "a" if i < 800 else "b") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = temperature_sample(df, "doc_id", "lang", alpha_pct=0, target_total=200)
    n = kept.count()
    # expected kept total 200 with binomial wiggle; alpha=0 splits the
    # budget evenly (100 each)
    assert 130 < n < 270


def test_merge_intervals_islands(spark):
    from graphkb_spark.operators.aggregate import merge_intervals

    rows = [
        # key a: [0,10] [5,12] [12,20] chain into one island; [25,30] apart
        ("a", 0, 10), ("a", 5, 12), ("a", 12, 20), ("a", 25, 30),
        # key b: nested interval swallowed by a wide one
        ("b", 0, 100), ("b", 10, 20), ("b", 150, 160),
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    out = {
        (r.k, r.island_start, r.island_end, r.n_intervals)
        for r in merge_intervals(df, ["k"], "s", "e").collect()
    }
    assert out == {
        ("a", 0, 20, 3),
        ("a", 25, 30, 1),
        ("b", 0, 100, 2),
        ("b", 150, 160, 1),
    }


def test_grouped_outliers_flags_only_extremes(spark):
    from graphkb_spark.operators.aggregate import grouped_outliers

    vals = [("g", float(v)) for v in [10] * 50 + [12] * 50] + [("g", 1000.0)]
    df = spark.createDataFrame(vals, "grp string, v double")
    out = grouped_outliers(df, ["grp"], "v", z=3.0).collect()
    assert len(out) == 1
    assert out[0].v == 1000.0 and out[0].z_score > 3
    # zero-variance group: no outliers, no divide-by-zero error
    const = spark.createDataFrame([("c", 5.0)] * 10, "grp string, v double")
    assert grouped_outliers(const, ["grp"], "v").count() == 0


def test_deterministic_sampling_invariant_under_repartition(spark):
    """The determinism CLAIM is partitioning-independence: the kept set
    must be identical whatever physical layout the data arrives in —
    retries, different cluster sizes, different file splits."""
    from graphkb_spark.operators.sampling import (
        domain_rebalance,
        priority_sample,
        split_assign,
        temperature_sample,
    )

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(3000)]
    df1 = spark.createDataFrame(rows, "doc_id long, lang string")
    df2 = df1.repartition(7, "lang")
    df3 = df1.repartition(13)

    def ids(df):
        return sorted(r.doc_id for r in df.collect())

    for variant in (df2, df3):
        assert ids(split_assign(df1, "doc_id").filter(F.col("split") == "val")) == \
               ids(split_assign(variant, "doc_id").filter(F.col("split") == "val"))
        assert ids(priority_sample(df1.withColumn("w", F.col("doc_id") % 7 + 1),
                                   "doc_id", "w", n=50)) == \
               ids(priority_sample(variant.withColumn("w", F.col("doc_id") % 7 + 1),
                                   "doc_id", "w", n=50))
        assert ids(domain_rebalance(df1, "doc_id", "lang", cap=300)) == \
               ids(domain_rebalance(variant, "doc_id", "lang", cap=300))
        assert ids(temperature_sample(df1, "doc_id", "lang", alpha_pct=50)) == \
               ids(temperature_sample(variant, "doc_id", "lang", alpha_pct=50))


def test_last_touch_attribution_window_and_ties(spark):
    import datetime as dt

    from graphkb_spark.operators.aggregate import last_touch_attribution

    base = dt.datetime(2024, 1, 1)
    h = lambda x: base + dt.timedelta(hours=x)  # noqa: E731
    rows = [
        # u1: click at 0h, purchase at 10h -> attributed to click
        (1, h(0), "click"), (1, h(10), "purchase"),
        # u1: second purchase at 100h -> click is 100h old > 72h -> NULL
        (1, h(100), "purchase"),
        # u2: view at 5h then click at 6h, purchase 7h -> click (latest)
        (2, h(5), "view"), (2, h(6), "click"), (2, h(7), "purchase"),
        # u3: touch at the SAME ts as the purchase -> counts (<= boundary)
        (3, h(1), "view"), (3, h(1), "purchase"),
        # u4: purchase with no touches at all -> NULL
        (4, h(2), "purchase"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {(r.user_id, r.conversion_ts, r.attributed_touch)
           for r in last_touch_attribution(
               ev, "user_id", "ts", "event_type",
               ["purchase"], ["click", "view"], window_hours=72).collect()}
    assert out == {
        (1, h(10), "click"),
        (1, h(100), None),
        (2, h(7), "click"),
        (3, h(1), "view"),
        (4, h(2), None),
    }


def test_transition_matrix_probabilities(spark):
    import datetime as dt

    from graphkb_spark.operators.aggregate import transition_matrix

    base = dt.datetime(2024, 1, 1)
    m = lambda x: base + dt.timedelta(minutes=x)  # noqa: E731
    rows = [
        (1, 1, m(0), "a"), (1, 2, m(1), "b"), (1, 3, m(2), "a"),
        (2, 4, m(0), "a"), (2, 5, m(1), "b"), (2, 6, m(2), "b"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    out = {(r.from_type, r.to_type): (r.n, r.p)
           for r in transition_matrix(
               ev, "user_id", "ts", "event_type", order_tiebreak="event_id"
           ).collect()}
    # transitions: u1 a->b, b->a; u2 a->b, b->b
    assert out == {
        ("a", "b"): (2, 1.0),
        ("b", "a"): (1, 0.5),
        ("b", "b"): (1, 0.5),
    }


# ---------------------------------------------------------------------------
# adversarial skew fixtures (verdict r6 item 9): 1% of keys own 50% of
# the rows — the shape that melts a naive plan at 100 TB
# ---------------------------------------------------------------------------


def _skewed_events(spark, n=20_000, n_users=1_000, hot_frac=0.01):
    """hot_frac of users own half the events (10 hot users here); the
    rest spread uniformly. Timestamps interleave so windows see real
    ordering work."""
    n_hot = max(1, int(n_users * hot_frac))
    rows = []
    for i in range(n):
        if i % 2 == 0:  # 50% of events on the hot users
            u = i % n_hot
        else:
            u = n_hot + (i % (n_users - n_hot))
        rows.append((i, u, i % 7919))
    return spark.createDataFrame(rows, "event_id long, user_id long, t long")


def test_domain_rebalance_skew_stays_broadcast_not_domain_partitioned(spark):
    """Scale contract on a hot-domain corpus: the per-domain count
    table joins back WITHOUT hash-partitioning the fact table by the
    skewed domain key (AQE picks a broadcast build for the
    domain-cardinality-sized side), so a domain with 10^9 pages never
    concentrates into one shuffle partition."""
    df = _skewed_events(spark).withColumn(
        "domain", F.concat(F.lit("d"), F.col("user_id"))
    )
    kept = domain_rebalance(df, "event_id", "domain", cap=50)
    kept.collect()  # collect() runs THIS QueryExecution -> AQE finalizes
    plan = kept._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    # AQE must rescue the statically-planned sort-merge join into a
    # broadcast build (the statically-inserted exchange remains in the
    # tree but is read locally — no cross-node redistribution by the
    # skewed key survives at runtime)
    assert "BroadcastHashJoin" in final
    assert "SortMergeJoin" not in final


def test_attribution_skew_straggler_bounded_by_largest_single_user(spark):
    """The attribution window partitions by user: hash partitioning
    spreads DISTINCT hot users across tasks, so the straggler
    partition is bounded by (largest single user) + its fair share —
    hot users do not pile onto one task. (A single user owning half
    the corpus is irreducible for any per-user-ordered semantics; the
    guarantee is that the sum of hot users isn't serialized.)"""
    from graphkb_spark.operators.aggregate import last_touch_attribution

    df = (
        _skewed_events(spark)
        .withColumn(
            "ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("t"))
        )
        .withColumn(
            "event_type",
            F.when(F.col("event_id") % 5 == 0, F.lit("purchase")).otherwise(
                F.lit("click")
            ),
        )
    )
    out = last_touch_attribution(
        df, "user_id", "ts", "event_type",
        conversion_types=["purchase"], touch_types=["click"],
    )
    assert out.count() == 4000  # every 5th event converts
    # measure the actual shuffle distribution the window consumes
    n_part = 32
    sizes = [
        r["n"]
        for r in df.repartition(n_part, "user_id")
        .groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    hot_user_max = 1000  # 10 hot users x 100 events each
    fair = sum(sizes) / n_part
    assert max(sizes) <= hot_user_max + 4 * fair, sizes


def test_temperature_sample_skew_keeps_filter_scan_speed(spark):
    """temperature_sample on the hot-domain mix: the rate join is
    broadcast-able (AQE), the filter is per-row, and the hot stratum
    is thinned toward the small ones — no window ever materializes a
    stratum."""
    from graphkb_spark.operators.sampling import temperature_sample

    df = _skewed_events(spark).withColumn(
        "stratum", F.concat(F.lit("s"), F.col("user_id") % 20)
    )
    out = temperature_sample(df, "event_id", "stratum", alpha_pct=0)
    out.collect()  # finalize THIS QueryExecution's adaptive plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in final  # AQE broadcast the rate table
    # alpha=0 equalizes strata toward the smallest: the hot stratum
    # (s0..s9 hold the hot users) must shrink relative to its raw share
    raw = {r["stratum"]: r["n"] for r in df.groupBy("stratum").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    kept = {r["stratum"]: r["n"] for r in out.groupBy("stratum").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    hot = max(raw, key=raw.get)
    cold = min(raw, key=raw.get)
    assert kept[hot] / raw[hot] < 0.6 * (kept.get(cold, 0) / raw[cold] + 1e-9) or \
        kept[hot] / raw[hot] < 0.6


def test_linear_attribution_splits_credit(spark):
    import datetime as dt

    from graphkb_spark.operators.aggregate import linear_attribution

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        (1, t0, "click"),
        (1, t0 + m, "view"),
        (1, t0 + 2 * m, "view"),
        (1, t0 + 3 * m, "purchase"),   # 3 touches: click 1/3, view 2/3
        (1, t0 + 4 * m, "click"),
        (1, t0 + 5 * m, "purchase"),   # 1 touch after the reset
        (2, t0, "purchase"),           # no touches: absent from output
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = linear_attribution(
        df, "user_id", "ts", "event_type",
        conversion_types=["purchase"], touch_types=["click", "view"],
    ).collect()
    c1 = {(r.conversion_ts, r.touch_type): r for r in out if r.user_id == 1}
    k1 = (t0 + 3 * m, "click")
    assert c1[k1].n_touches == 1 and abs(c1[k1].credit - round(1 / 3, 6)) < 1e-9
    k2 = (t0 + 3 * m, "view")
    assert c1[k2].n_touches == 2 and abs(c1[k2].credit - round(2 / 3, 6)) < 1e-9
    k3 = (t0 + 5 * m, "click")
    assert c1[k3].credit == 1.0  # the window reset after the 1st purchase
    assert not [r for r in out if r.user_id == 2]


def test_page_hinkley_flags_shifted_tail_only(spark):
    from graphkb_spark.operators.aggregate import page_hinkley_drift

    # stable series then a +10 mean shift at t=60 in group 'b'
    rows = [("a", t, 50.0 + (t % 3)) for t in range(100)] + [
        ("b", t, 50.0 + (t % 3) + (10.0 if t >= 60 else 0.0)) for t in range(100)
    ]
    df = spark.createDataFrame(rows, "grp string, t long, v double")
    out = page_hinkley_drift(
        df, ["grp"], [F.col("t").asc()], "v", lambda_sigma=4.0
    ).collect()
    assert out, "shift not detected"
    assert all(r.grp == "b" for r in out)  # the stable group stays quiet
    # retrospective PH vs the GLOBAL mean: the pre-shift segment sits
    # below mu and fires the ph_up (downward) side; the shifted tail
    # fires ph_down (upward). Both segments flag, each on its own side
    up_side = {r.t for r in out if r.ph_down > r.ph_up}
    assert up_side and all(t >= 60 for t in up_side)
    down_side = {r.t for r in out if r.ph_up > r.ph_down}
    assert down_side and min(down_side) < 60  # pre-shift divergence too


def test_rolling_distinct_window_semantics(spark):
    import datetime as dt

    from graphkb_spark.operators.aggregate import rolling_distinct

    d = dt.datetime(2024, 1, 1)
    rows = [
        (1, d),                              # active day 1
        (1, d),                              # duplicate same day
        (2, d + dt.timedelta(days=2)),       # active day 3
        (1, d + dt.timedelta(days=10)),      # far later
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {str(r.day): r.n_distinct for r in
           rolling_distinct(df, "ts", "user_id", window_days=3).collect()}
    assert out["2024-01-01"] == 1          # just user 1
    assert out["2024-01-03"] == 2          # user 1 (d+2 window) + user 2
    assert out["2024-01-04"] == 1          # user 1 aged out, user 2 remains
    assert out["2024-01-11"] == 1
    assert "2024-01-07" not in out         # gap day: nobody in range


def test_cooccurrence_cap_and_threshold(spark):
    from graphkb_spark.operators.graph import cooccurrence_edges

    rows = [
        ("o1", "x"), ("o1", "y"), ("o1", "y"),   # dup interaction collapses
        ("o2", "x"), ("o2", "y"),
        ("o3", "x"), ("o3", "z"),
    ]
    df = spark.createDataFrame(rows, "actor string, item string")
    out = {(r.item_a, r.item_b): r.n_shared for r in
           cooccurrence_edges(df, "actor", "item", min_shared=2).collect()}
    assert out == {("x", "y"): 2}          # x-z seen once -> filtered
    # cap=1 keeps one item per actor: no pairs survive
    assert not cooccurrence_edges(df, "actor", "item",
                                  min_shared=1, actor_cap=1).collect()


def test_top_paths_orders_and_truncates(spark):
    import datetime as dt

    from graphkb_spark.operators.aggregate import top_paths

    t0 = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    rows = []
    # 3 sessions "a>b", 1 session "b>a", one 10-step session
    for sess in range(3):
        rows += [(sess, 1, t0, "a"), (sess, 1, t0 + s, "b")]
    rows += [(3, 1, t0, "b"), (3, 1, t0 + s, "a")]
    rows += [(4, 1, t0 + i * s, "x") for i in range(10)]
    df = spark.createDataFrame(rows, "sid long, dummy long, ts timestamp, et string")
    out = top_paths(df, ["sid"], "ts", "et", max_len=8, top_k=10)
    got = [(r.path, r.n, r.n_steps) for r in out.collect()]
    assert got[0] == ("a>b", 3, 2)
    assert (">".join(["x"] * 8), 1, 8) in got  # truncated at 8 steps
    assert ("b>a", 1, 2) in got


def test_priority_sample_grouped_quota_and_determinism(spark):
    from graphkb_spark.operators.sampling import priority_sample_grouped

    rows = [(i, "g%d" % (i % 3), 1 + i % 7) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, grp string, w long")
    out = priority_sample_grouped(df, ["grp"], "id", "w", n_per_group=5)
    counts = {r.grp: r.n for r in
              out.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"g0": 5, "g1": 5, "g2": 5}
    ids1 = sorted(r.id for r in out.collect())
    ids2 = sorted(r.id for r in
                  priority_sample_grouped(df, ["grp"], "id", "w", 5).collect())
    assert ids1 == ids2


def test_unimax_budget_waterfilling_hand_example(spark):
    """Hand-computed closed form: avail [10, 20, 70] chars, E=2,
    B=100 -> the two small strata cap at 2 epochs (20, 40), the big
    one takes the uniform remainder 40; budget exactly exhausted."""
    from graphkb_spark.operators.sampling import unimax_budget

    rows = (
        [("a", i, 1) for i in range(10)]
        + [("b", i, 2) for i in range(10)]
        + [("c", i, 7) for i in range(10)]
    )
    df = spark.createDataFrame(rows, ["lang", "i", "n_tok"])
    out = {
        r.lang: (r.avail_tokens, r.alloc_tokens, r.epochs)
        for r in unimax_budget(df, "lang", "n_tok", budget=100, max_epochs=2.0).collect()
    }
    assert out["a"] == (10, 20.0, 2.0)
    assert out["b"] == (20, 40.0, 2.0)
    # epochs quantize DOWN (floor at 6 decimals): 40/70 = 0.5714285...
    # -> 0.571428, not the half-up 0.571429 (the overshoot fix)
    assert out["c"] == (70, 40.0, 0.571428)
    assert sum(v[1] for v in out.values()) == 100.0


def test_unimax_budget_no_crossover_caps_everything(spark):
    """Budget above total capped demand: every stratum gets exactly
    avail * max_epochs and the leftover is simply unallocated."""
    from graphkb_spark.operators.sampling import unimax_budget

    df = spark.createDataFrame(
        [("x", 5), ("x", 5), ("y", 30)], ["lang", "n_tok"]
    )
    out = {
        r.lang: (r.alloc_tokens, r.epochs)
        for r in unimax_budget(df, "lang", "n_tok", budget=10_000, max_epochs=3.0).collect()
    }
    assert out["x"] == (30.0, 3.0)
    assert out["y"] == (90.0, 3.0)


def test_unimax_budget_crossover_at_rank_one(spark):
    """Budget below even the smallest stratum's capped demand: every
    stratum takes the same equal share B/n."""
    from graphkb_spark.operators.sampling import unimax_budget

    df = spark.createDataFrame(
        [("x", 100), ("y", 200), ("z", 400)], ["lang", "n_tok"]
    )
    out = {
        r.lang: r.alloc_tokens
        for r in unimax_budget(df, "lang", "n_tok", budget=90, max_epochs=2.0).collect()
    }
    assert out == {"x": 30.0, "y": 30.0, "z": 30.0}


def test_unimax_budget_rejects_bad_params(spark):
    import pytest

    from graphkb_spark.operators.sampling import unimax_budget

    df = spark.createDataFrame([("x", 1)], ["lang", "n_tok"])
    with pytest.raises(ValueError):
        unimax_budget(df, "lang", "n_tok", budget=0)
    with pytest.raises(ValueError):
        unimax_budget(df, "lang", "n_tok", budget=10, max_epochs=0)


def test_unimax_sample_repeat_counts(spark):
    """Materialized mixture for the hand example (avail [10,20,70],
    E=2, B=100): strata a/b repeat fully twice; c gets alloc 40 of 70
    = 0 full passes + a 40-token partial prefix in md5 order — so some
    c docs drop out (n_repeats=0 filtered) and kept c tokens total 40
    at most (partial-cut rule: cum <= partial)."""
    from graphkb_spark.operators.sampling import unimax_sample

    rows = (
        [("a", i, 1) for i in range(10)]
        + [("b", 100 + i, 2) for i in range(10)]
        + [("c", 200 + i, 7) for i in range(10)]
    )
    df = spark.createDataFrame(rows, ["lang", "doc_id", "n_tok"])
    out = unimax_sample(df, "lang", "n_tok", "doc_id", budget=100, max_epochs=2.0).collect()
    by = {}
    for r in out:
        by.setdefault(r.lang, []).append(r)
    assert all(r.n_repeats == 2 for r in by["a"]) and len(by["a"]) == 10
    assert all(r.n_repeats == 2 for r in by["b"]) and len(by["b"]) == 10
    # c: partial pass only — kept docs have n_repeats 1 and their
    # token sum fits the 40-token allocation
    assert all(r.n_repeats == 1 for r in by["c"])
    assert 0 < len(by["c"]) < 10
    assert sum(r.n_tokens for r in by["c"]) <= 40
    # deterministic
    rerun = unimax_sample(df, "lang", "n_tok", "doc_id", budget=100, max_epochs=2.0).collect()
    assert sorted(map(tuple, rerun)) == sorted(map(tuple, out))


def _greedy_unimax(avails, budget, max_epochs):
    """Pure-Python reference: the UniMax paper's greedy loop —
    ascending-size order, each stratum takes min(cap demand, equal
    share of the remaining budget over the remaining strata)."""
    order = sorted(avails.items(), key=lambda kv: (kv[1], kv[0]))
    rem, out = float(budget), {}
    for i, (name, c) in enumerate(order):
        share = rem / (len(order) - i)
        take = min(c * max_epochs, share)
        out[name] = take
        rem -= take
    return out


def test_unimax_budget_matches_greedy_reference_property(spark):
    """Property (hypothesis): the closed-form crossover allocation
    equals the paper's greedy loop on arbitrary stratum sizes and
    budgets — every stratum within 1e-3 (the closed form floors alloc
    at 4 decimals), epochs never exceed the cap, and total allocation
    never exceeds the budget. The pinned @example is the VERDICT r12
    counterexample: with round-half-up the uniform share 93.5/3 =
    31.1666... rounded UP to 31.1667 and the total hit 97.0001 > 97;
    flooring keeps the sum at 96.9998."""
    from hypothesis import example, given, settings
    from hypothesis import strategies as st

    from graphkb_spark.operators.sampling import unimax_budget

    @settings(max_examples=8, deadline=None)
    @example([1, 9, 9, 9], 97, 3.5)
    @given(
        st.lists(st.integers(1, 500), min_size=1, max_size=6),
        st.integers(10, 3000),
        st.sampled_from([1.0, 2.0, 3.5]),
    )
    def inner(sizes, budget, epochs):
        rows = [
            (f"s{i}", j, 1) for i, n in enumerate(sizes) for j in range(n)
        ]
        df = spark.createDataFrame(rows, ["lang", "i", "n_tok"])
        got = {
            r.lang: (r.alloc_tokens, r.epochs)
            for r in unimax_budget(
                df, "lang", "n_tok", budget=budget, max_epochs=epochs
            ).collect()
        }
        ref = _greedy_unimax(
            {f"s{i}": n for i, n in enumerate(sizes)}, budget, epochs
        )
        assert set(got) == set(ref)
        for k, (alloc, eps) in got.items():
            assert abs(alloc - ref[k]) < 1e-3, (k, alloc, ref[k])
            assert eps <= epochs + 1e-9
        assert sum(a for a, _ in got.values()) <= budget + 1e-6

    inner()
