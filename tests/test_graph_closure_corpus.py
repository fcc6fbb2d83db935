"""Round-5 operators: transitive closure / hierarchy rollup
(operators/graph.py), n-gram counts (operators/corpus.py), grouped
regression (operators/aggregate.py), and the salted skew join
(operators/skew.py) against its unsalted equivalent.
"""

import math

import pytest
from pyspark.sql import functions as F

from graphkb_spark.operators.aggregate import grouped_regression
from graphkb_spark.operators.corpus import ngram_counts
from graphkb_spark.operators.graph import hierarchy_rollup, transitive_closure
from graphkb_spark.operators.skew import salted_join


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_transitive_closure_chain(spark):
    # 1 -> 2 -> 3 -> 4: closure has every forward pair with exact dist
    e = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    got = {
        (r.src, r.dst): r.dist for r in transitive_closure(e).collect()
    }
    assert got == {
        (1, 2): 1, (2, 3): 1, (3, 4): 1,
        (1, 3): 2, (2, 4): 2,
        (1, 4): 3,
    }


def test_transitive_closure_dag_min_dist(spark):
    # diamond: 1->2->4 and 1->4 directly; min dist wins
    e = _edges(spark, [(1, 2), (2, 4), (1, 4)])
    got = {
        (r.src, r.dst): r.dist for r in transitive_closure(e).collect()
    }
    assert got[(1, 4)] == 1
    assert got[(1, 2)] == 1 and got[(2, 4)] == 1


def test_transitive_closure_drops_self_loops(spark):
    e = _edges(spark, [(1, 1), (1, 2)])
    rows = transitive_closure(e).collect()
    assert {(r.src, r.dst, r.dist) for r in rows} == {(1, 2, 1)}


def test_transitive_closure_deep_chain_few_rounds(spark):
    # depth 12 converges inside the doubling budget (ceil(log2(12)) + 1)
    e = _edges(spark, [(i, i + 1) for i in range(12)])
    out = transitive_closure(e)
    assert out.count() == 12 * 13 // 2
    d = {(r.src, r.dst): r.dist for r in out.collect()}
    assert d[(0, 12)] == 12


def test_hierarchy_rollup_includes_self_and_descendants(spark):
    # tree: 10 <- 1, 10 <- 2 ; facts on 1, 2, 10
    e = _edges(spark, [(1, 10), (2, 10)])
    facts = spark.createDataFrame(
        [(1, 5.0), (2, 7.0), (10, 1.0)], "part long, qty double"
    )
    out = hierarchy_rollup(
        facts, e, "part",
        [F.sum("qty").alias("total"), F.count(F.lit(1)).alias("n")],
    )
    got = {r.node: (r.total, r.n) for r in out.collect()}
    assert got[10] == (13.0, 3)   # self + both children
    assert got[1] == (5.0, 1)
    assert got[2] == (7.0, 1)


def test_ngram_counts_basic_and_short_docs(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "a b c"),
            (3, "xy"),          # shorter than n: no trigrams
            (4, None),          # null text: no rows, no crash
            (5, ""),
        ],
        "id long, text string",
    )
    got = {
        r.ngram: r.freq
        for r in ngram_counts(df, "text", n=3, min_count=2).collect()
    }
    assert got == {"a b c": 2}
    all_grams = {
        r.ngram: r.freq
        for r in ngram_counts(df, "text", n=3, min_count=1).collect()
    }
    assert all_grams == {"a b c": 2, "b c d": 1}


def test_ngram_counts_top_ranking(spark):
    df = spark.createDataFrame(
        [(1, "x y x y x y"), (2, "x y z")], "id long, text string"
    )
    top1 = ngram_counts(df, "text", n=2, min_count=1, top=1).collect()
    assert len(top1) == 1
    assert top1[0].ngram == "x y" and top1[0].freq == 4


def test_ngram_counts_rejects_bad_n(spark):
    df = spark.createDataFrame([(1, "a")], "id long, text string")
    with pytest.raises(ValueError):
        ngram_counts(df, "text", n=0)


def test_grouped_regression_exact_line(spark):
    # y = 3x + 1 exactly in group 'a'; constant x in group 'b' -> null slope
    rows = [("a", float(x), 3.0 * x + 1.0) for x in range(1, 6)]
    rows += [("b", 2.0, 5.0), ("b", 2.0, 9.0)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r.g: r for r in grouped_regression(df, ["g"], "x", "y").collect()}
    a = got["a"]
    assert a.n == 5
    assert math.isclose(a.slope, 3.0, abs_tol=1e-6)
    assert math.isclose(a.intercept, 1.0, abs_tol=1e-6)
    assert math.isclose(a.pearson_r, 1.0, abs_tol=1e-6)
    assert math.isclose(a.r2, 1.0, abs_tol=1e-6)
    assert got["b"].slope is None  # zero x-variance


def test_normal_equations_int64_sums_match_decimal(spark):
    """r14: the int64 fast path (scaled-long moment sums) must be
    bit-identical to the decimal(38,10) default on <=2-decimal inputs
    — same closed-form coefficients, group by group."""
    from graphkb_spark.operators.aggregate import grouped_normal_equations

    rows = [
        ("a", float(x), round(0.01 * x, 2), round(2.5 * x + 0.75, 2))
        for x in range(1, 40)
    ] + [("b", 1.0, 1.0, 1.0), ("b", 1.0, 1.0, 2.0)]  # singular group
    df = spark.createDataFrame(rows, "g string, x1 double, x2 double, y double")
    dec = sorted(
        map(tuple, grouped_normal_equations(df, ["g"], "x1", "x2", "y").collect())
    )
    i64 = sorted(
        map(
            tuple,
            grouped_normal_equations(
                df, ["g"], "x1", "x2", "y", sums="int64"
            ).collect(),
        )
    )
    assert dec == i64
    with pytest.raises(ValueError, match="sums"):
        grouped_normal_equations(df, ["g"], "x1", "x2", "y", sums="float")


def test_salted_join_matches_plain_join(spark):
    fact = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(100)],
        "event_id long, k long, v double",
    )
    dim = spark.createDataFrame(
        [(0, "x"), (1, "y"), (2, "z")], "k long, name string"
    )
    salted = (
        salted_join(fact, dim, on=["k"], salt=4)
        .groupBy("name").agg(F.count(F.lit(1)).alias("n"),
                             F.sum("v").alias("s"))
    )
    plain = (
        fact.join(dim, "k")
        .groupBy("name").agg(F.count(F.lit(1)).alias("n"),
                             F.sum("v").alias("s"))
    )
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_lm_score_hand_computed(spark):
    from graphkb_spark.operators.corpus import lm_score

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x"), (4, None)],
        "id long, text string",
    )
    got = {r.id: r for r in lm_score(df, "id", "text").collect()}
    # corpus bigrams: doc1 = (a b), (b a), (a b); doc2 = (a b), (b c)
    # prefix counts: a->3, b->2 ; bigram counts: "a b"->3, "b a"->1, "b c"->1
    # doc1: log2(3/3) + log2(1/2) + log2(3/3) over 3 = -1/3
    assert got[1].n_bigrams == 3
    assert math.isclose(got[1].avg_log2_prob, round(-1 / 3, 6), abs_tol=1e-9)
    # doc2: log2(3/3) + log2(1/2) over 2 = -0.5
    assert got[2].n_bigrams == 2
    assert math.isclose(got[2].avg_log2_prob, -0.5, abs_tol=1e-9)
    # <2-token and null docs emit no row
    assert 3 not in got and 4 not in got


def test_funnel_counts_ordering_semantics(spark):
    from datetime import datetime

    from graphkb_spark.operators.aggregate import funnel_counts

    T = datetime
    rows = [
        # u1: full funnel in order
        (1, "view", T(2024, 1, 1, 10)), (1, "click", T(2024, 1, 1, 11)),
        (1, "purchase", T(2024, 1, 1, 12)),
        # u2: purchase BEFORE click -> stops at click
        (2, "view", T(2024, 1, 1, 10)), (2, "purchase", T(2024, 1, 1, 10, 30)),
        (2, "click", T(2024, 1, 1, 11)),
        # u3: only view
        (3, "view", T(2024, 1, 1, 9)),
        # u4: click then later view then purchase: view matches first,
        # click never re-occurs after it -> stops at view
        (4, "click", T(2024, 1, 1, 8)), (4, "view", T(2024, 1, 1, 9)),
        (4, "purchase", T(2024, 1, 1, 10)),
        # u5: simultaneous view+click+purchase all count (ties, >= semantics)
        (5, "view", T(2024, 1, 1, 7)), (5, "click", T(2024, 1, 1, 7)),
        (5, "purchase", T(2024, 1, 1, 7)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = funnel_counts(df, "user_id", "event_type", "ts",
                        ["view", "click", "purchase"]).collect()[0]
    assert out.n_view == 5        # u1..u5 all viewed
    assert out.n_click == 3       # u1, u2, u5
    assert out.n_purchase == 2    # u1, u5

def test_rolling_mean_window(spark):
    from datetime import datetime

    from graphkb_spark.operators.aggregate import rolling_mean

    rows = [(1, i, datetime(2024, 1, 1, i), float(i)) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, value double")
    out = {r.event_id: r.rolling_avg
           for r in rolling_mean(df, "user_id", ["ts", "event_id"], "value",
                                 window_rows=3).collect()}
    assert out[1] == 1.0
    assert out[2] == 1.5
    assert out[3] == 2.0      # (1+2+3)/3
    assert out[5] == 4.0      # (3+4+5)/3

def test_histogram_fixed_edges(spark):
    from graphkb_spark.operators.aggregate import histogram_fixed

    df = spark.createDataFrame(
        [(0.0,), (4.9,), (5.0,), (9.99,), (10.0,), (-0.1,)], "v double"
    )
    got = {r.bucket: (r.lo_edge, r.n)
           for r in histogram_fixed(df, "v", step=5.0).collect()}
    assert got[0] == (0.0, 2)    # 0.0 and 4.9
    assert got[1] == (5.0, 2)    # 5.0 boundary lands in its own bucket
    assert got[2] == (10.0, 1)
    assert got[-1] == (-5.0, 1)  # below lo goes to bucket -1

def test_histogram_rejects_bad_step(spark):
    from graphkb_spark.operators.aggregate import histogram_fixed

    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError):
        histogram_fixed(df, "v", step=0)


def test_grouped_percentiles_interpolation(spark):
    from graphkb_spark.operators.aggregate import grouped_percentiles

    df = spark.createDataFrame(
        [("a", float(v)) for v in [10, 20, 30, 40]], "g string, v double"
    )
    row = grouped_percentiles(df, ["g"], "v", percentiles=(0.5,)).collect()[0]
    assert row.p50 == 25.0  # linear interpolation between 20 and 30


def test_incremental_agg_merge_equals_full_recompute(spark):
    from graphkb_spark.operators.aggregate import incremental_agg_merge

    base = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 10.0)], "k string, v double"
    )
    delta = spark.createDataFrame(
        [("a", 4.0), ("c", 7.0)], "k string, v double"
    )
    snap = base.groupBy("k").agg(
        F.sum("v").alias("sum_v"), F.count(F.lit(1)).alias("n")
    )
    merged = {
        r.k: (r.sum_v, r.n)
        for r in incremental_agg_merge(
            snap, delta, ["k"], {"sum_v": "v"}
        ).collect()
    }
    full = {
        r.k: (r.sum_v, r.n)
        for r in base.unionByName(delta)
        .groupBy("k")
        .agg(F.sum("v").alias("sum_v"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert merged == full  # includes delta-only key 'c' and untouched 'b'


def test_transitive_closure_random_forests(spark):
    """Property check: on random forests (parent(i) < i), the doubling
    closure equals the reference python walk, pairs AND distances.
    Cases are fixed-seed (Spark per-example cost rules out hypothesis
    here) but cover chains, stars, and mixed fan-in."""
    import random

    rng = random.Random(20260814)
    for case in range(4):
        n = rng.randint(5, 24)
        parents = {i: rng.randrange(i) for i in range(1, n)}
        expected = {}
        for i in parents:
            node, d = i, 0
            while node in parents:
                node = parents[node]
                d += 1
                expected[(i, node)] = d
        e = _edges(spark, [(i, p) for i, p in parents.items()])
        got = {(r.src, r.dst): r.dist for r in transitive_closure(e).collect()}
        assert got == expected, f"case {case}: n={n}"


def _ref_bpe(texts, n_merges):
    """Pure-Python reference BPE (Sennrich et al.): count-weighted
    adjacent-pair argmax, (count desc, left, right) tie-break,
    left-to-right non-overlapping merge application."""
    from collections import Counter

    wc = Counter(w for t in texts if t for w in t.lower().split())
    syms = {w: list(w) for w in wc}
    merges = []
    for step in range(n_merges):
        pc = Counter()
        for w, s in syms.items():
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += wc[w]
        if not pc:
            break
        (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, l, r, l + r, c))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


def test_bpe_train_matches_reference(spark):
    from graphkb_spark.operators.corpus import bpe_train

    texts = [
        "low lower lowest",
        "new newer newest newest",
        "low low new",
        None,
        "wider wide wide",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r.step, r.left, r.right, r.merged, r.pair_count)
        for r in bpe_train(df, "text", n_merges=6).orderBy("step").collect()
    ]
    assert got == _ref_bpe(texts, 6)


def test_bpe_train_sampled_equivalence(spark):
    """VERDICT r11 #6 done-criterion: on a corpus whose pair-frequency
    structure is stable under sampling (every doc drawn from the same
    template distribution — the regime the sampling bound describes),
    the merge SEQUENCE learned on a half-size md5-hash sample equals
    the full-corpus sequence. Counts differ (the sample is smaller);
    the learned artifact — (step, left, right, merged) — must not."""
    from graphkb_spark.operators.corpus import bpe_train, bpe_train_sampled

    base = "low lower lowest new newer newest wide wider widest"
    texts = [f"{base} extra{i % 3}" for i in range(40)]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    full = [
        (r.step, r.left, r.right, r.merged)
        for r in bpe_train(df, "text", n_merges=6).orderBy("step").collect()
    ]
    sampled = [
        (r.step, r.left, r.right, r.merged)
        for r in bpe_train_sampled(df, "text", n_merges=6, sample_docs=20)
        .orderBy("step")
        .collect()
    ]
    assert sampled == full
    # determinism: same sample, same table, bit-for-bit
    rerun = [
        (r.step, r.left, r.right, r.merged)
        for r in bpe_train_sampled(df, "text", n_merges=6, sample_docs=20)
        .orderBy("step")
        .collect()
    ]
    assert rerun == sampled


def test_bpe_train_sampled_whole_corpus_is_exact(spark):
    """sample_docs >= corpus size degenerates to full training —
    including identical pair_counts."""
    from graphkb_spark.operators.corpus import bpe_train, bpe_train_sampled

    texts = ["low lower lowest", "new newer newest newest", "low low new"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    full = sorted(map(tuple, bpe_train(df, "text", n_merges=4).collect()))
    samp = sorted(
        map(tuple, bpe_train_sampled(df, "text", n_merges=4, sample_docs=10).collect())
    )
    assert samp == full


def test_bpe_train_repeated_chars(spark):
    from graphkb_spark.operators.corpus import bpe_train

    # 'aaaa' stresses non-overlapping left-to-right application
    texts = ["aaaa aaaa aa", "aaa a"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r.step, r.left, r.right, r.merged, r.pair_count)
        for r in bpe_train(df, "text", n_merges=4).orderBy("step").collect()
    ]
    assert got == _ref_bpe(texts, 4)


def test_triangle_counts_small_graph(spark):
    from graphkb_spark.operators.graph import triangle_counts

    # triangle 1-2-3 plus pendant edge 3-4, duplicate/reversed edges
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 3), (3, 4), (2, 1)], "src long, dst long"
    )
    out = {r.node: r.n_triangles for r in triangle_counts(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1}
    # two triangles sharing the edge (1,2)
    edges2 = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 4), (2, 4)], "src long, dst long"
    )
    out2 = {r.node: r.n_triangles for r in triangle_counts(edges2).collect()}
    assert out2 == {1: 2, 2: 2, 3: 1, 4: 1}


def test_transitive_closure_fixed_rounds_deep_lazy_plan_bounded(spark):
    # ADVICE r7: fixed-rounds lazy checkpointing must not blow up the
    # unexecuted plan for larger `rounds` — every 3rd round is eager.
    # rounds=6 covers depth 64; a 40-deep chain must close exactly.
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "src long, dst long"
    )
    got = {(r.src, r.dst): r.dist
           for r in transitive_closure(e, rounds=6).collect()}
    assert got[(0, 40)] == 40
    assert got[(5, 25)] == 20
    assert len(got) == 41 * 40 // 2
