"""Property-based tests (hypothesis) for the round-8 operators:
invariants that must hold on ANY input. max_examples stays small —
every example is a Spark job."""

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.integers(0, 30), min_size=1, max_size=60),
    st.integers(2, 4),
)
def test_cms_one_sided_and_partition_invariant(spark, keys, parts):
    """Count-Min never undercounts, and the sketch is identical under
    any repartitioning (counter increments commute)."""
    from graphkb_spark.operators.sketch import count_min_estimate

    df = spark.createDataFrame([(f"k{k}",) for k in keys], ["key"])
    a = {r.key: (r.est_count, r.exact_count)
         for r in count_min_estimate(df, "key", depth=3, width=8).collect()}
    b = {r.key: (r.est_count, r.exact_count)
         for r in count_min_estimate(
             df.repartition(parts), "key", depth=3, width=8).collect()}
    assert a == b
    assert all(est >= exact for est, exact in a.values())


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 100), st.integers(0, 50)),
        min_size=2,
        max_size=40,
    )
)
def test_scd2_lookup_matches_interval_bruteforce(spark, rows):
    """union + forward-fill point-in-time join == the literal interval
    predicate, on arbitrary mutation histories."""
    from graphkb_spark.operators.merge import scd2_build, scd2_lookup

    t0 = datetime.datetime(2024, 1, 1)
    mut = spark.createDataFrame(
        [(f"u{k}", t0 + datetime.timedelta(hours=h), f"t{v % 4}")
         for k, h, v in rows],
        ["key", "ts", "attr"],
    )
    dim = scd2_build(mut, ["key"], "ts", ["attr"]).cache()
    facts = spark.createDataFrame(
        [(i, f"u{k}", t0 + datetime.timedelta(hours=h, minutes=7))
         for i, (k, h, _) in enumerate(rows)],
        ["fid", "key", "ts"],
    )
    got = {(r.fid): r.attr
           for r in scd2_lookup(facts, dim, ["key"], "ts", ["attr"]).collect()}
    want = {}
    versions = dim.collect()
    for f in facts.collect():
        for v in versions:
            if (v.key == f.key and f.ts >= v.valid_from
                    and (v.valid_to is None or f.ts < v.valid_to)):
                want[f.fid] = v.attr
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 3), st.integers(1, 500)),
             min_size=1, max_size=30),
    st.integers(50, 400),
)
def test_compaction_plan_bins_bounded(spark, files, target):
    """Every bin except possibly the last-started one is filled below
    target + its largest file, and sizes are conserved."""
    from graphkb_spark.operators.layout import compaction_plan

    df = spark.createDataFrame(
        [(f"p{p}", f"f{i}", s) for i, (p, s) in enumerate(files)],
        ["part", "file", "size"],
    )
    out = compaction_plan(df, "part", "file", "size", target).collect()
    assert sum(r.size for r in out) == sum(s for _, s in files)
    by_bin = {}
    for r in out:
        by_bin.setdefault((r.part, r.bin), []).append(r.size)
    for sizes in by_bin.values():
        # running-total packing: bin content minus its last-placed file
        # must be under target (the overshoot is at most one file)
        assert sum(sizes) - max(sizes) < target


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.floats(0, 100, allow_nan=False), min_size=3, max_size=50),
    st.integers(2, 4),
)
def test_pareto_frontier_partition_invariant_and_correct(spark, xs, parts):
    """The skyline equals brute force and ignores physical layout."""
    from graphkb_spark.operators.aggregate import pareto_frontier_2d

    pts = [(i, round(x, 3), round((100 - x) * ((i % 3) + 1) / 3, 3))
           for i, x in enumerate(xs)]
    df = spark.createDataFrame(pts, ["pid", "x", "y"])
    got = sorted(r.pid for r in
                 pareto_frontier_2d(df, "x", "y", "pid", n_buckets=4).collect())
    got2 = sorted(r.pid for r in pareto_frontier_2d(
        df.repartition(parts), "x", "y", "pid", n_buckets=7).collect())
    assert got == got2

    def dominated(p, q):
        return q[1] <= p[1] and q[2] <= p[2] and (q[1] < p[1] or q[2] < p[2])

    frontier = [p for p in pts if not any(dominated(p, q) for q in pts if q != p)]
    seen, want = set(), []
    for p in sorted(frontier, key=lambda t: (t[1], t[2], t[0])):
        if (p[1], p[2]) not in seen:
            seen.add((p[1], p[2]))
            want.append(p[0])
    assert got == sorted(want)
