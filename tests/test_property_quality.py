"""Property-based tests (hypothesis) for the round-7 pipeline
operators: invariants that must hold on ANY input, not just the
fixtures. max_examples is kept small — every example is a Spark job."""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _doc_texts():
    return st.lists(
        st.lists(st.sampled_from(WORDS), min_size=1, max_size=24).map(" ".join),
        min_size=1,
        max_size=12,
    )


@settings(max_examples=8, deadline=None)
@given(_doc_texts(), st.integers(2, 6))
def test_boilerplate_conserves_segments_and_words(spark, texts, seg_words):
    from graphkb_spark.operators.corpus import strip_boilerplate

    df = spark.createDataFrame(
        [(i, f"s{i % 2}", t) for i, t in enumerate(texts)],
        "doc_id long, source string, text string",
    )
    out = strip_boilerplate(df, "doc_id", "text", "source", seg_words=seg_words)
    rows = out.collect()
    assert len(rows) == len(texts)  # one row per doc, none lost
    for r in rows:
        assert 0 <= r.kept_segments <= r.n_segments
        # kept text is a subsequence of the original words
        orig = texts[r.doc_id].split(" ")
        kept = r.clean_text.split(" ") if r.clean_text else []
        it = iter(orig)
        assert all(w in it for w in kept), (kept, orig)
    # an impossible threshold strips nothing and reassembles exactly
    intact = strip_boilerplate(
        df, "doc_id", "text", "source", seg_words=seg_words, max_doc_frac=1.01
    ).collect()
    for r in intact:
        assert r.kept_segments == r.n_segments
        assert r.clean_text == texts[r.doc_id]


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["g1", "g2"]), st.floats(-1e6, 1e6)),
        min_size=3,
        max_size=60,
    )
)
def test_winsorize_bounds_and_row_conservation(spark, rows):
    from graphkb_spark.operators.aggregate import winsorize_per_group

    df = spark.createDataFrame(
        [(i, g, v) for i, (g, v) in enumerate(rows)], "id long, grp string, v double"
    )
    out = winsorize_per_group(df, ["grp"], "v", 0.1, 0.9).collect()
    assert len(out) == len(rows)
    import numpy as np

    for g in {g for g, _ in rows}:
        vals = [v for gg, v in rows if gg == g]
        lo = float(np.quantile(vals, 0.1))
        hi = float(np.quantile(vals, 0.9))
        for r in out:
            if r.grp != g:
                continue
            assert lo - 1e-6 <= r.value_w <= hi + 1e-6
            assert r.clipped_low == (r.v < lo) or abs(r.v - lo) < 1e-9
            assert r.clipped_high == (r.v > hi) or abs(r.v - hi) < 1e-9


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(0, 40), min_size=1, max_size=80))
def test_kmv_exact_below_k(spark, values):
    from graphkb_spark.operators.sketch import kmv_distinct

    df = spark.createDataFrame([(v, "g") for v in values], "v long, grp string")
    out = kmv_distinct(df, ["grp"], "v", k=64).collect()[0]
    exact = len(set(values))
    assert out.n_kept == exact  # < 64 distinct: sketch IS exact
    assert out.est_distinct == float(exact)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=2, max_size=50),
    st.floats(0.5, 5.0),
)
def test_mixture_interleave_contiguous_and_complete_prefix(spark, sources, w):
    from graphkb_spark.operators.sampling import mixture_interleave

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sources)], "doc_id long, source string"
    )
    n = len(sources)
    out = mixture_interleave(df, "doc_id", "source", weights={"a": w}, limit=n)
    rows = out.collect()
    assert [r.position for r in rows] == list(range(1, n + 1))
    assert {r.doc_id for r in rows} == set(range(n))  # full permutation
