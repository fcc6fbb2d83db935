"""Round-7 LLM-pipeline additions: CCNet boilerplate stripping, PMI
collocations, Gopher quality flags, per-group winsorization,
cross-corpus dedup, and the split-leakage audit."""

import math

from pyspark.sql import functions as F

from graphkb_spark.operators.corpus import pmi_collocations, strip_boilerplate
from graphkb_spark.operators.dedup import dedup_against, split_leakage
from graphkb_spark.operators.text import gopher_quality_flags


def test_strip_boilerplate_drops_sitewide_banner_only(spark):
    banner = "one two three four five six seven eight"
    docs = [
        (i, "siteA", banner + f" unique{i} alpha beta gamma delta eps zeta eta")
        for i in range(4)
    ] + [(10, "siteB", banner + " solo content here words more padding x")]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    out = strip_boilerplate(
        df, "doc_id", "text", "source", seg_words=8, max_doc_frac=0.5, min_docs=2
    ).collect()
    by_id = {r.doc_id: r for r in out}
    # siteA: banner occurs in 4/4 docs -> stripped everywhere
    for i in range(4):
        assert by_id[i].n_segments == 2
        assert by_id[i].kept_segments == 1
        assert by_id[i].clean_text.startswith(f"unique{i}")
    # siteB has ONE doc: min_docs=2 protects the banner there
    assert by_id[10].kept_segments == 2
    assert by_id[10].clean_text.startswith(banner)


def test_strip_boilerplate_fully_boiler_doc_survives_empty(spark):
    b = "a b c d e f g h"
    df = spark.createDataFrame(
        [(1, "s", b), (2, "s", b), (3, "s", b + " tail words only here now yes no")],
        "doc_id long, source string, text string",
    )
    out = {r.doc_id: r for r in strip_boilerplate(
        df, "doc_id", "text", "source", seg_words=8
    ).collect()}
    assert out[1].kept_segments == 0 and out[1].clean_text == ""
    assert out[3].clean_text == "tail words only here now yes no"


def test_pmi_collocations_prefers_exclusive_pairs(spark):
    # "aa bb" always adjacent and exclusive; "cc"/"dd" common separately
    rows = [(("aa bb cc dd " * 5).strip(),) for _ in range(10)] + [
        (("cc dd cc ee dd ff " * 3).strip(),) for _ in range(10)
    ]
    df = spark.createDataFrame(rows, "text string")
    out = pmi_collocations(df, "text", min_count=5, top_k=10).collect()
    assert out, "no collocations found"
    top = out[0]
    assert (top.w1, top.w2) == ("aa", "bb")
    # manual pmi for the top pair
    allw = [w for (t,) in rows for w in t.split()]
    bigs = []
    for (t,) in rows:
        ws = t.split()
        bigs += list(zip(ws, ws[1:]))
    n_ab = sum(1 for b in bigs if b == ("aa", "bb"))
    p_ab = n_ab / len(bigs)
    p_a = allw.count("aa") / len(allw)
    p_b = allw.count("bb") / len(allw)
    assert abs(top.pmi - round(math.log2(p_ab / (p_a * p_b)), 6)) < 1e-6


def test_gopher_flags_values_and_conjunction(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta " * 10),  # 40 words, all dup-heavy
            (2, "xy " * 5),  # 5 words: fails ok_words and short words
        ],
        "doc_id long, text string",
    )
    # texts end with a space -> split yields a trailing '' word; strip
    df = df.select("doc_id", F.trim("text").alias("text"))
    out = {r.doc_id: r for r in gopher_quality_flags(df, "doc_id", "text").collect()}
    r1 = out[1]
    assert r1.n_words == 40
    assert abs(r1.mean_word_len - 4.75) < 1e-9  # (5+4+5+5)/4
    assert abs(r1.dup_frac - round(1 - 4 / 40, 6)) < 1e-9
    assert not r1.ok_dup and not r1.passes  # 0.9 > 0.65
    r2 = out[2]
    assert r2.n_words == 5 and not r2.ok_words and not r2.passes


def test_winsorize_per_group_clips_to_group_percentiles(spark):
    from graphkb_spark.operators.aggregate import winsorize_per_group

    rows = [(i, "g", float(i)) for i in range(101)]  # 0..100
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    out = winsorize_per_group(df, ["grp"], "v", lower=0.05, upper=0.95)
    got = {r.id: r for r in out.collect()}
    assert got[0].value_w == 5.0 and got[0].clipped_low
    assert got[100].value_w == 95.0 and got[100].clipped_high
    assert got[50].value_w == 50.0 and not got[50].clipped_low


def test_dedup_against_flags_only_cross_matches(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    ref = spark.createDataFrame([(100, base)], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [
            (1, base + " extra"),  # near-dup of ref
            (2, "completely different words about databases and engines here"),
        ],
        "doc_id long, text string",
    )
    out = dedup_against(corpus, ref, "text", "doc_id", jaccard_threshold=0.5).collect()
    assert [r.doc_id for r in out] == [1]
    assert out[0].n_ref_matches == 1
    assert out[0].best_jaccard > 0.5


def test_split_leakage_only_straddling_pairs(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    # clones of one doc: every near-dup pair either straddles or not;
    # with a 50/50 split some ids land on each side
    docs = [(i, base + f" tail{i // 8}") for i in range(32)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = split_leakage(
        df, "text", "doc_id", splits={"train": 1, "val": 1}, jaccard_threshold=0.5
    ).collect()
    assert out, "expected at least one straddling near-dup pair"
    for r in out:
        assert r.split_a != r.split_b
        assert r.jaccard >= 0.5


def test_gram_matrix_quantized_matches_numpy(spark):
    import numpy as np

    from graphkb_spark.operators.similarity import (
        gram_matrix_quantized,
        quantize_embeddings,
    )

    rng = [[float(((i * 7 + j * 3) % 11) - 5) for j in range(4)] for i in range(30)]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(rng)],
                               "vec_id long, embedding array<float>")
    out = {(r.i, r.j): r.s for r in gram_matrix_quantized(df, "embedding").collect()}
    q = np.array([r.qvec for r in quantize_embeddings(df, "embedding")
                  .select("qvec").collect()], dtype=np.int64)
    g = q.T @ q
    for i in range(4):
        for j in range(i, 4):
            assert out[(i, j)] == g[i, j]
    assert len(out) == 10  # upper triangle of 4x4


def test_mixture_interleave_prefix_proportional(spark):
    from graphkb_spark.operators.sampling import mixture_interleave

    rows = [(i, "heavy" if i < 400 else "light") for i in range(800)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = mixture_interleave(
        df, "doc_id", "source", weights={"heavy": 3.0}, limit=120
    ).collect()
    assert [r.position for r in out] == list(range(1, 121))
    # every prefix carries ~3 heavy docs per light doc
    heavy_in_prefix = sum(1 for r in out[:40] if r.source == "heavy")
    assert 27 <= heavy_in_prefix <= 33
    # deterministic: rerun yields the identical order
    again = mixture_interleave(
        df, "doc_id", "source", weights={"heavy": 3.0}, limit=120
    ).collect()
    assert [(r.position, r.doc_id) for r in out] == [
        (r.position, r.doc_id) for r in again
    ]


def test_canonical_per_cluster_partitions_corpus(spark):
    from graphkb_spark.operators.dedup import canonical_per_cluster

    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 20), (4, 5), (5, 7)], "doc_id long, n_chars long"
    )
    # cluster {1,2,3} via pairs, {4} and {5} singletons
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    out = canonical_per_cluster(
        docs, pairs, "doc_id", [F.col("n_chars").desc(), F.col("doc_id").asc()]
    ).collect()
    by_comp = {r.comp: r for r in out}
    assert by_comp[1].doc_id == 2 and by_comp[1].cluster_size == 3  # longest wins
    assert by_comp[4].cluster_size == 1 and by_comp[5].cluster_size == 1
    assert sum(r.cluster_size for r in out) == 5


def test_expectations_single_job_and_verdicts(spark):
    from graphkb_spark.operators.expectations import run_expectations

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 7.0), (3, None, 100.0), (3, "a", 8.0)],
        "id long, name string, v double",
    )
    rules = [
        {"column": "id", "check": "not_null"},
        {"column": "id", "check": "unique"},                      # 3/4 -> fail
        {"column": "name", "check": "not_null", "threshold": 0.7},  # 0.75 pass
        {"column": "v", "check": "max", "bound": 50},             # 100 -> fail
        {"column": "v", "check": "mean_between", "lo": 0, "hi": 50},
        {"column": "name", "check": "in_set", "values": ["a", "b"]},
        {"column": "name", "check": "regex", "pattern": "^[ab]$"},
    ]
    out = {r.rule_id: r for r in run_expectations(df, rules).collect()}
    assert out[0].passed and out[0].observed == 1.0
    assert not out[1].passed and out[1].observed == 0.75
    assert out[2].passed
    assert not out[3].passed and out[3].observed == 100.0
    assert out[4].passed and out[4].observed == 30.0
    assert out[5].passed and out[6].passed  # nulls excluded from frac
    # ONE aggregation job: plan has a single (partial+final) agg pair
    plan = run_expectations(df, rules)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") <= 4  # partial+final (+distinct pair)


def test_expectations_empty_batch_fails_loudly(spark):
    from graphkb_spark.operators.expectations import run_expectations

    empty = spark.createDataFrame([], "id long, v double")
    out = run_expectations(
        empty,
        [
            {"column": "id", "check": "not_null"},
            {"column": "v", "check": "max", "bound": 10},
            {"column": "v", "check": "mean_between", "lo": 0, "hi": 5},
        ],
    ).collect()
    assert len(out) == 3
    assert all(r.observed is None and r.passed is False for r in out)
    # all-null column: fraction checks fail, never divide-by-zero
    nulls = spark.createDataFrame([(1, None), (2, None)], "id long, name string")
    out2 = run_expectations(
        nulls, [{"column": "name", "check": "regex", "pattern": "x"}]
    ).collect()
    assert out2[0].passed is False


def test_project_quantized_matches_numpy(spark):
    import numpy as np

    from graphkb_spark.operators.similarity import (
        project_quantized,
        quantize_embeddings,
    )

    vecs = [[float(((i * 5 + j) % 9) - 4) for j in range(8)] for i in range(20)]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vecs)],
                               "vec_id long, embedding array<float>")
    comps = [[1, -1, 2, 0, 3, -2, 1, 0], [0, 1, 0, -1, 0, 1, 0, -1]]
    out = {r.vec_id: (r.p0, r.p1) for r in
           project_quantized(df, comps, "embedding").collect()}
    q = {r.vec_id: np.array(r.qvec, dtype=np.int64) for r in
         quantize_embeddings(df, "embedding").select("vec_id", "qvec").collect()}
    for i in range(20):
        assert out[i] == (int(q[i] @ np.array(comps[0])), int(q[i] @ np.array(comps[1])))


def test_gopher_stopword_gate_enforced(spark):
    # ADVICE r7: the stopword signal must gate `passes` (Rae et al.
    # require >= 2 stop-list hits), not just be informational.
    df = spark.createDataFrame(
        [
            (1, " ".join(["the quick brown fox jumps over a lazy dog"] * 3)),
            (2, " ".join("word%d" % i for i in range(30))),  # zero stopwords
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in gopher_quality_flags(df, "doc_id", "text").collect()}
    assert out[1].ok_stop
    assert not out[2].ok_stop and not out[2].passes
    assert out[2].ok_words and out[2].ok_dup  # only the stop gate fails


def test_strip_boilerplate_keeps_empty_text_docs(spark):
    # ADVICE r7: one-row-per-input-document contract — empty/NULL text
    # docs must appear with zero segments, not vanish.
    df = spark.createDataFrame(
        [
            (1, "s1", "one two three four five six seven eight"),
            (2, "s1", ""),
            (3, "s1", None),
        ],
        "doc_id long, source string, text string",
    )
    out = {r.doc_id: r for r in strip_boilerplate(
        df, "doc_id", "text", "source", seg_words=8
    ).collect()}
    assert set(out) == {1, 2, 3}
    for d in (2, 3):
        assert out[d].n_segments == 0
        assert out[d].kept_segments == 0
        assert out[d].clean_text == ""
