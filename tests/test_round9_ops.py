"""Round-9 operators: SemDeDup semantic dedup, LSH band planning,
CCNet perplexity bucketing, Heaps-law vocabulary growth."""
import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from graphkb_spark.session import get_spark

    return get_spark()


# ---------------------------------------------------------------- semdedup
def _vecs(spark):
    # two tight groups far apart + one isolated point; ids chosen so
    # keep-lowest-id policy is observable
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),   # near-dup of 1
        (3, [0.0, 1.0, 0.0]),
        (4, [0.01, 0.999, 0.0]),   # near-dup of 3
        (5, [0.0, 0.0, 1.0]),      # isolated
        (6, [0.998, 0.02, 0.0]),   # near-dup of 1 and 2
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_semantic_dedup_marks_lower_id_twins(spark):
    from graphkb_spark.operators.dedup import semantic_dedup

    out = semantic_dedup(
        _vecs(spark), "vec_id", "embedding", k=3, rounds=2, tau=0.9
    ).collect()
    by_id = {r.vec_id: r for r in out}
    assert len(by_id) == 6  # one row per vector, no dup rows
    # cluster-mates above tau with a lower id must be dropped...
    clusters = {}
    for r in out:
        clusters.setdefault(r.cluster, []).append(r.vec_id)
    vec = {r[0]: r[1] for r in _vecs(spark).collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 4)

    for r in out:
        lower_twins = [
            i
            for i in clusters[r.cluster]
            if i < r.vec_id and cos(vec[i], vec[r.vec_id]) >= 0.9
        ]
        if lower_twins:
            assert not r.keep, r
            assert r.dup_of == min(lower_twins), r
            assert r.dup_sim == cos(vec[r.dup_of], vec[r.vec_id])
        else:
            assert r.keep and r.dup_of is None and r.dup_sim is None, r


def test_semantic_dedup_partition_invariant(spark):
    from graphkb_spark.operators.dedup import semantic_dedup

    base = _vecs(spark)
    a = sorted(
        tuple(r)
        for r in semantic_dedup(
            base, "vec_id", "embedding", k=3, rounds=2, tau=0.9
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in semantic_dedup(
            base.repartition(7), "vec_id", "embedding", k=3, rounds=2, tau=0.9
        ).collect()
    )
    assert a == b


# ----------------------------------------------------------- band planner
def test_lsh_band_tuning_matches_closed_form(spark):
    from graphkb_spark.operators.dedup import lsh_band_tuning

    # three documents: 1 and 2 are near-identical, 3 is unrelated
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta iota"),
            (3, "one two three four five six seven eight"),
        ],
        ["doc_id", "text"],
    )
    out = {
        (r.bands, r.rows_per_band): r
        for r in lsh_band_tuning(
            docs, "text", "doc_id", num_hashes=16, sim_floor=0.3
        ).collect()
    }
    # factorizations of 16
    assert set(out) == {(1, 16), (2, 8), (4, 4), (8, 2), (16, 1)}
    # docs 1-2 share 5 of 7 distinct 3-shingles total -> jaccard known
    from graphkb_spark.operators.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(
        docs, "text", "doc_id", shingle_n=3, threshold=0.3
    ).collect()
    assert len(pairs) == 1
    s = round(pairs[0].jaccard, 4)
    for (b, r), row in out.items():
        exp = 1.0 - (1.0 - s**r) ** b
        assert row.n_pairs == 1
        assert abs(row.exp_recall - exp) < 1e-6, (b, r)
        # S-curve midpoint: more bands -> lower s50 threshold
    s50s = [out[k].s50 for k in sorted(out)]
    assert s50s == sorted(s50s, reverse=True)


# ------------------------------------------------------ perplexity bucket
def test_perplexity_buckets_order_and_cover(spark):
    from graphkb_spark.operators.corpus import perplexity_buckets

    # doc i repeats the common bigram i+2 times then ends with a
    # unique-per-doc word pair -> strictly graded scores
    docs = spark.createDataFrame(
        [
            (
                i,
                "alpha beta " * (i + 2)
                + f"{chr(97 + i) * 3} {chr(97 + i) * 4}",
            )
            for i in range(13)
        ],
        ["doc_id", "text"],
    )
    out = perplexity_buckets(docs, "doc_id", "text").collect()
    assert len(out) == 13
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r.avg_log2_prob)
    assert set(by_bucket) <= {"head", "middle", "tail"}
    assert by_bucket.get("head") and by_bucket.get("tail")
    # every head score >= every middle score >= every tail score
    if "middle" in by_bucket:
        assert min(by_bucket["head"]) >= max(by_bucket["middle"])
        assert min(by_bucket["middle"]) >= max(by_bucket["tail"])
    else:
        assert min(by_bucket["head"]) >= max(by_bucket["tail"])


# ------------------------------------------------------------- heaps fit
def test_heaps_fit_all_distinct_tokens_is_linear(spark):
    from graphkb_spark.operators.corpus import heaps_fit

    # every token unique (letters only — the tokenizer splits digits
    # into separate tokens) -> V(N) = N -> beta = 1, ln_k = 0, r2 = 1
    def word(n: int) -> str:
        out = ""
        for _ in range(4):
            out += chr(97 + n % 26)
            n //= 26
        return out

    docs = spark.createDataFrame(
        [
            (d, " ".join(word(d * 20 + i) for i in range(20)))
            for d in range(10)
        ],
        ["doc_id", "text"],
    )
    row = heaps_fit(docs, "doc_id", "text").collect()[0]
    assert row.n_tokens == 200 and row.vocab == 200
    assert abs(row.beta - 1.0) < 1e-9
    assert abs(row.ln_k) < 1e-9
    assert abs(row.r2 - 1.0) < 1e-9


def test_heaps_fit_single_token_vocab_is_flat(spark):
    from graphkb_spark.operators.corpus import heaps_fit

    docs = spark.createDataFrame(
        [(d, "same same same same same") for d in range(8)],
        ["doc_id", "text"],
    )
    row = heaps_fit(docs, "doc_id", "text").collect()[0]
    assert row.n_tokens == 40 and row.vocab == 1
    assert row.beta == 0.0  # ln V = 0 everywhere


def test_heaps_fit_partition_invariant(spark):
    from graphkb_spark.operators.corpus import heaps_fit

    docs = spark.createDataFrame(
        [(d, " ".join(f"w{(d * 7 + i) % 13}" for i in range(15))) for d in range(30)],
        ["doc_id", "text"],
    )
    a = heaps_fit(docs, "doc_id", "text", shingle_n=2).collect()
    b = heaps_fit(docs.repartition(11), "doc_id", "text", shingle_n=2).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


# ------------------------------------------------- streaming minhash dedup
def test_streaming_minhash_dedup_suppressed_doc_still_suppresses(spark):
    """A~B and B~C but A!~C: B is dropped in its batch, yet its bands
    stay in state, so C (arriving later) is dropped too — the pairwise
    lower-id rule, not keep-set-only suppression."""
    from graphkb_spark.streaming.incremental import streaming_minhash_dedup

    base = "a b c d e f g h i j k l".split()
    b = base[:-1] + ["m"]          # differs in last shingle only
    c = ["z"] + b[1:]              # differs from B in first shingle only
    docs = spark.createDataFrame(
        [(1, " ".join(base)), (2, " ".join(b)), (3, " ".join(c))],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r.keep
        for r in streaming_minhash_dedup(
            spark, docs, "doc_id", "text",
            num_hashes=32, bands=16, jaccard_threshold=0.8,
            hasher="md5", n_batches=3,
        ).collect()
    }
    assert out == {1: True, 2: False, 3: False}


def test_streaming_minhash_dedup_batch_count_invariant(spark):
    from graphkb_spark.session import load_table
    from graphkb_spark.streaming.incremental import streaming_minhash_dedup

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(200)
    runs = []
    for nb in (2, 5):
        runs.append(
            sorted(
                tuple(r)
                for r in streaming_minhash_dedup(
                    spark, docs, "doc_id", "text",
                    num_hashes=32, bands=16, jaccard_threshold=0.6,
                    hasher="md5", n_batches=nb,
                    query_name=f"t_smd_{nb}",
                ).collect()
            )
        )
    assert runs[0] == runs[1]
