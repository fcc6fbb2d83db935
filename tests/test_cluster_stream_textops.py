"""K-means clustering, the hashed-linear classifier, cross-doc
duplicate-ngram fraction, and the stream-stream interval join."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F


def test_kmeans_separates_planted_clusters(spark):
    """Two well-separated planted blobs end up in two clusters with
    every member assigned to its blob's centroid."""
    from graphkb_spark.operators.cluster import kmeans_assign

    rows = [(i, [10.0 + (i % 3) * 0.1, 0.0]) for i in range(6)] + [
        (i, [-10.0 - (i % 3) * 0.1, 1.0]) for i in range(6, 12)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = kmeans_assign(df, "embedding", "vec_id", k=2, n_iter=3).collect()
    by_blob = {0: set(), 1: set()}
    for r in out:
        by_blob[0 if r.vec_id < 6 else 1].add(r.cluster)
    # each blob maps to exactly one cluster and the clusters differ
    assert len(by_blob[0]) == 1 and len(by_blob[1]) == 1
    assert by_blob[0] != by_blob[1]
    # converged: every point sits near its refined centroid
    assert all(r.dist2 < 0.05 for r in out)


def test_kmeans_deterministic_and_empty_cluster_safe(spark):
    """k > #distinct points leaves empty clusters (which keep their
    seed centroid) without error, and reruns are bit-identical."""
    from graphkb_spark.operators.cluster import kmeans_assign

    rows = [(i, [float(i % 2), 0.0]) for i in range(8)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    a = sorted(map(tuple, kmeans_assign(df, "embedding", "vec_id", k=4, n_iter=2).collect()))
    b = sorted(map(tuple, kmeans_assign(df, "embedding", "vec_id", k=4, n_iter=2).collect()))
    assert a == b
    assert len(a) == 8


def test_two_level_kmeans_degenerates_to_flat(spark):
    """VERDICT r11 #2 done-criterion: with k_coarse=1 the hierarchical
    trainer IS the flat trainer — one cell holds everything, the
    per-cell fine init equals the global md5 init, and every round's
    assignment/update is bit-identical. Pinned exactly (cluster AND
    dist)."""
    from graphkb_spark.operators.cluster import (
        kmeans_train,
        kmeans_train_two_level,
    )

    rows = [
        (i, [float((i * 7) % 5), float((i * 3) % 4), float(i % 3)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    flat = {
        r.vec_id: (int(r.cluster), r.dist)
        for r in kmeans_train(df, "vec_id", "embedding", k=5, rounds=2).collect()
    }
    two = {
        r.vec_id: (int(r.cluster), r.dist)
        for r in kmeans_train_two_level(
            df, "vec_id", "embedding", k_coarse=1, k_fine=5, rounds=2
        ).collect()
    }
    assert flat == two


def test_two_level_kmeans_contract(spark):
    """Hierarchical mode: one row per vector, clusters live in the
    flat numbering cell*k_fine+fine, separated planted blobs never
    share a cluster, and reruns are bit-identical."""
    from graphkb_spark.operators.cluster import kmeans_train_two_level

    rows = [(i, [50.0 + (i % 3) * 0.1, 0.0]) for i in range(8)] + [
        (i, [-50.0 - (i % 3) * 0.1, 1.0]) for i in range(8, 16)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = kmeans_train_two_level(
        df, "vec_id", "embedding", k_coarse=2, k_fine=2, rounds=2
    ).collect()
    assert len(out) == 16
    assert all(0 <= r.cluster < 4 for r in out)
    left = {r.cluster for r in out if r.vec_id < 8}
    right = {r.cluster for r in out if r.vec_id >= 8}
    assert not (left & right)
    rerun = kmeans_train_two_level(
        df, "vec_id", "embedding", k_coarse=2, k_fine=2, rounds=2
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, rerun))


def test_semantic_dedup_two_level_finds_planted_dups(spark):
    """semantic_dedup(assignment='two_level') keeps the dedup policy:
    a planted near-identical pair collapses keep-lowest-id; rejects
    unknown assignment modes."""
    import pytest as _pytest

    from graphkb_spark.operators.dedup import semantic_dedup

    rows = [(i, [float((i * 13) % 7), float((i * 5) % 6), 1.0]) for i in range(20)]
    rows.append((100, rows[0][1]))  # exact twin of id 0
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r.vec_id: r for r in semantic_dedup(
        df, "vec_id", "embedding", k=4, rounds=2, tau=0.999,
        assignment="two_level",
    ).collect()}
    assert len(out) == 21
    assert out[100].keep is False and out[100].dup_of == 0
    assert out[0].keep is True
    with _pytest.raises(ValueError, match="assignment"):
        semantic_dedup(df, "vec_id", "embedding", assignment="bogus")


def test_classifier_score_exact_and_empty(spark):
    """weight_sum is an exact integer, label == (weight_sum >= 0), and
    empty text scores neutral (prob 0.5, label True)."""
    from graphkb_spark.operators.text import (
        CLF_WEIGHT_SPAN,
        classifier_score,
    )

    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, ""), (3, "the the the")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in classifier_score(df, "text", "doc_id").collect()}
    assert out[2].n_tokens == 0 and out[2].weight_sum == 0
    assert out[2].prob == 0.5 and out[2].label is True
    for r in out.values():
        assert r.label == (r.weight_sum >= 0)
        assert abs(r.weight_sum) <= r.n_tokens * (CLF_WEIGHT_SPAN // 2 + 1)
    # identical tokens hash identically: doc 3 = 3x the weight of 'the'
    assert out[3].weight_sum % 3 == 0


def test_duplicate_ngram_fraction(spark):
    """Shared 5-grams across docs are flagged; unique docs score 0."""
    from graphkb_spark.operators.text import duplicate_ngram_fraction

    boiler = "all rights reserved contact us today"
    df = spark.createDataFrame(
        [
            (1, boiler + " alpha beta gamma delta epsilon zeta"),
            (2, boiler + " one two three four five six seven"),
            (3, "entirely unique words nine ten eleven twelve"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in
           duplicate_ngram_fraction(df, "text", "doc_id", shingle_n=5).collect()}
    # the two boilerplate docs share the 5-grams inside `boiler`
    assert out[1].n_dup == 2 and out[2].n_dup == 2
    assert out[1].dup_frac > 0 and out[2].dup_frac > 0
    assert out[3].n_dup == 0 and out[3].dup_frac == 0.0


def test_streaming_interval_join_matches_batch(spark):
    """The stream-stream interval join emits exactly the batch
    self-join's matches: same-user purchases within 10 minutes of a
    click, boundaries inclusive, cross-user and out-of-window pairs
    excluded."""
    from graphkb_spark.streaming.incremental import streaming_interval_join

    ts = lambda m: datetime(2024, 1, 1, 12, m, 0)
    rows = [
        # (event_id, user_id, ts, event_type, value)
        (1, 100, ts(0), "click", 1.0),
        (2, 100, ts(5), "purchase", 9.5),   # in window of 1
        (3, 100, ts(10), "purchase", 2.0),  # boundary: exactly +10min of 1
        (4, 100, ts(21), "purchase", 3.0),  # outside
        (5, 200, ts(1), "click", 1.0),
        (6, 200, ts(0), "purchase", 4.0),   # before the click -> excluded
        (7, 300, ts(2), "purchase", 5.0),   # no click for this user
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "event_type", "value"]
    )
    out = streaming_interval_join(spark, df, query_name="t_stream_ij")
    got = {(r.l_event_id, r.r_event_id) for r in out.collect()}
    assert got == {(1, 2), (1, 3)}


def test_streaming_decontaminate_matches_batch(spark):
    """The streaming decontamination gate is stateless per micro-batch
    and each doc arrives whole, so its complete output must equal the
    batch exact_substring_contamination row-for-row — including docs
    split across different micro-batches."""
    from graphkb_spark.operators.dedup import exact_substring_contamination
    from graphkb_spark.streaming.incremental import streaming_decontaminate

    corpus = spark.createDataFrame(
        [(i, f"filler w{i} the secret eval passage appears here verbatim t{i}")
         for i in range(9)]
        + [(20, "completely unrelated text about catalyst and tungsten"),
           (21, "short")],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(0, "the secret eval passage appears here verbatim")],
        ["doc_id", "text"],
    )
    batch = sorted(map(tuple, exact_substring_contamination(
        corpus, bench, "text", "doc_id", k=6, min_hits=1).collect()))
    stream = sorted(map(tuple, streaming_decontaminate(
        spark, corpus, bench, "doc_id", "text", k=6, min_hits=1,
        n_batches=3, query_name="t_stream_decon").collect()))
    assert stream == batch
    flagged = {r[0] for r in stream if r[3]}
    assert flagged == set(range(9))  # every leak caught, clean docs pass


def test_pcm_frame_energy_decodes_real_bytes(spark):
    import numpy as np

    from graphkb_spark.multimodal.binary import pcm_frame_energy

    samples = np.array([100, -100, 200, -200, 0, 50], dtype="<i2")
    rows = [
        (1, bytearray(samples.tobytes())),
        (2, bytearray(samples.tobytes() + b"\x07")),  # truncated write
        (3, bytearray(b"")),                          # empty -> no frames
        (4, None),                                    # null -> no frames
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = pcm_frame_energy(df, frame_samples=4).collect()
    got = {(r.media_id, r.frame_idx): (r.n_samples, r.energy) for r in out}
    e0 = round(float(np.sqrt((100**2 + 100**2 + 200**2 + 200**2) / 4)), 6)
    e1 = round(float(np.sqrt((0 + 50**2) / 2)), 6)
    assert got[(1, 0)] == (4, e0)
    assert got[(1, 1)] == (2, e1)       # final partial frame
    assert got[(2, 0)] == (4, e0)       # odd trailing byte dropped
    assert got[(2, 1)] == (2, e1)
    assert not [k for k in got if k[0] in (3, 4)]


def test_duplicate_ngram_fraction_null_text_explicit_contract(spark):
    """r16 (ADVICE r15): NULL text is treated as empty text — the doc
    keeps its row with the single empty shingle (n_shingles == 1)
    instead of the old explode-shape's silent drop or a
    config-dependent NULL/-1 n_shingles. Two empty-class docs (NULL
    and '') share the empty shingle, so both score as full dups."""
    from graphkb_spark.operators.text import duplicate_ngram_fraction

    df = spark.createDataFrame(
        [
            (1, "entirely unique words nine ten eleven twelve"),
            (2, None),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in
           duplicate_ngram_fraction(df, "text", "doc_id", shingle_n=5).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].n_shingles == 3 and out[1].n_dup == 0
    for d in (2, 3):
        assert out[d].n_shingles == 1
        assert out[d].n_dup == 1 and out[d].dup_frac == 1.0
