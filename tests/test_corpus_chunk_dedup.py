"""Tests for the round-5 corpus operators: retrieval chunking,
segment-level cross-document dedup, token-budget mixture sampling, and
TF-IDF top terms."""

import pytest

from graphkb_spark.operators.corpus import chunk_documents, dedup_segments
from graphkb_spark.operators.sampling import tfidf_top_terms, token_budget_sample


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestChunkDocuments:
    def test_exact_cover_no_overlap(self, spark):
        df = _docs(spark, [(1, "abcdefghij")])  # len 10
        out = chunk_documents(df, "doc_id", "text", size=5, step=5).collect()
        assert [(r.chunk_id, r.chunk_start, r.chunk_text) for r in out] == [
            (0, 0, "abcde"),
            (1, 5, "fghij"),
        ]

    def test_overlap_and_short_tail(self, spark):
        df = _docs(spark, [(1, "abcdefgh")])  # len 8
        out = chunk_documents(df, "doc_id", "text", size=4, step=3).collect()
        # offsets 0,3,6 — tail chunk is short
        assert [(r.chunk_start, r.chunk_text, r.chunk_len) for r in out] == [
            (0, "abcd", 4),
            (3, "defg", 4),
            (6, "gh", 2),
        ]

    def test_empty_text_produces_no_chunks(self, spark):
        df = _docs(spark, [(1, ""), (2, "xy")])
        out = chunk_documents(df, "doc_id", "text", size=5, step=5).collect()
        assert [r.doc_id for r in out] == [2]

    def test_rejects_bad_params(self, spark):
        df = _docs(spark, [(1, "abc")])
        with pytest.raises(ValueError):
            chunk_documents(df, "doc_id", "text", size=0, step=5)
        with pytest.raises(ValueError):
            chunk_documents(df, "doc_id", "text", size=5, step=0)

    def test_narrow_plan_no_shuffle(self, spark):
        df = _docs(spark, [(1, "abcdefghij")])
        plan = chunk_documents(df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestDedupSegments:
    def test_first_occurrence_wins(self, spark):
        # doc 1: [a b] [c d]; doc 2: [c d] [e f] — doc 2 loses "c d"
        df = _docs(spark, [(1, "a b c d"), (2, "c d e f")])
        out = {r.doc_id: r for r in dedup_segments(df, "doc_id", "text", seg_words=2).collect()}
        assert out[1].n_segments == 2 and out[1].kept_segments == 2
        assert out[1].dedup_text == "a b c d"
        assert out[2].n_segments == 2 and out[2].kept_segments == 1
        assert out[2].dedup_text == "e f"

    def test_fully_duplicated_doc_survives_empty(self, spark):
        df = _docs(spark, [(1, "a b"), (2, "a b")])
        out = {r.doc_id: r for r in dedup_segments(df, "doc_id", "text", seg_words=2).collect()}
        assert out[2].kept_segments == 0
        assert out[2].dedup_text == ""

    def test_within_doc_repeat_also_dedups(self, spark):
        df = _docs(spark, [(1, "x y x y")])
        out = dedup_segments(df, "doc_id", "text", seg_words=2).collect()[0]
        assert out.n_segments == 2 and out.kept_segments == 1
        assert out.dedup_text == "x y"

    def test_short_tail_segment(self, spark):
        df = _docs(spark, [(1, "a b c")])  # segments: [a b], [c]
        out = dedup_segments(df, "doc_id", "text", seg_words=2).collect()[0]
        assert out.n_segments == 2 and out.dedup_text == "a b c"


class TestTokenBudgetSample:
    def test_budget_respected_and_deterministic(self, spark):
        rows = [(i, "s%d" % (i % 2), "w " * 10 + "w") for i in range(20)]
        df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
        out1 = token_budget_sample(df, "doc_id", "source", "text", 40)
        got1 = sorted((r.source, r.doc_id) for r in out1.collect())
        got2 = sorted(
            (r.source, r.doc_id)
            for r in token_budget_sample(df, "doc_id", "source", "text", 40).collect()
        )
        assert got1 == got2  # bit-deterministic rerun
        for r in out1.collect():
            assert r.cum_tokens <= 40
        # 11 tokens per doc, budget 40 -> exactly 3 docs per source
        per_src = {}
        for s, _ in got1:
            per_src[s] = per_src.get(s, 0) + 1
        assert per_src == {"s0": 3, "s1": 3}

    def test_oversize_first_doc_yields_empty_stratum(self, spark):
        df = spark.createDataFrame(
            [(1, "a", "w " * 99 + "w")], ["doc_id", "source", "text"]
        )
        assert token_budget_sample(df, "doc_id", "source", "text", 10).count() == 0


class TestTfidfTopTerms:
    def test_scores_and_ranks(self, spark):
        # "rare" appears in 1 doc, "common" in both; N=2
        df = _docs(spark, [(1, "rare common common"), (2, "common only")])
        out = tfidf_top_terms(df, "doc_id", "text", k=2).collect()
        by_key = {(r.doc_id, r.term): r for r in out}
        r1 = by_key[(1, "rare")]
        assert r1.tf == 1 and r1.doc_freq == 1 and r1.score == pytest.approx(1.5)
        c1 = by_key[(1, "common")]
        assert c1.tf == 2 and c1.doc_freq == 2 and c1.score == pytest.approx(2.0)
        # doc 1: common (2.0) ranks above rare (1.5)
        assert c1.rank == 1 and r1.rank == 2

    def test_k_limits_rows_and_tie_break(self, spark):
        df = _docs(spark, [(1, "b a c d e f")])
        out = tfidf_top_terms(df, "doc_id", "text", k=3).collect()
        assert len(out) == 3
        # all scores equal -> ties break on term asc
        assert [r.term for r in sorted(out, key=lambda r: r.rank)] == ["a", "b", "c"]


class TestBloomSegmentDedup:
    """bloom_segment_dedup (r17, Dolma/BFF shape) must match
    dedup_segments bit-for-bit: the Bloom filter prunes the plan,
    never the answer — including under filter saturation (tiny
    num_bits -> every probe a false-positive candidate) and with the
    broadcast hint off (the shuffled verify-join path)."""

    def _both(self, spark, rows, **kw):
        from graphkb_spark.operators.dedup import bloom_segment_dedup

        df = _docs(spark, rows)
        want = sorted(
            dedup_segments(df, "doc_id", "text", seg_words=2).collect()
        )
        got = sorted(
            bloom_segment_dedup(
                df, "doc_id", "text", seg_words=2, **kw
            ).collect()
        )
        assert got == want

    def test_matches_dedup_segments(self, spark):
        rows = [(1, "a b c d"), (2, "c d e f"), (3, "a b"), (4, "x y x y"),
                (5, ""), (6, "g")]
        self._both(spark, rows)

    def test_saturated_filter_still_exact(self, spark):
        # 64 bits + 3 hashes over many dup digests: near-all-ones
        # filter => everything verifies through the join, answer same
        rows = [(i, "a b c d") for i in range(1, 9)] + [(9, "u v w z")]
        self._both(spark, rows, num_bits=64)

    def test_shuffle_join_path_exact(self, spark):
        rows = [(1, "a b c d"), (2, "c d e f"), (3, "e f a b")]
        self._both(spark, rows, broadcast=False)

    def test_all_unique_corpus_empty_filter(self, spark):
        # no duplicate digests at all: the filter is all-zeros, every
        # segment takes the miss bypass, nothing joins
        rows = [(1, "a b c d"), (2, "e f g h")]
        self._both(spark, rows)

    def test_rejects_bad_params(self, spark):
        from graphkb_spark.operators.dedup import bloom_segment_dedup

        df = _docs(spark, [(1, "a b")])
        with pytest.raises(ValueError):
            bloom_segment_dedup(df, "doc_id", "text", seg_words=0)
        with pytest.raises(ValueError):
            bloom_segment_dedup(df, "doc_id", "text", num_bits=100)
