"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

Everything is built from pyspark.sql.functions (codegen'd, no UDF) so
the heuristics run at scan speed and their SQL mirrors are exact —
each has a DuckDB-expressible oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword markers for the n-gram/stopword heuristic;
# deliberately small + ASCII so the SQL oracle can replicate exactly.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "den"],
    "fr": ["le", "la", "les", "et", "est", "une", "que", "des", "pour", "dans"],
    "es": ["el", "la", "los", "que", "es", "una", "por", "con", "para", "del"],
}

TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def _words(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), " "), lambda w: w != "")


def lang_scores(col: str | Column) -> dict[str, Column]:
    """Per-language marker-hit counts (stopword heuristic)."""
    w = _words(col)
    def hits(markers: list[str]) -> Column:
        # NB: a 2-arg lambda would receive (element, index) from
        # F.filter — keep it unary and close over ``markers``.
        return F.size(F.filter(w, lambda x: x.isin(markers)))

    return {lang: hits(markers) for lang, markers in LANG_MARKERS.items()}


def lang_id(col: str | Column, min_hits: int = 1) -> Column:
    """argmax language by marker hits, 'und' when no language reaches
    ``min_hits``. Ties break by language code order (deterministic)."""
    scores = lang_scores(col)
    # array_max on structs compares field-by-field: hits first, then the
    # negative language index, so ties deterministically pick the
    # alphabetically-first language.
    idx = F.array(
        *[
            F.struct(
                scores[lang].alias("hits"),
                F.lit(-i).alias("ni"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(sorted(LANG_MARKERS))
        ]
    )
    winner = F.array_max(idx)
    return F.when(winner["hits"] >= min_hits, winner["lang"]).otherwise(F.lit("und"))


def token_count(col: str | Column) -> Column:
    """BPE-ish token count: letter runs, digit runs, and each other
    non-space char count as one token (regex shared with the oracle)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_REGEX), F.lit(0)))


def whitespace_token_count(col: str | Column) -> Column:
    return F.size(_words(col))


# deliberately simple ASCII patterns (shared verbatim with the SQL
# oracle): email, 7+-digit phone-ish runs (with separators), IPv4
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\- ]{6,}\d", "<PHONE>"),
]


def redact_pii(df: DataFrame, text_col: str, out_col: str | None = None) -> DataFrame:
    """PII scrubbing: sequential regexp_replace passes (email -> ip ->
    phone, so an IP is not half-eaten by the phone pattern) plus
    per-kind match counts — the audit trail a compliance review needs.
    Pure Column algebra at scan speed; patterns are deliberately
    simple/ASCII and shared verbatim with the SQL oracle."""
    c = F.col(text_col)
    out = df
    redacted = c
    for kind, pattern, token in PII_PATTERNS:
        out = out.withColumn(
            f"n_{kind}", F.size(F.regexp_extract_all(redacted, F.lit(pattern), F.lit(0)))
        )
        redacted = F.regexp_replace(redacted, pattern, token)
    return out.withColumn(out_col or f"{text_col}_redacted", redacted)


def repetition_features(df: DataFrame, text_col: str) -> DataFrame:
    """Within-document repetition signals (the Gopher-rule family used
    to filter degenerate training text): fraction of duplicate word
    3-grams and the most-frequent-word share. Pure Column algebra —
    the top-word count is a single ``aggregate`` pass over the sorted
    word array (max run length == max multiplicity), so the whole
    feature set runs at scan speed with no shuffle."""
    out = df.withColumn("__w", _words(text_col))
    from graphkb_spark.operators.dedup import word_shingles

    out = out.withColumn("__sh", word_shingles("__w", 3))
    total = F.size("__sh")
    distinct = F.size(F.array_distinct("__sh"))
    dup_frac = F.when(total > 0, 1 - distinct / total).otherwise(F.lit(0.0))
    top_run = F.aggregate(
        F.array_sort("__w"),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    n_words = F.size("__w")
    top_frac = F.when(n_words > 0, top_run / n_words).otherwise(F.lit(0.0))
    return out.select(
        "*",
        F.round(dup_frac, 6).alias("r_dup_3gram_frac"),
        F.round(top_frac, 6).alias("r_top_word_frac"),
    ).drop("__w", "__sh")


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio / mean-word-length
    quality features + a composite score in [0, 1]."""
    c = F.col(text_col)
    w = _words(text_col)
    n_chars = F.length(c)
    n_words = F.size(w)
    n_punct = F.size(F.regexp_extract_all(c, F.lit(r"[^A-Za-z0-9 ]"), F.lit(0)))
    en = LANG_MARKERS["en"]
    n_stop = F.size(F.filter(w, lambda x: x.isin(en)))
    mean_wl = F.when(n_words > 0, (F.length(F.concat_ws("", w)) / n_words)).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_words > 0, n_stop / n_words).otherwise(F.lit(0.0))
    score = (
        F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio * 5) * 0.3
        + F.least(stop_ratio * 5, F.lit(1.0)) * 0.3
    )
    return df.select(
        "*",
        n_chars.alias("q_chars"),
        n_words.alias("q_words"),
        F.round(punct_ratio, 6).alias("q_punct_ratio"),
        F.round(stop_ratio, 6).alias("q_stop_ratio"),
        F.round(mean_wl, 6).alias("q_mean_word_len"),
        F.round(score, 6).alias("q_score"),
    )


# hashed-linear classifier constants: bucket count and the weight-table
# recipe are part of the contract (the oracle regenerates both exactly)
CLF_BUCKETS = 1024
CLF_WEIGHT_SPAN = 2001  # weights in [-1, 1] with 1/1000 resolution


def _hash_bucket(word: Column) -> Column:
    """md5-based feature-hash bucket in [0, CLF_BUCKETS). 6 hex chars
    stay far inside int64 (the <=15-hex-char rule for conv parity)."""
    return F.conv(F.substring(F.md5(word), 1, 6), 16, 10).cast("long") % CLF_BUCKETS


def _bucket_weight(bucket: Column) -> Column:
    """Deterministic 'pretrained' INTEGER weight per bucket in
    [-1000, 1000] (milli-units): a second md5 over 'w<bucket>' — stands
    in for a fasttext-style model shipped as a lookup table; the
    arithmetic (not the training) is the operator. Integer weights keep
    the document score EXACT — a float weight sum divided by the token
    count lands on 6-decimal rounding ties (multiples of 1/(1000*n))
    where engines' round implementations legitimately disagree."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("w"), bucket.cast("string"))), 1, 6), 16, 10
    ).cast("long")
    return h % CLF_WEIGHT_SPAN - F.lit(1000)


def classifier_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Linear text classifier inference at scan speed (the
    fasttext-style quality/domain scorer large pipelines run over every
    document): feature-hash each word into CLF_BUCKETS buckets, sum the
    bucket weights, normalize by token count, squash with a sigmoid.

    Pure Column algebra — the per-word hash+weight runs inside a single
    ``aggregate`` over the materialized word array, so scoring is a
    narrow projection with NO shuffle and no UDF. A real deployment
    swaps ``_bucket_weight`` for a broadcast weight-array lookup; the
    plan shape (scan-speed map) is identical.

    Returns (id, n_tokens, weight_sum, prob, label): weight_sum is the
    exact integer milli-weight total, prob the sigmoid of the
    token-normalized score, and label == (weight_sum >= 0) — exact, no
    float comparison."""
    out = df.select(F.col(id_col), _words(text_col).alias("__w"))
    raw = F.aggregate(
        F.col("__w"),
        F.lit(0).cast("long"),
        lambda acc, x: acc + _bucket_weight(_hash_bucket(x)),
    )
    n = F.size("__w")
    margin = F.when(n > 0, raw / (F.lit(1000.0) * n)).otherwise(F.lit(0.0))
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin * 10))
    return out.select(
        F.col(id_col),
        n.alias("n_tokens"),
        raw.alias("weight_sum"),
        F.round(prob, 6).alias("prob"),
        (raw >= 0).alias("label"),
    )


def duplicate_ngram_fraction(
    df: DataFrame, text_col: str, id_col: str, shingle_n: int = 5
) -> DataFrame:
    """CROSS-document duplicate n-gram fraction (the C4/RefinedWeb
    "duplicated line/ngram" filter): for each document, the share of
    its distinct word ``shingle_n``-grams that also occur in at least
    one OTHER document. High values mark boilerplate and template spam.

    Plan (r15 rewrite — the scout put the old join-back shape at
    21.6 s vs a 1.0 s oracle at sf0.1): the per-doc shingle arrays are
    DISTINCT, so a doc's shingle is either globally UNIQUE (exactly
    one owner — recoverable as min(id) of its single row) or a dup,
    and ``n_dup = n_shingles - (globally-unique shingles the doc
    owns)``. That identity removes the stream join-back entirely: the
    tokenized doc table is staged once (checkpoint), ONE
    partial-aggregating groupBy on the exploded shingles computes
    (count, owner) per shingle — a boilerplate shingle in millions of
    docs collapses to one row per map task, so hot keys cost nothing
    and no AQE skew-split is ever needed — and everything after it
    (the unique-per-owner rollup and the fill-in join onto the staged
    doc table) is doc-sized. The corpus text is tokenized once and
    never crosses the wire; the only large exchange carries one row
    per distinct shingle. Returns (id, n_shingles, n_dup, dup_frac);
    docs shorter than ``shingle_n`` words carry their single
    whole-text shingle (n_shingles == 1), same as the oracle. NULL
    text is treated as empty text (ADVICE r15 — the explicit
    contract): such docs keep their row with the single empty
    shingle (n_shingles == 1), rather than the old explode-shape's
    silent drop or a config-dependent NULL/-1 n_shingles."""
    from graphkb_spark.core.materialize import materialize
    from graphkb_spark.operators.dedup import word_shingles, words

    base = (
        df.select(
            F.col(id_col).alias("__id"),
            words(F.coalesce(F.col(text_col), F.lit(""))).alias("__w"),
        )
        .select(
            "__id",
            F.array_distinct(word_shingles("__w", shingle_n)).alias("__sh"),
        )
        .select("__id", F.size("__sh").alias("n_shingles"), "__sh")
        .transform(materialize, eager=False)
    )
    owners = (
        base.select("__id", F.explode("__sh").alias("__s"))
        .groupBy("__s")
        .agg(
            F.count(F.lit(1)).alias("__docs"),
            F.min("__id").alias("__owner"),
        )
    )
    uniq = (
        owners.filter(F.col("__docs") == 1)
        .groupBy(F.col("__owner").alias("__id"))
        .agg(F.count(F.lit(1)).alias("__uniq"))
    )
    n_dup = F.col("n_shingles") - F.coalesce(F.col("__uniq"), F.lit(0))
    return (
        base.select("__id", "n_shingles")
        .join(uniq, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            "n_shingles",
            n_dup.alias("n_dup"),
            F.round(n_dup / F.col("n_shingles"), 6).alias("dup_frac"),
        )
    )


GOPHER_STOPWORDS = ("a", "the", "and", "of", "to", "in")


def gopher_quality_flags(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 7.0,
    max_dup_frac: float = 0.65,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher-style rule-based quality gate (Rae et al. 2021, Appendix
    A1.1): per-document word count, mean word length, duplicate-word
    fraction, and stopword fraction, each with a pass flag, plus the
    conjunction. The stopword rule follows the paper: a document must
    contain at least ``min_stop_hits`` hits from the stop list (Rae et
    al. require 2). Returns (id, n_words, mean_word_len, dup_frac,
    stop_frac, ok_words, ok_word_len, ok_dup, ok_stop, passes).

    A NARROW operator — every signal is array algebra over the split
    word list inside whole-stage codegen; zero shuffles, scan-speed at
    100 TB, and composes with a downstream filter without a
    repartition. Words split on a single space so the DuckDB oracle
    replicates byte-for-byte; fractions round to 6 digits."""
    w = F.split(F.col(text_col), " ")
    n_words = F.size(w)
    mean_wl = F.round(
        F.aggregate(w, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x))
        / n_words,
        6,
    )
    dup_frac = F.round(
        F.lit(1.0) - F.size(F.array_distinct(w)) / n_words, 6
    )
    n_stop = F.size(F.filter(w, lambda x: x.isin(*GOPHER_STOPWORDS)))
    stop_frac = F.round(n_stop / n_words, 6)
    ok_words = (n_words >= min_words) & (n_words <= max_words)
    ok_wl = (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len)
    ok_dup = dup_frac <= max_dup_frac
    ok_stop = n_stop >= min_stop_hits
    return df.filter(F.length(F.col(text_col)) > 0).select(
        F.col(id_col),
        n_words.cast("bigint").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        dup_frac.alias("dup_frac"),
        stop_frac.alias("stop_frac"),
        ok_words.alias("ok_words"),
        ok_wl.alias("ok_word_len"),
        ok_dup.alias("ok_dup"),
        ok_stop.alias("ok_stop"),
        (ok_words & ok_wl & ok_dup & ok_stop).alias("passes"),
    )


def tokenizer_fertility(
    df: DataFrame,
    group_col: str,
    text_col: str,
) -> DataFrame:
    """Per-group tokenizer fertility report: BPE-ish tokens per
    whitespace word and per 100 characters — the metric that tells a
    training-data pipeline which sources are token-expensive (code,
    tables, non-Latin scripts inflate fertility) before any GPU sees
    them. Returns (group, n_docs, n_words, n_tokens, fertility,
    tokens_per_100_chars), fertility rounded to 6 digits.

    A NARROW per-row token count (the shared TOKEN_REGEX) followed by
    one partially-aggregated shuffle on the group — scan-speed at
    100 TB, no distinct, no window."""
    c = F.col(text_col)
    per_row = df.select(
        F.col(group_col),
        whitespace_token_count(c).alias("__w"),
        token_count(c).alias("__t"),
        F.length(c).alias("__c"),
    )
    agg = per_row.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__w").cast("bigint").alias("n_words"),
        F.sum("__t").cast("bigint").alias("n_tokens"),
        F.sum("__c").cast("bigint").alias("__chars"),
    )
    return agg.select(
        group_col,
        "n_docs",
        "n_words",
        "n_tokens",
        F.round(F.col("n_tokens") / F.col("n_words"), 6).alias("fertility"),
        F.round(F.col("n_tokens") * 100.0 / F.col("__chars"), 6).alias(
            "tokens_per_100_chars"
        ),
    )
