"""Similarity search over embedding columns (array<float>).

Two paths:
- ``cosine_topk``: exact brute-force top-k — the correctness baseline.
  Dot products computed JVM-side with ``zip_with``/``aggregate`` so the
  O(n*q) inner loop never leaves codegen. Intended for small query
  sets (broadcast the queries, never the corpus).
- ``lsh_topk``: random-hyperplane LSH bucketing — the 100 TB path. The
  hyperplanes are derived deterministically from xxhash64 (no RNG so
  plans are reproducible across runs/retries); candidates are fetched
  by multi-probe on the bucket key (one equi-join), then exactly
  re-ranked within buckets.
- ``ivf_topk``: IVF-style coarse quantizer built from a deterministic
  sample of the corpus as centroids; probe the ``nprobe`` nearest
  centroids per query. Same join-then-rerank shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from graphkb_spark.core.materialize import materialize


def _dot(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column | str, b: Column | str) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine: broadcast the (small) query set against
    the corpus scan; one window per query id picks the top k.

    Norms are computed ONCE per side before the join (n + m array
    aggregates), not per pair (3·n·m): per scored pair only the dot
    product remains — identical doubles in identical order, so the
    ranking is bit-stable vs the naive form, at a third of the HOF
    work. At 100 TB the per-pair saving is the whole game.

    Returns (query_id, neighbor_id, cos_sim, rank). Self-matches are
    excluded when ids collide."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            _norm(vec_col).alias("__qn"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        _norm(vec_col).alias("__cn"),
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot("__qv", "__cv") / (F.col("__qn") * F.col("__cn"))).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _ternary_sig(vec: Column | str, n_planes: int) -> Column:
    """Deterministic sparse random projection signature (Achlioptas-style
    ternary weights): plane (p, d) weight is -1 / +1 / 0 with probability
    1/4 / 1/4 / 1/2, derived from the first md5 hex nibble of "p_d" —
    bit p = sign(dot(vec, plane_p)).

    Produces an int bucket key. Pure JVM expression tree; the dimension
    is read per-row from ``size(vec)`` (no driver-side job), and because
    every step is ANSI SQL (md5 + arithmetic) an external oracle can
    replicate the bucketing exactly."""
    vec = F.col(vec) if isinstance(vec, str) else vec
    bits = []
    for p in range(n_planes):

        def weight(d: Column, p: int = p) -> Column:
            nib = F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{p}_"), d.cast("string"))), 1, 1),
                16,
                10,
            ).cast("int")
            return (
                F.when(nib < 4, F.lit(-1.0)).when(nib < 8, F.lit(1.0)).otherwise(F.lit(0.0))
            )

        dot = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda v, d: v * weight(d),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: bucket corpus and queries by sparse-projection
    signature, equi-join on the bucket, exact re-rank inside.

    At 100 TB the corpus is hashed once (scan + narrow ops), the join
    shuffles only on the small bucket key, and the window reranks
    within (query, bucket) candidates. Size ``n_planes`` so the mean
    bucket occupancy (corpus_rows / 2^n_planes) fits a rerank window:
    ~24 planes for 10^9 vectors, 8 for toy scale."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        _norm(vec_col).alias("__cn"),
        _ternary_sig(vec_col, n_planes).alias("__bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        _norm(vec_col).alias("__qn"),
        _ternary_sig(vec_col, n_planes).alias("__bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "__bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot("__qv", "__cv") / (F.col("__qn") * F.col("__cn"))).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF-style ANN: centroids = a deterministic corpus sample (ids
    hashed, lowest N — reproducible without RNG); every corpus vector is
    assigned to its nearest centroid (broadcast join against N
    centroids); each query probes its ``nprobe`` nearest centroid cells
    and reranks exactly within them."""
    cents = (
        corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
        # md5-of-id ordering: deterministic (reproducible across runs /
        # stage retries) AND ANSI-SQL so the oracle picks the same
        # centroid sample; physical plan is TakeOrderedAndProject
        .withColumn("__h", F.md5(F.col("cid").cast("string")))
        .orderBy("__h")
        .limit(n_centroids)
        .drop("__h")
    )
    # centroid norms once in the broadcast build, row norms once per
    # row: the per-(row, centroid) work is one dot product
    bc = F.broadcast(cents.withColumn("__cn", _norm("cvec")))

    def assign(df: DataFrame, idc: str, vc: str, n_take: int, out: str) -> DataFrame:
        scored = df.withColumn("__vn", _norm(vc)).crossJoin(bc).select(
            F.col(idc),
            F.col(vc),
            F.col("cid"),
            (_dot(vc, "cvec") / (F.col("__vn") * F.col("__cn"))).alias("__cs"),
        )
        w = Window.partitionBy(idc).orderBy(F.col("__cs").desc(), F.col("cid").asc())
        return (
            scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n_take)
            .select(F.col(idc), F.col(vc), F.col("cid").alias(out))
        )

    c = assign(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")),
        "neighbor_id",
        "__cv",
        1,
        "cell",
    )
    q = assign(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")),
        "query_id",
        "__qv",
        nprobe,
        "cell",
    )
    scored = (
        c.withColumn("__cn", _norm("__cv"))
        .join(F.broadcast(q.withColumn("__qn", _norm("__qv"))), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot("__qv", "__cv") / (F.col("__qn") * F.col("__cn"))).alias(
                "cos_sim"
            ),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_nprobe_tuning(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_centroids: int = 16,
) -> DataFrame:
    """IVF parameter-tuning curve: micro-averaged recall@k of
    ``ivf_topk`` for EVERY ``nprobe`` in ``1..n_centroids``, from ONE
    plan — the IVF sibling of ``lsh_band_plan`` (evaluate the whole
    config grid without re-executing the pipeline per config).

    The trick that makes one pass sufficient: a true neighbor is
    retrieved at probe width ``p`` iff the rank of its cell in the
    query's centroid ordering is <= ``p``. So compute (a) the exact
    brute-force truth set (``cosine_topk``), (b) each truth
    NEIGHBOR's cell (top-1 centroid), (c) each query's full centroid
    ranking, join, and every truth pair yields its minimal retrieving
    ``nprobe`` = cent_rank; the recall curve is a cumulative count
    over that, via a tiny explode of ``sequence(cent_rank,
    n_centroids)``.

    Scale shape: the corpus appears in exactly two broadcast-driven
    scans — the brute-force truth (the exact baseline this curve is
    measured against; queries broadcast) and a semi-join that assigns
    cells ONLY to the q*k truth neighbors (per-row argmax as a
    map-side partial agg, never a corpus x centroids window). Every
    post-truth table is q*k-sized or smaller; the config grid costs
    an explode of at most n_centroids rows per truth pair.

    Returns (nprobe, n_retrieved, n_truth, avg_recall) — micro recall
    over all truth pairs, monotone nondecreasing, reaching 1.0 at
    ``nprobe = n_centroids`` by construction."""
    cents = (
        corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
        .withColumn("__h", F.md5(F.col("cid").cast("string")))
        .orderBy("__h")
        .limit(n_centroids)
        .drop("__h")
    )
    bc = F.broadcast(cents.withColumn("__cn", _norm("cvec")))

    # materialized: consumed three times (neighbor semi-join, pair
    # join, in-plan total) — q*k rows, bounded
    truth = (
        cosine_topk(corpus, queries, vec_col, id_col, k)
        .select("query_id", "neighbor_id")
        .transform(materialize, eager=False)
    )
    # (b) cells for truth neighbors only: argmax over C centroids via
    # max(struct(cos, -cid)) — highest cos, lowest-cid tie, no window
    nbr = corpus.join(
        F.broadcast(truth.select(F.col("neighbor_id").alias(id_col)).distinct()),
        id_col,
    ).select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__nv"))
    ncell = (
        nbr.withColumn("__nn", _norm("__nv"))
        .crossJoin(bc)
        .select(
            "neighbor_id",
            F.struct(
                (_dot("__nv", "cvec") / (F.col("__nn") * F.col("__cn"))).alias("c"),
                (-F.col("cid")).alias("negid"),
            ).alias("__s"),
        )
        .groupBy("neighbor_id")
        .agg(F.max("__s").alias("__m"))
        .select("neighbor_id", (-F.col("__m.negid")).alias("cell"))
    )
    # (c) full centroid ranking per query (queries x n_centroids rows)
    qc = (
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
        )
        .withColumn("__qn", _norm("__qv"))
        .crossJoin(bc)
        .select(
            "query_id",
            F.col("cid").alias("cell"),
            (_dot("__qv", "cvec") / (F.col("__qn") * F.col("__cn"))).alias("__cs"),
        )
        .withColumn(
            "cent_rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("__cs").desc(), F.col("cell").asc()
                )
            ),
        )
        .select("query_id", "cell", "cent_rank")
    )
    pairs = truth.join(F.broadcast(ncell), "neighbor_id").join(
        F.broadcast(qc), ["query_id", "cell"]
    )
    totals = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    retrieved = (
        pairs.select(
            F.explode(
                F.sequence(F.col("cent_rank"), F.lit(n_centroids))
            ).alias("nprobe")
        )
        .groupBy("nprobe")
        .agg(F.count(F.lit(1)).alias("n_retrieved"))
    )
    grid = pairs.sparkSession.range(1, n_centroids + 1).select(
        F.col("id").cast("int").alias("nprobe")
    )
    return (
        grid.join(F.broadcast(retrieved), "nprobe", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "nprobe",
            F.coalesce("n_retrieved", F.lit(0)).alias("n_retrieved"),
            "n_truth",
            F.round(
                F.coalesce("n_retrieved", F.lit(0)) / F.col("n_truth"), 4
            ).alias("avg_recall"),
        )
        .orderBy("nprobe")
    )


def embedding_near_dups(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.8,
    n_planes: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS: bucket every vector by the
    deterministic ternary-projection signature, self-join within each
    bucket, verify with exact cosine >= ``threshold``. Returns
    (id_a, id_b, cos_sim) with id_a < id_b.

    The embedding-side member of the dedup family (exact / minhash /
    simhash / ngram are the text-side members); downstream
    ``connected_components`` collapses the pairs into canonical groups.

    Scale shape: signature is a narrow scan (no Python), the self-join
    shuffles once on the bucket key, and the quadratic term is bounded
    by bucket occupancy (corpus / 2^n_planes) — size n_planes so buckets
    stay rerank-sized, exactly like ``lsh_topk``. Recall per pair at
    angle theta is (1 - theta/pi)^n_planes — sign-LSH collision odds —
    so genuinely near-identical vectors (theta -> 0) are found with
    probability ~1 while distant pairs are never compared. For recall
    on mid-range thresholds, union the pair sets from multiple
    independent plane families (seed the signature differently) — the
    standard banding trade — at a linear cost in scans."""
    sig = _ternary_sig(vec_col, n_planes)
    base = corpus.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        _norm(vec_col).alias("__n"),
        sig.alias("__bucket"),
    )
    a = base.select(
        "__bucket",
        F.col("__id").alias("id_a"),
        F.col("__v").alias("__va"),
        F.col("__n").alias("__na"),
    )
    b = base.select(
        "__bucket",
        F.col("__id").alias("id_b"),
        F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"),
    )
    return (
        a.join(b, "__bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (_dot("__va", "__vb") / (F.col("__na") * F.col("__nb"))).alias(
                "cos_sim"
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def semantic_decontaminate(
    corpus: DataFrame,
    eval_items: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    eval_id_col: str | None = None,
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding-space eval-set decontamination: for every corpus
    document, the max cosine similarity against ANY eval item, with the
    nearest item attributed and a ``contaminated`` flag at
    ``threshold`` — the semantic sibling of the n-gram decontamination
    family (``exact_substring_contamination`` catches verbatim leaks;
    this catches paraphrased/templated ones the way modern pipeline
    audits do).

    Scale shape (the production case: eval suites are KB-MB, the
    corpus is the 100 TB side): the eval side is broadcast with norms
    precomputed ONCE, the corpus is scanned once, and the per-doc
    argmax is a partial aggregation — map-side combine reduces the
    n*m scored pairs to ONE row per corpus doc before the only
    exchange. No window over the pair set (a window would sort-shuffle
    all n*m rows); the argmax rides max(struct(cos, -eval_id)), whose
    lexicographic struct order gives highest-cos / lowest-eval-id-tie
    determinism.

    Returns (doc_id, nearest_eval_id, max_cos, contaminated) for every
    corpus doc — the report shape; callers filter the flag to cut.
    Threshold compares the UNROUNDED double; ``max_cos`` is rounded to
    4 places for stable cross-engine hashing."""
    eval_id_col = eval_id_col or id_col
    q = F.broadcast(
        eval_items.select(
            F.col(eval_id_col).cast("long").alias("__eid"),
            F.col(vec_col).alias("__qv"),
            _norm(vec_col).alias("__qn"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.col(vec_col).alias("__cv"),
        _norm(vec_col).alias("__cn"),
    )
    scored = c.crossJoin(q).select(
        "doc_id",
        F.struct(
            (_dot("__qv", "__cv") / (F.col("__qn") * F.col("__cn"))).alias("c"),
            (-F.col("__eid")).alias("negid"),
        ).alias("__s"),
    )
    best = scored.groupBy("doc_id").agg(F.max("__s").alias("__m"))
    return best.select(
        "doc_id",
        (-F.col("__m.negid")).alias("nearest_eval_id"),
        F.round("__m.c", 4).alias("max_cos"),
        (F.col("__m.c") >= F.lit(threshold)).alias("contaminated"),
    )


def _int_dot(a: Column | str, b: Column | str) -> Column:
    """Exact BIGINT dot product of two int-array columns — integer
    arithmetic, so the result is bit-identical in any engine."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("bigint") * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    m: int | None = None,
) -> DataFrame:
    """Quantize-then-rerank ANN — the memory/IO scale path the int8
    quantizer exists for: candidate generation scans the 4x-smaller
    int8 vectors with EXACT integer dot products (cosine over the
    quantized vectors: qdot / (|qa| * |qb|), all from BIGINT sums, so
    candidate ranking is bit-deterministic across engines), then the
    top ``m`` (default 3k) candidates per query are re-ranked with
    full-precision cosine and the top k emitted.

    At corpus scale the full-precision column lives in a separate
    (colder) table and only the m survivors join back to it — and the
    plan enforces that: ONLY (query_id, neighbor_id, approx) flow
    through the top-m cut (24-byte rows, and Spark's WindowGroupLimit
    prunes to m per query map-side before the exchange), never the
    float vectors. The m*|queries| survivors are then BROADCAST back
    onto the corpus for the full-precision rerank, so the wide vector
    column is touched by exactly one scan-side hash join, and the
    final top-k window sorts m*|queries| rows."""
    m = m or 3 * k
    c = quantize_embeddings(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")),
        "__cv",
    ).select("neighbor_id", "__cv", F.col("qvec").alias("__cq"))
    q = quantize_embeddings(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")),
        "__qv",
    ).select("query_id", "__qv", F.col("qvec").alias("__qq"))
    # self-norms are per-ROW constants: compute once per side BEFORE
    # the join rather than per candidate pair (3x fewer array
    # traversals inside the join's hot loop)
    c = c.withColumn("__cnorm", F.sqrt(_int_dot("__cq", "__cq")))
    q = q.withColumn("__qnorm", F.sqrt(_int_dot("__qq", "__qq")))
    approx = _int_dot("__cq", "__qq") / (F.col("__cnorm") * F.col("__qnorm"))
    cand = (
        c.select("neighbor_id", "__cq", "__cnorm")
        .crossJoin(F.broadcast(q.select("query_id", "__qq", "__qnorm")))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", approx.alias("__approx"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__approx").desc(), F.col("neighbor_id").asc()
    )
    topm = (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= m)
        .select("query_id", "neighbor_id")
    )
    # survivors are m*|queries| rows — attach the (equally tiny) query
    # vectors to them first, then ONE broadcast hash join puts the pair
    # list onto the corpus scan: no corpus shuffle, one broadcast build
    rer = (
        c.select("neighbor_id", "__cv")
        .join(
            F.broadcast(topm.join(q.select("query_id", "__qv"), "query_id")),
            "neighbor_id",
        )
        .select("query_id", "neighbor_id", cosine("__qv", "__cv").alias("cos_sim"))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return rer.withColumn("rank", F.row_number().over(w2)).filter(F.col("rank") <= k)


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    bits_max: int = 127,
) -> DataFrame:
    """Symmetric int8 quantization of an embedding column: per-vector
    scale = max|x| / 127, q_i = round(x_i / scale).

    The scale path for ANN at corpus size: candidate generation runs on
    the 4x-smaller int8 vectors (dot products in integer arithmetic),
    rerank on the full-precision column — the standard
    quantize-then-rerank memory/IO trade. Adds ``qvec``
    (array<int>), ``qscale``, and ``recon_err`` (max absolute
    dequantization error, bounded by scale/2). Pure Column algebra —
    higher-order functions only, no UDF, ANSI-replicable."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    out = df.withColumn("__v", v).withColumn(
        "qscale",
        F.greatest(F.array_max(F.transform(F.col("__v"), F.abs)), F.lit(1e-12))
        / F.lit(float(bits_max)),
    )
    out = out.withColumn(
        "qvec",
        F.transform(F.col("__v"), lambda x: F.round(x / F.col("qscale")).cast("int")),
    ).withColumn(
        "recon_err",
        F.array_max(
            F.zip_with(
                F.col("__v"), F.col("qvec"),
                lambda x, q: F.abs(x - q * F.col("qscale")),
            )
        ),
    )
    return out.drop("__v")


def gram_matrix_quantized(
    df: DataFrame,
    vec_col: str = "embedding",
    bits_max: int = 127,
    upper_only: bool = True,
) -> DataFrame:
    """Gram matrix X^T X over the int8-QUANTIZED embedding column — the
    PCA/whitening prep pass, computed as exact int64 arithmetic so the
    result is bit-deterministic in any engine (a float Gram depends on
    summation order; quantize-first removes FP from the reduction
    entirely, the same trick the fixed-point pagerank uses). Returns
    (i, j, s) long-format entries, i <= j when ``upper_only``.

    Scale shape — the mergeable-accumulator pattern: ``mapInPandas``
    emits one PARTIAL Gram per Arrow batch (numpy ``q.T @ q`` in int64,
    d*(d+1)/2 rows), and a single partial-aggregating groupBy on (i, j)
    merges them — the shuffle carries only
    O(partitions * d^2) accumulator rows, never the vectors. This is
    the canonical shape for any mergeable matrix/sketch accumulator the
    built-in aggregates can't express (the Python boundary is per
    BATCH, not per row)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    q = quantize_embeddings(df, vec_col=vec_col, bits_max=bits_max).select("qvec")
    schema = T.StructType(
        [
            T.StructField("i", T.IntegerType()),
            T.StructField("j", T.IntegerType()),
            T.StructField("s", T.LongType()),
        ]
    )

    def partial_gram(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.array(pdf["qvec"].tolist(), dtype=np.int64)
            g = m.T @ m
            d = g.shape[0]
            iu = np.triu_indices(d) if upper_only else tuple(
                np.indices((d, d)).reshape(2, -1)
            )
            yield pd.DataFrame({"i": iu[0], "j": iu[1], "s": g[iu]})

    return (
        q.mapInPandas(partial_gram, schema=schema)
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
    )


def project_quantized(
    df: DataFrame,
    components: list[list[int]],
    vec_col: str = "embedding",
    bits_max: int = 127,
) -> DataFrame:
    """Project the int8-QUANTIZED embeddings onto integer component
    vectors — the apply-side of the Gram/PCA pipeline
    (``gram_matrix_quantized`` builds X^T X; an offline eigensolver
    produces components; this operator materializes the projected
    features). Integer dot products are exact, so the projection is
    bit-deterministic in any engine — no pairwise-vs-sequential float
    summation drift. Adds ``p0..p{k-1}`` (int64) per row.

    Narrow Column algebra: each projection is one
    ``aggregate(zip_with(...))`` over the quantized vector against a
    LITERAL component array — zero shuffles, scan-speed, composes with
    a downstream filter or ANN bucketing without a repartition."""
    q = quantize_embeddings(df, vec_col=vec_col, bits_max=bits_max)
    out = q
    for k, comp in enumerate(components):
        lit_comp = F.array(*[F.lit(int(x)).cast("long") for x in comp])
        dot = F.aggregate(
            F.zip_with(F.col("qvec"), lit_comp, lambda a, b: a.cast("long") * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        out = out.withColumn(f"p{k}", dot)
    return out


def hard_negative_mining(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    k: int = 10,
) -> DataFrame:
    """Hard-NEGATIVE mining for contrastive training: for each query
    (anchor), the top-k most-similar corpus vectors with a DIFFERENT
    label — the near-misses that teach a contrastive model the most
    (random negatives are trivially separable). Returns (query_id,
    query_label, neighbor_id, neighbor_label, cos_sim, rank).

    Same scale shape as ``cosine_topk``: the anchor set broadcasts
    against ONE corpus scan, the label constraint filters before the
    ranking window (WindowGroupLimit keeps k per anchor map-side). At
    corpus scale swap the scan for the quantized/IVF candidate path —
    the constraint composes the same way."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(label_col).alias("query_label"),
            F.col(vec_col).alias("__qv"),
            _norm(vec_col).alias("__qn"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neighbor_label"),
        F.col(vec_col).alias("__cv"),
        _norm(vec_col).alias("__cn"),
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .filter(F.col("neighbor_label") != F.col("query_label"))
        .select(
            "query_id",
            "query_label",
            "neighbor_id",
            "neighbor_label",
            (_dot("__qv", "__cv") / (F.col("__qn") * F.col("__cn"))).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def embedding_dim_stats(
    df: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-DIMENSION statistics of an embedding column — the whitening
    / feature-health diagnostic (a dead dimension has ~zero variance;
    a scale-skewed one dominates distances): (dim, mean, std, min,
    max) with decimal-exact moments, so the numbers are identical in
    any engine regardless of aggregation order (the
    ``grouped_outliers`` discipline applied per dimension).

    Scale shape: one ``posexplode`` (rows x d — a projection, no
    shuffle) into ONE partial-aggregating groupBy on the dimension
    index; the shuffle carries d x partitions partial rows, never the
    vectors."""
    v = F.posexplode(F.col(vec_col))
    base = df.select(v.alias("dim", "__x")).select(
        "dim", F.col("__x").cast("double").alias("__x")
    )
    n = F.count(F.lit(1)).cast("double")
    return (
        base.groupBy("dim")
        .agg(
            (F.sum(F.col("__x").cast("decimal(38,10)")).cast("double") / n).alias("__mu"),
            (
                F.sum((F.col("__x") * F.col("__x")).cast("decimal(38,10)")).cast(
                    "double"
                )
                / n
            ).alias("__ex2"),
            F.round(F.min("__x"), 6).alias("min"),
            F.round(F.max("__x"), 6).alias("max"),
        )
        .select(
            "dim",
            F.round(F.col("__mu"), 6).alias("mean"),
            F.round(
                F.sqrt(F.col("__ex2") - F.col("__mu") * F.col("__mu")), 6
            ).alias("std"),
            "min",
            "max",
        )
    )


def rrf_fuse(
    rankings: list[tuple[str, DataFrame, str]],
    id_col: str,
    k: int = 60,
    per_list: int = 100,
    top_n: int = 50,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) — the
    standard hybrid-retrieval combiner: given N scored rankings of the
    same id space (lexical BM25, embedding cosine, ...), fuse them as
    sum over lists of 1 / (k + rank). Rank, not score, so the lists
    need no calibration against each other. ``rankings`` is a list of
    (list_name, df, score_col); returns (id, rrf_score, n_lists) for
    the fused top ``top_n``, ties broken by id.

    Scale shape: each input list is cut to its top ``per_list`` by a
    distributed orderBy().limit() (TakeOrdered — per-partition top-N,
    then a bounded merge; no global sort, no unpartitioned window over
    the corpus). Only then are ranks assigned, with a window
    PARTITIONED by list name over at most N x per_list rows. The
    corpus-scale work stays in the upstream scorers; fusion itself is
    constant-size."""
    parts = []
    for name, df, score_col in rankings:
        parts.append(
            df.select(
                F.col(id_col).alias("__id"),
                F.col(score_col).cast("double").alias("__s"),
            )
            .orderBy(F.col("__s").desc(), F.col("__id").asc())
            .limit(per_list)
            .select("__id", "__s", F.lit(name).alias("__src"))
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    w = Window.partitionBy("__src").orderBy(
        F.col("__s").desc(), F.col("__id").asc()
    )
    ranked = u.withColumn("__rk", F.row_number().over(w))
    fused = ranked.groupBy("__id").agg(
        F.round(F.sum(F.lit(1.0) / (F.lit(k) + F.col("__rk"))), 6).alias(
            "rrf_score"
        ),
        F.count(F.lit(1)).alias("n_lists"),
    )
    return (
        fused.orderBy(F.col("rrf_score").desc(), F.col("__id").asc())
        .limit(top_n)
        .select(F.col("__id").alias(id_col), "rrf_score", "n_lists")
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.25,
    max_df_frac: float = 0.5,
) -> DataFrame:
    """Sparse lexical all-pairs similarity: TF-IDF vectors compared by
    cosine through an INVERTED INDEX — the lexical sibling of the
    embedding near-dup path, and the classic "all pairs similarity
    search" shape (Bayardo et al. 2007): documents only meet on terms
    they share, so the join is term-keyed, never all-pairs.

    Weights: w = tf * ln(1 + N/df), L2-normalized per document over
    the KEPT vocabulary; cosine = sum of products of shared-term
    normalized weights. Terms in more than ``max_df_frac`` of
    documents are dropped (stop-term pruning — they contribute little
    weight but quadratic join fan-out), as are single-document terms
    (they cannot produce a pair). Returns (id_a, id_b, cos_sim)
    with id_a < id_b and round(cos_sim, 6) >= threshold — the
    threshold applies to the ROUNDED value so the boundary decision is
    bit-stable across engines.

    Scale shape: tokenize + tf (one keyed shuffle), df + doc norms
    (two partial-agg shuffles over bounded outputs), then the posting
    self-join keyed on term with partial-agg pair accumulation. Hot
    terms are pruned by max_df_frac; residual skew is AQE's skew-join
    territory. This is the exact plan DISC all-pairs systems use at
    corpus scale."""
    words = F.filter(
        F.split(
            F.regexp_replace(F.lower(F.trim(F.col(text_col))), "[^a-z0-9 ]", " "),
            " ",
        ),
        lambda x: x != "",
    )
    tok = df.select(F.col(id_col).alias("__id"), F.explode(words).alias("__t"))
    # tf feeds three consumers (df counts, weights, norms); without a
    # checkpoint each branch re-tokenizes the corpus — at 100 TB that
    # is three full scans instead of one materialization
    tf = (
        tok.groupBy("__id", "__t")
        .agg(F.count(F.lit(1)).alias("__tf"))
        .transform(materialize, eager=False)
    )
    n_docs = df.select(F.countDistinct(F.col(id_col)).alias("__N"))
    dfreq = tf.groupBy("__t").agg(F.count(F.lit(1)).alias("__df"))
    kept = (
        dfreq.crossJoin(F.broadcast(n_docs))
        .filter(
            (F.col("__df") >= 2)
            & (F.col("__df") <= F.lit(max_df_frac) * F.col("__N"))
        )
        .select("__t", "__df", "__N")
    )
    w = (
        tf.join(kept, "__t")
        .select(
            "__id",
            "__t",
            (
                F.col("__tf")
                * F.log(F.lit(1.0) + F.col("__N") / F.col("__df"))
            ).alias("__w"),
        )
    )
    norms = w.groupBy("__id").agg(F.sqrt(F.sum(F.col("__w") * F.col("__w"))).alias("__n"))
    # the posting list is self-joined; checkpoint so both sides read
    # ONE materialization instead of re-running the weight pipeline
    wn = (
        w.join(norms, "__id")
        .select("__t", "__id", (F.col("__w") / F.col("__n")).alias("__wn"))
        .transform(materialize, eager=False)
    )
    a = wn.select(
        F.col("__t"), F.col("__id").alias("id_a"), F.col("__wn").alias("__wa")
    )
    b = wn.select(
        F.col("__t"), F.col("__id").alias("id_b"), F.col("__wn").alias("__wb")
    )
    return (
        a.join(b, "__t")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.round(F.sum(F.col("__wa") * F.col("__wb")), 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def mmr_rerank(
    candidates: DataFrame,
    query_col: str = "query_id",
    id_col: str = "neighbor_id",
    rel_col: str = "rel",
    vec_col: str = "vec",
    k: int = 5,
    lam: float = 0.7,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998) — the standard diversity pass over a retrieval candidate
    list: greedily pick argmax of lam * relevance - (1 - lam) *
    max-similarity-to-already-selected, so near-duplicate hits don't
    crowd the top-k. Returns (query, id, rank, mmr_score), rank
    1..k, score rounded to 6, ties to the smaller id.

    Scale shape: the greedy loop is INHERENTLY k sequential steps, but
    each step is DataFrame-parallel across ALL queries at once.  The
    max-similarity-to-selected term is maintained INCREMENTALLY
    (round 17, guide §2.4): each remaining row carries ``__ms`` — its
    running max similarity to everything selected so far — and a step
    only joins the remaining rows against the ONE newly picked row per
    query (``greatest`` of the old ``__ms`` and the similarity to the
    new pick equals the max over the whole selected set), instead of
    re-scoring remaining x selected and re-aggregating.  That is one
    1:1 join + one window argmax per step — the per-step groupBy
    exchange, second join and anti-join of the original shape are
    gone, and per-step work is O(remaining), not O(remaining x step).
    Candidate lists are bounded (they come from a top-m retrieval), so
    per-step state is queries x m rows; the frame checkpoints per step
    to keep plans flat. Nothing ever collects."""
    if k < 1 or not 0.0 <= lam <= 1.0:
        raise ValueError("k >= 1 and 0 <= lam <= 1 required")
    # norms computed once at the materialization boundary: every one of
    # the k steps reuses them instead of re-deriving per candidate pair
    remaining = candidates.select(
        F.col(query_col).alias("__q"),
        F.col(id_col).alias("__id"),
        F.col(rel_col).cast("double").alias("__rel"),
        F.col(vec_col).alias("__v"),
        _norm(vec_col).alias("__vn"),
        F.lit(None).cast("double").alias("__ms"),
    ).transform(materialize, eager=False)
    picks = []
    for step in range(1, k + 1):
        # __ms is NULL until the first pick; mmr degrades to lam*rel
        scored = remaining.withColumn(
            "__mmr",
            F.lit(lam) * F.col("__rel")
            - F.when(
                F.col("__ms").isNotNull(), F.lit(1.0 - lam) * F.col("__ms")
            ).otherwise(F.lit(0.0)),
        )
        w = Window.partitionBy("__q").orderBy(
            F.col("__mmr").desc(), F.col("__id").asc()
        )
        pick = (
            scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("__q", "__id", "__mmr", "__v", "__vn")
            .transform(materialize, eager=False)
        )
        picks.append(
            pick.select(
                "__q", "__id", F.lit(step).alias("rank"),
                F.round("__mmr", 6).alias("mmr_score"),
            )
        )
        if step == k:
            break
        # 1:1 join against the single new pick per query: drop the
        # picked row, fold its similarity into the running max
        # (greatest ignores the initial NULL __ms)
        sel = pick.select(
            "__q",
            F.col("__id").alias("__pid"),
            F.col("__v").alias("__sv"),
            F.col("__vn").alias("__svn"),
        )
        remaining = (
            remaining.join(sel, "__q")
            .filter(F.col("__id") != F.col("__pid"))
            .select(
                "__q", "__id", "__rel", "__v", "__vn",
                F.greatest(
                    F.col("__ms"),
                    _dot("__v", "__sv") / (F.col("__vn") * F.col("__svn")),
                ).alias("__ms"),
            )
            .transform(materialize, eager=False)
        )
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out.select(
        F.col("__q").alias(query_col),
        F.col("__id").alias(id_col),
        "rank",
        "mmr_score",
    )
