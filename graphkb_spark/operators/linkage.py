"""Probabilistic record linkage scoring (Fellegi & Sunter 1969).

The reference resolves records with deterministic preference cascades
(src/graphkb.js:convertRecordToQueryFilters and the J2 comparator);
this module is the probabilistic generalization a 100 TB entity-
resolution pipeline needs when keys are dirty: candidate pairs come
from a blocking operator (``sorted_neighborhood_pairs``, MinHash LSH),
and each pair is scored by summed field-agreement log-likelihood
ratios — log2(m/u) for agreement, log2((1-m)/(1-u)) for disagreement,
where m = P(agree | match) and u = P(agree | non-match).

Everything is pure Column algebra over the already-blocked pair table:
a NARROW per-row score at 100 TB, no shuffle beyond what blocking did.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphkb_spark.core.materialize import materialize

# (name, left column, right column, m, u)
Field = tuple[str, str, float, float]


def u_probability(df: DataFrame, col: str) -> DataFrame:
    """Estimate u = P(field agrees | random non-match pair) from the
    value-frequency distribution: u = sum_v (f_v / N)^2 — the chance
    two independent draws collide. One partial-agg shuffle on the
    value, then a scalar aggregate. Returned as a 1-row DataFrame so
    callers can collect it into ``fellegi_sunter``'s field spec."""
    freqs = df.groupBy(col).agg(F.count(F.lit(1)).alias("__f"))
    return freqs.agg(
        F.round(
            F.sum(F.col("__f") * F.col("__f"))
            / (F.sum("__f") * F.sum("__f")),
            8,
        ).alias("u")
    )


def fellegi_sunter(
    pairs: DataFrame,
    fields: list[tuple[str, str, str, float, float]],
    threshold: float = 0.0,
) -> DataFrame:
    """Score candidate pairs with Fellegi-Sunter field-agreement
    weights. ``fields`` is a list of (name, left_col, right_col, m, u);
    each field contributes log2(m/u) on agreement (null-safe equality,
    both-present), log2((1-m)/(1-u)) on disagreement when both sides
    are present, and 0 when either side is missing (a missing value is
    no evidence either way — the standard Fellegi-Sunter treatment, so
    partially-populated records are not biased toward non-match).
    Returns the input pair columns
    plus one ``agree_<name>`` flag per field, ``match_score`` (rounded
    to 6) and ``is_match`` (score > threshold on the rounded value, so
    the decision is bit-stable across engines).

    The m/u parameters are inputs, not fitted here: u comes from
    ``u_probability`` (value-collision mass), m from labeled data or
    domain judgment — the standard practice before an EM fit."""
    score: Column = F.lit(0.0)
    agree_cols = []
    for name, left, right, m, u in fields:
        if not (0.0 < m < 1.0 and 0.0 < u < 1.0):
            raise ValueError(f"field {name}: m and u must be in (0, 1)")
        lcol, rcol = F.col(left), F.col(right)
        any_missing = lcol.isNull() | rcol.isNull()
        agree = lcol.isNotNull() & lcol.eqNullSafe(rcol)
        contrib = (
            F.when(any_missing, F.lit(0.0))
            .when(agree, F.lit(math.log2(m / u)))
            .otherwise(F.lit(math.log2((1.0 - m) / (1.0 - u))))
        )
        score = score + contrib
        agree_cols.append(agree.alias(f"agree_{name}"))
    rounded = F.round(score, 6)
    return pairs.select(
        *pairs.columns,
        *agree_cols,
        rounded.alias("match_score"),
        (rounded > threshold).alias("is_match"),
    )


def fellegi_sunter_em(
    pairs: DataFrame,
    agree_cols: list[str],
    rounds: int = 2,
    m0: float = 0.9,
    u0: float = 0.1,
    p0: float = 0.5,
) -> DataFrame:
    """Unsupervised EM fit of the Fellegi-Sunter m/u parameters
    (Winkler 1988) over blocked candidate pairs with boolean
    agreement columns: E-step scores each pair's match posterior under
    the conditional-independence model, M-step re-estimates per-field
    m = P(agree|match), u = P(agree|non-match) and the match prior p.
    Fixed ``rounds`` (the iterative-operator contract), initialized
    from (m0, u0, p0). Returns one row per field: (field, m_est,
    u_est, p_est), all rounded to 9.

    Engine-determinism: per-pair posteriors are pure row-local double
    algebra (same expression tree in any engine), then ROUNDED to 9
    digits and summed as DECIMAL(38,12) — so the M-step aggregates are
    partitioning-independent and each round's parameters are
    bit-identical; the fit is oracle-checkable like kmeans_train.

    Scale shape per round: one narrow per-row projection + ONE scalar
    aggregate (partial-agg, a handful of decimal sums); parameters
    stay a 1-row broadcast. Nothing iterates over the driver."""
    if not agree_cols:
        raise ValueError("agree_cols must be non-empty")
    # pairs feed one aggregate per round — materialize the (possibly
    # expensive) blocking pipeline once. (opt r17: a conditional
    # starved-scan spread of the pairs frame was measured here —
    # 5-round interleaved A/B a wash-to-worse, min 2.198 vs 2.261 s —
    # the per-round M-step aggregate is only ~170 ms single-task at
    # sf0.1 and 32-task scheduling ate the gain; reverted. At scale
    # the frame is multi-partition and the question is moot.)
    pairs = pairs.transform(materialize, eager=False)
    # per-field agreeing-pair totals are round-invariant: one job, once
    agree_totals = pairs.agg(
        *[
            F.sum(F.col(c).cast("boolean").cast("long")).alias(c)
            for c in agree_cols
        ]
    ).collect()[0]
    m = {c: float(m0) for c in agree_cols}
    u = {c: float(u0) for c in agree_cols}
    p = float(p0)
    for _ in range(rounds):
        pm = F.lit(p)
        pu = F.lit(1.0 - p)
        for c in agree_cols:
            a = F.col(c).cast("boolean")
            pm = pm * F.when(a, F.lit(m[c])).otherwise(F.lit(1.0 - m[c]))
            pu = pu * F.when(a, F.lit(u[c])).otherwise(F.lit(1.0 - u[c]))
        w = F.round(pm / (pm + pu), 9).cast("decimal(38,12)")
        aggs = [
            F.sum(w).cast("double").alias("__sw"),
            F.count(F.lit(1)).cast("double").alias("__n"),
        ]
        for c in agree_cols:
            a = F.col(c).cast("boolean")
            aggs.append(
                F.sum(F.when(a, w).otherwise(F.lit(0).cast("decimal(38,12)")))
                .cast("double")
                .alias(f"__swa_{c}")
            )
        r = pairs.agg(*aggs).collect()[0]
        sw, cnt = r["__sw"], r["__n"]
        for c in agree_cols:
            swa = r[f"__swa_{c}"]
            m[c] = round(swa / sw, 9)
            u[c] = round((float(agree_totals[c]) - swa) / (cnt - sw), 9)
        p = round(sw / cnt, 9)
    rows = [(c, m[c], u[c], p) for c in agree_cols]
    return pairs.sparkSession.createDataFrame(
        rows, "field string, m_est double, u_est double, p_est double"
    )
