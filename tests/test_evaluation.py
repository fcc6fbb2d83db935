"""Tests for operators/evaluation.py — the statistical-evaluation
family (categorical dependence, KS drift, Mann-Whitney AUC,
calibration bins, weight diagnostics) plus the _prefix_counts
two-phase global running sum they ride on.

Strategy (VERDICT r9 #3): property tests against closed forms /
brute force on small fixtures, partition invariance for the
order-statistics plumbing, and the degenerate edges (all ties,
single class, one dominating weight). max_examples stays small —
every example is a Spark job.
"""

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


# ---------------------------------------------------------------- #
# _prefix_counts: the bucketed global running sum                   #
# ---------------------------------------------------------------- #

@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.tuples(st.integers(-50, 50), st.integers(0, 9),
                       st.integers(0, 9)),
             min_size=1, max_size=60, unique_by=lambda t: t[0]),
    st.integers(1, 7),
    st.integers(1, 6),
)
def test_prefix_counts_partition_invariant(spark, rows, n_buckets, parts):
    """cum_<c> equals the brute-force inclusive running sum in order
    of the order column, for ANY bucket count and ANY incoming
    partitioning — the sampled repartitionByRange boundaries shape
    only the plan, never the sums."""
    from graphkb_spark.operators.evaluation import _prefix_counts

    df = spark.createDataFrame(rows, ["v", "a", "b"]).repartition(parts)
    got = {
        r.v: (r.cum_a, r.cum_b)
        for r in _prefix_counts(df, "v", ["a", "b"], n_buckets).collect()
    }
    ca = cb = 0
    want = {}
    for v, a, b in sorted(rows):
        ca, cb = ca + a, cb + b
        want[v] = (ca, cb)
    assert got == want


def test_prefix_counts_single_value(spark):
    """One distinct order value: every bucket but one is empty; the
    running sum is just the value's own total."""
    from graphkb_spark.operators.evaluation import _prefix_counts

    df = spark.createDataFrame([(1.0, 3), (1.0, 4)], ["v", "c"])
    agg = df.groupBy("v").agg(F.sum("c").alias("c"))
    [row] = _prefix_counts(agg, "v", ["c"], 8).collect()
    assert row.cum_c == 7


# ---------------------------------------------------------------- #
# categorical_dependence vs dense contingency closed form            #
# ---------------------------------------------------------------- #

def _dense_dependence(pairs):
    """Brute-force MI / chi2 / entropies over the DENSE contingency
    table (zero cells included in chi2 via their expected mass)."""
    from collections import Counter

    n = len(pairs)
    cxy = Counter(pairs)
    cx = Counter(x for x, _ in pairs)
    cy = Counter(y for _, y in pairs)
    hx = -sum((c / n) * math.log(c / n) for c in cx.values())
    hy = -sum((c / n) * math.log(c / n) for c in cy.values())
    mi = sum(
        (o / n) * math.log(o * n / (cx[x] * cy[y]))
        for (x, y), o in cxy.items()
    )
    chi2 = 0.0
    for x in cx:
        for y in cy:
            e = cx[x] * cy[y] / n
            o = cxy.get((x, y), 0)
            chi2 += (o - e) ** 2 / e
    return n, len(cx), len(cy), hx, hy, mi, chi2


@settings(max_examples=6, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 2)),
                min_size=2, max_size=80))
def test_categorical_dependence_matches_dense(spark, pairs):
    """The sparse-table rearrangement (sum over observed cells of
    ((o-e)^2/e - e), plus n) equals the dense chi2 that walks every
    (x, y) cell including zeros; MI and entropies match too."""
    from graphkb_spark.operators.evaluation import categorical_dependence

    df = spark.createDataFrame(
        [(f"x{a}", f"y{b}") for a, b in pairs], ["xc", "yc"]
    )
    [r] = categorical_dependence(df, "xc", "yc").collect()
    n, kx, ky, hx, hy, mi, chi2 = _dense_dependence(
        [(f"x{a}", f"y{b}") for a, b in pairs]
    )
    assert (r.n, r.card_x, r.card_y) == (n, kx, ky)
    assert r.h_x == pytest.approx(hx, abs=2e-6)
    assert r.h_y == pytest.approx(hy, abs=2e-6)
    assert r.mi == pytest.approx(mi, abs=2e-6)
    assert r.chi2 == pytest.approx(chi2, abs=2e-4)
    if hx > 1e-9 and hy > 1e-9:
        assert r.nmi == pytest.approx(mi / math.sqrt(hx * hy), abs=2e-6)
    else:
        assert r.nmi is None
    mind = min(kx, ky) - 1
    if mind > 0:
        assert r.cramers_v == pytest.approx(
            math.sqrt(max(chi2, 0.0) / (n * mind)), abs=2e-5
        )
    assert r.dof == (kx - 1) * (ky - 1)


def test_categorical_dependence_nulls_are_a_level(spark):
    """NULL categories count as a regular level, not dropped rows."""
    from graphkb_spark.operators.evaluation import categorical_dependence

    df = spark.createDataFrame(
        [("a", "p"), (None, "p"), ("a", None), (None, None)],
        ["xc", "yc"],
    )
    [r] = categorical_dependence(df, "xc", "yc").collect()
    assert r.n == 4 and r.card_x == 2 and r.card_y == 2


def test_categorical_dependence_independent_is_zero(spark):
    """A perfectly independent (product) table: MI == 0, chi2 == 0."""
    from graphkb_spark.operators.evaluation import categorical_dependence

    rows = [(f"x{i}", f"y{j}") for i in range(3) for j in range(4)] * 5
    df = spark.createDataFrame(rows, ["xc", "yc"])
    [r] = categorical_dependence(df, "xc", "yc").collect()
    assert r.mi == pytest.approx(0.0, abs=1e-6)
    assert r.chi2 == pytest.approx(0.0, abs=1e-4)
    assert r.cramers_v == pytest.approx(0.0, abs=1e-5)


# ---------------------------------------------------------------- #
# KS two-sample vs brute-force ECDF sup                             #
# ---------------------------------------------------------------- #

def _brute_ks(a_vals, b_vals):
    na, nb = len(a_vals), len(b_vals)
    best, at = -1, None
    for v in sorted(set(a_vals) | set(b_vals)):
        d = abs(sum(1 for x in a_vals if x <= v) * nb
                - sum(1 for x in b_vals if x <= v) * na)
        if d > best:
            best, at = d, v
    return best / (na * nb), at


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.integers(0, 15), min_size=1, max_size=40),
    st.lists(st.integers(0, 15), min_size=1, max_size=40),
    st.integers(1, 5),
)
def test_ks_matches_bruteforce(spark, avals, bvals, n_buckets):
    """D and its smallest attaining value match the literal ECDF sup
    over every distinct value, at any bucket count."""
    from graphkb_spark.operators.evaluation import ks_two_sample

    df = spark.createDataFrame(
        [("a", float(v)) for v in avals] + [("b", float(v)) for v in bvals],
        ["grp", "val"],
    )
    [r] = ks_two_sample(df, "grp", "val", "a", "b",
                        n_buckets=n_buckets).collect()
    d, at = _brute_ks(avals, bvals)
    assert (r.n_a, r.n_b) == (len(avals), len(bvals))
    assert r.d_stat == pytest.approx(d, abs=1e-6)
    assert r.at_value == pytest.approx(at, abs=1e-6)


def test_ks_ignores_null_values(spark):
    """ADVICE r10: NULL observations must not enter the ECDF (engines
    disagree on NULL sort position, and a NULL has no place in a
    distribution statistic) — result is identical to the NULL-free
    sample."""
    from graphkb_spark.operators.evaluation import ks_two_sample

    clean = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 2.0), ("b", 9.0)]
    noisy = clean + [("a", None), ("b", None), ("b", None)]
    df_c = spark.createDataFrame(clean, ["grp", "val"])
    df_n = spark.createDataFrame(noisy, ["grp", "val"])
    [rc] = ks_two_sample(df_c, "grp", "val", "a", "b").collect()
    [rn] = ks_two_sample(df_n, "grp", "val", "a", "b").collect()
    assert (rn.n_a, rn.n_b, rn.d_stat, rn.at_value) == (
        rc.n_a, rc.n_b, rc.d_stat, rc.at_value
    )


def test_ks_identical_samples_is_zero(spark):
    """Same values in both groups -> D == 0 (all-ties edge); the
    argmax tie-break picks the smallest value."""
    from graphkb_spark.operators.evaluation import ks_two_sample

    rows = [(g, float(v)) for g in ("a", "b") for v in (1, 2, 2, 5)]
    [r] = ks_two_sample(
        spark.createDataFrame(rows, ["grp", "val"]), "grp", "val", "a", "b"
    ).collect()
    assert r.d_stat == 0.0
    assert r.at_value == 1.0


def test_ks_disjoint_samples_is_one(spark):
    from graphkb_spark.operators.evaluation import ks_two_sample

    rows = [("a", 1.0), ("a", 2.0), ("b", 10.0), ("b", 11.0)]
    [r] = ks_two_sample(
        spark.createDataFrame(rows, ["grp", "val"]), "grp", "val", "a", "b"
    ).collect()
    assert r.d_stat == 1.0
    assert r.at_value == 2.0


def test_ks_ignores_other_groups(spark):
    """Rows outside groups a/b contribute nothing."""
    from graphkb_spark.operators.evaluation import ks_two_sample

    rows = [("a", 1.0), ("b", 1.0), ("c", 99.0), ("d", -99.0)]
    [r] = ks_two_sample(
        spark.createDataFrame(rows, ["grp", "val"]), "grp", "val", "a", "b"
    ).collect()
    assert (r.n_a, r.n_b, r.d_stat) == (1, 1, 0.0)


# ---------------------------------------------------------------- #
# Mann-Whitney AUC vs pair-counting closed form                     #
# ---------------------------------------------------------------- #

def _brute_auc(scored):
    pos = [s for y, s in scored if y == 1]
    neg = [s for y, s in scored if y == 0]
    if not pos or not neg:
        return None
    wins = sum(1.0 for p in pos for q in neg if p > q)
    ties = sum(1.0 for p in pos for q in neg if p == q)
    return (wins + 0.5 * ties) / (len(pos) * len(neg))


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 1), st.integers(-5, 5)),
             min_size=2, max_size=60),
    st.integers(1, 5),
)
def test_auc_matches_pair_counting(spark, scored, n_buckets):
    """The midrank identity equals literal pair counting with half
    credit for ties — the definition of Mann-Whitney AUC."""
    from graphkb_spark.operators.evaluation import auc_mann_whitney

    df = spark.createDataFrame(
        [(y, float(s)) for y, s in scored], ["y", "s"]
    )
    [r] = auc_mann_whitney(df, "y", "s", n_buckets=n_buckets).collect()
    want = _brute_auc(scored)
    npos = sum(1 for y, _ in scored if y == 1)
    assert (r.n_pos, r.n_neg) == (npos, len(scored) - npos)
    if want is None:
        assert r.auc is None
    else:
        assert r.auc == pytest.approx(want, abs=1e-6)


def test_auc_single_class_is_null(spark):
    from graphkb_spark.operators.evaluation import auc_mann_whitney

    df = spark.createDataFrame([(1, 0.2), (1, 0.9)], ["y", "s"])
    [r] = auc_mann_whitney(df, "y", "s").collect()
    assert (r.n_pos, r.n_neg, r.auc) == (2, 0, None)


def test_auc_all_tied_scores_is_half(spark):
    from graphkb_spark.operators.evaluation import auc_mann_whitney

    df = spark.createDataFrame(
        [(y, 0.5) for y in (0, 1, 0, 1, 1)], ["y", "s"]
    )
    [r] = auc_mann_whitney(df, "y", "s").collect()
    assert r.auc == pytest.approx(0.5, abs=1e-9)


def test_auc_excludes_null_label_or_score(spark):
    from graphkb_spark.operators.evaluation import auc_mann_whitney

    df = spark.createDataFrame(
        [(1, 0.9), (0, 0.1), (None, 0.5), (1, None)],
        "y int, s double",
    )
    [r] = auc_mann_whitney(df, "y", "s").collect()
    assert (r.n_pos, r.n_neg, r.auc) == (1, 1, 1.0)


# ---------------------------------------------------------------- #
# calibration_bins vs brute force                                   #
# ---------------------------------------------------------------- #

@settings(max_examples=6, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 1), st.integers(0, 1000)),
                min_size=1, max_size=80),
       st.integers(1, 12))
def test_calibration_bins_match_bruteforce(spark, scored, n_bins):
    from graphkb_spark.operators.evaluation import calibration_bins

    rows = [(y, p / 1000.0) for y, p in scored]
    df = spark.createDataFrame(rows, ["y", "p"])
    got = {r.bin: r for r in
           calibration_bins(df, "y", "p", n_bins=n_bins).collect()}
    bins = {}
    for y, p in rows:
        b = min(max(int(math.floor(p * n_bins)), 0), n_bins - 1)
        bins.setdefault(b, []).append((y, p))
    assert set(got) == set(bins)
    total = len(rows)
    for b, members in bins.items():
        n = len(members)
        mean_p = sum(p for _, p in members) / n
        frac = sum(y for y, _ in members) / n
        assert got[b].n == n
        assert got[b].mean_prob == pytest.approx(mean_p, abs=2e-6)
        assert got[b].frac_pos == pytest.approx(frac, abs=2e-6)
        assert got[b].gap == pytest.approx(frac - mean_p, abs=2e-6)
        assert got[b].ece_term == pytest.approx(
            n / total * abs(frac - mean_p), abs=2e-6
        )


def test_calibration_out_of_range_clamps_to_edge_bins(spark):
    from graphkb_spark.operators.evaluation import calibration_bins

    df = spark.createDataFrame(
        [(1, -0.5), (0, 1.5), (1, 1.0)], ["y", "p"]
    )
    got = {r.bin: r.n for r in
           calibration_bins(df, "y", "p", n_bins=10).collect()}
    assert got == {0: 1, 9: 2}  # p=1.0 clamps into the top bin


def test_calibration_rejects_bad_bins(spark):
    from graphkb_spark.operators.evaluation import calibration_bins

    df = spark.createDataFrame([(1, 0.5)], ["y", "p"])
    with pytest.raises(ValueError):
        calibration_bins(df, "y", "p", n_bins=0)


# ---------------------------------------------------------------- #
# weight_diagnostics vs closed form + degenerate edges              #
# ---------------------------------------------------------------- #

@settings(max_examples=6, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 2), st.integers(1, 1000)),
                min_size=1, max_size=60))
def test_weight_diagnostics_match_closed_form(spark, rows):
    from graphkb_spark.operators.evaluation import weight_diagnostics

    df = spark.createDataFrame(
        [(f"g{g}", float(w)) for g, w in rows], ["grp", "w"]
    )
    got = {r.group: r for r in
           weight_diagnostics(df, "grp", "w").collect()}
    groups = {}
    for g, w in rows:
        groups.setdefault(f"g{g}", []).append(float(w))
    assert set(got) == set(groups)
    for g, ws in groups.items():
        n, sw, sww, mw = len(ws), sum(ws), sum(w * w for w in ws), max(ws)
        ess = sw * sw / sww
        assert got[g].n == n
        assert got[g].sum_w == pytest.approx(sw, abs=1e-6)
        assert got[g].ess == pytest.approx(ess, abs=1e-4)
        assert got[g].ess_ratio == pytest.approx(ess / n, abs=1e-6)
        assert got[g].max_w_frac == pytest.approx(mw / sw, abs=1e-6)
        assert got[g].cv == pytest.approx(
            math.sqrt(max(n * sww / (sw * sw) - 1, 0.0)), abs=1e-5
        )


def test_weight_diagnostics_uniform_weights(spark):
    """Uniform weights: ESS == n, ratio == 1, cv == 0."""
    from graphkb_spark.operators.evaluation import weight_diagnostics

    df = spark.createDataFrame([("g", 2.5)] * 8, ["grp", "w"])
    [r] = weight_diagnostics(df, "grp", "w").collect()
    assert r.ess == pytest.approx(8.0, abs=1e-6)
    assert r.ess_ratio == pytest.approx(1.0, abs=1e-6)
    assert r.cv == pytest.approx(0.0, abs=1e-6)
    assert r.max_w_frac == pytest.approx(1 / 8, abs=1e-6)


def test_weight_diagnostics_one_dominating_weight(spark):
    """One huge weight among near-zeros: ESS -> 1, max share -> 1."""
    from graphkb_spark.operators.evaluation import weight_diagnostics

    df = spark.createDataFrame(
        [("g", 1e6)] + [("g", 1e-3)] * 9, ["grp", "w"]
    )
    [r] = weight_diagnostics(df, "grp", "w").collect()
    assert r.n == 10
    assert r.ess == pytest.approx(1.0, abs=1e-6)
    assert r.max_w_frac == pytest.approx(1.0, abs=1e-6)


def test_weight_diagnostics_drops_nonpositive_and_null(spark):
    from graphkb_spark.operators.evaluation import weight_diagnostics

    df = spark.createDataFrame(
        [("g", 1.0), ("g", 0.0), ("g", -2.0), ("g", None)],
        "grp string, w double",
    )
    [r] = weight_diagnostics(df, "grp", "w").collect()
    assert r.n == 1 and r.sum_w == 1.0
