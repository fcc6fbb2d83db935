"""Round-9 regression tests for the r8 ADVICE fixes: one-sided-NULL
Fellegi-Sunter evidence, zero-variance Neyman fallback, and the
arithmetic Benford leading digit."""
import math

import pytest


@pytest.fixture(scope="module")
def spark():
    from graphkb_spark.session import get_spark

    return get_spark()


def test_fellegi_sunter_one_sided_null_is_no_evidence(spark):
    from graphkb_spark.operators.linkage import fellegi_sunter

    pairs = spark.createDataFrame(
        [(1, 2, "x", None, "p", "p"), (3, 4, None, "x", "p", "q")],
        ["id_a", "id_b", "fa", "fb", "ga", "gb"],
    )
    out = {r.id_a: r for r in fellegi_sunter(
        pairs,
        [("f", "fa", "fb", 0.9, 0.1), ("g", "ga", "gb", 0.8, 0.2)],
    ).collect()}
    # one-sided-missing f contributes 0, not the disagreement penalty
    assert abs(out[1].match_score - round(math.log2(0.8 / 0.2), 6)) < 1e-9
    assert not out[1].agree_f and out[1].agree_g
    want3 = 0.0 + math.log2(0.2 / 0.8)  # missing f, disagree g
    assert abs(out[3].match_score - round(want3, 6)) < 1e-9


def test_neyman_zero_variance_falls_back_to_proportional(spark):
    from graphkb_spark.operators.sampling import neyman_stratified_sample

    # every stratum constant => all N_h*sigma_h weights are 0
    rows = [("a", i, 5.0) for i in range(100)]
    rows += [("b", 1000 + i, 7.0) for i in range(300)]
    df = spark.createDataFrame(rows, ["stratum", "id", "v"])
    out = neyman_stratified_sample(df, "stratum", "id", "v", budget=40).collect()
    by = {}
    for r in out:
        by[r.stratum] = by.get(r.stratum, 0) + 1
    # proportional: 40 * 100/400 = 10 and 40 * 300/400 = 30
    assert by == {"a": 10, "b": 30}


def test_benford_handles_tiny_and_boundary_values(spark):
    from graphkb_spark.operators.validate import benford_audit

    # 4e-11 rounds to "" under format_number(v, 10); 1000.0 sits on a
    # power-of-ten boundary where floor(log10) can land epsilon-low
    vals = [4e-11, 1000.0, 999.999, 0.1, 5e-12, 2e-11]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    out = {r.digit: r for r in benford_audit(df, "v").collect()}
    total = sum(r.observed_n for r in out.values())
    assert total == 6  # nothing dropped
    assert out[4].observed_n == 1 and out[5].observed_n == 1
    assert out[2].observed_n == 1
    assert out[1].observed_n == 2  # 1000.0 and 0.1
    assert out[9].observed_n == 1  # 999.999
    # fractions computed over digits 1-9 only => sum to 1
    assert abs(sum(r.observed_frac for r in out.values()) - 1.0) < 1e-5
