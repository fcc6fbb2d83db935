"""DNF expansion cases (modeled on the reference's
test/civic/civic.profile.test.js — molecular-profile parsing)."""

import pytest

from graphkb_spark.operators.expand import ProfileError, dnf_expand


@pytest.mark.parametrize(
    "expr,expect",
    [
        ("a", [["a"]]),
        ("a AND b", [["a", "b"]]),
        ("a OR b", [["a"], ["b"]]),
        ("a AND (b OR c)", [["a", "b"], ["a", "c"]]),
        ("(a OR b) AND (c OR d)", [["a", "c"], ["a", "d"], ["b", "c"], ["b", "d"]]),
        ("a AND a", [["a"]]),                      # dedup within conjunct
        ("((a))", [["a"]]),
        ("a AND (b OR (c AND d))", [["a", "b"], ["a", "c", "d"]]),
    ],
)
def test_dnf(expr, expect):
    assert dnf_expand(expr) == sorted(expect)


@pytest.mark.parametrize("expr", ["NOT a", "a AND NOT b", "a AND (b", "a)", ""])
def test_dnf_errors(expr):
    with pytest.raises(ProfileError):
        dnf_expand(expr)


def test_expand_profiles_quarantines_invalid(spark):
    from graphkb_spark.operators.expand import expand_profiles

    df = spark.createDataFrame([("a AND (b OR c)",), ("NOT a",)], ["expr"])
    rows = expand_profiles(df, "expr").collect()
    got = {(r.expr, tuple(r.condition_set) if r.condition_set else None) for r in rows}
    assert got == {
        ("a AND (b OR c)", ("a", "b")),
        ("a AND (b OR c)", ("a", "c")),
        ("NOT a", None),
    }
