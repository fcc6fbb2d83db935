"""Property-based tests for the DNF profile-expression compiler
(operators/expand.py) — no SparkSession needed, so these run fast.

Properties:
- semantic equivalence: for every assignment of the variables, the DNF
  (OR over conjunct-sets) evaluates exactly like the original
  expression tree;
- canonical form: output is deterministic, sorted, and duplicate-free.
"""

from __future__ import annotations

from itertools import product

from hypothesis import given, settings
from hypothesis import strategies as st

from graphkb_spark.operators.expand import dnf_expand

VARS = ["a", "b", "c", "d", "e"]


@st.composite
def expr_trees(draw, depth=0):
    """Random boolean expression trees over VARS rendered to the
    reference grammar (ids, AND, OR, parentheses)."""
    if depth >= 3 or draw(st.booleans()):
        return draw(st.sampled_from(VARS))
    op = draw(st.sampled_from([" AND ", " OR "]))
    n = draw(st.integers(min_value=2, max_value=3))
    parts = [draw(expr_trees(depth=depth + 1)) for _ in range(n)]
    rendered = op.join(parts)
    return f"({rendered})" if draw(st.booleans()) else rendered


def _eval_expr(expr: str, truth: dict[str, bool]) -> bool:
    """Evaluate the original expression with Python's parser (AND/OR
    map to and/or; ids to their truth values)."""
    py = expr.replace("AND", "and").replace("OR", "or")
    return bool(eval(py, {"__builtins__": {}}, dict(truth)))  # noqa: S307


def _eval_dnf(dnf: list[list[str]], truth: dict[str, bool]) -> bool:
    return any(all(truth[v] for v in conj) for conj in dnf)


@settings(max_examples=200, deadline=None)
@given(expr_trees())
def test_dnf_semantically_equivalent(expr):
    dnf = dnf_expand(expr)
    used = sorted({v for conj in dnf for v in conj})
    assert used, expr
    for values in product([False, True], repeat=len(used)):
        truth = dict.fromkeys(VARS, False) | dict(zip(used, values))
        assert _eval_dnf(dnf, truth) == _eval_expr(expr, truth), (expr, dnf)


@settings(max_examples=200, deadline=None)
@given(expr_trees())
def test_dnf_canonical_and_deterministic(expr):
    dnf = dnf_expand(expr)
    assert dnf == dnf_expand(expr)
    # sorted outer and inner, no duplicate ids within a conjunct
    assert dnf == sorted(dnf)
    for conj in dnf:
        assert conj == sorted(conj)
        assert len(conj) == len(set(conj))
