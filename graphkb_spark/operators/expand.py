"""Row-expansion operators (SURVEY §2.8 F14/F15).

- DNF expansion of boolean molecular-profile expressions (reference:
  src/civic/profile.js:19-255): a token stream of ids, AND/OR and
  parentheses compiled to disjunctive normal form — each disjunct
  becomes one candidate row (explode). NOT is rejected, mirroring
  src/civic/profile.js:236-239.
- Cross-product expansion (reference: conditions x therapies,
  src/civic/evidenceItem.js:251-261) — explode x explode.

The DNF expansion is a pure Python function (recursive grammar — not
expressible in Column algebra) wrapped as an Arrow-batched Pandas UDF
returning array<array<string>> and exploded JVM-side.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class ProfileError(ValueError):
    pass


def _tokenize(expr: str) -> list[str]:
    out: list[str] = []
    cur = ""
    for ch in expr:
        if ch in "()":
            if cur.strip():
                out.extend(cur.split())
            cur = ""
            out.append(ch)
        else:
            cur += ch
    if cur.strip():
        out.extend(cur.split())
    return out


def dnf_expand(expr: str) -> list[list[str]]:
    """Compile a boolean expression over ids into DNF: a list of
    conjunct sets. Grammar mirrors the reference's molecular-profile
    parser (ids, AND, OR, parens; NOT unsupported -> error).

    >>> dnf_expand("a AND (b OR c)")
    [['a', 'b'], ['a', 'c']]
    """
    tokens = _tokenize(expr)
    pos = 0

    def parse_or() -> list[list[str]]:
        nonlocal pos
        terms = [parse_and()]
        while pos < len(tokens) and tokens[pos].upper() == "OR":
            pos += 1
            terms.append(parse_and())
        return [c for t in terms for c in t]

    def parse_and() -> list[list[str]]:
        nonlocal pos
        result = parse_atom()
        while pos < len(tokens):
            tok = tokens[pos].upper()
            if tok == "AND":
                pos += 1
                rhs = parse_atom()
            elif tok not in ("OR", ")") :
                # implicit AND between adjacent atoms
                rhs = parse_atom()
            else:
                break
            result = [sorted(set(a + b)) for a in result for b in rhs]
        return result

    def parse_atom() -> list[list[str]]:
        nonlocal pos
        if pos >= len(tokens):
            raise ProfileError("unexpected end of expression")
        tok = tokens[pos]
        if tok.upper() == "NOT":
            raise ProfileError("NOT operator not supported")
        if tok == "(":
            pos += 1
            inner = parse_or()
            if pos >= len(tokens) or tokens[pos] != ")":
                raise ProfileError("unbalanced parentheses")
            pos += 1
            return inner
        if tok == ")":
            raise ProfileError("unbalanced parentheses")
        pos += 1
        return [[tok]]

    result = parse_or()
    if pos != len(tokens):
        raise ProfileError(f"trailing tokens at {pos}: {tokens[pos:]}")
    # canonical order for deterministic downstream hashing
    return sorted([sorted(set(c)) for c in result])


@F.pandas_udf(T.ArrayType(T.ArrayType(T.StringType())))
def dnf_expand_udf(exprs: pd.Series) -> pd.Series:
    # memoize within the Arrow batch: distinct profile expressions are
    # FAR fewer than evidence rows (CIViC reuses molecular profiles
    # across evidence items), so each unique grammar parse runs once
    # per batch instead of once per row
    _MISS = object()
    cache: dict = {}

    def run(e):
        if e is None:
            return None
        hit = cache.get(e, _MISS)
        if hit is not _MISS:
            return hit
        try:
            r = dnf_expand(e)
        except ProfileError:
            r = None  # negative cache: invalid profiles yield null
        cache[e] = r
        return r

    return exprs.map(run)


def expand_profiles(df: DataFrame, expr_col: str, out_col: str = "condition_set") -> DataFrame:
    """expression -> one row per DNF conjunct-set (array<string>)."""
    return df.withColumn("__dnf", dnf_expand_udf(F.col(expr_col))).select(
        "*", F.explode_outer("__dnf").alias(out_col)
    ).drop("__dnf")


def cross_expand(df: DataFrame, arr_a: str, arr_b: str, out_a: str, out_b: str) -> DataFrame:
    """Cross-product of two array columns -> one row per combination
    (reference: conditions x therapies explode)."""
    return (
        df.select("*", F.explode_outer(arr_a).alias(out_a))
        .select("*", F.explode_outer(arr_b).alias(out_b))
    )
