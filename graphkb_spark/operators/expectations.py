"""Declarative data-quality expectations (deequ / Great Expectations
shape): a rule list compiles to ONE aggregation pass over the table —
every check is an algebraic aggregate, so validating a 100 TB batch
costs a single scan with map-side partial aggregation, no per-rule
jobs. The reference gates every loaded batch through JSON-Schema
row validation (operators/validate.py, spec_validation); this is the
table-level complement: distribution/uniqueness/completeness gates a
training-data pipeline runs before a batch is allowed into the mix.

Checks:
- ``not_null``     observed = fraction of non-null rows
- ``unique``       observed = distinct / total (1.0 == fully unique)
- ``min`` / ``max``  observed = column min/max; passes when within bound
- ``regex``        observed = fraction of (non-null) values matching
- ``in_set``       observed = fraction of (non-null) values in the set
- ``mean_between`` observed = column mean; passes inside [lo, hi]

Every ``observed`` is rounded to 6 digits; thresholds compare on the
rounded value so any engine reaches the same verdict. An EMPTY batch
(or an all-null column for the fraction checks) yields a NULL
observed and ``passed = False`` — a pipeline gate must fail loudly on
a vanished batch, not vacuously pass it.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _observed(rule: Mapping) -> F.Column:
    c = F.col(rule["column"])
    check = rule["check"]
    n = F.count(F.lit(1))
    if check == "not_null":
        return F.round(F.try_divide(F.count(c), n), 6)
    if check == "unique":
        return F.round(F.try_divide(F.countDistinct(c), n), 6)
    if check == "min":
        return F.round(F.min(c).cast("double"), 6)
    if check == "max":
        return F.round(F.max(c).cast("double"), 6)
    if check == "regex":
        hit = F.when(c.rlike(rule["pattern"]), 1).otherwise(0)
        return F.round(F.try_divide(F.sum(hit), F.count(c)), 6)
    if check == "in_set":
        hit = F.when(c.isin(list(rule["values"])), 1).otherwise(0)
        return F.round(F.try_divide(F.sum(hit), F.count(c)), 6)
    if check == "mean_between":
        return F.round(F.avg(c.cast("double")), 6)
    raise ValueError(f"unknown check: {check}")


def _passed(rule: Mapping, observed: F.Column) -> F.Column:
    check = rule["check"]
    # NULL observed (empty batch / all-null column) -> explicit fail
    fail_null = lambda cond: F.coalesce(cond, F.lit(False))  # noqa: E731
    if check in ("not_null", "unique", "regex", "in_set"):
        return fail_null(observed >= F.lit(float(rule.get("threshold", 1.0))))
    if check == "min":
        return fail_null(observed >= F.lit(float(rule["bound"])))
    if check == "max":
        return fail_null(observed <= F.lit(float(rule["bound"])))
    if check == "mean_between":
        return fail_null(
            (observed >= F.lit(float(rule["lo"])))
            & (observed <= F.lit(float(rule["hi"])))
        )
    raise ValueError(f"unknown check: {check}")


def run_expectations(df: DataFrame, rules: Sequence[Mapping]) -> DataFrame:
    """Evaluate all ``rules`` in ONE aggregation job. Returns one row
    per rule: (rule_id, column, check, observed, passed), rule_id is
    the rule's position. The single wide agg row is exploded driver-
    free via an inline array of structs."""
    aggs = [
        _observed(r).alias(f"__o{i}") for i, r in enumerate(rules)
    ]
    wide = df.agg(*aggs)
    entries = [
        F.struct(
            F.lit(i).alias("rule_id"),
            F.lit(r["column"]).alias("column"),
            F.lit(r["check"]).alias("check"),
            F.col(f"__o{i}").cast("double").alias("observed"),
            _passed(r, F.col(f"__o{i}")).alias("passed"),
        )
        for i, r in enumerate(rules)
    ]
    return wide.select(F.explode(F.array(*entries)).alias("r")).select(
        "r.rule_id", "r.column", "r.check", "r.observed", "r.passed"
    )
