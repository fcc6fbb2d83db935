"""Schema/spec validation with per-row quarantine (SURVEY §2.3 P5).

The reference validates every parsed record against a JSON Schema (ajv)
before processing (``checkSpec`` /root/reference/src/util.js:201-214,
spec documents like /root/reference/src/civic/specs.json) and collects
failures into error lists instead of aborting
(/root/reference/src/civic/evidenceItem.js:94-110).

Spark-first, two layers:

- ``check_spec`` — a spec is a mapping column -> Column predicate;
  violations accumulate into an ``array<string>`` error column built
  from pure ``when`` expressions.
- ``compile_json_spec``/``check_json_spec`` — a declarative
  JSON-Schema-style document (the ajv subset the reference uses:
  ``type`` incl. ``"null"``, ``enum``, ``required``, ``pattern``,
  ``minimum``/``maximum``, nested ``properties``, array ``items``)
  compiled into the same Column predicates. Structural ``type`` checks
  run at compile time against the DataFrame schema (parquet typing
  makes them static); value checks (required/enum/pattern/bounds)
  become runtime predicates.

Either way the whole validation is one codegen'd projection, and the
valid/quarantine split is two filters off the same scan (Catalyst
collapses them into the read).
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from graphkb_spark.core.materialize import materialize

SPEC_ERRORS_COL = "_spec_errors"


def check_spec(df: DataFrame, spec: Mapping[str, Column]) -> DataFrame:
    """Annotate ``df`` with ``_spec_errors``: for each (name ->
    predicate) entry, rows failing the predicate collect
    ``"<name>"`` into the error array; an empty array means valid."""
    parts = [
        F.when(~F.coalesce(pred, F.lit(False)), F.lit(name))
        for name, pred in spec.items()
    ]
    errors = F.filter(F.array(*parts), lambda e: e.isNotNull())
    return df.withColumn(SPEC_ERRORS_COL, errors)


def split_valid(df: DataFrame, spec: Mapping[str, Column]) -> tuple[DataFrame, DataFrame]:
    """(valid rows, quarantined rows) — quarantine keeps the error list
    for the K5 error sink."""
    checked = check_spec(df, spec)
    return (
        checked.filter(F.size(SPEC_ERRORS_COL) == 0).drop(SPEC_ERRORS_COL),
        checked.filter(F.size(SPEC_ERRORS_COL) > 0),
    )


class SpecCompileError(ValueError):
    """The spec document contradicts the DataFrame's static schema —
    an authoring error (every row would fail), not a data error."""


_JSON_TYPE_OK = {
    "string": (T.StringType,),
    "number": (T.DoubleType, T.FloatType, T.DecimalType, T.LongType, T.IntegerType,
               T.ShortType, T.ByteType),
    "integer": (T.LongType, T.IntegerType, T.ShortType, T.ByteType),
    "boolean": (T.BooleanType,),
    "object": (T.StructType,),
    "array": (T.ArrayType,),
}


def _static_type_check(path: str, node: Mapping[str, Any], dtype: T.DataType) -> None:
    types = node.get("type")
    if types is None:
        return
    if isinstance(types, str):
        types = [types]
    concrete = [t for t in types if t != "null"]
    if not concrete:
        return
    if not any(isinstance(dtype, _JSON_TYPE_OK[t]) for t in concrete
               if t in _JSON_TYPE_OK):
        raise SpecCompileError(
            f"{path}: spec type {concrete} incompatible with column type "
            f"{dtype.simpleString()}"
        )


def compile_json_spec(
    schema: Mapping[str, Any],
    dtype: T.StructType,
    value: Column | None = None,
    path: str = "#",
) -> list[tuple[str, Column]]:
    """Compile a JSON-Schema-style document into
    ``[(message, violation_predicate)]`` pairs over a row.

    ``value`` is the Column holding the current object (None = the row
    itself, properties are plain columns). Semantics follow ajv where
    Spark can express them: a null value passes ``type``/``enum``/
    ``pattern`` checks (absent ~ null in a flat row) and only
    ``required`` enforces presence — matching how the reference's spec
    documents pair nullable fields with ``["null", X]`` types and
    mandatory ones with ``required`` lists.
    """
    out: list[tuple[str, Column]] = []
    props: Mapping[str, Any] = schema.get("properties", {})
    required = set(schema.get("required", []))
    field_types = {f.name: f.dataType for f in dtype.fields}

    for name in required:
        if name not in props and name not in field_types:
            raise SpecCompileError(f"{path}: required property '{name}' undeclared")

    for name, node in props.items():
        if name not in field_types:
            raise SpecCompileError(f"{path}: property '{name}' not in schema "
                                   f"({', '.join(sorted(field_types))})")
        child_dtype = field_types[name]
        child_path = f"{path}/{name}"
        v = F.col(name) if value is None else value.getField(name)
        _static_type_check(child_path, node, child_dtype)

        if name in required:
            out.append((f"{child_path}: required", v.isNull()))
        if "enum" in node:
            allowed = [e for e in node["enum"] if e is not None]
            out.append((
                f"{child_path}: not in enum",
                v.isNotNull() & ~v.isin(allowed),
            ))
        if "pattern" in node:
            out.append((
                f"{child_path}: pattern {node['pattern']} unmatched",
                v.isNotNull() & ~v.rlike(node["pattern"]),
            ))
        if "minimum" in node:
            out.append((f"{child_path}: below minimum {node['minimum']}",
                        v.isNotNull() & (v < F.lit(node["minimum"]))))
        if "maximum" in node:
            out.append((f"{child_path}: above maximum {node['maximum']}",
                        v.isNotNull() & (v > F.lit(node["maximum"]))))
        if "properties" in node:
            if not isinstance(child_dtype, T.StructType):
                raise SpecCompileError(f"{child_path}: nested properties on "
                                       f"non-struct {child_dtype.simpleString()}")
            out.extend(compile_json_spec(node, child_dtype, v, child_path))
        if "items" in node:
            if not isinstance(child_dtype, T.ArrayType):
                raise SpecCompileError(f"{child_path}: items on non-array "
                                       f"{child_dtype.simpleString()}")
            out.extend(
                _compile_items(node["items"], child_dtype.elementType, v,
                               f"{child_path}[]")
            )
    return out


def _compile_items(
    node: Mapping[str, Any], elem_type: T.DataType, arr: Column, path: str
) -> list[tuple[str, Column]]:
    """Array-element checks: any element violating flags the row (one
    message per rule, existence-quantified — stays in Column algebra
    via ``F.exists``)."""
    out: list[tuple[str, Column]] = []

    def any_elem(pred) -> Column:
        return arr.isNotNull() & F.exists(arr, pred)

    if "enum" in node:
        allowed = [e for e in node["enum"] if e is not None]
        out.append((f"{path}: element not in enum",
                    any_elem(lambda x: x.isNotNull() & ~x.isin(allowed))))
    if "pattern" in node:
        out.append((f"{path}: element pattern unmatched",
                    any_elem(lambda x: x.isNotNull() & ~x.rlike(node["pattern"]))))
    if "properties" in node:
        if not isinstance(elem_type, T.StructType):
            raise SpecCompileError(f"{path}: element properties on non-struct "
                                   f"{elem_type.simpleString()}")
        props = node["properties"]
        required = set(node.get("required", []))
        field_types = {f.name: f.dataType for f in elem_type.fields}
        # closure factories: F.exists requires single-parameter lambdas
        # (default-arg capture would read as a 2-arg lambda to Spark)
        def _null_check(n):
            return lambda x: x.getField(n).isNull()

        def _enum_check(n, allowed):
            return lambda x: x.getField(n).isNotNull() & ~x.getField(n).isin(allowed)

        def _pattern_check(n, p):
            return lambda x: x.getField(n).isNotNull() & ~x.getField(n).rlike(p)

        for name, child in props.items():
            if name not in field_types:
                raise SpecCompileError(f"{path}: element property '{name}' missing")
            _static_type_check(f"{path}/{name}", child, field_types[name])
            if name in required:
                out.append((f"{path}/{name}: required",
                            any_elem(_null_check(name))))
            if "enum" in child:
                allowed = [e for e in child["enum"] if e is not None]
                out.append((f"{path}/{name}: not in enum",
                            any_elem(_enum_check(name, allowed))))
            if "pattern" in child:
                out.append((f"{path}/{name}: pattern unmatched",
                            any_elem(_pattern_check(name, child["pattern"]))))
    return out


def check_json_spec(df: DataFrame, schema: Mapping[str, Any]) -> DataFrame:
    """``check_spec`` for a declarative JSON-Schema document: compile
    against ``df``'s static schema, annotate with ``_spec_errors``."""
    compiled = compile_json_spec(schema, df.schema)
    parts = [F.when(pred, F.lit(msg)) for msg, pred in compiled]
    if not parts:
        return df.withColumn(SPEC_ERRORS_COL, F.array().cast("array<string>"))
    errors = F.filter(F.array(*parts), lambda e: e.isNotNull())
    return df.withColumn(SPEC_ERRORS_COL, errors)


def split_valid_json(
    df: DataFrame, schema: Mapping[str, Any]
) -> tuple[DataFrame, DataFrame]:
    """``split_valid`` for a JSON-Schema document."""
    checked = check_json_spec(df, schema)
    return (
        checked.filter(F.size(SPEC_ERRORS_COL) == 0).drop(SPEC_ERRORS_COL),
        checked.filter(F.size(SPEC_ERRORS_COL) > 0),
    )


def full_reload_diff(
    original: DataFrame,
    reloaded: DataFrame,
    id_col: str = "rid",
    suppress_delete: bool = False,
) -> DataFrame:
    """§2.9.3 full-reload diff (reference cosmic resistance,
    /root/reference/src/cosmic/resistance.js:334-397): sources without
    stable ids hash every row; after a reload, previously-stored ids
    not regenerated are deleted — unless errors occurred during the
    load (``suppress_delete``), in which case they are kept-flagged.

    Returns (id, action): retained ids -> 'keep', vanished ->
    'delete' (or 'keep-flagged' when suppressed), new -> 'create'.
    """
    o = original.select(F.col(id_col)).distinct().withColumn("__o", F.lit(True))
    r = reloaded.select(F.col(id_col)).distinct().withColumn("__r", F.lit(True))
    gone_action = "keep-flagged" if suppress_delete else "delete"
    return (
        o.join(r, id_col, "full_outer")
        .select(
            id_col,
            F.when(F.col("__o").isNotNull() & F.col("__r").isNotNull(), F.lit("keep"))
            .when(F.col("__o").isNotNull(), F.lit(gone_action))
            .otherwise(F.lit("create"))
            .alias("action"),
        )
    )


def referential_check(
    child: DataFrame,
    parent: DataFrame,
    fk_col: str,
    pk_col: str,
) -> DataFrame:
    """Cross-table referential-integrity audit — the FK sibling of the
    single-table expectations gate: counts child rows whose foreign
    key has no parent (orphans), distinct orphan keys, and parent
    coverage (parents actually referenced). One summary row:
    (n_child, n_orphan_rows, n_orphan_keys, orphan_frac, n_parents,
    n_referenced_parents).

    Scale shape: ONE distinct-key aggregation per side (partial-agg,
    only keys shuffle — never child payloads) and a key-table
    left-anti/semi pair that AQE broadcasts when the parent key table
    is small. The child fact table is scanned once."""
    # both key tables feed three aggregates each — materialize once so
    # the child fact table is scanned exactly once
    ck = (
        child.groupBy(F.col(fk_col).alias("__k"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .transform(materialize, eager=False)
    )
    pk = (
        parent.select(F.col(pk_col).alias("__k"))
        .distinct()
        .transform(materialize, eager=False)
    )
    orphans = ck.join(pk, "__k", "left_anti")
    o = orphans.agg(
        F.coalesce(F.sum("__n"), F.lit(0)).cast("bigint").alias("n_orphan_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_orphan_keys"),
    )
    c = ck.agg(F.sum("__n").cast("bigint").alias("n_child"))
    referenced = pk.join(ck, "__k", "left_semi")
    pstats = pk.agg(F.count(F.lit(1)).cast("bigint").alias("n_parents"))
    rstats = referenced.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_referenced_parents")
    )
    return (
        c.crossJoin(o)
        .crossJoin(pstats)
        .crossJoin(rstats)
        .select(
            "n_child",
            "n_orphan_rows",
            "n_orphan_keys",
            F.round(F.col("n_orphan_rows") / F.col("n_child"), 6).alias(
                "orphan_frac"
            ),
            "n_parents",
            "n_referenced_parents",
        )
    )


def k_anonymity(
    df: DataFrame,
    qi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """K-anonymity audit over quasi-identifier columns: every row's QI
    combination must be shared by at least ``k`` rows, or the rows are
    re-identifiable — the governance gate before a dataset leaves a
    trust boundary. Returns one row per QI group: (qi..., group_n,
    is_risky) with is_risky = group_n < k.

    Scale shape: ONE partial-agg shuffle on the QI tuple. The risky
    tail is by definition the small-group end, so the output is
    dominated by exactly the rows a reviewer needs to see."""
    if k < 1:
        raise ValueError("k must be >= 1")
    return df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("group_n")
    ).withColumn("is_risky", F.col("group_n") < k)


def benford_audit(df: DataFrame, value_col: str) -> DataFrame:
    """Benford's-law first-digit audit: naturally-generated positive
    magnitudes follow P(d) = log10(1 + 1/d); fabricated or truncated
    data does not — the classic fraud / synthetic-data smell test.
    Returns one row per leading digit 1-9: (digit, observed_n,
    observed_frac, expected_frac, chi2_term), fractions rounded to 6,
    chi2_term = (obs - exp)^2 / exp over COUNTS so the per-digit
    contribution is comparable. Sum chi2_term against the chi-square
    critical value externally.

    One narrow digit extraction + one 9-row aggregation; scan-speed at
    any scale."""
    v = F.abs(F.col(value_col).cast("double"))
    # arithmetic leading digit: v / 10^floor(log10 v) in [1, 10); the
    # string route (format_number) drops sub-1e-10 values to "" and
    # misattributes 9.99..9→10.0 roundings. Two fp guards: the inexact
    # negative power (4e-11/1e-11 = 3.999..96) is absorbed by rounding
    # the mantissa to 12 decimals before flooring, and log10 of an
    # exact power of ten landing epsilon-low makes the ratio exactly
    # 10 — that IS leading digit 1.
    d0 = F.floor(F.round(v / F.pow(F.lit(10.0), F.floor(F.log10(v))), 12))
    digit = F.when(d0 >= 10, F.lit(1)).otherwise(d0).cast("int")
    base = df.filter(v > 0).select(digit.alias("digit"))
    # the 9-row count table feeds the total AND the final projection —
    # materialize once so the fact scan runs once
    counts = (
        base.filter(F.col("digit").between(1, 9))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("observed_n"))
        .transform(materialize, eager=False)
    )
    # total over digits 1-9 only, so fractions sum to 1 by construction
    total = counts.agg(F.sum("observed_n").alias("__t"))
    expected = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.col("observed_n").cast("bigint").alias("observed_n"),
            F.round(F.col("observed_n") / F.col("__t"), 6).alias("observed_frac"),
            F.round(expected, 6).alias("expected_frac"),
            F.round(
                (F.col("observed_n") - expected * F.col("__t"))
                * (F.col("observed_n") - expected * F.col("__t"))
                / (expected * F.col("__t")),
                6,
            ).alias("chi2_term"),
        )
    )
