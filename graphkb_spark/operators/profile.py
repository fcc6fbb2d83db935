"""Table profiling: the ANALYZE-style statistics pass.

A cost-based layer (and every human debugging a 100 TB pipeline)
needs per-column cardinality, null fraction, and numeric ranges. The
reference ships fixed per-source expectations (its spec-validation
counters); this generalizes them to a one-pass profile of ANY table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def table_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One-pass column profile: (column, n_rows, n_null, n_distinct,
    min_num, max_num) per profiled column — min/max populated for
    numeric columns (as double, rounded to 6), NULL otherwise (string
    min/max formatting is engine-specific; cardinality is not).
    Exact distinct counts, not sketches: the profile IS the audit.

    Scale shape: ONE aggregation over one scan. Multiple exact
    count-distincts plan as a single expand + partial-agg tree (each
    input row fans out once per column); for very wide tables profile
    in column batches. The long-format result is built by stacking the
    single aggregate row — no per-column scans."""
    cols = columns or df.columns
    schema = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"__nd_{c}"))
        if isinstance(schema[c], _NUMERIC):
            aggs.append(F.round(F.min(F.col(c)).cast("double"), 6).alias(f"__min_{c}"))
            aggs.append(F.round(F.max(F.col(c)).cast("double"), 6).alias(f"__max_{c}"))
    one = df.agg(*aggs)
    rows = []
    for c in cols:
        is_num = isinstance(schema[c], _NUMERIC)
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__null_{c}").alias("n_null"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                (F.col(f"__min_{c}") if is_num else F.lit(None).cast("double")).alias("min_num"),
                (F.col(f"__max_{c}") if is_num else F.lit(None).cast("double")).alias("max_num"),
            )
        )
    return one.select(F.explode(F.array(*rows)).alias("p")).select("p.*")
