"""Local mirror of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same parquet, compare row count + schema + order-insensitive
values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
from graphkb_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if df[c].dtype == object:
            # normalize lists/arrays to tuples for sorting
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    df = df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)
    return df


def _dtype_kind(s: pd.Series) -> str:
    """Collapse a dtype to the driver-visible kind.

    The driver hashes the *stringified* frame, so ``1`` (int64) vs
    ``1.0`` (float64) mismatch even when values are numerically equal —
    exactly what happens when a DuckDB HUGEINT window sum materializes
    as float64 while Spark returns int64. Int width (int32 vs int64)
    stringifies identically, so only the kind matters.
    """
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return "object"


def dtype_drift(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    """Driver-faithful strictness: flag columns whose stringified form
    would differ by dtype alone (int vs float vs bool).

    Columns where either side holds a null are exempt for the int/float
    pair only when BOTH sides float (nulls force float64 on both paths
    identically), so an asymmetric int-vs-float is always a real bug.
    """
    out = []
    for c in spark_df.columns:
        if c not in oracle_df.columns:
            continue
        ks, ko = _dtype_kind(spark_df[c]), _dtype_kind(oracle_df[c])
        if ks == ko:
            continue
        if {ks, ko} <= {"int", "float", "bool"}:
            out.append(f"dtype drift on '{c}': spark={ks} oracle={ko} "
                       f"(driver hashes stringified values — e.g. 1 vs 1.0)")
    return out


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}"
        )
        return problems
    problems.extend(dtype_drift(spark_df, oracle_df))
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count: spark={len(spark_df)} oracle={len(oracle_df)}")
    a, b = canon(spark_df), canon(oracle_df)
    if len(a) == len(b):
        try:
            pd.testing.assert_frame_equal(
                a, b, check_dtype=False, check_exact=False, rtol=1e-6, atol=1e-6
            )
        except AssertionError as exc:
            msg = str(exc).split("\n")
            problems.append("values differ: " + " | ".join(msg[:6]))
            mask = ~(a.eq(b) | (a.isna() & b.isna()))
            bad = mask.any(axis=1)
            if bad.any():
                i = bad.idxmax()
                problems.append(f"first diff row {i}: spark={a.loc[i].to_dict()} oracle={b.loc[i].to_dict()}")
        else:
            # Driver-faithful EXACT check: the driver hashes the
            # stringified frame, so a value that passes rtol=1e-6 but
            # stringifies differently (FP summation-order drift at a
            # round() boundary — the round-5 incremental_agg failure
            # class) is still driver-red. Compare stringified values
            # exactly and surface the first offending cell.
            sa = a.astype(str)
            sb = b.astype(str)
            # both-null cells stringify differently by dtype accident
            # ('None' vs 'nan') but hash identically after the driver's
            # canonicalization — not a real mismatch
            mask = sa.ne(sb) & ~(a.isna() & b.isna())
            bad = mask.any(axis=1)
            if bad.any():
                i = bad.idxmax()
                cols = [c for c in sa.columns if mask.loc[i, c]]
                problems.append(
                    "exact-hash mismatch (passes rtol, driver-red): "
                    f"row {i} col(s) {cols}: "
                    f"spark={ {c: sa.loc[i, c] for c in cols} } "
                    f"oracle={ {c: sb.loc[i, c] for c in cols} }"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    spark = get_spark("correctness")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    n_pass = n_fail = n_rowsonly = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {exc}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            status = "ROWS" if len(sdf) >= 0 else "??"
            print(f"{status}  {name}: rows={len(sdf)} ({dt:.1f}s) [no oracle — rows-only]")
            n_rowsonly += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as exc:
            print(f"FAIL  {name}: oracle error: {exc}")
            n_fail += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"FAIL  {name}: rows={len(sdf)} ({dt:.1f}s)")
            for p in problems:
                print(f"      {p}")
            n_fail += 1
        else:
            print(f"PASS  {name}: rows={len(sdf)} ({dt:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
