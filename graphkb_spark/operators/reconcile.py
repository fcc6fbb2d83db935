"""Batch statement reconciliation (reference ``contentMatching``,
src/civic/statement.js:56-178 — SURVEY §2.4 J9 / §2.9.2).

Per natural group (the reference groups by ``sourceId``), diff the new
batch against the stored rows:

1. exact match on the full content key -> update candidates;
2. leftover-vs-leftover match on a weaker key (the reference uses
   ``subject`` alone) — paired positionally within the weak key;
3. remaining leftovers paired positionally ("artificial" pairing,
   src/civic/statement.js:150-175) — deterministic here via row_number
   over an explicit ordering;
4. unpaired new rows -> create; unpaired stored rows -> delete.

Spark shape: three full-outer joins on progressively weaker keys, each
hash-joined on the group key — no driver-side loops; the only shuffles
are on (group_key, content_key) pairs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RECONCILE_ACTION = "_action"


def _prep(df: DataFrame, prefix: str, strong: Sequence[str], weak: Sequence[str]) -> DataFrame:
    """Rename every column with ``prefix`` and add content-key digests —
    explicit names avoid any self-join lineage ambiguity."""
    out = df.select(
        *[F.col(c).alias(f"{prefix}{c}") for c in df.columns],
        F.md5(F.to_json(F.struct(*[F.col(c) for c in strong]))).alias(f"{prefix}k_strong"),
        F.md5(F.to_json(F.struct(*[F.col(c) for c in weak]))).alias(f"{prefix}k_weak"),
    )
    return out


def _rank(df: DataFrame, part: Sequence[str], order: Sequence[str], out: str) -> DataFrame:
    w = Window.partitionBy(*[F.col(c) for c in part]).orderBy(
        *[F.col(c).asc_nulls_last() for c in order]
    )
    return df.withColumn(out, F.row_number().over(w))


def reconcile(
    stored: DataFrame,
    batch: DataFrame,
    group_key: Sequence[str],
    strong_key: Sequence[str],
    weak_key: Sequence[str],
    order: Sequence[str],
    id_col: str,
) -> DataFrame:
    """Classify every batch/stored row into ``_action`` in
    {update, create, delete}; updates carry the stored ``id_col`` onto
    the new row's content (the reference PATCHes the stored rid with
    the new content).

    ``strong_key``/``weak_key`` are content keys *within* ``group_key``;
    ``order`` makes positional pairing deterministic.
    """
    cols = list(batch.columns)
    st = _prep(stored, "s_", strong_key, weak_key)
    nw = _prep(batch, "n_", strong_key, weak_key)
    s_order = [f"s_{c}" for c in order]
    n_order = [f"n_{c}" for c in order]
    s_gk = [f"s_{c}" for c in group_key]
    n_gk = [f"n_{c}" for c in group_key]

    def pair(
        st_df: DataFrame, nw_df: DataFrame, s_key: list[str], n_key: list[str], tag: str
    ) -> tuple[DataFrame, DataFrame, DataFrame]:
        """Full-outer join on (key, positional rank); returns
        (matched, leftover_new, leftover_stored)."""
        s = _rank(st_df, s_key, s_order, f"__z{tag}")
        n = _rank(nw_df, n_key, n_order, f"__z{tag}")
        cond = F.col(f"__z{tag}") == F.col(f"__zs{tag}")
        s = s.withColumnRenamed(f"__z{tag}", f"__zs{tag}")
        for sk, nk in zip(s_key, n_key):
            cond = cond & F.col(sk).eqNullSafe(F.col(nk))
        # persist: each pass's join fans out into 3 consumers (matched +
        # two leftover streams) and later passes chain off the leftovers
        # — without it pass-1 re-executes ~5x across the final union
        j = n.join(s, cond, "full_outer").persist()
        matched = j.filter(F.col(f"n_{id_col}").isNotNull() & F.col(f"s_{id_col}").isNotNull())
        left_new = j.filter(F.col(f"s_{id_col}").isNull() & F.col(f"n_{id_col}").isNotNull()).select(
            *[F.col(c) for c in n.columns if not c.startswith("__z")]
        )
        left_old = j.filter(F.col(f"n_{id_col}").isNull() & F.col(f"s_{id_col}").isNotNull()).select(
            *[F.col(c) for c in s.columns if not c.startswith("__z")]
        )
        return matched, left_new, left_old

    m1, ln1, lo1 = pair(st, nw, s_gk + ["s_k_strong"], n_gk + ["n_k_strong"], "1")
    if list(strong_key) == list(weak_key):
        # pass 2 would re-run pass 1's exact join — skip it (common when
        # the caller has no weaker content key than the strong one)
        m2, ln2, lo2 = None, ln1, lo1
    else:
        m2, ln2, lo2 = pair(lo1, ln1, s_gk + ["s_k_weak"], n_gk + ["n_k_weak"], "2")
    m3, ln3, lo3 = pair(lo2, ln2, s_gk, n_gk, "3")

    def updates(m: DataFrame) -> DataFrame:
        return m.select(
            *[F.col(f"n_{c}").alias(c) for c in cols if c != id_col],
            F.col(f"s_{id_col}").alias(id_col),
            F.lit("update").alias(RECONCILE_ACTION),
        )

    creates = ln3.select(
        *[F.col(f"n_{c}").alias(c) for c in cols], F.lit("create").alias(RECONCILE_ACTION)
    )
    deletes = lo3.select(
        *[F.col(f"s_{c}").alias(c) for c in cols], F.lit("delete").alias(RECONCILE_ACTION)
    )
    out = updates(m1)
    if m2 is not None:
        out = out.unionByName(updates(m2))
    return out.unionByName(updates(m3)).unionByName(creates).unionByName(deletes)
