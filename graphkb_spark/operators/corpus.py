"""Corpus-preparation operators for LLM training pipelines: vocabulary
building and sequence packing.

Both are pure DataFrame algebra with deterministic, oracle-replicable
semantics:

- ``build_vocab``: global token frequencies -> the top-V vocabulary
  with rank ids (count desc, token asc tie-break). One shuffle for the
  count, one top-V sort over the (small) distinct-token table.
- ``pack_sequences``: the standard concat-and-cut packing — documents
  are laid end-to-end in a deterministic order and cut every
  ``capacity`` tokens; a document crossing a boundary is split across
  consecutive packed sequences. Emitted as a MANIFEST (shard, seq,
  doc, doc_offset, span_len) a packed-dataset writer consumes.
  Packing is per-shard (deterministic hash of the id), so the
  prefix-sum window never funnels the corpus through one task — the
  100 TB-safe layout; waste is at most one partial sequence per shard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from graphkb_spark.operators.text import TOKEN_REGEX


def tokens(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_REGEX), F.lit(0))


def build_vocab(
    df: DataFrame,
    text_col: str,
    vocab_size: int = 1000,
    min_freq: int = 1,
) -> DataFrame:
    """Top-``vocab_size`` token vocabulary: (token, token_id, freq),
    token_id = dense rank by (freq desc, token asc) starting at 0.

    Scale shape: explode -> partial-agg count (one shuffle on token);
    the ranking sorts only the distinct-token table, and the window is
    an unpartitioned row_number over that SMALL table — acceptable for
    vocab-sized outputs (<= millions), not for the raw corpus."""
    counts = (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= min_freq)
    )
    w = Window.orderBy(F.col("freq").desc(), F.col("token").asc())
    return (
        counts.withColumn("token_id", F.row_number().over(w) - 1)
        .filter(F.col("token_id") < vocab_size)
        .select("token", "token_id", "freq")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    capacity: int = 2048,
    shards: int = 16,
) -> DataFrame:
    """Concat-and-cut sequence packing manifest: within each shard,
    documents are concatenated in ``id_col`` order and cut every
    ``capacity`` tokens. Returns one row per (document x packed
    sequence it lands in): (shard, seq, <id_col>, doc_offset,
    seq_offset, span_len). Zero-token documents are dropped.

    Shard = md5-derived hash of the id (deterministic under retries
    AND ANSI-replicable, like stratified_sample); the running prefix
    sum is per-shard, so no global single-task sort exists anywhere in
    the plan."""
    sid = F.col(id_col).cast("string")
    shard = F.pmod(
        F.conv(F.substring(F.md5(sid), 1, 8), 16, 10).cast("bigint"), F.lit(shards)
    )
    nt = F.col(n_tokens_col).cast("bigint")
    base = df.select(
        F.col(id_col), nt.alias("__nt"), shard.alias("shard")
    ).filter(F.col("__nt") > 0)
    w = Window.partitionBy("shard").orderBy(F.col(id_col).asc())
    base = base.withColumn("__end", F.sum("__nt").over(w)).withColumn(
        "__start", F.col("__end") - F.col("__nt")
    )
    first_seq = (F.col("__start") / capacity).cast("bigint")
    last_seq = ((F.col("__end") - 1) / capacity).cast("bigint")
    exploded = base.select(
        "shard",
        id_col,
        "__nt",
        "__start",
        "__end",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq"),
    )
    seq_lo = F.col("seq") * capacity
    span_start = F.greatest(F.col("__start"), seq_lo)
    span_end = F.least(F.col("__end"), seq_lo + capacity)
    return exploded.select(
        "shard",
        "seq",
        F.col(id_col),
        (span_start - F.col("__start")).alias("doc_offset"),
        (span_start - seq_lo).alias("seq_offset"),
        (span_end - span_start).alias("span_len"),
    )
