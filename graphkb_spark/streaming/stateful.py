"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no true streaming (SURVEY §2.10) — this is the
engine's forward-looking path for the incremental-cron use case: keep
per-key state across micro-batches (running totals, open sessions)
without reprocessing history.

- ``running_user_totals``: per-user running event count and value sum
  across ALL micro-batches — the stateful generalization of the
  clinicaltrials watermark upsert.
- ``streaming_sessionize``: gap-based sessionization with BOUNDED
  per-user state and event-time timeouts — sessions close either when
  a same-user event arrives past the gap (in-data close) or when the
  watermark passes last_event + gap (timeout close). The streaming
  twin of ``incremental.sessionize``; state is one open session per
  user regardless of history length.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from graphkb_spark.session import normalize_ntz

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
    )


def running_user_totals(
    spark: SparkSession,
    events: DataFrame,
    stage_dir: str | None = None,
    query_name: str = "running_totals",
) -> DataFrame:
    """Drive the stateful query over a parquet landing zone (one file
    per micro-batch) and return the final per-user totals.

    In production the source is a live stream and the sink is
    downstream; ``processAllAvailable`` + memory sink make the local
    run deterministic and testable.
    """
    import tempfile

    stage_dir = stage_dir or tempfile.mkdtemp(prefix=f"gks_state_{query_name}_")
    events.write.mode("overwrite").parquet(stage_dir)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage_dir)
    )
    updated = stream.groupBy("user_id").applyInPandasWithState(
        _update,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
    q = (
        updated.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # memory sink in update mode appends every emission; the final state
    # per user is the last row emitted (highest n_events)
    sink = spark.sql(f"SELECT * FROM {query_name}")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        sink.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

# open session per user: (start_us, last_us, n_events)
SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _make_session_update(gap_minutes: int, ts_col: str):
    gap_us = gap_minutes * 60 * 1_000_000

    import numpy as np

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # HOT PATH: called once per (group, micro-batch) across the
        # Arrow worker boundary — per-call cost is the dominant term of
        # the whole streaming query, so everything here is numpy with
        # no intermediate pandas objects.
        closed: list[tuple] = []
        if state.hasTimedOut:
            # watermark passed last_event + gap: the open session closes
            start, last, n = state.get
            closed.append((key[0], start, last, n))
            state.remove()
        else:
            arrs = [pdf[ts_col].to_numpy(dtype="datetime64[ns]") for pdf in pdfs]
            ts_ns = arrs[0] if len(arrs) == 1 else np.concatenate(arrs)
            ts_us = ts_ns.astype("int64") // 1000  # ns -> us
            ts_us.sort()
            start, last, n = state.get if state.exists else (None, None, 0)
            for t in ts_us.tolist():
                if start is None:
                    start, last, n = t, t, 1
                elif t - last > gap_us:
                    closed.append((key[0], start, last, n))
                    start, last, n = t, t, 1
                else:
                    last, n = max(last, t), n + 1
            state.update((start, last, n))
            # schedule the timeout close; the timestamp must sit past the
            # current watermark (a user idle for many batches would
            # otherwise schedule into the past)
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max((last + gap_us) // 1000, wm_ms + 1))
        cols = np.array([c[1:] for c in closed], dtype="int64").reshape(-1, 3)
        yield pd.DataFrame(
            {
                "user_id": np.full(len(closed), key[0], dtype="int64"),
                "session_start": cols[:, 0].astype("datetime64[us]"),
                "session_end": cols[:, 1].astype("datetime64[us]"),
                "n_events": cols[:, 2],
            }
        )

    return update


def streaming_sessionize(
    spark: SparkSession,
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    stage_dir: str | None = None,
    query_name: str = "stream_sessions",
    state_partitions: int | None = None,
) -> DataFrame:
    """Streaming gap-sessionization: emits each CLOSED session exactly
    once (append mode). A session closes when a same-user event lands
    past the gap, or when the event-time watermark (delay = gap)
    passes last_event + gap. Sessions still open at end-of-input stay
    in state and are NOT emitted — a live pipeline keeps them open by
    design; flush on decommission if required.

    Scale shape: state is bounded at one open session per active user
    (three longs), timeouts garbage-collect idle users, and the
    watermark bounds how long a user can stay idle before the state is
    dropped — this is the membership-bounded alternative to re-running
    the batch lag+cumsum over ever-growing history.

    ``state_partitions`` pins the query's state-store partition count
    (captured from ``spark.sql.shuffle.partitions`` at query start and
    then immutable for the query's life). Every state partition pays a
    fixed per-micro-batch commit + maintenance cost, so size it to the
    ACTIVE-KEY count, not the cluster: the local default (32) spends
    more wall-clock on empty-partition commits than on sessionizing.
    At real scale raise it — it bounds state parallelism forever."""
    import tempfile

    stage_dir = stage_dir or tempfile.mkdtemp(prefix=f"gks_state_{query_name}_")
    # stage ONLY the columns the session query reads — halves the
    # landing-zone write/scan vs shipping the full event row
    events = normalize_ntz(events).select(user_col, ts_col)
    events.write.mode("overwrite").parquet(stage_dir)
    stream = spark.readStream.schema(events.schema).parquet(stage_dir)
    sessions = (
        stream.withWatermark(ts_col, f"{gap_minutes} minutes")
        .groupBy(user_col)
        .applyInPandasWithState(
            _make_session_update(gap_minutes, ts_col),
            SESSION_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            sessions.writeStream.outputMode("append")
            .format("memory")
            .queryName(query_name)
            .start()
        )
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    q.processAllAvailable()
    q.stop()
    return spark.table(query_name)


def streaming_sessionize_native(
    spark: SparkSession,
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    stage_dir: str | None = None,
    query_name: str = "stream_sessions_native",
    state_partitions: int | None = None,
) -> DataFrame:
    """Gap-sessionization with Spark's NATIVE ``session_window``
    aggregation — the Spark-first counterpart of
    ``streaming_sessionize``: the whole stateful merge runs JVM-side
    (no Python boundary, no per-group Arrow protocol), so prefer this
    whenever the per-session result is expressible as built-in
    aggregates; the ``applyInPandasWithState`` variant remains for
    genuinely custom state transitions.

    Emission semantics differ from the custom operator at the margin:
    append mode emits a session only once the event-time watermark
    passes its end, so a session closed by a later in-data event whose
    end still sits inside the final watermark horizon stays unemitted
    here (the custom operator emits it immediately). Equivalently a
    session is emitted iff session_end + 2*gap <= max(ts) over the
    input — the SQL oracle encodes exactly that. Two adjacent events
    exactly ``gap`` apart MERGE into one session (the window boundary
    is closed — one tick further apart and they split); the custom
    operator's strict ``t - last > gap`` break agrees at that exact
    boundary, so the two operators produce the same session set and
    differ only in append-mode emission timing.

    Scale shape: one keyed state aggregation, state bounded at one
    open window per active user; ``state_partitions`` as in
    ``streaming_sessionize``."""
    import tempfile

    from pyspark.sql import functions as F

    stage_dir = stage_dir or tempfile.mkdtemp(prefix=f"gks_state_{query_name}_")
    events = normalize_ntz(events).select(user_col, ts_col)
    events.write.mode("overwrite").parquet(stage_dir)
    stream = spark.readStream.schema(events.schema).parquet(stage_dir)
    sessions = (
        stream.withWatermark(ts_col, f"{gap_minutes} minutes")
        .groupBy(
            F.col(user_col),
            F.session_window(F.col(ts_col), f"{gap_minutes} minutes").alias("__w"),
        )
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(user_col, "session_start", "session_end", "n_events")
    )
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            sessions.writeStream.outputMode("append")
            .format("memory")
            .queryName(query_name)
            .start()
        )
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    q.processAllAvailable()
    q.stop()
    return spark.table(query_name)
