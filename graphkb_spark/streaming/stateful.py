"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no true streaming (SURVEY §2.10) — this is the
engine's forward-looking path for the incremental-cron use case: keep
per-key state across micro-batches (running totals, open sessions)
without reprocessing history.

``running_user_totals`` maintains, per user, a running event count and
value sum across ALL micro-batches — the stateful generalization of the
clinicaltrials watermark upsert: arbitrary aggregation state, exactly
one row emitted per (user, batch) with the totals so far.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

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
