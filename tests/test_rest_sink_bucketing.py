"""REST sink retry policy (C4), HTML scrape columns (S16), and the
bucketed co-located join (scale design: exchange-free joins)."""

import pytest
from pyspark.sql import functions as F

from graphkb_spark.sources.readers import extract_links, html_to_text
from graphkb_spark.sources.rest_sink import RetryPolicy, send_with_retry, write_rest


def test_retry_policy_waits():
    p = RetryPolicy()
    assert p.wait_for(429) == 3.0
    assert p.wait_for(500) == 10.0
    assert p.wait_for(503) == 10.0
    assert p.wait_for(400) is None
    assert p.wait_for(404) is None


def test_send_with_retry_recovers_and_gives_up():
    waits = []
    statuses = iter([429, 503, 200])
    ok, status, attempts = send_with_retry(
        ["x"],
        lambda b: next(statuses),
        RetryPolicy(sleep=waits.append),
    )
    assert ok and status == 200 and attempts == 3
    assert waits == [3.0, 10.0]

    ok, status, attempts = send_with_retry(
        ["x"], lambda b: 400, RetryPolicy(sleep=waits.append)
    )
    assert not ok and status == 400 and attempts == 1  # 4xx = fail fast

    ok, status, attempts = send_with_retry(
        ["x"], lambda b: 503, RetryPolicy(retries=2, sleep=lambda s: None)
    )
    assert not ok and attempts == 3  # retries exhausted


def test_write_rest_quarantines_failures(spark):
    df = spark.range(0, 50).select(F.col("id"))

    def send(batch):
        # any batch containing id 13 fails hard (4xx)
        return 422 if any('"id":13' in p for p in batch) else 200

    failed = write_rest(
        df, send, batch_size=10, policy=RetryPolicy(sleep=lambda s: None)
    )
    rows = failed.collect()
    assert len(rows) == 10  # the whole failing batch is quarantined
    assert all(r.error == "http 422" for r in rows)
    ok = write_rest(df, lambda b: 200, batch_size=7)
    assert ok.count() == 0


def test_html_extraction(spark):
    html = (
        '<html><head><style>a{color:red}</style></head><body>'
        '<script>var x = "<a href=\\"junk\\">";</script>'
        '<h1>FDA Approvals</h1>'
        '<a href="/drugs/drug1">Drug One</a> &amp; '
        '<a href="https://example.org/d2">Drug Two</a>'
        '<p>Approved&nbsp;in 2024.</p></body></html>'
    )
    df = spark.createDataFrame([(html,)], ["page"])
    row = df.select(
        extract_links("page", base_url="https://fda.gov").alias("links"),
        html_to_text("page").alias("text"),
    ).collect()[0]
    assert "https://fda.gov/drugs/drug1" in row.links
    assert "https://example.org/d2" in row.links
    assert "FDA Approvals" in row.text and "Approved in 2024." in row.text
    assert "var x" not in row.text and "color:red" not in row.text


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Co-located join: both sides bucketed by the join key -> the
    SortMergeJoin runs with ZERO Exchange (the 100 TB repeated-join
    pattern: bucket once, join forever)."""
    import shutil

    spark.sql("CREATE DATABASE IF NOT EXISTS bktest")
    for t in ("ta", "tb"):
        spark.sql(f"DROP TABLE IF EXISTS bktest.{t}")
        loc = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{loc}/bktest.db/{t}", ignore_errors=True)
    a = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("va")
    )
    b = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") % 11).alias("vb")
    )
    for name, df in [("ta", a), ("tb", b)]:
        df.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable(
            f"bktest.{name}"
        )
    ta, tb = spark.table("bktest.ta"), spark.table("bktest.tb")
    # merge hint: the point is the SMJ path (broadcast would win on this
    # tiny fixture); bucketing must make the SMJ exchange-free
    joined = ta.hint("merge").join(tb.hint("merge"), "k")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert joined.count() == 10000
    spark.sql("DROP TABLE bktest.ta")
    spark.sql("DROP TABLE bktest.tb")
