"""P5 spec validation, §2.9.3 full-reload diff, §2.10 foreachBatch
streaming MERGE."""

import pytest
from pyspark.sql import functions as F

from graphkb_spark.operators.validate import (
    SPEC_ERRORS_COL,
    check_spec,
    full_reload_diff,
    split_valid,
)
from graphkb_spark.streaming.incremental import streaming_upsert


def test_check_spec_and_split(spark):
    df = spark.createDataFrame(
        [(1, "ok", 5.0), (2, None, 5.0), (3, "ok", -1.0), (4, None, -2.0)],
        "id int, name string, score double",
    )
    spec = {
        "name-required": F.col("name").isNotNull(),
        "score-positive": F.col("score") > 0,
    }
    checked = {r.id: r[SPEC_ERRORS_COL] for r in check_spec(df, spec).collect()}
    assert checked[1] == []
    assert checked[2] == ["name-required"]
    assert checked[3] == ["score-positive"]
    assert sorted(checked[4]) == ["name-required", "score-positive"]
    valid, bad = split_valid(df, spec)
    assert {r.id for r in valid.collect()} == {1}
    assert {r.id for r in bad.collect()} == {2, 3, 4}


def test_full_reload_diff(spark):
    original = spark.createDataFrame([("a",), ("b",), ("c",)], ["rid"])
    reloaded = spark.createDataFrame([("b",), ("c",), ("d",)], ["rid"])
    got = {r.rid: r.action for r in full_reload_diff(original, reloaded).collect()}
    assert got == {"a": "delete", "b": "keep", "c": "keep", "d": "create"}
    suppressed = {
        r.rid: r.action
        for r in full_reload_diff(original, reloaded, suppress_delete=True).collect()
    }
    assert suppressed["a"] == "keep-flagged"


def test_streaming_upsert_foreachbatch(spark, tmp_path):
    events = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", "login", 1.0),
            (1, "2024-01-02 10:00:00", "click", 2.0),
            (2, "2024-01-01 09:00:00", "login", 3.0),
        ],
        "user_id int, ts string, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = streaming_upsert(
        spark, events, on=("user_id",), cursor_col="ts", stage_dir=str(tmp_path / "land")
    )
    rows = {r.user_id: r for r in out.collect()}
    assert len(rows) == 2
    assert rows[1].event_type == "click"  # newest ts wins across micro-batches
    assert rows[2].event_type == "login"


def test_stateful_running_totals(spark, tmp_path):
    """applyInPandasWithState keeps per-user state across micro-batches
    (one file per trigger -> 2 batches here)."""
    from graphkb_spark.streaming.stateful import running_user_totals

    schema = "user_id long, ts timestamp, value double"
    b1 = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 1.0), (1, "2024-01-01 11:00:00", 2.0),
         (2, "2024-01-01 10:30:00", 5.0)],
        "user_id long, ts string, value double",
    ).selectExpr("user_id", "cast(ts as timestamp) ts", "value")
    b2 = spark.createDataFrame(
        [(1, "2024-01-02 10:00:00", 4.0)],
        "user_id long, ts string, value double",
    ).selectExpr("user_id", "cast(ts as timestamp) ts", "value")
    land = str(tmp_path / "land")
    b1.write.mode("overwrite").parquet(land)
    b2.write.mode("append").parquet(land)
    out = running_user_totals(spark, spark.read.schema(schema).parquet(land),
                              stage_dir=str(tmp_path / "stage"))
    rows = {r.user_id: (r.n_events, r.total_value) for r in out.collect()}
    assert rows[1] == (3, 7.0)  # state carried across batches
    assert rows[2] == (1, 5.0)


def test_json_spec_compiler(spark):
    """P5 declarative layer: ajv-subset JSON-Schema document compiled
    to Column predicates (nested properties, enum, pattern, bounds,
    required, array items)."""
    from graphkb_spark.operators.validate import (
        SpecCompileError,
        check_json_spec,
        split_valid_json,
    )

    df = spark.createDataFrame(
        [
            (1, ("A", 10.0, "ok"), ["T1", "T2"]),
            (2, ("Z", 10.0, "ok"), ["T1"]),          # enum violation
            (3, ("A", 99.0, "ok"), ["T1"]),          # above maximum
            (4, ("A", 10.0, None), ["bad tag"]),     # item pattern violation
            (5, (None, 10.0, "ok"), None),           # required (nested) violation
        ],
        "id int, meta struct<kind string, score double, note string>, "
        "tags array<string>",
    )
    schema = {
        "properties": {
            "id": {"type": "integer"},
            "meta": {
                "type": "object",
                "properties": {
                    "kind": {"enum": ["A", "B"]},
                    "score": {"type": "number", "maximum": 50},
                    "note": {"type": ["null", "string"]},
                },
                "required": ["kind"],
            },
            "tags": {"type": ["null", "array"], "items": {"pattern": "^T\\d$"}},
        },
        "required": ["id"],
    }
    rows = {r.id: list(r._spec_errors) for r in check_json_spec(df, schema).collect()}
    assert rows[1] == []
    assert rows[2] == ["#/meta/kind: not in enum"]
    assert rows[3] == ["#/meta/score: above maximum 50"]
    assert rows[4] == ["#/tags[]: element pattern unmatched"]
    assert rows[5] == ["#/meta/kind: required"]  # null tags pass

    valid, quarantined = split_valid_json(df, schema)
    assert {r.id for r in valid.collect()} == {1}
    assert quarantined.count() == 4

    # authoring errors are compile-time, not per-row
    with pytest.raises(SpecCompileError):
        check_json_spec(df, {"properties": {"nope": {"type": "string"}}})
    with pytest.raises(SpecCompileError):
        check_json_spec(df, {"properties": {"id": {"type": "string"}}})


def test_json_spec_array_of_structs(spark):
    """items with object properties: required + enum existence checks
    over array elements stay in Column algebra."""
    from graphkb_spark.operators.validate import check_json_spec

    df = spark.createDataFrame(
        [
            (1, [("v1", "Gene")]),
            (2, [("v2", None)]),          # element required violation
            (3, [("v3", "Banana")]),      # element enum violation
        ],
        "id int, variants array<struct<name string, typename string>>",
    )
    schema = {
        "properties": {
            "variants": {
                "type": "array",
                "items": {
                    "properties": {
                        "name": {"type": "string"},
                        "typename": {"enum": ["Gene", "Factor", "Fusion"]},
                    },
                    "required": ["typename"],
                },
            },
        },
    }
    rows = {r.id: list(r._spec_errors) for r in check_json_spec(df, schema).collect()}
    assert rows[1] == []
    assert rows[2] == ["#/variants[]/typename: required"]
    assert rows[3] == ["#/variants[]/typename: not in enum"]


def test_streaming_dedup(spark, tmp_path):
    """dropDuplicatesWithinWatermark: replays inside the watermark
    horizon collapse to one row; state stays bounded by the horizon."""
    from graphkb_spark.streaming.incremental import streaming_dedup

    base = spark.createDataFrame(
        [
            (1, "e1", "2024-01-01 10:00:00"),
            (1, "e2", "2024-01-01 10:05:00"),
            (2, "e3", "2024-01-01 10:10:00"),
        ],
        "user_id int, event_id string, ts_s string",
    ).select("user_id", "event_id", F.col("ts_s").cast("timestamp").alias("ts"))
    replayed = base.unionByName(base)  # at-least-once source replays all
    out = streaming_dedup(
        spark, replayed, key_cols=("user_id", "event_id"),
        query_name="t_stream_dedup", stage_dir=str(tmp_path / "stage"),
    )
    rows = out.collect()
    assert len(rows) == 3
    assert {(r.user_id, r.event_id) for r in rows} == {(1, "e1"), (1, "e2"), (2, "e3")}
