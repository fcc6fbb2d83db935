"""MERGE / change-detection semantics (modeled on the reference's
test/graphkb.test.js ``shouldUpdate`` cases: null-like equality,
order-insensitive subsets, upsertCheckExclude)."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from graphkb_spark.operators.merge import ACTION_COL, merge_upsert

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("subsets", T.ArrayType(T.StringType())),
        T.StructField("comment", T.StringType()),
    ]
)


def actions(df):
    return {r.k: r[ACTION_COL] for r in df.collect()}


def test_merge_actions(spark):
    target = spark.createDataFrame(
        [("a", "x", ["s1", "s2"], None), ("b", "y", [], None), ("c", "z", None, None)],
        SCHEMA,
    )
    source = spark.createDataFrame(
        [
            ("a", "x", ["s2", "s1"], None),  # subsets order-insensitive -> noop
            ("b", "y2", [], None),           # changed -> update
            ("d", "new", None, None),        # -> create
        ],
        SCHEMA,
    )
    out = merge_upsert(target, source, ["k"], delete_missing=True)
    assert actions(out) == {"a": "noop", "b": "update", "c": "delete", "d": "create"}


def test_null_like_equality(spark):
    """'' and NULL compare equal (reference src/graphkb.js:68-77)."""
    target = spark.createDataFrame([("a", None, None, None)], SCHEMA)
    source = spark.createDataFrame([("a", "", None, None)], SCHEMA)
    out = merge_upsert(target, source, ["k"])
    assert actions(out) == {"a": "noop"}


def test_upsert_check_exclude(spark):
    """excluded columns never trigger an update (reference
    upsertCheckExclude, src/ncit/index.js:385-387) but ride along when
    something else changed."""
    target = spark.createDataFrame([("a", "x", None, "old"), ("b", "y", None, "old")], SCHEMA)
    source = spark.createDataFrame([("a", "x", None, "NEW"), ("b", "y2", None, "NEW")], SCHEMA)
    out = merge_upsert(target, source, ["k"], exclude=["comment"])
    acts = actions(out)
    assert acts == {"a": "noop", "b": "update"}
    comments = {r.k: r.comment for r in out.collect()}
    assert comments == {"a": "old", "b": "NEW"}


def test_soft_delete_col(spark):
    target = spark.createDataFrame([("a", "x", None, None), ("b", "y", None, None)], SCHEMA)
    source = spark.createDataFrame([("a", "x", None, None)], SCHEMA)
    out = merge_upsert(
        target, source, ["k"], soft_delete_col="deleted", delete_missing=True
    )
    deleted = {r.k: r.deleted for r in out.collect()}
    assert deleted == {"a": False, "b": True}


def test_merge_metrics(spark):
    from graphkb_spark.operators.merge import merge_metrics

    target = spark.createDataFrame([("a", "x", None, None)], SCHEMA)
    source = spark.createDataFrame([("a", "x2", None, None), ("b", "y", None, None)], SCHEMA)
    m = {r[ACTION_COL]: r["count"] for r in merge_metrics(
        merge_upsert(target, source, ["k"])
    ).collect()}
    assert m == {"update": 1, "create": 1}
