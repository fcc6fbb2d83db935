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


def test_scd2_build_collapses_unchanged_and_sets_validity(spark):
    import datetime as dt

    from graphkb_spark.operators.merge import scd2_build

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, "bronze"),
        (1, t0 + dt.timedelta(days=1), "bronze"),   # unchanged -> collapsed
        (1, t0 + dt.timedelta(days=2), "silver"),
        (1, t0 + dt.timedelta(days=3), "gold"),
        (2, t0, "gold"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, tier string")
    out = sorted(
        scd2_build(df, ["user_id"], "ts", ["tier"]).collect(),
        key=lambda r: (r.user_id, r.valid_from),
    )
    u1 = [r for r in out if r.user_id == 1]
    assert [r.tier for r in u1] == ["bronze", "silver", "gold"]
    assert u1[0].valid_to == u1[1].valid_from
    assert u1[1].valid_to == u1[2].valid_from
    assert [r.is_current for r in u1] == [False, False, True]
    u2 = [r for r in out if r.user_id == 2]
    assert len(u2) == 1 and u2[0].is_current and u2[0].valid_to is None


def test_kmv_distinct_exact_below_k_and_estimates_above(spark):
    from graphkb_spark.operators.sketch import kmv_distinct

    rows = [(i % 10, "small") for i in range(100)] + [
        (i, "big") for i in range(5000)
    ]
    df = spark.createDataFrame(rows, "v long, grp string")
    out = {r.grp: r for r in kmv_distinct(df, ["grp"], "v", k=64).collect()}
    assert out["small"].n_kept == 10
    assert out["small"].est_distinct == 10.0  # exact below k
    assert out["big"].n_kept == 64
    # KMV with k=64 has ~1/sqrt(62) ~ 13% relative error
    assert 3500 < out["big"].est_distinct < 6500


def test_kmv_merged_matches_windowed_variant(spark):
    from graphkb_spark.operators.sketch import kmv_distinct, kmv_distinct_merged

    rows = [((i * 131) % 4001, "g%d" % (i % 4)) for i in range(10000)] + [
        (i, "tiny") for i in range(20)
    ]
    df = spark.createDataFrame(rows, "v long, grp string")
    a = sorted(map(tuple, kmv_distinct(df, ["grp"], "v", k=64).collect()))
    b = sorted(map(tuple, kmv_distinct_merged(df, ["grp"], "v", k=64).collect()))
    assert a == b  # the mergeable accumulator is bit-identical
    tiny = [r for r in b if r[0] == "tiny"][0]
    assert tiny[1] == 20 and tiny[2] == 20.0  # exact below k


def test_scd2_build_null_transitions_are_changes(spark):
    # ADVICE r7 (medium): NULL<->value attribute transitions must open a
    # new version; the non-null-safe comparison silently dropped them.
    import datetime as dt

    from graphkb_spark.operators.merge import scd2_build

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, None),                            # open with NULL
        (1, t0 + dt.timedelta(days=1), "silver"), # NULL -> value: change
        (1, t0 + dt.timedelta(days=2), None),     # value -> NULL: change
        (1, t0 + dt.timedelta(days=3), None),     # NULL -> NULL: collapsed
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, tier string")
    out = sorted(
        scd2_build(df, ["user_id"], "ts", ["tier"]).collect(),
        key=lambda r: r.valid_from,
    )
    assert [r.tier for r in out] == [None, "silver", None]
    assert out[0].valid_to == out[1].valid_from
    assert out[1].valid_to == out[2].valid_from
    assert [r.is_current for r in out] == [False, False, True]


def test_kmv_merged_keeps_null_group_keys(spark):
    # ADVICE r7: pandas groupby(dropna=True) made NULL group rows vanish
    # from the mergeable variant while the Spark-groupBy sibling kept
    # them — the bit-identical contract includes null groups.
    from graphkb_spark.operators.sketch import kmv_distinct, kmv_distinct_merged

    rows = [(i, "g") for i in range(30)] + [(i * 7, None) for i in range(25)]
    df = spark.createDataFrame(rows, "v long, grp string")
    a = sorted(map(tuple, kmv_distinct(df, ["grp"], "v", k=64).collect()),
               key=lambda t: (t[0] is None, t))
    b = sorted(map(tuple, kmv_distinct_merged(df, ["grp"], "v", k=64).collect()),
               key=lambda t: (t[0] is None, t))
    assert a == b
    assert any(t[0] is None for t in b)
