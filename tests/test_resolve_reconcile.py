"""Preference-ranked resolution + reconciliation (modeled on the
reference's test/graphkb.test.js orderPreferredOntologyTerms cases and
test/civic/civic.statement.test.js contentMatching)."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from graphkb_spark.operators.reconcile import RECONCILE_ACTION, reconcile
from graphkb_spark.operators.resolve import RESOLVE_ERROR_COL, preference_order, resolve_unique

ONT = T.StructType(
    [
        T.StructField("sourceId", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("deprecated", T.BooleanType()),
        T.StructField("alias", T.BooleanType()),
        T.StructField("dependency", T.StringType()),
        T.StructField("sourceIdVersion", T.StringType()),
        T.StructField("source_version", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("source_sort", T.IntegerType()),
    ]
)


def test_preference_order(spark):
    """deprecated last, alias last, unversioned first, then the OLDEST
    version — the reference's executable comparator sorts versions
    ascending (src/graphkb.js:160-170, pinned sign-exact by its own
    test/graphkb.test.js:41-57; full port in
    tests/test_reference_fidelity.py)."""
    dim = spark.createDataFrame(
        [
            ("s1", "deprecated", True, False, None, None, None, None, 0),
            ("s1", "alias", False, True, None, None, None, None, 0),
            ("s1", "versioned_old", False, False, None, "2020", None, None, 0),
            ("s1", "versioned_new", False, False, None, "2023", None, None, 0),
            ("s1", "unversioned", False, False, None, None, None, None, 0),
        ],
        ONT,
    )
    ranked = dim.orderBy(*preference_order()).collect()
    assert ranked[0].name == "unversioned"
    assert ranked[1].name == "versioned_old"  # older version wins
    assert ranked[-1].name == "deprecated"


def test_resolve_unique_errors(spark):
    left = spark.createDataFrame([("k1",), ("k2",), ("k3",)], ["key"])
    dim = spark.createDataFrame(
        [("k1", "only", 1), ("k2", "tie_a", 5), ("k2", "tie_b", 5), ("k3", "win", 1),
         ("k3", "lose", 2)],
        ["key", "name", "rank"],
    )
    out = resolve_unique(
        left, dim, ["key"], [F.col("rank").asc(), F.col("name").asc()], strict=True
    )
    got = {r.key: (r.name, r[RESOLVE_ERROR_COL]) for r in out.collect()}
    assert got["k1"] == ("only", None)
    assert got["k3"] == ("win", None)
    # k2 has two matches with the same rank -> ambiguous... but the
    # secondary name ordering breaks the tie only for row_number, not
    # for the strict check (dense_rank on the full prefer tuple)
    assert got["k2"][1] is None  # name asc disambiguates fully
    out2 = resolve_unique(left, dim, ["key"], [F.col("rank").asc()], strict=True)
    got2 = {r.key: r[RESOLVE_ERROR_COL] for r in out2.collect()}
    assert got2["k2"] == "ambiguous"
    left2 = spark.createDataFrame([("kX",)], ["key"])
    out3 = resolve_unique(left2, dim, ["key"], [F.col("rank").asc()])
    assert out3.collect()[0][RESOLVE_ERROR_COL] == "not found"


def test_reconcile_positional_pairing(spark):
    """pass-3 'artificial' pairing of leftovers within a group
    (reference src/civic/statement.js:150-175)."""
    stored = spark.createDataFrame(
        [("g1", "s1", "c1", "rid1"), ("g1", "s2", "c2", "rid2"),
         ("g2", "s9", "c9", "rid9")],
        ["sourceId", "subject", "content", "rid"],
    )
    batch = spark.createDataFrame(
        [("g1", "s1", "c1", "n1"),      # exact match -> update (pass 1)
         ("g1", "s3", "c3", "n2"),      # leftover -> paired with rid2 (pass 3)
         ("g3", "s5", "c5", "n3")],     # new group -> create
        ["sourceId", "subject", "content", "rid"],
    )
    out = reconcile(
        stored, batch, ["sourceId"], ["subject", "content"], ["subject"],
        ["subject", "content"], "rid",
    )
    got = {(r.sourceId, r.subject): (r.rid, r[RECONCILE_ACTION]) for r in out.collect()}
    assert got[("g1", "s1")] == ("rid1", "update")
    assert got[("g1", "s3")] == ("rid2", "update")   # positional pairing
    assert got[("g3", "s5")] == ("n3", "create")
    assert got[("g2", "s9")] == ("rid9", "delete")


def test_survivorship_merge_strategies_and_tiebreak(spark):
    from pyspark.sql import functions as F

    from graphkb_spark.operators.reconcile import survivorship_merge

    rows = [
        (1, "b", 5.0), (1, "a", 9.0), (1, "b", 1.0), (1, "a", 2.0),  # tie a/b
        (2, None, 3.0), (2, "z", 7.0),
    ]
    df = spark.createDataFrame(rows, "cid long, name string, v double")
    out = {r.cid: r for r in survivorship_merge(
        df, "cid", mode_cols=["name"], max_cols=["v"]
    ).collect()}
    assert out[1].name == "a"       # 2-2 tie -> smallest value wins
    assert out[1].v == 9.0
    assert out[2].name == "z"       # nulls never win the mode
    assert out[2].v == 7.0
