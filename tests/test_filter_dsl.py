"""Filter-DSL compiler semantics (the reference's /query contract,
src/graphkb.js:114-123, :341-372)."""

import pytest

from graphkb_spark.plans import compile_filters, run_query
from graphkb_spark.plans.filter_dsl import FilterDSLError


@pytest.fixture()
def tables(spark):
    people = spark.createDataFrame(
        [
            (1, "alice", 30, "US", None),
            (2, "bob", 25, "CA", "x"),
            (3, "carol", 35, "US", None),
            (4, "dave", 40, "DE", "y"),
        ],
        ["id", "name", "age", "country", "note"],
    )
    countries = spark.createDataFrame(
        [("US", "americas"), ("CA", "americas"), ("DE", "europe")],
        ["code", "continent"],
    )
    return {"people": people, "countries": countries}


def ids(df):
    return sorted(r.id for r in df.select("id").collect())


def test_equality_and_implicit_and(tables):
    out = compile_filters(tables["people"], {"country": "US", "age": 30})
    assert ids(out) == [1]


def test_nested_and_or_not(tables):
    f = {"AND": [{"OR": [{"country": "US"}, {"country": "CA"}]},
                 {"NOT": {"name": "bob"}}]}
    assert ids(compile_filters(tables["people"], f)) == [1, 3]


def test_in_list_and_null(tables):
    assert ids(compile_filters(tables["people"], {"name": ["alice", "dave"]})) == [1, 4]
    assert ids(compile_filters(tables["people"], {"note": None})) == [1, 3]


def test_operators(tables):
    assert ids(compile_filters(tables["people"], {"age": {"operator": ">=", "value": 35}})) == [3, 4]
    assert ids(compile_filters(tables["people"], {"name": {"operator": "CONTAINSTEXT", "value": "ARO"}})) == [3]
    assert ids(compile_filters(tables["people"], {"name": {"operator": "LIKE", "value": "d%"}})) == [4]


def test_link_subquery(tables):
    f = {"country": {"target": "countries", "key": "code",
                     "filters": {"continent": "americas"}, "on": "country"}}
    out = compile_filters(tables["people"], f, tables, {"countries": "code"})
    assert ids(out) == [1, 2, 3]
    # NOT over a subquery
    f2 = {"NOT": f}
    assert ids(compile_filters(tables["people"], f2, tables, {"countries": "code"})) == [4]


def test_run_query_envelope(tables):
    q = {
        "target": "people",
        "filters": {"age": {"operator": ">", "value": 20}},
        "returnProperties": ["id", "name"],
        "orderBy": ["age"],
        "orderByDirection": "DESC",
        "skip": 1,
        "limit": 2,
    }
    rows = run_query(tables, q).collect()
    assert [r.id for r in rows] == [3, 1]
    assert rows[0].asDict().keys() == {"id", "name"}


def test_skip_without_order_rejected(tables):
    with pytest.raises(FilterDSLError):
        run_query(tables, {"target": "people", "skip": 5})


def test_unknown_operator_rejected(tables):
    with pytest.raises(FilterDSLError):
        compile_filters(tables["people"], {"age": {"operator": "BETWEEN", "value": 1}})
