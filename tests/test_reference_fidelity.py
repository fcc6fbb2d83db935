"""Sign-exact port of the reference's own Jest suite
(/root/reference/test/graphkb.test.js) — comparator return values,
``shouldUpdate`` outcomes, and ``simplifyRecordsLinks`` transforms.

Why this file exists: the reference's comments say "prefer newer
version" but its executable comparator (src/graphkb.js:158-170)
returns -1 when term1's version is SMALLER — the older version sorts
first and ``getUniqueRecordBy`` takes records[0] (src/graphkb.js:409-417),
so the OLDER version wins.  Its Jest tests pin the executable
semantics (test/graphkb.test.js:41-57).  Porting only the scenarios
(not the signs) let an inverted ordering survive 16 rounds — these
cases assert the exact -1/0/+1 values so a sign error cannot recur.

Three layers are pinned:
1. ``order_preferred_ontology_terms`` — the clean-room Python port of
   the executable comparator (the fidelity spec).
2. ``preference_order()`` — the distributed Column embodiment; its
   sort winner must agree with the comparator wherever the comparator
   defines a strict order.
3. ``merge_upsert`` / ``simplify_record_links`` — the shouldUpdate and
   simplifyRecordsLinks blocks (test/graphkb.test.js:108-280).
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from graphkb_spark.operators.merge import (
    ACTION_COL,
    merge_upsert,
    simplify_record_links,
)
from graphkb_spark.operators.resolve import (
    order_preferred_ontology_terms,
    preference_order,
)

# ---------------------------------------------------------------------------
# orderPreferredOntologyTerms — sign-exact (test/graphkb.test.js:7-106)
# ---------------------------------------------------------------------------

COMPARATOR_CASES = [
    # test/graphkb.test.js:8-15 'prefer non-deprecated'
    ("non-deprecated beats deprecated (fwd)",
     {"deprecated": True}, {"deprecated": False}, 1),
    ("non-deprecated beats deprecated (rev)",
     {"deprecated": False}, {"deprecated": True}, -1),
    # :17-30 'prefer terms with independent sourceId'
    ("alias False beats alias True",
     {"alias": False}, {"alias": True}, -1),
    ("alias True loses to alias False",
     {"alias": True}, {"alias": False}, 1),
    ("no dependency beats dependency",
     {}, {"dependency": True}, -1),
    ("dependency loses to no dependency",
     {"dependency": True}, {}, 1),
    # :32-39 'prefer generic to versioned terms'
    ("null version beats empty-string version",
     {}, {"sourceIdVersion": ""}, -1),
    ("empty-string version loses to null version",
     {"sourceIdVersion": ""}, {}, 1),
    # :41-48 'prefer newer version of same record' — the test NAME says
    # newer but the pinned assertion prefers the OLDER (smaller) value:
    # cmp({'2019-10-08'}, {'2020-10-08'}) === -1  (graphkb.js:160-164)
    ("SMALLER sourceIdVersion sorts first",
     {"sourceIdVersion": "2019-10-08"}, {"sourceIdVersion": "2020-10-08"}, -1),
    ("LARGER sourceIdVersion sorts last",
     {"sourceIdVersion": "2020-10-08"}, {"sourceIdVersion": "2019-10-08"}, 1),
    # :50-59 'prefer newer source version of same record' — again the
    # pinned assertion prefers the SMALLER source.version
    ("SMALLER source.version sorts first (same sourceIdVersion)",
     {"source": {"version": 1}, "sourceIdVersion": "2019-10-08"},
     {"source": {"version": 2}, "sourceIdVersion": "2019-10-08"}, -1),
    ("LARGER source.version sorts last (same sourceIdVersion)",
     {"source": {"version": 2}, "sourceIdVersion": "2019-10-08"},
     {"source": {"version": 1}, "sourceIdVersion": "2019-10-08"}, 1),
    # :61-70 'prefer terms with descriptions' — truthy check: '' loses
    ("description beats empty description",
     {"description": "a description", "sourceIdVersion": "2019-10-08"},
     {"description": "", "sourceIdVersion": "2019-10-08"}, -1),
    ("empty description loses to description",
     {"description": "", "sourceIdVersion": "2019-10-08"},
     {"description": "a description", "sourceIdVersion": "2019-10-08"}, 1),
    # :72-97 'use source rank to sort results' (different sourceIds ->
    # the source.sort branch, graphkb.js:178-194)
    ("smaller source.sort first",
     {"source": {"sort": 1}, "sourceId": 1},
     {"source": {"sort": 2}, "sourceId": 2}, -1),
    ("larger source.sort last",
     {"source": {"sort": 2}, "sourceId": 1},
     {"source": {"sort": 1}, "sourceId": 2}, 1),
    ("smaller source.version first (different sourceIds)",
     {"source": {"version": 1}, "sourceId": 1},
     {"source": {"version": 2}, "sourceId": 2}, -1),
    ("larger source.version last (different sourceIds)",
     {"source": {"version": 2}, "sourceId": 1},
     {"source": {"version": 1}, "sourceId": 2}, 1),
    ("description first (different sourceIds)",
     {"description": "a description", "source": {}, "sourceId": 1},
     {"description": "", "source": {}, "sourceId": 2}, -1),
    ("no description last (different sourceIds)",
     {"description": "", "source": {}, "sourceId": 1},
     {"description": "a description", "source": {}, "sourceId": 2}, 1),
    # :99-104 'fallback to 0 if there is no prefered one'
    ("no preference -> 0",
     {"source": {}, "sourceId": 1}, {"source": {}, "sourceId": 2}, 0),
]


@pytest.mark.parametrize(
    "label,t1,t2,expected", COMPARATOR_CASES, ids=[c[0] for c in COMPARATOR_CASES]
)
def test_order_preferred_ontology_terms_sign_exact(label, t1, t2, expected):
    assert order_preferred_ontology_terms(t1, t2) == expected


# ---------------------------------------------------------------------------
# preference_order() Column embodiment agrees with the comparator
# ---------------------------------------------------------------------------

_ONT = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("sourceId", T.StringType()),
        T.StructField("deprecated", T.BooleanType()),
        T.StructField("alias", T.BooleanType()),
        T.StructField("dependency", T.StringType()),
        T.StructField("sourceIdVersion", T.StringType()),
        T.StructField("source_version", T.IntegerType()),
        T.StructField("description", T.StringType()),
        T.StructField("source_sort", T.IntegerType()),
    ]
)


def _winner(spark, rows):
    df = spark.createDataFrame(rows, _ONT)
    return df.orderBy(*preference_order()).first().name


def test_column_sort_prefers_older_version(spark):
    """The distributed sort must pick the row the reference's
    getUniqueRecordBy would (records[0] of the ascending comparator
    sort): the OLDER sourceIdVersion (test/graphkb.test.js:41-47)."""
    rows = [
        ("old", "s1", False, False, None, "2019-10-08", None, None, None),
        ("new", "s1", False, False, None, "2020-10-08", None, None, None),
    ]
    assert _winner(spark, rows) == "old"


def test_column_sort_prefers_lower_source_version(spark):
    """test/graphkb.test.js:50-57 — source.version 1 beats 2."""
    rows = [
        ("v2", "s1", False, False, None, "2019-10-08", 2, None, None),
        ("v1", "s1", False, False, None, "2019-10-08", 1, None, None),
    ]
    assert _winner(spark, rows) == "v1"


def test_column_sort_description_truthiness(spark):
    """'' is falsy in the reference's description check
    (graphkb.js:172-176) — an empty description must lose just like a
    NULL one (test/graphkb.test.js:61-70)."""
    rows = [
        ("blank", "s1", False, False, None, "2019-10-08", None, "", None),
        ("described", "s1", False, False, None, "2019-10-08", None, "a description", None),
    ]
    assert _winner(spark, rows) == "described"


def test_column_sort_full_ladder(spark):
    """All comparator levels at once: the total-order completion must
    rank deprecated last, alias below, versioned below unversioned,
    and among versioned the OLDEST first."""
    rows = [
        ("deprecated", "s1", True, False, None, None, None, None, 0),
        ("alias", "s1", False, True, None, None, None, None, 0),
        ("dependent", "s1", False, False, "dep", None, None, None, 0),
        ("v2023", "s1", False, False, None, "2023", None, None, 0),
        ("v2020", "s1", False, False, None, "2020", None, None, 0),
        ("unversioned", "s1", False, False, None, None, None, None, 0),
    ]
    df = spark.createDataFrame(rows, _ONT)
    ranked = [r.name for r in df.orderBy(*preference_order()).collect()]
    assert ranked[0] == "unversioned"
    assert ranked[1] == "v2020"          # older version wins among versioned
    assert ranked[2] == "v2023"
    assert ranked[-1] == "deprecated"
    assert set(ranked[3:5]) == {"alias", "dependent"}


def test_column_sort_agrees_with_comparator_pairwise(spark):
    """Wherever the executable comparator strictly orders two rows that
    the Column model can represent (flat ontology columns), the Column
    sort must place the winner first."""
    flat_pairs = [
        (c[1], c[2], c[3])
        for c in COMPARATOR_CASES
        if c[3] != 0 and "source" not in {*c[1], *c[2]} - {"sourceId"}
    ]

    def to_row(name, t):
        return (
            name,
            str(t.get("sourceId", "s")),
            t.get("deprecated"),
            t.get("alias"),
            ("dep" if t.get("dependency") else None),
            (str(t["sourceIdVersion"]) if "sourceIdVersion" in t else None),
            None,
            t.get("description"),
            None,
        )

    for t1, t2, expected in flat_pairs:
        rows = [to_row("t1", t1), to_row("t2", t2)]
        got = _winner(spark, rows)
        want = "t1" if expected == -1 else "t2"
        assert got == want, f"{t1} vs {t2}: column sort picked {got}, want {want}"


# ---------------------------------------------------------------------------
# simplifyRecordsLinks (test/graphkb.test.js:247-280)
# ---------------------------------------------------------------------------

UNCHANGED = [123, 123.0, "abc", None, False, {}, {"a": 1, "b": 1},
             {"@rid": 123, "a": 1}]


@pytest.mark.parametrize("value", UNCHANGED, ids=[repr(v) for v in UNCHANGED])
def test_simplify_does_not_change(value):
    assert simplify_record_links(value) == value


def test_simplify_unnests_links():
    cases = [
        ({"a": [{"@rid": 123, "aa": 1}, {"ab": 2}]}, {"a": ["123", {"ab": 2}]}),
        ({"a": {"@rid": 123, "aa": 1}, "b": 2}, {"a": "123", "b": 2}),
        ({"a": {"@rid": 123, "a": {"@rid": 123, "aa": 1}}}, {"a": "123"}),
    ]
    for given, want in cases:
        assert simplify_record_links(given) == want


# ---------------------------------------------------------------------------
# shouldUpdate (test/graphkb.test.js:108-245) — via merge_upsert actions
# ---------------------------------------------------------------------------

DISEASE = {
    "sourceId": "c101220",
    "alias": True,
    "deprecated": False,
    "description": "congenital abnormality characterized by the presence"
                   " of only one kidney.",
    "displayName": "congenital single kidney [c101220]",
    "in_AliasOf": ["#67:21022", "#66:23"],
    "name": "congenital single kidney",
    "out_AliasOf": ["#66:31991"],
    "source": "#40:3",
    "url": "http://ncicb.nci.nih.gov/xml/owl/evs/thesaurus.owl#c101220",
}
DISEASE_SCHEMA = (
    "sourceId string, alias boolean, deprecated boolean, description string,"
    " displayName string, in_AliasOf array<string>, name string,"
    " out_AliasOf array<string>, source string, url string"
)

STATEMENT = {
    "sourceId": "4",
    "conditions": ["#159:5192", "#135:9855"],
    "description": "Young AML patients (<60 years old) with DNMT3A mutations...",
    "displayNameTemplate": "{conditions:variant} {relevance} of {subject} ({evidence})",
    "evidence": ["#118:774"],
    "evidenceLevel": ["#106:3"],
    "relevance": "#148:2",
    "reviewStatus": "not required",
    "source": "#38:1",
    "subject": "#135:9855",
}
STATEMENT_SCHEMA = (
    "sourceId string, conditions array<string>, description string,"
    " displayNameTemplate string, evidence array<string>,"
    " evidenceLevel array<string>, relevance string, reviewStatus string,"
    " source string, subject string"
)


def _merge_action(spark, schema, original, new, exclude):
    tgt = spark.createDataFrame([tuple(original.values())], schema)
    src = spark.createDataFrame([tuple(new.values())], schema)
    out = merge_upsert(tgt, src, on=["sourceId"], exclude=exclude)
    return out.first()[ACTION_COL]


SHOULD_UPDATE_CASES = [
    # (model fixture, schema, changed field, new value, exclude, expect)
    ("disease: true when non-excluded field changes",
     DISEASE, DISEASE_SCHEMA, "name", "a new name", ["displayName"], "update"),
    ("disease: false when changed field is excluded",
     DISEASE, DISEASE_SCHEMA, "displayName", "a new display name",
     ["displayName"], "noop"),
    ("disease: false when same object and no fields excluded",
     DISEASE, DISEASE_SCHEMA, None, None, [], "noop"),
    ("statement: true when non-excluded field changes",
     STATEMENT, STATEMENT_SCHEMA, "description", "a new description",
     ["reviewStatus"], "update"),
    ("statement: false when changed field is excluded",
     STATEMENT, STATEMENT_SCHEMA, "reviewStatus", "pending",
     ["reviewStatus"], "noop"),
    ("statement: false when same object and no fields excluded",
     STATEMENT, STATEMENT_SCHEMA, None, None, [], "noop"),
]


@pytest.mark.parametrize(
    "label,fixture,schema,field,value,exclude,expect",
    SHOULD_UPDATE_CASES,
    ids=[c[0] for c in SHOULD_UPDATE_CASES],
)
def test_should_update_cases(spark, label, fixture, schema, field, value,
                             exclude, expect):
    new = dict(fixture)
    if field is not None:
        new[field] = value
    assert _merge_action(spark, schema, fixture, new, exclude) == expect


def test_should_update_false_when_linked_record_changes(spark):
    """test/graphkb.test.js:153-173 — a change inside a LINKED record
    must not trigger an update: simplifyRecordsLinks collapses the link
    to its rid before comparison."""
    source_rec = {
        "@rid": "#40:3",
        "description": "nci thesaurus (ncit) provides reference terminology",
        "displayName": "NCIt",
        "name": "ncit",
        "sort": 2,
    }
    original = dict(DISEASE, source=dict(source_rec))
    changed = dict(DISEASE, source=dict(source_rec, name="a new source name"))
    orig_flat = simplify_record_links(original)
    new_flat = simplify_record_links(changed)
    assert orig_flat["source"] == "#40:3" and new_flat["source"] == "#40:3"
    assert _merge_action(spark, DISEASE_SCHEMA, orig_flat, new_flat, []) == "noop"
