"""CIViC-style statement pipeline (SURVEY §7.6, §3.2; reference
/root/reference/src/civic/index.js:67-500) — the most complex loader,
re-expressed as one batch DataFrame pipeline:

    evidence -> validate -> resolve relevance (broadcast lookup F6)
             -> expand molecular profile to DNF condition sets (F14)
             -> group therapies (SUBSTITUTES vs COMBINATION, F15)
             -> cross-product conditions x therapy groups
             -> content-hash statement candidates
             -> reconcile vs stored statements (J9) -> create/update/delete

Reference per-record await chains (5 HTTP round trips per evidence
item) become 1 broadcast join + 1 UDF + 2 explodes + the reconcile
joins — per 10k evidence items the reference issues ~50k requests; this
plan runs 3 shuffles total regardless of row count.

Therapy-grouping semantics (``resolveTherapies``
/root/reference/src/civic/therapy.js:19-50):
- no therapies            -> one NULL therapy group
- 1 therapy / SUBSTITUTES -> one group per therapy
- COMBINATION/SEQUENTIAL  -> a single group of all therapies (sorted —
  combination names join sorted, src/civic/therapy.js:168-169)
- other interaction types with >1 therapy -> per-row error
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphkb_spark.functions.hashing import stable_hash_named
from graphkb_spark.functions.variant_names import translate_relevance
from graphkb_spark.operators.expand import expand_profiles
from graphkb_spark.operators.reconcile import reconcile

THERAPY_ERR = "unsupported therapy interaction type for multi-therapy statement"

# evidence level / rating descriptions (reference
# /root/reference/src/civic/evidenceLevel.js:1-20 VOCAB)
EVIDENCE_LEVEL_VOCAB = {
    "1": "Claim is not supported well by experimental evidence.",
    "2": "Evidence is not well supported by experimental data.",
    "3": "Evidence is convincing, but not supported by a breadth of experiments.",
    "4": "Strong, well supported evidence.",
    "5": "Strong, well supported evidence from a lab or journal with respected academic standing.",
    "A": "Proven/consensus association in human medicine.",
    "B": "Clinical trial or other primary patient data supports association.",
    "C": "Individual case reports from clinical journals.",
    "D": "In vivo or in vitro models support association.",
    "E": "Indirect evidence.",
}
EVIDENCE_LEVEL_URL = "https://docs.civicdb.org/en/latest/model/evidence.html"


def norm_title(col) -> F.Column:
    """``titlesMatch`` normalization (reference
    /root/reference/src/civic/publication.js:17-21): case/trailing
    period/formatting-tag insensitive."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(
        F.regexp_replace(F.lower(F.trim(c)), r"\.$", ""), r"</?(em|i|bold)>", ""
    )


def resolve_publications(
    evidence: DataFrame,
    pubmed: DataFrame,
    abstracts: DataFrame,
) -> DataFrame:
    """Batch ``getPublication`` (reference
    /root/reference/src/civic/publication.js:30-77).

    Evidence columns used: ``source_type`` (PUBMED|ASCO|other),
    ``citation_id`` (pmid), ``asco_abstract_id``, ``publication_year``,
    ``source_title``, ``source_url``.
    ``pubmed``: (sourceId, rid); ``abstracts``: (abstract_id, year,
    name, sourceId, rid).

    PUBMED rows broadcast-join on pmid; ASCO rows broadcast-join the
    abstracts grouped per id into a candidate array, then filter the
    candidates per row with the year/url/title (``titlesMatch``)
    predicates as a higher-order ``F.filter`` — exactly-one is a
    ``size()`` on the filtered array. 0 or >1 survivors and the
    non-pubmed/non-asco types land in ``_pub_error`` (per-row
    quarantine where the reference throws).

    Scale shape: the evidence table is NEVER exchanged — both dims are
    broadcast, candidate counting happens inside the row (no fan-out
    join + window collapse), so the whole stage is map-side at any
    corpus size.
    """
    pm = F.broadcast(
        pubmed.select(
            F.col("sourceId").cast("string").alias("__pmid"),
            F.col("rid").alias("__pm_rid"),
        ).dropDuplicates(["__pmid"])
    )
    ev = evidence.join(
        pm, (F.col("source_type") == "PUBMED")
        & (F.col("citation_id").cast("string") == F.col("__pmid")), "left"
    ).drop("__pmid")

    ab = F.broadcast(
        abstracts.select(
            F.col("abstract_id").cast("string").alias("__aid"),
            F.struct(
                F.col("year").cast("int").alias("year"),
                norm_title(F.col("name")).alias("name_norm"),
                F.col("sourceId").cast("string").alias("sid"),
                F.col("rid").alias("rid"),
            ).alias("__cand"),
        )
        .groupBy("__aid")
        .agg(F.collect_list("__cand").alias("__cands"))
    )
    ev = ev.join(
        ab, F.col("asco_abstract_id").cast("string") == F.col("__aid"), "left"
    ).drop("__aid")
    title_norm = norm_title(F.col("source_title"))
    matched = F.when(
        F.col("source_type") == "ASCO",
        F.filter(
            F.coalesce(F.col("__cands"), F.array()),
            lambda c: (F.col("publication_year").cast("int") == c.getField("year"))
            & (
                F.col("source_url").isNull()
                | F.col("source_url").contains(c.getField("sid"))
            )
            & (title_norm == c.getField("name_norm")),
        ),
    ).otherwise(F.array().cast("array<struct<year:int,name_norm:string,sid:string,rid:string>>"))
    ev = ev.withColumn("__matched", matched).withColumn(
        "__n_asco", F.size("__matched")
    ).withColumn("__ab_rid", F.array_min(F.transform("__matched", lambda c: c.getField("rid"))))
    err = (
        F.when(
            (F.col("source_type") == "PUBMED") & F.col("__pm_rid").isNull(),
            F.concat(F.lit("PMID "), F.col("citation_id").cast("string"),
                     F.lit(" is not available")),
        )
        .when(
            (F.col("source_type") == "ASCO") & (F.col("__n_asco") == 0),
            F.concat(F.lit("failed to select the relevant abstract ("),
                     F.col("asco_abstract_id").cast("string"), F.lit(")")),
        )
        .when(
            (F.col("source_type") == "ASCO") & (F.col("__n_asco") > 1),
            F.concat(F.lit("too many choices for abstract ("),
                     F.col("asco_abstract_id").cast("string"), F.lit(")")),
        )
        .when(
            ~F.col("source_type").isin("PUBMED", "ASCO"),
            F.concat(F.lit("unable to process non-pubmed/non-asco evidence type ("),
                     F.col("source_type"), F.lit(")")),
        )
    )
    return (
        ev.withColumn("_pub_error", err)
        .withColumn("publication_rid", F.coalesce("__pm_rid", "__ab_rid"))
        .drop("__pm_rid", "__ab_rid", "__cands", "__matched", "__n_asco")
    )


def get_or_create_evidence_levels(
    evidence: DataFrame,
    existing: DataFrame | None,
    source_name: str = "civic",
    source_display: str = "CIViC",
) -> tuple[DataFrame, DataFrame]:
    """Batch ``getEvidenceLevel`` (reference
    /root/reference/src/civic/evidenceLevel.js:30-56): level key =
    lower(evidenceLevel + evidenceRating); existing records (by
    sourceId=name=level under the civic source) are reused, the rest
    are created with the VOCAB descriptions.

    Returns (evidence + ``evidence_level_rid``, new level rows to
    upsert). The reference's per-level cache IS the broadcast join.
    """
    desc_map = F.create_map(
        *[F.lit(x) for kv in EVIDENCE_LEVEL_VOCAB.items() for x in kv]
    )
    lvl = F.lower(
        F.concat(
            F.col("evidence_level").cast("string"),
            F.coalesce(F.col("evidence_rating").cast("string"), F.lit("")),
        )
    )
    ev = evidence.withColumn("__lvl", lvl)
    created = (
        ev.select(
            "__lvl",
            F.col("evidence_level").cast("string").alias("__el"),
            F.col("evidence_rating").cast("string").alias("__er"),
        )
        .dropDuplicates(["__lvl"])
        .select(
            stable_hash_named(
                cls=F.lit("EvidenceLevel"), name="__lvl", source=F.lit(source_name)
            ).alias("rid"),
            F.lit("EvidenceLevel").alias("cls"),
            F.col("__lvl").alias("sourceId"),
            F.col("__lvl").alias("name"),
            F.concat(F.lit(source_display), F.lit(" "), F.upper("__lvl")).alias(
                "displayName"
            ),
            F.concat_ws(
                " ", desc_map[F.col("__el")], desc_map[F.coalesce("__er", F.lit(""))]
            ).alias("description"),
            F.lit(EVIDENCE_LEVEL_URL).alias("url"),
        )
    )
    if existing is not None:
        ex = F.broadcast(
            existing.select(
                F.col("name").alias("__ex_name"), F.col("rid").alias("__ex_rid")
            ).dropDuplicates(["__ex_name"])
        )
        created = created.join(
            ex, created["name"] == F.col("__ex_name"), "left_anti"
        )
        ev = ev.join(ex, ev["__lvl"] == F.col("__ex_name"), "left").withColumn(
            "evidence_level_rid",
            F.coalesce(
                F.col("__ex_rid"),
                stable_hash_named(
                    cls=F.lit("EvidenceLevel"), name="__lvl", source=F.lit(source_name)
                ),
            ),
        ).drop("__ex_name", "__ex_rid")
    else:
        ev = ev.withColumn(
            "evidence_level_rid",
            stable_hash_named(
                cls=F.lit("EvidenceLevel"), name="__lvl", source=F.lit(source_name)
            ),
        )
    return ev.drop("__lvl"), created


def resolve_diseases(evidence: DataFrame, diseases: DataFrame) -> DataFrame:
    """Batch ``getDisease`` (reference
    /root/reference/src/civic/disease.js:12-36): DOID rows match
    ``sourceId = 'doid:<doid>'`` under the disease-ontology source,
    the rest match by name; best match by the preference comparator.

    ``diseases`` columns: ``sourceId``, ``name``, ``rid`` + the
    preference columns (``deprecated``/``alias``/... may be absent —
    ties then resolve by rid). Unmatched rows get ``_disease_error``.

    Scale shape: the preference comparator is applied DIM-side (best
    record per sourceId / per name, a window over the small broadcast
    dimension), so both lookups are 1:1 broadcast equi-joins — no
    fan-out, no window over the evidence table, and no nested-loop
    join from an OR-shaped condition. The evidence table is never
    exchanged.
    """
    from pyspark.sql import Window

    has_dep = "deprecated" in diseases.columns
    dep = (
        F.coalesce(F.col("deprecated"), F.lit(False))
        if has_dep
        else F.lit(False)
    )
    base = diseases.select(
        F.lower(F.col("sourceId")).alias("__key_sid"),
        F.lower(F.col("name")).alias("__key_name"),
        F.col("rid").alias("__d_rid"),
        dep.alias("__d_dep"),
    )

    def best_per(key: str, out_col: str):
        w = Window.partitionBy(key).orderBy(
            F.col("__d_dep").asc(), F.col("__d_rid").asc_nulls_last()
        )
        return F.broadcast(
            base.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(F.col(key), F.col("__d_rid").alias(out_col))
        )

    by_sid = best_per("__key_sid", "__rid_by_sid")
    by_name = best_per("__key_name", "__rid_by_name")

    has_doid = F.col("doid").isNotNull()
    ev = (
        evidence.join(
            by_sid,
            F.concat(F.lit("doid:"), F.col("doid").cast("string"))
            == F.col("__key_sid"),
            "left",
        )
        .drop("__key_sid")
        .join(by_name, F.lower(F.col("disease")) == F.col("__key_name"), "left")
        .drop("__key_name")
    )
    rid = F.when(
        F.col("disease").isNotNull(),
        F.when(has_doid, F.col("__rid_by_sid")).otherwise(F.col("__rid_by_name")),
    )
    return (
        ev.withColumn("disease_rid", rid)
        .withColumn(
            "_disease_error",
            F.when(
                F.col("disease").isNotNull() & rid.isNull(),
                F.concat(F.lit("disease not found: "), F.col("disease")),
            ),
        )
        .drop("__rid_by_sid", "__rid_by_name")
    )


def group_therapies(
    df: DataFrame,
    therapies_col: str = "therapies",
    interaction_col: str = "therapyInteractionType",
    out_col: str = "therapy_group",
) -> DataFrame:
    """``resolveTherapies`` as Column algebra: produce
    ``array<array<string>>`` of therapy groups, then explode. Dedup via
    array_distinct on sorted groups (the reference Set-of-JSON dedups,
    src/civic/therapy.js:42-47)."""
    t = F.col(therapies_col)
    ia = F.col(interaction_col)
    n = F.coalesce(F.size(t), F.lit(0))
    groups = (
        F.when(n == 0, F.array(F.array(F.lit(None).cast("string"))))
        .when((n == 1) | (ia == "SUBSTITUTES"), F.transform(t, lambda x: F.array(x)))
        .when(ia.isin("COMBINATION", "SEQUENTIAL"), F.array(F.array_sort(t)))
    )
    err = F.when(groups.isNull(), F.lit(THERAPY_ERR))
    return (
        df.withColumn("__groups", F.array_distinct(groups))
        .withColumn("_therapy_error", err)
        .select("*", F.explode_outer("__groups").alias(out_col))
        .drop("__groups")
    )


def build_statements(
    spark: SparkSession,
    evidence: DataFrame,
    profile_col: str = "profile_expr",
) -> DataFrame:
    """Expand evidence items into statement candidates.

    Expected evidence columns: ``sourceId``, ``profile_expr`` (boolean
    variant expression), ``therapies`` array<string>,
    ``therapyInteractionType``, ``evidence_type``, ``direction``,
    ``significance``, ``disease``.

    Output: one row per (condition_set x therapy_group) with
    ``conditions`` (sorted: variants + therapy combo + disease),
    ``relevance``, ``content_key`` (stable hash) and per-row error
    columns — invalid profiles/therapy configs are quarantined rows,
    never failures.
    """
    rel = translate_relevance(evidence, spark)
    prof = expand_profiles(rel, profile_col)  # adds condition_set
    ther = group_therapies(prof)
    combo_name = F.when(
        F.size(F.filter("therapy_group", lambda x: x.isNotNull())) > 0,
        F.array_join(F.array_sort("therapy_group"), " + "),
    )
    # resolved disease rid (resolve_diseases stage) is preferred in the
    # conditions set; pipelines without the stage keep the raw name
    disease_cond = (
        F.col("disease_rid") if "disease_rid" in ther.columns else F.col("disease")
    )
    out = ther.withColumn("therapy", combo_name).withColumn(
        "conditions",
        F.array_sort(
            F.concat(
                F.coalesce(F.col("condition_set"), F.array()),
                F.filter(F.array(F.col("therapy"), disease_cond), lambda x: x.isNotNull()),
            )
        ),
    )
    stage_errors = [
        F.col(c) for c in ("_pub_error", "_disease_error") if c in ther.columns
    ]
    out = out.withColumn(
        "_error",
        F.coalesce(
            *stage_errors,
            F.col("_therapy_error"),
            F.when(F.col("condition_set").isNull(), F.lit("invalid profile expression")),
            F.when(F.col("relevance").isNull(), F.lit("untranslatable relevance")),
        ),
    )
    return out.withColumn(
        "content_key",
        stable_hash_named(
            sourceId="sourceId",
            conditions="conditions",
            relevance="relevance",
        ),
    )


def sync_statements(
    spark: SparkSession,
    stored: DataFrame,
    evidence: DataFrame | None = None,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Full sync: build candidates from evidence (or take prebuilt
    ``candidates`` from a pipeline that already ran the resolve
    stages), reconcile against the stored statements per sourceId (J9
    3-pass), emit actions.

    ``stored`` columns: ``sourceId``, ``conditions`` array<string>,
    ``relevance``, ``rid``.
    """
    if candidates is None:
        candidates = build_statements(spark, evidence)
    cand = (
        candidates.filter(F.col("_error").isNull())
        if "_error" in candidates.columns
        else candidates
    )
    batch = cand.select(
        "sourceId",
        F.col("conditions").cast("array<string>").alias("conditions"),
        "relevance",
        F.col("content_key").alias("rid"),  # provisional id for creates
    ).dropDuplicates(["sourceId", "rid"])
    st = stored.select("sourceId", "conditions", "relevance", "rid")
    # content keys: strong = conditions+relevance, weak = relevance only
    b = batch.withColumn("__ck", F.concat_ws("|", F.array_sort("conditions"))).withColumn(
        "__wk", F.col("relevance")
    )
    s = st.withColumn("__ck", F.concat_ws("|", F.array_sort("conditions"))).withColumn(
        "__wk", F.col("relevance")
    )
    return reconcile(
        s,
        b,
        group_key=["sourceId"],
        strong_key=["__ck"],
        weak_key=["__wk"],
        order=["__ck", "__wk"],
        id_col="rid",
    ).drop("__ck", "__wk")


def apply_statement_actions(
    stored: DataFrame, actions: DataFrame, delete_suppressed: bool = False
) -> DataFrame:
    """Apply a reconcile actions frame back onto the statements table —
    the write half of §2.9.2 (reference src/civic/index.js:340-409:
    create + update-if-changed + soft-delete, deletes suppressed when
    the load had errors or flags say so).

    Returns the new statements table: updates replace the stored row's
    content under its rid, creates append, deletes drop (or stay when
    ``delete_suppressed``).
    """
    keep_cols = [c for c in stored.columns]
    upserts = actions.filter(F.col("_action").isin("update", "create")).select(keep_cols)
    if delete_suppressed:
        deleted_ids = actions.limit(0).select("rid")
    else:
        deleted_ids = actions.filter(F.col("_action") == "delete").select("rid")
    survivors = (
        stored.join(deleted_ids, "rid", "left_anti")
        .join(upserts.select("rid"), "rid", "left_anti")  # replaced by update rows
    )
    return survivors.unionByName(upserts)
