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
    out = ther.withColumn("therapy", combo_name).withColumn(
        "conditions",
        F.array_sort(
            F.concat(
                F.coalesce(F.col("condition_set"), F.array()),
                F.filter(F.array("therapy", "disease"), lambda x: x.isNotNull()),
            )
        ),
    )
    out = out.withColumn(
        "_error",
        F.coalesce(
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
    evidence: DataFrame,
) -> DataFrame:
    """Full sync: build candidates from evidence, reconcile against the
    stored statements per sourceId (J9 3-pass), emit actions.

    ``stored`` columns: ``sourceId``, ``conditions`` array<string>,
    ``relevance``, ``rid``.
    """
    cand = build_statements(spark, evidence).filter(F.col("_error").isNull())
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
