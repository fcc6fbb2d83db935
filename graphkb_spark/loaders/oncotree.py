"""Oncotree-style versioned-ontology loader (SURVEY §7.3 / §2.6 W3;
reference /root/reference/src/oncotree/index.js:27-175).

Reference behavior: ontology versions sorted by release date form a
ladder (each version linked to its ``previous``); a code present in
version v-1 but absent in v, whose id appears in the ``history`` of a
code in v, is deprecated-by that code.

Spark shape: the version ladder is ``lag(version) OVER (ORDER BY
version)`` on the *distinct versions* (a tiny table); the disappeared
set is one anti-join per adjacent pair expressed as a single self-join
on (code, prev_version) — no driver loop over versions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graphkb_spark.kb import KnowledgeBase, load_ontology_records, source_rid


def version_ladder(records: DataFrame, version_col: str = "version") -> DataFrame:
    """Distinct versions with their predecessor (W3 lag)."""
    w = Window.orderBy(F.col(version_col).asc())
    return (
        records.select(version_col)
        .distinct()
        .withColumn("prev_version", F.lag(version_col).over(w))
    )


def deprecated_by(records: DataFrame) -> DataFrame:
    """(old_code, new_code, version) rows: old_code existed in the
    previous version, is absent in this one, and appears in the
    ``history`` array of new_code.

    Input columns: ``version``, ``code``, ``history`` (array<string>).
    """
    ladder = version_ladder(records)
    cur = records.join(F.broadcast(ladder), "version").filter(
        F.col("prev_version").isNotNull()
    )
    prev_codes = records.select(
        F.col("version").alias("prev_version"), F.col("code").alias("old_code")
    )
    # candidates: history entries of current-version codes that match a
    # previous-version code...
    hist = cur.select(
        "version", "prev_version", F.col("code").alias("new_code"),
        F.explode("history").alias("old_code"),
    ).join(prev_codes, ["prev_version", "old_code"], "left_semi")
    # ...and the old code must actually be gone from this version
    still_here = records.select("version", F.col("code").alias("old_code"))
    return hist.join(still_here, ["version", "old_code"], "left_anti").select(
        "old_code", "new_code", "version"
    )


def load_oncotree(
    spark: SparkSession,
    kb: KnowledgeBase,
    records: DataFrame,
    source_name: str = "oncotree",
) -> KnowledgeBase:
    """Versioned load: one term per (code, version) with
    ``sourceIdVersion``; SubClassOf from ``parent`` within each version;
    DeprecatedBy across the version ladder.

    Input columns: ``version``, ``code``, ``name``, ``parent``
    (nullable), ``history`` (array<string>).
    """
    dep = deprecated_by(records)

    recs = records.select(
        # versioned natural key: code@version, preference ranking then
        # favors the unversioned/newest rows exactly like the reference
        F.concat(F.lower("code"), F.lit("@"), F.col("version")).alias("sourceId"),
        F.col("version").alias("sourceIdVersion"),
        F.lower("name").alias("name"),
        F.lit("Disease").alias("cls"),
        F.when(
            F.col("parent").isNotNull(),
            F.array(F.concat(F.lower("parent"), F.lit("@"), F.col("version"))),
        ).alias("subclassof"),
    )

    kb = load_ontology_records(spark, kb, recs, source_name, cls="Disease")

    # DeprecatedBy edges across versions: old term (in its last version)
    # -> new term (in the version that absorbed it)
    ladder = version_ladder(records)
    dep_edges_src = (
        dep.join(F.broadcast(ladder), "version")
        .select(
            F.concat(F.lower("old_code"), F.lit("@"), F.col("prev_version")).alias(
                "from_sid"
            ),
            F.concat(F.lower("new_code"), F.lit("@"), F.col("version")).alias("to_sid"),
        )
    )
    key_map = kb.terms.filter(F.col("cls") == "Disease").select(
        F.col("sourceId").alias("from_sid"), F.col("rid").alias("out_rid")
    )
    key_map2 = kb.terms.filter(F.col("cls") == "Disease").select(
        F.col("sourceId").alias("to_sid"), F.col("rid").alias("in_rid")
    )
    new_edges = (
        dep_edges_src.join(F.broadcast(key_map), "from_sid")
        .join(F.broadcast(key_map2), "to_sid")
        .select(
            "out_rid",
            "in_rid",
            F.lit("DeprecatedBy").alias("edge_class"),
            source_rid(source_name).alias("source_rid"),
        )
    )
    kb.edges = kb.edges.unionByName(new_edges).dropDuplicates(
        ["out_rid", "in_rid", "edge_class"]
    )
    return kb
