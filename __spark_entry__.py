"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2, each built on the graphkb_spark engine; ``oracle_sql()``
gives the DuckDB-equivalent SQL the driver cross-checks at sf=0.01.

Column-name discipline: every computed column is aliased identically
in the Spark plan and the oracle SQL; float aggregates are rounded on
both sides so value hashes are stable across summation orders.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graphkb_spark.core.materialize import materialize

from graphkb_spark.session import load_tables
from graphkb_spark.functions.hashing import stable_hash_id
from graphkb_spark.functions.variant_names import (
    RELEVANCE_ROWS,
    canonical_phases,
    extract_year,
    fix_docm_variant_udf,
    parse_abstract_citation,
    parse_oncokb_variant_name_udf,
    translate_relevance,
)
from graphkb_spark.kb import empty_kb, load_ontology_records, upsert_source
from graphkb_spark.functions.hgvs import parse_variant_udf
from graphkb_spark.operators import text as text_ops
from graphkb_spark.operators.aggregate import (
    consensus_value,
    recurrence_threshold,
    top1_per_group,
)
from graphkb_spark.operators.dedup import (
    _mh_params,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_dups,
)
from graphkb_spark.operators.asof import asof_join
from graphkb_spark.operators.rangejoin import overlap_length, range_join
from graphkb_spark.operators.sketch import (
    approx_distinct_with_bound,
    approx_quantiles_with_bound,
)
from graphkb_spark.operators.expand import expand_profiles
from graphkb_spark.operators.graph import expand_neighbors
from graphkb_spark.operators.merge import merge_upsert
from graphkb_spark.operators.reconcile import reconcile
from graphkb_spark.operators.resolve import cascade_resolve
from graphkb_spark.operators.similarity import cosine_topk, lsh_topk
from graphkb_spark.plans import run_query
from graphkb_spark.streaming.incremental import sessionize

TPCH = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]
ALL_TABLES = TPCH + ["events", "documents", "embeddings"]


def _t(spark: SparkSession, sf_dir: str, *names: str):
    return load_tables(spark, sf_dir, *names)


def _registry_values() -> str:
    """SOURCE_REGISTRY rendered as DuckDB VALUES rows matching
    SOURCE_SCHEMA (name, displayName, url, usage, version, sort)."""
    from graphkb_spark.sources.registry import SOURCE_REGISTRY

    def lit(v):
        return "CAST(NULL AS VARCHAR)" if v is None else "'" + v.replace("'", "''") + "'"

    rows = []
    for rec in SOURCE_REGISTRY.values():
        vals = [lit(rec.get(f)) for f in ("name", "displayName", "url", "usage")]
        vals.append("CAST(NULL AS VARCHAR)")  # version: unset in the registry
        s = rec.get("sort")
        vals.append("CAST(NULL AS INTEGER)" if s is None else str(s))
        rows.append("(" + ", ".join(vals) + ")")
    return ", ".join(rows)


# --------------------------------------------------------------------------
# §3.3 filter DSL (the reference's /query language)
# --------------------------------------------------------------------------

def q_filter_dsl_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested AND/OR/IN/comparison filter tree -> Column compile
    (reference src/graphkb.js:114-123, :429-434)."""
    t = _t(spark, sf_dir, "orders")
    return run_query(
        t,
        {
            "target": "orders",
            "filters": {
                "AND": [
                    {"o_orderstatus": "O"},
                    {
                        "OR": [
                            {"o_orderpriority": ["1-URGENT", "2-HIGH"]},
                            {"o_totalprice": {"operator": ">", "value": 250000}},
                        ]
                    },
                ]
            },
            "returnProperties": ["o_orderkey", "o_totalprice", "o_orderpriority"],
            "orderBy": ["o_orderkey"],
        },
    )


def q_filter_dsl_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-subquery filter -> semi-join rewrite (reference
    src/graphkb.js:492 source-link subquery)."""
    t = _t(spark, sf_dir, "orders", "customer")
    out = run_query(
        t,
        {
            "target": "orders",
            "filters": {
                "AND": [
                    {"o_orderstatus": "F"},
                    {
                        "o_custkey": {
                            "target": "customer",
                            "key": "c_custkey",
                            "filters": {
                                "AND": [
                                    {"c_mktsegment": "BUILDING"},
                                    {"c_acctbal": {"operator": ">", "value": 1000}},
                                ]
                            },
                        }
                    },
                ]
            },
            "returnProperties": ["o_orderkey", "o_custkey", "o_totalprice"],
        },
    )
    return out


def q_filter_dsl_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """limit/skip paging with deterministic order (reference
    ``getRecords`` skip-paging src/graphkb.js:341-372)."""
    t = _t(spark, sf_dir, "customer")
    return run_query(
        t,
        {
            "target": "customer",
            "filters": {"c_mktsegment": "AUTOMOBILE"},
            "returnProperties": ["c_custkey", "c_name", "c_acctbal"],
            "orderBy": ["c_custkey"],
            "skip": 50,
            "limit": 100,
        },
    )


def q_filter_dsl_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``neighbors: n`` in the query envelope (reference /query body,
    src/graphkb.js:341-372): filtered records plus every record within
    n undirected hops over the edges table, hop distance in ``_hop``.
    Seed = nation_0; hop 1 = its region; hop 2 = the region's
    other nations."""
    t = _t(spark, sf_dir, "region", "nation")
    terms = (
        t["nation"]
        .select(
            F.concat(F.lit("N"), F.col("n_nationkey")).alias("rid"),
            F.lower("n_name").alias("name"),
        )
        .unionByName(
            t["region"].select(
                F.concat(F.lit("R"), F.col("r_regionkey")).alias("rid"),
                F.lower("r_name").alias("name"),
            )
        )
    )
    edges = t["nation"].select(
        F.concat(F.lit("N"), F.col("n_nationkey")).alias("out_rid"),
        F.concat(F.lit("R"), F.col("n_regionkey")).alias("in_rid"),
        F.lit("ElementOf").alias("edge_class"),
        F.lit(None).cast("string").alias("source_rid"),
    )
    return run_query(
        {"terms": terms, "edges": edges},
        {
            "target": "terms",
            "filters": {"name": "nation_0"},
            "neighbors": 2,
            "returnProperties": ["rid", "name", "_hop"],
            "orderBy": ["rid"],
        },
        keys={"terms": "rid"},
    )


# --------------------------------------------------------------------------
# §2.4 joins
# --------------------------------------------------------------------------

def q_top1_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J2/W1: preference-ranked unique resolution — best customer
    per nation by (acctbal desc, custkey asc)."""
    t = _t(spark, sf_dir, "nation", "customer")
    best = top1_per_group(
        t["customer"],
        ["c_nationkey"],
        [F.col("c_acctbal").desc(), F.col("c_custkey").asc()],
    )
    return (
        t["nation"]
        .join(F.broadcast(best), t["nation"].n_nationkey == best.c_nationkey)
        .select("n_name", "c_name", F.round("c_acctbal", 2).alias("best_acctbal"))
    )


def q_fallback_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: cascade lookup — customer by key among positive-balance rows
    first, then any (mirrors therapy sourceId-then-name retries,
    src/graphkb.js:427-478)."""
    t = _t(spark, sf_dir, "orders", "customer")
    orders = t["orders"].select("o_orderkey", "o_custkey")
    cust = t["customer"]
    out = cascade_resolve(
        orders,
        cust,
        levels=[
            (
                (F.col("o_custkey") == F.col("c_custkey")) & (F.col("c_acctbal") > 0),
                [F.col("c_custkey").asc()],
            ),
            (F.col("o_custkey") == F.col("c_custkey"), [F.col("c_custkey").asc()]),
        ],
        select=["c_name", "c_acctbal"],
    )
    return out.select(
        "o_orderkey",
        F.col("resolved_c_name").alias("cust_name"),
        F.round("resolved_c_acctbal", 2).alias("cust_acctbal"),
    )


def q_anti_join_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4/J5: incremental skip-set / deprecation sweep — customers with
    no URGENT order (left_anti vs already-loaded ids)."""
    t = _t(spark, sf_dir, "orders", "customer")
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        t["customer"]
        .join(urgent, t["customer"].c_custkey == urgent.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


def q_semi_join_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: edge-existence style semi-join — customers with >=1 URGENT
    open order."""
    t = _t(spark, sf_dir, "orders", "customer")
    urgent = t["orders"].filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderstatus") == "O")
    )
    return (
        t["customer"]
        .join(urgent, t["customer"].c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def q_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: broadcast map-join — revenue per region through the
    supplier->nation->region dimension chain."""
    t = _t(spark, sf_dir, "lineitem", "supplier", "nation", "region")
    li = t["lineitem"].select(
        "l_suppkey", (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    )
    dims = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), t["supplier"].s_nationkey == t["nation"].n_nationkey)
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "r_name")
    )
    return (
        li.join(F.broadcast(dims), li.l_suppkey == dims.s_suppkey)
        .groupBy("r_name")
        .agg(F.round(F.sum("rev"), 2).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


def q_normalized_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: normalized-string equi join — join parts to an uppercased
    brand dimension on the case-normalized key."""
    t = _t(spark, sf_dir, "part")
    dim = t["part"].select(F.upper("p_brand").alias("brand_uc")).distinct()
    return (
        t["part"]
        .join(F.broadcast(dim), F.lower(F.col("brand_uc")) == F.lower(F.col("p_brand")))
        .groupBy("brand_uc")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


# --------------------------------------------------------------------------
# §2.5/§2.6 aggregations & windows
# --------------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-family headline agg (TPC-H Q1 shape) — partial aggregation +
    AQE; no UDFs."""
    t = _t(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_recurrence_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: distinct-count recurrence threshold (COSMIC fusions >=3
    distinct samples -> parts supplied by >=4 distinct suppliers)."""
    t = _t(spark, sf_dir, "lineitem")
    return recurrence_threshold(
        t["lineitem"], ["l_partkey"], "l_suppkey", threshold=4, count_alias="n_suppliers"
    )


def q_consensus_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: single-consensus aggregation (consensus trial location ->
    consensus order priority per customer)."""
    t = _t(spark, sf_dir, "orders")
    return consensus_value(
        t["orders"], ["o_custkey"], "o_orderpriority", alias="consensus_priority"
    )


def q_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: latest-created per key (latest therapy by createdAt ->
    latest order per customer)."""
    t = _t(spark, sf_dir, "orders")
    latest = top1_per_group(
        t["orders"], ["o_custkey"], [F.col("o_orderdate").desc(), F.col("o_orderkey").desc()]
    )
    return latest.select(
        "o_custkey",
        F.col("o_orderkey").alias("latest_orderkey"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("latest_orderdate"),
    )


def q_version_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: lag-based version chaining (oncotree version ladder ->
    previous event per user with gap seconds)."""
    t = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    # stage through timestamp_ltz: TIMESTAMP_NTZ (what Spark 4 infers
    # for tz-less parquet timestamps) cannot cast directly to BIGINT
    ts_s = F.col("ts").cast("timestamp_ltz").cast("long")
    prev = F.lag(ts_s).over(w)
    return t["events"].select(
        "event_id",
        "user_id",
        (ts_s - prev).alias("gap_seconds"),
    )


def q_duplicate_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: duplicate-name detection (ncit name dedup -> part names
    appearing more than once)."""
    t = _t(spark, sf_dir, "part")
    return (
        t["part"].groupBy("p_name").agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > 1)
    )


# --------------------------------------------------------------------------
# §2.9 merge / reconciliation
# --------------------------------------------------------------------------

def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1/K2: MERGE with field-level change detection. Target = stale
    KB snapshot (orders % 3 != 0); source = refreshed batch (prices
    bumped for %5==0, rows %7==0 dropped)."""
    t = _t(spark, sf_dir, "orders")
    base = t["orders"].select("o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("o_totalprice"))
    target = base.filter(F.col("o_orderkey") % 3 != 0)
    source = (
        base.filter(F.col("o_orderkey") % 7 != 0)
        .withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") % 5 == 0, F.round(F.col("o_totalprice") + 1.0, 2))
            .otherwise(F.col("o_totalprice")),
        )
    )
    merged = merge_upsert(target, source, ["o_orderkey"], delete_missing=True)
    return merged.select("o_orderkey", "o_totalprice", F.col("_action").alias("action"))


def q_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9/§2.9.2: statement reconciliation — stored vs new batch diff
    into update/create/delete (content keys unique per group here; the
    positional-pairing passes are exercised in tests/)."""
    t = _t(spark, sf_dir, "orders")
    stored = t["orders"].filter(F.col("o_orderkey") % 4 != 0).select(
        F.col("o_custkey").alias("sourceId"),
        F.col("o_orderkey").alias("subject"),
        F.col("o_orderpriority").alias("content"),
        F.concat(F.lit("rid_"), F.col("o_orderkey")).alias("rid"),
    )
    batch = t["orders"].filter(F.col("o_orderkey") % 5 != 0).select(
        F.col("o_custkey").alias("sourceId"),
        F.col("o_orderkey").alias("subject"),
        F.when(F.col("o_orderkey") % 2 == 0, F.lit("REVISED"))
        .otherwise(F.col("o_orderpriority"))
        .alias("content"),
        F.concat(F.lit("new_"), F.col("o_orderkey")).alias("rid"),
    )
    out = reconcile(
        stored,
        batch,
        group_key=["sourceId"],
        strong_key=["subject"],
        weak_key=["subject"],
        order=["subject", "content"],
        id_col="rid",
    )
    return out.select("sourceId", "subject", "content", "rid", F.col("_action").alias("action"))


def q_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10: high-watermark incremental load (clinicaltrials --days N
    -> events after 2024-01-15, newest per user upserted over the
    pre-watermark state)."""
    t = _t(spark, sf_dir, "events")
    ev = t["events"].select(
        "user_id", "event_id", "ts", "event_type", F.round("value", 4).alias("value")
    )
    cutoff = F.lit("2024-01-15 00:00:00").cast("timestamp")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    target = (
        ev.filter(F.col("ts") < cutoff)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    fresh = (
        ev.filter(F.col("ts") >= cutoff)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    merged = merge_upsert(target, fresh, ["user_id"])
    return merged.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("latest_ts"),
        "event_type",
        "value",
        F.col("_action").alias("action"),
    )


# --------------------------------------------------------------------------
# §2.8 functions: hashing, HGVS, expansion
# --------------------------------------------------------------------------

def q_stable_hash_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: deterministic surrogate ids — md5 of key-sorted JSON
    (hashRecordToId parity)."""
    t = _t(spark, sf_dir, "nation")
    return t["nation"].select(
        "n_nationkey", "n_name", stable_hash_id("n_name", "n_nationkey").alias("rid")
    )


def q_hgvs_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: HGVS parser UDF over synthetic notation built from lineitem —
    protein sub / cds sub (plain + intronic offset) / exon del /
    intron mut / cytoband range del / uncertain protein-range grammar
    paths (functions/hgvs.py)."""
    t = _t(spark, sf_dir, "lineitem")
    ln = F.col("l_linenumber") % 7
    pk = F.col("l_partkey")
    n5 = (pk % 500 + 1).cast("string")
    n9 = (pk % 900 + 1).cast("string")
    n20 = (pk % 20 + 1).cast("string")
    n30 = (pk % 30 + 1).cast("string")
    cb1 = F.concat(F.lit("p"), n30, F.lit("."), (pk % 9 + 1).cast("string"))
    cb2 = F.concat(F.lit("p"), n20, F.lit("."), (pk % 7 + 1).cast("string"))
    src = t["lineitem"].select(
        "l_orderkey",
        "l_linenumber",
        F.when(ln == 0, F.concat(F.lit("p.G"), n5, F.lit("D")))
        .when(ln == 1, F.concat(F.lit("c."), n9, F.lit("A>T")))
        .when(ln == 2, F.concat(F.lit("e."), n20, F.lit("del")))
        .when(ln == 3, F.concat(F.lit("c."), n9, F.lit("+2A>G")))
        .when(ln == 4, F.concat(F.lit("i."), n30, F.lit("mut")))
        .when(ln == 5, F.concat(F.lit("y."), cb1, F.lit("_"), cb2, F.lit("del")))
        .otherwise(
            F.concat(F.lit("p.(G"), n5, F.lit("_G"), (pk % 500 + 2).cast("string"),
                     F.lit(")mut"))
        )
        .alias("notation"),
    )
    parsed = src.select(
        "l_orderkey", "l_linenumber", "notation", parse_variant_udf("notation").alias("v")
    )
    return parsed.select(
        "l_orderkey",
        "l_linenumber",
        "notation",
        F.col("v.prefix").alias("prefix"),
        F.col("v.variant_type").alias("variant_type"),
        F.col("v.break1_start").alias("break1_start"),
        F.col("v.break1_repr").alias("break1_repr"),
        F.col("v.break2_repr").alias("break2_repr"),
        F.col("v.uncertain").cast("int").alias("uncertain"),
    )


def q_explode_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15 (single): one->many expansion — p_type word explode with
    counts."""
    t = _t(spark, sf_dir, "part")
    return (
        t["part"]
        .select(F.explode(F.split("p_type", " ")).alias("type_word"))
        .groupBy("type_word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_cross_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15 (cross): conditions x therapies style cross-product of two
    exploded arrays."""
    t = _t(spark, sf_dir, "part")
    return (
        t["part"]
        .filter(F.col("p_partkey") <= 200)
        .select(
            "p_partkey",
            F.explode(F.split("p_type", " ")).alias("type_word"),
        )
        .select(
            "p_partkey",
            "type_word",
            F.explode(F.array(F.lit("A"), F.lit("B"))).alias("variant"),
        )
    )


def q_dnf_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14: molecular-profile boolean expression -> DNF condition sets
    (pure-Python grammar in a Pandas UDF, exploded JVM-side).
    Expressions are synthesized from order keys; conjuncts join to a
    string column so the oracle can verify exactly."""
    t = _t(spark, sf_dir, "orders")
    src = t["orders"].filter(F.col("o_orderkey") <= 2000).select(
        "o_orderkey",
        F.concat(
            F.lit("v"),
            (F.col("o_orderkey") % 7).cast("string"),
            F.lit(" AND (v"),
            (F.col("o_orderkey") % 5).cast("string"),
            F.lit(" OR v"),
            (F.col("o_orderkey") % 3).cast("string"),
            F.lit(")"),
        ).alias("expr"),
    )
    out = expand_profiles(src, "expr")
    return out.select(
        "o_orderkey", "expr", F.concat_ws("+", "condition_set").alias("conditions")
    )


# --------------------------------------------------------------------------
# §7.2 KB slice + §2.8 domain normalizers + §2.7 set ops
# --------------------------------------------------------------------------

def q_kb_ontology_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §7.2 end-to-end KB slice: generic ontology loader
    (region/nation as a 2-level SubClassOf vocabulary) -> terms + edges
    with deterministic content-hash rids (hashRecordToId parity,
    src/util.js:186-193; loader src/ontology/index.js:108-243)."""
    t = _t(spark, sf_dir, "region", "nation")
    recs_r = t["region"].select(
        F.concat(F.lit("R"), F.col("r_regionkey")).alias("sourceId"),
        F.lower("r_name").alias("name"),
        F.lit(None).cast("array<string>").alias("subclassof"),
    )
    recs_n = t["nation"].select(
        F.concat(F.lit("N"), F.col("n_nationkey")).alias("sourceId"),
        F.lower("n_name").alias("name"),
        F.array(F.concat(F.lit("R"), F.col("n_regionkey"))).alias("subclassof"),
    )
    kb = empty_kb(spark)
    kb = upsert_source(spark, kb, {"name": "tpch"})
    # collect_counts=False: the K6 counters are a separate action; the
    # query path stays one lazy plan
    kb = load_ontology_records(
        spark, kb, recs_r.unionByName(recs_n), "tpch", collect_counts=False
    )
    # ontology term/edge sets are small by nature (NCIt ~170k rows is
    # the largest in the reference) — broadcast the parent-lookup side
    parents = kb.edges.filter(F.col("edge_class") == "SubClassOf").select(
        F.col("out_rid").alias("rid"), "in_rid"
    )
    pmap = kb.terms.select(F.col("rid").alias("in_rid"), F.col("sourceId").alias("parent_sid"))
    return (
        kb.terms.join(F.broadcast(parents), "rid", "left")
        .join(F.broadcast(pmap), "in_rid", "left")
        .select("sourceId", "name", "rid", "parent_sid")
    )


def q_variant_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch addVariant (kb.load_variants; reference
    src/graphkb.js:631-660): gene-prefixed notations -> typed
    PositionalVariant rows (position structs, feature/vocabulary rid
    links, content-hash rids) + Infers edges from cds/genomic/exonic
    forms to the protein form of the same gene group (reference
    src/cosmic/resistance.js:102-107)."""
    from graphkb_spark.kb import load_variants

    t = _t(spark, sf_dir, "part")
    k = F.col("p_partkey")
    g = (k % 50).cast("int")
    b = (F.floor(k / F.lit(50)).cast("int") % 5).cast("int")
    n = g * 10 + b + 1
    gs, ns = g.cast("string"), n.cast("string")
    notation = (
        F.when(b == 0, F.concat(F.lit("G"), gs, F.lit(":p.G"), ns, F.lit("D")))
        .when(b == 1, F.concat(F.lit("G"), gs, F.lit(":e."), ns, F.lit("del")))
        .when(b == 2, F.concat(F.lit("G"), gs, F.lit(":c."), ns, F.lit("A>G")))
        .when(
            b == 3,
            F.concat(
                F.lit("G"), gs, F.lit(":g."), ns, F.lit("_"), (n + 2).cast("string"),
                F.lit("del"),
            ),
        )
        .otherwise(
            F.concat(F.lit("(GA"), gs, F.lit(",GB"), gs, F.lit("):fusion(e.1,e.3)"))
        )
    )
    grp = F.when(b < 4, F.concat(F.lit("G"), gs)).otherwise(F.concat(F.lit("F"), gs))
    notes = t["part"].select(grp.alias("grp"), notation.alias("notation"))
    # feature dim: gene ids are p_partkey % 50 = the full 0..49 range —
    # build it scan-free (a part-table distinct here would replicate the
    # scan+agg subtree once per broadcast consumer)
    feats = (
        spark.range(50)
        .select(F.explode(F.array(F.lit("G"), F.lit("GA"), F.lit("GB"))).alias("p"),
                F.col("id").cast("string").alias("g"))
        .select(
            F.concat("p", "g").alias("name"),
            F.concat(F.lit("f-"), F.col("p"), F.col("g")).alias("rid"),
        )
    )
    vocab = spark.createDataFrame(
        [(v, f"v-{v}") for v in
         ("missense", "deletion", "substitution", "fusion")],
        "name string, rid string",
    )
    out = load_variants(
        notes, "variant-demo", features=feats, vocabulary=vocab, group_col="grp"
    )
    inf = out["edges"].select(
        F.col("out_rid").alias("rid"), F.col("in_rid").alias("infers_rid")
    )
    return (
        out["variants"]
        .join(inf, "rid", "left")
        .select(
            "rid",
            "displayName",
            "cls",
            "type_rid",
            "reference1_rid",
            "reference2_rid",
            F.col("break1_start.cls").alias("b1_cls"),
            F.col("break1_start.pos").alias("b1_pos"),
            F.col("break1_start.ref_aa").alias("b1_ref_aa"),
            F.col("break2_start.cls").alias("b2_cls"),
            F.col("break2_start.pos").alias("b2_pos"),
            "ref_seq",
            "alt_seq",
            "infers_rid",
        )
    )


def q_oncokb_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: OncoKB variant-name parser over synthesized names covering
    the protein-notation / exon-event / fusion-flip / vocabulary paths
    (reference src/oncokb/index.js:131-193)."""
    t = _t(spark, sf_dir, "part")
    k = F.col("p_partkey")
    src = t["part"].select(
        "p_partkey",
        F.when(k % 4 == 0, F.concat(F.lit("G"), (k % 500 + 1).cast("string"), F.lit("D")))
        .when(k % 4 == 1, F.concat(F.lit("exon "), (k % 30 + 1).cast("string"), F.lit(" deletion")))
        .when(k % 4 == 2, F.lit("BCR-ABL1"))
        .otherwise(F.lit("Truncating Mutations"))
        .alias("variant_name"),
        F.when(k % 4 == 2, F.lit("ABL1")).cast("string").alias("reference1"),
    )
    parsed = src.select(
        "p_partkey",
        "variant_name",
        parse_oncokb_variant_name_udf("variant_name", "reference1").alias("v"),
    )
    return parsed.select(
        "p_partkey",
        "variant_name",
        F.col("v.type").alias("vtype"),
        F.col("v.reference2").alias("reference2"),
        F.col("v.flipped").alias("flipped"),
    )


def q_docm_fix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: DOCM notation fixes — trailing-deletion and common-prefix
    delins rewrites (reference src/docm/index.js:33-67)."""
    t = _t(spark, sf_dir, "part")
    k = F.col("p_partkey")
    n = (k % 800 + 1).cast("string")
    src = t["part"].select(
        "p_partkey",
        F.when(k % 3 == 0, F.concat(F.lit("p.KK"), n, F.lit("-")))
        .when(k % 3 == 1, F.concat(F.lit("p.DI"), n, F.lit("VM")))
        .otherwise(F.concat(F.lit("p.G"), n, F.lit("D")))
        .alias("variant"),
    )
    return src.select("p_partkey", "variant", fix_docm_variant_udf("variant").alias("fixed"))


def q_hotspot_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cancerhotspots MAF loader (loaders/statements.py:load_cancerhotspots):
    P4 row-skip predicates + the ``<chrom>:g.`` notation composer
    (reference src/cancerhotspots/index.js:81-103,293-307) over a MAF
    frame synthesized from ``part``."""
    from graphkb_spark.loaders.statements import load_cancerhotspots

    t = _t(spark, sf_dir, "part")
    k = F.col("p_partkey")
    raw = t["part"].select(
        k.alias("p_partkey"),
        F.lit("GRCh38").alias("NCBI_Build"),
        F.lit("c.1A>T").alias("HGVSc"),
        (k % 22 + 1).cast("string").alias("Chromosome"),
        F.element_at(
            F.array(F.lit("pathogenic"), F.lit(""), F.lit("likely_benign"), F.lit("uncertain")),
            (k % 4 + 1).cast("int"),
        ).alias("CLIN_SIG"),
        F.lit("").alias("dbSNP_RS"),
        F.col("p_brand").alias("oncotree_detailed"),
        k.cast("string").alias("Entrez_Gene_Id"),
        F.when(k % 3 == 1, F.lit("MODERATE")).otherwise(F.lit("HIGH")).alias("IMPACT"),
        F.concat(
            F.lit("p.G"),
            k.cast("string"),
            F.when(k % 7 == 0, F.lit("=")).when(k % 7 == 1, F.lit("_splice")).otherwise(F.lit("D")),
        ).alias("HGVSp_Short"),
        F.element_at(
            F.array(F.lit("G"), F.lit("-"), F.lit("GAA"), F.lit("A"), F.lit("C")),
            (k % 5 + 1).cast("int"),
        ).alias("Reference_Allele"),
        k.cast("string").alias("Start_Position"),
        (k + k % 3).cast("string").alias("End_Position"),
        F.concat(F.lit("T"), k.cast("string")).alias("Transcript_ID"),
        F.element_at(
            F.array(F.lit("A"), F.lit("T"), F.lit("-"), F.lit("TG")), (k % 4 + 1).cast("int")
        ).alias("Allele"),
    )
    out = load_cancerhotspots(raw)
    # the header remap drops non-MAF columns (convertRowFields semantics)
    # — recover the part key from the synthesized Entrez_Gene_Id
    return out.select(
        F.col("geneId").cast("long").alias("p_partkey"),
        "chromosome",
        "protein",
        "genomic",
        "protein_notation",
        "relevance",
        F.concat_ws("|", "conditions").alias("conds"),
    )


def q_oncokb_statements(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OncoKB statement loader (loaders/statements.py:load_oncokb):
    level->relevance regex, per-drug explode, pmid+abstract support
    lists, error-row quarantine (reference src/oncokb/index.js:550-580)
    over rows synthesized from ``part``."""
    from graphkb_spark.loaders.statements import load_oncokb

    t = _t(spark, sf_dir, "part")
    k = F.col("p_partkey")
    raw = t["part"].select(
        k.alias("p_partkey"),
        F.col("p_type").alias("gene"),
        F.concat(F.lit("V"), F.col("p_size").cast("string")).alias("variant"),
        F.col("p_brand").alias("disease"),
        F.element_at(
            F.array(F.lit("1"), F.lit("2A"), F.lit("R1"), F.lit("r2"), F.lit("X9")),
            (k % 5 + 1).cast("int"),
        ).alias("level"),
        F.concat(F.get(F.split("p_name", " "), 0), F.lit(", "), F.col("p_brand")).alias("drugs"),
        F.concat(k.cast("string"), F.lit(","), (k + 1).cast("string")).alias("pmids"),
        F.when(k % 2 == 0, F.concat(F.lit("Abst "), k.cast("string"), F.lit("; "))).alias(
            "abstracts"
        ),
    )
    out = load_oncokb(raw)
    return out.select(
        "p_partkey",
        "gene",
        "variant",
        "relevance",
        "drug",
        F.concat_ws(";", "support").alias("support_str"),
        "_error",
    )


def q_citation_phase_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9/F10/F11: abstract-citation parse + trial-phase canonicalizer +
    year extraction, all JVM-side Column expressions."""
    t = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    src = t["orders"].select(
        "o_orderkey",
        F.when(
            k % 2 == 0,
            F.concat(F.lit("Abstract# "), k.cast("string"), F.lit(", ASCO 2014")),
        ).otherwise(F.lit("no citation")).alias("citation"),
        F.array(
            F.concat(F.lit("PHASE"), (k % 3 + 1).cast("string")), F.lit("NA")
        ).alias("phases"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("datestr"),
    )
    cit = parse_abstract_citation("citation")
    return src.select(
        "o_orderkey",
        cit["abstractNumber"].alias("abstract_number"),
        cit["source"].alias("abstract_source"),
        cit["year"].alias("abstract_year"),
        canonical_phases("phases").alias("phase"),
        extract_year("datestr").alias("pub_year"),
    )


def q_relevance_translate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: relevance translation table as a broadcast lookup join
    (reference's 320-line switch, src/civic/relevance.js:11-333)."""
    t = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    et = F.element_at(
        F.array(F.lit("PREDICTIVE"), F.lit("DIAGNOSTIC"), F.lit("PROGNOSTIC"),
                F.lit("FUNCTIONAL")),
        (k % 4 + 1).cast("int"),
    )
    sig = F.element_at(
        F.array(F.lit("SENSITIVITYRESPONSE"), F.lit("RESISTANCE"), F.lit("POSITIVE"),
                F.lit("POOR_OUTCOME"), F.lit("GAIN_OF_FUNCTION")),
        (k % 5 + 1).cast("int"),
    )
    src = t["orders"].select(
        "o_orderkey",
        et.alias("evidence_type"),
        F.when(k % 2 == 0, F.lit("SUPPORTS")).otherwise(F.lit("DOES_NOT_SUPPORT"))
        .alias("direction"),
        sig.alias("significance"),
    )
    return translate_relevance(src, spark).select(
        "o_orderkey", "evidence_type", "direction", "significance", "relevance"
    )


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 set operators: union / except (deprecation sweep J5 shape) /
    intersect (cosmic retained ∩ reloaded shape) in one result."""
    t = _t(spark, sf_dir, "orders")
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    high = t["orders"].filter(F.col("o_orderpriority") == "2-HIGH").select("o_custkey")
    f_cust = t["orders"].filter(F.col("o_orderstatus") == "F").select("o_custkey")
    u_minus_f = urgent.union(high).distinct().exceptAll(f_cust.distinct())
    u_and_h = urgent.distinct().intersect(high.distinct())
    return u_minus_f.withColumn("op", F.lit("union_except")).unionByName(
        u_and_h.withColumn("op", F.lit("intersect"))
    )


def q_combo_naming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 sorted-combination naming: sort().join(' + ') for
    combination therapy names (src/graphkb.js:700-701,
    src/civic/therapy.js:168-169) -> per-order sorted distinct
    flag+status combo string."""
    t = _t(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set(F.concat("l_returnflag", "l_linestatus"))),
                " + ",
            ).alias("combo")
        )
    )


def q_therapy_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15 therapy grouping (``resolveTherapies``
    src/civic/therapy.js:19-50): SUBSTITUTES -> one group per therapy,
    COMBINATION/SEQUENTIAL -> single sorted group, unknown multi ->
    error row."""
    from graphkb_spark.loaders.civic import group_therapies

    t = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    src = t["orders"].select(
        "o_orderkey",
        F.when(k % 4 == 0, F.array(F.lit("tA"), F.lit("tB")))
        .when(k % 4 == 1, F.array(F.lit("tC")))
        .when(k % 4 == 2, F.array(F.lit("tB"), F.lit("tA")))
        .otherwise(F.array().cast("array<string>"))
        .alias("therapies"),
        F.when(k % 4 == 0, F.lit("SUBSTITUTES"))
        .when(k % 4 == 2, F.lit("COMBINATION"))
        .alias("therapyInteractionType"),
    )
    out = group_therapies(src)
    return out.select(
        "o_orderkey",
        F.concat_ws("+", "therapy_group").alias("group_name"),
        F.col("_therapy_error").alias("err"),
    )


def q_string_normalizers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8/J8: the join-key normalizer family — case/space collapse,
    disease-name cleanup (british spellings), publication-title keys,
    gene-symbol suffix-1 equivalence, null-like cleanup."""
    from graphkb_spark.functions.normalize import (
        clean_disease_name,
        gene_name_key,
        norm_case_space,
        norm_title,
        null_like_to_null,
    )

    t = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    src = t["customer"].select(
        "c_custkey",
        F.concat(F.lit("  Acute  "), F.when(k % 2 == 0, F.lit("Leukaemia")).otherwise(
            F.lit("Tumour")), F.lit("_Of Breast ")).alias("disease_raw"),
        F.concat(F.lit("The <em>Title</em> No "), (k % 50).cast("string"), F.lit(".")).alias(
            "title_raw"
        ),
        F.when(k % 3 == 0, F.lit("ABL1")).when(k % 3 == 1, F.lit("abl")).otherwise(
            F.lit("ERBB21")).alias("gene_raw"),
        F.when(k % 4 == 0, F.lit("None")).when(k % 4 == 1, F.lit(" ")).otherwise(
            F.lit("real")).alias("nullish_raw"),
    )
    return src.select(
        "c_custkey",
        norm_case_space("disease_raw").alias("norm_space"),
        clean_disease_name("disease_raw").alias("disease_key"),
        norm_title("title_raw").alias("title_key"),
        gene_name_key("gene_raw").alias("gene_key"),
        null_like_to_null("nullish_raw").alias("nullish"),
    )


def q_spec_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: JSON-Schema-style validation filter with per-row error
    accumulation (checkSpec src/util.js:201-214)."""
    from graphkb_spark.operators.validate import SPEC_ERRORS_COL, check_spec

    t = _t(spark, sf_dir, "orders")
    spec = {
        "price-cap": F.col("o_totalprice") < 300000,
        "not-urgent": F.col("o_orderpriority") != "1-URGENT",
        "date-present": F.col("o_orderdate").isNotNull(),
    }
    out = check_spec(t["orders"], spec)
    return out.select(
        "o_orderkey",
        F.concat_ws(";", SPEC_ERRORS_COL).alias("errs"),
        F.size(SPEC_ERRORS_COL).alias("n_errors"),
    )


def q_spec_validation_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 declarative form: an ajv-style JSON-Schema document (nested
    object properties, enum, pattern, numeric bounds, array items)
    compiled to Column predicates (compile_json_spec; reference spec
    documents e.g. src/civic/specs.json, src/entrez/refseq.js:24-35)."""
    from graphkb_spark.operators.validate import SPEC_ERRORS_COL, check_json_spec

    t = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    src = t["orders"].select(
        "o_orderkey",
        F.struct(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_totalprice").alias("total"),
            F.when(k % 7 != 0, F.col("o_orderstatus")).alias("status"),
        ).alias("meta"),
        F.when(
            k % 11 != 5,
            F.array(
                F.concat(F.lit("T"), (k % 5).cast("string")),
                F.concat(F.lit("T"), ((k + 1) % 5).cast("string")),
            ),
        ).alias("tags"),
    )
    schema = {
        "properties": {
            "o_orderkey": {"type": "integer"},
            "meta": {
                "type": "object",
                "properties": {
                    "priority": {"enum": ["1-URGENT", "2-HIGH", "3-MEDIUM",
                                          "4-NOT SPECIFIED", "5-LOW"]},
                    "total": {"type": "number", "maximum": 300000},
                    "status": {"type": ["null", "string"], "pattern": "^[OF]$"},
                },
                "required": ["priority"],
            },
            "tags": {"type": ["null", "array"], "items": {"pattern": "^T[0-3]$"}},
        },
        "required": ["o_orderkey"],
    }
    out = check_json_spec(src, schema)
    return out.select(
        "o_orderkey",
        F.concat_ws(";", SPEC_ERRORS_COL).alias("errs"),
        F.size(SPEC_ERRORS_COL).alias("n_errors"),
    )


def q_full_reload_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9.3: hash-id full-reload diff (cosmic resistance shape) —
    original vs regenerated id sets -> keep/delete/create."""
    from graphkb_spark.operators.validate import full_reload_diff

    t = _t(spark, sf_dir, "orders")
    original = t["orders"].filter(F.col("o_orderkey") % 3 != 0).select(
        F.md5(F.col("o_orderkey").cast("string")).alias("rid")
    )
    reloaded = t["orders"].filter(F.col("o_orderkey") % 5 != 0).select(
        F.md5(F.col("o_orderkey").cast("string")).alias("rid")
    )
    return full_reload_diff(original, reloaded)


def q_rollup_recurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 full shape: multi-level recurrence histogram as a native
    ROLLUP (the reference hand-rolls 3 specificity levels,
    src/cosmic/fusions.js:143-160) with a distinct-count threshold."""
    t = _t(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.countDistinct("l_suppkey").alias("n_supp"))
        .filter(F.col("n_supp") >= 50)
    )


# --------------------------------------------------------------------------
# training-data ops: dedup / similarity / text
# --------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content digest groupBy."""
    t = _t(spark, sf_dir, "documents")
    return exact_dedup(t["documents"], "text", "doc_id")


def q_dedup_fillscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/W4: keep the best-filled duplicate per (lang, source) —
    ASCO collapseAbstractDups shape."""
    t = _t(spark, sf_dir, "documents")
    best = top1_per_group(
        t["documents"], ["lang", "source"], [F.col("n_chars").desc(), F.col("doc_id").asc()]
    )
    return best.select("lang", "source", "doc_id", "n_chars")


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs with auditable md5 signatures: the
    full pipeline (shingle -> one md5 digest each -> 32 affine family
    minima -> 16 bands of 2 -> band-bucket candidate join ->
    exact-Jaccard verify over the hashed shingle sets) is replicated
    verbatim by the DuckDB oracle, so banding soundness is checked,
    not just the verified pairs. (hasher='xxhash64' swaps the digest
    for a JVM xxhash64 — same plan shape; with one digest per shingle
    the md5 path costs the same.)"""
    t = _t(spark, sf_dir, "documents")
    out = minhash_lsh_pairs(
        t["documents"],
        "text",
        "doc_id",
        num_hashes=32,
        bands=16,
        jaccard_threshold=0.6,
        hasher="md5",
    )
    return out.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard similarity join (posting-list candidates,
    rare-shingle skew guard)."""
    t = _t(spark, sf_dir, "documents")
    out = ngram_jaccard_pairs(t["documents"], "text", "doc_id", shingle_n=3, threshold=0.8)
    return out.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


def q_edit_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact edit-distance-1 similarity join (SymSpell deletion
    neighborhood + levenshtein verify). Keys form bounded dup-groups —
    5 part rows share a 12-char base key, one of which carries a
    planted substitution — so the pair output (dist-0 dup pairs +
    dist-1 typo pairs) grows LINEARLY with the table. (A p_name-prefix
    key collapses to ~128 distinct values at any SF, making the pair
    set — and any engine computing it — quadratic in scale factor:
    that benchmarks output materialization, not the join.)"""
    from graphkb_spark.operators.dedup import edit_distance_pairs

    t = _t(spark, sf_dir, "part")
    k = F.col("p_partkey")
    # md5 group labels: distinct groups sit ~11 edits apart, so the
    # pair set is exactly the within-group dups+typos — linear in N
    # (zero-padded counters would chain adjacent groups at distance 1)
    base_key = F.substring(F.md5((k / 5).cast("long").cast("string")), 1, 12)
    key = F.when(
        k % 5 == 0,
        F.concat(F.substring(base_key, 1, 4), F.lit("z"), F.substring(base_key, 6, 7)),
    ).otherwise(base_key)
    keys = t["part"].select(k.alias("pid"), key.alias("key"))
    out = edit_distance_pairs(keys, "key", "pid", max_dist=1)
    return out.select("id_a", "id_b", "dist")


def q_edit_distance_join_k2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-2 similarity join (2-deletion SymSpell
    neighborhood + levenshtein verify). Groups of 7 part rows share a
    12-char base key; one member carries one planted substitution and
    one carries two, so the result holds distance-0/1/2 pairs while the
    pair output stays linear in the table (see q_edit_distance_join on
    why a p_name-prefix key would be quadratic). The oracle replicates
    the 2-deletion blocking; the neighborhood's recall guarantee is
    proven separately by the brute-force unit test."""
    from graphkb_spark.operators.dedup import edit_distance_pairs

    t = _t(spark, sf_dir, "part")
    k = F.col("p_partkey")
    base_key = F.substring(F.md5((k / 7).cast("long").cast("string")), 1, 12)
    key = (
        F.when(
            k % 7 == 0,
            F.concat(
                F.substring(base_key, 1, 4),
                F.lit("z"),
                F.substring(base_key, 6, 3),
                F.lit("q"),
                F.substring(base_key, 10, 3),
            ),
        )
        .when(
            k % 7 == 3,
            F.concat(
                F.substring(base_key, 1, 4), F.lit("z"), F.substring(base_key, 6, 7)
            ),
        )
        .otherwise(base_key)
    )
    keys = t["part"].select(k.alias("pid"), key.alias("key"))
    out = edit_distance_pairs(keys, "key", "pid", max_dist=2)
    return out.select("id_a", "id_b", "dist")


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: every 50th document plays the eval
    set; corpus docs are flagged by distinct-3-gram overlap fraction
    (broadcast benchmark shingle set, one corpus-side aggregation)."""
    from graphkb_spark.operators.dedup import contamination_flags

    t = _t(spark, sf_dir, "documents")
    bench = t["documents"].filter(F.col("doc_id") % 50 == 0)
    out = contamination_flags(
        t["documents"], bench, "text", "doc_id", threshold=0.5
    )
    return out.select("doc_id", "n_shingles", "n_hit", "hit_frac", "contaminated")


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: exact n-gram Jaccard pairs collapsed into
    canonical groups by iterative min-label propagation (the
    canonical-doc step after pair generation; operators/dedup.py
    connected_components). Iterative DataFrame algorithm — per-round
    convergence actions are part of the operator's contract."""
    from graphkb_spark.operators.dedup import connected_components

    t = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        t["documents"], "text", "doc_id", shingle_n=3, threshold=0.8
    )
    return connected_components(
        pairs.select("id_a", "id_b"),
        t["documents"].select("doc_id"),
        id_col="doc_id",
    )


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus curation: hash-Bernoulli per-language
    rates (downsample en, keep low-resource langs) + per-(lang,
    source) top-3 cap by length (operators/sampling.py). Same doc
    lands in the same split on every run — sampling is md5-keyed,
    never rand()."""
    from graphkb_spark.operators.sampling import stratified_sample, stratum_cap

    t = _t(spark, sf_dir, "documents")
    sampled = stratified_sample(
        t["documents"], "doc_id", "lang",
        rates={"en": 25, "de": 50, "es": 50, "fr": 50}, default_rate=100,
    )
    capped = stratum_cap(
        sampled, ["lang", "source"],
        [F.col("n_chars").desc(), F.col("doc_id").asc()], k=3,
    )
    return capped.select("doc_id", "lang", "source", "n_chars")


def q_bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance scoring against a term set — corpus df/idf +
    length-normalized tf, all Column algebra
    (operators/sampling.py:bm25_scores)."""
    from graphkb_spark.operators.sampling import bm25_scores

    t = _t(spark, sf_dir, "documents")
    return bm25_scores(t["documents"], "text", "doc_id",
                       terms=["spark", "merge", "stream"])


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: md5-hex bit-vote signature in pure
    Column algebra (JVM codegen, no Python) + 4x16-bit chunk blocking;
    the DuckDB oracle recomputes the identical signature and blocking."""
    t = _t(spark, sf_dir, "documents")
    return simhash_near_dups(t["documents"], "text", "doc_id", max_hamming=3)


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (exact ANN baseline) for 5 query
    vectors."""
    t = _t(spark, sf_dir, "embeddings")
    # compute in double on both sides so ranking matches the oracle
    emb = t["embeddings"].withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 5)
    out = cosine_topk(emb, queries, k=5)
    return out.select(
        "query_id", "neighbor_id", F.round("cos_sim", 4).alias("cos_sim"), "rank"
    )


def q_embedding_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantize-then-rerank ANN: int8 candidate generation (exact
    integer dot products — bit-deterministic) + full-precision rerank
    of the 3k survivors. The oracle replicates quantization, candidate
    ranking, and rerank exactly."""
    from graphkb_spark.operators.similarity import quantized_topk

    t = _t(spark, sf_dir, "embeddings")
    emb = t["embeddings"].withColumn("embedding", F.col("embedding").cast("array<double>"))
    queries = emb.filter(F.col("vec_id") < 5)
    out = quantized_topk(emb, queries, k=5)
    return out.select(
        "query_id", "neighbor_id", F.round("cos_sim", 4).alias("cos_sim"), "rank"
    )


def q_embedding_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (the dedup family's embedding
    member): ternary-LSH bucket blocking + exact-cosine verify; the
    DuckDB oracle recomputes the identical buckets and pair set, so
    the blocking itself is verified. Synthetic embeddings are random
    (no planted dups), so the threshold sits in the distribution tail
    to exercise a non-trivial verified pair set."""
    from graphkb_spark.operators.similarity import embedding_near_dups

    t = _t(spark, sf_dir, "embeddings")
    emb = t["embeddings"].withColumn("embedding", F.col("embedding").cast("array<double>"))
    out = embedding_near_dups(emb, threshold=0.3, n_planes=4)
    return out.select("id_a", "id_b", F.round("cos_sim", 4).alias("cos_sim"))


def q_embedding_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: md5-of-id ordered centroid sample, nprobe cells
    per query, exact rerank within cells. The DuckDB oracle replicates
    centroid choice, cell assignment, probing, and rerank exactly.
    nprobe/n_centroids = 1/2 here: the synthetic embeddings are random
    (no cluster structure), so recall tracks the probed fraction; real
    embedding corpora cluster and probe far less."""
    from graphkb_spark.operators.similarity import ivf_topk

    t = _t(spark, sf_dir, "embeddings")
    emb = t["embeddings"].withColumn("embedding", F.col("embedding").cast("array<double>"))
    queries = emb.filter(F.col("vec_id") < 5)
    out = ivf_topk(emb, queries, k=5, n_centroids=8, nprobe=4)
    return out.select(
        "query_id", "neighbor_id", F.round("cos_sim", 4).alias("cos_sim"), "rank"
    )


def q_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k (the scale path): ternary
    (Achlioptas sparse random projection) bucket signature with
    md5-seeded weights — the DuckDB oracle recomputes the identical
    buckets and rerank, so the approximation itself is verified."""
    t = _t(spark, sf_dir, "embeddings")
    emb = t["embeddings"].withColumn("embedding", F.col("embedding").cast("array<double>"))
    queries = emb.filter(F.col("vec_id") < 5)
    out = lsh_topk(emb, queries, k=5, n_planes=6)
    return out.select(
        "query_id", "neighbor_id", F.round("cos_sim", 4).alias("cos_sim"), "rank"
    )


def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 symmetric quantization of the embedding column
    (operators/similarity.py:quantize_embeddings): per-vector scale,
    integer norm of the quantized vector, max dequantization error —
    the 4x-smaller candidate-generation representation for ANN."""
    from graphkb_spark.operators.similarity import quantize_embeddings

    t = _t(spark, sf_dir, "embeddings")
    out = quantize_embeddings(t["embeddings"], "embedding")
    return out.select(
        "vec_id",
        F.round("qscale", 6).alias("qscale"),
        F.aggregate(
            "qvec", F.lit(0).cast("long"), lambda acc, q: acc + q.cast("long") * q
        ).alias("qnorm"),
        F.round("recon_err", 6).alias("recon_err"),
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID by stopword-marker argmax (JVM-side heuristic)."""
    t = _t(spark, sf_dir, "documents")
    return t["documents"].select(
        "doc_id", "lang", text_ops.lang_id("text").alias("pred_lang")
    )


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace words + BPE-ish regex tokens."""
    t = _t(spark, sf_dir, "documents")
    return t["documents"].select(
        "doc_id",
        text_ops.whitespace_token_count("text").alias("ws_tokens"),
        text_ops.token_count("text").alias("regex_tokens"),
    )


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality features + composite score."""
    t = _t(spark, sf_dir, "documents")
    out = text_ops.quality_features(t["documents"].select("doc_id", "text"), "text")
    return out.select(
        "doc_id", "q_chars", "q_words", "q_punct_ratio", "q_stop_ratio", "q_score"
    )


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing with audit counts over documents carrying planted
    emails / phones / IPs (every engine builds the same input; the
    oracle replays the identical sequential replace)."""
    from graphkb_spark.operators.text import redact_pii

    t = _t(spark, sf_dir, "documents")
    k = F.col("doc_id")
    planted = F.concat(
        F.col("text"),
        F.when(k % 4 == 0, F.lit(" contact bob@example.com now"))
        .when(k % 4 == 1, F.lit(" call +1 604-555-0199 today"))
        .when(k % 4 == 2, F.lit(" from 192.168.1.77 last night"))
        .otherwise(F.lit("")),
    )
    docs = t["documents"].select("doc_id", planted.alias("t"))
    out = redact_pii(docs, "t", out_col="text_redacted")
    return out.select("doc_id", "n_email", "n_ip", "n_phone", "text_redacted")


def q_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signals (Gopher-rule family):
    duplicate word-3-gram fraction + most-frequent-word share, one
    scan, no shuffle."""
    t = _t(spark, sf_dir, "documents")
    out = text_ops.repetition_features(t["documents"].select("doc_id", "text"), "text")
    return out.select("doc_id", "r_dup_3gram_frac", "r_top_word_frac")


def q_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-V token vocabulary with dense rank ids (count desc, token
    asc tie-break) — the tokenizer-prep primitive."""
    from graphkb_spark.operators.corpus import build_vocab

    t = _t(spark, sf_dir, "documents")
    return build_vocab(t["documents"], "text", vocab_size=200, min_freq=2)


def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-cut sequence-packing manifest (capacity 512, 8
    shards): per-shard prefix sums lay documents end-to-end and cut
    every capacity tokens; boundary documents split across consecutive
    sequences. No global sort anywhere in the plan."""
    from graphkb_spark.operators.corpus import pack_sequences, tokens

    t = _t(spark, sf_dir, "documents")
    docs = t["documents"].select(
        "doc_id", F.size(tokens("text")).alias("n_tokens")
    )
    return pack_sequences(docs, "doc_id", "n_tokens", capacity=512, shards=8)


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window retrieval chunking (size 120, step 90): a NARROW
    zero-shuffle explode — the RAG-indexing front half of an
    embed-and-index pipeline."""
    from graphkb_spark.operators.corpus import chunk_documents

    t = _t(spark, sf_dir, "documents")
    return chunk_documents(
        t["documents"].select("doc_id", "text"),
        "doc_id",
        "text",
        size=120,
        step=90,
    )


def q_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate-segment removal (Lee et al. style,
    16-word segments): first global occurrence wins, documents rebuilt
    from surviving segments. Two keyed exchanges, linear."""
    from graphkb_spark.operators.corpus import dedup_segments

    t = _t(spark, sf_dir, "documents")
    return dedup_segments(
        t["documents"].select("doc_id", "text"), "doc_id", "text", seg_words=16
    )


def q_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget mixture sampling (600 tokens per
    source): deterministic md5-shuffled order, running-sum window, keep
    while cum <= budget — the training-mix materializer."""
    from graphkb_spark.operators.sampling import token_budget_sample

    t = _t(spark, sf_dir, "documents")
    return token_budget_sample(
        t["documents"].select("doc_id", "source", "text"),
        "doc_id",
        "source",
        "text",
        budget_tokens=600,
    )


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document with exact-rational idf
    (N+1)/(df+1) — bit-deterministic across engines, ties break on the
    term text."""
    from graphkb_spark.operators.sampling import tfidf_top_terms

    t = _t(spark, sf_dir, "documents")
    return tfidf_top_terms(
        t["documents"].select("doc_id", "text"), "doc_id", "text", k=5
    )


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint: min over 32-char shingles of
    the first-16-hex md5 — a 1-value MinHash, fully replicated by the
    DuckDB oracle."""
    from graphkb_spark.functions.hashing import content_fingerprint

    t = _t(spark, sf_dir, "documents")
    return t["documents"].select(
        "doc_id", content_fingerprint("text", 32).alias("fingerprint")
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: documents' text as opaque binary payloads
    with kind routing -> mapInPandas feature extraction (decode stubbed
    deterministically: dims derived from the sha256 digest, so the
    oracle can verify the full Arrow round-trip)."""
    from graphkb_spark.multimodal.binary import extract_features

    t = _t(spark, sf_dir, "documents")
    k = F.col("doc_id")
    media = t["documents"].select(
        k.alias("media_id"),
        F.when(k % 3 == 0, F.lit("image"))
        .when(k % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("kind"),
        F.lit(None).cast("string").alias("mime"),
        F.col("text").cast("binary").alias("payload"),
        F.lit(None).cast("map<string,string>").alias("meta"),
    )
    out = extract_features(media)
    return out.select(
        "media_id",
        "kind",
        "n_bytes",
        "digest",
        "width",
        "height",
        F.round("duration_s", 4).alias("duration_s"),
        F.col("decode_error").isNotNull().alias("has_error"),
    )


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal resize plumbing: image payloads normalized to a
    target resolution via mapInPandas (pixel work stubbed
    deterministically — output size is digest-derived from the target
    pixel count), non-image rows pass through byte-identical. The
    oracle verifies row alignment, pass-through lengths, and the
    resized-size contract."""
    from graphkb_spark.multimodal.binary import resize_images

    t = _t(spark, sf_dir, "documents")
    k = F.col("doc_id")
    media = t["documents"].select(
        k.alias("media_id"),
        F.when(k % 3 == 0, F.lit("image"))
        .when(k % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("kind"),
        F.lit(None).cast("string").alias("mime"),
        F.col("text").cast("binary").alias("payload"),
    )
    out = resize_images(media, width=224, height=224)
    return out.select(
        "media_id",
        "kind",
        F.length("payload").cast("int").alias("out_bytes"),
        "width",
        "height",
        F.col("resize_error").isNotNull().alias("has_error"),
    )


# --------------------------------------------------------------------------
# streaming-ish + graph
# --------------------------------------------------------------------------

def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization over the events table (lag + cumsum)."""
    t = _t(spark, sf_dir, "events")
    out = sessionize(t["events"], gap_minutes=30)
    return out.select("event_id", "user_id", "session_id")


def q_streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE Structured Streaming sessionization (applyInPandasWithState
    + event-time timeout) driven over the staged events table. Closed
    sessions are deterministic and SQL-expressible — a session is
    emitted iff a later same-user session exists (in-data gap close) or
    its end precedes the final watermark by the gap (timeout close:
    end + gap < max(ts) - gap) — so the DuckDB oracle verifies the
    streaming operator's full output exactly."""
    from graphkb_spark.streaming.stateful import streaming_sessionize

    t = _t(spark, sf_dir, "events")
    suffix = "".join(c if c.isalnum() else "_" for c in sf_dir.rstrip("/").rsplit("/", 1)[-1])
    out = streaming_sessionize(
        spark,
        t["events"],
        gap_minutes=30,
        query_name=f"q_sessions_{suffix}",
        # ~1.5k active users: 8 state partitions; 32 would spend more
        # on per-partition commit/maintenance than on sessionizing
        state_partitions=8,
    )
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
    )


def q_streaming_sessions_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE Structured Streaming sessionization (``session_window``
    state aggregation, pure JVM — no Python boundary), the Spark-first
    twin of ``streaming_sessions``. Append-mode emission: a session is
    emitted iff its end precedes the final watermark (end + 2*gap <=
    max(ts)); adjacent events exactly gap apart MERGE (closed window
    boundary) — both encoded in the oracle and pinned by
    tests/test_split_rebalance.py."""
    from graphkb_spark.streaming.stateful import streaming_sessionize_native

    t = _t(spark, sf_dir, "events")
    suffix = "".join(
        c if c.isalnum() else "_" for c in sf_dir.rstrip("/").rsplit("/", 1)[-1]
    )
    out = streaming_sessionize_native(
        spark,
        t["events"],
        gap_minutes=30,
        query_name=f"q_sessions_native_{suffix}",
        state_partitions=8,
    )
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
    )


def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (980/10/10 per mille by
    salted id-hash): a pure function of the id, so examples can never
    migrate between splits across dataset versions. Zero shuffles."""
    from graphkb_spark.operators.sampling import split_assign

    t = _t(spark, sf_dir, "documents")
    out = split_assign(t["documents"], "doc_id")
    return out.select("doc_id", "split")


def q_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sample without replacement (priority
    sampling, Duffield-Lund-Thorup JACM 2007), weighted by document
    length: priority = weight / md5-uniform, top-n by priority via
    distributed TakeOrdered. One IEEE double division per row — exactly
    rounded, so the oracle reproduces the identical sample set."""
    from graphkb_spark.operators.sampling import priority_sample

    t = _t(spark, sf_dir, "documents")
    out = priority_sample(
        t["documents"].select("doc_id", "n_chars"), "doc_id", "n_chars", n=100
    )
    return out.select("doc_id", "n_chars")


def q_domain_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-cap rebalancing: cap each event_type's contribution at
    1000 rows by hash-Bernoulli thinning at rate cap/N — the web-corpus
    pass that stops dominant domains from flooding the mix. One
    count shuffle + broadcast join + scan-speed filter; no window ever
    sees a hot domain's full row set. Output: kept rows per domain."""
    from graphkb_spark.operators.sampling import domain_rebalance

    t = _t(spark, sf_dir, "events")
    kept = domain_rebalance(
        t["events"].select("event_id", "event_type"), "event_id", "event_type", cap=1000
    )
    return kept.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_kept"))


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention matrix: users grouped by the week of
    their first event; for each (cohort_week, week_offset) the number
    of distinct users still active. Two keyed aggregations (first-seen
    per user, then the matrix) + one broadcast-able join of the
    user->cohort dimension — the standard product-analytics rollup,
    linear at any scale."""
    t = _t(spark, sf_dir, "events")
    ev = t["events"].select("user_id", "ts")
    first = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    cohort = first.select(
        "user_id", F.date_trunc("week", F.col("first_ts")).alias("cohort_week")
    )
    joined = ev.join(cohort, "user_id")
    offset = F.floor(
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("cohort_week")))
        / F.lit(7 * 24 * 3600 * 1_000_000)
    ).cast("bigint")
    return (
        joined.select("user_id", "cohort_week", offset.alias("week_offset"))
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def q_incremental_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a JOIN + aggregate: the
    materialized per-region revenue view absorbs a lineitem delta by
    joining ONLY the delta against the (broadcast) dimension chain and
    merging with the snapshot via the same keyed coalesce-add MERGE as
    incremental_agg — the historical fact rows are never rescanned.
    Decimal sums keep the two-phase merge hash-identical to the
    one-shot oracle."""
    from graphkb_spark.operators.aggregate import incremental_agg_merge

    t = _t(spark, sf_dir, "lineitem", "orders", "customer", "nation", "region")
    dim = (
        t["orders"]
        .select("o_orderkey", "o_custkey")
        .join(
            t["customer"].select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            t["nation"].select("n_nationkey", "n_regionkey"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            t["region"].select("r_regionkey", "r_name"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("o_orderkey", "r_name")
    )
    li = t["lineitem"].withColumn(
        # price(2dp) * (1-disc)(2dp): the true product has 4 decimal
        # digits, so DECIMAL(18,4) recovers it exactly from the double
        "rev_d",
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
            "decimal(18,4)"
        ),
    )
    cutoff = F.lit("1997-01-01").cast("timestamp")
    snapshot = (
        li.filter(F.col("l_shipdate") < cutoff)
        .join(F.broadcast(dim), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("r_name")
        .agg(F.sum("rev_d").alias("revenue"), F.count(F.lit(1)).alias("n"))
    )
    delta = li.filter(F.col("l_shipdate") >= cutoff).join(
        F.broadcast(dim), F.col("l_orderkey") == F.col("o_orderkey")
    )
    merged = incremental_agg_merge(
        snapshot, delta, ["r_name"], {"revenue": "rev_d"}
    )
    return merged.select(
        "r_name",
        F.round(F.col("revenue").cast("double"), 6).alias("revenue"),
        "n",
    )


def q_multiple_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group two-feature OLS via normal equations + Cramer's rule —
    one-pass distributed multiple regression with decimal-exact moment
    sums, so the closed-form coefficients hash-match the oracle
    bit-for-bit."""
    from graphkb_spark.operators.aggregate import grouped_normal_equations

    t = _t(spark, sf_dir, "lineitem")
    return grouped_normal_equations(
        t["lineitem"],
        ["l_returnflag"],
        "l_quantity",
        "l_discount",
        "l_extendedprice",
    )


def q_weighted_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-weighted exact percentiles per group (price weighted
    by quantity) via Spark's native ``percentile(col, p, freq)`` —
    semantically identical to repeating each row ``freq`` times, which
    is exactly how the DuckDB oracle computes it (generate_series
    expansion + quantile_cont). One algebraic-aggregate shuffle; the
    weights never materialize as rows on the Spark side."""
    t = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("int")
    return t["lineitem"].groupBy("l_returnflag").agg(
        F.round(
            F.percentile(F.col("l_extendedprice"), F.lit(0.5), qty), 6
        ).alias("wp50"),
        F.round(
            F.percentile(F.col("l_extendedprice"), F.lit(0.9), qty), 6
        ).alias("wp90"),
        F.sum(qty).alias("total_weight"),
    )


def q_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-flag equi-depth deciles of extended price (ntile over a
    total order, so boundary ties are deterministic): bucket counts and
    value ranges — the range-partition planning profile."""
    from graphkb_spark.operators.aggregate import equidepth_histogram

    t = _t(spark, sf_dir, "lineitem")
    return equidepth_histogram(
        t["lineitem"],
        ["l_returnflag"],
        "l_extendedprice",
        buckets=10,
        tiebreak_cols=["l_orderkey", "l_linenumber"],
    )


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credited to the user's
    most recent click/view within 72 h (NULL when none in-window) —
    one keyed shuffle + one ordered window, no touch x conversion
    range self-join. Aggregated per attributed channel."""
    from graphkb_spark.operators.aggregate import last_touch_attribution

    t = _t(spark, sf_dir, "events")
    out = last_touch_attribution(
        t["events"],
        "user_id",
        "ts",
        "event_type",
        conversion_types=["purchase"],
        touch_types=["click", "view"],
        window_hours=72,
    )
    return out.groupBy("attributed_touch").agg(
        F.count(F.lit(1)).alias("n_conversions")
    )


def q_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type Markov transition matrix: per-user consecutive-event
    pairs counted into P(to|from) — one lag window on the user key,
    one pair-count shuffle, transition-table-sized output."""
    from graphkb_spark.operators.aggregate import transition_matrix

    t = _t(spark, sf_dir, "events")
    return transition_matrix(
        t["events"], "user_id", "ts", "event_type", order_tiebreak="event_id"
    )


def q_merge_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands interval merging: each event opens a 15-minute
    activity interval per user; overlapping/touching intervals collapse
    to maximal islands. One shuffle on the user key, two partitioned
    window passes, one keyed agg reusing the partitioning."""
    from graphkb_spark.operators.aggregate import merge_intervals

    t = _t(spark, sf_dir, "events")
    iv = t["events"].select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 15 MINUTES")).alias("e"),
    )
    out = merge_intervals(iv, ["user_id"], "s", "e")
    return out.select(
        "user_id",
        F.date_format("island_start", "yyyy-MM-dd HH:mm:ss").alias("island_start"),
        F.date_format("island_end", "yyyy-MM-dd HH:mm:ss").alias("island_end"),
        "n_intervals",
    )


def q_grouped_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outliers (|z| > 3 vs the event-type cohort;
    the heavy-tailed event values yield real outliers) with
    decimal-exact moments, so borderline rows land on the same side of
    the threshold in any engine."""
    from graphkb_spark.operators.aggregate import grouped_outliers

    t = _t(spark, sf_dir, "events")
    out = grouped_outliers(t["events"], ["event_type"], "value", z=3.0)
    return out.select("event_id", "event_type", "z_score")


def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based language rebalancing (rate ∝ n^0.5 / n, the
    smallest language keeps everything, bigger ones thin toward it) —
    the multilingual mixture recipe. Deterministic hash-Bernoulli
    selection; per-language kept counts verified against the oracle's
    identical rate table."""
    from graphkb_spark.operators.sampling import temperature_sample

    t = _t(spark, sf_dir, "documents")
    kept = temperature_sample(
        t["documents"].select("doc_id", "lang"), "doc_id", "lang", alpha_pct=50
    )
    return kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup within the watermark horizon
    (``dropDuplicatesWithinWatermark``): 10% of events are replayed
    (the at-least-once producer failure mode) and the stream collapses
    them with BOUNDED state — keys expire as the watermark passes.
    Replayed rows are exact copies, so whichever copy survives, the
    output set equals the original events — which is what the oracle
    asserts, per event type."""
    from graphkb_spark.streaming.incremental import streaming_dedup

    t = _t(spark, sf_dir, "events")
    ev = t["events"].select("event_id", "ts", "event_type", "value")
    replayed = ev.unionByName(ev.filter(F.col("event_id") % 10 == 0))
    suffix = "".join(
        c if c.isalnum() else "_" for c in sf_dir.rstrip("/").rsplit("/", 1)[-1]
    )
    out = streaming_dedup(
        spark,
        replayed,
        key_cols=("event_id",),
        watermark="2 hours",
        query_name=f"q_stream_dedup_{suffix}",
    )
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary coverage: per-document out-of-vocabulary
    token rate against the corpus's own top-200 vocabulary — the
    coverage report run before freezing a tokenizer. Explode + one
    broadcast-able vocab join (LEFT) + per-doc ratio; linear, no
    windows."""
    from graphkb_spark.operators.corpus import build_vocab, tokens

    t = _t(spark, sf_dir, "documents")
    docs = t["documents"]
    vocab = build_vocab(docs, "text", vocab_size=200, min_freq=2).select(
        "token", F.lit(True).alias("__in_vocab")
    )
    tok = docs.select(
        "doc_id", F.explode(tokens("text")).alias("token")
    )
    return (
        tok.join(F.broadcast(vocab), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("__in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.col("n_oov").cast("bigint").alias("n_oov"),
            F.round(F.col("n_oov") / F.col("n_tokens"), 6).alias("oov_rate"),
        )
    )


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point power-iteration PageRank (3 rounds) over the part
    hierarchy edge set — iterative graph analytics with NO floating
    point in the loop (bigint micro-units, integer div), so the
    DuckDB oracle unrolls the identical trajectory round by round."""
    from graphkb_spark.operators.graph import pagerank

    t = _t(spark, sf_dir, "part")
    edges = (
        t["part"]
        .filter(F.col("p_partkey") >= 1)
        .select(
            F.col("p_partkey").alias("src"),
            F.expr("p_partkey div 10").alias("dst"),
        )
    )
    return pagerank(edges, n_iter=3)


def q_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling-window event aggregation (batch plan of the
    Structured Streaming query in graphkb_spark.streaming)."""
    t = _t(spark, sf_dir, "events")
    return (
        t["events"]
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
    )


def q_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM interval join (click->purchase attribution within
    10 minutes) — both sides real watermarked streams; inner+append
    emits each match exactly once, so the oracle is the equivalent
    batch self-join with the same time predicate."""
    from graphkb_spark.streaming.incremental import streaming_interval_join

    t = _t(spark, sf_dir, "events")
    suffix = "".join(c if c.isalnum() else "_" for c in sf_dir.rstrip("/").rsplit("/", 1)[-1])
    out = streaming_interval_join(
        spark, t["events"], query_name=f"q_stream_ij_{suffix}"
    )
    return out.select(
        "l_event_id",
        "r_event_id",
        "user_id",
        F.date_format("l_ts", "yyyy-MM-dd HH:mm:ss").alias("l_ts"),
        F.date_format("r_ts", "yyyy-MM-dd HH:mm:ss").alias("r_ts"),
        F.round("r_value", 4).alias("r_value"),
    )


def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means (2 Lloyd iterations, k=8, deterministic md5 init) over
    the embeddings table; the oracle unrolls the identical two
    iterations in SQL (rounded means make the float-sum order of a
    distributed avg invisible to the assignment)."""
    from graphkb_spark.operators.cluster import kmeans_assign

    t = _t(spark, sf_dir, "embeddings")
    return kmeans_assign(t["embeddings"], "embedding", "vec_id", k=8, n_iter=2)


def q_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-linear classifier inference (fasttext-style quality
    scorer) over documents — md5 feature hash, deterministic weight
    table, sigmoid; scan-speed Column algebra, no shuffle."""
    from graphkb_spark.operators.text import classifier_score

    t = _t(spark, sf_dir, "documents")
    return classifier_score(t["documents"], "text", "doc_id")


def q_dup_ngram_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate 5-gram fraction (the C4/RefinedWeb
    boilerplate filter) over documents."""
    from graphkb_spark.operators.text import duplicate_ngram_fraction

    t = _t(spark, sf_dir, "documents")
    out = duplicate_ngram_fraction(t["documents"], "text", "doc_id", shingle_n=5)
    return out.select(
        "doc_id",
        F.col("n_shingles").cast("int").alias("n_shingles"),
        F.col("n_dup").cast("long").alias("n_dup"),
        "dup_frac",
    )


def q_graph_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-hop neighborhood expansion (``neighbors: 2``) over an edges
    table built from region<-nation<-customer links."""
    t = _t(spark, sf_dir, "region", "nation", "customer")
    e1 = t["nation"].select(
        F.concat(F.lit("N"), F.col("n_nationkey")).alias("out_rid"),
        F.concat(F.lit("R"), F.col("n_regionkey")).alias("in_rid"),
        F.lit("ElementOf").alias("edge_class"),
        F.lit(None).cast("string").alias("source_rid"),
    )
    e2 = t["customer"].select(
        F.concat(F.lit("C"), F.col("c_custkey")).alias("out_rid"),
        F.concat(F.lit("N"), F.col("c_nationkey")).alias("in_rid"),
        F.lit("ElementOf").alias("edge_class"),
        F.lit(None).cast("string").alias("source_rid"),
    )
    edges = e1.unionByName(e2)
    seeds = t["region"].filter(F.col("r_regionkey") == 0).select(
        F.concat(F.lit("R"), F.col("r_regionkey")).alias("rid")
    )
    return expand_neighbors(seeds, edges, "rid", n=2)


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal as-of join: each click event picks up the most recent
    prior purchase by the same user (one-shuffle union+window plan,
    operators/asof.py). Oracle: DuckDB native ``ASOF LEFT JOIN``."""
    t = _t(spark, sf_dir, "events")
    ev = t["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_time="ts",
        right_time="ts",
        payload=["event_id", "value"],
        tie_break="event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        "asof_time",
        F.col("asof_event_id"),
        F.round("asof_value", 6).alias("asof_value"),
    )


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join via binning (operators/rangejoin.py):
    customer vs supplier account-balance windows per nation. The plan is
    two bin-exploded scans + one equi-join — never an inequality join.
    Oracle: DuckDB range-predicate join."""
    t = _t(spark, sf_dir, "customer", "supplier")
    cust = t["customer"].select(
        F.col("c_nationkey").alias("nationkey"),
        "c_custkey",
        F.col("c_acctbal").alias("start"),
        (F.col("c_acctbal") + 500).alias("end"),
    )
    supp = t["supplier"].select(
        F.col("s_nationkey").alias("nationkey"),
        "s_suppkey",
        F.col("s_acctbal").alias("start"),
        (F.col("s_acctbal") + 500).alias("end"),
    )
    out = range_join(
        cust, supp, ("start", "end"), ("start", "end"),
        on=["nationkey"], bin_size=500.0,
    )
    return out.select(
        "nationkey",
        "l_c_custkey",
        "r_s_suppkey",
        F.round(
            overlap_length(
                F.col("l_start"), F.col("l_end"), F.col("r_start"), F.col("r_end")
            ),
            6,
        ).alias("overlap"),
    ).withColumnsRenamed({"l_c_custkey": "c_custkey", "r_s_suppkey": "s_suppkey"})


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct parts per return flag with a verified error bound
    (operators/sketch.py): the sketch replaces the exact-distinct
    shuffle at scale; the boolean proves it landed within 3*rsd."""
    t = _t(spark, sf_dir, "lineitem")
    return approx_distinct_with_bound(
        t["lineitem"], ["l_returnflag"], "l_partkey", rsd=0.05
    )


def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GK-sketch p50/p95 of event value per type, each verified to sit
    between the exact quantiles at q +/- 0.02 (rank-error guarantee)."""
    t = _t(spark, sf_dir, "events")
    return approx_quantiles_with_bound(
        t["events"], ["event_type"], "value", quantiles=(0.5, 0.95)
    )


# --------------------------------------------------------------------------
# gene / therapy dimension loaders (loaders/genes.py)
# --------------------------------------------------------------------------

def q_entrez_gene_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entrez gene esummary -> Feature rows with spec-quarantine
    (loaders/genes.py:parse_entrez_genes; reference
    src/entrez/gene.js:30-46)."""
    from graphkb_spark.loaders.genes import parse_entrez_genes

    t = _t(spark, sf_dir, "part")
    k = F.col("p_partkey")
    raw = t["part"].select(
        F.when(k % 10 == 0, F.concat(F.lit("x"), k.cast("string")))
        .otherwise(k.cast("string"))
        .alias("uid"),
        F.concat(F.lit("G"), k.cast("string")).alias("name"),
        F.concat(F.lit("desc "), k.cast("string")).alias("description"),
        F.when(k % 2 == 0, F.concat(F.lit("sum "), k.cast("string"))).alias("summary"),
    )
    return parse_entrez_genes(raw)


def q_dbsnp_docsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbSNP docsum HGVS mining: split tags, descending sort, first
    NM_/NP_ match (loaders/genes.py:parse_dbsnp_records; reference
    src/entrez/snp.js:119-128) — pure JVM array algebra."""
    from graphkb_spark.loaders.genes import parse_dbsnp_records

    t = _t(spark, sf_dir, "part")
    k = F.col("p_partkey")
    ks = k.cast("string")
    docsum = F.when(k % 4 == 0, F.lit("GENE=X;LEN=1")).otherwise(
        F.concat(
            F.lit("GENE=X;HGVS=NC_"), ks, F.lit(":g.5A&gt;T,NM_"), ks,
            F.lit(":c."), ks, F.lit("T&gt;A,NP_"), ks, F.lit(":p.V"), ks,
            F.lit("E;LEN=1"),
        )
    )
    raw = t["part"].select(
        ks.alias("uid"),
        k.alias("snp_id"),
        F.lit("2024/01/01").alias("updatedate"),
        docsum.alias("docsum"),
        F.array().cast("array<string>").alias("genes"),
    )
    return parse_dbsnp_records(raw).select(
        "sourceId", "name", "hgvs_cds", "hgvs_protein", "infers_notation"
    )


def q_hgnc_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HGNC loader: current + deprecated prev-symbol + alias satellite
    Feature rows with the ORF display rule (loaders/genes.py:load_hgnc;
    reference src/hgnc/index.js:40-152)."""
    from graphkb_spark.loaders.genes import load_hgnc

    t = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    ks = k.cast("string")
    raw = t["customer"].select(
        F.concat(F.lit("HGNC:"), ks).alias("hgnc_id"),
        F.concat(
            F.lit("Gene"), ks, F.when(k % 6 == 0, F.lit("ORF7")).otherwise(F.lit(""))
        ).alias("symbol"),
        F.concat(F.lit("long "), ks).alias("name"),
        F.lit("2024-01-01").alias("date_modified"),
        F.lit(None).cast("string").alias("ensembl_gene_id"),
        F.lit(None).cast("string").alias("entrez_id"),
        F.when(k % 3 == 0, F.array(F.concat(F.lit("Prev"), ks)))
        .otherwise(F.array().cast("array<string>"))
        .alias("prev_symbol"),
        F.when(k % 4 == 0, F.array(F.concat(F.lit("Al"), ks)))
        .otherwise(F.array().cast("array<string>"))
        .alias("alias_symbol"),
    )
    feats = load_hgnc(raw)["features"]
    return feats.select(
        "name",
        "sourceId",
        "deprecated",
        "displayName",
        F.col("dependency").isNotNull().alias("has_dep"),
        "sourceIdVersion",
    )


def q_refseq_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefSeq versioned/generic Feature ladder (loaders/genes.py:
    load_refseq over the J10 hierarchy transform; reference
    src/refseq/index.js:55-146)."""
    from graphkb_spark.loaders.genes import load_refseq

    t = _t(spark, sf_dir, "part")
    k = F.col("p_partkey")
    ks = k.cast("string")
    raw = t["part"].select(
        F.concat(F.lit("NM_"), ks, F.lit("."), (k % 9 + 1).cast("string")).alias("RNA"),
        ks.alias("GeneID"),
        F.when(
            k % 3 != 0,
            F.concat(F.lit("NP_"), ks, F.lit("."), (k % 5 + 1).cast("string")),
        ).alias("Protein"),
    )
    kb = load_refseq(spark, empty_kb(spark), raw)
    return kb.features.select("biotype", "sourceId", "sourceIdVersion")


def q_fda_srs_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FDA-SRS UNII therapies: name/id skip predicate + broadcast NCIt
    resolution with per-row miss errors (loaders/genes.py:load_fda_srs;
    reference src/fdaSrs/index.js:52-99)."""
    from graphkb_spark.loaders.genes import load_fda_srs

    t = _t(spark, sf_dir, "supplier", "nation")
    k = F.col("s_suppkey")
    raw = t["supplier"].select(
        F.concat(F.lit("U"), k.cast("string")).alias("UNII"),
        F.when(k % 7 != 0, F.concat(F.lit("drug"), k.cast("string"))).alias("PT"),
        F.when(k % 2 == 0, F.concat(F.lit("C"), (k % 40).cast("string"))).alias("NCIT"),
        F.lit(None).cast("string").alias("PUBCHEM"),
    )
    ncit = t["nation"].select(
        F.concat(F.lit("ncit-"), F.col("n_nationkey").cast("string")).alias("rid"),
        F.concat(F.lit("C"), F.col("n_nationkey").cast("string")).alias("sourceId"),
    )
    return load_fda_srs(raw, ncit)["therapies"].select("sourceId", "name", "_error")


def q_chembl_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ChEMBL therapies: molformula name fallback, bracketed upper-id
    displayName, usan-stem parent rows (loaders/genes.py:
    parse_chembl_records; reference src/chembl/index.js:49-99)."""
    from graphkb_spark.loaders.genes import parse_chembl_records

    t = _t(spark, sf_dir, "part")
    k = F.col("p_partkey")
    ks = k.cast("string")
    raw = t["part"].select(
        F.concat(
            F.when(k % 2 == 0, F.lit("CHEMBL")).otherwise(F.lit("chembl")), ks
        ).alias("molecule_chembl_id"),
        F.when(k % 3 != 0, F.concat(F.lit("drug"), ks)).alias("pref_name"),
        F.concat(F.lit("C"), ks, F.lit("H2")).alias("full_molformula"),
        F.when(k % 5 == 0, F.concat(F.lit("stem"), (k % 3).cast("string"))).alias(
            "usan_stem_definition"
        ),
    )
    return parse_chembl_records(raw)["therapies"].select(
        "sourceId", "name", "displayName", "molecularFormula", "comment"
    )


# --------------------------------------------------------------------------
# paper-supplement / curated-content loaders (loaders/papers.py)
# --------------------------------------------------------------------------

def q_asco_abstracts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASCO abstracts: fill-score duplicate collapse (W4) + Abstract
    record shaping (loaders/papers.py:load_asco_abstracts; reference
    src/asco/index.js:42-68,154-166)."""
    from graphkb_spark.loaders.papers import load_asco_abstracts

    t = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    g = (k / 2).cast("long")
    gs = g.cast("string")
    filled = k % 2 == 1
    raw = t["customer"].select(
        F.concat(F.lit("a"), k.cast("string")).alias("id"),
        gs.alias("AbstID"),
        (g % 7 + 2010).cast("string").alias("Year"),
        F.concat(F.lit("M"), (g % 5).cast("string")).alias("Meeting"),
        F.concat(F.lit("t"), gs).alias("Title"),
        F.concat(F.lit("f"), gs).alias("FirstAuthor"),
        F.when(filled, F.concat(F.lit("auth"), gs)).alias("AuthorString"),
        F.when(filled, F.concat(F.lit("u"), gs)).alias("url"),
    )
    return load_asco_abstracts(raw).select(
        "abstractNumber", "authors", "displayName", "meeting", "name",
        "sourceId", "url", "year",
    )


def q_fda_approvals_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FDA approval announcements: consensus-or-null year over all
    dated lines (A5) + CuratedContent shaping (loaders/papers.py:
    load_fda_approvals; reference src/fdaApprovals/index.js:88-121)."""
    from graphkb_spark.loaders.papers import load_fda_approvals

    t = _t(spark, sf_dir, "part")
    k = F.col("p_partkey")
    y = (k % 20 + 2000).cast("string")
    content = (
        F.when(
            k % 3 == 0,
            F.concat(F.lit("On May 4, "), y, F.lit(" x. Approved May 5, "), y, F.lit(".")),
        )
        .when(k % 3 == 1, F.lit("On Jan 1, 2020 x. Later Dec 2, 2019."))
        .otherwise(F.lit("nothing dated here"))
    )
    raw = t["part"].select(
        F.concat(F.lit("/"), k.cast("string")).alias("link"),
        F.concat(F.lit("T"), k.cast("string")).alias("title"),
        content.alias("content"),
    )
    return load_fda_approvals(raw).select("sourceId", "name", "displayName", "url", "year")


def q_pmc_fusions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMC4468049 kinase fusions: partner-side subject pick, fusion
    displayName, same-kinase skip (loaders/papers.py:
    load_pmc4468049_fusions; reference src/PMC4468049/index.js:180-227)."""
    from graphkb_spark.loaders.papers import load_pmc4468049_fusions

    t = _t(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    ks = k.cast("string")
    raw = t["supplier"].select(
        F.concat(F.lit("A"), ks).alias("geneA"),
        F.concat(F.lit("B"), ks).alias("geneB"),
        F.when(k % 2 == 0, F.lit("yes")).otherwise(F.lit("no")).alias("kinaseA"),
        F.when(k % 3 == 0, F.lit("yes")).otherwise(F.lit("no")).alias("kinaseB"),
        k.alias("break1"),
        (k + 1).alias("break2"),
        F.concat(F.lit("d"), ks).alias("disease"),
    )
    return load_pmc4468049_fusions(raw).select(
        "geneA", "geneB", "subject_gene", "variant_displayName",
        "break1Repr", "relevance", "_error",
    )


def q_pmc_functional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMC4232638 functional-impact supplement: non-neutral filter,
    kinase/TP53 relevance rules, PMID list parsing (loaders/papers.py:
    load_pmc4232638; reference src/PMC4232638/index.js:58-111)."""
    from graphkb_spark.loaders.papers import load_pmc4232638

    t = _t(spark, sf_dir, "part")
    k = F.col("p_partkey")
    ks = k.cast("string")
    no, yes = F.lit("no "), F.lit("yes")
    raw = t["part"].select(
        F.concat(F.lit("g"), ks).alias("gene"),
        F.concat(F.lit("V"), (k % 700 + 1).cast("string"), F.lit("E")).alias("aa_change"),
        F.when(k % 5 == 0, F.lit("neutral")).otherwise(F.lit("non-neutral")).alias(
            "functional_classification"
        ),
        F.when(k % 4 == 0, F.lit("Oncogene")).otherwise(F.lit("TSG")).alias("type"),
        F.when(k % 2 == 0, F.lit("123, 456 (note)")).alias("pmids"),
        F.when(k % 4 == 0, yes).otherwise(no).alias("kinase"),
        F.when(k % 4 == 1, yes).otherwise(no).alias("tp53_gof"),
        F.when(k % 4 >= 1, yes).otherwise(no).alias("tp53_lof"),
        F.when(k % 4 == 2, yes).otherwise(no).alias("tp53_dominant_negative"),
    )
    out = load_pmc4232638(raw)
    return out.select(
        "gene",
        "variant_notation",
        "relevance",
        F.array_join("evidence_pmids", ",").alias("evidence"),
    )


def q_entrez_refseq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entrez nucleotide/refseq esummary parse: biomol -> biotype,
    accession split, chromosome subname (loaders/genes.py:
    parse_entrez_refseq; reference src/entrez/refseq.js:24-63)."""
    from graphkb_spark.loaders.genes import parse_entrez_refseq

    t = _t(spark, sf_dir, "part")
    k = F.col("p_partkey")
    ks = k.cast("string")
    raw = t["part"].select(
        F.when(k % 10 == 0, F.lit("bogus"))
        .otherwise(
            F.concat(
                F.element_at(
                    F.array(F.lit("NM_"), F.lit("NP_"), F.lit("NC_")),
                    (k % 3 + 1).cast("int"),
                ),
                ks, F.lit("."), (k % 7 + 1).cast("string"),
            )
        )
        .alias("accessionversion"),
        F.element_at(
            F.array(F.lit("rna"), F.lit("peptide"), F.lit("genomic")),
            (k % 3 + 1).cast("int"),
        ).alias("biomol"),
        F.concat(F.lit("title "), ks).alias("title"),
        F.when(k % 3 == 2, (k % 22 + 1).cast("string")).alias("subname"),
    )
    return parse_entrez_refseq(raw)


def q_gsc_ontology(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GSC therapeutic-ontology loader: name cleaning (inhibitors ->
    inhibitor), drugbank/chembl resolve-or-create, class subsets tags
    (loaders/genes.py:load_gsc_therapeutic_ontology; reference
    src/gscTherapeuticOntology.js:29-110,157-159)."""
    from graphkb_spark.loaders.genes import load_gsc_therapeutic_ontology

    t = _t(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    ks = k.cast("string")
    raw = t["supplier"].select(
        F.concat(F.lit("Drug"), ks).alias("source"),
        F.concat(F.lit("class"), (k % 10).cast("string"), F.lit(" inhibitors")).alias(
            "Class_1"
        ),
        F.concat(F.lit("family"), (k % 5).cast("string")).alias("Class_2"),
        F.concat(F.lit("pathway"), (k % 3).cast("string")).alias("Class_3_pathway"),
        F.lit(None).cast("string").alias("DrugBankID"),
        F.when(k % 4 == 0, F.concat(F.lit("Alias"), ks)).otherwise(F.lit("")).alias(
            "alias"
        ),
    )
    # every 2nd drug resolves against the external dim (drugbank wins)
    ext = t["supplier"].filter(k % 2 == 0).select(
        F.concat(F.lit("drug"), ks).alias("name"),
        F.concat(F.lit("db-"), ks).alias("rid"),
        F.lit(0).alias("priority"),
    )
    out = load_gsc_therapeutic_ontology(raw, ext)
    return out["therapies"].select(
        "name", "sourceId", F.array_join("subsets", "|").alias("subsets")
    )


# --------------------------------------------------------------------------
# DOCM / CGL statement loaders (loaders/statements.py)
# --------------------------------------------------------------------------

def q_docm_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOCM loader: F4 protein repair, genomic composer keyed on
    variant_type, per-disease explode with single-tag skip
    (loaders/statements.py:load_docm; reference
    src/docm/index.js:33-89,182-219)."""
    from graphkb_spark.loaders.statements import load_docm

    t = _t(spark, sf_dir, "part")
    k = F.col("p_partkey")
    ks = k.cast("string")
    n = (k % 700 + 1).cast("string")
    vt = F.element_at(
        F.array(F.lit("SNV"), F.lit("DEL"), F.lit("INS"), F.lit("COMPLEX")),
        (k % 4 + 1).cast("int"),
    )
    raw = t["part"].select(
        F.concat(F.lit("h"), ks).alias("hgvs"),
        F.when(k % 3 == 0, F.concat(F.lit("p.KK"), n, F.lit("-")))
        .otherwise(F.concat(F.lit("p.G"), n, F.lit("D")))
        .alias("amino_acid"),
        F.concat(F.lit("g"), ks).alias("gene"),
        (k % 22 + 1).cast("string").alias("chromosome"),
        F.lit("GRCh37").alias("reference_version"),
        k.alias("start"),
        (k + k % 2).alias("stop"),
        F.lit("A").alias("reference"),
        F.lit("T").alias("variant"),
        vt.alias("variant_type"),
        F.array(
            F.struct(
                (k % 50).alias("doid"),
                k.alias("source_pubmed_id"),
                F.when(k % 5 == 0, F.array(F.lit("a"), F.lit("b")))
                .otherwise(F.array(F.lit("t")))
                .alias("tags"),
            )
        ).alias("diseases"),
    )
    return load_docm(raw).select(
        "hgvs", "protein_notation", "genomic_notation", "disease_doid",
        "pubmed_id", "relevance", "_error",
    )


def q_cgl_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CGL loader: cds/protein/genomic triple with `p.(...)` cleanup,
    `*`->Ter for non-fs, first-base-mismatch errors
    (loaders/statements.py:load_cgl; reference src/cgl/index.js:44-170)."""
    from graphkb_spark.loaders.statements import load_cgl

    t = _t(spark, sf_dir, "part")
    k = F.col("p_partkey")
    ks = k.cast("string")
    n = (k % 700 + 1).cast("string")
    prot = (
        F.when(k % 4 == 0, F.concat(F.lit("p.(R"), n, F.lit("H)")))
        .when(k % 4 == 1, F.concat(F.lit("p.L"), n, F.lit("*")))
        .when(k % 4 == 2, F.concat(F.lit("p.L"), n, F.lit("fs*3")))
    )
    pos = (
        F.when(k % 3 == 0, F.lit("100"))
        .when(k % 3 == 1, F.lit("100_101"))
        .otherwise(F.lit("5"))
    )
    ref = (
        F.when(k % 3 == 0, F.lit("C"))
        .when(k % 3 == 1, F.lit("TAG"))
        .otherwise(F.lit("AC"))
    )
    alt = (
        F.when(k % 3 == 0, F.lit("T"))
        .when(k % 3 == 1, F.lit("T"))
        .otherwise(F.lit("GT"))
    )
    raw = t["part"].select(
        F.concat(F.lit("NM_"), ks, F.lit("."), (k % 9 + 1).cast("string")).alias(
            "transcript"
        ),
        F.when(k % 11 != 0, F.concat(F.lit("c."), ks, F.lit("A>G")))
        .otherwise(F.lit("x.1del"))
        .alias("coding_hgvs"),
        F.concat(F.lit("g"), ks).alias("gene"),
        prot.alias("protein_hgvs"),
        (k % 22 + 1).cast("string").alias("chr_CGL"),
        pos.alias("pos_CGL"),
        ref.alias("ref"),
        alt.alias("alt"),
    )
    return load_cgl(raw).select(
        "transcript_id", "transcript_version", "cds_notation",
        "protein_notation", "genomic_notation", "_error",
    )


def _civic_statement_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared synthesis + resolution pipeline behind the civic_sync
    queries: evidence items flow through publication resolution (PMID
    broadcast join + ASCO titlesMatch with exactly-one enforcement),
    DOID/name disease resolution, evidence-level get-or-create
    (stable-hash rids), relevance translation, profile-DNF expansion,
    therapy grouping, and the conditions/content-key statement build —
    per-row quarantine throughout (reference src/civic/index.js:67-500
    with publication.js:30-77, disease.js:12-36,
    evidenceLevel.js:30-56)."""
    from graphkb_spark.loaders.civic import (
        build_statements,
        get_or_create_evidence_levels,
        resolve_diseases,
        resolve_publications,
    )

    t = _t(spark, sf_dir, "orders", "customer", "nation")
    k = F.col("o_orderkey")
    aid = (k % 400).cast("int")
    vs = (k % 97).cast("string")
    v2 = (k % 97 + 1).cast("string")
    ev = (
        t["orders"]
        .filter(k % 3 == 0)
        .join(F.broadcast(t["nation"]), (k % 25) == F.col("n_nationkey"))
        .select(
            k.alias("k"),
            F.concat(F.lit("EID"), k.cast("string")).alias("sourceId"),
            F.when(k % 4 == 0, F.lit("PUBMED"))
            .when((k % 4).isin(1, 2), F.lit("ASCO"))
            .otherwise(F.lit("OTHER"))
            .alias("source_type"),
            F.col("o_custkey").alias("citation_id"),
            aid.alias("asco_abstract_id"),
            (F.lit(2010) + aid % 10 + F.when(k % 13 == 0, F.lit(1)).otherwise(F.lit(0)))
            .cast("int")
            .alias("publication_year"),
            F.concat(F.lit("Abstract "), aid.cast("string"), F.lit(".")).alias(
                "source_title"
            ),
            F.when(
                k % 5 != 0,
                F.concat(
                    F.lit("https://meetings.asco.org/abstracts/asco-"),
                    aid.cast("string"),
                ),
            ).alias("source_url"),
            F.element_at(
                F.array(F.lit("A"), F.lit("B"), F.lit("C"), F.lit("D"), F.lit("E")),
                (k % 5 + 1).cast("int"),
            ).alias("evidence_level"),
            F.when(k % 7 != 0, (k % 5 + 1).cast("int")).alias("evidence_rating"),
            F.when(k % 11 == 10, F.concat(F.lit("mystery-"), k.cast("string")))
            .otherwise(F.col("n_name"))
            .alias("disease"),
            F.when((k % 2 == 0) & (k % 11 != 10), (k % 25).cast("int")).alias("doid"),
            F.when(k % 9 == 0, F.concat(F.lit("V"), vs, F.lit(" AND V"), v2))
            .when(k % 9 == 3, F.concat(F.lit("V"), vs, F.lit(" OR V"), v2))
            .otherwise(F.concat(F.lit("V"), vs))
            .alias("profile_expr"),
            F.when(k % 4 == 0, F.array(F.lit("tA"), F.lit("tB")))
            .when(k % 4 == 1, F.array(F.lit("tC")))
            .when(k % 4 == 2, F.array(F.lit("tB"), F.lit("tA")))
            .otherwise(F.array().cast("array<string>"))
            .alias("therapies"),
            F.when(k % 4 == 0, F.lit("SUBSTITUTES"))
            .when(k % 4 == 2, F.lit("COMBINATION"))
            .alias("therapyInteractionType"),
            F.element_at(
                F.array(
                    F.lit("PREDICTIVE"), F.lit("DIAGNOSTIC"), F.lit("PROGNOSTIC"),
                    F.lit("FUNCTIONAL"),
                ),
                (k % 4 + 1).cast("int"),
            ).alias("evidence_type"),
            F.when(k % 2 == 0, F.lit("SUPPORTS"))
            .otherwise(F.lit("DOES_NOT_SUPPORT"))
            .alias("direction"),
            F.element_at(
                F.array(
                    F.lit("SENSITIVITYRESPONSE"), F.lit("RESISTANCE"),
                    F.lit("POSITIVE"), F.lit("POOR_OUTCOME"),
                    F.lit("GAIN_OF_FUNCTION"),
                ),
                (k % 5 + 1).cast("int"),
            ).alias("significance"),
        )
    )
    pm = t["customer"].filter(F.col("c_custkey") % 10 != 7).select(
        F.col("c_custkey").alias("sourceId"),
        F.concat(F.lit("pm_"), F.col("c_custkey").cast("string")).alias("rid"),
    )
    a = F.col("abstract_id")
    ab_base = spark.range(400).select(
        F.col("id").cast("int").alias("abstract_id")
    ).select(
        "abstract_id",
        (F.lit(2010) + a % 10).cast("int").alias("year"),
        F.concat(F.lit("Abstract "), a.cast("string")).alias("name"),
        F.concat(F.lit("asco-"), a.cast("string")).alias("sourceId"),
        F.concat(F.lit("ab_"), a.cast("string")).alias("rid"),
    )
    abstracts = ab_base.unionByName(
        ab_base.filter(a % 50 == 3).withColumn(
            "rid", F.concat(F.lit("ab2_"), a.cast("string"))
        )
    )
    diseases = t["nation"].select(
        F.concat(F.lit("doid:"), F.col("n_nationkey").cast("string")).alias("sourceId"),
        F.col("n_name").alias("name"),
        F.concat(F.lit("dis_"), F.col("n_nationkey").cast("string")).alias("rid"),
    )
    ev = resolve_publications(ev, pm, abstracts)
    ev = resolve_diseases(ev, diseases)
    ev, _levels = get_or_create_evidence_levels(ev, None)
    return build_statements(spark, ev)


def q_civic_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end CIViC evidence resolve->expand pipeline (see
    _civic_statement_candidates); the reconcile write-half is
    civic_sync_reconcile."""
    out = _civic_statement_candidates(spark, sf_dir)
    return out.select(
        "k",
        "source_type",
        "publication_rid",
        "disease_rid",
        "evidence_level_rid",
        "relevance",
        "therapy",
        F.concat_ws("|", "conditions").alias("conditions_str"),
        "content_key",
        F.col("_error").alias("err"),
    )


def q_civic_sync_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full resolve->expand->reconcile loop (reference
    src/civic/index.js:340-409): statement candidates diffed against a
    stored table — stored rows matching on the conditions content key
    become updates (stored rid kept), new content creates, stored
    tombstones with no counterpart delete."""
    from graphkb_spark.loaders.civic import sync_statements

    cand = (
        _civic_statement_candidates(spark, sf_dir)
        .filter(F.col("_error").isNull())
        .select("k", "sourceId",
                F.col("conditions").cast("array<string>").alias("conditions"),
                "relevance", "content_key")
        # feeds stored (twice) + the sync diff; localCheckpoint so the
        # blocks free on GC instead of accumulating across calls
        .transform(materialize)
    )
    stored = cand.filter(F.col("k") % 2 == 0).select(
        "sourceId",
        "conditions",
        "relevance",
        F.concat(F.lit("st_"), "content_key").alias("rid"),
    ).unionByName(
        cand.filter(F.col("k") % 2 == 0)
        .select("sourceId")
        .distinct()
        .select(
            "sourceId",
            F.array(F.concat(F.lit("ZZZ"), F.col("sourceId"))).alias("conditions"),
            F.lit("tombstone").alias("relevance"),
            F.concat(F.lit("del_"), F.col("sourceId")).alias("rid"),
        )
    )
    actions = sync_statements(spark, stored, candidates=cand)
    return actions.select(
        "sourceId",
        F.concat_ws("|", "conditions").alias("conditions_str"),
        "relevance",
        "rid",
        F.col("_action").alias("action"),
    )


def q_statement_variant_link(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statement conditions carrying typed variant rids (reference
    src/docm/index.js:155-219: addVariant per protein+genomic form,
    genomic -Infers-> protein, statement conditions reference the
    protein variant rid): the DOCM loader output flows through batch
    load_variants and the statements join back against the variants
    table and Infers edges — variant_found / infers_ok prove rid
    agreement between the content-hash in the statement path and the
    variants table."""
    from graphkb_spark.kb import load_variants
    from graphkb_spark.loaders.statements import load_docm

    t = _t(spark, sf_dir, "part")
    k = F.col("p_partkey")
    ks = k.cast("string")
    n = (k % 700 + 1).cast("string")
    vt = F.element_at(
        F.array(F.lit("SNV"), F.lit("DEL"), F.lit("INS"), F.lit("COMPLEX")),
        (k % 4 + 1).cast("int"),
    )
    raw = t["part"].select(
        F.concat(F.lit("h"), ks).alias("hgvs"),
        F.when(k % 3 == 0, F.concat(F.lit("p.KK"), n, F.lit("-")))
        .otherwise(F.concat(F.lit("p.G"), n, F.lit("D")))
        .alias("amino_acid"),
        F.concat(F.lit("g"), ks).alias("gene"),
        (k % 22 + 1).cast("string").alias("chromosome"),
        F.lit("GRCh37").alias("reference_version"),
        k.alias("start"),
        (k + k % 2).alias("stop"),
        F.lit("A").alias("reference"),
        F.lit("T").alias("variant"),
        vt.alias("variant_type"),
        F.array(
            F.struct(
                (k % 50).alias("doid"),
                k.alias("source_pubmed_id"),
                F.when(k % 5 == 0, F.array(F.lit("a"), F.lit("b")))
                .otherwise(F.array(F.lit("t")))
                .alias("tags"),
            )
        ).alias("diseases"),
    )
    valid = load_docm(raw).filter(F.col("_error").isNull()).transform(materialize)
    prot_note = F.concat("gene", F.lit(":"), "protein_notation")
    notes = valid.select(
        F.col("hgvs").alias("grp"), prot_note.alias("notation")
    ).unionByName(
        valid.select(F.col("hgvs").alias("grp"),
                     F.col("genomic_notation").alias("notation"))
    )
    feats = t["part"].select(
        F.concat(F.lit("g"), ks).alias("name"),
        F.concat(F.lit("f-g"), ks).alias("rid"),
    ).unionByName(
        spark.range(1, 23).select(
            F.col("id").cast("string").alias("name"),
            F.concat(F.lit("f-c"), F.col("id").cast("string")).alias("rid"),
        )
    )
    # 'indel' deliberately missing: COMPLEX genomic forms quarantine,
    # exercising the unresolved-vocabulary path (their Infers edge is
    # then absent -> infers_ok false)
    vocab = spark.createDataFrame(
        [(v, f"v-{v}") for v in ("missense", "deletion", "substitution", "insertion")],
        "name string, rid string",
    )
    out = load_variants(
        notes, "docm-demo", features=feats, vocabulary=vocab, group_col="grp"
    )
    from graphkb_spark.functions.hashing import stable_hash_named

    st = valid.select(
        F.col("hgvs").alias("sourceId"),
        "disease_doid",
        "relevance",
        stable_hash_named(
            cls=F.lit("PositionalVariant"),
            displayName=prot_note,
            source=F.lit("docm-demo"),
        ).alias("variant_rid"),
        stable_hash_named(
            cls=F.lit("PositionalVariant"),
            displayName=F.col("genomic_notation"),
            source=F.lit("docm-demo"),
        ).alias("genomic_rid"),
    )
    vt_dim = out["variants"].select(F.col("rid").alias("variant_rid")).withColumn(
        "__vf", F.lit(True)
    )
    ed = out["edges"].select(
        F.col("out_rid").alias("genomic_rid"),
        F.col("in_rid").alias("variant_rid"),
        F.lit(True).alias("__inf"),
    )
    st = (
        st.join(vt_dim, "variant_rid", "left")
        .join(ed, ["genomic_rid", "variant_rid"], "left")
        .select(
            "sourceId",
            "variant_rid",
            "genomic_rid",
            "disease_doid",
            "relevance",
            F.coalesce("__vf", F.lit(False)).alias("variant_found"),
            F.coalesce("__inf", F.lit(False)).alias("infers_ok"),
            F.concat_ws(
                "|", F.array_sort(F.array("variant_rid", "disease_doid"))
            ).alias("conditions_str"),
        )
    )
    return st


def q_source_registry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2 static config-as-source: the bundled source registry (the
    reference's src/sources.js records incl. the sort ranks feeding the
    J2 preference comparator) seeded into a KB in one batch upsert."""
    from graphkb_spark.kb import empty_kb
    from graphkb_spark.sources.registry import seed_sources

    kb = seed_sources(spark, empty_kb(spark))
    return kb.sources


def q_graph_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive ancestor closure over a synthetic part hierarchy
    (node -> node div 10) via pointer doubling — O(log depth) join
    rounds, each localCheckpointed. The materialize-the-closure-once
    pattern replaces the reference's per-query subclassof chain walks
    (src/graphkb.js:341-372). Oracle: DuckDB recursive CTE."""
    from graphkb_spark.operators.graph import transitive_closure

    t = _t(spark, sf_dir, "part")
    edges = t["part"].filter(F.col("p_partkey") >= 1).select(
        F.col("p_partkey").alias("src"),
        F.expr("p_partkey div 10").alias("dst"),
    )
    # node -> node div 10: depth = digit count of the max key (<= 7
    # even at 10M parts), so 3 doubling rounds (covers depth 8) close
    # the graph with no per-round convergence-count jobs
    out = transitive_closure(edges, rounds=3)
    return out.select(
        F.col("src").alias("node"),
        F.col("dst").alias("ancestor"),
        F.col("dist").cast("long").alias("dist"),
    )


def q_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact rollup through the ancestor closure: lineitem quantity
    aggregated to every hierarchy node including all descendants —
    closure computed once (pointer doubling), then ONE broadcast
    equi-join + grouped agg over the fact table, never a per-level
    pass. The ontology-rollup shape of GraphKB statement counting."""
    from graphkb_spark.operators.graph import hierarchy_rollup

    t = _t(spark, sf_dir, "part", "lineitem")
    edges = t["part"].filter(F.col("p_partkey") >= 1).select(
        F.col("p_partkey").alias("src"),
        F.expr("p_partkey div 10").alias("dst"),
    )
    facts = t["lineitem"].select(
        F.col("l_partkey").alias("part"), "l_quantity"
    )
    return hierarchy_rollup(
        facts,
        edges,
        fact_node="part",
        agg_exprs=[
            F.round(F.sum("l_quantity"), 6).alias("total_qty"),
            F.count(F.lit(1)).alias("n_lineitems"),
        ],
        # known div-10 hierarchy: fixed 3 doubling rounds (depth <= 8)
        closure_rounds=3,
    )


def q_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide trigram frequency table (KenLM-style count pass):
    narrow codegen n-gram generation, one partial-aggregating shuffle,
    top-150 ranking on the aggregated table only."""
    from graphkb_spark.operators.corpus import ngram_counts

    t = _t(spark, sf_dir, "documents")
    return ngram_counts(t["documents"], "text", n=3, min_count=2, top=150)


def q_grouped_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS + correlation screening (slope, intercept,
    Pearson r, R²) as algebraic aggregates — one shuffle, map-side
    combined, no second pass."""
    from graphkb_spark.operators.aggregate import grouped_regression

    t = _t(spark, sf_dir, "lineitem")
    return grouped_regression(
        t["lineitem"],
        ["l_returnflag", "l_linestatus"],
        x_col="l_quantity",
        y_col="l_extendedprice",
    )


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase): one grouped shuffle
    + codegen array walk; the oracle takes the equivalent
    min-ts-per-stage join path."""
    from graphkb_spark.operators.aggregate import funnel_counts

    t = _t(spark, sf_dir, "events")
    return funnel_counts(
        t["events"], "user_id", "event_type", "ts",
        ["view", "click", "purchase"],
    )


def q_rolling_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-row moving average of event value per user —
    partitioned window, one shuffle, no global sort."""
    from graphkb_spark.operators.aggregate import rolling_mean

    t = _t(spark, sf_dir, "events")
    out = rolling_mean(
        t["events"], "user_id", ["ts", "event_id"], "value", window_rows=7
    )
    return out.select("event_id", "user_id", "rolling_avg")


def q_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width price histogram (5000-wide buckets) — one
    partial-aggregating shuffle on the bucket id."""
    from graphkb_spark.operators.aggregate import histogram_fixed

    t = _t(spark, sf_dir, "lineitem")
    return histogram_fixed(t["lineitem"], "l_extendedprice", step=5000.0)


def q_time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time-bucket rollup: events truncated to the
    hour with count / value-sum / distinct-user aggregates — one
    partial-aggregating shuffle on the bucket (the distinct adds its
    keyed expand), the continuous-aggregate shape at any scale."""
    t = _t(spark, sf_dir, "events")
    return (
        t["events"]
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training (8 merges) over the documents corpus.
    Oracle: the 8 data-dependent merge rounds unrolled as chained
    MATERIALIZED CTEs in DuckDB (``_bpe_oracle_sql``), each recomputing
    weighted pair counts, taking the argmax, and re-segmenting via a
    sentinel-delimited string replace. The merge sequence is also
    verified against a pure-Python reference BPE in
    tests/test_graph_closure_corpus.py."""
    from graphkb_spark.operators.corpus import bpe_train

    t = _t(spark, sf_dir, "documents")
    return bpe_train(t["documents"], "text", n_merges=8)


# The tokenizer artifact: 8 merge rules trained once on the documents
# corpus (bpe_train at sf0.01) and frozen — exactly how production
# tokenizers ship (GPT-2's merges.txt). Encoding must NOT re-train:
# the artifact is a constant, the encode is pure scan-speed string
# algebra. Note rule 6 ("m"+"er") consumes rule 1's output — real BPE
# sequencing, so application order matters and is preserved.
PRETRAINED_BPE_MERGES: list[tuple[str, str]] = [
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"),
    ("s", "t"), ("m", "er"), ("a", "t"), ("l", "u"),
]


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with a pre-trained BPE merge table
    (``PRETRAINED_BPE_MERGES``): each rule is one narrow sentinel-
    string replace at scan speed — zero shuffles, zero Python, ONE job.
    Training lives in the separate ``bpe_train`` query; re-training
    inside every encode (the pre-round-9 form) spent 22 of the
    query's 23 jobs producing a constant. Output: per-document BPE
    token count. The oracle applies the identical frozen rules."""
    from graphkb_spark.operators.corpus import bpe_encode

    t = _t(spark, sf_dir, "documents")
    return bpe_encode(t["documents"], "doc_id", "text", PRETRAINED_BPE_MERGES)


def q_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter key profile (top 20 user_ids by event count, with
    share and rank) — the pre-join skew diagnostic."""
    from graphkb_spark.operators.skew import key_skew_profile

    t = _t(spark, sf_dir, "events")
    return key_skew_profile(t["events"], "user_id", top=20)


def q_grouped_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile``
    == DuckDB ``quantile_cont``)."""
    from graphkb_spark.operators.aggregate import grouped_percentiles

    t = _t(spark, sf_dir, "lineitem")
    return grouped_percentiles(
        t["lineitem"], ["l_returnflag"], "l_extendedprice"
    )


def q_cube_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping_id: per-(flag,status) totals plus per-flag
    and grand-total subtotal rows — one pass, Spark expands the
    grouping sets map-side."""
    t = _t(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def q_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event counts per user into typed columns (explicit pivot
    value list keeps the plan one-pass, no distinct-values pre-scan)."""
    t = _t(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "signup", "error"]
    p = (
        t["events"]
        .groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "user_id",
        *[
            F.coalesce(F.col(k), F.lit(0)).cast("long").alias(f"n_{k}")
            for k in kinds
        ],
    )


def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the pre-1997
    aggregate snapshot is merged with the 1997+ raw delta by one keyed
    full-outer coalesce-add — the historical rows are never
    re-aggregated. Oracle: one-shot aggregation of the full table."""
    from graphkb_spark.operators.aggregate import incremental_agg_merge

    t = _t(spark, sf_dir, "lineitem")
    # Decimal sums on BOTH sides (here and the oracle): decimal addition
    # is exactly associative, so the snapshot+delta two-phase merge is
    # hash-identical to the oracle's one-shot sum at any split point —
    # double-precision sums are order-dependent at the 1e-6 rounding
    # boundary and failed the driver's exact value hash in round 5.
    li = t["lineitem"].withColumns(
        {
            "qty_d": F.col("l_quantity").cast("decimal(18,2)"),
            "price_d": F.col("l_extendedprice").cast("decimal(18,2)"),
        }
    )
    cutoff = F.lit("1997-01-01").cast("timestamp")
    sum_map = {"sum_qty": "qty_d", "sum_price": "price_d"}
    snapshot = (
        li.filter(F.col("l_shipdate") < cutoff)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            *[F.sum(s).alias(d) for d, s in sum_map.items()],
            F.count(F.lit(1)).alias("n"),
        )
    )
    delta = li.filter(F.col("l_shipdate") >= cutoff)
    merged = incremental_agg_merge(
        snapshot, delta, ["l_returnflag", "l_linestatus"], sum_map
    )
    return merged.select(
        "l_returnflag",
        "l_linestatus",
        F.round(F.col("sum_qty").cast("double"), 6).alias("sum_qty"),
        F.round(F.col("sum_price").cast("double"), 6).alias("sum_price"),
        "n",
    )


def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram-LM quality proxy (avg conditional log2
    probability under the corpus's own bigram counts) — the KenLM-style
    perplexity filter. Vocab-sized count tables, keyed joins, linear."""
    from graphkb_spark.operators.corpus import lm_score

    t = _t(spark, sf_dir, "documents")
    return lm_score(t["documents"], "doc_id", "text")


def q_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key fact-to-dimension join with deterministic 8-way
    salting (operators/skew.py): the dimension replicates R ways, the
    fact scatters by xxhash64-mod-R, so a dominant key spreads over R
    tasks — the explicit fix for broadcast-ineligible skewed dims that
    AQE cannot split. Result aggregated per market segment; the oracle
    is the same join UNsalted, proving salting changes the physical
    distribution and nothing else."""
    from graphkb_spark.operators.skew import salted_join

    t = _t(spark, sf_dir, "events", "customer")
    fact = t["events"].select("event_id", "user_id", "value")
    dim = t["customer"].select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(fact, dim, on=["user_id"], salt=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


def q_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style per-source boilerplate removal. The corpus carries no
    natural cross-page chrome, so the query PREPENDS a deterministic
    8-word per-source banner (the pii_redact injection pattern) — one
    full segment on the grid — and the operator must strip exactly that
    segment from every document while keeping the content segments."""
    from graphkb_spark.operators.corpus import strip_boilerplate

    t = _t(spark, sf_dir, "documents")
    docs = t["documents"].select(
        "doc_id",
        "source",
        F.concat(
            F.lit("visit "),
            F.col("source"),
            F.lit(" home page for great content today "),
            F.col("text"),
        ).alias("text"),
    )
    out = strip_boilerplate(
        docs, "doc_id", "text", "source", seg_words=8, max_doc_frac=0.5, min_docs=2
    )
    return out.select(
        "doc_id", "source", "n_segments", "kept_segments", "clean_text"
    )


def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-40 adjacent-bigram collocations by PMI (Church & Hanks),
    min count 5 — phrase mining over the corpus."""
    from graphkb_spark.operators.corpus import pmi_collocations

    t = _t(spark, sf_dir, "documents")
    return pmi_collocations(t["documents"], "text", min_count=5, top_k=40)


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-based quality flags per document (word count,
    mean word length, duplicate-word fraction, stopword fraction) —
    narrow scan-speed plan, zero shuffles."""
    from graphkb_spark.operators.text import gopher_quality_flags

    t = _t(spark, sf_dir, "documents")
    return gopher_quality_flags(t["documents"], "doc_id", "text")


def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type winsorization of the value column at p05/p95 —
    outlier-robust normalization before model consumption."""
    from graphkb_spark.operators.aggregate import winsorize_per_group

    t = _t(spark, sf_dir, "events")
    out = winsorize_per_group(
        t["events"], ["event_type"], "value", lower=0.05, upper=0.95
    )
    return out.select(
        "event_id", "event_type", "value_w", "clipped_low", "clipped_high"
    )


def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs straddling a 50/50 train/val split — the eval
    leakage audit after split_assign. Split is a pure function of the
    id (no join); pair generation is one minhash_lsh run."""
    from graphkb_spark.operators.dedup import split_leakage

    t = _t(spark, sf_dir, "documents")
    out = split_leakage(
        t["documents"],
        "text",
        "doc_id",
        splits={"train": 1, "val": 1},
        jaccard_threshold=0.6,
    )
    return out.select(
        "id_a", "id_b", F.round("jaccard", 4).alias("jaccard"), "split_a", "split_b"
    )


def q_dedup_against(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus near-dup flagging: documents outside src0-src4
    that near-duplicate anything inside src0-src4 (the incremental
    crawl-vs-trained-set dedup)."""
    from graphkb_spark.operators.dedup import dedup_against

    t = _t(spark, sf_dir, "documents")
    ref_sources = ["src0", "src1", "src2", "src3", "src4"]
    docs = t["documents"]
    return dedup_against(
        docs.filter(~F.col("source").isin(ref_sources)),
        docs.filter(F.col("source").isin(ref_sources)),
        "text",
        "doc_id",
        jaccard_threshold=0.6,
    )


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle participation over a synthetic co-occurrence
    graph (order x part keys folded to 20k nodes) — degree-ordered
    wedge enumeration, each triangle counted exactly once."""
    from graphkb_spark.operators.graph import triangle_counts

    t = _t(spark, sf_dir, "lineitem")
    edges = t["lineitem"].select(
        (F.col("l_orderkey") % 20000).alias("src"),
        ((F.col("l_partkey") * 3) % 20000).alias("dst"),
    )
    return triangle_counts(edges)


def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension build from the event log: per-user
    event_type history collapsed to change points with validity
    intervals (ties on ts break on the attribute)."""
    from graphkb_spark.operators.merge import scd2_build

    t = _t(spark, sf_dir, "events")
    out = scd2_build(t["events"], ["user_id"], "ts", ["event_type"])
    return out.select(
        "user_id",
        "event_type",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        "is_current",
    )


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-user sketch per event type (k=64) — a sketch an
    external engine reproduces bit-for-bit, unlike HLL registers."""
    from graphkb_spark.operators.sketch import kmv_distinct

    t = _t(spark, sf_dir, "events")
    return kmv_distinct(t["events"], ["event_type"], "user_id", k=64)


def q_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact int64 Gram matrix over the int8-quantized embeddings —
    the PCA-prep pass as a mergeable mapInPandas accumulator (one
    partial d x d Gram per Arrow batch, merged by a tiny keyed agg)."""
    from graphkb_spark.operators.similarity import gram_matrix_quantized

    t = _t(spark, sf_dir, "embeddings")
    return gram_matrix_quantized(t["embeddings"], "embedding")


def q_mixture_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted-fair-queueing data mixing: src0/src1 weighted 4x, the
    first 200 positions of the deterministic global training order."""
    from graphkb_spark.operators.sampling import mixture_interleave

    t = _t(spark, sf_dir, "documents")
    return mixture_interleave(
        t["documents"], "doc_id", "source",
        weights={"src0": 4.0, "src1": 4.0}, limit=200,
    )


def q_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup KEEP decision: n-gram Jaccard pairs ->
    connected components -> best doc per cluster (longest, then lowest
    id). sum(cluster_size) == corpus size; the kept ids ARE the
    post-dedup corpus."""
    from graphkb_spark.operators.dedup import canonical_per_cluster

    t = _t(spark, sf_dir, "documents")
    docs = t["documents"].select("doc_id", "n_chars")
    pairs = ngram_jaccard_pairs(
        t["documents"], "text", "doc_id", shingle_n=3, threshold=0.8
    ).select("id_a", "id_b")
    out = canonical_per_cluster(
        docs, pairs, "doc_id",
        [F.col("n_chars").desc(), F.col("doc_id").asc()],
    )
    return out.select("comp", "doc_id", "n_chars", "cluster_size")


def q_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch (linear) attribution: each purchase's credit split
    across the user's click/view touches in the prior 72 h — one
    forward window + one rollup, no range self-join."""
    from graphkb_spark.operators.aggregate import linear_attribution

    t = _t(spark, sf_dir, "events")
    return linear_attribution(
        t["events"], "user_id", "ts", "event_type",
        conversion_types=["purchase"], touch_types=["click", "view"],
    )


def q_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-level data-quality gate (deequ shape): seven rules over
    the documents batch evaluated in ONE aggregation scan."""
    from graphkb_spark.operators.expectations import run_expectations

    t = _t(spark, sf_dir, "documents")
    rules = [
        {"column": "doc_id", "check": "not_null"},
        {"column": "doc_id", "check": "unique"},
        {"column": "text", "check": "not_null", "threshold": 0.99},
        {"column": "n_chars", "check": "min", "bound": 1},
        {"column": "n_chars", "check": "max", "bound": 10000},
        {"column": "lang", "check": "in_set",
         "values": ["en", "de", "es", "fr"], "threshold": 0.95},
        {"column": "n_chars", "check": "mean_between", "lo": 50, "hi": 500},
    ]
    return run_expectations(t["documents"], rules)


def q_quality_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley drift monitor over per-source document length in
    ingest order, with a +150-char mean shift injected into src7's
    second half (the pii_redact injection pattern) — the monitor must
    flag rows after the shift and stay quiet elsewhere."""
    from graphkb_spark.operators.aggregate import page_hinkley_drift

    t = _t(spark, sf_dir, "documents")
    rk = Window.partitionBy("source").orderBy(F.col("doc_id").asc())
    cnt = Window.partitionBy("source")
    docs = (
        t["documents"]
        .withColumn("__rk", F.row_number().over(rk))
        .withColumn("__n", F.count(F.lit(1)).over(cnt))
        .withColumn(
            "value",
            (
                F.col("n_chars")
                + F.when(
                    (F.col("source") == "src7")
                    & (F.col("__rk") > F.col("__n") / 2),
                    F.lit(150),
                ).otherwise(F.lit(0))
            ).cast("double"),
        )
        .select("source", "doc_id", "value")
    )
    out = page_hinkley_drift(
        docs, ["source"], [F.col("doc_id").asc()], "value", lambda_sigma=6.0
    )
    return out.select("source", "doc_id", "value", "ph_up", "ph_down")


def q_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day (rolling WAU) via
    the contribute-explode shape — no range join, no per-day rescans."""
    from graphkb_spark.operators.aggregate import rolling_distinct

    t = _t(spark, sf_dir, "events")
    out = rolling_distinct(t["events"], "ts", "user_id", window_days=7)
    return out.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"), "n_distinct"
    )


def q_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence graph: part-class pairs sharing >= 2
    orders, per-actor degree capped at 50 (the projection-sampling
    guard against power actors)."""
    from graphkb_spark.operators.graph import cooccurrence_edges

    t = _t(spark, sf_dir, "lineitem")
    ev = t["lineitem"].select(
        "l_orderkey", (F.col("l_partkey") % 500).alias("item")
    )
    return cooccurrence_edges(
        ev, "l_orderkey", "item", min_shared=2, actor_cap=50
    )


def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the event stream joins the customer
    dimension (broadcast per micro-batch) and aggregates per hourly
    window x market segment; complete mode == the batch plan, which
    the oracle runs."""
    from graphkb_spark.streaming.incremental import streaming_enrich

    t = _t(spark, sf_dir, "events", "customer")
    dim = t["customer"].select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    suffix = "".join(
        c if c.isalnum() else "_" for c in sf_dir.rstrip("/").rsplit("/", 1)[-1]
    )
    out = streaming_enrich(
        spark,
        t["events"].select("event_id", "user_id", "ts", "value"),
        dim,
        on="user_id",
        segment_col="c_mktsegment",
        query_name=f"q_stream_enrich_{suffix}",
    )
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "c_mktsegment",
        "n",
        "total_value",
    )


def q_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-fold CV assignment over documents — fold sizes
    and membership are a pure md5 function of the id."""
    from graphkb_spark.operators.sampling import kfold_assign

    t = _t(spark, sf_dir, "documents")
    out = kfold_assign(t["documents"], "doc_id", k=5)
    return out.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


def q_range_join_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """range_join with the bin width MEASURED from the left side's
    median interval length (approx_percentile probe) — identical
    results to any fixed bin, so the fixed-bin oracle verifies it."""
    from graphkb_spark.operators.rangejoin import range_join_auto

    t = _t(spark, sf_dir, "part", "supplier")
    left = t["part"].select(
        F.col("p_partkey").alias("id"),
        ((F.col("p_partkey") * 7) % 10000).alias("s"),
        ((F.col("p_partkey") * 7) % 10000 + (F.col("p_size") % 20) + 1).alias("e"),
    )
    right = t["supplier"].select(
        F.col("s_suppkey").alias("id"),
        ((F.col("s_suppkey") * 13) % 10000).alias("s"),
        ((F.col("s_suppkey") * 13) % 10000 + 15).alias("e"),
    )
    out = range_join_auto(left, right, ("s", "e"), ("s", "e"))
    return out.select(
        F.col("l_id"), F.col("r_id"),
        F.greatest("l_s", "r_s").alias("overlap_start"),
        F.least("l_e", "r_e").alias("overlap_end"),
    )


def q_diversity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source mixture health: volume, type-token ratio, and the
    distinct-trigram fraction (templated-source detector)."""
    from graphkb_spark.operators.corpus import diversity_report

    t = _t(spark, sf_dir, "documents")
    return diversity_report(t["documents"], "source", "text")


def q_embedding_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact integer projection of the quantized embeddings onto four
    deterministic component vectors — the apply-side of the Gram/PCA
    pipeline, bit-identical in any engine."""
    from graphkb_spark.operators.similarity import project_quantized

    t = _t(spark, sf_dir, "embeddings")
    comps = [[((i * (k + 3)) % 7) - 3 for i in range(64)] for k in range(4)]
    out = project_quantized(t["embeddings"], comps, "embedding")
    return out.select("vec_id", "p0", "p1", "p2", "p3")


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining: per anchor, the 5 most
    similar vectors with a DIFFERENT label."""
    from graphkb_spark.operators.similarity import hard_negative_mining

    t = _t(spark, sf_dir, "embeddings")
    emb = t["embeddings"].withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    out = hard_negative_mining(emb, emb.filter(F.col("vec_id") < 5), k=5)
    return out.select(
        "query_id", "query_label", "neighbor_id", "neighbor_label",
        F.round("cos_sim", 4).alias("cos_sim"), "rank",
    )


def q_pcm_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode path: deterministic int16 PCM synthesized per
    document (s_i = ((doc_id*7 + i*i) % 2048) - 1024, 800 samples),
    decoded by the numpy mapInPandas operator into per-frame RMS; the
    oracle computes the identical energies straight from the formula —
    proving the byte-level decoder, not just the plumbing."""
    from graphkb_spark.multimodal.binary import pcm_frame_energy

    t = _t(spark, sf_dir, "documents")

    @F.pandas_udf("binary")
    def synth_pcm(doc_id: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for d in doc_id:
            i = np.arange(800, dtype=np.int64)
            s = ((int(d) * 7 + i * i) % 2048) - 1024
            out.append(s.astype("<i2").tobytes())
        return pd.Series(out)

    media = t["documents"].select(
        F.col("doc_id").alias("media_id"), synth_pcm("doc_id").alias("payload")
    )
    return pcm_frame_energy(media, frame_samples=160)


def q_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding health: decimal-exact mean/std plus
    range per coordinate (dead/skewed-dimension detector)."""
    from graphkb_spark.operators.similarity import embedding_dim_stats

    t = _t(spark, sf_dir, "embeddings")
    return embedding_dim_stats(t["embeddings"], "embedding")


def q_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ER survivorship: one golden record per user from the event
    history — most frequent event_type (deterministic tie-break),
    max value, earliest ts."""
    from graphkb_spark.operators.reconcile import survivorship_merge

    t = _t(spark, sf_dir, "events")
    ev = t["events"].withColumn("first_ts", F.col("ts"))
    out = survivorship_merge(
        ev, "user_id",
        mode_cols=["event_type"], max_cols=["value"], min_cols=["first_ts"],
    )
    return out.select(
        "user_id",
        F.round("value", 6).alias("max_value"),
        F.date_format("first_ts", "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        "event_type",
    )


def q_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal alignment: each user's value series interpolated at
    synthetic half-hour probe timestamps (exact hits, lerps, and
    out-of-range NULLs all exercised)."""
    from graphkb_spark.operators.asof import interpolate_at

    t = _t(spark, sf_dir, "events")
    ev = t["events"].select("user_id", "ts", "value").filter(
        F.col("user_id") < 40
    )
    probes = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("__t0"))
        .select(
            "user_id",
            F.explode(
                F.array(*[
                    (F.col("__t0") + F.expr(f"INTERVAL {30 * i} MINUTES"))
                    for i in range(4)
                ])
            ).alias("ts"),
        )
    )
    out = interpolate_at(ev, probes, "user_id", "ts", "value")
    return out.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        "value_interp",
        "method",
    )


def q_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 behavioral paths: sessionize (30-min gap) then the most
    common ordered event-type sequences, truncated at 8 steps."""
    from graphkb_spark.operators.aggregate import top_paths
    from graphkb_spark.streaming.incremental import sessionize

    t = _t(spark, sf_dir, "events")
    sess = sessionize(t["events"], "user_id", "ts", gap_minutes=30)
    return top_paths(
        sess, ["user_id", "session_id"], "ts", "event_type",
        max_len=8, top_k=20, order_tiebreak="event_id",
    )


def q_priority_sample_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quota sampling: 10 docs per lang, weight
    proportional to length, without replacement (DLT priorities)."""
    from graphkb_spark.operators.sampling import priority_sample_grouped

    t = _t(spark, sf_dir, "documents")
    out = priority_sample_grouped(
        t["documents"], ["lang"], "doc_id", "n_chars", n_per_group=10
    )
    return out.select("lang", "doc_id", "n_chars")


def q_kmv_distinct_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeable-accumulator KMV variant (per-batch top-k + one
    bounded merge — the corpus-scale path): bit-identical estimates to
    kmv_distinct, so it shares the same oracle."""
    from graphkb_spark.operators.sketch import kmv_distinct_merged

    t = _t(spark, sf_dir, "events")
    return kmv_distinct_merged(t["events"], ["event_type"], "user_id", k=64)


# --------------------------------------------------------------------------
# driver contract
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: revenue per region through the full
    dimension chain (broadcast joins + aggregation)."""
    return q_broadcast_dim_join(spark, "/root/testdata/sf0.001")


def q_cms_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimates for every user in the event
    stream (depth 4, width 64 -- small enough that collisions occur and
    the over-count guarantee is exercised), with the exact count and the
    one-sided cms_ok check alongside."""
    from graphkb_spark.operators.sketch import count_min_estimate

    t = _t(spark, sf_dir, "events")
    return count_min_estimate(t["events"], "user_id", depth=4, width=64)


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust modified-z-score outliers (median/MAD) on event value per
    event type -- the 50%-breakdown sibling of grouped_outliers."""
    from graphkb_spark.operators.aggregate import mad_outliers

    t = _t(spark, sf_dir, "events")
    out = mad_outliers(
        t["events"].select("event_id", "event_type", "value"),
        ["event_type"],
        "value",
        threshold=3.5,
    )
    return out.select("event_id", "event_type", "value", "robust_z", "is_outlier")


def q_cdc_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log replay to a final snapshot: the event stream read as a
    change log per user ('error' events are tombstones, everything else
    upserts type+value); last operation wins on (ts, event_id)."""
    from graphkb_spark.operators.merge import cdc_replay

    t = _t(spark, sf_dir, "events")
    log = t["events"].select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "event_type",
        "value",
    )
    return cdc_replay(
        log, ["user_id"], ["ts", "event_id"], "op", ["event_type", "value"]
    )


def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly gap-filled event-value series per event type: one row per
    (type, hour) from each type's first to last event, forward-filling
    the most recent value; is_observed marks hours with real events."""
    from graphkb_spark.operators.asof import gap_fill

    t = _t(spark, sf_dir, "events")
    return gap_fill(t["events"], "event_type", "ts", "value", step_seconds=3600)


def q_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered selective join: orders of NATION_10's customers
    only -- the runtime-filter pattern that avoids shuffling the 99% of
    fact rows that match nothing. Result identical to the plain join
    (no false negatives), which is exactly what the oracle checks."""
    from graphkb_spark.operators.bloom import bloom_prefilter_join

    t = _t(spark, sf_dir, "orders", "customer", "nation")
    cust = (
        t["customer"]
        .join(
            t["nation"].filter(F.col("n_name") == "NATION_10"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "c_name")
    )
    joined = bloom_prefilter_join(t["orders"], cust, "o_custkey", "c_custkey")
    return joined.select("o_orderkey", "o_custkey", "c_name", "o_totalprice")


def q_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood ER blocking over part names (window 5 on the
    (p_name, p_partkey) total order): the candidate pairs a pairwise
    matcher would score -- prefix-similar names land in one window."""
    from graphkb_spark.operators.dedup import sorted_neighborhood_pairs

    t = _t(spark, sf_dir, "part")
    return sorted_neighborhood_pairs(t["part"], "p_partkey", "p_name", window=5)


def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source tokenizer fertility (BPE-ish tokens per whitespace
    word, tokens per 100 chars) over the document corpus."""
    from graphkb_spark.operators.text import tokenizer_fertility

    t = _t(spark, sf_dir, "documents")
    return tokenizer_fertility(t["documents"], "source", "text")


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance log-weights toward the src7 slice of the corpus:
    hashed-unigram (1024 buckets, add-1 smoothing) target-vs-raw
    log-ratio summed per document, decimal-exact."""
    from graphkb_spark.operators.sampling import dsir_log_weights

    t = _t(spark, sf_dir, "documents")
    return dsir_log_weights(
        t["documents"], "doc_id", "text", F.col("source") == "src7", n_buckets=1024
    )


def q_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension join: each click event looks up the
    user's value-tier SCD2 version active at the click instant —
    union + keyed forward-fill window, never a range join."""
    from graphkb_spark.operators.merge import scd2_build, scd2_lookup

    t = _t(spark, sf_dir, "events")
    tier = (
        F.when(F.col("value") < 20, F.lit("low"))
        .when(F.col("value") < 55, F.lit("mid"))
        .otherwise(F.lit("high"))
    )
    mut = t["events"].select("user_id", "ts", tier.alias("tier"))
    dim = scd2_build(mut, ["user_id"], "ts", ["tier"])
    facts = t["events"].filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    return scd2_lookup(facts, dim, ["user_id"], "ts", ["tier"])


def q_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch set algebra per event type: estimated union /
    Jaccard / intersection of first-half vs second-half active user
    sets (k=64), bit-identical to the DuckDB replay of the sketch."""
    from graphkb_spark.operators.sketch import kmv_set_similarity

    t = _t(spark, sf_dir, "events")
    half = F.when(
        F.col("ts") < F.lit("2024-01-16").cast("timestamp"), F.lit("h1")
    ).otherwise(F.lit("h2"))
    ev = t["events"].select("event_type", "user_id", half.alias("half"))
    return kmv_set_similarity(
        ev, ["event_type"], "user_id", "half", "h1", "h2", k=64
    )


def q_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probabilistic record linkage: sorted-neighborhood candidate
    pairs on customer name, scored with Fellegi-Sunter log2(m/u)
    field-agreement weights on nation / market segment / phone
    prefix."""
    from graphkb_spark.operators.dedup import sorted_neighborhood_pairs
    from graphkb_spark.operators.linkage import fellegi_sunter

    t = _t(spark, sf_dir, "customer")
    cust = t["customer"]
    pairs = sorted_neighborhood_pairs(cust, "c_custkey", "c_name", window=3)
    attrs = cust.select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).alias("c_balband"),
    )
    a = attrs.select(*[F.col(c).alias(c + "_a") for c in attrs.columns])
    b = attrs.select(*[F.col(c).alias(c + "_b") for c in attrs.columns])
    enriched = (
        pairs.join(a, pairs["id_a"] == a["c_custkey_a"])
        .join(b, pairs["id_b"] == b["c_custkey_b"])
        .select(
            "id_a", "id_b",
            "c_nationkey_a", "c_nationkey_b",
            "c_mktsegment_a", "c_mktsegment_b",
            "c_balband_a", "c_balband_b",
        )
    )
    scored = fellegi_sunter(
        enriched,
        [
            ("nation", "c_nationkey_a", "c_nationkey_b", 0.9, 0.04),
            ("segment", "c_mktsegment_a", "c_mktsegment_b", 0.9, 0.2),
            ("balband", "c_balband_a", "c_balband_b", 0.95, 0.08),
        ],
        threshold=2.0,
    )
    return scored.select(
        "id_a", "id_b", "agree_nation", "agree_segment", "agree_balband",
        "match_score", "is_match",
    )


def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical ranking fused with embedding-
    cosine ranking (query = vector 0) by reciprocal-rank fusion
    (k=60, top-100 per list, fused top-50)."""
    from graphkb_spark.operators.sampling import bm25_scores
    from graphkb_spark.operators.similarity import cosine, rrf_fuse

    t = _t(spark, sf_dir, "documents", "embeddings")
    lexical = bm25_scores(
        t["documents"], "text", "doc_id", terms=["spark", "merge", "stream"]
    )
    emb = t["embeddings"].withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    qv = F.broadcast(
        emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("__qv"))
    )
    semantic = emb.crossJoin(qv).select(
        "vec_id", cosine("__qv", "embedding").alias("cos_sim")
    )
    return rrf_fuse(
        [("bm25", lexical, "bm25"),
         ("cosine", semantic.withColumnRenamed("vec_id", "doc_id"), "cos_sim")],
        "doc_id",
        k=60,
        per_list=100,
        top_n=50,
    )


def q_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse lexical all-pairs similarity: TF-IDF cosine >= 0.25 via
    a term-keyed inverted-index self-join (never all-pairs), stop
    terms pruned at 30% document frequency."""
    from graphkb_spark.operators.similarity import tfidf_cosine_pairs

    t = _t(spark, sf_dir, "documents")
    return tfidf_cosine_pairs(
        t["documents"], "doc_id", "text", threshold=0.25, max_df_frac=0.3
    )


def q_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline of lineitems minimizing (price, quantity) — the
    two-phase bucketed cummin, no unpartitioned window."""
    from graphkb_spark.operators.aggregate import pareto_frontier_2d

    t = _t(spark, sf_dir, "lineitem")
    li = t["lineitem"].select(
        (F.col("l_orderkey") * 100 + F.col("l_linenumber")).alias("lid"),
        "l_extendedprice",
        "l_quantity",
    )
    return pareto_frontier_2d(li, "l_extendedprice", "l_quantity", "lid")


def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-round k-core peel (k=7) of the triangle-count co-occurrence
    graph; fixed peels, checkpoint-bounded plans."""
    from graphkb_spark.operators.graph import kcore

    t = _t(spark, sf_dir, "lineitem")
    edges = t["lineitem"].select(
        (F.col("l_orderkey") % 20000).alias("src"),
        ((F.col("l_partkey") * 3) % 20000).alias("dst"),
    )
    return kcore(edges, k=7, rounds=3)


def q_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout audit: Morton-interleave (quantized value,
    user id) on events into 256 file buckets and report the
    data-skipping min/max ranges per bucket."""
    from graphkb_spark.operators.layout import zorder_layout_stats

    t = _t(spark, sf_dir, "events")
    ev = t["events"].select(
        F.least(F.floor(F.col("value") * 100), F.lit(65535))
        .cast("bigint")
        .alias("zx"),
        (F.col("user_id") % 65536).alias("zy"),
    )
    return zorder_layout_stats(ev, "zx", "zy", bits=16, n_buckets=256)


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed n-gram containment join (|A∩B|/|A| >= 0.7): quotes and
    doc-inside-doc duplication that symmetric Jaccard misses; PPJoin
    prefix on the contained side against the full posting list."""
    from graphkb_spark.operators.dedup import ngram_containment_pairs

    t = _t(spark, sf_dir, "documents")
    return ngram_containment_pairs(
        t["documents"], "text", "doc_id", shingle_n=3, threshold=0.7
    )


def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan for the event landing zone: hourly
    files per day partition, running-total packed into ~100 KB bins."""
    from graphkb_spark.operators.layout import compaction_plan

    t = _t(spark, sf_dir, "events")
    files = (
        t["events"]
        .groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("part_date"),
            F.hour("ts").alias("file_id"),
        )
        .agg((F.count(F.lit(1)) * 128).alias("size_bytes"))
    )
    return compaction_plan(files, "part_date", "file_id", "size_bytes", 100_000)


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style one-pass profile of the orders table: exact
    per-column null counts, distinct counts, numeric ranges."""
    from graphkb_spark.operators.profile import table_profile

    t = _t(spark, sf_dir, "orders")
    return table_profile(t["orders"])


def q_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd rounds of k=4 k-means over the embeddings —
    deterministic md5 init, integer-scaled exact centroid means,
    bit-reproducible assignments."""
    from graphkb_spark.operators.cluster import kmeans_train

    t = _t(spark, sf_dir, "embeddings")
    return kmeans_train(t["embeddings"], "vec_id", "embedding", k=4, rounds=2)


def q_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-20 anomaly scores per user over the value series: the
    point is excluded from its own window so spikes cannot mask
    themselves; decimal-exact windowed moments."""
    from graphkb_spark.operators.aggregate import rolling_zscore

    t = _t(spark, sf_dir, "events")
    out = rolling_zscore(
        t["events"].select("user_id", "ts", "event_id", "value"),
        "user_id",
        ["ts", "event_id"],
        "value",
    )
    return out.select(
        "user_id", "event_id", "roll_mean", "roll_std", "zscore", "is_anomaly"
    )


def q_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lag-1 / lag-7 features with deltas and percent change
    over the event value series — the forecasting feature frame."""
    from graphkb_spark.operators.aggregate import lag_features

    t = _t(spark, sf_dir, "events")
    out = lag_features(
        t["events"].select("user_id", "ts", "event_id", "value"),
        "user_id",
        ["ts", "event_id"],
        "value",
        lags=(1, 7),
    )
    return out.select(
        "user_id", "event_id", "lag_1", "delta_1", "pct_change_1",
        "lag_7", "delta_7", "pct_change_7",
    )


def q_topn_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dashboard rollup: top-10 parts by decimal-exact revenue, the
    tail collapsed into one OTHER row, never sorted."""
    from graphkb_spark.operators.aggregate import topn_with_other

    t = _t(spark, sf_dir, "lineitem")
    return topn_with_other(t["lineitem"], "l_partkey", "l_extendedprice", n=10)


def q_neyman_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-optimal stratified sample: 2000 events allocated
    across event types by Neyman allocation (N_h * sigma_h), md5-rank
    selection inside each stratum."""
    from graphkb_spark.operators.sampling import neyman_stratified_sample

    t = _t(spark, sf_dir, "events")
    return neyman_stratified_sample(
        t["events"], "event_type", "event_id", "value", budget=2000
    )


def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quantile normalization of document lengths: after
    it, every source has the identical length distribution."""
    from graphkb_spark.operators.aggregate import quantile_normalize

    t = _t(spark, sf_dir, "documents")
    return quantile_normalize(t["documents"], "source", "doc_id", "n_chars")


def q_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-shift changepoint per event type over the value series in
    time order: the binary-segmentation split from decimal-exact
    prefix sums, one shuffle."""
    from graphkb_spark.operators.aggregate import mean_shift_changepoint

    t = _t(spark, sf_dir, "events")
    return mean_shift_changepoint(
        t["events"], ["event_type"], ["ts", "event_id"], "value"
    )


def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversity re-ranking of the exact top-15 candidates for 5
    queries (k=5, lambda=0.7): greedy argmax of relevance minus
    max-similarity-to-selected, DataFrame-parallel across queries."""
    from graphkb_spark.operators.similarity import cosine_topk, mmr_rerank

    t = _t(spark, sf_dir, "embeddings")
    emb = t["embeddings"].withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 5)
    cands = cosine_topk(emb, queries, k=15).select(
        "query_id", "neighbor_id", "cos_sim"
    )
    withv = cands.join(
        emb.select(
            F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("vec")
        ),
        "neighbor_id",
    )
    return mmr_rerank(
        withv, "query_id", "neighbor_id", "cos_sim", "vec", k=5, lam=0.7
    )


def q_negative_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic link-prediction negative sampling over the
    co-occurrence graph: md5-proposed destinations, existing edges
    anti-joined away, first 3 survivors per source."""
    from graphkb_spark.operators.graph import negative_edge_samples

    t = _t(spark, sf_dir, "lineitem")
    edges = t["lineitem"].select(
        (F.col("l_orderkey") % 20000).alias("src"),
        ((F.col("l_partkey") * 3) % 20000).alias("dst"),
    )
    return negative_edge_samples(edges, n_nodes=20000, k=3)


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI distribution drift of event values, first half-month vs
    second: 10 fixed-width bins, epsilon-smoothed per-bin terms."""
    from graphkb_spark.operators.aggregate import psi_drift

    t = _t(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp")
    ev = t["events"].select(
        F.when(F.col("ts") < cut, F.lit("base")).otherwise(F.lit("cur")).alias(
            "period"
        ),
        "value",
    )
    return psi_drift(ev, "period", "value", "base", "cur", n_bins=10)


def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation of users: recency/frequency/monetary quintile
    scores against pooled percentile edges, no global sort."""
    from graphkb_spark.operators.aggregate import rfm_scores

    t = _t(spark, sf_dir, "events")
    return rfm_scores(t["events"], "user_id", "ts", "value")


def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column handling: the events props JSON parsed
    at scan speed (get_json_object), per-type stats of the extracted
    field — exact integer sums, no Python."""
    t = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        t["events"]
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("k").isNull().cast("long")).cast("bigint").alias("n_null"),
            F.sum("k").cast("bigint").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.round(F.sum("k") / F.count("k"), 6).alias("k_avg"),
        )
    )


def q_stream_hopping_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window streaming counts (1 h window, 30 min slide):
    each event feeds two overlapping windows under the watermark."""
    from graphkb_spark.streaming.incremental import streaming_hopping_counts

    t = _t(spark, sf_dir, "events")
    suffix = "".join(
        c if c.isalnum() else "_" for c in sf_dir.rstrip("/").rsplit("/", 1)[-1]
    )
    return streaming_hopping_counts(
        spark,
        t["events"].select("event_id", "ts", "event_type"),
        query_name=f"q_stream_hop_{suffix}",
    )


def q_stream_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MERGE via foreachBatch: the event stream applied as
    keyed upserts (latest per user by ts, event_id) into a snapshot,
    key-partitioned staging so batch order cannot change the answer."""
    from graphkb_spark.streaming.incremental import streaming_upsert_foreachbatch

    t = _t(spark, sf_dir, "events")
    suffix = "".join(
        c if c.isalnum() else "_" for c in sf_dir.rstrip("/").rsplit("/", 1)[-1]
    )
    out = streaming_upsert_foreachbatch(
        spark,
        t["events"].select("user_id", "ts", "event_id", "event_type", "value"),
        query_name=f"q_stream_upsert_{suffix}",
    )
    return out.select("user_id", "ts", "event_id", "event_type", "value")


def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order totals: observed vs expected
    digit mass with per-digit chi-square contributions."""
    from graphkb_spark.operators.validate import benford_audit

    t = _t(spark, sf_dir, "orders")
    return benford_audit(t["orders"], "o_totalprice")


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-anonymity audit (k=5) of events under the quasi-identifier
    (event_type, day, value band)."""
    from graphkb_spark.operators.validate import k_anonymity

    t = _t(spark, sf_dir, "events")
    qi = t["events"].select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.floor(F.col("value") / 50).cast("bigint").alias("value_band"),
    )
    return k_anonymity(qi, ["event_type", "day", "value_band"], k=5)


def q_prefix_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Category-tree rollup: every prefix of the part type path
    aggregates its rows and decimal-exact retail-price total."""
    from graphkb_spark.operators.aggregate import prefix_rollup

    t = _t(spark, sf_dir, "part")
    return prefix_rollup(t["part"], "p_type", "p_retailprice")


def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf slope of the corpus vocabulary (top 200 terms): ln freq ~
    ln rank OLS from 9-digit-rounded decimal-summed moments."""
    from graphkb_spark.operators.aggregate import zipf_fit

    t = _t(spark, sf_dir, "documents")
    return zipf_fit(t["documents"], "text", top_n=200)


def q_er_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution: sorted-neighborhood blocking ->
    Fellegi-Sunter scoring (threshold 6: two strong agreements) ->
    connected components -> one entity id per customer."""
    from graphkb_spark.operators.dedup import (
        connected_components,
        sorted_neighborhood_pairs,
    )
    from graphkb_spark.operators.linkage import fellegi_sunter

    t = _t(spark, sf_dir, "customer")
    cust = t["customer"]
    pairs = sorted_neighborhood_pairs(cust, "c_custkey", "c_name", window=3)
    attrs = cust.select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).alias("c_balband"),
    )
    a = attrs.select(*[F.col(c).alias(c + "_a") for c in attrs.columns])
    b = attrs.select(*[F.col(c).alias(c + "_b") for c in attrs.columns])
    enriched = (
        pairs.join(a, pairs["id_a"] == a["c_custkey_a"])
        .join(b, pairs["id_b"] == b["c_custkey_b"])
    )
    scored = fellegi_sunter(
        enriched,
        [
            ("nation", "c_nationkey_a", "c_nationkey_b", 0.9, 0.04),
            ("segment", "c_mktsegment_a", "c_mktsegment_b", 0.9, 0.2),
            ("balband", "c_balband_a", "c_balband_b", 0.95, 0.08),
        ],
        threshold=6.0,
    )
    matches = scored.filter(F.col("is_match")).select("id_a", "id_b")
    nodes = cust.select(F.col("c_custkey").alias("id"))
    comp = connected_components(matches, nodes)
    return comp.select(
        F.col("node").alias("c_custkey"), F.col("comp").alias("entity_id")
    )


def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimizer-style join cardinality estimate: coordinated md5 key
    sampling (1/16) of orders x customer on custkey, scaled back."""
    from graphkb_spark.operators.sketch import join_size_estimate

    t = _t(spark, sf_dir, "orders", "customer")
    return join_size_estimate(
        t["orders"], t["customer"], "o_custkey", "c_custkey", sample_mod=16
    )


def q_referential_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table FK audit: event user_ids against the customer key
    space — orphan rows/keys and parent coverage in one summary row."""
    from graphkb_spark.operators.validate import referential_check

    t = _t(spark, sf_dir, "events", "customer")
    return referential_check(t["events"], t["customer"], "user_id", "c_custkey")


def q_ab_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample A/B z-report on per-user spend (variants on user id
    parity), decimal-exact moments end to end."""
    from graphkb_spark.operators.aggregate import ab_delta

    t = _t(spark, sf_dir, "events")
    units = (
        t["events"]
        .groupBy("user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(38,10)"))
            .cast("double")
            .alias("spend")
        )
        .withColumn("variant", F.pmod(F.col("user_id"), F.lit(2)).cast("int"))
    )
    return ab_delta(units, "variant", "spend", 0, 1)


def q_fs_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unsupervised EM fit (2 rounds) of Fellegi-Sunter m/u/p over the
    customer sorted-neighborhood pairs — posteriors rounded to 9 and
    decimal-summed, so the whole fit hash-matches the unrolled SQL
    replay."""
    from graphkb_spark.operators.dedup import sorted_neighborhood_pairs
    from graphkb_spark.operators.linkage import fellegi_sunter, fellegi_sunter_em

    t = _t(spark, sf_dir, "customer")
    cust = t["customer"]
    pairs = sorted_neighborhood_pairs(cust, "c_custkey", "c_name", window=3)
    attrs = cust.select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).alias("c_balband"),
    )
    a = attrs.select(*[F.col(c).alias(c + "_a") for c in attrs.columns])
    b = attrs.select(*[F.col(c).alias(c + "_b") for c in attrs.columns])
    enriched = (
        pairs.join(a, pairs["id_a"] == a["c_custkey_a"])
        .join(b, pairs["id_b"] == b["c_custkey_b"])
    )
    scored = fellegi_sunter(
        enriched,
        [
            ("nation", "c_nationkey_a", "c_nationkey_b", 0.9, 0.04),
            ("segment", "c_mktsegment_a", "c_mktsegment_b", 0.9, 0.2),
            ("balband", "c_balband_a", "c_balband_b", 0.95, 0.08),
        ],
    ).select("agree_nation", "agree_segment", "agree_balband")
    return fellegi_sunter_em(
        scored, ["agree_nation", "agree_segment", "agree_balband"], rounds=2
    )


def q_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair rules over orders (parts folded to 50 item
    classes): Apriori-pruned pair join, directed confidence + lift."""
    from graphkb_spark.operators.aggregate import association_rules

    t = _t(spark, sf_dir, "lineitem")
    baskets = t["lineitem"].select(
        "l_orderkey", (F.col("l_partkey") % 50).alias("item")
    )
    return association_rules(
        baskets, "l_orderkey", "item", min_support=100, min_confidence=0.05
    )


def q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted A/B readout: per-user pre-period spend as the
    covariate for post-period spend, variants split on user id parity;
    decimal-exact moments make theta and the adjusted means
    bit-reproducible."""
    from graphkb_spark.operators.aggregate import cuped_adjust

    t = _t(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp")
    dec = "decimal(38,10)"
    units = (
        t["events"]
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("ts") < cut, F.col("value")).otherwise(0.0).cast(dec))
            .cast("double")
            .alias("pre_value"),
            F.sum(F.when(F.col("ts") >= cut, F.col("value")).otherwise(0.0).cast(dec))
            .cast("double")
            .alias("post_value"),
        )
        .withColumn("variant", F.pmod(F.col("user_id"), F.lit(2)).cast("int"))
    )
    return cuped_adjust(units, "variant", "post_value", "pre_value")


def q_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval evaluation harness: recall@5 and MRR of the
    quantized-rerank ANN against the exact cosine top-5 for the same
    5 queries — both pipelines deterministic, so the metrics are
    hash-checkable."""
    from graphkb_spark.operators.similarity import cosine_topk, quantized_topk

    t = _t(spark, sf_dir, "embeddings")
    emb = t["embeddings"].withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk(emb, queries, k=5).select(
        "query_id", "neighbor_id", F.col("rank").alias("erank")
    )
    approx = quantized_topk(emb, queries, k=5).select(
        "query_id", "neighbor_id", F.col("rank").alias("arank")
    )
    j = exact.join(approx, ["query_id", "neighbor_id"], "left")
    recall = j.groupBy("query_id").agg(
        F.round(F.count("arank") / F.lit(5.0), 4).alias("recall_at_5")
    )
    mrr = (
        exact.filter(F.col("erank") == 1)
        .join(approx, ["query_id", "neighbor_id"], "left")
        .select(
            "query_id",
            F.round(
                F.coalesce(F.lit(1.0) / F.col("arank"), F.lit(0.0)), 4
            ).alias("mrr"),
        )
    )
    return recall.join(mrr, "query_id")


def q_stream_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming trending feed: hourly tumbling-window event-type
    counts under a 2-hour watermark, top-3 per closed window ranked on
    the emitted aggregates (never per-event state)."""
    from graphkb_spark.streaming.incremental import streaming_windowed_topk

    t = _t(spark, sf_dir, "events")
    suffix = "".join(
        c if c.isalnum() else "_" for c in sf_dir.rstrip("/").rsplit("/", 1)[-1]
    )
    return streaming_windowed_topk(
        spark,
        t["events"].select("event_id", "ts", "event_type"),
        query_name=f"q_stream_topk_{suffix}",
    )


def q_stream_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming near-dup suppression: micro-batches of documents are
    MinHash-banded and band-joined against the accumulated state;
    id-ordered arrival makes the stream equal to the static
    keep-lowest-id rule, so the full streaming pipeline is value-hash
    verified against the batch minhash_lsh oracle."""
    from graphkb_spark.streaming.incremental import streaming_minhash_dedup

    t = _t(spark, sf_dir, "documents")
    suffix = "".join(
        c if c.isalnum() else "_" for c in sf_dir.rstrip("/").rsplit("/", 1)[-1]
    )
    return streaming_minhash_dedup(
        spark,
        t["documents"],
        "doc_id",
        "text",
        num_hashes=32,
        bands=16,
        jaccard_threshold=0.6,
        hasher="md5",
        query_name=f"q_stream_mhd_{suffix}",
    )


def q_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail perplexity bucketing: bigram-LM score
    per document, exact tertile cutoffs from ONE scalar aggregate
    broadcast back — never an ntile window over the corpus."""
    from graphkb_spark.operators.corpus import perplexity_buckets

    t = _t(spark, sf_dir, "documents")
    return perplexity_buckets(t["documents"], "doc_id", "text")


def q_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary-growth fit over the 3-gram shingle
    vocabulary (the MinHash/dedup state table): V(N) = K * N^beta via
    first-occurrence positions (two-phase prefix-sum doc offsets +
    one groupBy-min), 16 prefix checkpoints, decimal-summed OLS."""
    from graphkb_spark.operators.corpus import heaps_fit

    t = _t(spark, sf_dir, "documents")
    return heaps_fit(t["documents"], "doc_id", "text", shingle_n=3)


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: k-means-cluster the embeddings (deterministic md5
    init), within-cluster cosine pairs only (equi-join on cluster —
    never all-pairs), drop docs with a lower-id near-twin."""
    from graphkb_spark.operators.dedup import semantic_dedup

    t = _t(spark, sf_dir, "embeddings")
    return semantic_dedup(
        t["embeddings"], "vec_id", "embedding", k=8, rounds=2, tau=0.35
    )


def q_lsh_band_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash band planner evaluated on the corpus's own near-dup
    pair mass: expected banding recall 1-(1-s^r)^b per (b, r)
    factorization of a 64-hash budget, over exact-Jaccard pairs from
    the PPJoin prefix-filter join."""
    from graphkb_spark.operators.dedup import lsh_band_tuning

    t = _t(spark, sf_dir, "documents")
    return lsh_band_tuning(
        t["documents"], "text", "doc_id", num_hashes=64, sim_floor=0.5
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Ordering contract: the driver's correctness gate checks the FIRST 50
    # entries in insertion order, so the window ROTATES each round. The
    # rotation is now an explicit list (_R9_WINDOW below) applied over the
    # registry literal, so future rounds edit a 50-name list instead of
    # reordering a 215-entry dict.
    # Round-9 window: the 4 queries NEW this round lead, then every query
    # whose implementation changed this round (materialize() rewiring of
    # all iterative operators, the merge-sink/kb_io writer interface, the
    # Fellegi-Sunter/Neyman/Benford edge-case fixes, the similarity-norm
    # precompute, the pre-trained-BPE encode, the cluster-module merge,
    # the triangle wedge reorder, the multimodal decoder gating), then an
    # overdue block of r6/r7-window queries that haven't been driver-
    # checked since. Everything else is green in the full local sweep.
    all_q = {
        "stream_minhash_dedup": q_stream_minhash_dedup,
        "semantic_dedup": q_semantic_dedup,
        "lsh_band_tuning": q_lsh_band_tuning,
        "perplexity_buckets": q_perplexity_buckets,
        "heaps_fit": q_heaps_fit,
        "rolling_zscore": q_rolling_zscore,
        "lag_features": q_lag_features,
        "topn_other": q_topn_other,
        "neyman_sample": q_neyman_sample,
        "quantile_normalize": q_quantile_normalize,
        "changepoint": q_changepoint,
        "mmr_rerank": q_mmr_rerank,
        "negative_edges": q_negative_edges,
        "psi_drift": q_psi_drift,
        "rfm": q_rfm,
        "json_props": q_json_props,
        "stream_hopping_counts": q_stream_hopping_counts,
        "stream_upsert": q_stream_upsert,
        "benford": q_benford,
        "k_anonymity": q_k_anonymity,
        "prefix_rollup": q_prefix_rollup,
        "zipf_fit": q_zipf_fit,
        "er_entities": q_er_entities,
        "join_size_estimate": q_join_size_estimate,
        "referential_check": q_referential_check,
        "ab_delta": q_ab_delta,
        "fs_em": q_fs_em,
        "association_rules": q_association_rules,
        "cuped": q_cuped,
        "ann_recall_eval": q_ann_recall_eval,
        "stream_windowed_topk": q_stream_windowed_topk,
        "containment_pairs": q_containment_pairs,
        "compaction_plan": q_compaction_plan,
        "table_profile": q_table_profile,
        "kmeans_train": q_kmeans_train,
        "tfidf_cosine_pairs": q_tfidf_cosine_pairs,
        "pareto_frontier": q_pareto_frontier,
        "kcore": q_kcore,
        "zorder_stats": q_zorder_stats,
        "scd2_lookup": q_scd2_lookup,
        "kmv_set_ops": q_kmv_set_ops,
        "fellegi_sunter": q_fellegi_sunter,
        "rrf_fusion": q_rrf_fusion,
        "cms_counts": q_cms_counts,
        "mad_outliers": q_mad_outliers,
        "cdc_replay": q_cdc_replay,
        "gap_fill": q_gap_fill,
        "bloom_join": q_bloom_join,
        "sorted_neighborhood": q_sorted_neighborhood,
        "tokenizer_fertility": q_tokenizer_fertility,
        "dsir_weights": q_dsir_weights,
        "gopher_quality": q_gopher_quality,
        "boilerplate_strip": q_boilerplate_strip,
        "scd2": q_scd2,
        "kmv_distinct": q_kmv_distinct,
        "kmv_distinct_merged": q_kmv_distinct_merged,
        "graph_closure": q_graph_closure,
        "hierarchy_rollup": q_hierarchy_rollup,
        "grouped_percentiles": q_grouped_percentiles,
        "cube_rollup": q_cube_rollup,
        "pivot_events": q_pivot_events,
        "rolling_average": q_rolling_average,
        "histogram_bins": q_histogram_bins,
        "grouped_regression": q_grouped_regression,
        "salted_skew_join": q_salted_skew_join,
        "sessionize": q_sessionize,
        "edit_distance_join": q_edit_distance_join,
        "edit_distance_join_k2": q_edit_distance_join_k2,
        "decontaminate": q_decontaminate,
        "civic_sync": q_civic_sync,
        "civic_sync_reconcile": q_civic_sync_reconcile,
        "reconcile": q_reconcile,
        "dedup_fillscore": q_dedup_fillscore,
        "stream_interval_join": q_stream_interval_join,
        "classifier_score": q_classifier_score,
        "dup_ngram_frac": q_dup_ngram_frac,
        "chunk_documents": q_chunk_documents,
        "segment_dedup": q_segment_dedup,
        "token_budget_sample": q_token_budget_sample,
        "tfidf_topk": q_tfidf_topk,
        "asof_join": q_asof_join,
        "range_join": q_range_join,
        "incremental_merge": q_incremental_merge,
        "multimodal_features": q_multimodal_features,
        "embedding_quantize": q_embedding_quantize,
        "embedding_lsh": q_embedding_lsh,
        "embedding_ivf": q_embedding_ivf,
        "fingerprint": q_fingerprint,
        "statement_variant_link": q_statement_variant_link,
        "kb_ontology_load": q_kb_ontology_load,
        "variant_load": q_variant_load,
        "hgvs_parse": q_hgvs_parse,
        "filter_dsl_neighbors": q_filter_dsl_neighbors,
        "graph_neighbors": q_graph_neighbors,
        "lang_id": q_lang_id,
        "token_count": q_token_count,
        "quality_score": q_quality_score,
        "bm25_scores": q_bm25_scores,
        "stratified_sample": q_stratified_sample,
        "merge_upsert": q_merge_upsert,
        "fallback_cascade": q_fallback_cascade,
        "top1_per_group": q_top1_per_group,
        "dnf_expansion": q_dnf_expansion,
        "entrez_gene_load": q_entrez_gene_load,
        "entrez_refseq": q_entrez_refseq,
        "dbsnp_docsum": q_dbsnp_docsum,
        "hgnc_load": q_hgnc_load,
        "refseq_ladder": q_refseq_ladder,
        "fda_srs_load": q_fda_srs_load,
        "chembl_load": q_chembl_load,
        "gsc_ontology": q_gsc_ontology,
        "asco_abstracts": q_asco_abstracts,
        "fda_approvals_year": q_fda_approvals_year,
        "cohort_retention": q_cohort_retention,
        "incremental_join_agg": q_incremental_join_agg,
        "multiple_regression": q_multiple_regression,
        "stream_dedup": q_stream_dedup,
        "oov_rate": q_oov_rate,
        "temperature_sample": q_temperature_sample,
        "merge_intervals": q_merge_intervals,
        "grouped_outliers": q_grouped_outliers,
        "transition_matrix": q_transition_matrix,
        "equidepth_histogram": q_equidepth_histogram,
        "weighted_percentiles": q_weighted_percentiles,
        "streaming_sessions_native": q_streaming_sessions_native,
        "split_assign": q_split_assign,
        "priority_sample": q_priority_sample,
        "domain_rebalance": q_domain_rebalance,
        "incremental_agg": q_incremental_agg,
        "bpe_train": q_bpe_train,
        "bpe_encode": q_bpe_encode,
        "vocab_build": q_vocab_build,
        "ngram_counts": q_ngram_counts,
        "key_skew_profile": q_key_skew_profile,
        "kmeans_assign": q_kmeans_assign,
        "embedding_quantized_topk": q_embedding_quantized_topk,
        "streaming_sessions": q_streaming_sessions,
        "pmc_fusions": q_pmc_fusions,
        "pmc_functional": q_pmc_functional,
        "docm_load": q_docm_load,
        "cgl_load": q_cgl_load,
        "approx_distinct": q_approx_distinct,
        "approx_quantiles": q_approx_quantiles,
        "source_registry": q_source_registry,
        "version_chain": q_version_chain,
        "windowed_counts": q_windowed_counts,
        "simhash": q_simhash,
        "ngram_jaccard": q_ngram_jaccard,
        "dedup_exact": q_dedup_exact,
        "dedup_components": q_dedup_components,
        "repetition_score": q_repetition_score,
        "sequence_pack": q_sequence_pack,
        "pii_redact": q_pii_redact,
        "multimodal_resize": q_multimodal_resize,
        "embedding_dups": q_embedding_dups,
        "filter_dsl_nested": q_filter_dsl_nested,
        "filter_dsl_subquery": q_filter_dsl_subquery,
        "filter_dsl_pagination": q_filter_dsl_pagination,
        "anti_join_incremental": q_anti_join_incremental,
        "semi_join_exists": q_semi_join_exists,
        "broadcast_dim_join": q_broadcast_dim_join,
        "normalized_key_join": q_normalized_key_join,
        "pricing_summary": q_pricing_summary,
        "recurrence_rollup": q_recurrence_rollup,
        "consensus_agg": q_consensus_agg,
        "latest_per_key": q_latest_per_key,
        "duplicate_names": q_duplicate_names,
        "hotspot_load": q_hotspot_load,
        "oncokb_statements": q_oncokb_statements,
        "spec_validation": q_spec_validation,
        "spec_validation_nested": q_spec_validation_nested,
        "full_reload_diff": q_full_reload_diff,
        "rollup_recurrence": q_rollup_recurrence,
        "pmi_collocations": q_pmi_collocations,
        "winsorize": q_winsorize,
        "split_leakage": q_split_leakage,
        "dedup_against": q_dedup_against,
        "triangle_count": q_triangle_count,
        "gram_matrix": q_gram_matrix,
        "mixture_interleave": q_mixture_interleave,
        "canonical_docs": q_canonical_docs,
        "linear_attribution": q_linear_attribution,
        "expectations": q_expectations,
        "quality_drift": q_quality_drift,
        "rolling_distinct": q_rolling_distinct,
        "cooccurrence": q_cooccurrence,
        "stream_enrich": q_stream_enrich,
        "kfold_assign": q_kfold_assign,
        "range_join_auto": q_range_join_auto,
        "diversity_report": q_diversity_report,
        "embedding_project": q_embedding_project,
        "hard_negatives": q_hard_negatives,
        "pcm_energy": q_pcm_energy,
        "embedding_dim_stats": q_embedding_dim_stats,
        "survivorship": q_survivorship,
        "interpolate": q_interpolate,
        "top_paths": q_top_paths,
        "priority_sample_grouped": q_priority_sample_grouped,
        "minhash_lsh": q_minhash_lsh,
        "attribution": q_attribution,
        "pagerank": q_pagerank,
        "explode_expansion": q_explode_expansion,
        "cross_expansion": q_cross_expansion,
        "embedding_topk": q_embedding_topk,
        "therapy_grouping": q_therapy_grouping,
        "stable_hash_id": q_stable_hash_id,
        "string_normalizers": q_string_normalizers,
        "set_ops": q_set_ops,
        "citation_phase_year": q_citation_phase_year,
        "relevance_translate": q_relevance_translate,
        "docm_fix": q_docm_fix,
        "oncokb_names": q_oncokb_names,
        "combo_naming": q_combo_naming,
        "lm_score": q_lm_score,
        "funnel": q_funnel,
        "time_bucket_rollup": q_time_bucket_rollup,
    }
    ordered = {k: all_q[k] for k in _R9_WINDOW}
    ordered.update((k, v) for k, v in all_q.items() if k not in ordered)
    return ordered


# The driver-gate window: first 50 registry entries, re-verified by the
# driver each round at sf0.01. See the ordering-contract note in queries().
_R9_WINDOW = [
    # new in round 9
    "stream_minhash_dedup",
    "semantic_dedup",
    "lsh_band_tuning",
    "perplexity_buckets",
    "heaps_fit",
    # code changed in round 9: edge-case fixes
    "fellegi_sunter",
    "fs_em",
    "er_entities",
    "neyman_sample",
    "benford",
    # pre-trained BPE encode split
    "bpe_encode",
    "bpe_train",
    # materialize() rewiring of every iterative operator
    "pagerank",
    "kcore",
    "graph_closure",
    "hierarchy_rollup",
    "triangle_count",
    "dedup_components",
    "minhash_lsh",
    "ngram_jaccard",
    "sorted_neighborhood",
    "mmr_rerank",
    "kmeans_train",
    "kmeans_assign",
    # merge-sink writer interface + streaming merge paths
    "incremental_merge",
    "stream_upsert",
    "merge_upsert",
    "full_reload_diff",
    # similarity-norm precompute
    "embedding_topk",
    "embedding_quantized_topk",
    "embedding_dups",
    "embedding_lsh",
    "embedding_ivf",
    "ann_recall_eval",
    "hard_negatives",
    # multimodal decoder gating
    "multimodal_features",
    "multimodal_resize",
    "pcm_energy",
    # aggregate/validate materialize touch-ups
    "zipf_fit",
    "topn_other",
    "expectations",
    # overdue r6/r7-window rotation block
    "grouped_percentiles",
    "cube_rollup",
    "pivot_events",
    "rolling_average",
    "histogram_bins",
    "grouped_regression",
    "salted_skew_join",
    "sessionize",
    "edit_distance_join",
]


def _pii_oracle_sql() -> str:
    """Compose the pii_redact oracle from PII_PATTERNS verbatim, so the
    SQL can never drift from the Spark patterns."""
    from graphkb_spark.operators.text import PII_PATTERNS

    sql = """
        WITH s0 AS (
          SELECT doc_id,
                 text || CASE WHEN doc_id % 4 = 0 THEN ' contact bob@example.com now'
                              WHEN doc_id % 4 = 1 THEN ' call +1 604-555-0199 today'
                              WHEN doc_id % 4 = 2 THEN ' from 192.168.1.77 last night'
                              ELSE '' END AS t0
          FROM documents)"""
    prev = "s0"
    tcol = "t0"
    carry: list[str] = []
    for i, (kind, pattern, token) in enumerate(PII_PATTERNS, start=1):
        carry_cols = (", " + ", ".join(carry)) if carry else ""
        sql += f""",
        s{i} AS (
          SELECT doc_id{carry_cols},
                 CAST(len(regexp_extract_all({tcol}, '{pattern}')) AS INT) AS n_{kind},
                 regexp_replace({tcol}, '{pattern}', '{token}', 'g') AS t{i}
          FROM {prev})"""
        carry.append(f"n_{kind}")
        prev, tcol = f"s{i}", f"t{i}"
    sql += f"""
        SELECT doc_id, n_email, n_ip, n_phone, {tcol} AS text_redacted
        FROM {prev}"""
    return sql


def _civic_pipeline_ctes() -> str:
    """The civic_sync oracle's shared CTE pipeline (evidence synthesis,
    publication/disease/evidence-level resolution, relevance, therapy
    and DNF expansion) up to the ``final`` CTE — consumers append
    their own closing SELECT (and optionally more CTEs)."""
    return """
        WITH rel(evidence_type, direction, significance, relevance) AS (
          VALUES """ + ", ".join(
            "(" + ", ".join(repr(v) for v in row) + ")" for row in RELEVANCE_ROWS
        ) + """),
        ab_base AS (
          SELECT CAST(i AS INT) AS abstract_id,
                 CAST(2010 + i % 10 AS INT) AS year,
                 'Abstract ' || i AS name,
                 'asco-' || i AS sourceId,
                 'ab_' || i AS rid
          FROM range(400) t(i)),
        abstracts AS (
          SELECT * FROM ab_base
          UNION ALL
          SELECT abstract_id, year, name, sourceId, 'ab2_' || abstract_id
          FROM ab_base WHERE abstract_id % 50 = 3),
        pm AS (
          SELECT c_custkey, 'pm_' || c_custkey AS rid
          FROM customer WHERE c_custkey % 10 <> 7),
        ev AS (
          SELECT o_orderkey AS k,
                 'EID' || o_orderkey AS sourceId,
                 CASE WHEN o_orderkey % 4 = 0 THEN 'PUBMED'
                      WHEN o_orderkey % 4 IN (1, 2) THEN 'ASCO'
                      ELSE 'OTHER' END AS source_type,
                 o_custkey AS citation_id,
                 CAST(o_orderkey % 400 AS INT) AS aid,
                 CAST(2010 + (o_orderkey % 400) % 10
                      + CASE WHEN o_orderkey % 13 = 0 THEN 1 ELSE 0 END AS INT)
                   AS pub_year,
                 CASE WHEN o_orderkey % 5 <> 0
                      THEN 'https://meetings.asco.org/abstracts/asco-'
                           || (o_orderkey % 400) END AS source_url,
                 ['A','B','C','D','E'][o_orderkey % 5 + 1] AS lvl_letter,
                 CASE WHEN o_orderkey % 7 <> 0 THEN o_orderkey % 5 + 1 END AS rating,
                 CASE WHEN o_orderkey % 11 = 10 THEN 'mystery-' || o_orderkey
                      ELSE n.n_name END AS disease,
                 o_orderkey % 97 AS v,
                 ['PREDICTIVE','DIAGNOSTIC','PROGNOSTIC','FUNCTIONAL'][o_orderkey % 4 + 1]
                   AS evidence_type,
                 CASE WHEN o_orderkey % 2 = 0 THEN 'SUPPORTS'
                      ELSE 'DOES_NOT_SUPPORT' END AS direction,
                 ['SENSITIVITYRESPONSE','RESISTANCE','POSITIVE','POOR_OUTCOME',
                  'GAIN_OF_FUNCTION'][o_orderkey % 5 + 1] AS significance
          FROM orders o JOIN nation n ON n.n_nationkey = o.o_orderkey % 25
          WHERE o_orderkey % 3 = 0),
        asco_match AS (
          SELECT e.k, a.rid AS ab_rid
          FROM ev e JOIN abstracts a
            ON e.source_type = 'ASCO'
           AND e.aid = a.abstract_id
           AND e.pub_year = a.year
           AND (e.source_url IS NULL OR contains(e.source_url, a.sourceId))),
        asco_agg AS (
          SELECT k, count(*) AS n_asco, min(ab_rid) AS ab_rid
          FROM asco_match GROUP BY k),
        staged AS (
          SELECT e.*,
                 CASE WHEN e.source_type = 'PUBMED' THEN p.rid END AS pm_rid,
                 coalesce(a.n_asco, 0) AS n_asco, a.ab_rid,
                 lower(e.lvl_letter || coalesce(CAST(e.rating AS VARCHAR), ''))
                   AS lvl
          FROM ev e
          LEFT JOIN pm p ON e.source_type = 'PUBMED' AND e.citation_id = p.c_custkey
          LEFT JOIN asco_agg a ON e.k = a.k),
        resolved AS (
          SELECT s.*,
                 CASE WHEN source_type = 'PUBMED' AND pm_rid IS NULL
                        THEN 'PMID ' || citation_id || ' is not available'
                      WHEN source_type = 'ASCO' AND n_asco = 0
                        THEN 'failed to select the relevant abstract (' || aid || ')'
                      WHEN source_type = 'ASCO' AND n_asco > 1
                        THEN 'too many choices for abstract (' || aid || ')'
                      WHEN source_type NOT IN ('PUBMED', 'ASCO')
                        THEN 'unable to process non-pubmed/non-asco evidence type ('
                             || source_type || ')'
                 END AS pub_error,
                 coalesce(pm_rid, ab_rid) AS publication_rid,
                 CASE WHEN k % 11 <> 10 THEN 'dis_' || (k % 25) END AS disease_rid,
                 CASE WHEN k % 11 = 10 THEN 'disease not found: mystery-' || k
                 END AS disease_error,
                 md5('{"cls":"EvidenceLevel","name":"' || lvl
                     || '","source":"civic"}') AS evidence_level_rid
          FROM staged s),
        expanded AS (
          SELECT s.*, r.relevance, t.therapy, c.condition_set
          FROM resolved s
          LEFT JOIN rel r ON r.evidence_type = s.evidence_type
                         AND r.direction = s.direction
                         AND r.significance = s.significance,
               unnest(CASE WHEN s.k % 4 = 0 THEN ['tA', 'tB']
                           WHEN s.k % 4 = 1 THEN ['tC']
                           WHEN s.k % 4 = 2 THEN ['tA + tB']
                           ELSE [CAST(NULL AS VARCHAR)] END) AS t(therapy),
               unnest(CASE WHEN s.k % 9 = 0 THEN [['V' || s.v, 'V' || (s.v + 1)]]
                           WHEN s.k % 9 = 3 THEN [['V' || s.v], ['V' || (s.v + 1)]]
                           ELSE [['V' || s.v]] END) AS c(condition_set)),
        final AS (
          SELECT *,
                 list_sort(list_concat(condition_set,
                   list_filter([therapy, disease_rid], x -> x IS NOT NULL)))
                   AS conditions
          FROM expanded)
    """


def _bpe_oracle_sql(n_merges: int = 8) -> str:
    """DuckDB oracle for BPE training: the ``n_merges`` data-dependent
    rounds unrolled as chained MATERIALIZED CTEs. Each round recomputes
    weighted adjacent-pair counts over the current segmentation, takes
    the (count desc, left, right) argmax via scalar subqueries, and
    re-segments with a plain string ``replace`` — left-to-right
    non-overlapping, exactly BPE's merge semantics — over a
    sentinel-delimited encoding (each symbol wrapped chr(31)..chr(30),
    so matches can never straddle or prefix a symbol boundary).
    MATERIALIZED is load-bearing: inlining would expand the round chain
    exponentially (~5^rounds scans of ``documents``)."""
    sql = r"""
        WITH words AS MATERIALIZED (
          SELECT w, count(*) AS freq FROM (
            SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w
            FROM documents)
          WHERE w <> '' GROUP BY w),
        r0 AS MATERIALIZED (
          SELECT freq,
                 regexp_replace(w, '(.)', chr(31) || '\1' || chr(30), 'g') AS s
          FROM words)"""
    for k in range(n_merges):
        sql += f""",
        p{k} AS (
          SELECT l, r, CAST(sum(freq) AS BIGINT) AS c FROM (
            SELECT freq, lst[i] AS l, lst[i + 1] AS r FROM (
              SELECT freq,
                     list_transform(string_split(s, chr(31))[2:],
                                    x -> rtrim(x, chr(30))) AS lst
              FROM r{k}),
            unnest(generate_series(1, len(lst) - 1)) AS u(i))
          GROUP BY l, r),
        b{k} AS MATERIALIZED (
          SELECT l, r, c FROM p{k} ORDER BY c DESC, l, r LIMIT 1),
        r{k + 1} AS MATERIALIZED (
          SELECT freq, replace(s,
              chr(31) || (SELECT l FROM b{k}) || chr(30)
                || chr(31) || (SELECT r FROM b{k}) || chr(30),
              chr(31) || (SELECT l FROM b{k}) || (SELECT r FROM b{k})
                || chr(30)) AS s
          FROM r{k})"""
    sql += "\n" + "\n UNION ALL ".join(
        f'SELECT {k} AS step, l AS "left", r AS "right",'
        f" l || r AS merged, c AS pair_count FROM b{k}"
        for k in range(n_merges)
    )
    return sql


def _bpe_encode_oracle_sql() -> str:
    """DuckDB oracle for BPE encoding with the frozen
    ``PRETRAINED_BPE_MERGES`` artifact: apply each rule to every
    document as the same sentinel-delimited string replace the Spark
    operator uses (words separated by chr(29) so merges cannot cross a
    word boundary), and count surviving chr(31) symbol markers. No
    training CTEs — the artifact is a constant in both engines."""
    sql = """
        WITH doc0 AS (
          SELECT doc_id,
                 regexp_replace(
                   regexp_replace(lower(text), '\\s+', chr(29), 'g'),
                   '([^' || chr(29) || '])',
                   chr(31) || '\\1' || chr(30), 'g') AS s
          FROM documents)"""
    k = 0
    for left, right in PRETRAINED_BPE_MERGES:
        sql += f""",
        doc{k + 1} AS (
          SELECT doc_id, replace(s,
              chr(31) || '{left}' || chr(30)
                || chr(31) || '{right}' || chr(30),
              chr(31) || '{left}{right}' || chr(30)) AS s
          FROM doc{k})"""
        k += 1
    sql += f"""
        SELECT doc_id,
               CAST(len(s) - len(replace(s, chr(31), '')) AS BIGINT)
                 AS n_tokens
        FROM doc{k}"""
    return sql


def _pagerank_oracle_sql(n_iter: int = 3, damping_pct: int = 85, scale: int = 10**12) -> str:
    """DuckDB oracle for fixed-point PageRank: the power-iteration
    rounds unrolled as chained CTEs. Pure integer arithmetic end to
    end (bigint micro-units, floor division — all inputs non-negative,
    so DuckDB ``//`` == Spark ``div``), so every round's ranks are
    bit-identical to the Spark trajectory with no FP caveats."""
    base = (100 - damping_pct) * scale // 100
    sql = f"""
        WITH e AS (
          SELECT p_partkey AS s, p_partkey // 10 AS d
          FROM part WHERE p_partkey >= 1),
        nodes AS (
          SELECT DISTINCT n AS node FROM (
            SELECT s AS n FROM e UNION ALL SELECT d FROM e)),
        deg AS (SELECT s, count(*) AS deg FROM e GROUP BY s),
        r0 AS (SELECT node, CAST({scale} AS BIGINT) AS rank_fx FROM nodes)"""
    for k in range(n_iter):
        sql += f""",
        c{k + 1} AS (
          SELECT e.d AS node, CAST(sum(r.rank_fx // dg.deg) AS BIGINT) AS sm
          FROM e JOIN r{k} r ON r.node = e.s JOIN deg dg ON dg.s = e.s
          GROUP BY e.d),
        r{k + 1} AS (
          SELECT n.node,
                 CAST({base} + ({damping_pct} * coalesce(c.sm, 0)) // 100
                      AS BIGINT) AS rank_fx
          FROM r{k} n LEFT JOIN c{k + 1} c USING (node))"""
    sql += f"""
        SELECT node, round(rank_fx / {float(scale)}, 6) AS rank FROM r{n_iter}"""
    return sql


def _mh_side_ctes(prefix: str, where_sql: str, num_hashes: int = 32) -> str:
    """Signature/band/hashed-set CTEs for one corpus side of a MinHash
    oracle (digest-then-distinct hashed shingle sets, affine family
    minima, 16 bands of 2) — shared by the cross-corpus entries so the
    SQL can never drift from the single-corpus minhash_lsh oracle."""
    P = ", ".join(
        f"({i}, {a}, {b})" for i, (a, b) in enumerate(_mh_params(num_hashes))
    )
    return f"""
            {prefix}words AS (
              SELECT doc_id,
                     list_filter(string_split(
                       regexp_replace(lower(trim(text)), '[^a-z0-9 ]', ' ', 'g'),
                       ' '), w -> w <> '') AS w
              FROM documents {where_sql}),
            {prefix}sh AS (
              SELECT doc_id,
                     CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                          ELSE list_distinct([array_to_string(w[i:i+2], ' ')
                                              for i in generate_series(1, len(w) - 2)])
                     END AS s
              FROM {prefix}words),
            {prefix}ex AS (SELECT doc_id, unnest(s) AS shingle FROM {prefix}sh),
            {prefix}hx AS (
              SELECT doc_id,
                     ('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647 AS h
              FROM {prefix}ex),
            {prefix}params(i, a, b) AS (VALUES {P}),
            {prefix}mh AS (
              SELECT doc_id, i, min((a * h + b) % 2147483647) AS m
              FROM {prefix}hx, {prefix}params
              GROUP BY doc_id, i),
            {prefix}sig AS (SELECT doc_id, list(m ORDER BY i) AS sig
                            FROM {prefix}mh GROUP BY doc_id),
            {prefix}bands AS (
              SELECT doc_id, b,
                     md5(array_to_string(list_slice(sig, b*2 + 1, b*2 + 2), ',')) AS bhash
              FROM {prefix}sig, generate_series(0, 15) g(b)),
            {prefix}hset AS (
              SELECT doc_id, list_distinct(list(h)) AS hs
              FROM {prefix}hx GROUP BY doc_id)"""


def oracle_sql() -> dict[str, str]:
    en = ", ".join(f"'{w}'" for w in text_ops.LANG_MARKERS["en"])
    lang_hits = {
        lang: (
            "len(list_filter(list_filter(string_split(lower(text), ' '), x -> x <> ''), "
            f"x -> list_contains([{', '.join(repr(w) for w in ws)}], x)))"
        )
        for lang, ws in text_ops.LANG_MARKERS.items()
    }
    # Morton interleave as arithmetic (x bits at even positions, y at
    # odd) — mirrors operators/layout.py:morton_interleave bit-for-bit.
    morton = " + ".join(
        f"((zx // {1 << i}) % 2) * {1 << (2 * i)}"
        f" + ((zy // {1 << i}) % 2) * {1 << (2 * i + 1)}"
        for i in range(16)
    )
    # one k-core peel round over edge CTE e{r}: degrees -> survivors ->
    # restricted edges (mirrors operators/graph.py:kcore, k=7)
    kcore_round = (
        "d{n} AS (SELECT node, count(*) AS c FROM "
        "(SELECT u AS node FROM e{p} UNION ALL SELECT v FROM e{p}) "
        "GROUP BY node), "
        "s{n} AS (SELECT node FROM d{n} WHERE c >= 7), "
        "e{n} AS (SELECT e.u, e.v FROM e{p} e "
        "JOIN s{n} a ON e.u = a.node JOIN s{n} b ON e.v = b.node)"
    )
    kcore_rounds = ", ".join(kcore_round.format(n=r + 1, p=r) for r in range(3))
    # one Lloyd round: assign (argmin distance, cluster tie-break) +
    # integer-scaled exact centroid means (mirrors
    # operators/clustering.py:kmeans_train bit-for-bit)
    kmeans_round = (
        "a{n} AS (SELECT p.id, c.cl, list_distance(p.v, c.v) AS d "
        "FROM pts p CROSS JOIN c{p} c), "
        "m{n} AS (SELECT id, min(d) AS md FROM a{n} GROUP BY id), "
        "s{n} AS (SELECT a.id, min(a.cl) AS cl FROM a{n} a "
        "JOIN m{n} m ON a.id = m.id AND a.d = m.md GROUP BY a.id), "
        "e{n} AS (SELECT s.cl, generate_subscripts(p.v, 1) AS pos, "
        "CAST(round(unnest(p.v) * 1000000000.0) AS BIGINT) AS vi "
        "FROM s{n} s JOIN pts p ON s.id = p.id), "
        "c{n} AS (SELECT cl, list(m ORDER BY pos) AS v FROM "
        "(SELECT cl, pos, round(CAST(sum(vi) AS DOUBLE) / count(*) "
        "/ 1000000000.0, 8) AS m FROM e{n} GROUP BY cl, pos) GROUP BY cl)"
    )
    kmeans_rounds = ", ".join(kmeans_round.format(n=r + 1, p=r) for r in range(2))
    # Fellegi-Sunter EM unroll (mirrors operators/linkage.py:
    # fellegi_sunter_em): round 1 uses the literal init params as the
    # SAME IEEE expressions Spark evaluates (1.0 - 0.9, not 0.1);
    # round 2 pulls params from round 1's aggregate CTE.
    _fs_fields = ["nation", "segment", "balband"]

    def _fs_w_cte(n: int, m_of, u_of, p_of) -> str:
        pm = p_of
        pu = f"(1.0 - {p_of})"
        for f in _fs_fields:
            pm += (
                f" * (CASE WHEN agree_{f} THEN {m_of(f)}"
                f" ELSE (1.0 - {m_of(f)}) END)"
            )
            pu += (
                f" * (CASE WHEN agree_{f} THEN {u_of(f)}"
                f" ELSE (1.0 - {u_of(f)}) END)"
            )
        src = "fspairs" if n == 1 else f"fspairs, fsp{n - 1}"
        return (
            f"fsw{n} AS (SELECT "
            + ", ".join(f"agree_{f}" for f in _fs_fields)
            + f", CAST(round(({pm}) / (({pm}) + ({pu})), 9)"
            f" AS DECIMAL(38,12)) AS w FROM {src})"
        )

    def _fs_agg_ctes(n: int) -> str:
        swas = ", ".join(
            f"CAST(sum(CASE WHEN agree_{f} THEN w"
            f" ELSE CAST(0 AS DECIMAL(38,12)) END) AS DOUBLE) AS swa_{f}"
            for f in _fs_fields
        )
        params = ", ".join(
            f"round(swa_{f} / sw, 9) AS m_{f},"
            f" round((ta_{f} - swa_{f}) / (n - sw), 9) AS u_{f}"
            for f in _fs_fields
        )
        return (
            f"fss{n} AS (SELECT CAST(sum(w) AS DOUBLE) AS sw,"
            f" CAST(count(*) AS DOUBLE) AS n, {swas} FROM fsw{n}), "
            f"fsp{n} AS (SELECT {params}, round(sw / n, 9) AS p"
            f" FROM fss{n}, fst0)"
        )

    fs_em_rounds = ", ".join(
        _fs_w_cte(
            r,
            (lambda f: "0.9") if r == 1 else (lambda f, rr=r: f"m_{f}"),
            (lambda f: "0.1") if r == 1 else (lambda f, rr=r: f"u_{f}"),
            "0.5" if r == 1 else "p",
        )
        + ", "
        + _fs_agg_ctes(r)
        for r in (1, 2)
    )
    fs_em_final = " UNION ALL ".join(
        f"SELECT 'agree_{f}' AS field, m_{f} AS m_est, u_{f} AS u_est,"
        f" p AS p_est FROM fsp2"
        for f in _fs_fields
    )
    fs_em_totals = ", ".join(
        f"CAST(sum(CASE WHEN agree_{f} THEN 1 ELSE 0 END) AS DOUBLE) AS ta_{f}"
        for f in _fs_fields
    )
    # per-column profile row (mirrors operators/profile.py)
    prof_num = (
        "SELECT '{c}' AS \"column\", CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, "
        "CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct, "
        "round(CAST(min({c}) AS DOUBLE), 6) AS min_num, "
        "round(CAST(max({c}) AS DOUBLE), 6) AS max_num FROM orders"
    )
    prof_str = (
        "SELECT '{c}' AS \"column\", CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, "
        "CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct, "
        "CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num "
        "FROM orders"
    )
    profile_union = " UNION ALL ".join(
        (prof_num if num else prof_str).format(c=c)
        for c, num in [
            ("o_orderkey", True), ("o_custkey", True), ("o_orderstatus", False),
            ("o_totalprice", True), ("o_orderdate", False),
            ("o_orderpriority", False),
        ]
    )
    oracles = {
        # SemDeDup: the kmeans_train CTE chain (k=8, 2 Lloyd rounds)
        # + within-cluster cosine pairs, keep-lowest-id policy.
        "semantic_dedup": f"""
            WITH pts AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
                         FROM embeddings),
            h AS (SELECT id, v,
                         ('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8))::BIGINT
                           AS hh
                  FROM pts),
            i0 AS (SELECT id, v, hh FROM h ORDER BY hh ASC, id ASC LIMIT 8),
            c0 AS (SELECT CAST((SELECT count(*) FROM i0 j
                                WHERE j.hh < i.hh
                                   OR (j.hh = i.hh AND j.id < i.id)) AS INT) AS cl,
                          i.v AS v
                   FROM i0 i),
            {kmeans_rounds},
            af AS (SELECT p.id, c.cl, list_distance(p.v, c.v) AS d
                   FROM pts p CROSS JOIN c2 c),
            mf AS (SELECT id, min(d) AS md FROM af GROUP BY id),
            sfin AS (SELECT a.id, CAST(min(a.cl) AS INT) AS cl
                     FROM af a JOIN mf m ON a.id = m.id AND a.d = m.md
                     GROUP BY a.id),
            memb AS (SELECT sfin.id, sfin.cl, p.v
                     FROM sfin JOIN pts p USING (id)),
            prs AS (SELECT a.cl, a.id AS ia, b.id AS ib,
                           round(list_cosine_similarity(a.v, b.v), 4) AS sim
                    FROM memb a JOIN memb b
                      ON a.cl = b.cl AND a.id < b.id),
            kept AS (SELECT ib, min(ia) AS dup_of FROM prs
                     WHERE sim >= 0.35 GROUP BY ib),
            d2 AS (SELECT k.ib, k.dup_of, p.sim
                   FROM kept k JOIN prs p
                     ON p.ib = k.ib AND p.ia = k.dup_of)
            SELECT m.id AS vec_id, m.cl AS cluster,
                   d2.ib IS NULL AS keep, d2.dup_of, d2.sim AS dup_sim
            FROM memb m LEFT JOIN d2 ON m.id = d2.ib
        """,
        # band planner over PPJoin exact-Jaccard pairs (>= 0.5):
        # decimal-summed S-curve mean per (b, r) factorization of 64.
        "lsh_band_tuning": """
            WITH words AS (
              SELECT doc_id,
                     list_filter(string_split(
                       regexp_replace(lower(trim(text)), '[^a-z0-9 ]', ' ', 'g'),
                       ' '), w -> w <> '') AS w
              FROM documents),
            sh AS (
              SELECT doc_id,
                     CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                          ELSE list_distinct([array_to_string(w[i:i+2], ' ')
                                              for i in generate_series(1, len(w) - 2)])
                     END AS s
              FROM words),
            pr AS (
              SELECT round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                           / len(list_distinct(list_concat(a.s, b.s))), 4) AS s
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                    / len(list_distinct(list_concat(a.s, b.s))) >= 0.5),
            cfg AS (SELECT CAST(b AS BIGINT) AS bands,
                           CAST(64 // b AS BIGINT) AS rows_per_band
                    FROM unnest([1, 2, 4, 8, 16, 32, 64]) AS t(b)),
            sc AS (SELECT bands, rows_per_band, s,
                          1.0 - power(1.0 - power(s, rows_per_band), bands)
                            AS p,
                          power(1.0 - power(0.5, 1.0 / bands),
                                1.0 / rows_per_band) AS s50
                   FROM pr, cfg)
            SELECT bands, rows_per_band,
                   round(max(s50), 4) AS s50,
                   CAST(count(*) AS BIGINT) AS n_pairs,
                   round(CAST(sum(CAST(round(p, 9) AS DECIMAL(38,12)))
                              AS DOUBLE) / count(*), 6) AS exp_recall,
                   CAST(sum(CASE WHEN p >= 0.9 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_likely
            FROM sc GROUP BY bands, rows_per_band
        """,
        # CCNet tertile bucketing over the bigram-LM scores; cutoffs
        # are exact linear-interpolation percentiles rounded to 6.
        "perplexity_buckets": """
            WITH tok AS (
              SELECT doc_id, regexp_extract_all(lower(text),
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]') AS t
              FROM documents),
            bg AS (
              SELECT doc_id, t[i] AS w1,
                     array_to_string(t[i:i+1], ' ') AS bigram
              FROM tok, unnest(generate_series(1, greatest(len(t) - 1, 0)))
                          AS u(i)),
            c2 AS (SELECT bigram, count(*) AS c FROM bg GROUP BY bigram),
            c1 AS (SELECT w1, count(*) AS c FROM bg GROUP BY w1),
            scored AS (
              SELECT bg.doc_id,
                     log2(CAST(c2.c AS DOUBLE) / c1.c) AS lp
              FROM bg JOIN c2 USING (bigram) JOIN c1 USING (w1)),
            sc AS (SELECT doc_id, round(avg(lp), 6) AS avg_log2_prob,
                          count(*) AS n_bigrams
                   FROM scored GROUP BY doc_id),
            cuts AS (SELECT round(quantile_cont(avg_log2_prob, 1.0/3), 6)
                              AS p33,
                            round(quantile_cont(avg_log2_prob, 2.0/3), 6)
                              AS p67
                     FROM sc)
            SELECT doc_id, avg_log2_prob, n_bigrams,
                   CASE WHEN avg_log2_prob >= p67 THEN 'head'
                        WHEN avg_log2_prob >= p33 THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM sc, cuts
        """,
        # Heaps fit over 3-gram shingles: the oracle may use a plain
        # window cumsum for doc offsets (Spark side uses the two-phase
        # range-bucket prefix sum); decimal-summed OLS moments.
        "heaps_fit": """
            WITH tok AS (
              SELECT doc_id, regexp_extract_all(lower(text),
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]') AS w
              FROM documents),
            tw AS (
              SELECT doc_id,
                     CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                          ELSE [array_to_string(w[i:i+2], ' ')
                                for i in generate_series(1, len(w) - 2)]
                     END AS t
              FROM tok WHERE len(w) > 0),
            docs AS (SELECT doc_id, len(t) AS n FROM tw WHERE len(t) > 0),
            o AS (SELECT doc_id,
                         sum(n) OVER (ORDER BY doc_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) - n AS doff
                  FROM docs),
            pos AS (SELECT t[i] AS token, o.doff + i AS gp
                    FROM tw JOIN o USING (doc_id),
                         unnest(generate_series(1, len(t))) AS u(i)),
            fp AS (SELECT token, min(gp) AS fpos FROM pos GROUP BY token),
            tot AS (SELECT CAST(sum(n) AS BIGINT) AS N FROM docs),
            bks AS (SELECT ((fpos - 1) * 16) // N + 1 AS j,
                           count(*) AS bc
                    FROM fp, tot GROUP BY 1),
            cps AS (SELECT N, j, (N * j + 15) // 16 AS cp
                    FROM tot, unnest(generate_series(1, 16)) AS s(j)),
            curve AS (SELECT c.j, c.cp, c.N,
                             CAST(sum(coalesce(b.bc, 0)) OVER (
                               ORDER BY c.j ROWS BETWEEN UNBOUNDED
                               PRECEDING AND CURRENT ROW) AS DOUBLE) AS v
                      FROM cps c LEFT JOIN bks b ON b.j = c.j),
            g AS (SELECT CAST(count(*) AS DOUBLE) AS c,
                         CAST(max(v) AS BIGINT) AS vocab,
                         max(N) AS N,
                         CAST(sum(CAST(round(ln(CAST(cp AS DOUBLE)), 9)
                              AS DECIMAL(38,12))) AS DOUBLE) AS sx,
                         CAST(sum(CAST(round(ln(v), 9)
                              AS DECIMAL(38,12))) AS DOUBLE) AS sy,
                         CAST(sum(CAST(round(ln(CAST(cp AS DOUBLE))
                              * ln(CAST(cp AS DOUBLE)), 9)
                              AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
                         CAST(sum(CAST(round(ln(CAST(cp AS DOUBLE)) * ln(v), 9)
                              AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
                         CAST(sum(CAST(round(ln(v) * ln(v), 9)
                              AS DECIMAL(38,12))) AS DOUBLE) AS syy
                  FROM curve)
            , g2 AS (SELECT N, vocab, c, sx, sy,
                          c * sxy - sx * sy AS num,
                          c * sxx - sx * sx AS den,
                          c * syy - sy * sy AS deny
                   FROM g),
            g3 AS (SELECT N, vocab, c, sx, sy, num, den, deny,
                          CASE WHEN deny = 0 THEN 0.0
                               WHEN den <> 0 THEN num / den END AS beta
                   FROM g2)
            SELECT N AS n_tokens, vocab,
                   round(beta, 6) AS beta,
                   round((sy - beta * sx) / c, 6) AS ln_k,
                   CASE WHEN den <> 0 AND deny <> 0
                        THEN round(num * num / (den * deny), 6) END AS r2
            FROM g3
        """,
        # trailing-window z, point excluded from its own frame.
        "rolling_zscore": """
            WITH o AS (
              SELECT user_id, event_id, CAST(value AS DOUBLE) AS v,
                     count(*) OVER w AS n,
                     CAST(sum(CAST(CAST(value AS DOUBLE) AS DECIMAL(38,10)))
                          OVER w AS DOUBLE) AS s,
                     CAST(sum(CAST(CAST(value AS DOUBLE) * CAST(value AS DOUBLE)
                          AS DECIMAL(38,10))) OVER w AS DOUBLE) AS ss
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
            z AS (SELECT user_id, event_id,
                         CASE WHEN n >= 1 THEN round(s / n, 6) END AS roll_mean,
                         CASE WHEN n >= 2 THEN round(sqrt(greatest(
                           (ss - s * s / n) / (n - 1), 0.0)), 6) END AS roll_std,
                         CASE WHEN n >= 2 AND sqrt(greatest(
                                (ss - s * s / n) / (n - 1), 0.0)) > 0
                              THEN round((v - s / n) / sqrt(greatest(
                                (ss - s * s / n) / (n - 1), 0.0)), 6)
                         END AS zscore
                  FROM o)
            SELECT user_id, event_id, roll_mean, roll_std, zscore,
                   coalesce(abs(zscore) > 3.0, FALSE) AS is_anomaly
            FROM z
        """,
        # per-key lag/delta/pct-change features.
        "lag_features": """
            WITH o AS (
              SELECT user_id, event_id, CAST(value AS DOUBLE) AS v,
                     lag(CAST(value AS DOUBLE), 1) OVER w AS l1,
                     lag(CAST(value AS DOUBLE), 7) OVER w AS l7
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
            SELECT user_id, event_id,
                   l1 AS lag_1, round(v - l1, 6) AS delta_1,
                   CASE WHEN l1 IS NOT NULL AND l1 <> 0
                        THEN round((v - l1) / l1, 6) END AS pct_change_1,
                   l7 AS lag_7, round(v - l7, 6) AS delta_7,
                   CASE WHEN l7 IS NOT NULL AND l7 <> 0
                        THEN round((v - l7) / l7, 6) END AS pct_change_7
            FROM o
        """,
        # top-N + OTHER rollup from decimal-exact per-key totals.
        "topn_other": """
            WITH agg AS (
              SELECT CAST(l_partkey AS VARCHAR) AS k, count(*) AS n,
                     sum(CAST(l_extendedprice AS DECIMAL(38,10))) AS td
              FROM lineitem GROUP BY 1),
            top AS (SELECT k, n, td, CAST(td AS DOUBLE) AS t FROM agg
                    ORDER BY CAST(td AS DOUBLE) DESC, k ASC LIMIT 10),
            tr AS (SELECT k AS l_partkey, CAST(n AS BIGINT) AS n_rows,
                          round(t, 4) AS total,
                          CAST(row_number() OVER (
                            ORDER BY t DESC, k ASC) AS INT) AS rank
                   FROM top),
            oth AS (SELECT 'OTHER' AS l_partkey,
                           CAST(coalesce(sum(n), 0) AS BIGINT) AS n_rows,
                           round(coalesce(CAST(sum(td) AS DOUBLE), 0.0), 4)
                             AS total,
                           CAST(11 AS INT) AS rank
                    FROM agg WHERE k NOT IN (SELECT k FROM top))
            SELECT * FROM tr
            UNION ALL SELECT * FROM oth WHERE n_rows > 0
        """,
        # Neyman allocation: decimal moments -> floored shares -> md5
        # rank cut, replayed exactly.
        "neyman_sample": """
            WITH st AS (
              SELECT event_type, count(*) AS N,
                     CAST(sum(CAST(CAST(value AS DOUBLE) AS DECIMAL(38,10)))
                          AS DOUBLE) AS s,
                     CAST(sum(CAST(CAST(value AS DOUBLE) * CAST(value AS DOUBLE)
                          AS DECIMAL(38,10))) AS DOUBLE) AS ss
              FROM events GROUP BY 1),
            wts AS (SELECT event_type, N,
                           N * sqrt(greatest(ss / N - (s / N) * (s / N), 0.0))
                             AS w
                    FROM st),
            tot AS (SELECT sum(w) AS tw, sum(N) AS tN FROM wts),
            alloc AS (SELECT event_type,
                             CAST(least(floor(CASE WHEN tw > 0
                                              THEN 2000 * w / tw
                                              ELSE 2000.0 * N / tN END), N)
                                  AS INT) AS alloc_n
                      FROM wts, tot),
            rk AS (SELECT e.event_type, e.event_id, e.value, a.alloc_n,
                          row_number() OVER (
                            PARTITION BY e.event_type
                            ORDER BY md5(e.event_type || ':'
                                         || CAST(e.event_id AS VARCHAR)) ASC,
                                     e.event_id ASC) AS r
                   FROM events e JOIN alloc a ON e.event_type = a.event_type)
            SELECT event_type, event_id, value, alloc_n
            FROM rk WHERE r <= alloc_n
        """,
        # rank-wise cross-group means (quantile normalization).
        "quantile_normalize": """
            WITH rk AS (
              SELECT source, doc_id, n_chars,
                     CAST(row_number() OVER (
                       PARTITION BY source
                       ORDER BY n_chars ASC, doc_id ASC) AS INT) AS rank
              FROM documents),
            m AS (SELECT rank,
                         round(CAST(sum(CAST(n_chars AS DECIMAL(38,10)))
                               AS DOUBLE) / count(*), 6) AS normalized
                  FROM rk GROUP BY rank)
            SELECT r.source, r.doc_id, r.n_chars, r.rank, m.normalized
            FROM rk r JOIN m ON r.rank = m.rank
        """,
        # mean-shift changepoint from the same exact prefix sums.
        "changepoint": """
            WITH o AS (
              SELECT event_type AS k, value,
                     row_number() OVER w AS i,
                     count(*) OVER (PARTITION BY event_type) AS n,
                     CAST(sum(CAST(value AS DECIMAL(38,10)))
                          OVER (w ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS s,
                     CAST(sum(CAST(value AS DECIMAL(38,10)))
                          OVER (PARTITION BY event_type) AS DOUBLE) AS st
              FROM events
              WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
            f AS (SELECT k, n, i, s, st,
                         s * s / i + (st - s) * (st - s) / (n - i) AS f
                  FROM o WHERE i < n),
            r AS (SELECT *, row_number() OVER (
                    PARTITION BY k ORDER BY f DESC, i ASC) AS rn FROM f)
            SELECT k AS event_type, CAST(n AS BIGINT) AS n,
                   CAST(i AS BIGINT) AS split_i,
                   round(s / i, 6) AS left_mean,
                   round((st - s) / (n - i), 6) AS right_mean,
                   round((st - s) / (n - i) - s / i, 6) AS delta
            FROM r WHERE rn = 1
        """,
        # greedy MMR unrolled: each round's pick joins the selected set.
        "mmr_rerank": """
            WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS xs
                       FROM embeddings),
            q AS (SELECT vec_id AS query_id, xs AS qv FROM v
                  WHERE vec_id < 5),
            sc AS (SELECT query_id, v.vec_id AS id,
                          list_cosine_similarity(qv, v.xs) AS rel, v.xs AS cv
                   FROM v, q WHERE v.vec_id <> query_id),
            cand AS (SELECT query_id, id, rel, cv FROM (
                       SELECT *, row_number() OVER (
                         PARTITION BY query_id
                         ORDER BY rel DESC, id ASC) AS rk
                       FROM sc) WHERE rk <= 15),
            s1 AS (SELECT query_id, id, rel, cv, mmr FROM (
                     SELECT query_id, id, rel, cv, 0.7 * rel AS mmr,
                            row_number() OVER (PARTITION BY query_id
                              ORDER BY (0.7 * rel) DESC, id ASC) AS rn
                     FROM cand) WHERE rn = 1),
            sel2 AS (SELECT query_id, id, cv FROM s1),
            rem2 AS (SELECT c.* FROM cand c WHERE NOT EXISTS (
                         SELECT 1 FROM sel2 s
                         WHERE s.query_id = c.query_id AND s.id = c.id)),
            ms2 AS (SELECT r.query_id, r.id,
                             max(list_cosine_similarity(r.cv, s.cv)) AS ms
                      FROM rem2 r JOIN sel2 s ON s.query_id = r.query_id
                      GROUP BY 1, 2),
            s2 AS (SELECT query_id, id, rel, cv, mmr FROM (
                       SELECT r.query_id, r.id, r.rel, r.cv,
                              0.7 * r.rel - (1.0 - 0.7) * m.ms AS mmr,
                              row_number() OVER (
                                PARTITION BY r.query_id
                                ORDER BY (0.7 * r.rel - (1.0 - 0.7) * m.ms)
                                         DESC, r.id ASC) AS rn
                       FROM rem2 r JOIN ms2 m
                         ON m.query_id = r.query_id AND m.id = r.id)
                     WHERE rn = 1),
            sel3 AS (SELECT query_id, id, cv FROM s1 UNION ALL SELECT query_id, id, cv FROM s2),
            rem3 AS (SELECT c.* FROM cand c WHERE NOT EXISTS (
                         SELECT 1 FROM sel3 s
                         WHERE s.query_id = c.query_id AND s.id = c.id)),
            ms3 AS (SELECT r.query_id, r.id,
                             max(list_cosine_similarity(r.cv, s.cv)) AS ms
                      FROM rem3 r JOIN sel3 s ON s.query_id = r.query_id
                      GROUP BY 1, 2),
            s3 AS (SELECT query_id, id, rel, cv, mmr FROM (
                       SELECT r.query_id, r.id, r.rel, r.cv,
                              0.7 * r.rel - (1.0 - 0.7) * m.ms AS mmr,
                              row_number() OVER (
                                PARTITION BY r.query_id
                                ORDER BY (0.7 * r.rel - (1.0 - 0.7) * m.ms)
                                         DESC, r.id ASC) AS rn
                       FROM rem3 r JOIN ms3 m
                         ON m.query_id = r.query_id AND m.id = r.id)
                     WHERE rn = 1),
            sel4 AS (SELECT query_id, id, cv FROM s1 UNION ALL SELECT query_id, id, cv FROM s2 UNION ALL SELECT query_id, id, cv FROM s3),
            rem4 AS (SELECT c.* FROM cand c WHERE NOT EXISTS (
                         SELECT 1 FROM sel4 s
                         WHERE s.query_id = c.query_id AND s.id = c.id)),
            ms4 AS (SELECT r.query_id, r.id,
                             max(list_cosine_similarity(r.cv, s.cv)) AS ms
                      FROM rem4 r JOIN sel4 s ON s.query_id = r.query_id
                      GROUP BY 1, 2),
            s4 AS (SELECT query_id, id, rel, cv, mmr FROM (
                       SELECT r.query_id, r.id, r.rel, r.cv,
                              0.7 * r.rel - (1.0 - 0.7) * m.ms AS mmr,
                              row_number() OVER (
                                PARTITION BY r.query_id
                                ORDER BY (0.7 * r.rel - (1.0 - 0.7) * m.ms)
                                         DESC, r.id ASC) AS rn
                       FROM rem4 r JOIN ms4 m
                         ON m.query_id = r.query_id AND m.id = r.id)
                     WHERE rn = 1),
            sel5 AS (SELECT query_id, id, cv FROM s1 UNION ALL SELECT query_id, id, cv FROM s2 UNION ALL SELECT query_id, id, cv FROM s3 UNION ALL SELECT query_id, id, cv FROM s4),
            rem5 AS (SELECT c.* FROM cand c WHERE NOT EXISTS (
                         SELECT 1 FROM sel5 s
                         WHERE s.query_id = c.query_id AND s.id = c.id)),
            ms5 AS (SELECT r.query_id, r.id,
                             max(list_cosine_similarity(r.cv, s.cv)) AS ms
                      FROM rem5 r JOIN sel5 s ON s.query_id = r.query_id
                      GROUP BY 1, 2),
            s5 AS (SELECT query_id, id, rel, cv, mmr FROM (
                       SELECT r.query_id, r.id, r.rel, r.cv,
                              0.7 * r.rel - (1.0 - 0.7) * m.ms AS mmr,
                              row_number() OVER (
                                PARTITION BY r.query_id
                                ORDER BY (0.7 * r.rel - (1.0 - 0.7) * m.ms)
                                         DESC, r.id ASC) AS rn
                       FROM rem5 r JOIN ms5 m
                         ON m.query_id = r.query_id AND m.id = r.id)
                     WHERE rn = 1)
            SELECT query_id, id AS neighbor_id, CAST(rank AS INT) AS rank,
                   round(mmr, 6) AS mmr_score
            FROM (SELECT query_id, id, 1 AS rank, mmr FROM s1 UNION ALL SELECT query_id, id, 2 AS rank, mmr FROM s2 UNION ALL SELECT query_id, id, 3 AS rank, mmr FROM s3 UNION ALL SELECT query_id, id, 4 AS rank, mmr FROM s4 UNION ALL SELECT query_id, id, 5 AS rank, mmr FROM s5)
""",
        # deterministic negative sampling, NOT EXISTS against real edges.
        "negative_edges": """
            WITH e AS (SELECT DISTINCT l_orderkey % 20000 AS u,
                              (l_partkey * 3) % 20000 AS v
                       FROM lineitem),
            s AS (SELECT DISTINCT u FROM e),
            c AS (SELECT u, i,
                         ('0x' || substr(md5('neg' || ':'
                            || CAST(u AS VARCHAR) || ':'
                            || CAST(i AS VARCHAR)), 1, 8))::BIGINT % 20000 AS d
                  FROM s, unnest(generate_series(0, 8)) AS t(i)),
            f AS (SELECT * FROM c WHERE u <> d AND NOT EXISTS (
                    SELECT 1 FROM e WHERE e.u = c.u AND e.v = c.d)),
            r AS (SELECT u, d, row_number() OVER (
                    PARTITION BY u ORDER BY i ASC) AS rn FROM f)
            SELECT u AS src, d AS dst, CAST(rn AS INT) AS neg_rank
            FROM r WHERE rn <= 3
""",
        # PSI drift, identical bin and smoothing arithmetic.
        "psi_drift": """
            WITH scoped AS (
              SELECT CASE WHEN ts < TIMESTAMP '2024-01-16'
                          THEN 'base' ELSE 'cur' END AS per,
                     CAST(value AS DOUBLE) AS v
              FROM events),
            st AS (SELECT min(v) AS lo, max(v) AS hi FROM scoped),
            b1 AS (SELECT CASE WHEN hi = lo THEN 0
                               ELSE CAST(least(floor((v - lo)
                                    / ((hi - lo) / 10)), 9) AS INT) END AS bin,
                          lo, hi, per
                   FROM scoped, st),
            b2 AS (SELECT bin,
                          round(lo + bin * ((hi - lo) / 10), 6) AS lo_edge,
                          CASE WHEN per = 'base' THEN 1 ELSE 0 END AS nb,
                          CASE WHEN per = 'cur' THEN 1 ELSE 0 END AS nc
                   FROM b1),
            c AS (SELECT bin, lo_edge, sum(nb) AS n_base, sum(nc) AS n_cur
                  FROM b2 GROUP BY 1, 2),
            t AS (SELECT sum(n_base) AS tb, sum(n_cur) AS tc FROM c)
            SELECT bin, lo_edge,
                   CAST(n_base AS BIGINT) AS n_base,
                   CAST(n_cur AS BIGINT) AS n_cur,
                   round(CAST(n_base AS DOUBLE) / tb, 6) AS frac_base,
                   round(CAST(n_cur AS DOUBLE) / tc, 6) AS frac_cur,
                   round((CAST(n_cur AS DOUBLE) / tc + 1e-6
                          - (CAST(n_base AS DOUBLE) / tb + 1e-6))
                         * ln((CAST(n_cur AS DOUBLE) / tc + 1e-6)
                              / (CAST(n_base AS DOUBLE) / tb + 1e-6)), 6)
                     AS psi_term
            FROM c, t
        """,
        # RFM quintiles against pooled quantile_cont edges.
        "rfm": """
            WITH mx AS (SELECT max(ts) AS m FROM events),
            u AS (SELECT user_id,
                         CAST(floor(min(epoch_us(m) - epoch_us(ts))
                              / 1000000) AS BIGINT) AS recency_s,
                         CAST(count(*) AS BIGINT) AS freq,
                         CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE)
                           AS monetary
                  FROM events, mx GROUP BY user_id),
            e AS (SELECT quantile_cont(recency_s, 0.2) AS r0,
                         quantile_cont(recency_s, 0.4) AS r1,
                         quantile_cont(recency_s, 0.6) AS r2,
                         quantile_cont(recency_s, 0.8) AS r3,
                         quantile_cont(freq, 0.2) AS f0,
                         quantile_cont(freq, 0.4) AS f1,
                         quantile_cont(freq, 0.6) AS f2,
                         quantile_cont(freq, 0.8) AS f3,
                         quantile_cont(monetary, 0.2) AS m0,
                         quantile_cont(monetary, 0.4) AS m1,
                         quantile_cont(monetary, 0.6) AS m2,
                         quantile_cont(monetary, 0.8) AS m3
                  FROM u),
            s AS (SELECT user_id, recency_s, freq, monetary,
                         6 - (1 + CAST(recency_s > r0 AS INT)
                                + CAST(recency_s > r1 AS INT)
                                + CAST(recency_s > r2 AS INT)
                                + CAST(recency_s > r3 AS INT)) AS r_score,
                         1 + CAST(freq > f0 AS INT) + CAST(freq > f1 AS INT)
                           + CAST(freq > f2 AS INT) + CAST(freq > f3 AS INT)
                             AS f_score,
                         1 + CAST(monetary > m0 AS INT)
                           + CAST(monetary > m1 AS INT)
                           + CAST(monetary > m2 AS INT)
                           + CAST(monetary > m3 AS INT) AS m_score
                  FROM u, e)
            SELECT user_id, recency_s, freq, round(monetary, 4) AS monetary,
                   CAST(r_score AS INT) AS r_score,
                   CAST(f_score AS INT) AS f_score,
                   CAST(m_score AS INT) AS m_score,
                   CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
                     || CAST(m_score AS VARCHAR) AS segment
            FROM s
        """,
        # JSON column extraction parity.
        "json_props": """
            WITH x AS (SELECT event_type,
                              CAST(json_extract_string(props, '$.k') AS INT)
                                AS k
                       FROM events)
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_null,
                   CAST(sum(k) AS BIGINT) AS k_sum,
                   min(k) AS k_min, max(k) AS k_max,
                   round(CAST(sum(k) AS DOUBLE) / count(k), 6) AS k_avg
            FROM x GROUP BY event_type
        """,
        # hopping windows: every event contributes to the two slides
        # covering it; only watermark-closed windows emit.
        "stream_hopping_counts": """
            WITH s AS (
              SELECT event_type, ts,
                     unnest([
                       to_timestamp((epoch_us(ts) // 1800000000) * 1800
                                    - 1800),
                       to_timestamp((epoch_us(ts) // 1800000000) * 1800)
                     ]) AS ws
              FROM events),
            m AS (SELECT max(ts) AS mx FROM events),
            agg AS (SELECT ws, event_type, count(*) AS n FROM s GROUP BY 1, 2)
            SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
                   event_type, n
            FROM agg, m
            WHERE epoch_us(ws) + 3600000000 + 7200000000 <= epoch_us(mx)
        """,
        # streaming upsert folds to last-per-key (ts, event_id).
        "stream_upsert": """
            WITH r AS (SELECT user_id, ts, event_id, event_type, value,
                              row_number() OVER (
                                PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
                       FROM events)
            SELECT user_id, ts, event_id, event_type, value
            FROM r WHERE rn = 1
        """,
        # Benford: printf mirrors format_number's fixed-10-decimal
        # rendering; stripping 0/./, leaves the first significant digit.
        "benford": """
            WITH d0 AS (
              SELECT floor(round(abs(CAST(o_totalprice AS DOUBLE))
                           / pow(10.0, floor(log10(
                               abs(CAST(o_totalprice AS DOUBLE))))), 12)) AS d
              FROM orders WHERE abs(CAST(o_totalprice AS DOUBLE)) > 0),
            d AS (SELECT CAST(CASE WHEN d >= 10 THEN 1 ELSE d END AS INT)
                         AS digit FROM d0),
            c AS (SELECT digit, count(*) AS observed_n FROM d
                  WHERE digit BETWEEN 1 AND 9 GROUP BY digit),
            t AS (SELECT sum(observed_n) AS tot FROM c)
            SELECT digit, CAST(observed_n AS BIGINT) AS observed_n,
                   round(CAST(observed_n AS DOUBLE) / tot, 6) AS observed_frac,
                   round(log10(1.0 + 1.0 / digit), 6) AS expected_frac,
                   round((observed_n - log10(1.0 + 1.0 / digit) * tot)
                         * (observed_n - log10(1.0 + 1.0 / digit) * tot)
                         / (log10(1.0 + 1.0 / digit) * tot), 6) AS chi2_term
            FROM c, t
        """,
        # k-anonymity group audit.
        "k_anonymity": """
            SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                   CAST(floor(value / 50) AS BIGINT) AS value_band,
                   CAST(count(*) AS BIGINT) AS group_n,
                   (count(*) < 5) AS is_risky
            FROM events GROUP BY 1, 2, 3
        """,
        # every prefix of the part-type path, decimal-exact totals.
        "prefix_rollup": """
            WITH parts AS (SELECT string_split(p_type, ' ') AS w,
                                  p_retailprice FROM part),
            px AS (SELECT array_to_string(w[1:i], ' ') AS prefix,
                          CAST(i AS INT) AS depth,
                          CAST(p_retailprice AS DECIMAL(38,10)) AS v
                   FROM parts, unnest(generate_series(1, len(w))) AS t(i))
            SELECT prefix, depth, CAST(count(*) AS BIGINT) AS n,
                   round(CAST(sum(v) AS DOUBLE), 4) AS total
            FROM px GROUP BY 1, 2
        """,
        # Zipf OLS from 9-digit-rounded decimal-summed moments.
        "zipf_fit": """
            WITH c AS (
              SELECT t, count(*) AS freq FROM (
                SELECT unnest(list_filter(string_split_regex(lower(text),
                       '\\s+'), x -> x <> '')) AS t
                FROM documents)
              GROUP BY t ORDER BY freq DESC, t ASC LIMIT 200),
            rk AS (SELECT CAST(row_number() OVER (
                     ORDER BY freq DESC, t ASC) AS DOUBLE) AS r,
                          CAST(freq AS DOUBLE) AS f
                   FROM c),
            g AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                         CAST(sum(CAST(round(ln(r), 9) AS DECIMAL(38,12)))
                              AS DOUBLE) AS sx,
                         CAST(sum(CAST(round(ln(f), 9) AS DECIMAL(38,12)))
                              AS DOUBLE) AS sy,
                         CAST(sum(CAST(round(ln(r) * ln(r), 9)
                              AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
                         CAST(sum(CAST(round(ln(r) * ln(f), 9)
                              AS DECIMAL(38,12))) AS DOUBLE) AS sxy
                  FROM rk)
            SELECT CAST(n AS BIGINT) AS n_terms,
                   round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
                   round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
                         / n, 6) AS intercept
            FROM g
        """,
        # ER pipeline: FS matches -> recursive min-label components.
        "er_entities": """
            WITH RECURSIVE r AS (
              SELECT c_custkey AS id, c_nationkey, c_mktsegment,
                     floor(c_acctbal / 1000) AS pfx,
                     row_number() OVER (ORDER BY c_name, c_custkey) AS rk
              FROM customer),
            p AS (
              SELECT a.id AS id_a, b.id AS id_b,
                     a.c_nationkey AS na, b.c_nationkey AS nb,
                     a.c_mktsegment AS sa, b.c_mktsegment AS sb,
                     a.pfx AS pa, b.pfx AS pb
              FROM r a JOIN r b ON b.rk - a.rk BETWEEN 1 AND 3),
            s AS (
              SELECT id_a, id_b,
                     round(
                       CASE WHEN na IS NULL OR nb IS NULL THEN 0
                            WHEN na = nb
                            THEN log2(0.9 / 0.04) ELSE log2(0.1 / 0.96) END
                     + CASE WHEN sa IS NULL OR sb IS NULL THEN 0
                            WHEN sa = sb
                            THEN log2(0.9 / 0.2) ELSE log2(0.1 / 0.8) END
                     + CASE WHEN pa IS NULL OR pb IS NULL THEN 0
                            WHEN pa = pb
                            THEN log2(0.95 / 0.08) ELSE log2(0.05 / 0.92) END,
                     6) AS match_score
              FROM p),
            m AS (SELECT id_a, id_b FROM s WHERE match_score > 6.0),
            edges AS (SELECT id_a AS u, id_b AS v FROM m
                      UNION ALL SELECT id_b, id_a FROM m),
            reach(n, lab) AS (
              SELECT c_custkey, c_custkey FROM customer
              UNION
              SELECT rr.n, e.v FROM reach rr JOIN edges e ON e.u = rr.lab)
            SELECT n AS c_custkey, min(lab) AS entity_id
            FROM reach GROUP BY n
        """,
        # coordinated-sample join size estimate.
        "join_size_estimate": """
            WITH lc AS (
              SELECT o_custkey AS k, count(*) AS c FROM orders
              WHERE ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT
                    % 16 = 0
              GROUP BY 1),
            rc AS (
              SELECT c_custkey AS k, count(*) AS c FROM customer
              WHERE ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
                    % 16 = 0
              GROUP BY 1)
            SELECT CAST(count(*) AS BIGINT) AS sampled_keys,
                   CAST(coalesce(sum(lc.c * rc.c), 0) * 16 AS BIGINT)
                     AS est_join_rows
            FROM lc JOIN rc ON lc.k = rc.k
        """,
        # FK orphan + coverage audit.
        "referential_check": """
            WITH ck AS (SELECT user_id AS k, count(*) AS n FROM events
                        GROUP BY 1),
            pk AS (SELECT DISTINCT c_custkey AS k FROM customer),
            o AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS n_orphan_rows,
                         CAST(count(*) AS BIGINT) AS n_orphan_keys
                  FROM ck WHERE k NOT IN (SELECT k FROM pk)),
            c AS (SELECT CAST(sum(n) AS BIGINT) AS n_child FROM ck),
            ps AS (SELECT CAST(count(*) AS BIGINT) AS n_parents FROM pk),
            rs AS (SELECT CAST(count(*) AS BIGINT) AS n_referenced_parents
                   FROM pk WHERE k IN (SELECT k FROM ck))
            SELECT n_child, n_orphan_rows, n_orphan_keys,
                   round(CAST(n_orphan_rows AS DOUBLE) / n_child, 6)
                     AS orphan_frac,
                   n_parents, n_referenced_parents
            FROM c, o, ps, rs
        """,
        # Welch z-report from decimal-exact moments.
        "ab_delta": """
            WITH units AS (
              SELECT user_id,
                     CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE) AS y,
                     CAST(user_id % 2 AS INT) AS variant
              FROM events GROUP BY user_id),
            sa AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                          CAST(sum(CAST(y AS DECIMAL(38,10))) AS DOUBLE) AS s,
                          CAST(sum(CAST(y * y AS DECIMAL(38,10))) AS DOUBLE)
                            AS ss
                   FROM units WHERE variant = 0),
            sb AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                          CAST(sum(CAST(y AS DECIMAL(38,10))) AS DOUBLE) AS s,
                          CAST(sum(CAST(y * y AS DECIMAL(38,10))) AS DOUBLE)
                            AS ss
                   FROM units WHERE variant = 1)
            SELECT CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
                   round(sa.s / sa.n, 6) AS mean_a,
                   round(sb.s / sb.n, 6) AS mean_b,
                   round(sb.s / sb.n - sa.s / sa.n, 6) AS diff,
                   round(sqrt((sa.ss - sa.s * sa.s / sa.n) / (sa.n - 1) / sa.n
                            + (sb.ss - sb.s * sb.s / sb.n) / (sb.n - 1) / sb.n),
                         6) AS se,
                   round((sb.s / sb.n - sa.s / sa.n)
                         / sqrt((sa.ss - sa.s * sa.s / sa.n) / (sa.n - 1) / sa.n
                              + (sb.ss - sb.s * sb.s / sb.n) / (sb.n - 1)
                                / sb.n), 6) AS z
            FROM sa, sb
        """,
        # 2-round unrolled Fellegi-Sunter EM over the same pair table.
        "fs_em": f"""
            WITH r AS (
              SELECT c_custkey AS id, c_nationkey, c_mktsegment,
                     floor(c_acctbal / 1000) AS pfx,
                     row_number() OVER (ORDER BY c_name, c_custkey) AS rk
              FROM customer),
            p AS (
              SELECT a.c_nationkey AS na, b.c_nationkey AS nb,
                     a.c_mktsegment AS sa, b.c_mktsegment AS sb,
                     a.pfx AS pa, b.pfx AS pb
              FROM r a JOIN r b ON b.rk - a.rk BETWEEN 1 AND 3),
            fspairs AS (
              SELECT (na IS NOT NULL AND na IS NOT DISTINCT FROM nb)
                       AS agree_nation,
                     (sa IS NOT NULL AND sa IS NOT DISTINCT FROM sb)
                       AS agree_segment,
                     (pa IS NOT NULL AND pa IS NOT DISTINCT FROM pb)
                       AS agree_balband
              FROM p),
            fst0 AS (SELECT {fs_em_totals} FROM fspairs),
            {fs_em_rounds}
            {fs_em_final}
        """,
        # Apriori-pruned directed pair rules.
        "association_rules": """
            WITH items AS (SELECT DISTINCT l_orderkey AS b,
                                  l_partkey % 50 AS i
                           FROM lineitem),
            nb AS (SELECT count(DISTINCT b) AS N FROM items),
            cnt AS (SELECT i, count(*) AS c FROM items GROUP BY i),
            freq AS (SELECT i, c FROM cnt WHERE c >= 100),
            pr AS (SELECT it.b, it.i FROM items it JOIN freq f ON it.i = f.i),
            pairs AS (SELECT a.i AS item_a, b2.i AS item_b, count(*) AS pair_n
                      FROM pr a JOIN pr b2 ON a.b = b2.b AND a.i <> b2.i
                      GROUP BY 1, 2 HAVING count(*) >= 100)
            SELECT item_a, item_b, CAST(pair_n AS BIGINT) AS support_count,
                   round(CAST(pair_n AS DOUBLE) / N, 6) AS support,
                   round(CAST(pair_n AS DOUBLE) / ca, 6) AS confidence,
                   round((CAST(pair_n AS DOUBLE) / ca)
                         / (CAST(cb AS DOUBLE) / N), 6) AS lift
            FROM pairs
            JOIN (SELECT i AS item_a, c AS ca FROM freq) USING (item_a)
            JOIN (SELECT i AS item_b, c AS cb FROM freq) USING (item_b), nb
            WHERE round(CAST(pair_n AS DOUBLE) / ca, 6) >= 0.05
        """,
        # CUPED adjusted means from decimal-exact pooled moments.
        "cuped": """
            WITH units AS (
              SELECT user_id,
                     CAST(sum(CAST(CASE WHEN ts < TIMESTAMP '2024-01-16'
                                        THEN value ELSE 0.0 END
                                   AS DECIMAL(38,10))) AS DOUBLE) AS x,
                     CAST(sum(CAST(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                                        THEN value ELSE 0.0 END
                                   AS DECIMAL(38,10))) AS DOUBLE) AS y,
                     CAST(user_id % 2 AS INT) AS variant
              FROM events GROUP BY user_id),
            g AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                         CAST(sum(CAST(x AS DECIMAL(38,10))) AS DOUBLE) AS sx,
                         CAST(sum(CAST(y AS DECIMAL(38,10))) AS DOUBLE) AS sy,
                         CAST(sum(CAST(x * x AS DECIMAL(38,10))) AS DOUBLE)
                           AS sxx,
                         CAST(sum(CAST(x * y AS DECIMAL(38,10))) AS DOUBLE)
                           AS sxy
                  FROM units),
            p AS (SELECT variant, count(*) AS nu,
                         CAST(sum(CAST(y AS DECIMAL(38,10))) AS DOUBLE) AS vy,
                         CAST(sum(CAST(x AS DECIMAL(38,10))) AS DOUBLE) AS vx
                  FROM units GROUP BY variant)
            SELECT variant, CAST(nu AS BIGINT) AS n_units,
                   round(vy / nu, 6) AS mean_metric,
                   round(vy / nu
                         - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                           * (vx / nu - sx / n), 6) AS mean_adjusted
            FROM p, g
        """,
        # streaming windowed top-k: the oracle replays the tumbling
        # count + rank in batch, keeping only windows the 2 h watermark
        # closed (window_end <= max_ts - 2 h, the session-oracle rule).
        "stream_windowed_topk": """
            WITH c AS (
              SELECT date_trunc('hour', ts) AS ws, event_type, count(*) AS n
              FROM events GROUP BY 1, 2),
            m AS (SELECT max(ts) AS mx FROM events),
            r AS (SELECT ws, event_type, n,
                         row_number() OVER (PARTITION BY ws
                                            ORDER BY n DESC, event_type ASC)
                           AS rank
                  FROM c, m
                  WHERE epoch_us(ws) + 3600000000 + 7200000000 <= epoch_us(mx))
            SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
                   event_type, n, CAST(rank AS INT) AS rank
            FROM r WHERE rank <= 3
        """,
        # directed containment, brute-force verified at oracle scale.
        "containment_pairs": """
            WITH words AS (
              SELECT doc_id,
                     list_filter(string_split(
                       regexp_replace(lower(trim(text)), '[^a-z0-9 ]', ' ', 'g'),
                       ' '), w -> w <> '') AS w
              FROM documents),
            sh AS (
              SELECT doc_id,
                     CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                          ELSE list_distinct([array_to_string(w[i:i+2], ' ')
                                              for i in generate_series(1, len(w) - 2)])
                     END AS s
              FROM words)
            SELECT id_a, id_b, containment FROM (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                           / len(a.s), 6) AS containment
              FROM sh a JOIN sh b ON a.doc_id <> b.doc_id)
            WHERE containment >= 0.7
        """,
        # running-total bin packing per partition.
        "compaction_plan": """
            WITH f AS (
              SELECT strftime(ts, '%Y-%m-%d') AS part_date, hour(ts) AS file_id,
                     CAST(count(*) * 128 AS BIGINT) AS size_bytes
              FROM events GROUP BY 1, 2),
            p AS (
              SELECT part_date, file_id, size_bytes,
                     CAST(floor(coalesce(sum(size_bytes) OVER (
                       PARTITION BY part_date
                       ORDER BY size_bytes DESC, file_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       / 100000) AS INT) AS bin
              FROM f)
            SELECT part_date, file_id, size_bytes, bin,
                   CAST(sum(size_bytes) OVER (PARTITION BY part_date, bin)
                        AS BIGINT) AS bin_bytes
            FROM p
        """,
        "table_profile": profile_union,
        # two deterministic Lloyd rounds + final assignment.
        "kmeans_train": f"""
            WITH pts AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
                         FROM embeddings),
            h AS (SELECT id, v,
                         ('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8))::BIGINT
                           AS hh
                  FROM pts),
            i0 AS (SELECT id, v, hh FROM h ORDER BY hh ASC, id ASC LIMIT 4),
            c0 AS (SELECT CAST((SELECT count(*) FROM i0 j
                                WHERE j.hh < i.hh
                                   OR (j.hh = i.hh AND j.id < i.id)) AS INT) AS cl,
                          i.v AS v
                   FROM i0 i),
            {kmeans_rounds},
            af AS (SELECT p.id, c.cl, list_distance(p.v, c.v) AS d
                   FROM pts p CROSS JOIN c2 c),
            mf AS (SELECT id, min(d) AS md FROM af GROUP BY id)
            SELECT a.id AS vec_id, CAST(min(a.cl) AS INT) AS cluster,
                   round(min(m.md), 6) AS dist
            FROM af a JOIN mf m ON a.id = m.id AND a.d = m.md
            GROUP BY a.id
        """,
        # inverted-index TF-IDF cosine pairs, stop terms pruned.
        "tfidf_cosine_pairs": """
            WITH tok AS (
              SELECT doc_id AS id,
                     unnest(list_filter(string_split(
                       regexp_replace(lower(trim(text)), '[^a-z0-9 ]', ' ', 'g'),
                       ' '), x -> x <> '')) AS t
              FROM documents),
            tf AS (SELECT id, t, count(*) AS tf FROM tok GROUP BY 1, 2),
            nd AS (SELECT count(DISTINCT doc_id) AS N FROM documents),
            dfq AS (SELECT t, count(*) AS df_ FROM tf GROUP BY t),
            kept AS (SELECT t, df_, N FROM dfq, nd
                     WHERE df_ >= 2 AND df_ <= 0.3 * N),
            w AS (SELECT id, tf.t, tf.tf * ln(1 + CAST(N AS DOUBLE) / df_) AS w
                  FROM tf JOIN kept ON tf.t = kept.t),
            norms AS (SELECT id, sqrt(sum(w * w)) AS n FROM w GROUP BY id),
            wn AS (SELECT w.t, w.id, w.w / n.n AS wn
                   FROM w JOIN norms n USING (id)),
            p AS (SELECT a.id AS id_a, b.id AS id_b,
                         round(sum(a.wn * b.wn), 6) AS cos_sim
                  FROM wn a JOIN wn b ON a.t = b.t AND a.id < b.id
                  GROUP BY 1, 2)
            SELECT id_a, id_b, cos_sim FROM p WHERE cos_sim >= 0.25
        """,
        # 2-D skyline: the oracle uses the textbook single cummin
        # window; the Spark plan buckets it — same frontier.
        "pareto_frontier": """
            WITH b AS (
              SELECT l_orderkey * 100 + l_linenumber AS lid,
                     CAST(l_extendedprice AS DOUBLE) AS x,
                     CAST(l_quantity AS DOUBLE) AS y
              FROM lineitem),
            w AS (SELECT *, min(y) OVER (
                     ORDER BY x, y, lid
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
                  FROM b)
            SELECT lid, x AS l_extendedprice, y AS l_quantity
            FROM w WHERE pm IS NULL OR y < pm
        """,
        # 3 unrolled k-core peel rounds over the co-occurrence graph.
        "kcore": f"""
            WITH e0 AS (
              SELECT DISTINCT
                     least(l_orderkey % 20000, (l_partkey * 3) % 20000) AS u,
                     greatest(l_orderkey % 20000, (l_partkey * 3) % 20000) AS v
              FROM lineitem
              WHERE l_orderkey % 20000 <> (l_partkey * 3) % 20000),
            {kcore_rounds}
            SELECT node, CAST(count(*) AS BIGINT) AS degree
            FROM (SELECT u AS node FROM e3 UNION ALL SELECT v FROM e3)
            GROUP BY node
        """,
        # Z-order bucket stats from the arithmetic Morton interleave.
        "zorder_stats": f"""
            WITH q AS (
              SELECT least(CAST(floor(value * 100) AS BIGINT), 65535) AS zx,
                     user_id % 65536 AS zy
              FROM events),
            z AS (SELECT zx, zy, ({morton}) AS zval FROM q)
            SELECT zval // 16777216 AS bucket,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   min(zx) AS x_min, max(zx) AS x_max,
                   min(zy) AS y_min, max(zy) AS y_max
            FROM z GROUP BY 1
        """,
        # point-in-time SCD2 join: the oracle materializes the version
        # intervals and applies the literal interval predicate; the
        # Spark plan forward-fills instead — same answer.
        "scd2_lookup": """
            WITH src AS (
              SELECT user_id, ts,
                     CASE WHEN value < 20 THEN 'low'
                          WHEN value < 55 THEN 'mid'
                          ELSE 'high' END AS tier
              FROM events),
            chg AS (
              SELECT user_id, tier, ts,
                     lag(ts) OVER w IS NULL
                       OR tier IS DISTINCT FROM lag(tier) OVER w AS keep
              FROM src
              WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, tier ASC)),
            ver AS (
              SELECT user_id, tier, ts AS vf, lead(ts) OVER w2 AS vt
              FROM (SELECT * FROM chg WHERE keep)
              WINDOW w2 AS (PARTITION BY user_id ORDER BY ts ASC, tier ASC)),
            f AS (SELECT event_id, user_id, ts FROM events
                  WHERE event_type = 'click')
            SELECT f.event_id, f.user_id, f.ts, v.tier
            FROM f JOIN ver v ON f.user_id = v.user_id
              AND f.ts >= v.vf AND (v.vt IS NULL OR f.ts < v.vt)
        """,
        # KMV set algebra: union sketch + shared-hash Jaccard, the
        # kmv_distinct hash replayed bit-for-bit.
        "kmv_set_ops": """
            WITH ev AS (
              SELECT event_type, user_id,
                     CASE WHEN ts < TIMESTAMP '2024-01-16'
                          THEN 'h1' ELSE 'h2' END AS half
              FROM events),
            flags AS (
              SELECT event_type,
                     ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                       / 4294967296.0 AS u,
                     max(CASE WHEN half = 'h1' THEN 1 ELSE 0 END) AS a,
                     max(CASE WHEN half = 'h2' THEN 1 ELSE 0 END) AS b
              FROM ev GROUP BY 1, 2),
            rk AS (SELECT *, row_number() OVER (
                     PARTITION BY event_type ORDER BY u ASC) AS r
                   FROM flags),
            top AS (SELECT * FROM rk WHERE r <= 64)
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_kept,
                   CAST(sum(a * b) AS BIGINT) AS shared_kept,
                   round(CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                              ELSE 63.0 / greatest(max(u), 1e-12) END, 4)
                     AS est_union,
                   round(CAST(sum(a * b) AS DOUBLE) / count(*), 4) AS jaccard_est,
                   round((CAST(sum(a * b) AS DOUBLE) / count(*))
                         * CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                                ELSE 63.0 / greatest(max(u), 1e-12) END, 4)
                     AS est_intersection
            FROM top GROUP BY event_type
        """,
        # Fellegi-Sunter over sorted-neighborhood candidate pairs.
        "fellegi_sunter": """
            WITH r AS (
              SELECT c_custkey AS id, c_nationkey, c_mktsegment,
                     floor(c_acctbal / 1000) AS pfx,
                     row_number() OVER (ORDER BY c_name, c_custkey) AS rk
              FROM customer),
            p AS (
              SELECT a.id AS id_a, b.id AS id_b,
                     a.c_nationkey AS na, b.c_nationkey AS nb,
                     a.c_mktsegment AS sa, b.c_mktsegment AS sb,
                     a.pfx AS pa, b.pfx AS pb
              FROM r a JOIN r b ON b.rk - a.rk BETWEEN 1 AND 3),
            s AS (
              SELECT id_a, id_b,
                     (na IS NOT NULL AND na IS NOT DISTINCT FROM nb)
                       AS agree_nation,
                     (sa IS NOT NULL AND sa IS NOT DISTINCT FROM sb)
                       AS agree_segment,
                     (pa IS NOT NULL AND pa IS NOT DISTINCT FROM pb)
                       AS agree_balband,
                     round(
                       CASE WHEN na IS NULL OR nb IS NULL THEN 0
                            WHEN na = nb
                            THEN log2(0.9 / 0.04) ELSE log2(0.1 / 0.96) END
                     + CASE WHEN sa IS NULL OR sb IS NULL THEN 0
                            WHEN sa = sb
                            THEN log2(0.9 / 0.2) ELSE log2(0.1 / 0.8) END
                     + CASE WHEN pa IS NULL OR pb IS NULL THEN 0
                            WHEN pa = pb
                            THEN log2(0.95 / 0.08) ELSE log2(0.05 / 0.92) END,
                     6) AS match_score
              FROM p)
            SELECT id_a, id_b, agree_nation, agree_segment, agree_balband,
                   match_score, (match_score > 2.0) AS is_match
            FROM s
        """,
        # RRF hybrid fusion of the shared bm25 pipeline and the shared
        # cosine expression.
        "rrf_fusion": """
            WITH w AS (
              SELECT doc_id,
                     list_filter(string_split(
                       regexp_replace(lower(trim(text)), '[^a-z0-9 ]', ' ', 'g'),
                       ' '), x -> x <> '') AS w
              FROM documents),
            stats AS (SELECT count(*) AS N, avg(len(w)) AS avgdl FROM w),
            tf AS (
              SELECT doc_id, t, count(*) AS tf, max(len(w)) AS dl
              FROM w, unnest(w.w) AS u(t)
              WHERE t IN ('spark', 'merge', 'stream')
              GROUP BY doc_id, t),
            dfq AS (SELECT t, count(*) AS df_ FROM tf GROUP BY t),
            bmf AS (
              SELECT doc_id,
                     round(sum(
                       ln(1 + (N - df_ + 0.5) / (df_ + 0.5))
                       * tf * 2.2
                       / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
                     ), 4) AS s
              FROM tf JOIN dfq USING (t) CROSS JOIN stats
              GROUP BY doc_id),
            bm AS (SELECT doc_id AS id, s FROM bmf
                   ORDER BY s DESC, id ASC LIMIT 100),
            q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                  FROM embeddings WHERE vec_id = 0),
            cosx AS (
              SELECT e.vec_id AS id,
                     list_cosine_similarity(qv, CAST(e.embedding AS DOUBLE[]))
                       AS s
              FROM embeddings e, q),
            cs AS (SELECT id, s FROM cosx ORDER BY s DESC, id ASC LIMIT 100),
            u AS (SELECT 'bm25' AS src, id, s FROM bm
                  UNION ALL SELECT 'cosine', id, s FROM cs),
            rk AS (SELECT src, id, row_number() OVER (
                     PARTITION BY src ORDER BY s DESC, id ASC) AS r
                   FROM u),
            f AS (SELECT id, round(sum(1.0 / (60 + r)), 6) AS rrf_score,
                         CAST(count(*) AS BIGINT) AS n_lists
                  FROM rk GROUP BY id)
            SELECT id AS doc_id, rrf_score, n_lists
            FROM f ORDER BY rrf_score DESC, doc_id ASC LIMIT 50
        """,
        # Count-Min sketch, md5-derived and therefore engine-portable:
        # the ESTIMATE itself is checked, not just an error bound.
        "cms_counts": """
            WITH b AS (
              SELECT CAST(user_id AS VARCHAR) AS key, v.d,
                     ('0x' || substr(md5(v.d || ':' || CAST(user_id AS VARCHAR)),
                      1, 8))::BIGINT % 64 AS bkt
              FROM events CROSS JOIN (VALUES (0),(1),(2),(3)) v(d)),
            counters AS (SELECT d, bkt, count(*) AS c FROM b GROUP BY 1, 2),
            keys AS (SELECT CAST(user_id AS VARCHAR) AS key,
                            count(*) AS exact_count
                     FROM events GROUP BY 1),
            probes AS (
              SELECT k.key, k.exact_count, v.d,
                     ('0x' || substr(md5(v.d || ':' || k.key), 1, 8))::BIGINT % 64
                       AS bkt
              FROM keys k CROSS JOIN (VALUES (0),(1),(2),(3)) v(d)),
            est AS (SELECT p.key, p.exact_count, min(c.c) AS est_count
                    FROM probes p JOIN counters c ON c.d = p.d AND c.bkt = p.bkt
                    GROUP BY 1, 2)
            SELECT key, CAST(est_count AS BIGINT) AS est_count,
                   CAST(exact_count AS BIGINT) AS exact_count,
                   (est_count >= exact_count) AS cms_ok
            FROM est
        """,
        # median/MAD modified z-score; quantile_cont == percentile
        # parity is pinned by grouped_percentiles.
        "mad_outliers": """
            WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS m
                         FROM events GROUP BY 1),
            dev AS (SELECT e.event_id, e.event_type, e.value, m.m
                    FROM events e JOIN med m USING (event_type)),
            mad AS (SELECT event_type, quantile_cont(abs(value - m), 0.5) AS md
                    FROM dev GROUP BY 1)
            SELECT d.event_id, d.event_type, d.value,
                   CASE WHEN md > 0
                        THEN round(0.6745 * (d.value - d.m) / md, 6) END AS robust_z,
                   coalesce(abs(CASE WHEN md > 0
                        THEN round(0.6745 * (d.value - d.m) / md, 6) END) > 3.5,
                        FALSE) AS is_outlier
            FROM dev d JOIN mad USING (event_type)
        """,
        # CDC replay: last op per key wins, deletes tombstone the key.
        "cdc_replay": """
            WITH log AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
                     event_type, value
              FROM events),
            r AS (SELECT *, row_number() OVER (
                     PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                  FROM log)
            SELECT user_id, event_type, value FROM r WHERE rn = 1 AND op <> 'D'
        """,
        # hourly grid + forward fill on the exact microsecond time base.
        "gap_fill": """
            WITH obs AS (
              SELECT event_type AS key,
                     (epoch_us(ts) // 3600000000) * 3600 AS g,
                     epoch_us(ts) AS t, value AS v, 1 AS is_obs
              FROM events),
            spans AS (SELECT key, min(g) AS lo, max(g) AS hi FROM obs GROUP BY key),
            grid AS (SELECT key, unnest(range(lo, hi + 1, 3600)) AS g FROM spans),
            gr AS (SELECT key, g, (g + 3600) * 1000000 - 1 AS t,
                          CAST(NULL AS DOUBLE) AS v, 0 AS is_obs FROM grid),
            u AS (SELECT key, g, t, v, is_obs FROM obs
                  UNION ALL SELECT key, g, t, v, is_obs FROM gr),
            f AS (SELECT key, g, v, is_obs,
                    last_value(CASE WHEN is_obs = 1 THEN v END IGNORE NULLS)
                      OVER (PARTITION BY key ORDER BY t, is_obs DESC, v
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv,
                    last_value(CASE WHEN is_obs = 1 THEN g END IGNORE NULLS)
                      OVER (PARTITION BY key ORDER BY t, is_obs DESC, v
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fg
                  FROM u)
            SELECT key AS event_type, make_timestamp(g * 1000000) AS grid_ts,
                   fv AS value_filled, (fg = g) AS is_observed
            FROM f WHERE is_obs = 0
        """,
        # bloom prefilter never changes the answer: oracle is the plain
        # selective join.
        "bloom_join": """
            SELECT o_orderkey, o_custkey, c_name, o_totalprice
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE n_name = 'NATION_10'
        """,
        # sorted-neighborhood: pairs within rank distance 5 on the
        # (p_name, p_partkey) total order.
        "sorted_neighborhood": """
            WITH r AS (SELECT p_partkey AS id, CAST(p_name AS VARCHAR) AS key,
                              row_number() OVER (ORDER BY p_name, p_partkey) AS rk
                       FROM part)
            SELECT a.id AS id_a, b.id AS id_b, a.key AS key_a, b.key AS key_b,
                   CAST(b.rk - a.rk AS BIGINT) AS rank_distance
            FROM r a JOIN r b ON b.rk - a.rk BETWEEN 1 AND 5
        """,
        # fertility: shared token regex / whitespace split expressions.
        "tokenizer_fertility": """
            WITH per AS (
              SELECT source,
                     len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
                       AS w,
                     len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
                       AS t,
                     length(text) AS c
              FROM documents)
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(w) AS BIGINT) AS n_words,
                   CAST(sum(t) AS BIGINT) AS n_tokens,
                   round(CAST(sum(t) AS DOUBLE) / sum(w), 6) AS fertility,
                   round(sum(t) * 100.0 / sum(c), 6) AS tokens_per_100_chars
            FROM per GROUP BY source
        """,
        # DSIR hashed-unigram log-ratio, decimal-exact per-doc sum.
        "dsir_weights": """
            WITH toks AS (
              SELECT doc_id, (source = 'src7') AS t,
                     unnest(string_split(text, ' ')) AS tok
              FROM documents WHERE length(text) > 0),
            tb AS (SELECT doc_id, t,
                          ('0x' || substr(md5(tok), 1, 8))::BIGINT % 1024 AS b
                   FROM toks),
            counts AS (SELECT b, sum(CASE WHEN t THEN 1 ELSE 0 END) AS ct,
                              count(*) AS cr
                       FROM tb GROUP BY b),
            totals AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM counts),
            ratio AS (SELECT b,
                        CAST(round(ln((ct + 1) / (tt + 1024))
                                   - ln((cr + 1) / (tr + 1024)), 9)
                             AS DECIMAL(20,9)) AS lr
                      FROM counts, totals)
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                   CAST(round(sum(lr), 6) AS DOUBLE) AS log_weight
            FROM tb JOIN ratio USING (b)
            GROUP BY doc_id
        """,
        # Recursive ancestor closure over the part hierarchy; on a tree
        # the min is the unique path length. Matches the pointer-doubling
        # Spark plan pair-for-pair.
        "graph_closure": """
            WITH RECURSIVE e AS (
              SELECT p_partkey AS src, p_partkey // 10 AS dst
              FROM part WHERE p_partkey >= 1),
            anc AS (
              SELECT src, dst, 1 AS dist FROM e
              UNION
              SELECT a.src, e.dst, a.dist + 1
              FROM anc a JOIN e ON a.dst = e.src)
            SELECT src AS node, dst AS ancestor,
                   CAST(min(dist) AS BIGINT) AS dist
            FROM anc GROUP BY src, dst
        """,
        "hierarchy_rollup": """
            WITH RECURSIVE e AS (
              SELECT p_partkey AS src, p_partkey // 10 AS dst
              FROM part WHERE p_partkey >= 1),
            anc AS (
              SELECT src, dst FROM e
              UNION
              SELECT a.src, e.dst FROM anc a JOIN e ON a.dst = e.src),
            -- explicit UNION ALL + outer DISTINCT: inside a WITH
            -- RECURSIVE block DuckDB does not intra-batch-dedup plain
            -- UNIONs in non-recursive CTEs
            cl AS (
              SELECT DISTINCT part, node FROM (
                SELECT src AS part, dst AS node FROM anc
                UNION ALL SELECT src, src FROM e
                UNION ALL SELECT dst, dst FROM e))
            SELECT cl.node,
                   round(sum(l_quantity), 6) AS total_qty,
                   count(*) AS n_lineitems
            FROM lineitem JOIN cl ON l_partkey = cl.part
            GROUP BY cl.node
        """,
        "ngram_counts": r"""
            WITH tok AS (
              SELECT regexp_extract_all(lower(text),
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]') AS t
              FROM documents),
            g AS (
              SELECT array_to_string(t[i:i+2], ' ') AS ngram
              FROM tok, unnest(generate_series(1, greatest(len(t) - 2, 0)))
                          AS u(i)),
            c AS (
              SELECT ngram, count(*) AS freq FROM g
              GROUP BY ngram HAVING count(*) >= 2),
            r AS (
              SELECT ngram, freq,
                     row_number() OVER (ORDER BY freq DESC, ngram ASC) AS rk
              FROM c)
            SELECT ngram, freq FROM r WHERE rk <= 150
        """,
        # Funnel via per-stage min-ts joins: provably the same stage
        # reach as the Spark side's greedy sorted-array walk.
        "funnel": """
            WITH t1 AS (
              SELECT user_id, min(ts) AS t FROM events
              WHERE event_type = 'view' GROUP BY user_id),
            t2 AS (
              SELECT e.user_id, min(e.ts) AS t
              FROM events e JOIN t1 ON e.user_id = t1.user_id
              WHERE e.event_type = 'click' AND e.ts >= t1.t
              GROUP BY e.user_id),
            t3 AS (
              SELECT e.user_id, min(e.ts) AS t
              FROM events e JOIN t2 ON e.user_id = t2.user_id
              WHERE e.event_type = 'purchase' AND e.ts >= t2.t
              GROUP BY e.user_id)
            SELECT (SELECT count(*) FROM t1) AS n_view,
                   (SELECT count(*) FROM t2) AS n_click,
                   (SELECT count(*) FROM t3) AS n_purchase
        """,
        "time_bucket_rollup": """
            SELECT date_trunc('hour', ts) AS bucket,
                   count(*) AS n_events,
                   round(sum(value), 6) AS total_value,
                   count(DISTINCT user_id) AS n_users
            FROM events GROUP BY 1
        """,
        "key_skew_profile": """
            WITH c AS (
              SELECT user_id AS key, count(*) AS n FROM events GROUP BY 1),
            t AS (SELECT sum(n) AS tot FROM c),
            r AS (
              SELECT key, n,
                     CAST(row_number() OVER (ORDER BY n DESC, key ASC)
                          AS INT) AS rank
              FROM c)
            SELECT key, n, round(CAST(n AS DOUBLE) / tot, 6) AS share, rank
            FROM r, t WHERE rank <= 20
        """,
        "grouped_percentiles": """
            SELECT l_returnflag,
                   round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
                   round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
                   round(quantile_cont(l_extendedprice, 0.95), 6) AS p95
            FROM lineitem GROUP BY l_returnflag
        """,
        "cube_rollup": """
            SELECT l_returnflag, l_linestatus,
                   CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT)
                     AS gid,
                   round(sum(l_quantity), 6) AS sum_qty,
                   count(*) AS n
            FROM lineitem
            GROUP BY ROLLUP(l_returnflag, l_linestatus)
        """,
        "pivot_events": """
            SELECT user_id,
                   count(*) FILTER (WHERE event_type = 'click') AS n_click,
                   count(*) FILTER (WHERE event_type = 'view') AS n_view,
                   count(*) FILTER (WHERE event_type = 'purchase')
                     AS n_purchase,
                   count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
                   count(*) FILTER (WHERE event_type = 'error') AS n_error
            FROM events GROUP BY user_id
        """,
        # The one-shot aggregation the incremental merge must equal.
        # Decimal sums (matching the Spark side) make the result exact
        # and independent of summation order, so the hash is stable.
        "incremental_agg": """
            SELECT l_returnflag, l_linestatus,
                   round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
                              AS DOUBLE), 6) AS sum_qty,
                   round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                              AS DOUBLE), 6) AS sum_price,
                   count(*) AS n
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "rolling_average": """
            SELECT event_id, user_id,
                   round(avg(value) OVER (
                     PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6)
                     AS rolling_avg
            FROM events
        """,
        "histogram_bins": """
            SELECT CAST(floor(l_extendedprice / 5000) AS BIGINT) AS bucket,
                   round(CAST(floor(l_extendedprice / 5000) AS BIGINT)
                         * 5000.0, 6) AS lo_edge,
                   count(*) AS n
            FROM lineitem GROUP BY 1, 2
        """,
        # Bigram conditional log-prob under the corpus's own counts;
        # denominator is the w1-as-prefix count, not the raw unigram
        # count, so the conditional distribution sums to 1.
        "lm_score": r"""
            WITH tok AS (
              SELECT doc_id, regexp_extract_all(lower(text),
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]') AS t
              FROM documents),
            bg AS (
              SELECT doc_id, t[i] AS w1,
                     array_to_string(t[i:i+1], ' ') AS bigram
              FROM tok, unnest(generate_series(1, greatest(len(t) - 1, 0)))
                          AS u(i)),
            c2 AS (SELECT bigram, count(*) AS c FROM bg GROUP BY bigram),
            c1 AS (SELECT w1, count(*) AS c FROM bg GROUP BY w1),
            scored AS (
              SELECT bg.doc_id,
                     log2(CAST(c2.c AS DOUBLE) / c1.c) AS lp
              FROM bg JOIN c2 USING (bigram) JOIN c1 USING (w1))
            SELECT doc_id, round(avg(lp), 6) AS avg_log2_prob,
                   count(*) AS n_bigrams
            FROM scored GROUP BY doc_id
        """,
        "grouped_regression": """
            SELECT l_returnflag, l_linestatus, count(*) AS n,
                   round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
                   round(regr_intercept(l_extendedprice, l_quantity), 6)
                     AS intercept,
                   round(corr(l_quantity, l_extendedprice), 6) AS pearson_r,
                   round(regr_r2(l_extendedprice, l_quantity), 6) AS r2
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        # The UNsalted join: salting must not change the result.
        "salted_skew_join": """
            SELECT c_mktsegment, count(*) AS n_events,
                   round(sum(value), 6) AS total_value
            FROM events e JOIN customer c ON e.user_id = c.c_custkey
            GROUP BY c_mktsegment
        """,
        "filter_dsl_nested": """
            SELECT o_orderkey, o_totalprice, o_orderpriority
            FROM orders
            WHERE o_orderstatus = 'O'
              AND (o_orderpriority IN ('1-URGENT', '2-HIGH') OR o_totalprice > 250000)
            ORDER BY o_orderkey
        """,
        "filter_dsl_subquery": """
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders o
            WHERE o_orderstatus = 'F'
              AND EXISTS (
                SELECT 1 FROM customer c
                WHERE c.c_custkey = o.o_custkey
                  AND c.c_mktsegment = 'BUILDING' AND c.c_acctbal > 1000)
        """,
        "filter_dsl_pagination": """
            SELECT c_custkey, c_name, c_acctbal
            FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
            ORDER BY c_custkey LIMIT 100 OFFSET 50
        """,
        # neighbors: 2 — fixed-hop undirected BFS over the synthesized
        # nation->region edges, replicated as two explicit hop joins
        "filter_dsl_neighbors": """
            WITH v AS (
              SELECT 'N' || n_nationkey AS rid, lower(n_name) AS name FROM nation
              UNION ALL
              SELECT 'R' || r_regionkey, lower(r_name) FROM region),
            e AS (
              SELECT 'N' || n_nationkey AS src, 'R' || n_regionkey AS dst FROM nation
              UNION ALL
              SELECT 'R' || n_regionkey, 'N' || n_nationkey FROM nation),
            seed AS (SELECT rid FROM v WHERE name = 'nation_0'),
            h1 AS (
              SELECT DISTINCT e.dst AS rid FROM seed JOIN e ON e.src = seed.rid
              WHERE e.dst NOT IN (SELECT rid FROM seed)),
            h2 AS (
              SELECT DISTINCT e.dst AS rid FROM h1 JOIN e ON e.src = h1.rid
              WHERE e.dst NOT IN (SELECT rid FROM seed)
                AND e.dst NOT IN (SELECT rid FROM h1)),
            closure AS (
              SELECT rid, 0 AS _hop FROM seed
              UNION ALL SELECT rid, 1 FROM h1
              UNION ALL SELECT rid, 2 FROM h2)
            SELECT v.rid, v.name, c._hop
            FROM closure c JOIN v USING (rid)
            ORDER BY v.rid
        """,
        "top1_per_group": """
            WITH ranked AS (
              SELECT c_nationkey, c_name, c_acctbal,
                     row_number() OVER (PARTITION BY c_nationkey
                                        ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
              FROM customer)
            SELECT n.n_name, r.c_name, round(r.c_acctbal, 2) AS best_acctbal
            FROM ranked r JOIN nation n ON n.n_nationkey = r.c_nationkey
            WHERE r.rn = 1
        """,
        "fallback_cascade": """
            SELECT o.o_orderkey,
                   coalesce(c1.c_name, c2.c_name) AS cust_name,
                   round(coalesce(c1.c_acctbal, c2.c_acctbal), 2) AS cust_acctbal
            FROM orders o
            LEFT JOIN customer c1 ON c1.c_custkey = o.o_custkey AND c1.c_acctbal > 0
            LEFT JOIN customer c2 ON c2.c_custkey = o.o_custkey
        """,
        "anti_join_incremental": """
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                              AND o.o_orderpriority = '1-URGENT')
        """,
        "semi_join_exists": """
            SELECT c_custkey, c_name, c_mktsegment FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderpriority = '1-URGENT' AND o.o_orderstatus = 'O')
        """,
        "broadcast_dim_join": """
            SELECT r.r_name,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            GROUP BY r.r_name
        """,
        "normalized_key_join": """
            SELECT d.brand_uc, count(*) AS n_parts
            FROM part p
            JOIN (SELECT DISTINCT upper(p_brand) AS brand_uc FROM part) d
              ON lower(d.brand_uc) = lower(p.p_brand)
            GROUP BY d.brand_uc
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "recurrence_rollup": """
            SELECT l_partkey, count(DISTINCT l_suppkey) AS n_suppliers
            FROM lineitem GROUP BY l_partkey
            HAVING count(DISTINCT l_suppkey) >= 4
        """,
        "consensus_agg": """
            SELECT o_custkey,
                   CASE WHEN count(DISTINCT o_orderpriority) = 1
                        THEN min(o_orderpriority) END AS consensus_priority
            FROM orders GROUP BY o_custkey
        """,
        "latest_per_key": """
            WITH ranked AS (
              SELECT o_custkey, o_orderkey, o_orderdate,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
              FROM orders)
            SELECT o_custkey, o_orderkey AS latest_orderkey,
                   strftime(o_orderdate, '%Y-%m-%d') AS latest_orderdate
            FROM ranked WHERE rn = 1
        """,
        "version_chain": """
            SELECT event_id, user_id,
                   CAST(floor(epoch(ts)) AS BIGINT)
                     - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id
                            ORDER BY ts ASC, event_id ASC))) AS BIGINT) AS gap_seconds
            FROM events
        """,
        "duplicate_names": """
            SELECT p_name, count(*) AS n FROM part GROUP BY p_name HAVING count(*) > 1
        """,
        "merge_upsert": """
            WITH base AS (
              SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice
              FROM orders),
            target AS (SELECT * FROM base WHERE o_orderkey % 3 <> 0),
            source AS (
              SELECT o_orderkey, o_orderstatus,
                     CASE WHEN o_orderkey % 5 = 0 THEN round(o_totalprice + 1.0, 2)
                          ELSE o_totalprice END AS o_totalprice
              FROM base WHERE o_orderkey % 7 <> 0)
            SELECT coalesce(s.o_orderkey, t.o_orderkey) AS o_orderkey,
                   CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
                        ELSE t.o_totalprice END AS o_totalprice,
                   CASE WHEN t.o_orderkey IS NULL THEN 'create'
                        WHEN s.o_orderkey IS NULL THEN 'delete'
                        WHEN s.o_totalprice <> t.o_totalprice
                          OR s.o_orderstatus <> t.o_orderstatus THEN 'update'
                        ELSE 'noop' END AS action
            FROM target t FULL OUTER JOIN source s ON s.o_orderkey = t.o_orderkey
        """,
        "reconcile": """
            WITH stored AS (
              SELECT o_custkey AS sourceId, o_orderkey AS subject,
                     o_orderpriority AS content,
                     'rid_' || o_orderkey AS rid
              FROM orders WHERE o_orderkey % 4 <> 0),
            batch AS (
              SELECT o_custkey AS sourceId, o_orderkey AS subject,
                     CASE WHEN o_orderkey % 2 = 0 THEN 'REVISED'
                          ELSE o_orderpriority END AS content,
                     'new_' || o_orderkey AS rid
              FROM orders WHERE o_orderkey % 5 <> 0),
            -- pass 1: exact content-key (subject) match within the group
            p1 AS (
              SELECT b.sourceId, b.subject, b.content, s.rid
              FROM batch b JOIN stored s
                ON s.sourceId = b.sourceId AND s.subject = b.subject),
            -- leftovers, ranked positionally within the group
            lo AS (
              SELECT s.*, row_number() OVER (PARTITION BY sourceId
                                             ORDER BY subject, content) AS rn
              FROM stored s WHERE NOT EXISTS (
                SELECT 1 FROM batch b
                WHERE b.sourceId = s.sourceId AND b.subject = s.subject)),
            ln AS (
              SELECT b.*, row_number() OVER (PARTITION BY sourceId
                                             ORDER BY subject, content) AS rn
              FROM batch b WHERE NOT EXISTS (
                SELECT 1 FROM stored s
                WHERE s.sourceId = b.sourceId AND s.subject = b.subject)),
            -- pass 3: artificial positional pairing of leftovers
            p3 AS (
              SELECT coalesce(ln.sourceId, lo.sourceId) AS sourceId,
                     CASE WHEN ln.rid IS NOT NULL THEN ln.subject
                          ELSE lo.subject END AS subject,
                     CASE WHEN ln.rid IS NOT NULL THEN ln.content
                          ELSE lo.content END AS content,
                     CASE WHEN ln.rid IS NOT NULL AND lo.rid IS NOT NULL THEN lo.rid
                          WHEN ln.rid IS NOT NULL THEN ln.rid ELSE lo.rid END AS rid,
                     CASE WHEN ln.rid IS NOT NULL AND lo.rid IS NOT NULL THEN 'update'
                          WHEN ln.rid IS NOT NULL THEN 'create'
                          ELSE 'delete' END AS action
              FROM ln FULL OUTER JOIN lo
                ON lo.sourceId = ln.sourceId AND lo.rn = ln.rn)
            SELECT sourceId, subject, content, rid, 'update' AS action FROM p1
            UNION ALL
            SELECT sourceId, subject, content, rid, action FROM p3
        """,
        "incremental_merge": """
            WITH ev AS (
              SELECT user_id, event_id, ts, event_type, round(value, 4) AS value
              FROM events),
            target AS (
              SELECT * FROM (
                SELECT user_id, event_id, ts, event_type, value,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id DESC) AS rn
                FROM ev WHERE ts < TIMESTAMP '2024-01-15 00:00:00') WHERE rn = 1),
            fresh AS (
              SELECT * FROM (
                SELECT user_id, event_id, ts, event_type, value,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id DESC) AS rn
                FROM ev WHERE ts >= TIMESTAMP '2024-01-15 00:00:00') WHERE rn = 1)
            SELECT coalesce(f.user_id, t.user_id) AS user_id,
                   strftime(CASE WHEN f.user_id IS NOT NULL THEN f.ts ELSE t.ts END,
                            '%Y-%m-%d %H:%M:%S') AS latest_ts,
                   CASE WHEN f.user_id IS NOT NULL THEN f.event_type
                        ELSE t.event_type END AS event_type,
                   CASE WHEN f.user_id IS NOT NULL THEN f.value ELSE t.value END AS value,
                   CASE WHEN t.user_id IS NULL THEN 'create'
                        WHEN f.user_id IS NULL THEN 'keep'
                        WHEN f.event_id <> t.event_id OR f.ts <> t.ts
                          OR f.event_type <> t.event_type
                          OR f.value <> t.value THEN 'update'
                        ELSE 'noop' END AS action
            FROM target t FULL OUTER JOIN fresh f ON f.user_id = t.user_id
        """,
        "stable_hash_id": """
            SELECT n_nationkey, n_name,
                   md5('{"n_name":"' || n_name || '","n_nationkey":' || n_nationkey || '}')
                     AS rid
            FROM nation
        """,
        "kb_ontology_load": """
            WITH src AS (SELECT md5('{"cls":"Source","name":"tpch"}') AS srid),
            recs AS (
              SELECT 'R' || r_regionkey AS sourceId, lower(r_name) AS name,
                     CAST(NULL AS VARCHAR) AS parent_sid
              FROM region
              UNION ALL
              SELECT 'N' || n_nationkey, lower(n_name), 'R' || n_regionkey
              FROM nation)
            SELECT r.sourceId, r.name,
                   md5('{"cls":"Vocabulary","name":"' || r.name
                       || '","sourceId":"' || r.sourceId
                       || '","sourceIdVersion":null,"source_rid":"'
                       || (SELECT srid FROM src) || '"}') AS rid,
                   r.parent_sid
            FROM recs r
        """,
        # full replica of batch addVariant over synthesized notations:
        # same branch algebra, same content-hash rids, same Infers links
        "variant_load": """
            WITH src AS (
              SELECT DISTINCT CAST(p_partkey % 50 AS INT) AS g,
                     CAST(CAST(floor(p_partkey / 50) AS INT) % 5 AS INT) AS b
              FROM part),
            rows_ AS (
              SELECT g, b, g*10 + b + 1 AS n,
                CASE b
                  WHEN 0 THEN 'G'||g||':p.G'||(g*10 + b + 1)||'D'
                  WHEN 1 THEN 'G'||g||':e.'||(g*10 + b + 1)||'del'
                  WHEN 2 THEN 'G'||g||':c.'||(g*10 + b + 1)||'A>G'
                  WHEN 3 THEN 'G'||g||':g.'||(g*10 + b + 1)||'_'||(g*10 + b + 3)||'del'
                  ELSE '(GA'||g||',GB'||g||'):fusion(e.1,e.3)'
                END AS notation
              FROM src)
            SELECT
              md5('{"cls":"PositionalVariant","displayName":"' || notation
                  || '","source":"variant-demo"}') AS rid,
              notation AS displayName,
              'PositionalVariant' AS cls,
              CASE b WHEN 0 THEN 'v-missense' WHEN 1 THEN 'v-deletion'
                     WHEN 2 THEN 'v-substitution' WHEN 3 THEN 'v-deletion'
                     ELSE 'v-fusion' END AS type_rid,
              CASE WHEN b < 4 THEN 'f-G'||g ELSE 'f-GA'||g END AS reference1_rid,
              CASE WHEN b = 4 THEN 'f-GB'||g END AS reference2_rid,
              CASE b WHEN 0 THEN 'ProteinPosition' WHEN 1 THEN 'ExonicPosition'
                     WHEN 2 THEN 'CdsPosition' WHEN 3 THEN 'GenomicPosition'
                     ELSE 'ExonicPosition' END AS b1_cls,
              CASE WHEN b = 4 THEN 1 ELSE n END AS b1_pos,
              CASE WHEN b = 0 THEN 'G' END AS b1_ref_aa,
              CASE WHEN b = 3 THEN 'GenomicPosition'
                   WHEN b = 4 THEN 'ExonicPosition' END AS b2_cls,
              CASE WHEN b = 3 THEN n + 2 WHEN b = 4 THEN 3 END AS b2_pos,
              CASE WHEN b = 2 THEN 'A' END AS ref_seq,
              CASE WHEN b = 2 THEN 'G' END AS alt_seq,
              CASE WHEN b IN (1, 2, 3) THEN
                md5('{"cls":"PositionalVariant","displayName":"G' || g
                    || ':p.G' || (g*10 + 1)
                    || 'D","source":"variant-demo"}')
              END AS infers_rid
            FROM rows_
        """,
        "oncokb_names": """
            SELECT p_partkey,
                   CASE
                     WHEN p_partkey % 4 = 0 THEN 'G' || (p_partkey % 500 + 1) || 'D'
                     WHEN p_partkey % 4 = 1
                       THEN 'exon ' || (p_partkey % 30 + 1) || ' deletion'
                     WHEN p_partkey % 4 = 2 THEN 'BCR-ABL1'
                     ELSE 'Truncating Mutations'
                   END AS variant_name,
                   CASE
                     WHEN p_partkey % 4 = 0
                       THEN 'p.g' || (p_partkey % 500 + 1) || 'd'
                     WHEN p_partkey % 4 = 1 THEN 'e.' || (p_partkey % 30 + 1) || 'del'
                     WHEN p_partkey % 4 = 2 THEN 'fusion'
                     ELSE 'truncating'
                   END AS vtype,
                   CASE WHEN p_partkey % 4 = 2 THEN 'bcr' END AS reference2,
                   CASE WHEN p_partkey % 4 = 2 THEN TRUE END AS flipped
            FROM part
        """,
        "hotspot_load": """
            WITH raw AS (
              SELECT p_partkey,
                     CAST(p_partkey % 22 + 1 AS VARCHAR) AS chromosome,
                     (['pathogenic', '', 'likely_benign', 'uncertain'])[p_partkey % 4 + 1]
                       AS clin_sig,
                     p_brand AS disease_id,
                     CASE WHEN p_partkey % 3 = 1 THEN 'MODERATE' ELSE 'HIGH' END AS impact,
                     'p.G' || p_partkey
                       || CASE WHEN p_partkey % 7 = 0 THEN '='
                               WHEN p_partkey % 7 = 1 THEN '_splice'
                               ELSE 'D' END AS protein,
                     (['G', '-', 'GAA', 'A', 'C'])[p_partkey % 5 + 1] AS raw_ref,
                     CAST(p_partkey AS VARCHAR) AS start_pos,
                     CAST(p_partkey + p_partkey % 3 AS VARCHAR) AS stop_pos,
                     'T' || p_partkey AS transcript,
                     (['A', 'T', '-', 'TG'])[p_partkey % 4 + 1] AS raw_alt
              FROM part),
            kept AS (
              SELECT *,
                     CASE WHEN raw_ref = '-' THEN '' ELSE raw_ref END AS ref,
                     CASE WHEN raw_alt = '-' THEN '' ELSE raw_alt END AS alt
              FROM raw
              WHERE lower(impact) = 'high'
                AND clin_sig <> '' AND clin_sig NOT LIKE '%benign%'
                AND protein NOT LIKE '%=' AND protein NOT LIKE '%\\_splice' ESCAPE '\\')
            SELECT p_partkey, chromosome, protein,
                   chromosome || ':g.' ||
                   CASE
                     WHEN len(ref) = 1 AND len(alt) = 1 THEN start_pos || ref || '>' || alt
                     WHEN len(ref) > 0 AND len(alt) > 0
                       THEN start_pos || '_' || stop_pos || 'del' || ref || 'ins' || alt
                     WHEN len(ref) = 0 THEN start_pos || '_' || stop_pos || 'ins' || alt
                     ELSE start_pos || '_' || stop_pos || 'del' || ref
                   END AS genomic,
                   transcript || ':' || protein AS protein_notation,
                   'mutation hotspot' AS relevance,
                   array_to_string(
                     list_sort([transcript || ':' || protein, disease_id]), '|') AS conds
            FROM kept
        """,
        "oncokb_statements": """
            WITH raw AS (
              SELECT p_partkey,
                     lower(trim(p_type)) AS gene,
                     'V' || p_size AS variant,
                     (['1', '2A', 'R1', 'r2', 'X9'])[p_partkey % 5 + 1] AS level,
                     string_split(p_name, ' ')[1] || ', ' || p_brand AS drugs,
                     p_partkey || ',' || (p_partkey + 1) AS pmids,
                     CASE WHEN p_partkey % 2 = 0 THEN 'Abst ' || p_partkey || '; ' END
                       AS abstracts
              FROM part),
            rel AS (
              SELECT *,
                     CASE WHEN regexp_matches(lower(trim(level)), '^r[0-9]+$')
                            THEN 'resistance'
                          WHEN regexp_matches(lower(trim(level)), '^[0-9]+[a-z]?$')
                            THEN 'sensitivity' END AS relevance,
                     array_to_string(
                       list_filter(
                         list_transform(string_split(pmids, ','), x -> trim(x))
                         || list_transform(string_split(coalesce(abstracts, ''), ';'),
                                           x -> trim(x)),
                         x -> x <> ''), ';') AS support_str
              FROM raw)
            SELECT p_partkey, gene, variant, relevance,
                   lower(trim(u.drug)) AS drug,
                   support_str,
                   CASE WHEN relevance IS NULL
                        THEN 'did not recognize evidence level (' || level || ')' END
                     AS _error
            FROM rel, unnest(string_split(drugs, ',')) AS u(drug)
            WHERE len(lower(trim(u.drug))) > 0
        """,
        "docm_fix": """
            WITH src AS (
              SELECT p_partkey, p_partkey % 800 + 1 AS n,
                     CASE
                       WHEN p_partkey % 3 = 0 THEN 'p.KK' || (p_partkey % 800 + 1) || '-'
                       WHEN p_partkey % 3 = 1 THEN 'p.DI' || (p_partkey % 800 + 1) || 'VM'
                       ELSE 'p.G' || (p_partkey % 800 + 1) || 'D'
                     END AS variant
              FROM part)
            SELECT p_partkey, variant,
                   CASE
                     WHEN p_partkey % 3 = 0
                       THEN 'p.K' || n || '_K' || (n + 1) || 'delKK'
                     WHEN p_partkey % 3 = 1
                       THEN 'p.D' || n || '_I' || (n + 1) || 'delDIinsVM'
                     ELSE variant
                   END AS fixed
            FROM src
        """,
        "citation_phase_year": """
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 2 = 0
                        THEN CAST(o_orderkey AS VARCHAR) END AS abstract_number,
                   CASE WHEN o_orderkey % 2 = 0 THEN 'ASCO' END AS abstract_source,
                   CASE WHEN o_orderkey % 2 = 0 THEN 2014 END AS abstract_year,
                   CAST(o_orderkey % 3 + 1 AS VARCHAR) AS phase,
                   CAST(year(o_orderdate) AS INTEGER) AS pub_year
            FROM orders
        """,
        "relevance_translate": f"""
            WITH rel(evidence_type, direction, significance, relevance) AS (
              VALUES {', '.join(
                  '(' + ', '.join(repr(v) for v in row) + ')' for row in RELEVANCE_ROWS
              )}),
            src AS (
              SELECT o_orderkey,
                     ['PREDICTIVE', 'DIAGNOSTIC', 'PROGNOSTIC',
                      'FUNCTIONAL'][o_orderkey % 4 + 1] AS evidence_type,
                     CASE WHEN o_orderkey % 2 = 0 THEN 'SUPPORTS'
                          ELSE 'DOES_NOT_SUPPORT' END AS direction,
                     ['SENSITIVITYRESPONSE', 'RESISTANCE', 'POSITIVE', 'POOR_OUTCOME',
                      'GAIN_OF_FUNCTION'][o_orderkey % 5 + 1] AS significance
              FROM orders)
            SELECT s.o_orderkey, s.evidence_type, s.direction, s.significance, r.relevance
            FROM src s LEFT JOIN rel r
              ON r.evidence_type = s.evidence_type AND r.direction = s.direction
             AND r.significance = s.significance
        """,
        "set_ops": """
            SELECT o_custkey, 'union_except' AS op FROM (
              (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
               UNION
               SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH')
              EXCEPT
              SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
            UNION ALL
            SELECT o_custkey, 'intersect' AS op FROM (
              SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
              INTERSECT
              SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH')
        """,
        "therapy_grouping": """
            SELECT o_orderkey, t.g AS group_name, CAST(NULL AS VARCHAR) AS err
            FROM orders, unnest(
              CASE WHEN o_orderkey % 4 = 0 THEN ['tA', 'tB']
                   WHEN o_orderkey % 4 = 1 THEN ['tC']
                   WHEN o_orderkey % 4 = 2 THEN ['tA+tB']
                   ELSE [''] END) AS t(g)
        """,
        "string_normalizers": """
            WITH src AS (
              SELECT c_custkey,
                     '  Acute  ' || CASE WHEN c_custkey % 2 = 0 THEN 'Leukaemia'
                                         ELSE 'Tumour' END || '_Of Breast '
                       AS disease_raw,
                     'The <em>Title</em> No ' || (c_custkey % 50) || '.' AS title_raw,
                     CASE WHEN c_custkey % 3 = 0 THEN 'ABL1'
                          WHEN c_custkey % 3 = 1 THEN 'abl'
                          ELSE 'ERBB21' END AS gene_raw,
                     CASE WHEN c_custkey % 4 = 0 THEN 'None'
                          WHEN c_custkey % 4 = 1 THEN ' '
                          ELSE 'real' END AS nullish_raw
              FROM customer)
            SELECT c_custkey,
                   regexp_replace(lower(trim(disease_raw)), '\\s+', ' ', 'g')
                     AS norm_space,
                   regexp_replace(regexp_replace(
                     regexp_replace(lower(trim(regexp_replace(disease_raw, '_', ' ', 'g'))),
                                    '\\s+', ' ', 'g'),
                     'leukaemia', 'leukemia', 'g'), 'tumour', 'tumor', 'g')
                     AS disease_key,
                   regexp_replace(lower(trim(regexp_replace(title_raw, '</?em>', '', 'g'))),
                                  '\\.$', '') AS title_key,
                   regexp_replace(
                     regexp_replace(lower(trim(gene_raw)), '\\s+', ' ', 'g'),
                     '^([a-z]{3,})1$', '\\1') AS gene_key,
                   CASE WHEN trim(nullish_raw) IN ('None', '') THEN NULL
                        ELSE nullish_raw END AS nullish
            FROM src
        """,
        # replica of the compiled JSON-Schema predicates in document
        # order: meta.total maximum, meta.status pattern, tags[] pattern
        "spec_validation_nested": """
            WITH checks AS (
              SELECT o_orderkey,
                     list_filter([
                       CASE WHEN o_totalprice > 300000
                            THEN '#/meta/total: above maximum 300000' END,
                       CASE WHEN o_orderkey % 7 <> 0
                                  AND NOT regexp_matches(o_orderstatus, '^[OF]$')
                            THEN '#/meta/status: pattern ^[OF]$ unmatched' END,
                       CASE WHEN o_orderkey % 11 <> 5
                                  AND o_orderkey % 5 IN (3, 4)
                            THEN '#/tags[]: element pattern unmatched' END
                     ], x -> x IS NOT NULL) AS errs_list
              FROM orders)
            SELECT o_orderkey,
                   coalesce(array_to_string(errs_list, ';'), '') AS errs,
                   CAST(len(errs_list) AS INTEGER) AS n_errors
            FROM checks
        """,
        "spec_validation": """
            SELECT o_orderkey,
                   coalesce(array_to_string(list_filter([
                     CASE WHEN NOT coalesce(o_totalprice < 300000, FALSE)
                          THEN 'price-cap' END,
                     CASE WHEN NOT coalesce(o_orderpriority <> '1-URGENT', FALSE)
                          THEN 'not-urgent' END,
                     CASE WHEN NOT coalesce(o_orderdate IS NOT NULL, FALSE)
                          THEN 'date-present' END
                   ], x -> x IS NOT NULL), ';'), '') AS errs,
                   len(list_filter([
                     CASE WHEN NOT coalesce(o_totalprice < 300000, FALSE)
                          THEN 'price-cap' END,
                     CASE WHEN NOT coalesce(o_orderpriority <> '1-URGENT', FALSE)
                          THEN 'not-urgent' END,
                     CASE WHEN NOT coalesce(o_orderdate IS NOT NULL, FALSE)
                          THEN 'date-present' END
                   ], x -> x IS NOT NULL)) AS n_errors
            FROM orders
        """,
        "full_reload_diff": """
            WITH o AS (SELECT DISTINCT md5(CAST(o_orderkey AS VARCHAR)) AS rid
                       FROM orders WHERE o_orderkey % 3 <> 0),
            r AS (SELECT DISTINCT md5(CAST(o_orderkey AS VARCHAR)) AS rid
                  FROM orders WHERE o_orderkey % 5 <> 0)
            SELECT coalesce(o.rid, r.rid) AS rid,
                   CASE WHEN o.rid IS NOT NULL AND r.rid IS NOT NULL THEN 'keep'
                        WHEN o.rid IS NOT NULL THEN 'delete'
                        ELSE 'create' END AS action
            FROM o FULL OUTER JOIN r ON o.rid = r.rid
        """,
        "combo_naming": """
            SELECT l_orderkey,
                   list_aggregate(list_sort(list_distinct(
                       list(l_returnflag || l_linestatus))), 'string_agg', ' + ') AS combo
            FROM lineitem GROUP BY l_orderkey
        """,
        "rollup_recurrence": """
            SELECT l_returnflag, l_linestatus, count(DISTINCT l_suppkey) AS n_supp
            FROM lineitem
            GROUP BY ROLLUP(l_returnflag, l_linestatus)
            HAVING count(DISTINCT l_suppkey) >= 50
        """,
        "hgvs_parse": """
            WITH src AS (
              SELECT l_orderkey, l_linenumber,
                     l_linenumber % 7 AS b, l_partkey AS pk,
                     'p' || (l_partkey % 30 + 1) || '.' || (l_partkey % 9 + 1) AS cb1,
                     'p' || (l_partkey % 20 + 1) || '.' || (l_partkey % 7 + 1) AS cb2
              FROM lineitem),
            m AS (
              SELECT l_orderkey, l_linenumber,
                     CASE b
                       WHEN 0 THEN 'p.G' || (pk % 500 + 1) || 'D'
                       WHEN 1 THEN 'c.' || (pk % 900 + 1) || 'A>T'
                       WHEN 2 THEN 'e.' || (pk % 20 + 1) || 'del'
                       WHEN 3 THEN 'c.' || (pk % 900 + 1) || '+2A>G'
                       WHEN 4 THEN 'i.' || (pk % 30 + 1) || 'mut'
                       WHEN 5 THEN 'y.' || cb1 || '_' || cb2 || 'del'
                       ELSE 'p.(G' || (pk % 500 + 1) || '_G' || (pk % 500 + 2) || ')mut'
                     END AS notation,
                     CASE b WHEN 0 THEN 'p' WHEN 1 THEN 'c' WHEN 2 THEN 'e'
                            WHEN 3 THEN 'c' WHEN 4 THEN 'i' WHEN 5 THEN 'y'
                            ELSE 'p' END AS prefix,
                     CASE b WHEN 0 THEN 'missense' WHEN 1 THEN 'substitution'
                            WHEN 2 THEN 'deletion' WHEN 3 THEN 'substitution'
                            WHEN 4 THEN 'mutation' WHEN 5 THEN 'deletion'
                            ELSE 'mutation' END AS variant_type,
                     CASE b WHEN 0 THEN pk % 500 + 1 WHEN 1 THEN pk % 900 + 1
                            WHEN 2 THEN pk % 20 + 1 WHEN 3 THEN pk % 900 + 1
                            WHEN 4 THEN pk % 30 + 1 WHEN 5 THEN NULL
                            ELSE pk % 500 + 1 END AS break1_start,
                     CASE b WHEN 3 THEN (pk % 900 + 1) || '+2'
                            WHEN 5 THEN cb1
                            ELSE CAST(
                              CASE b WHEN 0 THEN pk % 500 + 1
                                     WHEN 1 THEN pk % 900 + 1
                                     WHEN 2 THEN pk % 20 + 1
                                     WHEN 4 THEN pk % 30 + 1
                                     ELSE pk % 500 + 1 END AS VARCHAR)
                     END AS break1_repr,
                     CASE b WHEN 5 THEN cb2
                            WHEN 6 THEN CAST(pk % 500 + 2 AS VARCHAR) END AS break2_repr,
                     CASE b WHEN 6 THEN 1 END AS uncertain
              FROM src)
            SELECT l_orderkey, l_linenumber, notation, prefix, variant_type,
                   CAST(break1_start AS INTEGER) AS break1_start,
                   break1_repr, break2_repr, CAST(uncertain AS INTEGER) AS uncertain
            FROM m
        """,
        "explode_expansion": """
            SELECT t.type_word, count(*) AS n
            FROM part p, unnest(string_split(p.p_type, ' ')) AS t(type_word)
            GROUP BY t.type_word
        """,
        "cross_expansion": """
            SELECT p.p_partkey, t.type_word, v.variant
            FROM part p,
                 unnest(string_split(p.p_type, ' ')) AS t(type_word),
                 unnest(['A', 'B']) AS v(variant)
            WHERE p.p_partkey <= 200
        """,
        "dnf_expansion": """
            WITH src AS (
              SELECT o_orderkey,
                     'v' || (o_orderkey % 7) || ' AND (v' || (o_orderkey % 5) ||
                     ' OR v' || (o_orderkey % 3) || ')' AS expr,
                     'v' || (o_orderkey % 7) AS a,
                     'v' || (o_orderkey % 5) AS b,
                     'v' || (o_orderkey % 3) AS c
              FROM orders WHERE o_orderkey <= 2000),
            expanded AS (
              SELECT o_orderkey, expr,
                     list_aggregate(list_sort(list_distinct([a, b])), 'string_agg', '+')
                       AS conj1,
                     list_aggregate(list_sort(list_distinct([a, c])), 'string_agg', '+')
                       AS conj2
              FROM src)
            SELECT o_orderkey, expr, unnest([conj1, conj2]) AS conditions
            FROM expanded
        """,
        "ngram_jaccard": r"""
            WITH words AS (
              SELECT doc_id,
                     list_filter(string_split(
                       regexp_replace(lower(trim(text)), '[^a-z0-9 ]', ' ', 'g'),
                       ' '), w -> w <> '') AS w
              FROM documents),
            sh AS (
              SELECT doc_id,
                     CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                          ELSE list_distinct([array_to_string(w[i:i+2], ' ')
                                              for i in generate_series(1, len(w) - 2)])
                     END AS s
              FROM words)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                         / len(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                  / len(list_distinct(list_concat(a.s, b.s))) >= 0.8
        """,
        "dedup_exact": """
            SELECT min(doc_id) AS doc_id, count(*) AS n_copies
            FROM documents GROUP BY md5(text)
        """,
        "embedding_quantize": """
            WITH v AS (
              SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xs
              FROM embeddings),
            s AS (
              SELECT vec_id, xs,
                     greatest(list_max(list_transform(xs, x -> abs(x))), 1e-12)
                       / 127.0 AS scale
              FROM v),
            q AS (
              SELECT vec_id, xs, scale,
                     list_transform(xs, x -> CAST(round(x / scale) AS INT)) AS qv
              FROM s)
            SELECT vec_id,
                   round(scale, 6) AS qscale,
                   CAST(list_sum(list_transform(qv, x -> CAST(x AS BIGINT) * x)) AS BIGINT) AS qnorm,
                   round(list_max(list_transform(list_zip(xs, qv),
                     p -> abs(p[1] - p[2] * scale))), 6) AS recon_err
            FROM q
        """,
        "stratified_sample": """
            WITH sampled AS (
              SELECT doc_id, lang, source, n_chars
              FROM documents
              WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
                    < CASE lang WHEN 'en' THEN 25 WHEN 'de' THEN 50
                                WHEN 'es' THEN 50 WHEN 'fr' THEN 50 ELSE 100 END),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY lang, source
                                           ORDER BY n_chars DESC, doc_id ASC) AS rn
              FROM sampled)
            SELECT doc_id, lang, source, n_chars FROM ranked WHERE rn <= 3
        """,
        "bm25_scores": r"""
            WITH w AS (
              SELECT doc_id,
                     list_filter(string_split(
                       regexp_replace(lower(trim(text)), '[^a-z0-9 ]', ' ', 'g'),
                       ' '), x -> x <> '') AS w
              FROM documents),
            stats AS (SELECT count(*) AS N, avg(len(w)) AS avgdl FROM w),
            tf AS (
              SELECT doc_id, t, count(*) AS tf, max(len(w)) AS dl
              FROM w, unnest(w.w) AS u(t)
              WHERE t IN ('spark', 'merge', 'stream')
              GROUP BY doc_id, t),
            dfq AS (SELECT t, count(*) AS df_ FROM tf GROUP BY t)
            SELECT doc_id,
                   round(sum(
                     ln(1 + (N - df_ + 0.5) / (df_ + 0.5))
                     * tf * 2.2
                     / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
                   ), 4) AS bm25
            FROM tf JOIN dfq USING (t) CROSS JOIN stats
            GROUP BY doc_id
        """,
        # transitive closure of the near-dup pair graph via recursive
        # CTE; component label = min reachable doc_id (matches the
        # min-label-propagation fixpoint exactly)
        # CC labels (recursive CTE) + per-cluster argmax & size.
        "canonical_docs": r"""
            WITH RECURSIVE words AS (
              SELECT doc_id,
                     list_filter(string_split(
                       regexp_replace(lower(trim(text)), '[^a-z0-9 ]', ' ', 'g'),
                       ' '), w -> w <> '') AS w
              FROM documents),
            sh AS (
              SELECT doc_id,
                     CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                          ELSE list_distinct([array_to_string(w[i:i+2], ' ')
                                              for i in generate_series(1, len(w) - 2)])
                     END AS s
              FROM words),
            prs AS (
              SELECT a.doc_id AS u, b.doc_id AS v
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                    / len(list_distinct(list_concat(a.s, b.s))) >= 0.8),
            edges AS (
              SELECT u, v FROM prs UNION ALL SELECT v, u FROM prs),
            reach(n, lab) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT r.n, e.v FROM reach r JOIN edges e ON e.u = r.lab),
            comp AS (SELECT n AS doc_id, min(lab) AS comp FROM reach GROUP BY n),
            lab AS (
              SELECT c.comp, d.doc_id, d.n_chars,
                     row_number() OVER (PARTITION BY c.comp
                       ORDER BY d.n_chars DESC, d.doc_id ASC) AS rn,
                     CAST(count(*) OVER (PARTITION BY c.comp) AS BIGINT)
                       AS cluster_size
              FROM comp c JOIN documents d ON d.doc_id = c.doc_id)
            SELECT comp, doc_id, n_chars, cluster_size FROM lab WHERE rn = 1
        """,
        "dedup_components": r"""
            WITH RECURSIVE words AS (
              SELECT doc_id,
                     list_filter(string_split(
                       regexp_replace(lower(trim(text)), '[^a-z0-9 ]', ' ', 'g'),
                       ' '), w -> w <> '') AS w
              FROM documents),
            sh AS (
              SELECT doc_id,
                     CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                          ELSE list_distinct([array_to_string(w[i:i+2], ' ')
                                              for i in generate_series(1, len(w) - 2)])
                     END AS s
              FROM words),
            pairs AS (
              SELECT a.doc_id AS u, b.doc_id AS v
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                    / len(list_distinct(list_concat(a.s, b.s))) >= 0.8),
            edges AS (
              SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs),
            reach(n, lab) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT r.n, e.v FROM reach r JOIN edges e ON e.u = r.lab)
            SELECT n AS node, min(lab) AS comp FROM reach GROUP BY n
        """,
        "dedup_fillscore": """
            WITH ranked AS (
              SELECT lang, source, doc_id, n_chars,
                     row_number() OVER (PARTITION BY lang, source
                                        ORDER BY n_chars DESC, doc_id ASC) AS rn
              FROM documents)
            SELECT lang, source, doc_id, n_chars FROM ranked WHERE rn = 1
        """,
        "lang_id": f"""
            WITH scored AS (
              SELECT doc_id, lang,
                     {lang_hits['de']} AS h_de,
                     {lang_hits['en']} AS h_en,
                     {lang_hits['es']} AS h_es,
                     {lang_hits['fr']} AS h_fr
              FROM documents)
            SELECT doc_id, lang,
                   CASE WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr AND h_de >= 1
                          THEN 'de'
                        WHEN h_en >= h_es AND h_en >= h_fr AND h_en >= 1 THEN 'en'
                        WHEN h_es >= h_fr AND h_es >= 1 THEN 'es'
                        WHEN h_fr >= 1 THEN 'fr'
                        ELSE 'und' END AS pred_lang
            FROM scored
        """,
        "token_count": """
            SELECT doc_id,
                   len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
                     AS ws_tokens,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
                     AS regex_tokens
            FROM documents
        """,
        "quality_score": f"""
            WITH feats AS (
              SELECT doc_id,
                     length(text) AS q_chars,
                     len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
                       AS q_words,
                     len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS n_punct,
                     len(list_filter(list_filter(string_split(lower(text), ' '),
                                                 x -> x <> ''),
                                     x -> list_contains([{en}], x))) AS n_stop
              FROM documents)
            SELECT doc_id, q_chars, q_words,
                   round(CASE WHEN q_chars > 0
                              THEN n_punct / CAST(q_chars AS DOUBLE) ELSE 0 END, 6)
                     AS q_punct_ratio,
                   round(CASE WHEN q_words > 0
                              THEN n_stop / CAST(q_words AS DOUBLE) ELSE 0 END, 6)
                     AS q_stop_ratio,
                   round(least(q_words / 100.0, 1.0) * 0.4
                         + greatest(0.0, 1.0 - (CASE WHEN q_chars > 0
                              THEN n_punct / CAST(q_chars AS DOUBLE) ELSE 0 END) * 5) * 0.3
                         + least((CASE WHEN q_words > 0
                              THEN n_stop / CAST(q_words AS DOUBLE) ELSE 0 END) * 5,
                              1.0) * 0.3, 6) AS q_score
            FROM feats
        """,
        "multimodal_features": """
            WITH hx AS (
              SELECT doc_id AS media_id,
                     CASE WHEN doc_id % 3 = 0 THEN 'image'
                          WHEN doc_id % 3 = 1 THEN 'audio'
                          ELSE 'video' END AS kind,
                     octet_length(CAST(text AS BLOB)) AS n_bytes,
                     sha256(text) AS digest
              FROM documents),
            b AS (
              SELECT *,
                     (instr('0123456789abcdef', substr(digest, 1, 1)) - 1) * 16
                       + (instr('0123456789abcdef', substr(digest, 2, 1)) - 1) AS d0,
                     (instr('0123456789abcdef', substr(digest, 3, 1)) - 1) * 16
                       + (instr('0123456789abcdef', substr(digest, 4, 1)) - 1) AS d1,
                     (instr('0123456789abcdef', substr(digest, 5, 1)) - 1) * 16
                       + (instr('0123456789abcdef', substr(digest, 6, 1)) - 1) AS d2
              FROM hx)
            SELECT media_id, kind, CAST(n_bytes AS INT) AS n_bytes, digest,
                   CASE WHEN kind = 'image' THEN CAST(64 + d0 % 192 AS INT) END AS width,
                   CASE WHEN kind = 'image' THEN CAST(64 + d1 % 192 AS INT) END AS height,
                   CASE WHEN kind = 'audio' THEN round(0.5 + d2 / 16.0, 4) END
                     AS duration_s,
                   kind = 'video' AS has_error
            FROM b
        """,
        # resize contract: images -> max(1, (224*224) div 256) = 196
        # stub bytes at the target dims; other kinds pass through.
        "multimodal_resize": """
            SELECT doc_id AS media_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'image'
                        WHEN doc_id % 3 = 1 THEN 'audio'
                        ELSE 'video' END AS kind,
                   CAST(CASE WHEN doc_id % 3 = 0 THEN 196
                             ELSE octet_length(CAST(text AS BLOB)) END AS INT)
                     AS out_bytes,
                   CASE WHEN doc_id % 3 = 0 THEN CAST(224 AS INT) END AS width,
                   CASE WHEN doc_id % 3 = 0 THEN CAST(224 AS INT) END AS height,
                   FALSE AS has_error
            FROM documents
        """,
        "sessionize": """
            WITH gaps AS (
              SELECT event_id, user_id,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR CAST(floor(epoch(ts)) AS BIGINT)
                               - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
                          THEN 1 ELSE 0 END AS is_new,
                     ts
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
            SELECT event_id, user_id,
                   CAST(sum(is_new) OVER (PARTITION BY user_id
                                          ORDER BY ts ASC, event_id ASC
                                          ROWS UNBOUNDED PRECEDING) AS BIGINT)
                     AS session_id
            FROM gaps
        """,
        # Streaming sessionize closed-session set: sessionize with the
        # streaming operator's MICROSECOND gap math, group to sessions,
        # keep non-final sessions (in-data close) plus final sessions
        # the event-time timeout fired for. Spark fires a timeout when
        # the ms-truncated watermark (max event time ms - delay) moves
        # strictly past the ms-truncated timeout timestamp (end + gap).
        "streaming_sessions": """
            WITH gaps AS (
              SELECT user_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                          THEN 1 ELSE 0 END AS is_new
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
            numbered AS (
              SELECT user_id, ts,
                     CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC
                                            ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS sid
              FROM gaps),
            sess AS (
              SELECT user_id, sid,
                     min(ts) AS session_start, max(ts) AS session_end,
                     count(*) AS n_events,
                     max(sid) OVER (PARTITION BY user_id) AS last_sid
              FROM numbered GROUP BY user_id, sid),
            m AS (SELECT max(ts) AS mx FROM events)
            SELECT user_id,
                   strftime(session_start, '%Y-%m-%d %H:%M:%S') AS session_start,
                   strftime(session_end, '%Y-%m-%d %H:%M:%S') AS session_end,
                   n_events
            FROM sess, m
            WHERE sid < last_sid
               OR (epoch_us(mx) // 1000) - 1800000
                  > (epoch_us(session_end) + 1800000000) // 1000
        """,
        # Native session_window semantics: break at gap > 30 min
        # (two events exactly gap apart MERGE — the window boundary is
        # closed, verified by test_split_rebalance.py), emit iff
        # end + 2*gap <= max(ts) (append mode waits for the watermark
        # to pass the session end; final watermark = max(ts) - gap).
        "streaming_sessions_native": """
            WITH gaps AS (
              SELECT user_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                               > 1800000000
                          THEN 1 ELSE 0 END AS is_new
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)),
            numbered AS (
              SELECT user_id, ts,
                     CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC
                                            ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS sid
              FROM gaps),
            sess AS (
              SELECT user_id,
                     min(ts) AS session_start, max(ts) AS session_end,
                     count(*) AS n_events
              FROM numbered GROUP BY user_id, sid),
            m AS (SELECT max(ts) AS mx FROM events)
            SELECT user_id,
                   strftime(session_start, '%Y-%m-%d %H:%M:%S') AS session_start,
                   strftime(session_end, '%Y-%m-%d %H:%M:%S') AS session_end,
                   n_events
            FROM sess, m
            WHERE epoch_us(session_end) + 3600000000 <= epoch_us(mx)
        """,
        "split_assign": """
            SELECT doc_id,
                   CASE WHEN b < 980 THEN 'train'
                        WHEN b < 990 THEN 'val'
                        ELSE 'test' END AS split
            FROM (
              SELECT doc_id,
                     ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)),
                                     1, 8))::BIGINT % 1000 AS b
              FROM documents)
        """,
        # priority = weight / u with u an md5-derived 31-bit uniform;
        # one IEEE division is correctly rounded, so the top-n set is
        # bit-identical to the Spark side.
        "priority_sample": """
            SELECT doc_id, n_chars FROM (
              SELECT doc_id, n_chars,
                     CAST(n_chars AS DOUBLE) /
                       (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                          ::BIGINT % 2147483648 + 1) AS pri
              FROM documents)
            ORDER BY pri DESC, doc_id ASC LIMIT 100
        """,
        "domain_rebalance": """
            WITH c AS (
              SELECT event_type, count(*) AS n FROM events GROUP BY event_type)
            SELECT e.event_type, count(*) AS n_kept
            FROM events e JOIN c USING (event_type)
            WHERE c.n <= 1000
               OR (('0x' || substr(md5(CAST(e.event_id AS VARCHAR)), 1, 8))
                     ::BIGINT / 4294967296.0) * c.n < 1000
            GROUP BY e.event_type
        """,
        "windowed_counts": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
                   event_type, count(*) AS n, round(sum(value), 4) AS total_value
            FROM events GROUP BY 1, 2
        """,
        "graph_neighbors": """
            SELECT 'R0' AS rid, 0 AS hop
            UNION ALL
            SELECT 'N' || n_nationkey, 1 FROM nation WHERE n_regionkey = 0
            UNION ALL
            SELECT 'C' || c_custkey, 2 FROM customer c
            WHERE EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey
                          AND n.n_regionkey = 0)
        """,
        "asof_join": """
            WITH l AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'click'),
                 r AS (SELECT user_id, ts, event_id, value FROM events
                       WHERE event_type = 'purchase')
            SELECT l.event_id, l.user_id,
                   r.ts AS asof_time,
                   r.event_id AS asof_event_id,
                   round(r.value, 6) AS asof_value
            FROM l ASOF LEFT JOIN r
              ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        "range_join": """
            SELECT c.c_nationkey AS nationkey, c.c_custkey, s.s_suppkey,
                   round(greatest(least(c.c_acctbal + 500, s.s_acctbal + 500)
                                  - greatest(c.c_acctbal, s.s_acctbal), 0), 6)
                       AS overlap
            FROM customer c JOIN supplier s
              ON c.c_nationkey = s.s_nationkey
             AND c.c_acctbal <= s.s_acctbal + 500
             AND s.s_acctbal <= c.c_acctbal + 500
        """,
        "approx_distinct": """
            SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_distinct,
                   TRUE AS hll_ok
            FROM lineitem GROUP BY l_returnflag
        """,
        "approx_quantiles": """
            SELECT event_type,
                   round(quantile_cont(value, 0.5), 6) AS exact_p5,
                   TRUE AS ok_p5,
                   round(quantile_cont(value, 0.95), 6) AS exact_p95,
                   TRUE AS ok_p95
            FROM events GROUP BY event_type
        """,
        # cosine_topk with the cross-label constraint.
        "hard_negatives": """
            WITH q AS (SELECT vec_id AS query_id, label AS query_label,
                              CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id < 5),
            scored AS (
              SELECT q.query_id, q.query_label, e.vec_id AS neighbor_id,
                     e.label AS neighbor_label,
                     list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS sim
              FROM embeddings e, q
              WHERE e.vec_id <> q.query_id AND e.label <> q.query_label),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY sim DESC, neighbor_id ASC) AS rank
              FROM scored)
            SELECT query_id, query_label, neighbor_id, neighbor_label,
                   round(sim, 4) AS cos_sim, rank
            FROM ranked WHERE rank <= 5
        """,
        # Decimal-exact per-dimension moments (summation-order-proof).
        "embedding_dim_stats": """
            WITH x AS (
              SELECT i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS x
              FROM embeddings, generate_series(1, 64) g(i)),
            st AS (
              SELECT dim,
                     CAST(sum(CAST(x AS DECIMAL(38,10))) AS DOUBLE)
                       / count(*) AS mu,
                     CAST(sum(CAST(x * x AS DECIMAL(38,10))) AS DOUBLE)
                       / count(*) AS ex2,
                     round(min(x), 6) AS min, round(max(x), 6) AS max
              FROM x GROUP BY dim)
            SELECT CAST(dim AS INT) AS dim, round(mu, 6) AS mean,
                   round(sqrt(ex2 - mu * mu), 6) AS std, min, max
            FROM st
        """,
        "embedding_topk": """
            WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id < 5),
            scored AS (
              SELECT q.query_id, e.vec_id AS neighbor_id,
                     list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS sim
              FROM embeddings e, q WHERE e.vec_id <> q.query_id),
            ranked AS (
              SELECT query_id, neighbor_id, sim,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY sim DESC, neighbor_id ASC) AS rank
              FROM scored)
            SELECT query_id, neighbor_id, round(sim, 4) AS cos_sim, rank
            FROM ranked WHERE rank <= 5
        """,
        # Full replication of the seeded-md5 MinHash+LSH pipeline:
        # signatures, banding, candidate join, exact-Jaccard verify —
        # proves banding soundness, not just the verified pairs.
        # One md5 digest per shingle folded to 60 bits mod 2^31-1, then
        # the 32 affine family minima (a_i*h + b_i mod p) — identical
        # integers to md5_shingle_hashes + the affine MinHash family.
        # Exact integer Gram over the identical int8 quantization.
        "gram_matrix": """
            WITH v AS (
              SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xs
              FROM embeddings),
            sc AS (
              SELECT vec_id, xs,
                     greatest(list_max(list_transform(xs, x -> abs(x))), 1e-12)
                       / 127.0 AS scale
              FROM v),
            q AS (
              SELECT vec_id,
                     list_transform(xs, x -> CAST(round(x / scale) AS BIGINT)) AS qv
              FROM sc),
            ij AS (
              SELECT a.i AS i, b.j AS j
              FROM generate_series(0, 63) a(i), generate_series(0, 63) b(j)
              WHERE a.i <= b.j)
            SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
                   CAST(sum(qv[i + 1] * qv[j + 1]) AS BIGINT) AS s
            FROM q, ij GROUP BY i, j
        """,
        # Weighted fair queueing order: md5 per-source rank / weight.
        "mixture_interleave": """
            WITH r AS (
              SELECT doc_id, source,
                     row_number() OVER (PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS r
              FROM documents),
            v AS (
              SELECT doc_id, source,
                     round(r / CASE WHEN source IN ('src0', 'src1')
                                    THEN 4.0 ELSE 1.0 END, 6) AS vtime
              FROM r),
            o AS (
              SELECT doc_id, source, vtime,
                     CAST(row_number() OVER (ORDER BY vtime ASC, source ASC,
                                             doc_id ASC) AS INT) AS position
              FROM v)
            SELECT position, doc_id, source, vtime FROM o WHERE position <= 200
        """,
        # SCD2: lag change-detect then lead validity; tie-break on the
        # attribute keeps the order total.
        "scd2": """
            WITH chg AS (
              SELECT user_id, event_type, ts,
                     lag(ts) OVER w IS NULL
                       OR event_type IS DISTINCT FROM lag(event_type) OVER w
                       AS keep
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_type ASC)),
            log AS (SELECT user_id, event_type, ts FROM chg WHERE keep)
            SELECT user_id, event_type,
                   strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
                   strftime(lead(ts) OVER w2, '%Y-%m-%d %H:%M:%S') AS valid_to,
                   lead(ts) OVER w2 IS NULL AS is_current
            FROM log
            WINDOW w2 AS (PARTITION BY user_id ORDER BY ts ASC, event_type ASC)
        """,
        # KMV sketch: md5-uniform hashes, k smallest distinct per
        # group, (k-1)/u_k — bit-identical across engines.
        "kmv_distinct": """
            WITH h AS (
              SELECT DISTINCT event_type,
                     ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                       / 4294967296.0 AS u
              FROM events),
            rk AS (
              SELECT event_type, u,
                     row_number() OVER (PARTITION BY event_type ORDER BY u ASC) AS r
              FROM h)
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_kept,
                   round(CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                              ELSE 63.0 / greatest(max(u), 1e-12) END, 4) AS est_distinct
            FROM rk WHERE r <= 64 GROUP BY event_type
        """,
        "kmv_distinct_merged": """
            WITH h AS (
              SELECT DISTINCT event_type,
                     ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                       / 4294967296.0 AS u
              FROM events),
            rk AS (
              SELECT event_type, u,
                     row_number() OVER (PARTITION BY event_type ORDER BY u ASC) AS r
              FROM h)
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_kept,
                   round(CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                              ELSE 63.0 / greatest(max(u), 1e-12) END, 4) AS est_distinct
            FROM rk WHERE r <= 64 GROUP BY event_type
        """,
        # Degree-ordered wedge enumeration; every triangle credited to
        # its three corners exactly once.
        "triangle_count": """
            WITH e0 AS (
              SELECT DISTINCT
                     least(l_orderkey % 20000, (l_partkey * 3) % 20000) AS u,
                     greatest(l_orderkey % 20000, (l_partkey * 3) % 20000) AS v
              FROM lineitem
              WHERE l_orderkey % 20000 <> (l_partkey * 3) % 20000),
            w AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
                  FROM e0 e1 JOIN e0 e2 ON e1.v = e2.u),
            t AS (SELECT a, b, c FROM w JOIN e0 e3 ON e3.u = w.a AND e3.v = w.c),
            x AS (SELECT unnest([a, b, c]) AS node FROM t)
            SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
            FROM x GROUP BY node
        """,
        # Cross-corpus near-dup flag: corpus (outside src0-4) banded
        # against the reference (src0-4); verify on hashed shingle sets.
        "dedup_against": f"""
            WITH {_mh_side_ctes("c_", "WHERE source NOT IN ('src0','src1','src2','src3','src4')").lstrip()},
            {_mh_side_ctes("r_", "WHERE source IN ('src0','src1','src2','src3','src4')").lstrip()},
            cand AS (
              SELECT DISTINCT c.doc_id AS id, r.doc_id AS rid
              FROM c_bands c JOIN r_bands r ON c.b = r.b AND c.bhash = r.bhash),
            ver AS (
              SELECT id, rid,
                     CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)
                       / len(list_distinct(list_concat(a.hs, b.hs))) AS j
              FROM cand JOIN c_hset a ON a.doc_id = id
                        JOIN r_hset b ON b.doc_id = rid)
            SELECT id AS doc_id,
                   CAST(count(*) AS BIGINT) AS n_ref_matches,
                   round(max(j), 4) AS best_jaccard
            FROM ver WHERE j >= 0.6 GROUP BY id
        """,
        # Leakage audit: minhash near-dup pairs straddling the 50/50
        # md5 split (split is a pure function of the id, no join).
        "split_leakage": f"""
            WITH {_mh_side_ctes("", "").lstrip()},
            cand AS (
              SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
              FROM bands x JOIN bands y
                ON x.b = y.b AND x.bhash = y.bhash AND x.doc_id < y.doc_id),
            jac AS (
              SELECT id_a, id_b,
                     CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)
                       / len(list_distinct(list_concat(a.hs, b.hs))) AS j
              FROM cand JOIN hset a ON a.doc_id = id_a
                        JOIN hset b ON b.doc_id = id_b),
            sp AS (
              SELECT id_a, id_b, round(j, 4) AS jaccard,
                     CASE WHEN ('0x' || substr(md5('split:' || CAST(id_a AS VARCHAR)),
                                1, 8))::BIGINT % 2 < 1 THEN 'train' ELSE 'val' END AS split_a,
                     CASE WHEN ('0x' || substr(md5('split:' || CAST(id_b AS VARCHAR)),
                                1, 8))::BIGINT % 2 < 1 THEN 'train' ELSE 'val' END AS split_b
              FROM jac WHERE j >= 0.6)
            SELECT * FROM sp WHERE split_a <> split_b
        """,
        # CCNet boilerplate: injected per-source 8-word banner must be
        # stripped (docs_with >= 2 AND > half the source's docs).
        "boilerplate_strip": """
            WITH docs AS (
              SELECT doc_id, source,
                     'visit ' || source || ' home page for great content today '
                       || text AS text
              FROM documents),
            base AS (
              SELECT doc_id, source, string_split(text, ' ') AS w
              FROM docs WHERE length(text) > 0),
            b2 AS (
              SELECT doc_id, source, w, ((len(w) - 1) // 8) + 1 AS n_seg FROM base),
            segs AS (
              SELECT doc_id, source, w, unnest(range(0, n_seg)) AS seg_idx FROM b2),
            st AS (
              SELECT doc_id, source, seg_idx,
                     array_to_string(
                       w[CAST(seg_idx * 8 + 1 AS INT):CAST(seg_idx * 8 + 8 AS INT)],
                       ' ') AS seg_text
              FROM segs),
            srcd AS (SELECT source, count(*) AS src_docs FROM docs GROUP BY source),
            dfc AS (SELECT source, seg_text, count(DISTINCT doc_id) AS docs_with
                    FROM st GROUP BY 1, 2),
            boiler AS (
              SELECT d.source, d.seg_text, TRUE AS is_boiler
              FROM dfc d JOIN srcd s ON s.source = d.source
              WHERE docs_with >= 2 AND docs_with > 0.5 * src_docs)
            SELECT st.doc_id, st.source,
                   CAST(count(*) AS BIGINT) AS n_segments,
                   CAST(coalesce(sum(CASE WHEN is_boiler IS NULL THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS kept_segments,
                   coalesce(string_agg(CASE WHEN is_boiler IS NULL THEN st.seg_text END,
                                       ' ' ORDER BY seg_idx), '') AS clean_text
            FROM st LEFT JOIN boiler b
              ON b.source = st.source AND b.seg_text = st.seg_text
            GROUP BY st.doc_id, st.source
        """,
        # Church-Hanks PMI over adjacent bigrams, top-40 by
        # (pmi desc, w1, w2) with min count 5.
        "pmi_collocations": """
            WITH w AS (
              SELECT string_split(text, ' ') AS w
              FROM documents WHERE length(text) > 0),
            b AS (
              SELECT unnest([{'w1': w[i], 'w2': w[i+1]}
                             for i in generate_series(1, len(w) - 1)]) AS s
              FROM w WHERE len(w) >= 2),
            big AS (SELECT s.w1 AS w1, s.w2 AS w2, count(*) AS n FROM b GROUP BY 1, 2),
            u AS (SELECT tok, count(*) AS n_tok
                  FROM (SELECT unnest(w) AS tok FROM w) GROUP BY tok),
            tu AS (SELECT sum(n_tok) AS t_uni FROM u),
            tb AS (SELECT sum(n) AS t_big FROM big)
            SELECT w1, w2, n,
                   round(log2((CAST(n AS DOUBLE) / t_big)
                              / ((CAST(a.n_tok AS DOUBLE) / t_uni)
                                 * (CAST(c.n_tok AS DOUBLE) / t_uni))), 6) AS pmi
            FROM big JOIN u a ON a.tok = big.w1
                     JOIN u c ON c.tok = big.w2, tu, tb
            WHERE n >= 5
            ORDER BY pmi DESC, w1, w2 LIMIT 40
        """,
        # Gopher rule flags: every signal is list algebra over the
        # single-space word split; flags compare the ROUNDED values.
        "gopher_quality": """
            WITH w AS (
              SELECT doc_id, string_split(text, ' ') AS w
              FROM documents WHERE length(text) > 0),
            c AS (
              SELECT doc_id,
                     CAST(len(w) AS BIGINT) AS n_words,
                     round(CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE)
                           / len(w), 6) AS mean_word_len,
                     round(1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 6)
                       AS dup_frac,
                     CAST(len(list_filter(w,
                             x -> list_contains(['a','the','and','of','to','in'], x)))
                          AS BIGINT) AS n_stop,
                     round(CAST(len(list_filter(w,
                             x -> list_contains(['a','the','and','of','to','in'], x)))
                           AS DOUBLE) / len(w), 6) AS stop_frac
              FROM w)
            SELECT doc_id, n_words, mean_word_len, dup_frac, stop_frac,
                   (n_words >= 20 AND n_words <= 100000) AS ok_words,
                   (mean_word_len >= 3.0 AND mean_word_len <= 7.0) AS ok_word_len,
                   (dup_frac <= 0.65) AS ok_dup,
                   (n_stop >= 2) AS ok_stop,
                   ((n_words >= 20 AND n_words <= 100000)
                    AND (mean_word_len >= 3.0 AND mean_word_len <= 7.0)
                    AND dup_frac <= 0.65 AND n_stop >= 2) AS passes
            FROM c
        """,
        # Per-group winsorization at p05/p95 (quantile_cont ==
        # Spark percentile; parity pinned by grouped_percentiles).
        "winsorize": """
            WITH stats AS (
              SELECT event_type,
                     quantile_cont(value, 0.05) AS lo,
                     quantile_cont(value, 0.95) AS hi
              FROM events GROUP BY event_type)
            SELECT event_id, e.event_type,
                   round(least(greatest(value, lo), hi), 6) AS value_w,
                   (value < lo) AS clipped_low,
                   (value > hi) AS clipped_high
            FROM events e JOIN stats s ON s.event_type = e.event_type
        """,
        "minhash_lsh": rf"""
            WITH words AS (
              SELECT doc_id,
                     list_filter(string_split(
                       regexp_replace(lower(trim(text)), '[^a-z0-9 ]', ' ', 'g'),
                       ' '), w -> w <> '') AS w
              FROM documents),
            sh AS (
              SELECT doc_id,
                     CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                          ELSE list_distinct([array_to_string(w[i:i+2], ' ')
                                              for i in generate_series(1, len(w) - 2)])
                     END AS s
              FROM words),
            ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
            hx AS (
              SELECT doc_id,
                     ('0x' || substr(md5(shingle), 1, 15))::BIGINT % 2147483647 AS h
              FROM ex),
            params(i, a, b) AS (VALUES {', '.join(f'({i}, {a}, {b})' for i, (a, b) in enumerate(_mh_params(32)))}),
            mh AS (
              SELECT doc_id, i, min((a * h + b) % 2147483647) AS m
              FROM hx, params
              GROUP BY doc_id, i),
            sig AS (SELECT doc_id, list(m ORDER BY i) AS sig FROM mh GROUP BY doc_id),
            bands AS (
              SELECT doc_id, b,
                     md5(array_to_string(list_slice(sig, b*2 + 1, b*2 + 2), ',')) AS bhash
              FROM sig, generate_series(0, 15) g(b)),
            cand AS (
              SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
              FROM bands x JOIN bands y
                ON x.b = y.b AND x.bhash = y.bhash AND x.doc_id < y.doc_id),
            hset AS (
              SELECT doc_id, list_distinct(list(h)) AS hs FROM hx GROUP BY doc_id),
            jac AS (
              SELECT id_a, id_b,
                     CAST(len(list_intersect(a.hs, b.hs)) AS DOUBLE)
                       / len(list_distinct(list_concat(a.hs, b.hs))) AS j
              FROM cand JOIN hset a ON a.doc_id = id_a JOIN hset b ON b.doc_id = id_b)
            SELECT id_a, id_b, round(j, 4) AS jaccard FROM jac WHERE j >= 0.6
        """,
        # Identical md5-hex bit-vote SimHash signature + chunk blocking.
        "simhash": r"""
            WITH words AS (
              SELECT doc_id,
                     list_filter(string_split(
                       regexp_replace(lower(trim(text)), '[^a-z0-9 ]', ' ', 'g'),
                       ' '), w -> w <> '') AS w
              FROM documents),
            tok AS (SELECT doc_id, unnest(w) AS t FROM words),
            toks AS (SELECT doc_id, md5(t) AS hx FROM tok),
            votes AS (
              SELECT doc_id, j,
                     SUM(CASE WHEN CAST(floor((instr('0123456789abcdef',
                                substr(hx, CAST(floor(j/4) AS INT) + 1, 1)) - 1)
                                / pow(2, 3 - (j % 4))) AS INT) % 2 = 1
                              THEN 1 ELSE -1 END) AS v
              FROM toks, generate_series(0, 63) g(j)
              GROUP BY doc_id, j),
            chunks AS (
              SELECT doc_id, CAST(floor(j/16) AS INT) AS chunk,
                     CAST(SUM(CASE WHEN v > 0
                                   THEN CAST(pow(2, 15 - (j % 16)) AS BIGINT)
                                   ELSE 0 END) AS BIGINT) AS ckey
              FROM votes GROUP BY doc_id, CAST(floor(j/16) AS INT)),
            sig AS (SELECT doc_id, list(ckey ORDER BY chunk) AS cs
                    FROM chunks GROUP BY doc_id),
            cand AS (
              SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
              FROM chunks x JOIN chunks y
                ON x.chunk = y.chunk AND x.ckey = y.ckey AND x.doc_id < y.doc_id),
            ham AS (
              SELECT id_a, id_b,
                     bit_count(xor(a.cs[1], b.cs[1])) + bit_count(xor(a.cs[2], b.cs[2]))
                   + bit_count(xor(a.cs[3], b.cs[3])) + bit_count(xor(a.cs[4], b.cs[4]))
                       AS hamming
              FROM cand JOIN sig a ON a.doc_id = id_a JOIN sig b ON b.doc_id = id_b)
            SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming
            FROM ham WHERE hamming <= 3
        """,
        # Deletion-neighborhood edit-distance join: identical derived
        # keys, {s} + one-char deletions, variant equi-join, levenshtein.
        "edit_distance_join": """
            WITH base AS (
              SELECT p_partkey AS pid,
                     substr(md5(CAST(p_partkey // 5 AS VARCHAR)), 1, 12) AS bk
              FROM part),
            keys AS (
              SELECT pid,
                     CASE WHEN pid % 5 = 0
                          THEN substr(bk, 1, 4) || 'z' || substr(bk, 6, 7)
                          ELSE bk END AS key
              FROM base),
            variants AS (
              SELECT pid, key, unnest(list_distinct(list_append(
                       [substr(key, 1, i - 1) || substr(key, i + 1, length(key))
                        for i in generate_series(1, length(key))],
                       key))) AS v
              FROM keys),
            cand AS (
              SELECT DISTINCT a.pid AS id_a, b.pid AS id_b, a.key AS ka, b.key AS kb
              FROM variants a JOIN variants b ON a.v = b.v AND a.pid < b.pid)
            SELECT id_a, id_b, CAST(levenshtein(ka, kb) AS INT) AS dist
            FROM cand WHERE levenshtein(ka, kb) <= 1
        """,
        # Replicates the 2-deletion neighborhood blocking (exactness of
        # the neighborhood itself is proven by the brute-force unit
        # test); an all-pairs oracle would hand DuckDB a quadratic plan
        # no engine would run at scale and skew any timing comparison.
        "edit_distance_join_k2": """
            WITH base AS (
              SELECT p_partkey AS pid,
                     substr(md5(CAST(p_partkey // 7 AS VARCHAR)), 1, 12) AS bk
              FROM part),
            keys AS (
              SELECT pid,
                     CASE WHEN pid % 7 = 0
                          THEN substr(bk, 1, 4) || 'z' || substr(bk, 6, 3)
                               || 'q' || substr(bk, 10, 3)
                          WHEN pid % 7 = 3
                          THEN substr(bk, 1, 4) || 'z' || substr(bk, 6, 7)
                          ELSE bk END AS key
              FROM base),
            uniq AS (SELECT DISTINCT key FROM keys),
            d1 AS (
              SELECT key, unnest(list_distinct(list_append(
                       [substr(key, 1, i - 1) || substr(key, i + 1, length(key))
                        for i in generate_series(1, length(key))],
                       key))) AS v1
              FROM uniq),
            d2 AS (
              SELECT key, unnest(list_distinct(list_append(
                       [substr(v1, 1, i - 1) || substr(v1, i + 1, length(v1))
                        for i in generate_series(1, length(v1))],
                       v1))) AS v
              FROM d1),
            variants AS (SELECT DISTINCT key, v FROM d2),
            spairs AS (
              SELECT DISTINCT a.key AS ka, b.key AS kb
              FROM variants a JOIN variants b ON a.v = b.v AND a.key < b.key),
            verified AS (
              SELECT ka, kb, CAST(levenshtein(ka, kb) AS INT) AS dist
              FROM spairs WHERE levenshtein(ka, kb) <= 2),
            cross_pairs AS (
              SELECT least(ia.pid, ib.pid) AS id_a,
                     greatest(ia.pid, ib.pid) AS id_b, v.dist
              FROM verified v
              JOIN keys ia ON ia.key = v.ka
              JOIN keys ib ON ib.key = v.kb),
            same_pairs AS (
              SELECT a.pid AS id_a, b.pid AS id_b, 0 AS dist
              FROM keys a JOIN keys b ON a.key = b.key AND a.pid < b.pid)
            SELECT id_a, id_b, dist FROM cross_pairs
            UNION ALL
            SELECT id_a, id_b, dist FROM same_pairs
        """,
        # Batch equivalent of the stream-stream interval join: inner
        # append-mode matches == the plain self-join with the same
        # user+time predicate.
        "stream_interval_join": """
            SELECT a.event_id AS l_event_id, b.event_id AS r_event_id,
                   a.user_id AS user_id,
                   strftime(a.ts, '%Y-%m-%d %H:%M:%S') AS l_ts,
                   strftime(b.ts, '%Y-%m-%d %H:%M:%S') AS r_ts,
                   round(b.value, 4) AS r_value
            FROM events a JOIN events b
              ON a.user_id = b.user_id
             AND b.ts >= a.ts
             AND b.ts <= a.ts + INTERVAL 10 MINUTE
            WHERE a.event_type = 'click' AND b.event_type = 'purchase'
        """,
        # Two unrolled Lloyd iterations, identical md5-seeded codebook;
        # centroid means rounded to 6 so distributed-sum order can't
        # flip an assignment. (x-y)*(x-y) matches Spark's zip_with.
        "kmeans_assign": """
            WITH v AS (
              SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
            c0 AS (
              SELECT row_number() OVER (ORDER BY h) - 1 AS cluster, ev AS c
              FROM (SELECT md5(CAST(vec_id AS VARCHAR)) AS h, ev
                    FROM v ORDER BY h LIMIT 8)),
            s1 AS (
              SELECT v.vec_id, v.ev, c0.cluster,
                     list_sum([ (v.ev[i] - c0.c[i]) * (v.ev[i] - c0.c[i])
                                for i in generate_series(1, 64) ]) AS d
              FROM v CROSS JOIN c0),
            a1 AS (
              SELECT vec_id, ev, cluster, d FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id
                                             ORDER BY d, cluster) AS rn
                FROM s1) WHERE rn = 1),
            m1 AS (
              SELECT cluster, i, round(avg(ev[i]), 6) AS m
              FROM a1, generate_series(1, 64) t(i)
              GROUP BY cluster, i),
            ml AS (
              SELECT cluster, list(m ORDER BY i) AS c FROM m1 GROUP BY cluster),
            c1 AS (
              SELECT c0.cluster, coalesce(ml.c, c0.c) AS c
              FROM c0 LEFT JOIN ml ON c0.cluster = ml.cluster),
            s2 AS (
              SELECT v.vec_id, c1.cluster,
                     list_sum([ (v.ev[i] - c1.c[i]) * (v.ev[i] - c1.c[i])
                                for i in generate_series(1, 64) ]) AS d
              FROM v CROSS JOIN c1),
            a2 AS (
              SELECT vec_id, cluster, d FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id
                                             ORDER BY d, cluster) AS rn
                FROM s2) WHERE rn = 1)
            SELECT vec_id, CAST(cluster AS INT) AS cluster,
                   round(d, 6) AS dist2
            FROM a2
        """,
        # Hashed-linear classifier: identical md5 feature hash + integer
        # milli-weight table; the weight sum stays exact (BIGINT) and
        # only the sigmoid — transcendental, no structural rounding
        # ties — is rounded. label = weight_sum >= 0, exact.
        "classifier_score": """
            WITH w AS (
              SELECT doc_id,
                     list_filter(string_split(lower(text), ' '),
                                 x -> x <> '') AS words
              FROM documents),
            scored AS (
              SELECT doc_id, len(words) AS n_tokens,
                     CAST(coalesce(list_sum([
                       ((('0x' || substr(md5('w' || CAST(
                             ('0x' || substr(md5(x), 1, 6))::BIGINT % 1024
                           AS VARCHAR)), 1, 6))::BIGINT % 2001) - 1000)
                       for x in words ]), 0) AS BIGINT) AS ws
              FROM w)
            SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
                   ws AS weight_sum,
                   round(1.0 / (1.0 + exp(-(CASE WHEN n_tokens > 0
                                                 THEN ws / (1000.0 * n_tokens)
                                                 ELSE 0.0 END) * 10)), 6)
                     AS prob,
                   ws >= 0 AS label
            FROM scored
        """,
        # Cross-document duplicate 5-gram fraction; words/shingle CTEs
        # mirror the decontaminate oracle at n=5.
        "dup_ngram_frac": """
            WITH words AS (
              SELECT doc_id,
                     list_filter(string_split(
                       regexp_replace(lower(trim(text)), '[^a-z0-9 ]', ' ', 'g'),
                       ' '), w -> w <> '') AS w
              FROM documents),
            sh AS (
              SELECT doc_id,
                     CASE WHEN len(w) < 5 THEN [array_to_string(w, ' ')]
                          ELSE list_distinct([array_to_string(w[i:i+4], ' ')
                                              for i in generate_series(1, len(w) - 4)])
                     END AS s
              FROM words),
            ex AS (
              SELECT doc_id, len(s) AS n_shingles, unnest(s) AS shingle FROM sh),
            counts AS (
              SELECT shingle, count(*) AS docs FROM ex GROUP BY shingle)
            SELECT e.doc_id, CAST(e.n_shingles AS INT) AS n_shingles,
                   CAST(sum(CASE WHEN c.docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_dup,
                   round(CAST(sum(CASE WHEN c.docs >= 2 THEN 1 ELSE 0 END)
                              AS BIGINT) / e.n_shingles, 6) AS dup_frac
            FROM ex e JOIN counts c ON e.shingle = c.shingle
            GROUP BY e.doc_id, e.n_shingles
        """,
        # PII scrub: identical sequential replace (email -> ip -> phone)
        # with per-kind counts taken before each pass; patterns are the
        # PII_PATTERNS constants verbatim.
        "pii_redact": _pii_oracle_sql(),
        "bpe_train": _bpe_oracle_sql(),
        "bpe_encode": _bpe_encode_oracle_sql(),
        "pagerank": _pagerank_oracle_sql(),
        # weight-as-repetition expansion: Spark's percentile(col, p,
        # freq) is defined as the percentile of the row repeated freq
        # times — replicate literally with generate_series.
        "weighted_percentiles": """
            WITH expanded AS (
              SELECT l_returnflag, l_extendedprice,
                     CAST(l_quantity AS INT) AS w
              FROM lineitem),
            rows_exp AS (
              SELECT l_returnflag, l_extendedprice
              FROM expanded, unnest(generate_series(1, w)))
            SELECT e.l_returnflag,
                   round(quantile_cont(r.l_extendedprice, 0.5), 6) AS wp50,
                   round(quantile_cont(r.l_extendedprice, 0.9), 6) AS wp90,
                   t.total_weight
            FROM rows_exp r
            JOIN (SELECT l_returnflag, CAST(sum(w) AS BIGINT)
                         AS total_weight
                  FROM expanded GROUP BY l_returnflag) t
              USING (l_returnflag)
            JOIN (SELECT DISTINCT l_returnflag FROM expanded) e
              USING (l_returnflag)
            GROUP BY e.l_returnflag, t.total_weight
        """,
        "equidepth_histogram": """
            WITH b AS (
              SELECT l_returnflag, l_extendedprice,
                     ntile(10) OVER (PARTITION BY l_returnflag
                                     ORDER BY l_extendedprice ASC,
                                              l_orderkey ASC,
                                              l_linenumber ASC) AS bucket
              FROM lineitem)
            SELECT l_returnflag, bucket, count(*) AS n,
                   round(min(l_extendedprice), 6) AS lo,
                   round(max(l_extendedprice), 6) AS hi
            FROM b GROUP BY l_returnflag, bucket
        """,
        # Same total order as the Spark window (ts, touches-first,
        # type); conversions look back at the preceding frame only.
        "attribution": """
            WITH ev2 AS (
              SELECT user_id, ts, event_type,
                     event_type IN ('click', 'view') AS is_touch
              FROM events
              WHERE event_type IN ('purchase', 'click', 'view')),
            marked AS (
              SELECT user_id, ts, event_type, is_touch,
                     last_value(CASE WHEN is_touch THEN ts END IGNORE NULLS)
                       OVER w AS lt_ts,
                     last_value(CASE WHEN is_touch THEN event_type END
                                IGNORE NULLS) OVER w AS lt_type
              FROM ev2
              WINDOW w AS (PARTITION BY user_id
                           ORDER BY ts ASC, is_touch DESC, event_type ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING))
            SELECT CASE WHEN epoch_us(lt_ts) >= epoch_us(ts) - 72::BIGINT * 3600 * 1000000
                        THEN lt_type END AS attributed_touch,
                   count(*) AS n_conversions
            FROM marked WHERE NOT is_touch
            GROUP BY 1
        """,
        # Forward first_value assigns each touch its next conversion;
        # identical total order to the last-touch oracle.
        "linear_attribution": """
            WITH ev AS (
              SELECT user_id, ts, event_type,
                     event_type IN ('click', 'view') AS is_touch
              FROM events
              WHERE event_type IN ('purchase', 'click', 'view')),
            marked AS (
              SELECT user_id, ts, event_type, is_touch,
                     first_value(CASE WHEN NOT is_touch THEN ts END IGNORE NULLS)
                       OVER w AS cts,
                     first_value(CASE WHEN NOT is_touch THEN event_type END
                                 IGNORE NULLS) OVER w AS ctype
              FROM ev
              WINDOW w AS (PARTITION BY user_id
                           ORDER BY ts ASC, is_touch DESC, event_type ASC
                           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
            t AS (
              SELECT * FROM marked
              WHERE is_touch AND cts IS NOT NULL
                AND epoch_us(ts) >= epoch_us(cts) - 72::BIGINT * 3600 * 1000000),
            n AS (
              SELECT user_id, cts, ctype, count(*) AS n_all
              FROM t GROUP BY 1, 2, 3)
            SELECT t.user_id, t.cts AS conversion_ts, t.ctype AS conversion_type,
                   t.event_type AS touch_type,
                   count(*) AS n_touches,
                   round(CAST(count(*) AS DOUBLE) / max(n.n_all), 6) AS credit
            FROM t JOIN n ON n.user_id = t.user_id AND n.cts = t.cts
                         AND n.ctype = t.ctype
            GROUP BY 1, 2, 3, 4
        """,
        # One aggregate scan; rule rows stacked via VALUES join.
        "expectations": """
            WITH agg AS (
              SELECT
                round(CAST(count(doc_id) AS DOUBLE) / count(*), 6) AS o0,
                round(CAST(count(DISTINCT doc_id) AS DOUBLE) / count(*), 6) AS o1,
                round(CAST(count(text) AS DOUBLE) / count(*), 6) AS o2,
                round(CAST(min(n_chars) AS DOUBLE), 6) AS o3,
                round(CAST(max(n_chars) AS DOUBLE), 6) AS o4,
                round(CAST(sum(CASE WHEN lang IN ('en','de','es','fr')
                                    THEN 1 ELSE 0 END) AS DOUBLE)
                      / count(lang), 6) AS o5,
                round(avg(CAST(n_chars AS DOUBLE)), 6) AS o6
              FROM documents)
            SELECT r.rule_id, r.col AS "column", r.chk AS "check",
                   CASE r.rule_id WHEN 0 THEN o0 WHEN 1 THEN o1 WHEN 2 THEN o2
                        WHEN 3 THEN o3 WHEN 4 THEN o4 WHEN 5 THEN o5
                        ELSE o6 END AS observed,
                   CASE r.rule_id
                        WHEN 0 THEN o0 >= 1.0
                        WHEN 1 THEN o1 >= 1.0
                        WHEN 2 THEN o2 >= 0.99
                        WHEN 3 THEN o3 >= 1
                        WHEN 4 THEN o4 <= 10000
                        WHEN 5 THEN o5 >= 0.95
                        ELSE o6 >= 50 AND o6 <= 500 END AS passed
            FROM agg, (VALUES (0, 'doc_id', 'not_null'),
                              (1, 'doc_id', 'unique'),
                              (2, 'text', 'not_null'),
                              (3, 'n_chars', 'min'),
                              (4, 'n_chars', 'max'),
                              (5, 'lang', 'in_set'),
                              (6, 'n_chars', 'mean_between'))
                 r(rule_id, col, chk)
        """,
        # Contribute-explode: each (user, day) pair hits its 7 report
        # days; distinct then count.
        "rolling_distinct": """
            WITH c AS (
              SELECT DISTINCT user_id,
                     CAST(date_trunc('day', ts) AS DATE) + CAST(i AS INT) AS day
              FROM events, generate_series(0, 6) g(i))
            SELECT strftime(day, '%Y-%m-%d') AS day,
                   count(*) AS n_distinct
            FROM c GROUP BY day
        """,
        # Bipartite projection with the md5 per-actor degree cap.
        "cooccurrence": """
            WITH p AS (
              SELECT DISTINCT l_orderkey AS a, l_partkey % 500 AS i
              FROM lineitem),
            capped AS (
              SELECT a, i FROM (
                SELECT a, i,
                       row_number() OVER (PARTITION BY a
                         ORDER BY md5(CAST(i AS VARCHAR)) ASC, i ASC) AS rn
                FROM p)
              WHERE rn <= 50)
            SELECT x.i AS item_a, y.i AS item_b, count(*) AS n_shared
            FROM capped x JOIN capped y ON x.a = y.a AND x.i < y.i
            GROUP BY 1, 2 HAVING count(*) >= 2
        """,
        # Complete-mode stream-static join == the batch plan.
        "stream_enrich": """
            SELECT strftime(date_trunc('hour', e.ts), '%Y-%m-%d %H:%M:%S')
                     AS window_start,
                   c.c_mktsegment,
                   count(*) AS n,
                   round(sum(e.value), 4) AS total_value
            FROM events e JOIN customer c ON c.c_custkey = e.user_id
            GROUP BY 1, 2
        """,
        "kfold_assign": """
            SELECT fold, count(*) AS n,
                   min(doc_id) AS min_id, max(doc_id) AS max_id
            FROM (
              SELECT doc_id,
                     CAST(('0x' || substr(md5('fold:' || CAST(doc_id AS VARCHAR)),
                           1, 8))::BIGINT % 5 AS INT) AS fold
              FROM documents)
            GROUP BY fold
        """,
        # Bin width only tunes the physical plan: the plain range join
        # is the oracle for ANY bin size, measured or fixed.
        "range_join_auto": """
            WITH l AS (
              SELECT p_partkey AS l_id,
                     (p_partkey * 7) % 10000 AS l_s,
                     (p_partkey * 7) % 10000 + (p_size % 20) + 1 AS l_e
              FROM part),
            r AS (
              SELECT s_suppkey AS r_id,
                     (s_suppkey * 13) % 10000 AS r_s,
                     (s_suppkey * 13) % 10000 + 15 AS r_e
              FROM supplier)
            SELECT l_id, r_id,
                   greatest(l_s, r_s) AS overlap_start,
                   least(l_e, r_e) AS overlap_end
            FROM l JOIN r ON l_s <= r_e AND r_s <= l_e
        """,
        "diversity_report": """
            WITH base AS (
              SELECT source, string_split(text, ' ') AS w
              FROM documents WHERE length(text) > 0),
            d AS (
              SELECT source, count(*) AS n_docs,
                     CAST(sum(len(w)) AS BIGINT) AS n_tokens
              FROM base GROUP BY source),
            t AS (
              SELECT source, count(DISTINCT tok) AS distinct_tokens
              FROM (SELECT source, unnest(w) AS tok FROM base) GROUP BY source),
            shs AS (
              SELECT source,
                     unnest(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                            ELSE [array_to_string(w[i:i+2], ' ')
                                  for i in generate_series(1, len(w) - 2)]
                            END) AS s
              FROM base),
            sh AS (
              SELECT source, count(*) AS n_shingles,
                     count(DISTINCT s) AS distinct_shingles
              FROM shs GROUP BY source)
            SELECT d.source, d.n_docs, d.n_tokens, t.distinct_tokens,
                   round(CAST(t.distinct_tokens AS DOUBLE) / d.n_tokens, 6) AS ttr,
                   sh.n_shingles, sh.distinct_shingles,
                   round(CAST(sh.distinct_shingles AS DOUBLE) / sh.n_shingles, 6)
                     AS distinct_shingle_frac
            FROM d JOIN t ON t.source = d.source JOIN sh ON sh.source = d.source
        """,
        # Same quantization CTE as gram_matrix; exact integer dots.
        "embedding_project": """
            WITH v AS (
              SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xs
              FROM embeddings),
            sc AS (
              SELECT vec_id, xs,
                     greatest(list_max(list_transform(xs, x -> abs(x))), 1e-12)
                       / 127.0 AS scale
              FROM v),
            q AS (
              SELECT vec_id,
                     list_transform(xs, x -> CAST(round(x / scale) AS BIGINT)) AS qv
              FROM sc)
            SELECT vec_id,
                   CAST(list_sum(list_transform(generate_series(1, 64),
                        i -> qv[i] * ([-3, 0, 3, -1, 2, -2, 1, -3, 0, 3, -1, 2, -2, 1, -3, 0, 3, -1, 2, -2, 1, -3, 0, 3, -1, 2, -2, 1, -3, 0, 3, -1, 2, -2, 1, -3, 0, 3, -1, 2, -2, 1, -3, 0, 3, -1, 2, -2, 1, -3, 0, 3, -1, 2, -2, 1, -3, 0, 3, -1, 2, -2, 1, -3])[i])) AS BIGINT) AS p0,
                   CAST(list_sum(list_transform(generate_series(1, 64),
                        i -> qv[i] * ([-3, 1, -2, 2, -1, 3, 0, -3, 1, -2, 2, -1, 3, 0, -3, 1, -2, 2, -1, 3, 0, -3, 1, -2, 2, -1, 3, 0, -3, 1, -2, 2, -1, 3, 0, -3, 1, -2, 2, -1, 3, 0, -3, 1, -2, 2, -1, 3, 0, -3, 1, -2, 2, -1, 3, 0, -3, 1, -2, 2, -1, 3, 0, -3])[i])) AS BIGINT) AS p1,
                   CAST(list_sum(list_transform(generate_series(1, 64),
                        i -> qv[i] * ([-3, 2, 0, -2, 3, 1, -1, -3, 2, 0, -2, 3, 1, -1, -3, 2, 0, -2, 3, 1, -1, -3, 2, 0, -2, 3, 1, -1, -3, 2, 0, -2, 3, 1, -1, -3, 2, 0, -2, 3, 1, -1, -3, 2, 0, -2, 3, 1, -1, -3, 2, 0, -2, 3, 1, -1, -3, 2, 0, -2, 3, 1, -1, -3])[i])) AS BIGINT) AS p2,
                   CAST(list_sum(list_transform(generate_series(1, 64),
                        i -> qv[i] * ([-3, 3, 2, 1, 0, -1, -2, -3, 3, 2, 1, 0, -1, -2, -3, 3, 2, 1, 0, -1, -2, -3, 3, 2, 1, 0, -1, -2, -3, 3, 2, 1, 0, -1, -2, -3, 3, 2, 1, 0, -1, -2, -3, 3, 2, 1, 0, -1, -2, -3, 3, 2, 1, 0, -1, -2, -3, 3, 2, 1, 0, -1, -2, -3])[i])) AS BIGINT) AS p3
            FROM q
        """,
        # Ground-truth energies straight from the synth formula: the
        # Spark side must decode the BYTES back to these numbers.
        "pcm_energy": """
            WITH frames AS (
              SELECT doc_id AS media_id, f.f AS frame_idx,
                     [ (((doc_id * 7 + (f.f * 160 + j) * (f.f * 160 + j)) % 2048)
                        - 1024) for j in generate_series(0, 159) ] AS s
              FROM documents, generate_series(0, 4) f(f))
            SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
                   CAST(160 AS INT) AS n_samples,
                   round(sqrt(CAST(list_sum(list_transform(s, x -> x * x))
                              AS DOUBLE) / 160), 6) AS energy
            FROM frames
        """,
        # Deterministic mode == rank-1 of (count desc, value asc).
        "survivorship": """
            WITH m AS (
              SELECT user_id, event_type,
                     row_number() OVER (PARTITION BY user_id
                       ORDER BY count(*) DESC, event_type ASC) AS rn
              FROM events GROUP BY user_id, event_type),
            g AS (
              SELECT user_id, round(max(value), 6) AS max_value,
                     strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts
              FROM events GROUP BY user_id)
            SELECT g.user_id, g.max_value, g.first_ts, m.event_type
            FROM g JOIN m ON m.user_id = g.user_id AND m.rn = 1
        """,
        # Two-sided neighbor windows over the probe/observation union;
        # lerp on the exact microsecond base.
        "interpolate": """
            WITH ev AS (
              SELECT user_id, ts, value FROM events WHERE user_id < 40),
            pr AS (
              SELECT user_id,
                     min(ts) + CAST(i * 30 AS INT) * INTERVAL 1 MINUTE AS ts
              FROM ev, generate_series(0, 3) g(i)
              GROUP BY user_id, i),
            un AS (
              SELECT user_id, ts, CAST(value AS DOUBLE) AS v, 1 AS is_obs
              FROM ev
              UNION ALL
              SELECT user_id, ts, NULL, 0 FROM pr),
            marked AS (
              SELECT user_id, ts, is_obs,
                     last_value(CASE WHEN is_obs = 1 THEN v END IGNORE NULLS)
                       OVER wb AS pv,
                     last_value(CASE WHEN is_obs = 1 THEN epoch_us(ts) END
                                IGNORE NULLS) OVER wb AS pt,
                     first_value(CASE WHEN is_obs = 1 THEN v END IGNORE NULLS)
                       OVER wf AS nv,
                     first_value(CASE WHEN is_obs = 1 THEN epoch_us(ts) END
                                 IGNORE NULLS) OVER wf AS nt
              FROM un
              WINDOW wb AS (PARTITION BY user_id
                            ORDER BY ts ASC, is_obs DESC, v ASC NULLS FIRST
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                     wf AS (PARTITION BY user_id
                            ORDER BY ts ASC, is_obs DESC, v ASC NULLS FIRST
                            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
            SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
                   round(CASE WHEN pt = epoch_us(ts) THEN pv
                         WHEN pt IS NOT NULL AND nt IS NOT NULL
                         THEN pv + (epoch_us(ts) - pt)
                                   / CAST(nt - pt AS DOUBLE) * (nv - pv)
                         END, 6) AS value_interp,
                   CASE WHEN pt = epoch_us(ts) THEN 'exact'
                        WHEN pt IS NOT NULL AND nt IS NOT NULL THEN 'lerp'
                        END AS method
            FROM marked WHERE is_obs = 0
        """,
        # sessionize CTE + ordered list per session -> path counts.
        "top_paths": """
            WITH gaps AS (
              SELECT event_id, user_id, event_type, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR CAST(floor(epoch(ts)) AS BIGINT)
                               - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
                          THEN 1 ELSE 0 END AS is_new
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
            sess AS (
              SELECT user_id, event_type, ts, event_id,
                     sum(is_new) OVER (PARTITION BY user_id
                                       ORDER BY ts ASC, event_id ASC
                                       ROWS UNBOUNDED PRECEDING) AS session_id
              FROM gaps),
            paths AS (
              SELECT array_to_string(
                       (list(event_type ORDER BY ts ASC, event_id ASC))[1:8],
                       '>') AS path,
                     least(count(*), 8) AS n_steps
              FROM sess GROUP BY user_id, session_id)
            SELECT path, count(*) AS n, CAST(n_steps AS INT) AS n_steps
            FROM paths GROUP BY path, n_steps
            ORDER BY n DESC, path ASC LIMIT 20
        """,
        # DLT priorities ranked per language; (u+1)/2^32 never zero.
        "priority_sample_grouped": """
            SELECT lang, doc_id, n_chars FROM (
              SELECT lang, doc_id, n_chars,
                     row_number() OVER (
                       PARTITION BY lang
                       ORDER BY CAST(n_chars AS DOUBLE)
                         / ((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                             ::BIGINT + 1.0) / 4294967296.0) DESC,
                         doc_id ASC) AS rn
              FROM documents)
            WHERE rn <= 10
        """,
        "transition_matrix": """
            WITH pairs AS (
              SELECT lag(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts ASC, event_id ASC) AS from_type,
                     event_type AS to_type
              FROM events),
            counts AS (
              SELECT from_type, to_type, count(*) AS n
              FROM pairs WHERE from_type IS NOT NULL
              GROUP BY from_type, to_type),
            tot AS (
              SELECT from_type, sum(n) AS t FROM counts GROUP BY from_type)
            SELECT c.from_type, c.to_type, c.n,
                   round(CAST(c.n AS DOUBLE) / t, 6) AS p
            FROM counts c JOIN tot USING (from_type)
        """,
        "merge_intervals": """
            WITH iv AS (
              SELECT user_id, ts AS s, ts + INTERVAL 15 MINUTE AS e
              FROM events),
            f AS (
              SELECT user_id, s, e,
                     CASE WHEN max(e) OVER wprev IS NULL
                            OR s > max(e) OVER wprev THEN 1 ELSE 0 END AS ni
              FROM iv
              WINDOW wprev AS (PARTITION BY user_id ORDER BY s ASC, e ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING)),
            g AS (
              SELECT user_id, s, e,
                     sum(ni) OVER (PARTITION BY user_id ORDER BY s ASC, e ASC
                                   ROWS UNBOUNDED PRECEDING) AS island
              FROM f)
            SELECT user_id,
                   strftime(min(s), '%Y-%m-%d %H:%M:%S') AS island_start,
                   strftime(max(e), '%Y-%m-%d %H:%M:%S') AS island_end,
                   count(*) AS n_intervals
            FROM g GROUP BY user_id, island
        """,
        # Moments from decimal-exact sums, then the identical IEEE
        # expression tree — borderline rows agree with the Spark side.
        # PH statistic: prefix sums evaluate in the window's total
        # order, so both engines produce bit-identical doubles.
        "quality_drift": """
            WITH docs AS (
              SELECT source, doc_id,
                     CAST(n_chars + CASE WHEN source = 'src7'
                            AND row_number() OVER (PARTITION BY source
                                                   ORDER BY doc_id ASC)
                                > count(*) OVER (PARTITION BY source) / 2.0
                          THEN 150 ELSE 0 END AS DOUBLE) AS value
              FROM documents),
            st AS (
              SELECT source,
                     CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE) AS mu,
                     CAST(sum(CAST(value * value AS DECIMAL(38,10))) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE) AS ex2
              FROM docs GROUP BY source),
            m AS (
              SELECT d.source, d.doc_id, d.value,
                     sqrt(ex2 - mu * mu) AS sigma,
                     sum(d.value - mu) OVER w AS mm
              FROM docs d JOIN st USING (source)
              WINDOW w AS (PARTITION BY d.source ORDER BY d.doc_id ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
            ph AS (
              SELECT source, doc_id, value, sigma,
                     round(max(mm) OVER w2 - mm, 6) AS ph_up,
                     round(mm - min(mm) OVER w2, 6) AS ph_down
              FROM m
              WINDOW w2 AS (PARTITION BY source ORDER BY doc_id ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
            SELECT source, doc_id, value, ph_up, ph_down
            FROM ph WHERE ph_up > 6.0 * sigma OR ph_down > 6.0 * sigma
        """,
        "grouped_outliers": """
            WITH s AS (
              SELECT event_type,
                     CAST(sum(CAST(value AS DECIMAL(38,10)))
                          AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mu,
                     CAST(sum(CAST(value * value AS DECIMAL(38,10)))
                          AS DOUBLE)
                       / CAST(count(*) AS DOUBLE) AS ex2
              FROM events GROUP BY event_type)
            SELECT event_id, e.event_type,
                   round((value - mu) / sqrt(ex2 - mu * mu), 6) AS z_score
            FROM events e JOIN s USING (event_type)
            WHERE abs(round((value - mu) / sqrt(ex2 - mu * mu), 6)) > 3.0
        """,
        "temperature_sample": """
            WITH c AS (
              SELECT lang, count(*) AS n,
                     round(pow(CAST(count(*) AS DOUBLE), 0.5), 6) AS w
              FROM documents GROUP BY lang),
            m AS (SELECT max(w / n) AS max_rate FROM c),
            r AS (SELECT lang, (w / n) / max_rate AS rate FROM c, m)
            SELECT d.lang, count(*) AS n_kept
            FROM documents d JOIN r USING (lang)
            WHERE (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                     ::BIGINT / 4294967296.0) < r.rate
            GROUP BY d.lang
        """,
        # replayed rows are exact copies, so the deduped stream equals
        # the original events — assert the per-type totals.
        "stream_dedup": """
            SELECT event_type, count(*) AS n,
                   round(sum(value), 6) AS total_value
            FROM events GROUP BY event_type
        """,
        "oov_rate": r"""
            WITH tok AS (
              SELECT doc_id, unnest(regexp_extract_all(lower(text),
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS token
              FROM documents),
            counts AS (
              SELECT token, count(*) AS freq FROM tok
              GROUP BY token HAVING count(*) >= 2),
            vocab AS (
              SELECT token FROM counts
              ORDER BY freq DESC, token ASC LIMIT 200)
            SELECT t.doc_id, count(*) AS n_tokens,
                   CAST(count(*) FILTER (WHERE v.token IS NULL) AS BIGINT)
                     AS n_oov,
                   round(CAST(count(*) FILTER (WHERE v.token IS NULL)
                              AS DOUBLE) / count(*), 6) AS oov_rate
            FROM tok t LEFT JOIN vocab v USING (token)
            GROUP BY t.doc_id
        """,
        # date_trunc('week', ..) is ISO-Monday in both engines; the
        # offset is integer microsecond arithmetic.
        "cohort_retention": """
            WITH first AS (
              SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
              FROM events GROUP BY user_id)
            SELECT f.cohort_week,
                   (epoch_us(e.ts) - epoch_us(f.cohort_week))
                     // 604800000000 AS week_offset,
                   count(DISTINCT e.user_id) AS n_users
            FROM events e JOIN first f USING (user_id)
            GROUP BY 1, 2
        """,
        # One-shot join+aggregate the incremental JOIN view must equal;
        # decimal revenue sums match the Spark side exactly.
        "incremental_join_agg": """
            SELECT r_name,
                   round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                                       AS DECIMAL(18,4))) AS DOUBLE), 6)
                     AS revenue,
                   count(*) AS n
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        # Normal equations with decimal-exact moment sums; the Cramer
        # expression trees mirror operators/aggregate.py verbatim.
        "multiple_regression": """
            WITH s AS (
              SELECT l_returnflag,
                     CAST(count(*) AS DOUBLE) AS n,
                     CAST(sum(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE) AS s1,
                     CAST(sum(CAST(l_discount AS DECIMAL(38,10))) AS DOUBLE) AS s2,
                     CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(38,10))) AS DOUBLE) AS s11,
                     CAST(sum(CAST(l_quantity * l_discount AS DECIMAL(38,10))) AS DOUBLE) AS s12,
                     CAST(sum(CAST(l_discount * l_discount AS DECIMAL(38,10))) AS DOUBLE) AS s22,
                     CAST(sum(CAST(l_extendedprice AS DECIMAL(38,10))) AS DOUBLE) AS sy,
                     CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(38,10))) AS DOUBLE) AS s1y,
                     CAST(sum(CAST(l_discount * l_extendedprice AS DECIMAL(38,10))) AS DOUBLE) AS s2y
              FROM lineitem GROUP BY l_returnflag),
            d AS (
              SELECT *,
                     n * (s11 * s22 - s12 * s12)
                       - s1 * (s1 * s22 - s12 * s2)
                       + s2 * (s1 * s12 - s11 * s2) AS det,
                     sy * (s11 * s22 - s12 * s12)
                       - s1 * (s1y * s22 - s12 * s2y)
                       + s2 * (s1y * s12 - s11 * s2y) AS det0,
                     n * (s1y * s22 - s12 * s2y)
                       - sy * (s1 * s22 - s12 * s2)
                       + s2 * (s1 * s2y - s1y * s2) AS det1,
                     n * (s11 * s2y - s1y * s12)
                       - s1 * (s1 * s2y - s1y * s2)
                       + sy * (s1 * s12 - s11 * s2) AS det2
              FROM s)
            SELECT l_returnflag, CAST(n AS BIGINT) AS n,
                   round(CASE WHEN det = 0 THEN NULL ELSE det0 / det END, 6) AS b0,
                   round(CASE WHEN det = 0 THEN NULL ELSE det1 / det END, 6) AS b1,
                   round(CASE WHEN det = 0 THEN NULL ELSE det2 / det END, 6) AS b2
            FROM d
        """,
        # Decontamination: distinct-3gram overlap of each doc against
        # the benchmark shingle set (docs % 50 == 0), same shingles.
        "decontaminate": """
            WITH words AS (
              SELECT doc_id,
                     list_filter(string_split(
                       regexp_replace(lower(trim(text)), '[^a-z0-9 ]', ' ', 'g'),
                       ' '), w -> w <> '') AS w
              FROM documents),
            sh AS (
              SELECT doc_id,
                     CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                          ELSE list_distinct([array_to_string(w[i:i+2], ' ')
                                              for i in generate_series(1, len(w) - 2)])
                     END AS s
              FROM words),
            bench AS (
              SELECT DISTINCT unnest(s) AS shingle FROM sh WHERE doc_id % 50 = 0),
            ex AS (
              SELECT doc_id, len(s) AS n_shingles, unnest(s) AS shingle FROM sh),
            hits AS (
              SELECT ex.doc_id, ex.n_shingles,
                     CAST(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_hit
              FROM ex LEFT JOIN bench b ON ex.shingle = b.shingle
              GROUP BY ex.doc_id, ex.n_shingles)
            SELECT doc_id, CAST(n_shingles AS INT) AS n_shingles, n_hit,
                   round(CASE WHEN n_shingles > 0
                              THEN CAST(n_hit AS DOUBLE) / n_shingles
                              ELSE 0.0 END, 6) AS hit_frac,
                   CASE WHEN n_shingles > 0
                        THEN CAST(n_hit AS DOUBLE) / n_shingles >= 0.5
                        ELSE FALSE END AS contaminated
            FROM hits
        """,
        # Repetition signals: duplicate-3gram fraction + top-word share
        # (split-on-space words, same shingle construction).
        "repetition_score": """
            WITH words AS (
              SELECT doc_id,
                     list_filter(string_split(lower(text), ' '), w -> w <> '') AS w
              FROM documents),
            sh AS (
              SELECT doc_id, w,
                     CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                          ELSE [array_to_string(w[i:i+2], ' ')
                                for i in generate_series(1, len(w) - 2)]
                     END AS s
              FROM words),
            base AS (
              SELECT doc_id,
                     CASE WHEN len(s) > 0
                          THEN 1.0 - CAST(len(list_distinct(s)) AS DOUBLE) / len(s)
                          ELSE 0.0 END AS dup_frac,
                     len(w) AS nw
              FROM sh),
            tw AS (
              SELECT doc_id, max(cnt) AS topc FROM (
                SELECT doc_id, word, count(*) AS cnt
                FROM (SELECT doc_id, unnest(w) AS word FROM words)
                GROUP BY doc_id, word)
              GROUP BY doc_id)
            SELECT b.doc_id,
                   round(dup_frac, 6) AS r_dup_3gram_frac,
                   round(CASE WHEN nw > 0 THEN CAST(topc AS DOUBLE) / nw
                              ELSE 0.0 END, 6) AS r_top_word_frac
            FROM base b LEFT JOIN tw USING (doc_id)
        """,
        # Top-V vocabulary: identical tokenization + (freq desc, token
        # asc) dense rank ids.
        "vocab_build": r"""
            WITH tok AS (
              SELECT unnest(regexp_extract_all(lower(text),
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS token
              FROM documents),
            counts AS (
              SELECT token, count(*) AS freq FROM tok
              GROUP BY token HAVING count(*) >= 2),
            ranked AS (
              SELECT token, freq,
                     row_number() OVER (ORDER BY freq DESC, token ASC) - 1
                       AS token_id
              FROM counts)
            SELECT token, CAST(token_id AS INT) AS token_id, freq
            FROM ranked WHERE token_id < 200
        """,
        # Concat-and-cut packing manifest: md5-derived shard, per-shard
        # prefix sums, cut every 512 tokens, boundary docs split.
        "sequence_pack": r"""
            WITH d AS (
              SELECT doc_id,
                     CAST(len(regexp_extract_all(lower(text),
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS nt,
                     ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8
                       AS shard
              FROM documents),
            s AS (
              SELECT doc_id, nt, shard,
                     CAST(sum(nt) OVER (PARTITION BY shard ORDER BY doc_id ASC
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS e
              FROM d WHERE nt > 0),
            x AS (SELECT doc_id, nt, shard, e, e - nt AS st FROM s),
            ex AS (
              SELECT *, unnest(generate_series(st // 512, (e - 1) // 512)) AS seq
              FROM x)
            SELECT shard, seq, doc_id,
                   greatest(st, seq * 512) - st AS doc_offset,
                   greatest(st, seq * 512) - seq * 512 AS seq_offset,
                   least(e, seq * 512 + 512) - greatest(st, seq * 512) AS span_len
            FROM ex
        """,
        # min-over-shingles md5 fingerprint, replicated verbatim.
        "fingerprint": """
            SELECT doc_id,
                   list_aggregate(
                     list_transform(generate_series(1, greatest(1, length(text) - 31)),
                                    i -> substr(md5(substr(text, i, 32)), 1, 16)),
                     'min') AS fingerprint
            FROM documents
        """,
        # Sliding-window retrieval chunks: offsets 0, 90, 180, ... while
        # inside the text; substring clamps the tail chunk identically.
        "chunk_documents": """
            WITH base AS (
              SELECT doc_id, text,
                     ((length(text) - 1) // 90) + 1 AS n_chunks
              FROM documents WHERE length(text) > 0
            ),
            ex AS (
              SELECT doc_id, text, unnest(range(0, n_chunks)) AS chunk_id
              FROM base
            )
            SELECT doc_id,
                   CAST(chunk_id AS BIGINT) AS chunk_id,
                   CAST(chunk_id * 90 AS BIGINT) AS chunk_start,
                   substring(text, CAST(chunk_id * 90 + 1 AS INT), 120) AS chunk_text,
                   CAST(length(substring(text, CAST(chunk_id * 90 + 1 AS INT), 120))
                        AS BIGINT) AS chunk_len
            FROM ex
        """,
        # Lee-et-al segment dedup: first global occurrence of every
        # 16-word segment wins (doc_id, then position); documents are
        # rebuilt from surviving segments in position order.
        "segment_dedup": """
            WITH base AS (
              SELECT doc_id, string_split(text, ' ') AS w
              FROM documents WHERE length(text) > 0
            ),
            b2 AS (
              SELECT doc_id, w, ((len(w) - 1) // 16) + 1 AS n_seg FROM base
            ),
            segs AS (
              SELECT doc_id, w, unnest(range(0, n_seg)) AS seg_idx FROM b2
            ),
            st AS (
              SELECT doc_id, seg_idx,
                     array_to_string(
                       w[CAST(seg_idx * 16 + 1 AS INT):CAST(seg_idx * 16 + 16 AS INT)],
                       ' ') AS seg_text
              FROM segs
            ),
            fl AS (
              SELECT doc_id, seg_idx, seg_text,
                     row_number() OVER (PARTITION BY seg_text
                                        ORDER BY doc_id, seg_idx) = 1 AS keep
              FROM st
            )
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_segments,
                   CAST(coalesce(sum(CASE WHEN keep THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS kept_segments,
                   coalesce(string_agg(CASE WHEN keep THEN seg_text END,
                                       ' ' ORDER BY seg_idx), '') AS dedup_text
            FROM fl GROUP BY doc_id
        """,
        # Token-budget mixture sampling: md5-shuffled order per source,
        # running sum windowed (CAST — DuckDB window sums are HUGEINT),
        # keep while cum <= budget.
        "token_budget_sample": """
            WITH base AS (
              SELECT source, doc_id,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                     md5(CAST(doc_id AS VARCHAR)) AS k
              FROM documents
            ),
            c AS (
              SELECT source, doc_id, n_tokens,
                     CAST(sum(n_tokens) OVER (PARTITION BY source
                            ORDER BY k, doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          AS BIGINT) AS cum_tokens
              FROM base
            )
            SELECT source, doc_id, n_tokens, cum_tokens
            FROM c WHERE cum_tokens <= 600
        """,
        # Top-5 TF-IDF terms per doc; idf is the exact rational
        # (N+1)/(df+1) so the one double division is IEEE-identical in
        # both engines; ties break on term text.
        "tfidf_topk": """
            WITH toks AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM documents
            ),
            tf AS (
              SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
              FROM toks WHERE term <> '' GROUP BY doc_id, term
            ),
            dfreq AS (
              SELECT term, CAST(count(*) AS BIGINT) AS doc_freq
              FROM tf GROUP BY term
            ),
            n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
            scored AS (
              SELECT tf.doc_id, tf.term, tf.tf, dfreq.doc_freq,
                     CAST(tf.tf * (n.n_docs + 1) AS DOUBLE)
                       / CAST(dfreq.doc_freq + 1 AS DOUBLE) AS score
              FROM tf JOIN dfreq USING (term) CROSS JOIN n
            ),
            r AS (
              SELECT *, row_number() OVER (PARTITION BY doc_id
                          ORDER BY score DESC, term ASC) AS rnk
              FROM scored
            )
            SELECT doc_id, term, tf, doc_freq, score,
                   CAST(rnk AS BIGINT) AS "rank"
            FROM r WHERE rnk <= 5
        """,
        # Ternary sparse-random-projection LSH: identical md5-seeded
        # weights, buckets, and exact rerank.
        "embedding_lsh": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            dots AS (
              SELECT vec_id, p,
                     list_dot_product(v, list_transform(range(len(v)),
                       d -> CAST(CASE WHEN (instr('0123456789abcdef',
                                   substr(md5(p::VARCHAR || '_' || d::VARCHAR), 1, 1)) - 1) < 4
                                 THEN -1.0
                                 WHEN (instr('0123456789abcdef',
                                   substr(md5(p::VARCHAR || '_' || d::VARCHAR), 1, 1)) - 1) < 8
                                 THEN 1.0
                                 ELSE 0.0 END AS DOUBLE))) AS dp
              FROM e, generate_series(0, 5) g(p)),
            buck AS (
              SELECT vec_id,
                     SUM(CASE WHEN dp >= 0 THEN CAST(pow(2, p) AS BIGINT) ELSE 0 END)
                       AS bucket
              FROM dots GROUP BY vec_id),
            q AS (SELECT vec_id AS query_id, v AS qv, bucket
                  FROM e JOIN buck USING (vec_id) WHERE vec_id < 5),
            c AS (SELECT vec_id AS neighbor_id, v AS cv, bucket
                  FROM e JOIN buck USING (vec_id)),
            scored AS (
              SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS sim
              FROM c JOIN q USING (bucket) WHERE neighbor_id <> query_id),
            ranked AS (
              SELECT query_id, neighbor_id, sim,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY sim DESC, neighbor_id ASC) AS rank
              FROM scored)
            SELECT query_id, neighbor_id, round(sim, 4) AS cos_sim, rank
            FROM ranked WHERE rank <= 5
        """,
        # Quantize-then-rerank: identical int8 quantization, BIGINT
        # candidate dots (bit-exact), top-15 approx candidates, exact
        # full-precision rerank to top-5.
        "embedding_quantized_topk": """
            WITH v AS (
              SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xs
              FROM embeddings),
            s AS (
              SELECT vec_id, xs,
                     greatest(list_max(list_transform(xs, x -> abs(x))), 1e-12)
                       / 127.0 AS scale
              FROM v),
            q AS (
              SELECT vec_id, xs,
                     list_transform(xs, x -> CAST(round(x / scale) AS INT)) AS qv
              FROM s),
            qq AS (SELECT vec_id AS query_id, xs AS qxs, qv AS qqv
                   FROM q WHERE vec_id < 5),
            cand AS (
              SELECT query_id, c.vec_id AS neighbor_id, c.xs AS nxs, qxs,
                     CAST(list_sum(list_transform(list_zip(c.qv, qqv),
                       p -> CAST(p[1] AS BIGINT) * p[2])) AS BIGINT) AS qdot,
                     CAST(list_sum(list_transform(c.qv,
                       x -> CAST(x AS BIGINT) * x)) AS BIGINT) AS n2a,
                     CAST(list_sum(list_transform(qqv,
                       x -> CAST(x AS BIGINT) * x)) AS BIGINT) AS n2b
              FROM q c, qq WHERE c.vec_id <> query_id),
            topm AS (
              SELECT query_id, neighbor_id, nxs, qxs,
                     row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY qdot / (sqrt(n2a) * sqrt(n2b)) DESC,
                                neighbor_id ASC) AS rn
              FROM cand),
            rer AS (
              SELECT query_id, neighbor_id,
                     list_cosine_similarity(qxs, nxs) AS sim
              FROM topm WHERE rn <= 15),
            ranked AS (
              SELECT query_id, neighbor_id, sim,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY sim DESC, neighbor_id ASC) AS rank
              FROM rer)
            SELECT query_id, neighbor_id, round(sim, 4) AS cos_sim, rank
            FROM ranked WHERE rank <= 5
        """,
        # Cosine near-dup pairs: identical ternary buckets (4 planes),
        # within-bucket self-join, exact cosine >= 0.3.
        "embedding_dups": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            dots AS (
              SELECT vec_id, p,
                     list_dot_product(v, list_transform(range(len(v)),
                       d -> CAST(CASE WHEN (instr('0123456789abcdef',
                                   substr(md5(p::VARCHAR || '_' || d::VARCHAR), 1, 1)) - 1) < 4
                                 THEN -1.0
                                 WHEN (instr('0123456789abcdef',
                                   substr(md5(p::VARCHAR || '_' || d::VARCHAR), 1, 1)) - 1) < 8
                                 THEN 1.0
                                 ELSE 0.0 END AS DOUBLE))) AS dp
              FROM e, generate_series(0, 3) g(p)),
            buck AS (
              SELECT vec_id,
                     SUM(CASE WHEN dp >= 0 THEN CAST(pow(2, p) AS BIGINT) ELSE 0 END)
                       AS bucket
              FROM dots GROUP BY vec_id),
            pairs AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     list_cosine_similarity(ea.v, eb.v) AS cs
              FROM buck a JOIN buck b
                     ON a.bucket = b.bucket AND a.vec_id < b.vec_id
                   JOIN e ea ON ea.vec_id = a.vec_id
                   JOIN e eb ON eb.vec_id = b.vec_id)
            SELECT id_a, id_b, round(cs, 4) AS cos_sim
            FROM pairs WHERE cs >= 0.3
        """,
        # IVF: md5-ordered centroid sample, nearest-cell assignment,
        # nprobe=4 probing, exact rerank — all replicated.
        "embedding_ivf": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            cents AS (SELECT vec_id AS cid, v AS cv FROM e
                      ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 8),
            ca AS (
              SELECT vec_id, cell FROM (
                SELECT e.vec_id, c.cid AS cell,
                       row_number() OVER (PARTITION BY e.vec_id
                                          ORDER BY list_cosine_similarity(e.v, c.cv) DESC,
                                                   c.cid ASC) AS rn
                FROM e, cents c) WHERE rn = 1),
            qp AS (
              SELECT query_id, cell FROM (
                SELECT e.vec_id AS query_id, c.cid AS cell,
                       row_number() OVER (PARTITION BY e.vec_id
                                          ORDER BY list_cosine_similarity(e.v, c.cv) DESC,
                                                   c.cid ASC) AS rn
                FROM e, cents c WHERE e.vec_id < 5) WHERE rn <= 4),
            scored AS (
              SELECT DISTINCT qp.query_id, ca.vec_id AS neighbor_id,
                     list_cosine_similarity(q.v, n.v) AS sim
              FROM qp JOIN ca USING (cell)
                   JOIN e q ON q.vec_id = qp.query_id
                   JOIN e n ON n.vec_id = ca.vec_id
              WHERE ca.vec_id <> qp.query_id),
            ranked AS (
              SELECT query_id, neighbor_id, sim,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY sim DESC, neighbor_id ASC) AS rank
              FROM scored)
            SELECT query_id, neighbor_id, round(sim, 4) AS cos_sim, rank
            FROM ranked WHERE rank <= 5
        """,
        "entrez_gene_load": """
            SELECT 'Feature' AS cls, 'gene' AS biotype,
                   CASE WHEN p_partkey%10=0 THEN 'x'||p_partkey
                        ELSE CAST(p_partkey AS VARCHAR) END AS sourceId,
                   'G'||p_partkey AS name,
                   'G'||p_partkey AS displayName,
                   'desc '||p_partkey AS longName,
                   CASE WHEN p_partkey%2=0 THEN 'sum '||p_partkey END AS description,
                   'https://www.ncbi.nlm.nih.gov/gene/' ||
                     CASE WHEN p_partkey%10=0 THEN 'x'||p_partkey
                          ELSE CAST(p_partkey AS VARCHAR) END AS url,
                   CASE WHEN p_partkey%10=0
                        THEN 'spec: uid (^\\d+$) and name are required' END AS _error
            FROM part
        """,
        "dbsnp_docsum": """
            WITH src AS (
              SELECT p_partkey AS k,
                     CASE WHEN p_partkey%4=0 THEN 'GENE=X;LEN=1'
                          ELSE 'GENE=X;HGVS=NC_'||p_partkey||':g.5A&gt;T,NM_'||p_partkey
                               ||':c.'||p_partkey||'T&gt;A,NP_'||p_partkey
                               ||':p.V'||p_partkey||'E;LEN=1' END AS docsum
              FROM part),
            nots AS (
              SELECT k, list_sort(string_split(regexp_replace(
                       list_filter(string_split(replace(docsum,'&gt;','>'),';'),
                                   x -> x LIKE 'HGVS=%')[1],
                       '^HGVS=',''),','),'DESC') AS notations
              FROM src)
            SELECT CAST(k AS VARCHAR) AS sourceId,
                   'rs'||k AS name,
                   list_filter(notations, x -> regexp_matches(x,'^NM_\\d+.*:c\\..*'))[1] AS hgvs_cds,
                   list_filter(notations, x -> regexp_matches(x,'^NP_\\d+.*:p\\..*'))[1] AS hgvs_protein,
                   coalesce(
                     list_filter(notations, x -> regexp_matches(x,'^NM_\\d+.*:c\\..*'))[1],
                     list_filter(notations, x -> regexp_matches(x,'^NP_\\d+.*:p\\..*'))[1]
                   ) AS infers_notation
            FROM nots
        """,
        "hgnc_load": """
            WITH c AS (SELECT c_custkey AS k FROM customer),
            sym AS (SELECT k, 'Gene'||k||CASE WHEN k%6=0 THEN 'ORF7' ELSE '' END AS symbol
                    FROM c)
            SELECT symbol AS name, 'HGNC:'||k AS sourceId, FALSE AS deprecated,
                   replace(upper(symbol),'ORF','orf') AS displayName,
                   FALSE AS has_dep, '2024-01-01' AS sourceIdVersion
            FROM sym
            UNION ALL
            SELECT 'Prev'||k, 'HGNC:'||k, TRUE, 'PREV'||k, TRUE, NULL
            FROM c WHERE k%3=0
            UNION ALL
            SELECT 'Al'||k, 'HGNC:'||k, FALSE, 'AL'||k, TRUE, NULL
            FROM c WHERE k%4=0
        """,
        "refseq_ladder": """
            WITH p AS (SELECT p_partkey AS k FROM part)
            SELECT 'gene' AS biotype, CAST(k AS VARCHAR) AS sourceId,
                   CAST(NULL AS VARCHAR) AS sourceIdVersion FROM p
            UNION ALL SELECT 'transcript', 'NM_'||k, CAST(k%9+1 AS VARCHAR) FROM p
            UNION ALL SELECT 'transcript', 'NM_'||k, NULL FROM p
            UNION ALL SELECT 'protein', 'NP_'||k, CAST(k%5+1 AS VARCHAR) FROM p WHERE k%3<>0
            UNION ALL SELECT 'protein', 'NP_'||k, NULL FROM p WHERE k%3<>0
        """,
        "fda_srs_load": """
            SELECT 'U'||s_suppkey AS sourceId, 'drug'||s_suppkey AS name,
                   CASE WHEN s_suppkey%2=0 AND s_suppkey%40>=25
                        THEN 'ncit therapy not found: C'||(s_suppkey%40) END AS _error
            FROM supplier WHERE s_suppkey%7<>0
        """,
        "chembl_load": """
            WITH p AS (SELECT p_partkey AS k FROM part),
            d AS (SELECT k,
                    CASE WHEN k%2=0 THEN 'CHEMBL' ELSE 'chembl' END || k AS id,
                    CASE WHEN k%3<>0 THEN 'drug'||k ELSE 'C'||k||'H2' END AS name,
                    'C'||k||'H2' AS mol
                  FROM p)
            SELECT id AS sourceId, name, name||' ['||upper(id)||']' AS displayName,
                   mol AS molecularFormula, CAST(NULL AS VARCHAR) AS comment
            FROM d
            UNION ALL
            SELECT DISTINCT 'stem'||(k%3), 'stem'||(k%3), 'stem'||(k%3),
                   CAST(NULL AS VARCHAR), 'usan stem definition'
            FROM p WHERE k%5=0
        """,
        "asco_abstracts": """
            WITH c AS (SELECT c_custkey AS k FROM customer),
            g AS (SELECT k//2 AS g, MAX(k%2) AS has_odd FROM c GROUP BY k//2)
            SELECT CAST(g AS VARCHAR) AS abstractNumber,
                   CASE WHEN has_odd=1 THEN 'auth'||g END AS authors,
                   'M'||(g%5)||' (abstract '||g||')' AS displayName,
                   'M'||(g%5) AS meeting,
                   't'||g AS name,
                   'a'||(2*g+has_odd) AS sourceId,
                   CASE WHEN has_odd=1 THEN 'u'||g END AS url,
                   CAST(2010+g%7 AS INTEGER) AS year
            FROM g
        """,
        "fda_approvals_year": """
            SELECT '/'||p_partkey AS sourceId, 'T'||p_partkey AS name,
                   'T'||p_partkey AS displayName,
                   'https://www.fda.gov/'||p_partkey AS url,
                   CASE WHEN p_partkey%3=0
                        THEN CAST(2000+p_partkey%20 AS INTEGER) END AS year
            FROM part
        """,
        "pmc_fusions": """
            WITH s AS (SELECT s_suppkey AS k,
                   CASE WHEN s_suppkey%2=0 THEN 'yes' ELSE 'no' END AS ka,
                   CASE WHEN s_suppkey%3=0 THEN 'yes' ELSE 'no' END AS kb
                 FROM supplier)
            SELECT 'A'||k AS geneA, 'B'||k AS geneB,
                   CASE WHEN ka='yes' THEN 'A'||k ELSE 'B'||k END AS subject_gene,
                   '(A'||k||',B'||k||'):fusion(g.'||k||',g.'||(k+1)||')' AS variant_displayName,
                   'g.'||k AS break1Repr,
                   'likely gain of function' AS relevance,
                   CASE WHEN ka=kb THEN 'skipping: cannot determine kinase partner' END AS _error
            FROM s
        """,
        "pmc_functional": """
            WITH p AS (SELECT p_partkey AS k FROM part
                       WHERE p_partkey%5<>0 AND p_partkey%4<>1)
            SELECT 'g'||k AS gene,
                   'p.V'||(k%700+1)||'E' AS variant_notation,
                   CASE WHEN k%4=0 THEN 'likely gain of function'
                        WHEN k%4=2 THEN 'dominant negative'
                        ELSE 'loss of function' END AS relevance,
                   '25348012' || CASE WHEN k%2=0 THEN ',123,456' ELSE '' END AS evidence
            FROM p
        """,
        "docm_load": """
            WITH p AS (SELECT p_partkey AS k FROM part)
            SELECT 'h'||k AS hgvs,
                   CASE WHEN k%3=0 THEN 'p.K'||(k%700+1)||'_K'||(k%700+2)||'delKK'
                        ELSE 'p.G'||(k%700+1)||'D' END AS protein_notation,
                   (k%22+1) || ':g.' ||
                   CASE WHEN k%4=0 THEN k||'A>T'
                        WHEN k%4=1 THEN CASE WHEN k%2=0 THEN k||'delA'
                                             ELSE k||'_'||(k+1)||'delA' END
                        WHEN k%4=2 THEN k||'_'||(k+k%2)||'insT'
                        ELSE CASE WHEN k%2=0 THEN k||'delAinsT'
                                  ELSE k||'_'||(k+1)||'delAinsT' END
                   END AS genomic_notation,
                   'doid:'||(k%50) AS disease_doid,
                   CAST(k AS VARCHAR) AS pubmed_id,
                   'recurrent' AS relevance,
                   CASE WHEN k%5=0 THEN 'skip: disease tag count != 1' END AS _error
            FROM p
        """,
        "cgl_load": """
            WITH p AS (SELECT p_partkey AS k FROM part)
            SELECT 'NM_'||k AS transcript_id,
                   CAST(k%9+1 AS VARCHAR) AS transcript_version,
                   CASE WHEN k%11<>0 THEN 'c.'||k||'A>G' END AS cds_notation,
                   CASE WHEN k%4=0 THEN 'p.R'||(k%700+1)||'H'
                        WHEN k%4=1 THEN 'p.L'||(k%700+1)||'Ter'
                        WHEN k%4=2 THEN 'p.L'||(k%700+1)||'fs*3' END AS protein_notation,
                   CASE WHEN k%3=0 THEN 'g.100C>T'
                        WHEN k%3=1 THEN 'g.100_101delAG' END AS genomic_notation,
                   CASE WHEN k%11=0 THEN 'invalid HGVSc notation (x.1del)'
                        WHEN k%3=2 THEN 'unexpected ref vs alt combination' END AS _error
            FROM p
        """,
        "entrez_refseq": """
            WITH p AS (SELECT p_partkey AS k FROM part)
            SELECT 'Feature' AS cls,
                   CASE WHEN k%3=0 THEN 'transcript'
                        WHEN k%3=1 THEN 'protein'
                        ELSE 'chromosome' END AS biotype,
                   CASE WHEN k%10=0 THEN 'bogus'
                        ELSE CASE WHEN k%3=0 THEN 'NM_' WHEN k%3=1 THEN 'NP_'
                             ELSE 'NC_' END || k END AS sourceId,
                   CASE WHEN k%10=0 THEN NULL
                        ELSE CAST(k%7+1 AS VARCHAR) END AS sourceIdVersion,
                   CASE WHEN k%10=0 THEN 'BOGUS'
                        ELSE CASE WHEN k%3=0 THEN 'NM_' WHEN k%3=1 THEN 'NP_'
                             ELSE 'NC_' END || k || '.' || (k%7+1) END AS displayName,
                   'title '||k AS longName,
                   CASE WHEN k%3=2 THEN CAST(k%22+1 AS VARCHAR) END AS name,
                   CASE WHEN k%10=0
                        THEN 'spec: accessionversion (^N[A-Z]_\\d+\\.\\d+$) / biomol / title'
                   END AS _error
            FROM p
        """,
        "gsc_ontology": """
            WITH s AS (SELECT s_suppkey AS k FROM supplier)
            SELECT 'drug'||k AS name, 'drug'||k AS sourceId, '' AS subsets
            FROM s WHERE k%2=1
            UNION ALL
            SELECT 'alias'||k, 'alias'||k, '' FROM s WHERE k%4=0
            UNION ALL
            SELECT DISTINCT 'class'||(k%10)||' inhibitor', 'class'||(k%10)||' inhibitor',
                   'specific drug class' FROM s
            UNION ALL
            SELECT DISTINCT 'family'||(k%5), 'family'||(k%5), 'general drug class' FROM s
            UNION ALL
            SELECT DISTINCT 'pathway'||(k%3), 'pathway'||(k%3), 'pathway drug class' FROM s
        """,
        # full rid-algebra replica of statements -> load_variants linking:
        # same content hashes, COMPLEX genomic forms quarantined (no
        # 'indel' vocabulary) so their Infers edge is absent
        "statement_variant_link": """
            WITH p AS (SELECT p_partkey AS k FROM part WHERE p_partkey % 5 <> 0),
            built AS (
              SELECT k,
                     'h' || k AS sourceId,
                     'g' || k || ':' ||
                     CASE WHEN k%3=0 THEN 'p.K'||(k%700+1)||'_K'||(k%700+2)||'delKK'
                          ELSE 'p.G'||(k%700+1)||'D' END AS prot_note,
                     (k%22+1) || ':g.' ||
                     CASE WHEN k%4=0 THEN k||'A>T'
                          WHEN k%4=1 THEN CASE WHEN k%2=0 THEN k||'delA'
                                               ELSE k||'_'||(k+1)||'delA' END
                          WHEN k%4=2 THEN k||'_'||(k+k%2)||'insT'
                          ELSE CASE WHEN k%2=0 THEN k||'delAinsT'
                                    ELSE k||'_'||(k+1)||'delAinsT' END
                     END AS gen_note,
                     'doid:'||(k%50) AS disease_doid
              FROM p),
            hashed AS (
              SELECT *,
                     md5('{"cls":"PositionalVariant","displayName":"' || prot_note
                         || '","source":"docm-demo"}') AS variant_rid,
                     md5('{"cls":"PositionalVariant","displayName":"' || gen_note
                         || '","source":"docm-demo"}') AS genomic_rid
              FROM built)
            SELECT sourceId, variant_rid, genomic_rid, disease_doid,
                   'recurrent' AS relevance,
                   TRUE AS variant_found,
                   k % 4 <> 3 AS infers_ok,
                   array_to_string(list_sort([variant_rid, disease_doid]), '|')
                     AS conditions_str
            FROM hashed
        """,
        "source_registry": """
            WITH r(name, "displayName", url, usage, version, sort) AS (
              VALUES """ + _registry_values() + """)
            SELECT md5('{"cls":"Source","name":"' || name || '"}') AS rid,
                   name, "displayName", url, usage, version, sort
            FROM r
        """,
        # full replica of the CIViC sync composition: publication / disease /
        # evidence-level resolution + relevance + DNF + therapy grouping +
        # conditions/content-key build, with identical md5 stable-hash ids
        "civic_sync": _civic_pipeline_ctes() + """
            SELECT k, source_type, publication_rid, disease_rid, evidence_level_rid,
                   relevance, therapy,
                   array_to_string(conditions, '|') AS conditions_str,
                   md5('{"conditions":["' || array_to_string(conditions, '","')
                       || '"],"relevance":'
                       || CASE WHEN relevance IS NULL THEN 'null'
                               ELSE '"' || relevance || '"' END
                       || ',"sourceId":"' || sourceId || '"}') AS content_key,
                   coalesce(pub_error, disease_error,
                            CASE WHEN relevance IS NULL
                                 THEN 'untranslatable relevance' END) AS err
            FROM final
        """,
        # the reconcile write-half on the same pipeline: stored rows are
        # the even-k candidates (strong-key matches -> update keeping the
        # stored rid) plus per-source tombstones (no counterpart -> delete);
        # odd-k candidates have no stored row -> create
        "civic_sync_reconcile": _civic_pipeline_ctes() + """
            , scored AS (
              SELECT k, sourceId, conditions, relevance,
                     md5('{"conditions":["' || array_to_string(conditions, '","')
                         || '"],"relevance":'
                         || CASE WHEN relevance IS NULL THEN 'null'
                                 ELSE '"' || relevance || '"' END
                         || ',"sourceId":"' || sourceId || '"}') AS content_key,
                     coalesce(pub_error, disease_error,
                              CASE WHEN relevance IS NULL
                                   THEN 'untranslatable relevance' END) AS err
              FROM final),
            cand AS (
              SELECT DISTINCT k, sourceId, conditions, relevance, content_key
              FROM scored WHERE err IS NULL)
            SELECT sourceId, array_to_string(conditions, '|') AS conditions_str,
                   relevance, 'st_' || content_key AS rid, 'update' AS action
            FROM cand WHERE k % 2 = 0
            UNION ALL
            SELECT sourceId, array_to_string(conditions, '|'), relevance,
                   content_key, 'create'
            FROM cand WHERE k % 2 = 1
            UNION ALL
            SELECT DISTINCT sourceId, 'ZZZ' || sourceId, 'tombstone',
                   'del_' || sourceId, 'delete'
            FROM cand WHERE k % 2 = 0
        """,
    }
    # retrieval eval composes the two (already-verified) ANN oracles:
    # recall@5 and MRR of the quantized pipeline vs the exact one.
    oracles["ann_recall_eval"] = f"""
        WITH e0 AS (SELECT * FROM ({oracles["embedding_topk"]})),
        a0 AS (SELECT * FROM ({oracles["embedding_quantized_topk"]})),
        j AS (SELECT e0.query_id, e0.neighbor_id, e0.rank AS erank,
                     a0.rank AS arank
              FROM e0 LEFT JOIN a0
                ON e0.query_id = a0.query_id
               AND e0.neighbor_id = a0.neighbor_id),
        r AS (SELECT query_id, round(count(arank) / 5.0, 4) AS recall_at_5
              FROM j GROUP BY query_id),
        m AS (SELECT query_id, round(coalesce(1.0 / arank, 0.0), 4) AS mrr
              FROM j WHERE erank = 1)
        SELECT r.query_id, recall_at_5, mrr
        FROM r JOIN m ON r.query_id = m.query_id
    """
    # streaming near-dup suppression: id-ordered arrival makes the
    # stream equal to the static keep-lowest-id rule, so its oracle is
    # the minhash_lsh pair replica with the final select flipped to
    # per-document keep flags.
    oracles["stream_minhash_dedup"] = oracles["minhash_lsh"].replace(
        "SELECT id_a, id_b, round(j, 4) AS jaccard FROM jac WHERE j >= 0.6",
        "SELECT d.doc_id, dx.id_b IS NULL AS keep FROM documents d "
        "LEFT JOIN (SELECT DISTINCT id_b FROM jac WHERE j >= 0.6) dx "
        "ON d.doc_id = dx.id_b",
    )
    return oracles
