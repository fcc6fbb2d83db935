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
from graphkb_spark.operators.skew import ensure_scan_parallelism
from graphkb_spark.operators.corpus import PRETRAINED_BPE_MERGES
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
    # Build the notation AFTER the starved-scan repartition below: the
    # scan is a single parquet row group at sf0.1 (1 effective task),
    # so generating the concat strings there serialized ~0.7 s of CPU
    # AND inflated the exchange from 3 numeric columns to 11 MB of
    # strings (opt r17, guide §2.3 project-before-exchange + §2.5).
    # Row-wise deterministic exprs — identical results either side of
    # the exchange.
    src = ensure_scan_parallelism(
        t["lineitem"].select("l_orderkey", "l_partkey", "l_linenumber")
    ).select(
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


def q_soft_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft dedup (Muennighoff et al. 2023): duplicate copies keep
    sampling weight 1/n_copies instead of being dropped — each cluster
    contributes one doc-equivalent of mass. Duplicates are planted by
    unioning an id-shifted copy of every 5th document (cluster size 2
    for 100 of 500 docs), replicated identically in the oracle."""
    from graphkb_spark.operators.dedup import soft_dedup_sample

    t = _t(spark, sf_dir, "documents")
    docs = t["documents"].select("doc_id", "text")
    dup = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    return soft_dedup_sample(docs.unionByName(dup), "text", "doc_id")


def q_unimax_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax mixture budget allocation (Chung et al. 2023): 250k-char
    budget over the 5 language strata at a 2-epoch cap — the 4 small
    languages cap at 2 epochs, en takes the uniform remainder (both
    branches of the waterfilling closed form exercised at sf0.01)."""
    from graphkb_spark.operators.sampling import unimax_budget

    t = _t(spark, sf_dir, "documents")
    return unimax_budget(
        t["documents"], "lang", "n_chars", budget=250_000, max_epochs=2.0
    )


def q_unimax_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized UniMax mixture: per-doc repeat counts under the
    250k-char / 2-epoch allocation — the 4 capped languages repeat
    fully twice, en takes 1 full pass + a deterministic
    hash-ordered partial pass."""
    from graphkb_spark.operators.sampling import unimax_sample

    t = _t(spark, sf_dir, "documents")
    return unimax_sample(
        t["documents"], "lang", "n_chars", "doc_id",
        budget=250_000, max_epochs=2.0,
    )


def q_ngram_jaccard_routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The candidate-budget guard's escape hatch, oracle-checked end
    to end (VERDICT r11 #1): budget 0 forces the route-to-minhash
    action; with the md5 hasher and the minhash_lsh band parameters
    the routed output IS the auditable banding pipeline, so the
    DuckDB banding oracle verifies the escape hatch bit-for-bit —
    not just that it returns rows."""
    import warnings as _warnings

    from graphkb_spark.operators.dedup import ngram_jaccard_pairs

    t = _t(spark, sf_dir, "documents")
    with _warnings.catch_warnings():
        _warnings.simplefilter("ignore", RuntimeWarning)
        out = ngram_jaccard_pairs(
            t["documents"], "text", "doc_id", shingle_n=3, threshold=0.6,
            candidate_budget=0, budget_action="minhash",
            route_kwargs={"num_hashes": 32, "bands": 16, "hasher": "md5"},
        )
    return out.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


def q_ngram_containment_routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The containment join's budget-guard escape hatch (VERDICT r12
    #3), oracle-checked end to end: budget 0 forces the route to
    containment_lsh_pairs; with the md5 hasher the banding pipeline
    and the DIRECTED containment verify over hashed shingle sets are
    both plain ANSI arithmetic, so the DuckDB oracle replicates the
    routed output bit-for-bit — banding soundness and orientation
    included, not just row counts."""
    import warnings as _warnings

    from graphkb_spark.operators.dedup import ngram_containment_pairs

    t = _t(spark, sf_dir, "documents")
    with _warnings.catch_warnings():
        _warnings.simplefilter("ignore", RuntimeWarning)
        out = ngram_containment_pairs(
            t["documents"], "text", "doc_id", shingle_n=3, threshold=0.6,
            candidate_budget=0, budget_action="minhash",
            route_kwargs={"num_hashes": 32, "bands": 16, "hasher": "md5"},
        )
    return out


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
    """Near-dup clustering: MinHash-LSH verified pairs collapsed into
    canonical groups (the canonical-doc step after pair generation;
    operators/dedup.py connected_components, algorithm='auto' —
    min-label propagation with the star-contraction escalation for
    high-diameter graphs). Pair input switched from the exact n-gram
    prefix join to the banded MinHash join in round 11 (VERDICT r10
    #1): the scale probe showed prefix-join candidates growing
    quadratically under fixed-vocabulary corpus growth, while the
    banded join's x10 wall is ~3.6x — the pair generator every
    100-TB dedup pipeline actually feeds CC with. Iterative DataFrame
    algorithm — per-round convergence actions are part of the
    operator's contract."""
    from graphkb_spark.operators.dedup import connected_components

    t = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        t["documents"], "text", "doc_id",
        num_hashes=32, bands=16, jaccard_threshold=0.6, hasher="md5",
    )
    return connected_components(
        pairs.select("id_a", "id_b"),
        t["documents"].select("doc_id"),
        id_col="doc_id",
        algorithm="auto",
    )


def q_dedup_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same clustering contract as dedup_components, computed by the
    alternating large-star/small-star contraction (Kiveris et al.) —
    the O(log^2 n)-round path for high-diameter pair graphs where
    min-label propagation's O(diameter) rounds would dominate (the
    'auto' default only escalates to it on demand; this query pins the
    pure-star path). Shares dedup_components' oracle and MinHash pair
    input: the output is definitionally identical (min reachable id
    per node)."""
    from graphkb_spark.operators.dedup import connected_components

    t = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        t["documents"], "text", "doc_id",
        num_hashes=32, bands=16, jaccard_threshold=0.6, hasher="md5",
    )
    return connected_components(
        pairs.select("id_a", "id_b"),
        t["documents"].select("doc_id"),
        id_col="doc_id",
        algorithm="star",
    )


def q_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring repeated-passage detection (Lee et al. 2022
    ExactSubstr, distributed as a k-gram postings profile): maximal
    per-document spans of 5-token grams occurring >= 2 times in the
    corpus — the spans a cleaning pass would cut (operators/dedup.py
    repeated_spans). Positions are 0-based inclusive token indexes;
    the 60-bit gram digest is ANSI md5 arithmetic, so the oracle
    reproduces spans exactly."""
    from graphkb_spark.operators.dedup import repeated_spans

    t = _t(spark, sf_dir, "documents")
    return repeated_spans(t["documents"], "text", "doc_id", k=5, min_count=2)


def q_repeated_span_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr cleaning pass: cut every repeated 5-gram passage
    (corpus count >= 2) out of each document — (doc_id, n_tokens,
    removed_tokens, clean_text) over the normalized token stream
    (operators/dedup.py cut_repeated_spans). The oracle rebuilds the
    spans with the identical digest pipeline and re-joins the kept
    tokens in order."""
    from graphkb_spark.operators.dedup import cut_repeated_spans

    t = _t(spark, sf_dir, "documents")
    return cut_repeated_spans(t["documents"], "text", "doc_id", k=5, min_count=2)


def q_exactsubstr_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3-style exact 8-gram benchmark decontamination: every 50th
    document plays the eval set; a corpus doc is contaminated if it
    shares ANY 8-token exact span with it (operators/dedup.py
    exact_substring_contamination — broadcast bench digests, corpus
    gram stream never shuffles). Complements the overlap-fraction
    `decontaminate` query: this one trips on a single verbatim leak."""
    from graphkb_spark.operators.dedup import exact_substring_contamination

    t = _t(spark, sf_dir, "documents")
    bench = t["documents"].filter(F.col("doc_id") % 50 == 0)
    return exact_substring_contamination(
        t["documents"], bench, "text", "doc_id", k=8, min_hits=1
    )


def q_benchmark_leak_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-integrity report (r13): per eval item (every 50th doc),
    how many of its distinct 8-grams appear verbatim anywhere in the
    corpus and how many distinct corpus docs share one — the
    drop-compromised-questions direction of decontamination
    (operators/dedup.py benchmark_leak_report). Eval docs are also in
    the corpus here, so every item self-leaks via >= 1 doc; the
    interesting columns are leaking_docs > 1 and leaked_frac."""
    from graphkb_spark.operators.dedup import benchmark_leak_report

    t = _t(spark, sf_dir, "documents")
    bench = t["documents"].filter(F.col("doc_id") % 50 == 0)
    return benchmark_leak_report(
        t["documents"], bench, "text", "doc_id", k=8
    )


def q_benchmark_leak_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-span leak attribution (r14): for every (eval item, corpus
    doc) pair sharing a verbatim 8-gram, the maximal leaked span(s) in
    the corpus doc's normalized token stream — the forensic view that
    turns benchmark_leak_report's per-item leak fractions into the
    exact training passages responsible (operators/dedup.py
    benchmark_leak_spans). Eval docs (every 50th) self-attribute as
    full-document spans; cross-doc rows are the real leaks."""
    from graphkb_spark.operators.dedup import benchmark_leak_spans

    t = _t(spark, sf_dir, "documents")
    bench = t["documents"].filter(F.col("doc_id") % 50 == 0)
    return benchmark_leak_spans(
        t["documents"], bench, "text", "doc_id", k=8
    )


def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split (r14): near-dup components
    (MinHash-LSH pairs -> CC, the dedup_components contract) hashed to
    splits BY COMPONENT, so no near-dup cluster ever straddles the
    test boundary — The Stack / StarCoder recipe (operators/dedup.py
    leakage_safe_split). Complements split_assign (per-doc hash) and
    split_leakage (the detector this construction makes return
    zero)."""
    from graphkb_spark.operators.dedup import leakage_safe_split

    t = _t(spark, sf_dir, "documents")
    return leakage_safe_split(
        t["documents"], "text", "doc_id",
        num_hashes=32, bands=16, jaccard_threshold=0.6, hasher="md5",
    )


def q_benchmark_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-benchmark contamination matrix (r14): four synthetic eval
    sets (every 5th doc, bucketed by doc_id % 4) audited pairwise for
    verbatim 8-gram overlap — directed containment + Jaccard per
    ordered set pair, the which-benchmarks-leak-into-each-other view
    (operators/dedup.py benchmark_overlap_matrix). Duplicated corpus
    passages land in different buckets, so off-diagonal overlap is
    real, not an artifact."""
    from graphkb_spark.operators.dedup import benchmark_overlap_matrix

    t = _t(spark, sf_dir, "documents")
    bench = t["documents"].filter(F.col("doc_id") % 5 == 0).withColumn(
        "bench_set", F.col("doc_id") % 4
    )
    return benchmark_overlap_matrix(bench, "text", "bench_set", k=8)


def q_stream_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingestion-side decontamination (r13): documents
    arrive in 4 micro-batches and each batch probes the static eval
    digest table (every 50th doc, 8-grams) before landing — stateless
    per batch, so the stream output is value-hash verified against
    the BATCH exactsubstr oracle (streaming/incremental.py
    streaming_decontaminate)."""
    from graphkb_spark.streaming.incremental import streaming_decontaminate

    t = _t(spark, sf_dir, "documents")
    bench = t["documents"].filter(F.col("doc_id") % 50 == 0)
    suffix = "".join(
        c if c.isalnum() else "_" for c in sf_dir.rstrip("/").rsplit("/", 1)[-1]
    )
    return streaming_decontaminate(
        spark, t["documents"], bench, "doc_id", "text", k=8, min_hits=1,
        query_name=f"q_stream_decon_{suffix}",
    )


def q_decontaminate_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination surgery (r13): cut every verbatim 8-gram leak
    of the eval set (every 50th doc) out of the corpus instead of
    flagging whole documents — merged leak spans removed from the
    normalized token stream, the FineWeb-style recipe
    (operators/dedup.py cut_contaminated_spans). The eval docs
    themselves are fully self-leaked and come back empty; ordinary
    docs lose only overlapping passages."""
    from graphkb_spark.operators.dedup import cut_contaminated_spans

    t = _t(spark, sf_dir, "documents")
    bench = t["documents"].filter(F.col("doc_id") % 50 == 0)
    return cut_contaminated_spans(
        t["documents"], bench, "text", "doc_id", k=8
    )


def q_multi_benchmark_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suite-level decontamination surgery (r15): ONE corpus pass cuts
    every verbatim 8-gram leak of the UNION of four synthetic eval
    sets (every 5th doc, bucketed by doc_id % 4 — the
    benchmark_overlap_matrix suite) and attributes each document's
    leaks per benchmark set — the production FineWeb/Dolma shape
    (operators/dedup.py cut_multi_benchmark_spans): N eval sets, one
    corpus scan, spans cut once against the union, "set=hits" pairs
    per doc. Eval docs self-leak fully; cross-set duplicates show up
    as multi-set attributions."""
    from graphkb_spark.operators.dedup import cut_multi_benchmark_spans

    t = _t(spark, sf_dir, "documents")
    bench = t["documents"].filter(F.col("doc_id") % 5 == 0).withColumn(
        "bench_set", F.col("doc_id") % 4
    )
    return cut_multi_benchmark_spans(
        t["documents"], bench, "text", "doc_id", "bench_set", k=8
    )


def q_multi_benchmark_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suite-level decontamination FLAG (r15): one corpus pass against
    the union of four synthetic eval sets' 8-gram digests (every 5th
    doc, doc_id % 4), flagging each training doc and attributing its
    leaks per benchmark set — the whole-doc companion to the
    multi_benchmark_decontaminate surgery (operators/dedup.py
    multi_benchmark_contamination; single-aggregation probe, zero
    joins after the broadcast)."""
    from graphkb_spark.operators.dedup import multi_benchmark_contamination

    t = _t(spark, sf_dir, "documents")
    bench = t["documents"].filter(F.col("doc_id") % 5 == 0).withColumn(
        "bench_set", F.col("doc_id") % 4
    )
    return multi_benchmark_contamination(
        t["documents"], bench, "text", "doc_id", "bench_set", k=8, min_hits=1
    )


def q_stream_multi_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming suite-level decontamination gate (r15): documents
    arrive in 4 micro-batches, each probed against the static
    (set, digest) union of the four eval sets — per-doc flag AND
    per-benchmark attribution, stateless per batch, value-hash
    verified against the BATCH multi_benchmark_flag oracle
    (streaming/incremental.py streaming_multi_decontaminate)."""
    from graphkb_spark.streaming.incremental import (
        streaming_multi_decontaminate,
    )

    t = _t(spark, sf_dir, "documents")
    bench = t["documents"].filter(F.col("doc_id") % 5 == 0).withColumn(
        "bench_set", F.col("doc_id") % 4
    )
    suffix = "".join(
        c if c.isalnum() else "_" for c in sf_dir.rstrip("/").rsplit("/", 1)[-1]
    )
    return streaming_multi_decontaminate(
        spark, t["documents"], bench, "bench_set", "doc_id", "text",
        k=8, min_hits=1, query_name=f"q_stream_multi_decon_{suffix}",
    )


def q_multi_benchmark_leak_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suite-level eval-integrity report (r16 — the reverse direction
    of the multi-benchmark family): per item of the four synthetic
    eval sets (every 5th doc, doc_id % 4), how many of its distinct
    8-grams appear verbatim anywhere in the corpus, how many distinct
    corpus docs share one, and WHICH corpus doc shares the most
    (worst_doc, ties to the smallest id) — N eval sets audited in ONE
    corpus scan instead of N benchmark_leak_report passes
    (operators/dedup.py multi_benchmark_leak_report). Eval docs are
    also in the corpus, so every item self-leaks; the forensic
    columns are leaking_docs > 1 and the worst-doc attribution."""
    from graphkb_spark.operators.dedup import multi_benchmark_leak_report

    t = _t(spark, sf_dir, "documents")
    bench = t["documents"].filter(F.col("doc_id") % 5 == 0).withColumn(
        "bench_set", F.col("doc_id") % 4
    )
    return multi_benchmark_leak_report(
        t["documents"], bench, "text", "doc_id", "bench_set", k=8
    )


def q_multi_benchmark_leak_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suite-level per-span leak attribution (r16 — completes the
    multi-benchmark matrix): for every (eval item, corpus doc) pair of
    the four synthetic sets (every 5th doc, doc_id % 4) sharing a
    verbatim 8-gram, the maximal leaked span(s) in the corpus doc's
    token stream with the item's set label carried through — N sets
    adjudicated from one corpus tokenize+digest pass
    (operators/dedup.py multi_benchmark_leak_spans). Eval docs
    self-attribute as full-document spans; cross-doc rows are the
    real leaks."""
    from graphkb_spark.operators.dedup import multi_benchmark_leak_spans

    t = _t(spark, sf_dir, "documents")
    bench = t["documents"].filter(F.col("doc_id") % 5 == 0).withColumn(
        "bench_set", F.col("doc_id") % 4
    )
    return multi_benchmark_leak_spans(
        t["documents"], bench, "text", "doc_id", "bench_set", k=8
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
    from graphkb_spark.operators.skew import ensure_scan_parallelism

    t = _t(spark, sf_dir, "embeddings")
    # the int8 candidate crossJoin + map-side top-m window inherit the
    # embeddings scan's partitioning (one row group at small SF -> one
    # task for the whole quantized scoring pass, profiled ~0.5 s CPU);
    # conditional spread, plan-time no-op on splittable inputs (§2.5)
    emb = ensure_scan_parallelism(
        t["embeddings"].withColumn(
            "embedding", F.col("embedding").cast("array<double>")
        )
    )
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
    from graphkb_spark.operators.skew import ensure_scan_parallelism

    t = _t(spark, sf_dir, "documents")
    # pure regex map over the scan — one row group at small SF ran the
    # whole marker-count pass on one task (profiled 467 ms single-task
    # CPU stage); conditional spread is a plan-time no-op on splittable
    # inputs (guide §2.5)
    docs = ensure_scan_parallelism(t["documents"].select("doc_id", "lang", "text"))
    return docs.select(
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


def q_ivf_nprobe_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF recall-vs-nprobe tuning curve (r17): micro recall@5 of the
    embedding_ivf configuration (8 deterministic centroids) for EVERY
    nprobe 1..8 from one plan — a truth pair is retrieved at width p
    iff its cell's rank in the query's centroid ordering is <= p, so
    the whole grid is a cumulative count, no per-config re-execution
    (the lsh_band_tuning trick applied to IVF ANN)."""
    from graphkb_spark.operators.similarity import ivf_nprobe_tuning

    t = _t(spark, sf_dir, "embeddings")
    emb = t["embeddings"].withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    return ivf_nprobe_tuning(
        emb, emb.filter(F.col("vec_id") < 5), k=5, n_centroids=8
    )


def q_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space eval-set decontamination (r17): every 40th
    vector plays the eval suite; for each remaining corpus vector the
    max cosine against ANY eval item, nearest item attributed,
    flagged at 0.3 — the semantic sibling of the n-gram
    decontamination family (catches paraphrased leaks; the broadcast-
    eval + partial-argmax plan is the production shape for KB-sized
    eval suites against a 100 TB corpus)."""
    from graphkb_spark.operators.similarity import semantic_decontaminate

    t = _t(spark, sf_dir, "embeddings")
    emb = t["embeddings"].withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    return semantic_decontaminate(
        emb.filter(F.col("vec_id") % 40 != 0),
        emb.filter(F.col("vec_id") % 40 == 0),
        threshold=0.3,
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


def q_bloom_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-gated exact segment dedup (the Dolma/BFF paragraph-dedup
    staple, r17): same first-global-occurrence contract and oracle as
    segment_dedup, computed BFF-style — a duplicate-digest pass whose
    corpus-wide exchange carries 16-byte digests instead of the full
    text, a bounded driver Bloom filter over the duplicate digests,
    and a probe pass where filter MISSES (the unique majority) bypass
    the verify join at scan speed. The filter prunes the plan, never
    the answer (no false negatives; false positives resolve via the
    left join's null keeper)."""
    from graphkb_spark.operators.dedup import bloom_segment_dedup

    t = _t(spark, sf_dir, "documents")
    return bloom_segment_dedup(
        t["documents"].select("doc_id", "text"), "doc_id", "text",
        seg_words=16, num_bits=1 << 20,
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


def q_multiple_regression_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sums="int64" engine of the same regression (r15, VERDICT
    r14 #4): <=4-decimal-exact products scaled to BIGINT and summed at
    full codegen speed, divided back as decimal so the result is
    bit-identical to the DECIMAL(38,10) path (and to the SAME oracle)
    up to the loud 2^63 overflow bound. The bounded-group fast path
    the FLOORS decomposition advertises, now driver-oracle-checked."""
    from graphkb_spark.operators.aggregate import grouped_normal_equations

    t = _t(spark, sf_dir, "lineitem")
    return grouped_normal_equations(
        t["lineitem"],
        ["l_returnflag"],
        "l_quantity",
        "l_discount",
        "l_extendedprice",
        sums="int64",
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
    # percentile's partial aggregation (per-task value->freq maps over
    # 600k rows) is CPU-dense and runs at the scan's 3-row-group
    # parallelism at sf0.1; repartition the 3 needed columns only when
    # the scan is starved (plan-time no-op at scale; opt r17, §2.5)
    src = ensure_scan_parallelism(
        t["lineitem"].select("l_returnflag", "l_quantity", "l_extendedprice")
    )
    return src.groupBy("l_returnflag").agg(
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


def _civic_statement_candidates(
    spark: SparkSession, sf_dir: str, spread_scan: bool | int = False
) -> DataFrame:
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

    from graphkb_spark.operators.skew import ensure_scan_parallelism

    t = _t(spark, sf_dir, "orders", "customer", "nation")
    k = F.col("o_orderkey")
    aid = (k % 400).cast("int")
    vs = (k % 97).cast("string")
    v2 = (k % 97 + 1).cast("string")
    # the evidence pipeline from this scan to the statement build is
    # one broadcast-join-only stage (no exchange), so its parallelism
    # is the SCAN's — a single row group at small SF serialized the
    # DNF Arrow UDF, both explodes and the content-key md5 onto one
    # core (profiled: 1-task / ~1 s-CPU final stage). Conditional
    # round-robin of the narrow 2-column slice fixes the starved
    # regime and is a plan-time no-op on splittable inputs (§2.5).
    # Opt-in (spread_scan): the single-pass consumer civic_sync takes
    # the full-width spread (interleaved A/B 0.92x); the
    # checkpoint-fan-out consumer civic_sync_reconcile uses the CAPPED
    # 8-way spread (A/B 0.90x) — full width had measured 1.15x there
    # because its many small post-checkpoint jobs each pay 32
    # Python-worker round trips for the Arrow DNF UDF where fewer
    # tasks amortize them.
    ev_base = t["orders"].filter(k % 3 == 0).select("o_orderkey", "o_custkey")
    if spread_scan:
        # spread_scan=True -> defaultParallelism; an int caps the
        # spread (middle ground for checkpoint-fan-out consumers whose
        # many small post-checkpoint jobs pay per-task Python-worker
        # round trips at full width)
        ev_base = ensure_scan_parallelism(
            ev_base,
            min_parts=None if spread_scan is True else int(spread_scan),
        )
    ev = (
        ev_base
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
    out = _civic_statement_candidates(spark, sf_dir, spread_scan=True)
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
        # middle-ground spread (r17 A/B): full-width spread_scan=True
        # measured 1.15x here (32-task scheduling on the many small
        # post-checkpoint jobs), unspread leaves the ~1 s candidate
        # build single-task; 8-way parallelizes the Arrow DNF UDF +
        # explodes while keeping post-checkpoint task counts small
        _civic_statement_candidates(spark, sf_dir, spread_scan=8)
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


def q_bpe_train_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-based BPE training (VERDICT r11 #6): the merge chain
    learned on the 300 lowest-md5-digest documents — the bounded
    subcorpus a 100-TB run would train on before bpe_encode applies
    the frozen table to the full corpus. Oracle: the same unrolled
    CTE chain over the identical deterministic sample."""
    from graphkb_spark.operators.corpus import bpe_train_sampled

    t = _t(spark, sf_dir, "documents")
    return bpe_train_sampled(t["documents"], "text", n_merges=8, sample_docs=300)


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
    from graphkb_spark.operators.skew import ensure_scan_parallelism

    t = _t(spark, sf_dir, "embeddings")
    comps = [[((i * (k + 3)) % 7) - 3 for i in range(64)] for k in range(4)]
    # the projection is a pure map over the scan — one row group at
    # small SF ran the whole quantize+4-component dot pass on one task
    # (profiled 485 ms single-task CPU stage); conditional spread is a
    # plan-time no-op on splittable inputs (§2.5)
    out = project_quantized(
        ensure_scan_parallelism(t["embeddings"]), comps, "embedding"
    )
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
    themselves; exact windowed moments via the int64 engine (r15 —
    events.value carries <=2 decimals, so the scaled sums are exact
    and value-identical to the decimal path — PINNED at sf0.1 by
    tests/test_round8_ops.py::test_rolling_zscore_int64_matches_decimal_sf01
    (r16) — at ~1.4x less wall; the ROWS-bounded frame makes int64
    overflow structurally impossible)."""
    from graphkb_spark.operators.aggregate import rolling_zscore

    t = _t(spark, sf_dir, "events")
    out = rolling_zscore(
        t["events"].select("user_id", "ts", "event_id", "value"),
        "user_id",
        ["ts", "event_id"],
        "value",
        sums="int64",
    )
    return out.select(
        "user_id", "event_id", "roll_mean", "roll_std", "zscore", "is_anomaly"
    )


def q_rolling_zscore_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DECIMAL(38,10) default engine of the same trailing-20
    anomaly gate, registry-reachable in its own right (r16, VERDICT
    r15 missing #3 — the multiple_regression / multiple_regression_fast
    precedent): exact for decimal inputs whose SQUARE still fits
    decimal(38) — roughly 2*(precision+scale) <= 38; wider inputs hit
    Spark's allowPrecisionLoss scale truncation on c*c (ADVICE r16) —
    the 100 TB default when values may exceed the int64 path's
    4-decimal contract. Shares
    rolling_zscore's oracle — the engines are value-identical on
    <=2-decimal inputs (pinned at sf0.1 in tests), so the driver
    verifies the equivalence every round instead of assuming it."""
    from graphkb_spark.operators.aggregate import rolling_zscore

    t = _t(spark, sf_dir, "events")
    out = rolling_zscore(
        t["events"].select("user_id", "ts", "event_id", "value"),
        "user_id",
        ["ts", "event_id"],
        "value",
        sums="decimal",
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


def q_semantic_dedup_two(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with two-level (hierarchical) k-means assignment —
    the bounded-flops mode for k-grows-with-N (VERDICT r11 #2):
    k_coarse=ceil(sqrt(8))=3 coarse cells trained first, then 3 fine
    centroids per cell; a point only ever scores its own cell's fine
    codebook. Same within-cluster keep-lowest-id dedup policy."""
    from graphkb_spark.operators.dedup import semantic_dedup

    t = _t(spark, sf_dir, "embeddings")
    return semantic_dedup(
        t["embeddings"], "vec_id", "embedding", k=8, rounds=2, tau=0.35,
        assignment="two_level",
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


def q_categorical_dependence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical dependence profile (entropy / MI / NMI / chi-square
    / Cramer's V) of order priority vs order status — the
    feature-selection and label-leakage screen. Sparse-table chi2:
    sum over observed cells of ((o-e)^2/e - e) plus n covers the zero
    cells without generating them."""
    from graphkb_spark.operators.evaluation import categorical_dependence

    t = _t(spark, sf_dir, "orders")
    return categorical_dependence(t["orders"], "o_orderpriority", "o_orderstatus")


def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test on event values, first
    half-month vs second (psi_drift's bin-free companion): D found as
    an exact DECIMAL(38,0) ECDF cross-product max via the two-phase
    bucketed running sum — no unpartitioned window, no float ECDFs."""
    from graphkb_spark.operators.evaluation import ks_two_sample

    t = _t(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp")
    ev = t["events"].select(
        F.when(F.col("ts") < cut, F.lit("base")).otherwise(F.lit("cur")).alias(
            "period"
        ),
        "value",
    )
    return ks_two_sample(ev, "period", "value", "base", "cur")


def q_auc_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney ROC AUC of the first embedding dimension as a
    scorer for the low-label classes (label < 5): midrank sum per
    distinct score (exact under ties), two-phase bucketed running
    count, DECIMAL(38,0) rank arithmetic."""
    from graphkb_spark.operators.evaluation import auc_mann_whitney

    t = _t(spark, sf_dir, "embeddings")
    scored = t["embeddings"].select(
        (F.col("label") < 5).cast("long").alias("y"),
        F.col("embedding")[0].cast("double").alias("score"),
    )
    return auc_mann_whitney(scored, "y", "score")


def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins + ECE terms for a synthetic calibrated
    classifier: predicted probability and Bernoulli outcome both
    md5-derived from doc_id (content-free hash randomness, the
    split_assign contract), so the curve regenerates identically in
    any engine; 10 fixed-width bins."""
    from graphkb_spark.operators.evaluation import calibration_bins

    t = _t(spark, sf_dir, "documents")
    hp = F.conv(
        F.substring(F.md5(F.concat(F.lit("cal:p:"), F.col("doc_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("long") % 1000000
    hl = F.conv(
        F.substring(F.md5(F.concat(F.lit("cal:l:"), F.col("doc_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("long") % 1000000
    scored = t["documents"].select(
        (hp / F.lit(1000000.0)).alias("prob"),
        F.when(hl < hp, F.lit(1)).otherwise(F.lit(0)).alias("y"),
    )
    return calibration_bins(scored, "y", "prob", n_bins=10)


def q_weight_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-weight health per document source (the post-check
    for any weighted-sampling stage): Kish effective sample size,
    ESS ratio, max-weight share, and weight CV, with n_chars as the
    sampling weight."""
    from graphkb_spark.operators.evaluation import weight_diagnostics

    t = _t(spark, sf_dir, "documents")
    return weight_diagnostics(t["documents"], "source", "n_chars")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Ordering contract: the driver's correctness gate checks the FIRST 50
    # entries in insertion order, so the window ROTATES each round. The
    # rotation is an explicit list (_R17_WINDOW below) applied over the
    # registry literal, so each round edits a 50-name list instead of
    # reordering the dict — composition rationale lives on the list.
    all_q = {
        "categorical_dependence": q_categorical_dependence,
        "ks_drift": q_ks_drift,
        "auc_eval": q_auc_eval,
        "calibration_bins": q_calibration_bins,
        "weight_diagnostics": q_weight_diagnostics,
        "stream_minhash_dedup": q_stream_minhash_dedup,
        "semantic_dedup": q_semantic_dedup,
        "semantic_dedup_two": q_semantic_dedup_two,
        "lsh_band_tuning": q_lsh_band_tuning,
        "perplexity_buckets": q_perplexity_buckets,
        "heaps_fit": q_heaps_fit,
        "rolling_zscore": q_rolling_zscore,
        "rolling_zscore_decimal": q_rolling_zscore_decimal,
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
        "bloom_segment_dedup": q_bloom_segment_dedup,
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
        "multiple_regression_fast": q_multiple_regression_fast,
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
        "bpe_train_sampled": q_bpe_train_sampled,
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
        "ngram_jaccard_routed": q_ngram_jaccard_routed,
        "ngram_containment_routed": q_ngram_containment_routed,
        "dedup_exact": q_dedup_exact,
        "soft_dedup": q_soft_dedup,
        "unimax_budget": q_unimax_budget,
        "unimax_sample": q_unimax_sample,
        "dedup_components": q_dedup_components,
        "repeated_spans": q_repeated_spans,
        "repeated_span_cut": q_repeated_span_cut,
        "exactsubstr_decontaminate": q_exactsubstr_decontaminate,
        "decontaminate_cut": q_decontaminate_cut,
        "multi_benchmark_decontaminate": q_multi_benchmark_decontaminate,
        "multi_benchmark_flag": q_multi_benchmark_flag,
        "stream_multi_decontaminate": q_stream_multi_decontaminate,
        "stream_decontaminate": q_stream_decontaminate,
        "benchmark_leak_report": q_benchmark_leak_report,
        "multi_benchmark_leak_report": q_multi_benchmark_leak_report,
        "multi_benchmark_leak_spans": q_multi_benchmark_leak_spans,
        "benchmark_leak_spans": q_benchmark_leak_spans,
        "benchmark_overlap_matrix": q_benchmark_overlap_matrix,
        "leakage_safe_split": q_leakage_safe_split,
        "dedup_components_star": q_dedup_components_star,
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
        "semantic_decontaminate": q_semantic_decontaminate,
        "ivf_nprobe_tuning": q_ivf_nprobe_tuning,
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
    ordered = {k: all_q[k] for k in _R17_WINDOW}
    ordered.update((k, v) for k, v in all_q.items() if k not in ordered)
    return ordered


# The driver-gate window: first 50 registry entries, re-verified by the
# driver each round at sf0.01. See the ordering-contract note in
# queries(). Round-17 composition: (a) every query whose code or
# plan changed this round — the NEW bloom_segment_dedup (Dolma/BFF
# Bloom-gated paragraph dedup, shares segment_dedup's oracle), NEW
# semantic_decontaminate (embedding-space eval decontamination), and
# NEW ivf_nprobe_tuning (one-pass IVF recall-vs-nprobe curve);
# multi_benchmark_leak_report (totals no longer double-count an item
# listed under two set labels, ADVICE r16); bloom_join
# (bloom_prefilter_join's bitset became ONE binary plan literal AND
# _positions now derives all k bit positions from one md5);
# merge_upsert (merge.py grew simplify_record_links alongside it);
# top1_per_group / fallback_cascade / kb_ontology_load (resolve.py's
# preference comparator flipped to the reference's executable
# older/lower-version-wins semantics, VERDICT r16 #1 — these three
# exercise resolve_unique/cascade_resolve/kb end-to-end) — 9 names;
# (b) the least-recently-driver-checked tail — the final 9 round-11
# names (clearing the r11 residue entirely), then the first 32
# round-12 names, alphabetical. Staleness computed from the union of
# CORRECTNESS_r0*.json driver windows; the residue for round 18 is
# the last 13 round-12 names (simhash, soft_dedup, source_registry,
# split_assign, stream_dedup, streaming_sessions,
# streaming_sessions_native, temperature_sample, transition_matrix,
# version_chain, vocab_build, weighted_percentiles, windowed_counts)
# — all green in the full local sweep this round.
_R17_WINDOW = [
    # (a) new/changed in round 17
    "bloom_segment_dedup",
    "semantic_decontaminate",
    "ivf_nprobe_tuning",
    "multi_benchmark_leak_report",
    "bloom_join",
    "merge_upsert",
    "top1_per_group",
    "fallback_cascade",
    "kb_ontology_load",
    # (b) stalest: the final 9 round-11 names
    "range_join",
    "reconcile",
    "segment_dedup",
    "statement_variant_link",
    "stream_interval_join",
    "tfidf_topk",
    "token_budget_sample",
    "token_count",
    "variant_load",
    # (b) stalest: first 34 round-12 names, alphabetical
    "attribution",
    "bpe_train_sampled",
    "canonical_docs",
    "citation_phase_year",
    "combo_naming",
    "cooccurrence",
    "cross_expansion",
    "dedup_against",
    "dedup_components",
    "dedup_components_star",
    "diversity_report",
    "docm_fix",
    "embedding_dim_stats",
    "embedding_project",
    "explode_expansion",
    "funnel",
    "gram_matrix",
    "interpolate",
    "kfold_assign",
    "kmeans_train",
    "kmv_distinct_merged",
    "linear_attribution",
    "lm_score",
    "lsh_band_tuning",
    "mixture_interleave",
    "oncokb_names",
    "repeated_span_cut",
    "repeated_spans",
    "repetition_score",
    "semantic_dedup",
    "semantic_dedup_two",
    "sequence_pack",
]
assert len(_R17_WINDOW) == 50, (
    f"driver gate window must be exactly 50 names, got {len(_R17_WINDOW)}"
)
assert len(set(_R17_WINDOW)) == 50, "duplicate name in _R17_WINDOW"


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every registry query.

    The ~4.4k-line oracle block lives in ``graphkb_spark/oracles.py``
    (split out in round 9 so this driver file stays reviewable); this
    delegate keeps the driver contract — ``oracle_sql()`` here —
    byte-identical to the pre-split output (sha256-checked when the
    split landed).
    """
    from graphkb_spark.oracles import build_oracles

    return build_oracles()
