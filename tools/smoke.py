"""Quick local smoke of the core operators against sf0.001."""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from graphkb_spark.session import get_spark, load_tables

spark = get_spark("smoke", cpus=8)
t = load_tables(
    spark,
    "/root/testdata/sf0.001",
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
)

print("=== filter DSL ===")
from graphkb_spark.plans import run_query

q = {
    "target": "orders",
    "filters": {
        "AND": [
            {"o_orderstatus": "O"},
            {
                "OR": [
                    {"o_orderpriority": ["1-URGENT", "2-HIGH"]},
                    {"o_totalprice": {"operator": ">", "value": 200000}},
                ]
            },
            {"o_custkey": {"target": "customer", "key": "c_custkey",
                           "filters": {"c_mktsegment": "BUILDING"}}},
        ]
    },
    "returnProperties": ["o_orderkey", "o_totalprice"],
    "orderBy": ["o_orderkey"],
    "limit": 5,
}
run_query(t, q).show()

print("=== resolve_unique ===")
from graphkb_spark.operators.resolve import resolve_unique

r = resolve_unique(
    t["nation"],
    t["customer"],
    {"n_nationkey": "c_nationkey"},
    [F.col("c_acctbal").desc(), F.col("c_custkey").asc()],
)
r.select("n_name", "c_name", "c_acctbal", "_resolve_error").show(5)

print("=== merge_upsert ===")
from graphkb_spark.operators.merge import merge_metrics, merge_upsert

old = t["customer"].filter(F.col("c_custkey") % 3 != 0)
new = t["customer"].withColumn(
    "c_acctbal", F.when(F.col("c_custkey") % 5 == 0, F.col("c_acctbal") + 1).otherwise(F.col("c_acctbal"))
).filter(F.col("c_custkey") % 7 != 0)
m = merge_upsert(old, new, ["c_custkey"], delete_missing=True)
merge_metrics(m).show()

print("=== dedup ===")
from graphkb_spark.operators.dedup import exact_dedup, minhash_lsh_pairs, simhash_near_dups

print("exact:", exact_dedup(t["documents"], "text", "doc_id").count())
print("minhash pairs:", minhash_lsh_pairs(t["documents"], "text", "doc_id",
                                          num_hashes=32, bands=8,
                                          jaccard_threshold=0.5).count())
print("simhash pairs:", simhash_near_dups(t["documents"], "text", "doc_id", max_hamming=8).count())

print("=== similarity ===")
from graphkb_spark.operators.similarity import cosine_topk, ivf_topk, lsh_topk

qs = t["embeddings"].limit(3)
print("brute:", cosine_topk(t["embeddings"], qs, k=5).count())
print("lsh:", lsh_topk(t["embeddings"], qs, k=5, n_planes=4).count())
print("ivf:", ivf_topk(t["embeddings"], qs, k=5).count())

print("=== text ===")
from graphkb_spark.operators.text import lang_id, quality_features, token_count

t["documents"].select(
    "doc_id", "lang", lang_id("text").alias("pred"), token_count("text").alias("toks")
).show(5)
qf = quality_features(t["documents"], "text")
qf.select("doc_id", "q_words", "q_punct_ratio", "q_score").show(3)

print("=== expand ===")
from graphkb_spark.operators.expand import dnf_expand, expand_profiles

print(dnf_expand("a AND (b OR c)"))
pdf = spark.createDataFrame([("v1 AND (v2 OR v3)",), ("v9",), ("NOT v1",)], ["expr"])
expand_profiles(pdf, "expr").show(truncate=False)

print("=== hgvs ===")
from graphkb_spark.functions.hgvs import parse_variant, parse_variant_udf

print(parse_variant("KRAS:p.G12D"))
print(parse_variant("c.35G>A"))
print(parse_variant("(EWSR1,FLI1):fusion(e.7,e.6)"))
vdf = spark.createDataFrame([("KRAS:p.G12D",), ("c.35_37del",), ("junk!!",)], ["notation"])
vdf.select("notation", parse_variant_udf("notation").alias("v")).select("notation", "v.*").show(truncate=False)

print("=== hashing ===")
from graphkb_spark.functions.hashing import content_fingerprint, stable_hash_id

t["nation"].select(stable_hash_id("n_name", "n_nationkey").alias("h"),
                   ).show(3, truncate=False)
t["documents"].select(content_fingerprint("text", 32).alias("fp")).show(3)

print("=== streaming ===")
from graphkb_spark.streaming.incremental import sessionize, streaming_windowed_counts

sessionize(t["events"]).select("user_id", "ts", "session_id").show(5)
sw = streaming_windowed_counts(spark, t["events"])
sw.show(5)

print("=== multimodal ===")
from graphkb_spark.multimodal.binary import MEDIA_SCHEMA, extract_features

media = spark.createDataFrame(
    [(1, "image", "image/png", b"\x89PNGfake", {"src": "x"}),
     (2, "audio", "audio/wav", b"RIFFfake", {}),
     (3, "video", "video/mp4", b"mp4fake", {})],
    MEDIA_SCHEMA,
)
extract_features(media).show(truncate=False)

print("=== graph ===")
from graphkb_spark.operators.graph import expand_neighbors

from graphkb_spark.core.schemas import EDGE_SCHEMA

edges = spark.createDataFrame(
    [("a", "b", "SubClassOf", None), ("b", "c", "SubClassOf", None), ("c", "d", "AliasOf", None)],
    EDGE_SCHEMA,
)
seeds = spark.createDataFrame([("a",)], ["rid"])
expand_neighbors(seeds, edges, "rid", 2).show()

print("=== reconcile ===")
from graphkb_spark.operators.reconcile import reconcile

stored = spark.createDataFrame(
    [("s1", "k1", "subA", "c1", "rid1"), ("s1", "k1", "subB", "c2", "rid2"),
     ("s2", "k2", "subC", "c3", "rid3")],
    ["sourceId", "key", "subject", "content", "rid"],
)
batch = spark.createDataFrame(
    [("s1", "k1", "subA", "c1", "n1"), ("s1", "k1", "subB", "c2x", "n2"),
     ("s3", "k3", "subD", "c9", "n3")],
    ["sourceId", "key", "subject", "content", "rid"],
)
reconcile(stored, batch, ["sourceId"], ["subject", "content"], ["subject"],
          ["subject", "content"], "rid").show()

print("ALL SMOKE OK")
spark.stop()
