"""graphkb_spark — a PySpark-native analytics/ETL engine with the query and
data-processing capabilities of bcgsc/pori_graphkb_loader.

The reference (studied at /root/reference) is a single-process Node ETL
client: ~27 loaders that parse heterogeneous sources, normalize, entity-
resolve via per-record REST lookups, and upsert into a property-graph KB.
This engine re-expresses every capability Spark-first:

- the KB is a set of DataFrame-backed tables (vertices + edges);
- every per-record HTTP round-trip becomes a set-oriented join/merge;
- each loader is a batch DataFrame pipeline read -> validate -> normalize
  -> resolve (joins) -> MERGE;
- the GraphKB ``/query`` filter DSL is compiled to Catalyst Column
  expressions / semi-joins (plans.filter_dsl);
- plus the large-scale training-data operators (dedup, similarity search,
  text analysis, multimodal plumbing) a 100 TB pipeline needs.
"""

__version__ = "0.1.0"
