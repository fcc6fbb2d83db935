"""Source readers (SURVEY §2.1 S1-S17), Spark-first.

Every streamed/backpressured parse in the reference becomes a
partitioned scan: Spark splits the file and reads ranges in parallel,
so the 46 MB MAF case (src/cancerhotspots/index.js:282-333) and the
multi-GB DrugBank XML (src/drugbank/index.js:279-333) need no manual
pause/resume. Schemas are declared (never inferSchema in production
paths) so scans prune columns and push filters.
"""

from __future__ import annotations

import json
import os
from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_delim(
    spark: SparkSession,
    path: str,
    sep: str = "\t",
    header: bool = True,
    comment: str = "#",
    schema: T.StructType | None = None,
    header_map: Mapping[str, str] | None = None,
) -> DataFrame:
    """S1/S2: delimited reader with '#' comment rows and a header remap
    (reference ``loadDelimToJson`` src/util.js:69-84 +
    ``convertRowFields`` src/util.js:219-226)."""
    reader = spark.read.option("sep", sep).option("header", str(header).lower())
    if comment:
        reader = reader.option("comment", comment)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    df = reader.csv(path)
    if header_map:
        df = df.withColumnsRenamed(dict(header_map))
    return df


def read_json_file(
    spark: SparkSession, path: str, schema: T.StructType | None = None, multiline: bool = True
) -> DataFrame:
    """S7: whole-file JSON (DO graph / HGNC dump shapes)."""
    reader = spark.read.option("multiLine", str(multiline).lower())
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_text_lines(spark: SparkSession, path: str, col: str = "value") -> DataFrame:
    """S8: one record per line (variant lists, src/variants/index.js:36-44)."""
    df = spark.read.text(path)
    return df.withColumnRenamed("value", col) if col != "value" else df


def read_xml_elements(
    spark: SparkSession, path: str, row_tag: str, schema: T.StructType | None = None
) -> DataFrame:
    """S3/S4: XML by repeated element.

    Spark 4 ships a native XML source (``spark.read.format('xml')``,
    formerly spark-xml). Falls back to a driver-side ElementTree parse
    -> createDataFrame for environments without the XML source; the
    fallback is for small fixtures only.
    """
    try:
        reader = spark.read.format("xml").option("rowTag", row_tag)
        if schema is not None:
            reader = reader.schema(schema)
        return reader.load(path)
    except Exception:
        import xml.etree.ElementTree as ET

        def strip_ns(tag: str) -> str:
            return tag.rsplit("}", 1)[-1]

        def elem_to_obj(e):
            children = list(e)
            if not children:
                return e.text
            obj: dict = {}
            for c in children:
                k = strip_ns(c.tag)
                v = elem_to_obj(c)
                if k in obj:
                    if not isinstance(obj[k], list):
                        obj[k] = [obj[k]]
                    obj[k].append(v)
                else:
                    obj[k] = v
            obj.update({f"@{k}": v for k, v in e.attrib.items()})
            return obj

        root = ET.parse(path).getroot()
        rows = [
            json.dumps(elem_to_obj(e))
            for e in root.iter()
            if strip_ns(e.tag) == row_tag
        ]
        rdd_df = spark.createDataFrame([(r,) for r in rows], ["json"])
        if schema is not None:
            return rdd_df.select(F.from_json("json", schema).alias("r")).select("r.*")
        sample = spark.read.json(rdd_df.rdd.map(lambda r: r.json))
        return sample


def read_owl_records(spark: SparkSession, path: str) -> DataFrame:
    """S5: OWL/RDF-XML -> one record per owl:Class, predicates grouped
    (reference ``convertOwlGraphToJson`` src/util.js:22-66: group
    triples by subject into {code, predicate: [objects]}).

    Implemented as triple extraction (driver-side for RDF/XML — the
    format is not line-splittable) followed by the idiomatic Spark
    pivot: groupBy(subject).pivot(predicate).collect_list(object).
    For N-Triples inputs use ``read_ntriples`` (fully distributed).
    """
    import xml.etree.ElementTree as ET

    ns = {
        "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
        "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
        "owl": "http://www.w3.org/2002/07/owl#",
    }
    triples: list[tuple[str, str, str]] = []
    root = ET.parse(path).getroot()
    for cls in root.iter(f"{{{ns['owl']}}}Class"):
        about = cls.get(f"{{{ns['rdf']}}}about")
        if not about:
            continue
        for child in cls:
            pred = child.tag.rsplit("}", 1)[-1]
            obj = child.get(f"{{{ns['rdf']}}}resource") or (child.text or "").strip()
            if obj:
                triples.append((about, pred, obj))
    tdf = spark.createDataFrame(triples, ["subject", "predicate", "object"])
    preds = [r[0] for r in tdf.select("predicate").distinct().collect()]
    return (
        tdf.groupBy("subject")
        .pivot("predicate", preds)
        .agg(F.collect_list("object"))
    )


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """Distributed N-Triples reader: line-based regex split -> triples
    -> same groupBy/pivot shape as ``read_owl_records``. This is the
    100 TB path for RDF data."""
    lines = spark.read.text(path)
    pat = r"^<([^>]+)>\s+<([^>]+)>\s+(?:<([^>]+)>|\"((?:[^\"\\]|\\.)*)\")"
    return lines.select(
        F.regexp_extract("value", pat, 1).alias("subject"),
        F.regexp_extract("value", pat, 2).alias("predicate"),
        F.coalesce(
            F.nullif(F.regexp_extract("value", pat, 3), F.lit("")),
            F.regexp_extract("value", pat, 4),
        ).alias("object"),
    ).filter(F.col("subject") != "")


def read_xlsx(spark: SparkSession, path: str, sheet: str | int = 0) -> DataFrame:
    """S6: XLSX sheet -> DataFrame via pandas (small supplements only —
    reference reads 2 papers' supplementary tables)."""
    import pandas as pd

    pdf = pd.read_excel(path, sheet_name=sheet)
    return spark.createDataFrame(pdf)


def paginate_skip_limit(fetch_page, limit: int = 1000):
    """S9: skip/limit paging until a short page (reference
    ``getRecords`` /root/reference/src/graphkb.js:341-372).
    ``fetch_page(skip, limit) -> list`` ; yields records."""
    skip = 0
    while True:
        page = fetch_page(skip, limit)
        yield from page
        if len(page) < limit:
            return
        skip += limit


def paginate_cursor(fetch_page):
    """S10/S11: cursor / pageToken paging (CIViC GraphQL ``after``
    src/civic/evidenceItem.js:28-53; clinicaltrials ``nextPageToken``
    src/clinicaltrialsgov/index.js:301-371).
    ``fetch_page(cursor) -> (list, next_cursor | None)``."""
    cursor = None
    while True:
        page, cursor = fetch_page(cursor)
        yield from page
        if cursor is None:
            return


def paginate_next_link(fetch_page, first_url: str):
    """S12: next-link paging (DGIdb ``_meta.links.next``
    src/dgidb/index.js:49-88). ``fetch_page(url) -> (list, next_url)``."""
    url = first_url
    while url:
        page, url = fetch_page(url)
        yield from page


def paginate_offset_total(fetch_page, page_size: int = 100):
    """S13: offset/total paging (ASCO solr ``start``/``numFound``
    src/asco/index.js:71-100). ``fetch_page(start, rows) ->
    (list, total)``."""
    start = 0
    total = None
    while total is None or start < total:
        page, total = fetch_page(start, page_size)
        yield from page
        start += page_size
        if not page:
            return


def fetch_paginated(spark: SparkSession, records_iter, schema: T.StructType | None = None):
    """Materialize a pagination generator into a DataFrame — pagination
    runs on the driver (rate-limited external APIs, SURVEY §2.11 C5);
    everything downstream is distributed."""
    rows = list(records_iter)
    if schema is not None:
        return spark.createDataFrame(rows, schema)
    return spark.createDataFrame(rows)


def extract_links(col, base_url: str | None = None):
    """S16 HTML scrape: ``<a href>`` extraction as a pure Column
    expression (reference parse5 DOM walk,
    /root/reference/src/fdaApprovals/index.js:14-105). Returns
    array<string> of hrefs; relative links get ``base_url`` prefixed.
    JVM regexp — no Python, no DOM, good enough for the link-harvest
    step the reference does before fetching article pages."""
    c = F.col(col) if isinstance(col, str) else col
    hrefs = F.regexp_extract_all(c, F.lit('<a[^>]*href="([^"#]+)"'), 1)
    if base_url:
        hrefs = F.transform(
            hrefs,
            lambda h: F.when(
                h.startswith("http"), h
            ).otherwise(F.concat(F.lit(base_url.rstrip("/") + "/"), F.regexp_replace(h, "^/", ""))),
        )
    return hrefs


def html_to_text(col):
    """S16 article-text extraction (html-to-text equivalent): strip
    script/style blocks, tags, collapse entities+whitespace. Pure
    Column regexp chain."""
    c = F.col(col) if isinstance(col, str) else col
    no_script = F.regexp_replace(c, r"(?is)<(script|style)[^>]*>.*?</\1>", " ")
    no_tags = F.regexp_replace(no_script, r"<[^>]+>", " ")
    unescaped = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(no_tags, "&amp;", "&"), "&lt;", "<"
        ),
        "&(nbsp|#160);",
        " ",
    )
    return F.trim(F.regexp_replace(unescaped, r"\s+", " "))


def fetch_rest_batched(
    spark: SparkSession,
    ids: DataFrame,
    id_col: str,
    fetch_fn,
    batch_size: int = 150,
    schema: T.StructType | None = None,
) -> DataFrame:
    """S9-S15 batch-prefetch pattern: distinct keys -> chunked fetch ->
    DataFrame -> broadcast join downstream (reference ``fetchByIdList``
    src/entrez/util.js:54-104, MAX_CONSEC_IDS=150).

    ``fetch_fn(list_of_ids) -> list[dict]`` runs on the driver (the
    reference's rate limits make executor-side HTTP storms the #1
    anti-pattern — SURVEY §7). Network access is unavailable in this
    environment; callers inject a local/mock ``fetch_fn``.
    """
    keys = [r[0] for r in ids.select(id_col).distinct().collect()]
    rows: list[dict] = []
    for i in range(0, len(keys), batch_size):
        rows.extend(fetch_fn(keys[i : i + batch_size]))
    if schema is not None:
        return spark.createDataFrame(rows, schema)
    return spark.createDataFrame(rows)
