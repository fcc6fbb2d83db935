"""Publication-supplement and curated-content loaders: the two PMC
paper XLSX supplements, the plain-text variant list, ASCO abstracts and
FDA approval announcements (SURVEY §2.1 S6/S8/S13/S16, §7.5).

Reference modules:

- /root/reference/src/PMC4232638/index.js  (kinase/TP53 functional impact)
- /root/reference/src/PMC4468049/index.js  (kinase fusions, Table S11)
- /root/reference/src/variants/index.js    (one variant string per line)
- /root/reference/src/asco/index.js        (solr abstracts, fill-score dedup)
- /root/reference/src/fdaApprovals/index.js (scraped announcements)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphkb_spark.functions.hashing import stable_hash_named
from graphkb_spark.functions.hgvs import parse_variant_udf

# ---------------------------------------------------------------------------
# two-row merged-header XLSX reconstruction (S6)
# ---------------------------------------------------------------------------


def reconstruct_merged_header(rows: list[list]) -> tuple[list[str], list[list]]:
    """Rebuild column names from a 2-row merged header: a super-header
    row where only the first cell of each merged span is filled, and a
    sub-header row; name = ``"<super> - <sub>"`` when both exist
    (src/PMC4232638/index.js:30-44).  Returns (header, data_rows).
    Driver-side: supplement sheets are tiny (hundreds of rows).
    """
    header, last_super = [], None
    for i in range(len(rows[1])):
        super_col, col = rows[1][i], rows[2][i]
        if super_col is not None:
            last_super = super_col
        header.append(f"{last_super} - {col}" if col else last_super)
    data = [
        [None if v in ("----", None) else v for v in r] for r in rows[3:]
    ]
    return header, data


# ---------------------------------------------------------------------------
# PMC4232638 (src/PMC4232638/index.js:112-186)
# ---------------------------------------------------------------------------

PMC4232638_PMID = "25348012"  # THIS_PUBMED_ID


def load_pmc4232638(
    rows: DataFrame,
    kinase_col: str = "kinase",
    gof_col: str = "tp53_gof",
    lof_col: str = "tp53_lof",
    dom_col: str = "tp53_dominant_negative",
) -> DataFrame:
    """Functional-classification supplement -> statement candidates.

    Reference logic (src/PMC4232638/index.js:58-111): keep only
    ``non-neutral`` rows; kinase oncogenes -> 'likely gain of
    function'; TP53 rows: gof+(lof|domNeg) skipped, gof -> 'gain of
    function', domNeg+lof -> 'dominant negative', lof -> 'loss of
    function'.  PMIDs ``"123, 456 (note)"`` parse into the evidence
    list plus this paper's own PMID (:85-110); unparseable entries are
    dropped with a warning (here: kept in ``_bad_pmids``).
    Input columns: gene, aa_change, functional_classification, type,
    pmids + the four flag columns.
    """
    is_no = lambda c: F.col(c).isNull() | F.lower(F.col(c)).startswith("no ")
    gof, lof, dom = (~is_no(gof_col), ~is_no(lof_col), ~is_no(dom_col))
    relevance = (
        F.when(gof & (lof | dom), F.lit(None).cast("string"))  # multi-category: skip
        .when(gof, F.lit("gain of function"))
        .when(dom & lof, F.lit("dominant negative"))
        .when(lof, F.lit("loss of function"))
        .when(
            (F.col(kinase_col) == "yes")
            & F.col("type").isin("Oncogene", "New cancer gene"),
            F.lit("likely gain of function"),
        )
    )
    pmid_parts = F.split(F.coalesce(F.col("pmids").cast("string"), F.lit("")), ",")
    pmid_of = lambda p: F.regexp_extract(p, r"^\s*(\d+)\s*(\([^)]+\))?$", 1)
    evidence = F.concat(
        F.array(F.lit(PMC4232638_PMID)),
        F.filter(F.transform(pmid_parts, lambda p: pmid_of(p)), lambda x: x != ""),
    )
    out = (
        rows.filter(F.col("functional_classification") == "non-neutral")
        .withColumn("relevance", relevance)
        .filter(F.col("relevance").isNotNull())
        .select(
            "gene",
            F.concat(F.lit("p."), F.col("aa_change")).alias("variant_notation"),
            "relevance",
            evidence.alias("evidence_pmids"),
            F.filter(
                F.transform(pmid_parts, lambda p: F.trim(p)),
                lambda p: (p != "") & (pmid_of(p) == ""),
            ).alias("_bad_pmids"),
        )
    )
    parsed = parse_variant_udf(F.col("variant_notation"))
    return out.withColumn("variant", parsed)


# ---------------------------------------------------------------------------
# PMC4468049 kinase fusions (src/PMC4468049/index.js:148-235)
# ---------------------------------------------------------------------------


def load_pmc4468049_fusions(rows: DataFrame) -> DataFrame:
    """Table S11 fusions -> statement candidates.  ``kinaseA ==
    kinaseB`` rows are skipped ('cannot determine kinase partner',
    src/PMC4468049/index.js:180-186); the variant is an in-frame fusion
    with GenomicPosition breakpoints and displayName
    ``(A,B):fusion(g.X,g.Y)`` (:203-217); the statement subject is the
    kinase-side gene (:224-227), relevance 'likely gain of function',
    conditions [variant, disease].
    Input columns: geneA, geneB, kinaseA, kinaseB, break1, break2, disease.
    """
    skip = F.col("kinaseA") == F.col("kinaseB")
    subject = F.when(F.col("kinaseA") == "yes", F.col("geneA")).otherwise(F.col("geneB"))
    return rows.select(
        "geneA",
        "geneB",
        "disease",
        F.struct(
            F.lit("GenomicPosition").alias("cls"),
            F.col("break1").cast("long").alias("pos"),
        ).alias("break1Start"),
        F.struct(
            F.lit("GenomicPosition").alias("cls"),
            F.col("break2").cast("long").alias("pos"),
        ).alias("break2Start"),
        F.concat(F.lit("g."), F.col("break1").cast("string")).alias("break1Repr"),
        F.concat(F.lit("g."), F.col("break2").cast("string")).alias("break2Repr"),
        F.lit("in-frame fusion").alias("variant_type"),
        F.concat(
            F.lit("("),
            F.col("geneA"),
            F.lit(","),
            F.col("geneB"),
            F.lit("):fusion(g."),
            F.col("break1").cast("string"),
            F.lit(",g."),
            F.col("break2").cast("string"),
            F.lit(")"),
        ).alias("variant_displayName"),
        F.lit("likely gain of function").alias("relevance"),
        subject.alias("subject_gene"),
        F.when(skip, F.lit("skipping: cannot determine kinase partner")).alias("_error"),
    )


# ---------------------------------------------------------------------------
# plain-text variant list (src/variants/index.js:36-57)
# ---------------------------------------------------------------------------


def load_variant_list(lines: DataFrame, column: str = "value") -> DataFrame:
    """One variant notation per line -> parsed variant structs; blank
    lines dropped; parse failures carried in the struct's error field
    (reference logs-and-skips, src/variants/index.js:45-56)."""
    trimmed = lines.select(F.trim(F.col(column)).alias("notation")).filter(
        F.col("notation") != ""
    )
    return trimmed.withColumn("variant", parse_variant_udf(F.col("notation")))


# ---------------------------------------------------------------------------
# ASCO abstracts (src/asco/index.js:42-68, 149-183)
# ---------------------------------------------------------------------------

ASCO_KEY_COLS = ["AbstID", "Year", "Meeting", "Title", "FirstAuthor"]


def collapse_abstract_dups(raw: DataFrame) -> DataFrame:
    """Duplicate abstracts for the same (AbstID, Year, Meeting, Title,
    FirstAuthor) collapse to the one with the highest fill-score
    (count of non-null, non-empty fields — src/asco/index.js:42-68).
    W4 window dedup; the sort adds the full-struct tiebreak so the
    winner is deterministic where the reference's sort is stable-order
    dependent."""
    fill = sum(
        (F.when(F.col(c).isNotNull() & (F.col(c).cast("string") != ""), 1).otherwise(0))
        for c in raw.columns
    )
    w = Window.partitionBy(*ASCO_KEY_COLS).orderBy(
        F.desc("_fill"), F.struct(*[F.col(c) for c in raw.columns])
    )
    return (
        raw.withColumn("_fill", fill)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_fill", "_rn")
    )


def load_asco_abstracts(raw: DataFrame) -> DataFrame:
    """Collapsed abstracts -> Abstract records (src/asco/index.js:
    154-166): displayName ``<Meeting> (abstract <AbstID>)``; the
    natural key for upsert is (abstractNumber, source, year, meeting)
    (:169-176 unique index)."""
    deduped = collapse_abstract_dups(raw)
    return deduped.select(
        stable_hash_named(
            cls=F.lit("Abstract"),
            abstractNumber=F.col("AbstID"),
            year=F.col("Year").cast("int"),
            meeting=F.col("Meeting"),
            source=F.lit("asco"),
        ).alias("rid"),
        F.lit("Abstract").alias("cls"),
        F.col("AbstID").alias("abstractNumber"),
        F.col("AuthorString").alias("authors"),
        F.concat(
            F.col("Meeting"), F.lit(" (abstract "), F.col("AbstID"), F.lit(")")
        ).alias("displayName"),
        F.col("Meeting").alias("meeting"),
        F.col("Title").alias("name"),
        F.col("id").cast("string").alias("sourceId"),
        F.col("url"),
        F.col("Year").cast("int").alias("year"),
    )


# ---------------------------------------------------------------------------
# FDA approval announcements (src/fdaApprovals/index.js:62-138)
# ---------------------------------------------------------------------------

_FDA_DATE_RE = r"(?i)(jan|feb|mar|apr|may|jun|jul|aug|sep|oct|nov|dec)[a-z]*\.? \d+, (20\d\d)"


def load_fda_approvals(pages: DataFrame) -> DataFrame:
    """Scraped announcement pages (link, title, content) ->
    CuratedContent rows.  The year is set only when every dated line in
    the article agrees on a single year (consensus-or-null, A5 —
    src/fdaApprovals/index.js:88-102); natural key (source, sourceId)
    (:118-121)."""
    years = F.array_distinct(
        F.transform(
            F.regexp_extract_all(F.col("content"), F.lit(_FDA_DATE_RE), F.lit(2)),
            lambda y: y,
        )
    )
    return pages.select(
        stable_hash_named(
            cls=F.lit("CuratedContent"),
            sourceId=F.col("link"),
            source=F.lit("fdaApprovals"),
        ).alias("rid"),
        F.lit("CuratedContent").alias("cls"),
        F.col("content"),
        F.col("title").alias("displayName"),
        F.col("title").alias("name"),
        F.col("link").alias("sourceId"),
        F.concat(F.lit("https://www.fda.gov"), F.col("link")).alias("url"),
        F.when(F.size(years) == 1, F.get(years, 0).cast("int")).alias("year"),
    )
