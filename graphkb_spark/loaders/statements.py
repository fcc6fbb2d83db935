"""Statement-loader family (SURVEY §7.5) — the reference's per-source
statement pipelines re-expressed as batch DataFrame transforms.

Each ``load_*`` takes the source's raw rows (already read via
``sources.readers``) and returns statement-candidate / edge rows with
per-row ``_error`` quarantine columns — row problems never fail the
job (reference pushes them onto ``errorList``, e.g.
/root/reference/src/cancerhotspots/index.js:316-321).

Covered sources and their reference modules:

- cancerhotspots — /root/reference/src/cancerhotspots/index.js
- COSMIC resistance — /root/reference/src/cosmic/resistance.js
- COSMIC fusions — /root/reference/src/cosmic/fusions.js
- MOA — /root/reference/src/moa/index.js
- OncoKB — /root/reference/src/oncokb/index.js
- DGIdb — /root/reference/src/dgidb/index.js

All of these were per-record awaited HTTP chains in the reference; here
every lookup is a broadcast join and every per-row parse is Column
algebra (no Python UDFs in this module), so each loader is a linear
scan + a handful of narrow shuffles regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphkb_spark.functions.hashing import stable_hash_id, stable_hash_named

# ---------------------------------------------------------------------------
# cancerhotspots (MAF)
# ---------------------------------------------------------------------------

# convertRowFields HEADER, src/cancerhotspots/index.js:27-42
CANCERHOTSPOTS_HEADER = {
    "assembly": "NCBI_Build",
    "cds": "HGVSc",
    "chromosome": "Chromosome",
    "clinSig": "CLIN_SIG",
    "dbsnp": "dbSNP_RS",
    "diseaseId": "oncotree_detailed",
    "geneId": "Entrez_Gene_Id",
    "impact": "IMPACT",
    "protein": "HGVSp_Short",
    "refSeq": "Reference_Allele",
    "start": "Start_Position",
    "stop": "End_Position",
    "transcriptId": "Transcript_ID",
    "untemplatedSeq": "Allele",
}


def _hotspot_genomic_notation() -> F.Column:
    """``<chrom>:g....`` composer (src/cancerhotspots/index.js:81-103):
    ``-`` alleles mean empty; 1:1 -> substitution, both present ->
    delins, no ref -> insertion, no alt -> deletion."""
    ref = F.when(F.col("refSeq") == "-", F.lit("")).otherwise(F.col("refSeq"))
    alt = F.when(F.col("untemplatedSeq") == "-", F.lit("")).otherwise(F.col("untemplatedSeq"))
    chrom = F.concat(F.col("chromosome"), F.lit(":g."))
    start, stop = F.col("start"), F.col("stop")
    return (
        F.when(
            (F.length(ref) == 1) & (F.length(alt) == 1),
            F.concat(chrom, start, ref, F.lit(">"), alt),
        )
        .when(
            (F.length(ref) > 0) & (F.length(alt) > 0),
            F.concat(chrom, start, F.lit("_"), stop, F.lit("del"), ref, F.lit("ins"), alt),
        )
        .when(F.length(ref) == 0, F.concat(chrom, start, F.lit("_"), stop, F.lit("ins"), alt))
        .otherwise(F.concat(chrom, start, F.lit("_"), stop, F.lit("del"), ref))
    )


def load_cancerhotspots(raw: DataFrame, relevance: str = "mutation hotspot") -> DataFrame:
    """MAF rows -> hotspot statement candidates.

    Row-skip predicates (src/cancerhotspots/index.js:293-307): keep only
    ``IMPACT == HIGH`` rows with a non-empty, non-benign ``CLIN_SIG``;
    drop synonymous (``p.…=``) and non-standard splice (``_splice``)
    protein notations.  ``sourceId`` is the row content hash
    (``createRowId``), giving the J4 incremental skip-set key.
    """
    df = raw.select(
        *[F.col(src).alias(dst) for dst, src in CANCERHOTSPOTS_HEADER.items() if src in raw.columns]
    )
    df = df.filter(
        (F.lower(F.col("impact")) == "high")
        & (F.col("clinSig") != "")
        & (~F.col("clinSig").contains("benign"))
        & (~F.col("protein").endswith("="))
        & (~F.col("protein").endswith("_splice"))
    )
    return (
        df.withColumn("genomic", _hotspot_genomic_notation())
        .withColumn(
            "protein_notation",
            F.concat(F.col("transcriptId"), F.lit(":"), F.col("protein")),
        )
        .withColumn(
            "sourceId",
            stable_hash_named(
                chromosome="chromosome",
                start="start",
                stop="stop",
                refSeq="refSeq",
                untemplatedSeq="untemplatedSeq",
                protein="protein",
            ),
        )
        .withColumn("relevance", F.lit(relevance))
        .withColumn(
            "conditions",
            F.array_sort(F.filter(F.array("protein_notation", "diseaseId"), lambda x: x.isNotNull())),
        )
    )


# ---------------------------------------------------------------------------
# COSMIC resistance
# ---------------------------------------------------------------------------

# convertRowFields HEADER, src/cosmic/resistance.js:25-38
COSMIC_RESISTANCE_HEADER = {
    "cds": "HGVSC",
    "disease": "Histology Subtype 1",
    "diseaseFamily": "Histology",
    "gene": "Gene Name",
    "genomic": "HGVSG",
    "mutationId": "LEGACY_MUTATION_ID",
    "protein": "HGVSP",
    "pubmed": "Pubmed Id",
    "sampleId": "Sample ID",
    "sampleName": "Sample Name",
    "therapy": "Drug Name",
    "transcript": "Transcript",
}


def load_cosmic_resistance(raw: DataFrame, classification: DataFrame) -> DataFrame:
    """COSMIC drug-resistance rows -> resistance statement candidates.

    - header remap + ``p.?`` skip (src/cosmic/resistance.js:364-367);
    - ``sourceId`` = whole-row content hash (``hashRecordToId`` with no
      property subset, :360) — COSMIC has no stable row ids, which is
      why the sink is the §2.9.3 full-reload diff
      (``operators.validate.full_reload_diff``);
    - histology -> NCIt code via the broadcast classification table
      (``loadClassifications`` :301-315, J7).

    ``classification`` columns: ``diseaseFamily``, ``disease``, ``ncit``.
    """
    df = raw.select(
        *[
            F.col(src).alias(dst)
            for dst, src in COSMIC_RESISTANCE_HEADER.items()
            if src in raw.columns
        ]
    )
    df = df.withColumn("sourceId", stable_hash_id(*sorted(df.columns)))
    df = df.filter(~F.col("protein").startswith("p.?"))
    df = df.join(
        F.broadcast(classification.select("diseaseFamily", "disease", "ncit")),
        ["diseaseFamily", "disease"],
        "left",
    )
    return (
        df.withColumn("relevance", F.lit("resistance"))
        .withColumn(
            "conditions",
            F.array_sort(
                F.filter(
                    F.array(
                        F.concat_ws(":", "gene", "protein"),
                        F.coalesce("ncit", "disease"),
                        "therapy",
                    ),
                    lambda x: x.isNotNull() & (x != ""),
                )
            ),
        )
        .withColumn(
            "_error",
            F.when(F.col("therapy").isNull() | (F.col("therapy") == ""), "missing therapy"),
        )
    )


# ---------------------------------------------------------------------------
# COSMIC fusions (3-level recurrence rollup, SURVEY §2.5 A2)
# ---------------------------------------------------------------------------


def load_cosmic_fusions(raw: DataFrame, recurrence_threshold: int = 3) -> DataFrame:
    """Fusion rows -> recurrent-fusion statement candidates.

    The reference histograms each row at three specificity levels
    (src/cosmic/fusions.js:152-160: [variant, diseaseFamily, disease],
    [nonSpecificVariant, diseaseFamily, disease], [nonSpecificVariant])
    and keeps groups with ``countDistinct(sampleId) >=
    RECURRENCE_THRESHOLD`` (:21,199), suppressing a less-specific group
    when a more-specific one already covers the same rows (:213-218).

    ``raw`` columns: ``gene1``, ``exon1``, ``gene2``, ``exon2``,
    ``sampleId``, ``disease``, ``diseaseFamily``, ``fusionId``.
    """
    df = raw.withColumn(
        "variant",
        F.concat(
            F.lit("("),
            F.col("gene1"),
            F.lit(","),
            F.col("gene2"),
            F.lit("):fusion(e."),
            F.col("exon1"),
            F.lit(",e."),
            F.col("exon2"),
            F.lit(")"),
        ),
    ).withColumn(
        "nonSpecificVariant",
        F.concat(F.lit("("), F.col("gene1"), F.lit(","), F.col("gene2"), F.lit("):fusion")),
    )
    levels = [
        (0, ["variant", "diseaseFamily", "disease"]),
        (1, ["nonSpecificVariant", "diseaseFamily", "disease"]),
        (2, ["nonSpecificVariant"]),
    ]
    outs = []
    for lvl, keys in levels:
        g = (
            df.groupBy(*keys)
            .agg(
                F.countDistinct("sampleId").alias("n_samples"),
                F.array_sort(F.collect_set("fusionId")).alias("fusion_ids"),
            )
            .filter(F.col("n_samples") >= recurrence_threshold)
            .withColumn("level", F.lit(lvl))
        )
        for missing in {"variant", "nonSpecificVariant", "diseaseFamily", "disease"} - set(keys):
            g = g.withColumn(missing, F.lit(None).cast("string"))
        outs.append(
            g.select(
                "level",
                "variant",
                "nonSpecificVariant",
                "diseaseFamily",
                "disease",
                "n_samples",
                "fusion_ids",
            )
        )
    allg = outs[0].unionByName(outs[1]).unionByName(outs[2])
    # suppression: drop a less-specific group whose fusion_ids are fully
    # covered by the union of more-specific surviving groups — the
    # reference checks "all rows already counted" (:213-218); group
    # count is small post-threshold, so the coverage join broadcasts
    specific = allg.filter(F.col("level") == 0).select(
        F.explode("fusion_ids").alias("fid"), F.lit(1).alias("__cov0")
    )
    mid = allg.filter(F.col("level") == 1)
    mid_cov = (
        mid.select("level", "nonSpecificVariant", "diseaseFamily", "disease",
                   F.explode("fusion_ids").alias("fid"))
        .join(F.broadcast(specific.dropDuplicates(["fid"])), "fid", "left")
        .groupBy("level", "nonSpecificVariant", "diseaseFamily", "disease")
        .agg((F.count("*") == F.count("__cov0")).alias("__covered"))
    )
    mid = mid.join(
        F.broadcast(mid_cov),
        ["level", "nonSpecificVariant", "diseaseFamily", "disease"],
        "left",
    ).filter(~F.coalesce("__covered", F.lit(False))).drop("__covered")
    cov01 = (
        allg.filter(F.col("level") == 0)
        .select(F.explode("fusion_ids").alias("fid"))
        .unionByName(mid.select(F.explode("fusion_ids").alias("fid")))
        .dropDuplicates(["fid"])
        .withColumn("__cov", F.lit(1))
    )
    top = allg.filter(F.col("level") == 2)
    top_cov = (
        top.select("nonSpecificVariant", F.explode("fusion_ids").alias("fid"))
        .join(F.broadcast(cov01), "fid", "left")
        .groupBy("nonSpecificVariant")
        .agg((F.count("*") == F.count("__cov")).alias("__covered"))
    )
    top = top.join(F.broadcast(top_cov), "nonSpecificVariant", "left").filter(
        ~F.coalesce("__covered", F.lit(False))
    ).drop("__covered")
    kept = allg.filter(F.col("level") == 0).unionByName(mid).unionByName(top)
    return (
        kept.withColumn("relevance", F.lit("recurrent"))
        .withColumn(
            "conditions",
            F.array_sort(
                F.filter(
                    F.array(
                        F.coalesce("variant", "nonSpecificVariant"),
                        # level-2 groups apply to 'cancer' generically
                        F.coalesce("disease", F.lit("cancer")),
                    ),
                    lambda x: x.isNotNull(),
                )
            ),
        )
        .drop("fusion_ids")
    )


# ---------------------------------------------------------------------------
# MOA
# ---------------------------------------------------------------------------


def load_moa(raw: DataFrame) -> DataFrame:
    """MOA assertions -> statement candidates with the ``parseRelevance``
    term extraction (src/moa/index.js:519-558) as Column algebra:

    - both resistance+sensitivity true -> error row ("nonsensical");
    - therapy_name gates resistance/sensitivity/"no sensitivity";
    - favorable_prognosis 1/0 -> favourable/unfavourable prognosis;
    - all-variants-pathogenic adds "pathogenic";
    - no relevance at all -> error row.

    One output row per (assertion x relevance term) via explode.

    ``raw`` columns: ``sourceId``, ``therapy_name``,
    ``therapy_resistance``/``therapy_sensitivity`` (boolean),
    ``favorable_prognosis`` (int, nullable), ``variants``
    array<struct<name:string, pathogenic:string>>, ``disease``.
    """
    both = (F.col("therapy_resistance") == True) & (F.col("therapy_sensitivity") == True)  # noqa: E712
    ther = (
        F.when(F.col("therapy_name").isNull(), F.array().cast("array<string>"))
        .when(F.col("therapy_resistance") == True, F.array(F.lit("resistance")))  # noqa: E712
        .when(F.col("therapy_sensitivity") == True, F.array(F.lit("sensitivity")))  # noqa: E712
        .when(F.col("therapy_sensitivity") == False, F.array(F.lit("no sensitivity")))  # noqa: E712
        .otherwise(F.array().cast("array<string>"))
    )
    prog = (
        F.when(F.col("favorable_prognosis") == 1, F.array(F.lit("favourable prognosis")))
        .when(F.col("favorable_prognosis") == 0, F.array(F.lit("unfavourable prognosis")))
        .otherwise(F.array().cast("array<string>"))
    )
    patho = F.when(
        (F.size("variants") > 0)
        & (F.size(F.filter("variants", lambda v: v["pathogenic"] != "1.0")) == 0),
        F.array(F.lit("pathogenic")),
    ).otherwise(F.array().cast("array<string>"))
    df = raw.withColumn("relevances", F.concat(ther, prog, patho)).withColumn(
        "_error",
        F.when(both, F.lit("nonsensical entry linked to both sensitivity and resistance")).when(
            F.size("relevances") == 0, F.lit("statement has no relevance")
        ),
    )
    return df.select(
        "*", F.explode_outer(F.when(F.col("_error").isNull(), F.col("relevances"))).alias("relevance")
    ).withColumn(
        "conditions",
        F.array_sort(
            F.concat(
                F.transform("variants", lambda v: v["name"]),
                F.filter(F.array("disease", "therapy_name"), lambda x: x.isNotNull()),
            )
        ),
    )


# ---------------------------------------------------------------------------
# OncoKB
# ---------------------------------------------------------------------------


def load_oncokb(raw: DataFrame) -> DataFrame:
    """OncoKB actionable rows -> statement candidates.

    - evidence level -> relevance: ``^r\\d+$`` -> resistance,
      ``^\\d+[a-z]?$`` -> sensitivity, else an error row
      (src/oncokb/index.js:555-561);
    - one statement per drug in the comma-separated ``drugs`` list,
      lowercased/trimmed (:563-576, F15);
    - ``support`` = pmids split on ',' plus abstracts split on ';'
      (:551-552);
    - ``sourceId`` = content hash of the expanded row
      (``generateSourceId``, :538-541).

    ``raw`` columns: ``gene``, ``variant``, ``disease``, ``level``,
    ``drugs``, ``pmids``, ``abstracts``.
    """
    level = F.lower(F.trim(F.col("level")))
    relevance = (
        F.when(level.rlike("^r[0-9]+$"), F.lit("resistance"))
        .when(level.rlike("^[0-9]+[a-z]?$"), F.lit("sensitivity"))
    )
    support = F.filter(
        F.concat(
            F.transform(F.split(F.coalesce("pmids", F.lit("")), ","), lambda x: F.trim(x)),
            F.transform(F.split(F.coalesce("abstracts", F.lit("")), ";"), lambda x: F.trim(x)),
        ),
        lambda x: x != "",
    )
    df = (
        raw.withColumn("relevance", relevance)
        .withColumn("_error", F.when(relevance.isNull(), F.concat(F.lit("did not recognize evidence level ("), F.col("level"), F.lit(")"))))
        .withColumn("support", support)
        .withColumn("gene", F.lower(F.trim(F.col("gene"))))
        .withColumn(
            "drug",
            F.explode_outer(
                F.filter(
                    F.transform(F.split(F.coalesce("drugs", F.lit("")), ","), lambda x: F.lower(F.trim(x))),
                    lambda x: F.length(x) > 0,
                )
            ),
        )
    )
    return df.withColumn(
        "sourceId",
        stable_hash_named(gene="gene", variant="variant", disease="disease", level="level", drug="drug"),
    ).withColumn(
        "conditions",
        F.array_sort(
            F.filter(
                F.array(F.concat_ws(":", "gene", "variant"), "disease", "drug"),
                lambda x: x.isNotNull() & (x != ""),
            )
        ),
    )


# ---------------------------------------------------------------------------
# DGIdb
# ---------------------------------------------------------------------------


def load_dgidb(raw: DataFrame) -> DataFrame:
    """DGIdb interactions -> ``TargetOf`` edge rows
    (src/dgidb/index.js:20-47): ``out`` = gene (by entrez id), ``in`` =
    drug (by ChEMBL id, ``chembl:`` prefix stripped), ``actionType`` =
    lowercased/trimmed/sorted ';'-join of the interaction types, and
    the input ``id`` kept as the edge uuid.

    ``raw`` columns: ``entrez_id``, ``concept_id``,
    ``interaction_types`` array<string>, ``id``.
    """
    return raw.select(
        F.col("entrez_id").cast("string").alias("out"),
        F.regexp_replace(F.col("concept_id"), "^chembl:", "").alias("in"),
        F.array_join(
            F.array_sort(
                F.transform("interaction_types", lambda x: F.lower(F.trim(x)))
            ),
            ";",
        ).alias("actionType"),
        F.col("id").alias("uuid"),
        F.lit("TargetOf").alias("edge_class"),
    )


# ---------------------------------------------------------------------------
# CGI (cancergenomeinterpreter)
# ---------------------------------------------------------------------------

# convertRowFields HEADER, src/cancergenomeinterpreter/index.js:20-36
CGI_HEADER = {
    "alteration": "Alteration",
    "biomarker": "Biomarker",
    "cds": "cDNA",
    "disease": "Primary Tumor type full name",
    "drug": "Drug",
    "drugFamily": "Drug family",
    "evidence": "Source",
    "evidenceLevel": "Evidence level",
    "gene": "Gene",
    "genomic": "gDNA",
    "relevance": "Association",
    "reviewData": "Curation date",
    "reviewer": "Curator",
    "transcript": "transcript",
    "variantClass": "Alteration type",
}


def _mapping_expr(mapping: dict[str, str], col: F.Column) -> F.Column:
    """Small fix-table lookup as a literal map (F6 family; the tables
    are known-typo fixes of ~10 entries so a create_map literal beats a
    broadcast join — zero shuffle, pure codegen)."""
    if not mapping:
        return col
    pairs = [x for kv in mapping.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
    m = F.create_map(*pairs)
    return F.coalesce(m.getItem(col), col)


def load_cgi(raw: DataFrame) -> DataFrame:
    """CGI biomarker rows -> statement candidates.

    - header remap (:20-36) + known-typo fix tables for relevance /
      disease / therapy (:39-70) applied as literal-map lookups;
    - ``;``-split disease explode (:553, F15);
    - variant-combination expansion via ``preprocess_cgi_variants_udf``
      (F2-family UDF) with per-row errors, one statement candidate per
      (combination x disease) (:540-560).
    """
    from graphkb_spark.functions.variant_names import (
        CGI_DISEASE_MAPPING,
        CGI_RELEVANCE_MAPPING,
        CGI_THERAPY_MAPPING,
        preprocess_cgi_variants_udf,
    )

    # `protein` is read off the row outside the HEADER map in the
    # reference (preprocessVariants destructures row.protein) — pass it
    # through the remap when present
    df = raw.select(
        *[F.col(src).alias(dst) for dst, src in CGI_HEADER.items() if src in raw.columns],
        *([F.col("protein")] if "protein" in raw.columns else [F.lit("").alias("protein")]),
    )
    df = (
        df.withColumn(
            "relevance",
            _mapping_expr(CGI_RELEVANCE_MAPPING, F.lower(F.trim(F.col("relevance")))),
        )
        .withColumn("therapy", _mapping_expr(CGI_THERAPY_MAPPING, F.lower(F.trim(F.col("drug")))))
        .withColumn("__v", preprocess_cgi_variants_udf("biomarker", "variantClass", "protein"))
        .withColumn("_error", F.col("__v.error"))
        .select("*", F.explode(F.split(F.col("disease"), ";")).alias("disease_single"))
        .withColumn(
            "disease_single",
            _mapping_expr(CGI_DISEASE_MAPPING, F.lower(F.trim(F.col("disease_single")))),
        )
    )
    # explode_outer keeps error rows (combinations NULL) as quarantine rows
    df = df.select("*", F.explode_outer("__v.combinations").alias("condition_set")).drop("__v")
    return df.withColumn(
        "conditions",
        F.array_sort(
            F.concat(
                F.coalesce(F.col("condition_set"), F.array().cast("array<string>")),
                F.filter(
                    F.array("disease_single", "therapy"),
                    lambda x: x.isNotNull() & (x != ""),
                ),
            )
        ),
    )


# ---------------------------------------------------------------------------
# clinicaltrials.gov
# ---------------------------------------------------------------------------


def load_clinicaltrials(raw: DataFrame) -> DataFrame:
    """Trial records -> ClinicalTrial evidence rows
    (src/clinicaltrialsgov/index.js:37-110,156-185).

    - title = officialTitle else briefTitle;
    - ``sourceIdVersion`` = lastUpdatePosted — the §2.10 incremental
      change cursor (:59);
    - phases canonicalized (F10, ``canonical_phases``);
    - consensus country/city across the trial's locations (A5): one
      distinct lowercased value -> keep, any disagreement -> NULL
      (country disagreement also nulls the city).  The reference loops
      per trial; here it is pure array algebra over the ``locations``
      column — no shuffle at all.

    ``raw`` columns: ``nctId``, ``officialTitle``, ``briefTitle``,
    ``overallStatus``, ``lastUpdatePosted``, ``startDate``,
    ``completionDate``, ``conditions`` array<string>, ``phases``
    array<string>, ``locations`` array<struct<city,country>>.
    """
    from graphkb_spark.functions.variant_names import canonical_phases

    def consensus(field: str) -> F.Column:
        vals = F.array_distinct(
            F.filter(
                F.transform("locations", lambda x: F.lower(x[field])),
                lambda v: v.isNotNull(),
            )
        )
        return F.when(F.size(vals) == 1, F.get(vals, 0))

    country = consensus("country")
    return raw.select(
        F.col("nctId").alias("sourceId"),
        F.col("lastUpdatePosted").alias("sourceIdVersion"),
        F.coalesce("officialTitle", "briefTitle").alias("name"),
        F.coalesce("officialTitle", "briefTitle").alias("displayName"),
        F.concat(F.lit("https://www.clinicaltrials.gov/study/"), "nctId").alias("url"),
        F.col("overallStatus").alias("recruitmentStatus"),
        "startDate",
        "completionDate",
        F.col("conditions").alias("diseases"),
        canonical_phases("phases").alias("phase"),
        country.alias("country"),
        F.when(country.isNotNull(), consensus("city")).alias("city"),
    )


# ---------------------------------------------------------------------------
# DOCM (src/docm/index.js)
# ---------------------------------------------------------------------------


def _docm_genomic_notation() -> F.Column:
    """buildGenomicVariant (src/docm/index.js:70-89) — keyed on
    ``variant_type``: SNV substitution; DEL (span-aware); INS; anything
    else delins."""
    chrom = F.col("chromosome")
    start = F.col("start").cast("string")
    stop = F.col("stop").cast("string")
    ref, alt = F.col("reference"), F.col("variant")
    span = F.when(F.col("start") == F.col("stop"), start).otherwise(
        F.concat(start, F.lit("_"), stop)
    )
    body = (
        F.when(F.col("variant_type") == "SNV", F.concat(start, ref, F.lit(">"), alt))
        .when(F.col("variant_type") == "DEL", F.concat(span, F.lit("del"), ref))
        .when(
            F.col("variant_type") == "INS",
            F.concat(start, F.lit("_"), stop, F.lit("ins"), alt),
        )
        .otherwise(F.concat(span, F.lit("del"), ref, F.lit("ins"), alt))
    )
    return F.concat(chrom, F.lit(":g."), body)


def load_docm(raw: DataFrame) -> DataFrame:
    """DOCM variant records -> statement candidates.

    Reference flow (src/docm/index.js:94-238): protein notation is
    repaired by ``parseDocmVariant`` (F4, :33-67) and parsed; the
    genomic form composes from (chromosome, start, stop, reference,
    variant, variant_type) and links genomic -(Infers)-> protein
    (:155-162); relevance is always 'recurrent' (KBDEV-1050, :182);
    one statement per disease, but only diseases with exactly one tag
    (:189-193 skip), keyed doid + pubmed id; statement sourceId is the
    record's ``hgvs``; subject = the disease (:208-219).

    Input columns: hgvs, amino_acid, gene, chromosome,
    reference_version, start, stop, reference, variant, variant_type,
    diseases (array<struct<doid,source_pubmed_id,tags:array<string>>>).
    """
    from graphkb_spark.functions.variant_names import fix_docm_variant_udf

    base = raw.select(
        "hgvs",
        "gene",
        F.lower(F.trim(F.col("reference_version"))).alias("assembly"),
        fix_docm_variant_udf(F.col("amino_acid")).alias("protein_notation"),
        _docm_genomic_notation().alias("genomic_notation"),
        F.col("chromosome"),
        F.explode_outer("diseases").alias("disease_rec"),
    )
    keep = F.size(F.coalesce(F.col("disease_rec.tags"), F.array())) == 1
    return base.select(
        "hgvs",
        "gene",
        "assembly",
        "protein_notation",
        "genomic_notation",
        "chromosome",
        F.concat(F.lit("doid:"), F.col("disease_rec.doid").cast("string")).alias(
            "disease_doid"
        ),
        F.col("disease_rec.source_pubmed_id").cast("string").alias("pubmed_id"),
        F.lit("recurrent").alias("relevance"),
        F.lit("not required").alias("reviewStatus"),
        F.col("hgvs").alias("sourceId"),
        F.when(~keep, F.lit("skip: disease tag count != 1")).alias("_error"),
    )


# ---------------------------------------------------------------------------
# CGL (src/cgl/index.js)
# ---------------------------------------------------------------------------


def _cgl_genomic_notation() -> F.Column:
    """loadGenomicVariant notation builder (src/cgl/index.js:103-151):
    1:1 -> substitution; otherwise the shared first base is stripped
    and the remainder becomes ins / del / delins with span checks; a
    ref/alt first-base mismatch on a multi-base change is a row error
    (reference throws :111-113) signalled here by NULL."""
    pos = F.col("pos_CGL").cast("string")
    start = F.split_part(pos, F.lit("_"), F.lit(1)).cast("long")
    end_raw = F.nullif(F.split_part(pos, F.lit("_"), F.lit(2)), F.lit("")).cast("long")
    ref, alt = F.col("ref"), F.col("alt")
    sub = F.concat(F.lit("g."), pos, ref, F.lit(">"), alt)
    r, a = F.substring(ref, 2, 1 << 20), F.substring(alt, 2, 1 << 20)
    ins_end = F.coalesce(end_raw, start + 1)
    del_end = F.coalesce(end_raw, start + F.length(r) - 1)
    span = F.when(
        del_end == start, F.lit("")
    ).otherwise(F.concat(F.lit("_"), del_end.cast("string")))
    multi = (
        F.when(
            F.length(r) == 0,
            F.concat(
                F.lit("g."), start.cast("string"), F.lit("_"),
                ins_end.cast("string"), F.lit("ins"), r,
            ),
        )
        .when(
            F.length(a) == 0,
            F.when(
                (F.length(r) > 1) & (F.length(r) != del_end - start + 1),
                F.lit(None).cast("string"),
            ).otherwise(
                F.concat(F.lit("g."), start.cast("string"), span, F.lit("del"), r)
            ),
        )
        .otherwise(
            F.when(
                (F.length(r) > 1) & (F.length(r) != del_end - start + 1),
                F.lit(None).cast("string"),
            ).otherwise(
                F.concat(
                    F.lit("g."), start.cast("string"), span,
                    F.lit("del"), r, F.lit("ins"), a,
                )
            )
        )
    )
    return (
        F.when(
            (F.length(ref) == 1) & (F.length(alt) == 1), sub
        )
        .when(F.substring(ref, 1, 1) != F.substring(alt, 1, 1), F.lit(None))
        .otherwise(multi)
    )


def load_cgl(raw: DataFrame) -> DataFrame:
    """CGL TSV -> statement candidates (src/cgl/index.js:180-291).

    Three variant forms per row: cds from (transcript, coding_hgvs)
    with the transcript resolved unversioned-or-versioned (:20-42);
    protein from (gene, protein_hgvs) after stripping ``p.(...)``
    parens and mapping trailing ``*`` to ``Ter`` for non-fs (:62-73);
    genomic from (chr_CGL, pos_CGL, ref, alt).  Infers chain cds ->
    protein and genomic -> (cds else protein) (:229-263); statement
    uses the most-protein-ward form, relevance 'pathogenic', subject =
    disease 'cancer', sourceId = record hash (:207, F7).
    """
    protein_fixed = F.regexp_replace(
        F.regexp_replace(F.col("protein_hgvs"), r"^p\.\(", "p."), r"\)$", ""
    )
    protein_notation = F.when(
        F.col("protein_hgvs").isNull() | (F.col("protein_hgvs") == ""), F.lit(None)
    ).otherwise(
        F.when(
            protein_fixed.contains("fs"), protein_fixed
        ).otherwise(F.regexp_replace(protein_fixed, r"\*$", "Ter"))
    )
    bad_cds = F.col("coding_hgvs").isNotNull() & ~F.col("coding_hgvs").startswith("c.")
    bad_prot = protein_notation.isNotNull() & ~protein_notation.startswith("p.")
    genomic = _cgl_genomic_notation()
    return raw.select(
        stable_hash_id(*sorted(raw.columns)).alias("sourceId"),
        F.split_part(F.col("transcript"), F.lit("."), F.lit(1)).alias("transcript_id"),
        F.nullif(
            F.split_part(F.col("transcript"), F.lit("."), F.lit(2)), F.lit("")
        ).alias("transcript_version"),
        F.when(~bad_cds, F.col("coding_hgvs")).alias("cds_notation"),
        "gene",
        F.when(~bad_prot, protein_notation).alias("protein_notation"),
        F.col("chr_CGL").alias("chromosome"),
        genomic.alias("genomic_notation"),
        F.lit("hg19").alias("assembly"),
        F.lit("pathogenic").alias("relevance"),
        F.lit("cancer").alias("subject_disease"),
        F.lit("reviewed by Clinical Molecular Geneticist at CGL").alias("description"),
        F.when(
            bad_cds, F.concat(F.lit("invalid HGVSc notation ("), F.col("coding_hgvs"), F.lit(")"))
        )
        .when(bad_prot, F.concat(F.lit("invalid HGVSp notation ("), F.col("protein_hgvs"), F.lit(")")))
        .when(
            F.col("ref").isNotNull() & F.col("alt").isNotNull() & genomic.isNull()
            & (F.length("ref") > 0) & (F.length("alt") > 0),
            F.lit("unexpected ref vs alt combination"),
        )
        .alias("_error"),
    )
