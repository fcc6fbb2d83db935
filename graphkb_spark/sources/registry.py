"""Bundled source registry (SURVEY §2 "static config-as-source";
reference /root/reference/src/sources.js:1-300 — the ~40 source records
every loader get-or-creates before writing, including the ``sort``
ranks that drive the J2 preference comparator).

Functional fields only (name/displayName/longName/url/usage/license/
citation/sort); the reference's free-text ``description`` blurbs are
documentation, not behavior, and are deliberately not mirrored.

``seed_sources`` loads the whole registry in ONE batch upsert (a single
createDataFrame + merge on rid) rather than 39 per-record round trips —
the reference's per-loader ``addRecord({target: 'Source'})`` calls
collapse into one shuffle-free broadcast-size merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphkb_spark.core.schemas import SOURCE_SCHEMA

SOURCE_REGISTRY: dict[str, dict] = {
    "PMC4232638": {"name": 'PMC4232638-supp', "displayName": 'PMC4232638-supp', "url": 'https://www.ncbi.nlm.nih.gov/pmc/articles/PMC4232638/bin/13059_2014_484_MOESM2_ESM.xlsx'},
    "PMC4468049": {"name": 'PMC4468049-supp', "displayName": 'PMC4468049-supp', "url": 'https://www.ncbi.nlm.nih.gov/pmc/articles/PMC4468049/bin/NIHMS632238-supplement-2.xlsx'},
    "amp": {"name": 'amp', "displayName": 'AMP', "longName": 'association for molecular pathology', "url": 'https://www.amp.org'},
    "asco": {"name": 'asco', "displayName": 'ASCO', "longName": 'American Society of Clinical Oncology', "url": 'https://meetinglibrary.asco.org'},
    "cancerhotspots": {"name": 'cancerhotspots.org', "displayName": 'cancerhotspots.org', "url": 'https://www.cancerhotspots.org', "license": 'https://opendatacommons.org/licenses/odbl/1.0'},
    "cgi": {"name": 'cancer genome interpreter', "displayName": 'CGI', "longName": 'cancer genome interpreter - Cancer Biomarkers database', "url": 'https://www.cancergenomeinterpreter.org/biomarkers', "license": 'https://creativecommons.org/publicdomain/zero/1.0', "licenseType": 'CC BY-NC 4.0', "citation": 'https://doi.org/10.1101/140475'},
    "cgl": {"name": 'cgl', "displayName": 'CGL', "longName": 'BC Cancer Genetics and Genomics Laboratory', "url": 'https://www.cancergenomeinterpreter.org'},
    "chembl": {"name": 'chembl', "displayName": 'ChEMBL', "url": 'https://www.ebi.ac.uk/chembl', "usage": 'https://creativecommons.org/licenses/by-sa/3.0', "licenseType": 'CC BY-SA 3.0', "sort": 1},
    "civic": {"name": 'civic', "displayName": 'CIViC', "url": 'https://civicdb.org', "usage": 'https://creativecommons.org/publicdomain/zero/1.0', "licenseType": 'CC0 1.0', "sort": 4},
    "clinicalTrialsGov": {"name": 'clinicaltrials.gov', "url": 'https://clinicaltrials.gov', "usage": 'https://clinicaltrials.gov/ct2/about-site/terms-conditions#Use'},
    "cosmic": {"name": 'cosmic', "displayName": 'COSMIC', "url": 'https://cancer.sanger.ac.uk/cosmic', "usage": 'https://cancer.sanger.ac.uk/cosmic/license'},
    "cpic": {"name": 'cpic', "displayName": 'CPIC', "longName": 'clinical pharmacogenetics implementation consortium', "url": 'https://cpicpgx.org', "usage": 'https://cpicpgx.org/license', "licenseType": 'CC0 1.0 Universal', "citation": 'https://cpicpgx.org/publications'},
    "dbSnp": {"name": 'dbsnp', "displayName": 'dbSNP', "url": 'https://www.ncbi.nlm.nih.gov/snp', "usage": 'https://www.ncbi.nlm.nih.gov/home/about/policies'},
    "dgidb": {"name": 'dgidb', "displayName": 'DGIdb', "longName": 'Drug Gene Interaction Database', "usage": 'http://dgidb.org/faq', "citation": 'https://doi.org/10.1093/nar/gkaa1084'},
    "diseaseOntology": {"name": 'disease ontology', "displayName": 'Disease Ontology', "longName": 'Human Disease Ontology', "url": 'http://disease-ontology.org', "license": 'https://creativecommons.org/publicdomain/zero/1.0', "licenseType": 'CC0 1.0 Universal', "sort": 1},
    "docm": {"name": 'database of curated mutations', "displayName": 'DoCM', "url": 'http://www.docm.info', "usage": 'http://www.docm.info/terms', "licenseType": 'CC BY 4.0'},
    "drugbank": {"name": 'drugbank', "displayName": 'DrugBank', "url": 'https://www.drugbank.ca', "usage": 'https://creativecommons.org/licenses/by-nc/4.0/legalcode', "licenseType": 'Attribution-NonCommercial 4.0 International', "sort": 0},
    "ensembl": {"name": 'ensembl', "displayName": 'Ensembl', "url": 'https://uswest.ensembl.org', "usage": 'https://uswest.ensembl.org/info/about/legal/disclaimer.html', "sort": 3},
    "entrezGene": {"name": 'entrez gene', "url": 'https://www.ncbi.nlm.nih.gov/gene', "usage": 'https://www.ncbi.nlm.nih.gov/home/about/policies', "sort": 1},
    "esmo": {"name": 'esmo', "displayName": 'ESMO', "longName": 'European Society for Medical Oncology', "url": 'https://www.esmo.org', "usage": 'https://www.esmo.org/terms-of-use/website-terms-conditions', "sort": 1},
    "fdaApprovals": {"name": 'fda approvals', "displayName": 'FDA Approvals', "longName": 'FDA Hematology/Oncology (Cancer) Approvals & Safety Notifications', "url": 'https://www.fda.gov/drugs/resources-information-approved-drugs/hematologyoncology-cancer-approvals-safety-notifications'},
    "fdaSrs": {"name": 'fda srs', "displayName": 'FDA-SRS', "longName": 'FDA Substance Registration System', "url": 'https://fdasis.nlm.nih.gov/srs', "sort": 3},
    "graphkb": {"name": 'graphkb', "displayName": 'GraphKB', "longName": 'Graph Knowledgebase', "url": 'https://graphkb.bcgsc.ca', "sort": 0},
    "gscTherapeuticOntology": {"name": 'gsc therapeutic ontology', "displayName": 'GSC-TO', "sort": 5},
    "hgnc": {"name": 'hgnc', "displayName": 'HGNC', "longName": 'HUGO Gene Nomenclature Committee', "url": 'https://www.genenames.org/about', "usage": 'https://www.ebi.ac.uk/about/terms-of-use', "sort": 2},
    "ipr": {"name": 'ipr', "displayName": 'IPR', "longName": 'Integrated Pipeline Reports (IPR) Aggregated Evidence Levels', "url": 'https://ipr.bcgsc.ca'},
    "iprkb": {"name": 'iprkb', "displayName": 'IPRKB', "url": 'https://ipr.bcgsc.ca/knowledgebase/references'},
    "moa": {"name": 'moa', "displayName": 'MOAlmanac', "longName": 'Molecular Oncology Almanac', "url": 'https://moalmanac.org', "usage": 'https://moalmanac.org/terms', "licenseType": 'GPL-2.0', "citation": 'https://doi.org/10.1038/s43018-021-00243-3'},
    "ncit": {"name": 'ncit', "displayName": 'NCIt', "longName": 'NCI Thesaurus', "url": 'https://ncit.nci.nih.gov/ncitbrowser', "usage": 'https://evs.nci.nih.gov/ftp1/NCI_Thesaurus/ThesaurusTermsofUse.pdf', "licenseType": 'CC BY 4.0', "sort": 2},
    "oncokb": {"name": 'oncokb', "displayName": 'OncoKB', "url": 'https://oncokb.org', "usage": 'https://oncokb.org/terms', "sort": 99999},
    "oncotree": {"name": 'oncotree', "displayName": 'OncoTree', "url": 'http://oncotree.mskcc.org', "sort": 0},
    "profyle": {"name": 'profyle', "displayName": 'PROFYLE', "url": 'https://www.profyle.ca/', "sort": 99999},
    "pubmed": {"name": 'pubmed', "displayName": 'PubMed', "url": 'https://pubmed.ncbi.nlm.nih.gov', "usage": 'https://www.ncbi.nlm.nih.gov/home/about/policies'},
    "refseq": {"name": 'refseq', "displayName": 'RefSeq', "longName": 'RefSeq: NCBI Reference Sequence Database', "url": 'https://www.ncbi.nlm.nih.gov/refseq', "usage": 'https://www.ncbi.nlm.nih.gov/home/about/policies'},
    "sequenceOntology": {"name": 'sequence ontology', "url": 'http://www.sequenceontology.org', "usage": 'http://www.sequenceontology.org/?page_id=269'},
    "tso500": {"name": 'tso500', "displayName": 'TSO500', "longName": 'TruSight Oncology 500', "url": 'https://www.illumina.com', "usage": 'https://www.illumina.com/products/by-type/clinical-research-products/trusight-oncology-500.html', "sort": 99999},
    "uberon": {"name": 'uberon', "displayName": 'Uberon', "url": 'http://uberon.github.io', "usage": 'http://obofoundry.github.io/principles/fp-001-open.html'},
    "vario": {"name": 'vario', "url": 'http://variationontology.org', "usage": 'http://variationontology.org/citing.shtml'},
    "vicc": {"name": 'Variant Interpretation for Cancer Consortium', "displayName": 'VICC', "url": 'https://cancervariants.org'},
}


def source_registry_df(spark: SparkSession) -> DataFrame:
    """The registry as a DataFrame in SOURCE_SCHEMA shape (rid = hash
    of name, like ``upsert_source``)."""
    from graphkb_spark.kb import source_rid

    fields = [f.name for f in SOURCE_SCHEMA.fields if f.name != "rid"]
    rows = [
        tuple(rec.get(f) for f in fields) for rec in SOURCE_REGISTRY.values()
    ]
    df = spark.createDataFrame(
        rows, ", ".join(f"{f} {'int' if f == 'sort' else 'string'}" for f in fields)
    )
    return df.withColumn("rid", source_rid(F.col("name"))).select(
        [f.name for f in SOURCE_SCHEMA.fields]
    )


def seed_sources(spark: SparkSession, kb):
    """Upsert the full registry into ``kb.sources`` as one batch."""
    from graphkb_spark.operators.merge import merge_upsert

    merged = merge_upsert(kb.sources, source_registry_df(spark), ["rid"])
    kb.sources = merged.drop("_action").select(
        [f.name for f in SOURCE_SCHEMA.fields]
    )
    return kb
