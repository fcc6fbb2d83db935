"""Variant-name / citation / phase normalizers (SURVEY §2.8 F2-F4,
F9-F11).

Design split:
- F9/F10/F11 are pure Column expressions (JVM-side regexp, codegen) —
  they run inside whole-stage codegen with zero Python cost at 100 TB.
- F2/F3/F4 are genuine grammars with fallback probing into the HGVS
  parser, so they are Python functions wrapped as Arrow-batched Pandas
  UDFs returning typed structs (one->many results return arrays the
  caller explodes JVM-side).

Reference behavior being reproduced (not translated):
- F2 CIViC variant-name dispatch  /root/reference/src/civic/variant.js:20-257
- F3 OncoKB variant-name parser   /root/reference/src/oncokb/index.js:131-193
- F4 DOCM notation fixes          /root/reference/src/docm/index.js:33-67
- F9 abstract citation parse      /root/reference/src/oncokb/index.js:389-397
- F10 trial-phase canonicalizer   /root/reference/src/clinicaltrialsgov/index.js:92-110
- F11 year extraction             /root/reference/src/entrez/pubmed.js:44-58
"""

from __future__ import annotations

import re
from typing import Any

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from graphkb_spark.functions.hgvs import parse_variant

# ---------------------------------------------------------------------------
# F3: OncoKB variant-name parser
# ---------------------------------------------------------------------------

ONCOKB_PARSE_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("reference2", T.StringType()),
        T.StructField("flipped", T.BooleanType()),
        T.StructField("error", T.StringType()),
    ]
)

# category names OncoKB uses verbatim as vocabulary terms
_ONCOKB_VOCAB = {
    "amplification": "amplification",
    "deletion": "deletion",
    "fusions": "fusion",
    "fusion": "fusion",
    "truncating mutations": "truncating",
    "oncogenic mutations": "mutation",
    "microsatellite instability-high": "microsatellite instability",
    "promoter mutations": "promoter mutation",
    "wildtype": "wildtype",
}

_SPLICE_RANGE = re.compile(r"^([a-z])?(\d+)_([a-z])?(\d+)splice$")
_FUSION_PAIR = re.compile(r"^([a-z0-9_]+)[–-]([a-z0-9_]+)(\s+fusion)?$", re.I)
_EXON_EVT = re.compile(
    r"^exon (\d+) (mutation|insertion|deletion|deletion/insertion|splice mutation"
    r"|indel|missense mutation)s?$",
    re.I,
)
_EXON_PAIR_DEL = re.compile(r"^exon (\d+) and (\d+) deletion$", re.I)
_TRUNC_FS = re.compile(r"^([a-z]\d+)_([a-z]\d+)(trunc|fs)$", re.I)


def parse_oncokb_variant_name(name: str, reference1: str | None = None) -> dict[str, Any]:
    """Parse one OncoKB variant name into a notation/category 'type'
    plus fusion partner info; errors are per-row values."""
    out: dict[str, Any] = {"type": None, "reference2": None, "flipped": None, "error": None}
    if name is None:
        out["error"] = "null variant name"
        return out
    v = name.lower().strip()

    if parse_variant(f"p.{v}")["error"] is None:
        out["type"] = f"p.{v}"
        return out

    m = _SPLICE_RANGE.match(v)
    if m:
        out["type"] = f"p.({m.group(1) or '?'}{m.group(2)}_{m.group(3) or '?'}{m.group(4)})spl"
        return out
    if v.endswith("_splice"):
        out["type"] = f"p.{v.replace('_splice', 'spl')}"
        return out

    m = _FUSION_PAIR.match(v)
    if m and v not in _ONCOKB_VOCAB:
        gene1, gene2 = m.group(1), m.group(2)
        if reference1:
            r1 = reference1.lower().strip()
            if r1 == gene1:
                out.update(type="fusion", reference2=gene2, flipped=False)
            elif r1 == gene2:
                out.update(type="fusion", reference2=gene1, flipped=True)
            else:
                out["error"] = (
                    f"fusion gene names ({gene1},{gene2}) do not match "
                    f"expected gene name ({reference1})"
                )
        else:
            out.update(type="fusion", reference2=gene2, flipped=False)
        return out

    m = _EXON_EVT.match(v)
    if m:
        pos, evt = m.group(1), m.group(2).lower()
        if evt in ("deletion/insertion", "indel"):
            out["type"] = f"e.{pos}delins"
        else:
            out["type"] = f"e.{pos}{evt[:3]}"
        return out

    if v in _ONCOKB_VOCAB:
        out["type"] = _ONCOKB_VOCAB[v]
        return out

    m = _EXON_PAIR_DEL.match(v)
    if m:
        out["type"] = f"e.{m.group(1)}_{m.group(2)}del"
        return out

    m = _TRUNC_FS.match(v)
    if m:
        suffix = "*" if m.group(3).lower() == "trunc" else "fs"
        out["type"] = f"p.({m.group(1)}_{m.group(2)}){suffix}"
        return out

    out["error"] = f"unable to parse variant name: {name[:80]}"
    return out


@F.pandas_udf(ONCOKB_PARSE_SCHEMA)
def parse_oncokb_variant_name_udf(names: pd.Series, refs: pd.Series) -> pd.DataFrame:
    rows = [parse_oncokb_variant_name(n, r) for n, r in zip(names, refs)]
    return pd.DataFrame(rows, columns=[f.name for f in ONCOKB_PARSE_SCHEMA.fields])


# ---------------------------------------------------------------------------
# F4: DOCM notation fixes
# ---------------------------------------------------------------------------

_DOCM_TRAILING_DEL = re.compile(r"^p\.([A-Z]+)(\d+)-$")
# X excluded from alt: DOCM uses it to mean frameshift
_DOCM_MULTI_SUB = re.compile(r"^p\.([A-Z][A-Z]+)(\d+)([A-WYZ]+)$")


def fix_docm_variant(variant: str) -> str:
    """Rewrite DOCM's non-standard deletion/delins spellings into HGVS;
    unknown shapes pass through unchanged."""
    if variant is None:
        return variant
    m = _DOCM_TRAILING_DEL.match(variant)
    if m:
        seq, pos = m.group(1), int(m.group(2))
        if len(seq) == 1:
            return f"p.{seq}{pos}del{seq}"
        return f"p.{seq[0]}{pos}_{seq[-1]}{pos + len(seq) - 1}del{seq}"
    m = _DOCM_MULTI_SUB.match(variant)
    if m:
        ref, pos, alt = m.group(1), int(m.group(2)), m.group(3)
        prefix = 0
        while prefix < len(ref) and prefix < len(alt) and ref[prefix] == alt[prefix]:
            prefix += 1
        pos += prefix
        ref, alt = ref[prefix:], alt[prefix:]
        if ref and alt:
            if len(ref) > 1:
                return f"p.{ref[0]}{pos}_{ref[-1]}{pos + len(ref) - 1}del{ref}ins{alt}"
            return f"p.{ref[0]}{pos}del{ref}ins{alt}"
    return variant


@F.pandas_udf(T.StringType())
def fix_docm_variant_udf(variants: pd.Series) -> pd.Series:
    return variants.map(fix_docm_variant)


# ---------------------------------------------------------------------------
# F2: CIViC variant-name normalization (dispatch subset)
# ---------------------------------------------------------------------------

CIVIC_NORM_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("reference1", T.StringType()),
            T.StructField("reference2", T.StringType()),
            T.StructField("variant", T.StringType()),
            T.StructField("positional", T.BooleanType()),
            T.StructField("error", T.StringType()),
        ]
    )
)

_CIVIC_CATEGORIES = {
    "loss-of-function",
    "gain-of-function",
    "overexpression",
    "expression",
    "amplification",
    "mutation",
}
_TRANSLOCATION = re.compile(r"^t\(([^;()]+);([^;()]+)\)\(([^;()]+);([^;()]+)\)$", re.I)
_EXON_RANGE_CIVIC = re.compile(r"^exon (\d+)(?:-(\d+))? (deletion|insertion|mutation)s?$", re.I)
_GENE_FUSION_CIVIC = re.compile(r"^([a-z0-9]+)-([a-z0-9]+)(?:\s+fusion)?$", re.I)


def normalize_civic_variant(name: str, gene: str) -> list[dict[str, Any]]:
    """One CIViC variant name -> list of normalized variant records
    (conjunctions split on '+'/';' into multiple records)."""
    if name is None:
        return [{"reference1": gene, "reference2": None, "variant": None,
                 "positional": False, "error": "null variant name"}]
    gene = (gene or "").lower().strip()
    n = name.replace(" + ", " and ").replace("; ", " and ").lower().strip()

    if " / " in n:
        return [{"reference1": gene, "reference2": None, "variant": None,
                 "positional": False,
                 "error": f"/ has ambiguous meaning in CIViC ({n})"}]
    if " and " in n:
        out: list[dict[str, Any]] = []
        for part in n.split(" and "):
            out.extend(normalize_civic_variant(part.strip(), gene))
        return out

    if n in _CIVIC_CATEGORIES:
        return [{"reference1": gene, "reference2": None,
                 "variant": n.replace("-", " "), "positional": False, "error": None}]

    m = _TRANSLOCATION.match(n)
    if m:
        return [{"reference1": m.group(1), "reference2": m.group(2),
                 "variant": f"translocation({m.group(3)}, {m.group(4)})",
                 "positional": True, "error": None}]

    m = _EXON_RANGE_CIVIC.match(n)
    if m:
        start, end, evt = m.group(1), m.group(2), m.group(3)[:3]
        rng = f"{start}_{end}" if end else start
        return [{"reference1": gene, "reference2": None, "variant": f"e.{rng}{evt}",
                 "positional": True, "error": None}]

    m = _GENE_FUSION_CIVIC.match(n)
    if m and parse_variant(f"p.{n}")["error"] is not None:
        g1, g2 = m.group(1), m.group(2)
        # abl == abl1 equivalence when matching the annotated gene
        def same(a: str, b: str) -> bool:
            eq = {"abl", "abl1"}
            return a == b or ({a, b} <= eq)
        if same(g1, gene) or same(g2, gene) or not gene:
            return [{"reference1": g1, "reference2": g2, "variant": "fusion",
                     "positional": False, "error": None}]

    parsed = parse_variant(f"p.{n}")
    if parsed["error"] is None:
        return [{"reference1": gene, "reference2": None, "variant": f"p.{n}",
                 "positional": True, "error": None}]
    parsed = parse_variant(n)
    if parsed["error"] is None:
        return [{"reference1": gene, "reference2": None, "variant": n,
                 "positional": True, "error": None}]
    return [{"reference1": gene, "reference2": None, "variant": None,
             "positional": False, "error": f"unparseable CIViC variant: {name[:80]}"}]


@F.pandas_udf(CIVIC_NORM_SCHEMA)
def normalize_civic_variant_udf(names: pd.Series, genes: pd.Series) -> pd.Series:
    return pd.Series([normalize_civic_variant(n, g) for n, g in zip(names, genes)])


# ---------------------------------------------------------------------------
# F9-F11: JVM-side Column expressions
# ---------------------------------------------------------------------------

_CITATION_PAT = r".*Abstract\s*#\s*([A-Za-z0-9][A-Za-z0-9-]*)[.,]? (AACR|ASCO),? (2\d{3})"


def parse_abstract_citation(col: str | Column) -> Column:
    """F9: 'Abstract# 8001, ASCO 2014' -> struct(abstractNumber, source,
    year); null struct when not matching. Pure regexp_extract."""
    c = F.col(col) if isinstance(col, str) else col
    num = F.regexp_extract(c, _CITATION_PAT, 1)
    src = F.regexp_extract(c, _CITATION_PAT, 2)
    year = F.regexp_extract(c, _CITATION_PAT, 3)
    ok = num != ""
    return F.when(
        ok,
        F.struct(
            num.alias("abstractNumber"),
            src.alias("source"),
            year.cast("int").alias("year"),
        ),
    )


def canonical_phases(col: str | Column) -> Column:
    """F10: ['EARLY_PHASE1', 'PHASE1/PHASE2'] -> '1/1/2' — split on
    ','/'/', strip n/a + 'ph', extract the digit, sort, join. All
    higher-order array functions, no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    tokens = F.flatten(
        F.transform(c, lambda x: F.split(F.lower(F.trim(x)), r"[,/]"))
    )
    cleaned = F.filter(
        F.transform(tokens, lambda t: F.regexp_extract(t, r"^(?:early_)?phase(\d+)$", 1)),
        lambda t: t != "",
    )
    return F.array_join(F.array_sort(cleaned), "/")


def extract_year(col: str | Column) -> Column:
    """F11: first 4-digit year in a free-text date (reference pubmed
    sortpubdate regex)."""
    c = F.col(col) if isinstance(col, str) else col
    y = F.regexp_extract(c, r"(1[89]\d{2}|20\d{2})", 1)
    return F.when(y != "", y.cast("int"))


# ---------------------------------------------------------------------------
# F6: relevance translation table (broadcast lookup join, not a switch)
# ---------------------------------------------------------------------------

# (evidence_type, direction, significance) -> relevance term. The
# reference encodes this as a ~320-line switch
# (/root/reference/src/civic/relevance.js:11-333); in Spark it is a
# broadcast dimension table so translation is a map-side join.
RELEVANCE_ROWS = [
    ("PREDICTIVE", "SUPPORTS", "SENSITIVITYRESPONSE", "sensitivity"),
    ("PREDICTIVE", "SUPPORTS", "RESISTANCE", "resistance"),
    ("PREDICTIVE", "SUPPORTS", "ADVERSE_RESPONSE", "adverse response"),
    ("PREDICTIVE", "SUPPORTS", "REDUCED_SENSITIVITY", "reduced sensitivity"),
    ("PREDICTIVE", "DOES_NOT_SUPPORT", "SENSITIVITYRESPONSE", "no response"),
    ("PREDICTIVE", "DOES_NOT_SUPPORT", "RESISTANCE", "no resistance"),
    ("DIAGNOSTIC", "SUPPORTS", "POSITIVE", "favours diagnosis"),
    ("DIAGNOSTIC", "SUPPORTS", "NEGATIVE", "opposes diagnosis"),
    ("PROGNOSTIC", "SUPPORTS", "POOR_OUTCOME", "unfavourable prognosis"),
    ("PROGNOSTIC", "SUPPORTS", "BETTER_OUTCOME", "favourable prognosis"),
    ("PREDISPOSING", "SUPPORTS", "PREDISPOSITION", "predisposing"),
    ("PREDISPOSING", "SUPPORTS", "PROTECTIVENESS", "protective"),
    ("ONCOGENIC", "SUPPORTS", "ONCOGENICITY", "oncogenic"),
    ("ONCOGENIC", "SUPPORTS", "PROTECTIVENESS", "tumour suppressive"),
    ("FUNCTIONAL", "SUPPORTS", "GAIN_OF_FUNCTION", "gain of function"),
    ("FUNCTIONAL", "SUPPORTS", "LOSS_OF_FUNCTION", "loss of function"),
    ("FUNCTIONAL", "SUPPORTS", "NEOMORPHIC", "neomorphic"),
    ("FUNCTIONAL", "SUPPORTS", "DOMINANT_NEGATIVE", "dominant negative"),
    ("FUNCTIONAL", "SUPPORTS", "UNALTERED_FUNCTION", "no functional effect"),
]

RELEVANCE_SCHEMA = T.StructType(
    [
        T.StructField("evidence_type", T.StringType()),
        T.StructField("direction", T.StringType()),
        T.StructField("significance", T.StringType()),
        T.StructField("relevance", T.StringType()),
    ]
)


def relevance_table(spark) -> "F.DataFrame":
    """The F6 translation table as a broadcastable dimension."""
    return spark.createDataFrame(RELEVANCE_ROWS, RELEVANCE_SCHEMA)


def translate_relevance(df, spark, on=("evidence_type", "direction", "significance")):
    """Broadcast-join the relevance translation onto ``df``; unmatched
    combinations get a null relevance (per-row quarantine downstream)."""
    dim = relevance_table(spark)
    return df.join(F.broadcast(dim), list(on), "left")


# ---------------------------------------------------------------------------
# CGI variant-combination preprocessing (reference
# src/cancergenomeinterpreter/index.js:122-189 ``preprocessVariants``)
# ---------------------------------------------------------------------------

_CGI_PROT_LIST = re.compile(r"^(\w+) \(([A-Z0-9*,;]+)\)$")
_CGI_SINGLE_POS = re.compile(r"^([A-Z])?(\d+)$")
_CGI_POS_RANGE = re.compile(r"^(\d+)-(\d+)$")
_CGI_GENE_TAIL = re.compile(r"^(\w+)\s+(.*)$")
_CGI_EXON_EVT = re.compile(r"^exon (\d+) (insertion|deletion)s?$")
_CGI_FUSION = re.compile(r"^([A-Za-z0-9.]+)-([A-Za-z0-9.]+) fusion$")

CGI_COMBO_SCHEMA = T.StructType(
    [
        T.StructField("combinations", T.ArrayType(T.ArrayType(T.StringType()))),
        T.StructField("error", T.StringType()),
    ]
)


def preprocess_cgi_variants(
    biomarker: str, variant_class: str, protein: str
) -> dict[str, Any]:
    """One CGI biomarker -> condition-set combinations (variant names).

    Mirrors the reference branch-for-branch: explicit protein column
    short-circuits; otherwise each '+'-separated biomarker part expands
    to protein lists / exon events / category variants / fusions, and
    two-part biomarkers cross-product (:178-187). 3+ combinations and
    unrecognized parts are per-row errors, never failures.
    """
    if (biomarker or "").count("+") >= 2:
        return {"combinations": None,
                "error": "Missing logic to process variant combinations of 3 or more"}
    if (protein or "").strip():
        return {"combinations": [[protein.replace(":", ":p.")]], "error": None}

    levels: list[list[str]] = []
    for part in re.split(r"\s*\+\s*", (biomarker or "").strip()):
        names: list[str] = []
        m = _CGI_PROT_LIST.match(part)
        if m:
            gene, tail = m.group(1), m.group(2)
            for single in re.split(r"[,;]", tail):
                hgvsp = f"p.{single}"
                sm = _CGI_SINGLE_POS.match(single)
                rm = _CGI_POS_RANGE.match(tail)
                if sm:
                    ref_aa = sm.group(1) or "?"
                    hgvsp = f"p.{ref_aa}{sm.group(2)}{(variant_class or '').lower()}"
                elif rm:
                    hgvsp = f"p.(?{rm.group(1)}_?{rm.group(2)}){(variant_class or '').lower()}"
                names.append(f"{gene}:{hgvsp}")
            levels.append(names)
            continue
        fm = _CGI_FUSION.match(part)
        if fm:
            levels.append([f"({fm.group(1)},{fm.group(2)}):fusion"])
            continue
        gm = _CGI_GENE_TAIL.match(part)
        if gm:
            gene, tail = gm.group(1), gm.group(2)
            em = _CGI_EXON_EVT.match(tail)
            if em:
                levels.append([f"{gene}:e.{em.group(1)}{em.group(2)[:3]}"])
            else:
                levels.append([f"{gene}:{tail.lower().strip()}"])
            continue
        return {"combinations": None, "error": f"unable to process variant ({part})"}

    if len(levels) > 1:
        combos = [[a, b] for a in levels[0] for b in levels[1]]
    else:
        combos = [[v] for v in levels[0]]
    return {"combinations": combos, "error": None}


@F.pandas_udf(CGI_COMBO_SCHEMA)
def preprocess_cgi_variants_udf(
    biomarkers: pd.Series, classes: pd.Series, proteins: pd.Series
) -> pd.DataFrame:
    rows = [
        preprocess_cgi_variants(b, c, p)
        for b, c, p in zip(biomarkers, classes, proteins)
    ]
    return pd.DataFrame(rows)


# known-typo fix tables, src/cancergenomeinterpreter/index.js:39-70
CGI_RELEVANCE_MAPPING = {
    "increased toxicity (myelosupression)": "increased toxicity (myelosuppression)",
    "no responsive": "no response",
    "resistant": "resistance",
    "responsive": "response",
}
CGI_DISEASE_MAPPING = {
    "any cancer type": "cancer",
    "billiary tract": "Biliary tract cancer",
    "cervix squamous cell": "cervix squamous cell carcinoma",
    "endometrium": "endometrial cancer",
    "gastrointestinal stromal": "gastrointestinal stromal tumor",
    "head an neck": "head and neck cancer",
    "head an neck squamous": "head and neck squamous cell carcinoma",
    "lung squamous cell": "lung squamous cell carcinoma",
    "malignant peripheral nerve sheat tumor": "malignant peripheral nerve sheath tumor",
    "ovary": "ovarian cancer",
    "thymic": "thymic tumor",
}
CGI_THERAPY_MAPPING = {
    "MEK inhibitor (alone or in combination)": "mek inhibitor",
    "egfr tk inhibitor": "egfr tyrosine kinase inhibitor",
    "egfr tk inhibitors": "egfr tyrosine kinase inhibitor",
    "flourouracil": "fluorouracil",
    "fluvestrant": "fulvestrant",
    "jak inhibitors (alone or in combination)": "jak inhibitor",
    "mek inhibitors (alone or in combination)": "mek inhibitor",
    "tensirolimus": "temsirolimus",
    "trastuzumab deruxtecan-nxki": "fam-trastuzumab deruxtecan-nxki",
}
