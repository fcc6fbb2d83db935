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
            T.StructField("link", T.StringType()),
        ]
    )
)

# hardcoded CIViC-name -> notation fixes (reference
# /root/reference/src/civic/variant.js:20-40 SUBS)
_CIVIC_SUBS = {
    "E746_T751>I": "E746_T751delinsI",
    "EML4-ALK C1156Y-L1196M": "EML4-ALK and C1156Y and L1196M",
    "EML4-ALK C1156Y-L1198F": "EML4-ALK and C1156Y and L1198F",
    "EML4-ALK G1202R-L1196M": "EML4-ALK and G1202R and L1196M",
    "EML4-ALK G1202R-L1198F": "EML4-ALK and G1202R and L1198F",
    "EML4-ALK L1196M-L1198F": "EML4-ALK and L1196M and L1198F",
    "EML4-ALK T1151INST": "EML4-ALK and T1151_?1152insT",
    "Ex19 del L858R": "e.19del and L858R",
    "G12/G13": "p.(G12_G13)mut",
    "K558NP": "K558delKinsNP",
    "T1151insT": "T1151_?1152insT",
    "V600E AMPLIFICATION": "V600E and AMPLIFICATION",
    "V600E+V600M": "V600E and V600M",
    "V600_K601>E": "V600_K601delVKinsE",
    "del 755-759": "?755_?759del",
    "di842-843vm": "D842_I843delDIinsVM",
    "mutations": "mutation",
    "p.193_196dupSTSC (c.577_588dupAGCACCAGCTGC)":
        "p.S193_C196dupSTSC (c.577_588dupAGCACCAGCTGC)",
    "p26.3-25.3 11mb del": "y.p26.3_p25.3del",
}
_CIVIC_NOT_IMPLEMENTED = {"Non-V600", "P-Loop Mutation"}

_CIVIC_CATEGORIES = {
    "loss-of-function",
    "gain-of-function",
    "overexpression",
    "expression",
    "amplification",
    "mutation",
}
_TRANSLOCATION = re.compile(r"^t\(([^;()]+);([^;()]+)\)\(([^;()]+);([^;()]+)\)$", re.I)
_PROTEIN_CDS = re.compile(r"^(p\.)?([a-z*]\d+\S*)\s+\((c\.[^)]+)\)$", re.I)
_DEPRECATED_CDS = re.compile(r"^c\.(\d+)([acgt][acgt]+)>([acgt][acgt]+)$")
_INTRON_EXON_CIVIC = re.compile(
    r"^(intron|exon)\s+(\d+)(?:-(\d+))?\s+(mutation|deletion|frameshift|insertion)s?$",
    re.I,
)
_GENE_FUSION_CIVIC = re.compile(r"^([a-z][^-\s]*)(-|::)([a-z][^-\s]*)\s*(\S+)?$", re.I)
_FUSION_EXONS_A = re.compile(r"^e(\d+)-e(\d+)$")
_FUSION_EXONS_B = re.compile(r"^[a-z](\d+);[a-z](\d+)$")
_SINGLE_GENE_FUSION = re.compile(r"^[a-z][^-\s]*\s+fusions?$", re.I)
_SPACED_CDS = re.compile(r"^\s*c\.\d+\s*[a-z]\s*>[a-z]\s*$", re.I)
_CATEGORY_MUTATION = re.compile(r"^((delete?rious)|promoter)\s+mutation$", re.I)
_SPLICING_ALTERATION = re.compile(r"^(splicing\s+alteration)\s+\((c\..*)\)$", re.I)
_PHOS_SPLICE = re.compile(
    r"^([a-z]\d+)\s+(phosphorylation|splice site)(\s+mutation)?$", re.I
)
_FUSION_PLUS_MUT = re.compile(r"^(\w+\s+fusion)\s+([a-z]\d+\S+)$", re.I)
_TRAILING_MUTATION = re.compile(r"^(.*)\s+mutations?$")


def _rec(**kw: Any) -> dict[str, Any]:
    base = {"reference1": None, "reference2": None, "variant": None,
            "positional": False, "error": None, "link": None}
    base.update(kw)
    return base


def _same_gene(a: str, b: str) -> bool:
    """abl == abl1 equivalence when matching the annotated gene
    (reference compareGeneNames, src/civic/variant.js:49-57)."""
    eq = {"abl", "abl1"}
    a, b = a.lower(), b.lower()
    return a == b or ({a, b} <= eq)


def normalize_civic_variant(name: str, gene: str) -> list[dict[str, Any]]:
    """One CIViC variant name -> list of normalized variant records.

    Full branch mirror of the reference ``normalizeGeneVariant``
    (/root/reference/src/civic/variant.js:67-257): hardcoded SUBS
    fixes, conjunction split, category names, translocations, combined
    protein+cds (cds emitted as a ``link='inferredBy'`` record),
    intron/exon events, gene fusions with exon tails, single-gene
    fusions, spaced cds, promoter/deleterious/domain categories,
    splicing alteration (category emitted as ``link='infers'``),
    phosphorylation / splice-site positions, fusion+resistance pairs,
    '<gene> mutation', then parser fallback (bare then p.-prefixed)
    and finally a category record — errors are per-row quarantine
    where the reference throws."""
    if name is None:
        return [_rec(reference1=gene, error="null variant name")]
    if name in _CIVIC_NOT_IMPLEMENTED:
        return [_rec(reference1=(gene or "").lower().strip(),
                     error=f"unable to process CIViC variant {gene} {name}")]
    gene = (gene or "").lower().strip()
    raw = _CIVIC_SUBS.get(name, name)
    n = raw.replace(" + ", " and ").replace("; ", " and ").lower().strip()

    if " / " in n:
        return [_rec(reference1=gene,
                     error=f"/ has ambiguous meaning in CIViC ({n})")]
    if " and " in n:
        out: list[dict[str, Any]] = []
        for part in n.split(" and "):
            out.extend(normalize_civic_variant(part.strip(), gene))
        return out

    if n in _CIVIC_CATEGORIES:
        return [_rec(reference1=gene, variant=n.replace("-", " "))]

    m = _TRANSLOCATION.match(n)
    if m:
        return [_rec(reference1=m.group(1), reference2=m.group(2),
                     variant=f"translocation({m.group(3)}, {m.group(4)})",
                     positional=True)]

    m = _PROTEIN_CDS.match(n)
    if m:
        protein, cds = m.group(2), m.group(3)
        dm = _DEPRECATED_CDS.match(cds)
        if dm and len(dm.group(2)) == len(dm.group(3)):
            pos, ref, alt = int(dm.group(1)), dm.group(2), dm.group(3)
            cds = f"c.{pos}_{pos + len(ref) - 1}del{ref}ins{alt}"
        return [
            _rec(reference1=gene, variant=f"p.{protein}", positional=True),
            _rec(reference1=gene, variant=cds, positional=True,
                 link="inferredBy"),
        ]

    m = _INTRON_EXON_CIVIC.match(n)
    if m:
        prefix = "e" if m.group(1) == "exon" else "i"
        rng = f"{m.group(2)}_{m.group(3)}" if m.group(3) else m.group(2)
        evt = "fs" if m.group(4) == "frameshift" else m.group(4)[:3]
        return [_rec(reference1=gene, variant=f"{prefix}.{rng}{evt}",
                     positional=True)]

    m = _GENE_FUSION_CIVIC.match(n)
    if m:
        g1, g2, tail = m.group(1), m.group(3), m.group(4)
        rest: dict[str, Any] = {"variant": "fusion", "positional": False}
        recurse = None
        if tail:
            em = _FUSION_EXONS_A.match(tail) or _FUSION_EXONS_B.match(tail)
            if em:
                rest = {"variant": f"fusion(e.{em.group(1)},e.{em.group(2)})",
                        "positional": True}
            else:
                recurse = tail
        if recurse is not None:
            return (
                normalize_civic_variant(f"{g1}-{g2}", gene)
                + normalize_civic_variant(recurse, gene)
            )
        if _same_gene(g1, gene):
            return [_rec(reference1=gene, reference2=g2, **rest)]
        if _same_gene(g2, gene):
            return [_rec(reference1=g1, reference2=gene, **rest)]
        return [_rec(reference1=gene,
                     error=f"linked gene name ({gene}) does not match either "
                           f"fusion partner ({g1}, {g2}) for ({name})")]

    if _SINGLE_GENE_FUSION.match(n):
        return [_rec(reference1=gene, variant="fusion")]

    if _SPACED_CDS.match(n):
        return [_rec(reference1=gene, variant=re.sub(r"\s+", "", n),
                     positional=True)]

    if _CATEGORY_MUTATION.match(n) or "domain" in n:
        return [_rec(reference1=gene, variant=n)]

    m = _SPLICING_ALTERATION.match(n)
    if m:
        return [
            _rec(reference1=gene, variant=m.group(2), positional=True),
            _rec(reference1=gene, variant=m.group(1), link="infers"),
        ]

    m = _PHOS_SPLICE.match(n)
    if m:
        suffix = "phos" if m.group(2) == "phosphorylation" else "spl"
        return [_rec(reference1=gene, variant=f"p.{m.group(1)}{suffix}",
                     positional=True)]

    m = _FUSION_PLUS_MUT.match(n)
    if m:
        return (
            normalize_civic_variant(m.group(1), gene)
            + normalize_civic_variant(m.group(2), gene)
        )

    m = _TRAILING_MUTATION.match(n)
    if m and _same_gene(m.group(1), gene):
        return [_rec(reference1=gene, variant="mutation")]

    if parse_variant(n)["error"] is None:
        return [_rec(reference1=gene, variant=n, positional=True)]
    if parse_variant(f"p.{n}")["error"] is None:
        return [_rec(reference1=gene, variant=f"p.{n}", positional=True)]
    # reference falls back to a category variant with the raw name as
    # the type (src/civic/variant.js:255-257)
    return [_rec(reference1=gene, variant=n)]


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
