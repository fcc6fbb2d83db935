"""HGVS-like variant-notation parser — the reference's one mandatory
big UDF (SURVEY §2.8 F1; reference: external package
@bcgsc-pori/graphkb-parser used from 12 loaders, e.g.
src/civic/variant.js:528, src/oncokb/index.js:279-283).

Covers the subset the reference's fixtures exercise: protein
substitutions/frameshifts (p.G12D, p.R777fs), deletions / insertions /
duplications / delins on p./c./g./e. coordinates incl. ranges and cds
offsets (c.123-2A>G), exon-coordinate events (e.19del), and two-gene
fusions ``fusion(e.13,e.3)``.

Pure, deterministic Python -> vectorized via an Arrow-batched Pandas
UDF returning a typed struct; downstream consumers stay in Column
algebra. Invalid notation yields a null struct plus an error string —
per-row quarantine, never a job failure (reference loaders collect
errorList files per loader, e.g. src/civic/index.js:491-499).
"""

from __future__ import annotations

import re
from typing import Any

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

PREFIX_CLASS = {
    "p": "ProteinPosition",
    "c": "CdsPosition",
    "g": "GenomicPosition",
    "e": "ExonicPosition",
    "y": "CytobandPosition",
    "i": "IntronicPosition",
}

VARIANT_SCHEMA = T.StructType(
    [
        T.StructField("prefix", T.StringType()),
        T.StructField("variant_type", T.StringType()),
        T.StructField("break1_start", T.IntegerType()),
        T.StructField("break1_end", T.IntegerType()),
        T.StructField("break2_start", T.IntegerType()),
        T.StructField("break2_end", T.IntegerType()),
        T.StructField("ref_seq", T.StringType()),
        T.StructField("alt_seq", T.StringType()),
        T.StructField("ref_aa", T.StringType()),
        T.StructField("alt_aa", T.StringType()),
        T.StructField("reference1", T.StringType()),
        T.StructField("reference2", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)

_EMPTY = {f.name: None for f in VARIANT_SCHEMA.fields}

_POS = r"(\d+)(?:[+-]\d+)?"  # cds offsets tolerated, offset dropped
_AA = r"([A-Z\*\?])"

_P_SUB = re.compile(rf"^p\.{_AA}(\d+){_AA}$", re.I)
_P_FS = re.compile(r"^p\.([A-Z\*])(\d+)(?:[A-Z\*])?fs(?:\*\d+)?$", re.I)
_P_RANGE_EVT = re.compile(
    r"^p\.([A-Z\*])(\d+)(?:_([A-Z\*])(\d+))?(delins|del|dup|ins)([A-Z\*]*)$", re.I
)
_NUC_SUB = re.compile(rf"^([cg])\.{_POS}([ACGT])>([ACGT])$", re.I)
_NUC_EVT = re.compile(
    rf"^([cge])\.{_POS}(?:_{_POS})?(delins|del|dup|ins)([ACGT]*)$", re.I
)
_FUSION = re.compile(r"^fusion\(e\.(\d+),e\.(\d+)\)$", re.I)
_GENE_PREFIX = re.compile(r"^([A-Za-z0-9_.-]+):(.+)$")
_PAIR_PREFIX = re.compile(r"^\(([^,()]+),([^,()]+)\):(.+)$")


def parse_variant(notation: str) -> dict[str, Any]:
    """Parse one HGVS-like string into the VARIANT_SCHEMA dict."""
    out = dict(_EMPTY)
    if notation is None:
        out["error"] = "null notation"
        return out
    s = notation.strip()

    m = _PAIR_PREFIX.match(s)
    if m:
        out["reference1"], out["reference2"], s = (
            m.group(1).strip(),
            m.group(2).strip(),
            m.group(3).strip(),
        )
    else:
        m = _GENE_PREFIX.match(s)
        if m and not s.lower().startswith("fusion("):
            out["reference1"], s = m.group(1).strip(), m.group(2).strip()

    m = _FUSION.match(s)
    if m:
        out.update(
            prefix="e",
            variant_type="fusion",
            break1_start=int(m.group(1)),
            break2_start=int(m.group(2)),
        )
        return out

    m = _P_SUB.match(s)
    if m:
        ref, pos, alt = m.group(1), int(m.group(2)), m.group(3)
        out.update(
            prefix="p",
            variant_type="missense" if alt not in ("*", "?") else "nonsense",
            break1_start=pos,
            ref_aa=ref,
            alt_aa=alt,
        )
        return out

    m = _P_FS.match(s)
    if m:
        out.update(
            prefix="p",
            variant_type="frameshift",
            break1_start=int(m.group(2)),
            ref_aa=m.group(1),
        )
        return out

    m = _P_RANGE_EVT.match(s)
    if m:
        out.update(
            prefix="p",
            variant_type={"del": "deletion", "dup": "duplication", "ins": "insertion",
                          "delins": "indel"}[m.group(5).lower()],
            break1_start=int(m.group(2)),
            break2_start=int(m.group(4)) if m.group(4) else None,
            ref_aa=m.group(1),
            alt_seq=m.group(6) or None,
        )
        return out

    m = _NUC_SUB.match(s)
    if m:
        out.update(
            prefix=m.group(1).lower(),
            variant_type="substitution",
            break1_start=int(m.group(2)),
            ref_seq=m.group(3).upper(),
            alt_seq=m.group(4).upper(),
        )
        return out

    m = _NUC_EVT.match(s)
    if m:
        out.update(
            prefix=m.group(1).lower(),
            variant_type={"del": "deletion", "dup": "duplication", "ins": "insertion",
                          "delins": "indel"}[m.group(4).lower()],
            break1_start=int(m.group(2)),
            break2_start=int(m.group(3)) if m.group(3) else None,
            alt_seq=m.group(5).upper() or None,
        )
        return out

    out["error"] = f"unparseable notation: {notation[:80]}"
    return out


@F.pandas_udf(VARIANT_SCHEMA)
def parse_variant_udf(notations: pd.Series) -> pd.DataFrame:
    rows = [parse_variant(n) for n in notations]
    return pd.DataFrame(rows, columns=[f.name for f in VARIANT_SCHEMA.fields])


def compose_genomic_hgvs(
    chrom: Column, start: Column, stop: Column, ref: Column, alt: Column
) -> Column:
    """Compose genomic HGVS from (chrom, start, stop, ref, alt) — the
    reference has 4 near-identical copies (src/moa/index.js:19-45,
    src/docm/index.js:72-89, src/cancerhotspots/index.js:81-103,
    src/cgl/index.js:102-170); one codegen'd expression here.
    """
    ref_n = F.coalesce(F.nullif(F.upper(ref), F.lit("-")), F.lit(""))
    alt_n = F.coalesce(F.nullif(F.upper(alt), F.lit("-")), F.lit(""))
    pos_range = F.when(stop > start, F.concat(start.cast("string"), F.lit("_"),
                                              stop.cast("string"))).otherwise(
        start.cast("string")
    )
    body = (
        F.when((F.length(ref_n) == 1) & (F.length(alt_n) == 1),
               F.concat(start.cast("string"), ref_n, F.lit(">"), alt_n))
        .when((F.length(ref_n) > 0) & (F.length(alt_n) > 0),
              F.concat(pos_range, F.lit("delins"), alt_n))
        .when(F.length(ref_n) > 0, F.concat(pos_range, F.lit("del")))
        .otherwise(F.concat(pos_range, F.lit("ins"), alt_n))
    )
    return F.concat(chrom.cast("string"), F.lit(":g."), body)
