"""HGVS-like variant-notation parser — the reference's one mandatory
big UDF (SURVEY §2.8 F1; reference: external package
@bcgsc-pori/graphkb-parser used from 12 loaders, e.g.
src/civic/variant.js:528, src/oncokb/index.js:279-283).

Covers the grammar the reference's loaders exercise: protein
substitutions/frameshifts (p.G12D, p.R777fs), deletions / insertions /
duplications / delins on p./c./g./e./i. coordinates incl. ranges and
cds/intronic offsets (c.123-2A>G), exon/intron-coordinate events
(e.19del, i.3mut), cytoband events (y.p26.3_p25.3del), uncertain
positions (p.?755_?759del, p.(G12_G13)mut), protein extension /
splice-site / phosphorylation events (p.*807ext*101, p.X1010spl,
p.Y1234phos), two-gene fusions ``fusion(e.13,e.3)`` and cytoband
translocations ``translocation(q34, q11)``.

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
        # non-integer position forms (cytoband p26.3, cds offset 123-2,
        # uncertain ?) keep their textual form here; ints above are null
        T.StructField("break1_repr", T.StringType()),
        T.StructField("break2_repr", T.StringType()),
        T.StructField("uncertain", T.BooleanType()),
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

_POS = r"(\?|\d+(?:[+-]\d+)?)"  # plain, cds/intronic offset, or uncertain '?'
_AA = r"([A-Z\*\?])"

_EVT_TYPE = {
    "del": "deletion",
    "dup": "duplication",
    "ins": "insertion",
    "delins": "indel",
    "mut": "mutation",
    "fs": "frameshift",
    "spl": "splice-site",
    "phos": "phosphorylation",
    "trunc": "truncating",
    "*": "truncating",
    "ext": "extension",
}

_P_SUB = re.compile(rf"^p\.{_AA}(\d+){_AA}$", re.I)
_P_FS = re.compile(r"^p\.([A-Z\*])(\d+)(?:[A-Z\*])?fs(?:\*\d+)?$", re.I)
_P_RANGE_EVT = re.compile(
    rf"^p\.{_AA}?{_POS}(?:_{_AA}?{_POS})?(delins|del|dup|ins)([A-Z\*]*)$", re.I
)
_P_UNCERTAIN_RANGE = re.compile(
    rf"^p\.\({_AA}?(\d+)_{_AA}?(\d+)\)(mut|fs|spl|phos|trunc|delins|del|dup|ins|\*)$",
    re.I,
)
_P_EVT_SINGLE = re.compile(r"^p\.([A-Z\*\?])(\d+)(mut|spl|phos|trunc)$", re.I)
_P_EXT = re.compile(r"^p\.([A-Z\*])(\d+)ext(\*?\d+)?$", re.I)
_NUC_SUB = re.compile(rf"^([cgi])\.{_POS}([ACGT])>([ACGT])$", re.I)
_NUC_EVT = re.compile(
    rf"^([cgei])\.{_POS}(?:_{_POS})?(delins|del|dup|ins|mut|fs|spl)([ACGT]*)$", re.I
)
_CYTO_EVT = re.compile(
    r"^y\.([pq]\d+(?:\.\d+)?|\?)(?:_([pq]\d+(?:\.\d+)?|\?))?(del|dup|ins|mut)$", re.I
)
_FUSION = re.compile(
    r"^(fusion|translocation)\(\s*([^,()]+?)\s*,\s*([^,()]+?)\s*\)$", re.I
)
_EXON_POS = re.compile(r"^e\.(\d+)$", re.I)
_CYTO_POS = re.compile(r"^[pq]\d+(?:\.\d+)?$", re.I)
_GENE_PREFIX = re.compile(r"^([A-Za-z0-9_.-]+):(.+)$")
_PAIR_PREFIX = re.compile(r"^\(([^,()]+),([^,()]+)\):(.+)$")


def _pos(tok: str | None) -> tuple[int | None, str | None]:
    """Position token -> (int form, textual form). Offset positions
    (123-2) keep their major coordinate as the int; uncertain '?' has
    no int form."""
    if tok is None:
        return None, None
    if tok.isdigit():
        return int(tok), tok
    m = re.match(r"^(\d+)[+-]\d+$", tok)
    return (int(m.group(1)) if m else None), tok


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
        kind = m.group(1).lower()
        sides = []
        for tok in (m.group(2), m.group(3)):
            em = _EXON_POS.match(tok)
            if em:
                sides.append(("e", int(em.group(1)), em.group(1)))
            elif _CYTO_POS.match(tok):
                sides.append(("y", None, tok.lower()))
            elif tok.isdigit():
                sides.append((None, int(tok), tok))
            elif tok == "?":
                sides.append((None, None, "?"))
            else:
                out["error"] = f"unsupported {kind} breakpoint: {tok[:40]}"
                return out
        prefix = sides[0][0] if sides[0][0] == sides[1][0] else None
        out.update(
            prefix=prefix,
            variant_type=kind,
            break1_start=sides[0][1],
            break2_start=sides[1][1],
            break1_repr=sides[0][2],
            break2_repr=sides[1][2],
            uncertain="?" in (sides[0][2], sides[1][2]) or None,
        )
        return out

    m = _P_SUB.match(s)
    if m:
        ref, pos, alt = m.group(1), int(m.group(2)), m.group(3)
        out.update(
            prefix="p",
            variant_type="missense" if alt not in ("*", "?") else "nonsense",
            break1_start=pos,
            break1_repr=m.group(2),
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
            break1_repr=m.group(2),
            ref_aa=m.group(1),
        )
        return out

    m = _P_EXT.match(s)
    if m:
        out.update(
            prefix="p",
            variant_type="extension",
            break1_start=int(m.group(2)),
            break1_repr=m.group(2),
            ref_aa=m.group(1),
            alt_seq=m.group(3) or None,
        )
        return out

    m = _P_EVT_SINGLE.match(s)
    if m:
        out.update(
            prefix="p",
            variant_type=_EVT_TYPE[m.group(3).lower()],
            break1_start=int(m.group(2)),
            break1_repr=m.group(2),
            ref_aa=m.group(1),
        )
        return out

    m = _P_UNCERTAIN_RANGE.match(s)
    if m:
        out.update(
            prefix="p",
            variant_type=_EVT_TYPE[m.group(5).lower()],
            break1_start=int(m.group(2)),
            break2_start=int(m.group(4)),
            break1_repr=m.group(2),
            break2_repr=m.group(4),
            ref_aa=m.group(1),
            alt_aa=m.group(3),
            uncertain=True,
        )
        return out

    m = _P_RANGE_EVT.match(s)
    if m:
        b1, r1 = _pos(m.group(2))
        b2, r2 = _pos(m.group(4))
        out.update(
            prefix="p",
            variant_type=_EVT_TYPE[m.group(5).lower()],
            break1_start=b1,
            break2_start=b2,
            break1_repr=r1,
            break2_repr=r2,
            ref_aa=m.group(1),
            alt_aa=m.group(3),
            alt_seq=m.group(6) or None,
            uncertain=(
                True
                if "?" in (m.group(1), m.group(3), r1, r2)
                else None
            ),
        )
        return out

    m = _NUC_SUB.match(s)
    if m:
        b1, r1 = _pos(m.group(2))
        out.update(
            prefix=m.group(1).lower(),
            variant_type="substitution",
            break1_start=b1,
            break1_repr=r1,
            ref_seq=m.group(3).upper(),
            alt_seq=m.group(4).upper(),
        )
        return out

    m = _NUC_EVT.match(s)
    if m:
        b1, r1 = _pos(m.group(2))
        b2, r2 = _pos(m.group(3))
        out.update(
            prefix=m.group(1).lower(),
            variant_type=_EVT_TYPE[m.group(4).lower()],
            break1_start=b1,
            break2_start=b2,
            break1_repr=r1,
            break2_repr=r2,
            alt_seq=m.group(5).upper() or None,
            uncertain=True if "?" in (r1, r2) else None,
        )
        return out

    m = _CYTO_EVT.match(s)
    if m:
        out.update(
            prefix="y",
            variant_type=_EVT_TYPE[m.group(3).lower()],
            break1_repr=m.group(1).lower(),
            break2_repr=m.group(2).lower() if m.group(2) else None,
            uncertain=True if "?" in (m.group(1), m.group(2) or "") else None,
        )
        return out

    out["error"] = f"unparseable notation: {notation[:80]}"
    return out


@F.pandas_udf(VARIANT_SCHEMA)
def parse_variant_udf(notations: pd.Series) -> pd.DataFrame:
    # Memoized: variant notations repeat heavily in real loads
    # (hotspot mutations recur across thousands of statements; the
    # reference's loaders re-parse the same CIViC/OncoKB names
    # constantly), so a bounded per-worker dict turns the grammar
    # walk into a hash hit for all but the first occurrence of each
    # notation. The cached dict is shared READ-ONLY into the Arrow
    # batch; parse_variant itself stays uncached for callers that
    # might mutate its result. A plain size-capped dict (not
    # lru_cache — cloudpickle can't ship the C wrapper) lives in the
    # unpickled function's module globals, so it persists across
    # batches within one Python worker process.
    cache: dict = globals().setdefault("_PARSE_VARIANT_CACHE", {})
    cols = [f.name for f in VARIANT_SCHEMA.fields]
    rows = []
    for n in notations:
        r = cache.get(n)
        if r is None:
            r = parse_variant(n)
            if len(cache) < 65536:
                cache[n] = r
        rows.append(r)
    return pd.DataFrame(rows, columns=cols)


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
