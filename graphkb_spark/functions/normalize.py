"""String/field normalization used by the reference before equi-joins
(reference: J8 in SURVEY §2.4).

All expressed as Column functions (JVM-side, codegen) so normalized-key
joins stay shuffle-friendly and pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def norm_case_space(col: str | Column) -> Column:
    """lowercase, trim, collapse whitespace (reference: ubiquitous
    ``toLowerCase().trim()`` e.g. src/civic/index.js:229)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def clean_disease_name(col: str | Column) -> Column:
    """British->US spellings + separator cleanup (reference:
    ``cleanDiseaseName`` src/cosmic/resistance.js:232-237)."""
    c = F.col(col) if isinstance(col, str) else col
    c = norm_case_space(F.regexp_replace(c, "_", " "))
    c = F.regexp_replace(c, "leukaemia", "leukemia")
    c = F.regexp_replace(c, "tumour", "tumor")
    return c


def norm_title(col: str | Column) -> Column:
    """Publication-title match key (reference: ``titlesMatch``
    src/civic/publication.js:17-21 — lowercase, strip trailing '.',
    strip <em> tags)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, "</?em>", "")
    c = F.lower(F.trim(c))
    return F.regexp_replace(c, r"\.$", "")


def null_like_to_null(col: str | Column, extra: tuple[str, ...] = ("None",)) -> Column:
    """''/'None' -> NULL (reference: src/moa/index.js:490-516)."""
    c = F.col(col) if isinstance(col, str) else col
    sentinel = list(extra) + [""]
    return F.when(F.trim(c).isin(sentinel), F.lit(None)).otherwise(c)


def gene_name_key(col: str | Column) -> Column:
    """Gene-symbol compare key (reference: ``compareGeneNames``
    src/civic/variant.js:49-56 — abl == abl1 style suffix-1 equivalence).
    Strips one trailing '1' from an all-letter symbol, so 'abl1' and
    'abl' share a key while 'erbb21' keeps its digits. Anchored capture
    (no lookbehind) so the same regex runs on RE2 engines too."""
    c = norm_case_space(col)
    return F.regexp_replace(c, r"^([a-z]{3,})1$", "$1")
