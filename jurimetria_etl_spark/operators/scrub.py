"""PII redaction + text normalization — the scrub stage of a training-data
pipeline (runs before dedup so redacted forms, not raw PII, get
fingerprinted and stored).

Everything is a chain of JVM ``regexp_replace`` / ``translate`` calls — one
narrow projection, no Python, whole-stage-codegen'd, runs at scan speed at
100 TB.  Patterns avoid backreferences/lookarounds so Java regex (Spark)
and RE2 (the DuckDB oracle) agree on every match.

The category set covers the reference's domain (Brazilian court records —
``/root/reference/src/jurimetria_pipeline.py`` handles CNJ case numbers):
email, URL, CPF, CNPJ, BR phone numbers, and the CNJ numeração única.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: URL before EMAIL (emails embed in URLs), CNPJ before CPF before
# PHONE (the longer digit shapes must win before the shorter ones match
# their substrings).  (name, pattern, replacement) — patterns are
# Java-regex/RE2 common dialect.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # CNJ numeração única: NNNNNNN-DD.AAAA.J.TR.OOOO
    ("cnj", r"\b\d{7}-\d{2}\.\d{4}\.\d\.\d{2}\.\d{4}\b", "<CNJ>"),
    ("cnpj", r"\b\d{2}\.\d{3}\.\d{3}/\d{4}-\d{2}\b", "<CNPJ>"),
    ("cpf", r"\b\d{3}\.\d{3}\.\d{3}-\d{2}\b", "<CPF>"),
    # BR phone: optional (DD), 8/9-digit local with separator
    ("phone", r"\(?\b\d{2}\)?[ .-]9?\d{4}[ .-]\d{4}\b", "<PHONE>"),
)


def redact_pii(
    col: Column | str, categories: tuple[str, ...] | None = None
) -> Column:
    """Replace each PII category with its typed placeholder.  One fused
    projection — Catalyst folds the chain into a single codegen'd stage."""
    c = F.col(col) if isinstance(col, str) else col
    wanted = set(categories) if categories is not None else None
    for name, pattern, repl in PII_PATTERNS:
        if wanted is None or name in wanted:
            c = F.regexp_replace(c, pattern, repl)
    return c


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-category match counts (audit metric for a scrub run).  Counted
    on the PROGRESSIVELY-REDACTED text — each category sees the text
    after higher-priority categories were consumed, mirroring
    redact_pii exactly (an email inside a URL counts as URL, not email);
    the oracle replicates the same staged counting."""
    c = F.col(col) if isinstance(col, str) else col
    out: dict[str, Column] = {}
    # Count on the progressively-redacted text so each category sees the
    # text AFTER higher-priority categories were consumed — mirrors
    # redact_pii exactly (an email inside a URL counts as URL, not email).
    for name, pattern, repl in PII_PATTERNS:
        out[name] = F.regexp_count(c, F.lit(pattern))
        c = F.regexp_replace(c, pattern, repl)
    return out


def add_pii_counts(
    df: DataFrame, text_col: str = "text", prefix: str = "n_"
) -> DataFrame:
    cols = pii_counts(text_col)
    for name, c in cols.items():
        df = df.withColumn(f"{prefix}{name}", c.cast("bigint"))
    return df


# Latin-1/Portuguese accent fold — explicit table (not ICU) so the DuckDB
# oracle's translate() reproduces it character-for-character.
ACCENTS_FROM = "áàâãäåéèêëíìîïóòôõöúùûüýçñÁÀÂÃÄÅÉÈÊËÍÌÎÏÓÒÔÕÖÚÙÛÜÝÇÑ"
ACCENTS_TO = "aaaaaaeeeeiiiiooooouuuuycnAAAAAAEEEEIIIIOOOOOUUUUYCN"


def fold_accents(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, ACCENTS_FROM, ACCENTS_TO)


def normalize_text(
    col: Column | str,
    lowercase: bool = True,
    strip_accents: bool = True,
    collapse_whitespace: bool = True,
) -> Column:
    """Canonical text form for fingerprinting/shingling: lowercase, accent
    fold, control chars → space, runs of whitespace → single space, trim."""
    c = F.col(col) if isinstance(col, str) else col
    if lowercase:
        c = F.lower(c)
    if strip_accents:
        c = fold_accents(c)
    if collapse_whitespace:
        c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return c


def scrub_documents(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    categories: tuple[str, ...] | None = None,
) -> DataFrame:
    """Redact PII in place (or into ``out_col``) — the composable stage
    plans/curation.py slots before its dedup gate."""
    return df.withColumn(out_col or text_col, redact_pii(text_col, categories))
