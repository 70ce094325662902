"""Heuristic corpus-quality rules (Gopher / C4 style) — the filter gate a
training-data pipeline runs between ingest and dedup.

Implements the published rule families (Rae et al. 2021 "Scaling Language
Models" §A1.1 / Raffel et al. 2020 C4) as NARROW JVM expressions over the
token/line arrays: word-count bounds, mean word length, symbol-to-word
ratio, alpha-word fraction, stopword floor, duplicate-line fraction,
bullet/ellipsis line fractions, and top-n-gram character fraction.

Design for 100 TB:
- Every metric is a per-row expression — no shuffle, no Python, fused into
  the parquet scan by whole-stage codegen.  A quality gate over 100 TB is
  exactly one scan.
- ``top_ngram_char_fraction`` avoids the O(L²) distinct×occurrence count:
  it sorts the per-row gram array and folds ONE pass over it tracking the
  best run (O(L log L) per document) — the naive per-distinct count is
  quadratic in document length and dies on 100k-word documents.  The
  DuckDB oracle recomputes the same value with the quadratic formula
  (oracles only run at tiny SF), which is equivalent: max over runs of a
  sorted array == max over distinct values of their occurrence count.
- All arithmetic is engine-portable (plain double division, ``nullif``
  guards) so the oracle in plans/extensions.py reproduces values bit-wise.

Empty-document semantics: ratio metrics are NULL when the denominator is
zero (NULL-propagating division) — ``passes_quality`` treats NULL metrics
as failing, so empty documents never pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jurimetria_etl_spark.operators.dedup import ws_words
from jurimetria_etl_spark.operators.text import LANG_STOPWORDS, _stopword_count


def words(col: Column | str) -> Column:
    """Non-empty whitespace-RUN tokens (``\\s+`` split — dedup.ws_words):
    every word metric here is a semantic word count, and the structural
    single-space split would merge newline/tab-separated words
    ('cat\\nthe' as one token), systematically undercounting words and
    stopwords on multi-line prose."""
    return ws_words(col)


def lines(col: Column | str) -> Column:
    """Newline-split lines of the raw text (no trim — line identity is
    byte-level, matching the dup-line rule's intent)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, "\n")


def word_count(col: Column | str) -> Column:
    return F.size(words(col)).cast("bigint")


def mean_word_length(col: Column | str) -> Column:
    """Mean characters per word; NULL for empty documents."""
    ws = words(col)
    total = F.aggregate(
        ws, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    return total / F.nullif(F.size(ws), F.lit(0)).cast("double")


def alpha_word_fraction(col: Column | str) -> Column:
    """Fraction of words containing at least one alphabetic character
    — any Unicode letter (\\p{L}), not [A-Za-z]: an accent-only
    Portuguese word like "é" or "às" is alphabetic (r9; the ASCII class
    under-counted the reference's own language)
    (C4/Gopher: prose has ≥80%; tables of numbers do not)."""
    ws = words(col)
    n_alpha = F.size(F.filter(ws, lambda w: w.rlike(r"\p{L}")))
    return n_alpha / F.nullif(F.size(ws), F.lit(0)).cast("double")


def symbol_word_ratio(col: Column | str) -> Column:
    """(# + … + ...) occurrences per word — boilerplate/markup signal."""
    c = F.col(col) if isinstance(col, str) else col
    n_sym = (
        F.regexp_count(c, F.lit("#"))
        + F.regexp_count(c, F.lit(r"\.\.\."))
        + F.regexp_count(c, F.lit("…"))
    )
    return n_sym / F.nullif(F.size(words(col)), F.lit(0)).cast("double")


def stopword_count(col: Column | str) -> Column:
    """English-stopword hits (Gopher's ≥2-stopword floor); lowercased."""
    lc = F.lower(F.col(col) if isinstance(col, str) else col)
    return _stopword_count(words(lc), LANG_STOPWORDS["en"]).cast("bigint")


def dup_line_fraction(col: Column | str) -> Column:
    """1 − distinct/total over newline-split lines; 0.0 for single-line
    documents (split never yields an empty array)."""
    ls = lines(col)
    return F.lit(1.0) - F.size(F.array_distinct(ls)) / F.size(ls).cast(
        "double"
    )


def bullet_line_fraction(col: Column | str) -> Column:
    """Fraction of lines starting with a bullet marker (-, *, •)."""
    ls = lines(col)
    n = F.size(F.filter(ls, lambda l: F.ltrim(l).rlike("^[-*•]")))
    return n / F.size(ls).cast("double")


def ellipsis_line_fraction(col: Column | str) -> Column:
    """Fraction of lines ending in an ellipsis (truncated scrapes)."""
    ls = lines(col)
    n = F.size(F.filter(ls, lambda l: F.rtrim(l).rlike("(\\.\\.\\.|…)$")))
    return n / F.size(ls).cast("double")


def word_ngrams(col: Column | str, n: int) -> Column:
    """NON-distinct word n-grams (occurrence counts matter here, unlike
    dedup.word_shingles which deduplicates for set signatures)."""
    ws = words(col)
    count = F.size(ws) - (n - 1)
    positions = F.when(count >= 1, F.sequence(F.lit(1), count)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(positions, lambda i: F.concat_ws(" ", F.slice(ws, i, n)))


def top_ngram_char_fraction(col: Column | str, n: int = 2) -> Column:
    """Fraction of document characters covered by the most repeated word
    n-gram: max over grams of occurrences·len(gram) ÷ len(trim(text)).

    One sorted fold (see module docstring): after ``array_sort``, equal
    grams are adjacent, so a single pass tracking the current run length
    finds max(count·len) in O(L log L) — never quadratic in document
    length.  NULL for empty documents."""
    c = F.col(col) if isinstance(col, str) else col
    grams = F.array_sort(word_ngrams(col, n))
    acc0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )
    def step(acc: Column, g: Column) -> Column:
        run = F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            g.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run * F.length(g)).alias("best"),
        )
    best = F.aggregate(grams, acc0, step, lambda acc: acc["best"])
    return best / F.nullif(F.length(F.trim(c)), F.lit(0)).cast("double")


# Gopher paper defaults (Rae et al. 2021, table A1) — exposed so callers
# tune per-corpus; the synthetic test corpus uses tighter bounds.
GOPHER_DEFAULTS: dict[str, float] = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_length": 3.0,
    "max_mean_word_length": 10.0,
    "max_symbol_word_ratio": 0.1,
    "min_alpha_word_fraction": 0.8,
    "min_stopwords": 2,
    "max_dup_line_fraction": 0.3,
    "max_bullet_line_fraction": 0.9,
    "max_ellipsis_line_fraction": 0.3,
    "max_top_2gram_char_fraction": 0.2,
}


def add_quality_rules(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full rule-metric column family (rounded to 6 decimals for
    cross-engine hash stability, as operators/text.py does)."""
    r6 = lambda c: F.round(c, 6)  # noqa: E731
    return (
        df.withColumn("n_words", word_count(text_col))
        .withColumn("mean_word_len", r6(mean_word_length(text_col)))
        .withColumn("alpha_word_frac", r6(alpha_word_fraction(text_col)))
        .withColumn("symbol_word_ratio", r6(symbol_word_ratio(text_col)))
        .withColumn("n_stopwords", stopword_count(text_col))
        .withColumn("dup_line_frac", r6(dup_line_fraction(text_col)))
        .withColumn("bullet_line_frac", r6(bullet_line_fraction(text_col)))
        .withColumn(
            "ellipsis_line_frac", r6(ellipsis_line_fraction(text_col))
        )
        .withColumn(
            "top_2gram_char_frac", r6(top_ngram_char_fraction(text_col, 2))
        )
    )


def passes_quality(text_col: str = "text", **overrides: float) -> Column:
    """Boolean column: document passes every Gopher-style rule.  NULL
    metrics (empty documents) fail — the predicate coalesces to False."""
    t = {**GOPHER_DEFAULTS, **overrides}
    pred = (
        (word_count(text_col) >= t["min_words"])
        & (word_count(text_col) <= t["max_words"])
        & (mean_word_length(text_col) >= t["min_mean_word_length"])
        & (mean_word_length(text_col) <= t["max_mean_word_length"])
        & (symbol_word_ratio(text_col) <= t["max_symbol_word_ratio"])
        & (alpha_word_fraction(text_col) >= t["min_alpha_word_fraction"])
        & (stopword_count(text_col) >= t["min_stopwords"])
        & (dup_line_fraction(text_col) <= t["max_dup_line_fraction"])
        & (bullet_line_fraction(text_col) <= t["max_bullet_line_fraction"])
        & (
            ellipsis_line_fraction(text_col)
            <= t["max_ellipsis_line_fraction"]
        )
        & (
            top_ngram_char_fraction(text_col, 2)
            <= t["max_top_2gram_char_fraction"]
        )
    )
    return F.coalesce(pred, F.lit(False))


def quality_filter(
    df: DataFrame, text_col: str = "text", **overrides: float
) -> DataFrame:
    """Keep documents passing every rule — one narrow filter, one scan."""
    return df.where(passes_quality(text_col, **overrides))
