"""Gopher/C4-style quality heuristics as pure column expressions.

Each heuristic is defined ONCE and rendered twice: as a PySpark Column
(Catalyst whole-stage codegen — zero Python in the hot path, per the
north star) and as the equivalent DuckDB SQL (the correctness oracle).
Keeping both renderers next to each other prevents semantic drift.

Reference lineage: the reference's only quality predicate is the
blank-after-scrub filter (/root/reference/SMParser/smparsers.py:262);
the heuristic bank generalizes that to web-scale quality filtering
(doc length, symbol ratio, stop-word fraction, repetition — the
Gopher/C4 rule families named in BASELINE.json north_star).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# English stopword slice used by the stopword-fraction heuristic.
STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be", "this",
)

# keep/drop thresholds (deterministic; calibrated on the synthetic corpus
# so both classes are populated — see tests/test_quality.py)
MIN_WORDS = 20
MAX_WORDS = 100_000
MAX_SYMBOL_RATIO = 0.10
MIN_STOPWORD_FRACTION = 0.02
MIN_DISTINCT_RATIO = 0.50
MIN_MEAN_WORD_LEN = 2.0
MAX_MEAN_WORD_LEN = 12.0


def _sql_quote_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


# ---------------------------------------------------------------------------
# word tokenization — identical split semantics in both engines
# ---------------------------------------------------------------------------

def words_expr(text: Column) -> Column:
    return F.split(F.trim(F.lower(text)), r"\s+")


def words_sql(text: str) -> str:
    return f"regexp_split_to_array(trim(lower({text})), '\\s+')"


# ---------------------------------------------------------------------------
# heuristic columns
# ---------------------------------------------------------------------------

def n_chars_expr(text: Column) -> Column:
    return F.length(text)


def n_chars_sql(text: str) -> str:
    return f"length({text})"


def n_words_expr(text: Column) -> Column:
    return F.size(words_expr(text))


def n_words_sql(text: str) -> str:
    return f"len({words_sql(text)})"


def mean_word_len_expr(text: Column) -> Column:
    """Average token length (chars/word over whitespace-tokenized text)."""
    return F.round(
        (F.length(F.regexp_replace(F.trim(text), r"\s+", ""))
         / F.nullif(n_words_expr(text), F.lit(0))).cast("double"),
        6,
    )


def mean_word_len_sql(text: str) -> str:
    return (
        f"round(length(regexp_replace(trim({text}), '\\s+', '', 'g'))"
        f" / nullif({n_words_sql(text)}, 0), 6)"
    )


def symbol_ratio_expr(text: Column) -> Column:
    """Fraction of non-[A-Za-z0-9 ] characters."""
    stripped = F.regexp_replace(text, "[A-Za-z0-9 ]", "")
    return F.round(
        F.length(stripped).cast("double") / F.nullif(F.length(text), F.lit(0)), 6
    )


def symbol_ratio_sql(text: str) -> str:
    return (
        f"round(length(regexp_replace({text}, '[A-Za-z0-9 ]', '', 'g'))"
        f" / nullif(length({text}), 0), 6)"
    )


def distinct_ratio_expr(text: Column) -> Column:
    """Distinct-token ratio — low values flag boilerplate repetition."""
    w = words_expr(text)
    return F.round(
        F.size(F.array_distinct(w)).cast("double") / F.nullif(F.size(w), F.lit(0)), 6
    )


def distinct_ratio_sql(text: str) -> str:
    w = words_sql(text)
    return f"round(len(list_distinct({w})) / nullif(len({w}), 0), 6)"


def stopword_fraction_expr(text: Column) -> Column:
    w = words_expr(text)
    hits = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS)))
    return F.round(hits.cast("double") / F.nullif(F.size(w), F.lit(0)), 6)


def stopword_fraction_sql(text: str) -> str:
    w = words_sql(text)
    inlist = _sql_quote_list(STOPWORDS)
    return (
        f"round(len(list_filter({w}, x -> x in ({inlist})))"
        f" / nullif(len({w}), 0), 6)"
    )


def keep_expr(text: Column) -> Column:
    """Composite keep/drop decision from the heuristic bank."""
    nw = n_words_expr(text)
    return (
        nw.between(MIN_WORDS, MAX_WORDS)
        & (symbol_ratio_expr(text) <= MAX_SYMBOL_RATIO)
        & (stopword_fraction_expr(text) >= MIN_STOPWORD_FRACTION)
        & (distinct_ratio_expr(text) >= MIN_DISTINCT_RATIO)
        & mean_word_len_expr(text).between(MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN)
    )


def keep_sql(text: str) -> str:
    return (
        f"({n_words_sql(text)} between {MIN_WORDS} and {MAX_WORDS}"
        f" and {symbol_ratio_sql(text)} <= {MAX_SYMBOL_RATIO}"
        f" and {stopword_fraction_sql(text)} >= {MIN_STOPWORD_FRACTION}"
        f" and {distinct_ratio_sql(text)} >= {MIN_DISTINCT_RATIO}"
        f" and {mean_word_len_sql(text)} between {MIN_MEAN_WORD_LEN} and {MAX_MEAN_WORD_LEN})"
    )
