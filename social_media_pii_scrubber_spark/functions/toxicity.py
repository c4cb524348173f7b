"""Toxicity scoring + scrub (the north star's "PII/toxicity-scrub").

Deterministic severity-weighted lexicon, three renderings kept in sync:

- ``toxicity_score_expr`` — single-pass column expression: one
  ``transform`` maps each token to its lexicon weight (case-when chain,
  whole-stage codegen), one fold sums. Score = weighted hits / n_words.
- ``toxicity_scrub_expr`` — replaces lexicon terms with ``{{TOXIC}}``
  via one case-insensitive word-boundary ``regexp_replace`` (RE2-subset,
  same portability contract as the PII bank).
- ``toxicity_score_pandas_udf`` — the model-shaped path (per-worker
  lexicon cache, Arrow batches), parity-locked to the expression: swap
  the kernel for a real classifier (detoxify/perspective-style) in
  production without touching the pipeline.

The default lexicon is a deliberately mild PLACEHOLDER (insult-class
words with severity weights) — the operator contract, thresholds, and
plumbing are the deliverable; a production deployment ships its own
lexicon/model.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .quality import words_expr, words_sql

# placeholder severity lexicon (term → weight); production swaps this
TOXIC_LEXICON: dict[str, float] = {
    "hate": 1.0, "stupid": 0.6, "idiot": 0.8, "moron": 0.8, "jerk": 0.5,
    "trash": 0.4, "ugly": 0.4, "loser": 0.6, "dumb": 0.5, "kill": 1.0,
}

MAX_TOXICITY = 0.05  # keep threshold: weighted hits per word


def toxicity_score_expr(text: Column) -> Column:
    """Weighted word-boundary lexicon hits per word.

    Per-term ``regexp_count`` instead of a token-array HOF: higher-order
    functions are CodegenFallback and would drag the WHOLE flagship
    projection out of whole-stage codegen; regexp expressions stay in.
    Boundary-regex matching also aligns the score with exactly what
    ``toxicity_scrub_expr`` replaces (punctuation-adjacent hits count).
    """
    total = F.lit(0.0)
    low = F.lower(text)
    for term, wt in TOXIC_LEXICON.items():
        total = total + F.lit(wt) * F.regexp_count(low, F.lit(rf"\b{term}\b"))
    n = F.size(words_expr(text))
    return F.round(total / F.nullif(n, F.lit(0)), 6)


def toxicity_score_sql(text: str) -> str:
    terms = " + ".join(
        f"{wt} * len(regexp_extract_all(lower({text}), '\\b{t}\\b'))"
        for t, wt in TOXIC_LEXICON.items()
    )
    return f"round(({terms}) / nullif(len({words_sql(text)}), 0), 6)"


def toxicity_keep_expr(text: Column, threshold: float = MAX_TOXICITY) -> Column:
    return toxicity_score_expr(text) <= threshold


def toxicity_keep_sql(text: str, threshold: float = MAX_TOXICITY) -> str:
    return f"({toxicity_score_sql(text)} <= {threshold})"


_TOXIC_PATTERN = r"(?i)\b(" + "|".join(TOXIC_LEXICON) + r")\b"


def toxicity_scrub_expr(text: Column) -> Column:
    """Replace lexicon terms with {{TOXIC}} (case-insensitive, bounded)."""
    return F.regexp_replace(text, _TOXIC_PATTERN, "{{TOXIC}}")


def toxicity_scrub_sql(text: str) -> str:
    return f"regexp_replace({text}, '{_TOXIC_PATTERN}', '{{{{TOXIC}}}}', 'g')"


def toxicity_score_python(text: str | None) -> float | None:
    """Scalar reference (pytest parity / fixture generation)."""
    import re

    if text is None:
        return None
    low = text.lower()
    total = sum(
        wt * len(re.findall(rf"\b{t}\b", low))
        for t, wt in TOXIC_LEXICON.items()
    )
    # `or 1`: regexp-split of an all-whitespace string yields [""]
    # (size 1) in both engines — mirror that so parity holds on blanks
    n = len(text.strip().split()) or 1
    return round(total / n, 6)


def toxicity_score_pandas_udf():
    """Model-shaped scoring path: per-worker lexicon 'model', Arrow
    batches, zero per-row Python beyond the map lookup."""

    @pandas_udf("double")
    def tox_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        lex = TOXIC_LEXICON  # the per-worker 'model' (swap for a real one)
        for s in it:
            yield s.map(lambda x: toxicity_score_python(x) if x is not None else None)

    return tox_udf
