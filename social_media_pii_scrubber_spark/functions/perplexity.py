"""KenLM-style perplexity scoring as a vectorized pandas UDF.

A deterministic character-unigram language model stands in for a real
KenLM n-gram model (KenLM is not installed in this environment): the
log-probability table is a fixed English letter-frequency distribution
with add-one-style smoothing mass on everything else. Perplexity of a
document = exp(-mean(log p(char))). Low perplexity ≈ English-like
character statistics; high ≈ junk/symbol soup — exactly how a KenLM
quality gate is used in CCNet/Gopher-style pipelines.

Plumbing is the production shape (north star): model table built ONCE
per Python worker (lazy module cache — the reference's class-attribute
scrubber idiom, /root/reference/SMParser/smparserbase.py:72-79), scoring
fully vectorized with numpy over Arrow batches, no per-row Python loop.

``perplexity_python`` is the plain reimplementation pytest uses to lock
the UDF's numbers.
"""

from __future__ import annotations

import math
import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf

# English letter frequencies (percent, public-domain table), lowercase.
_LETTER_FREQ = {
    "a": 8.167, "b": 1.492, "c": 2.782, "d": 4.253, "e": 12.702,
    "f": 2.228, "g": 2.015, "h": 6.094, "i": 6.966, "j": 0.153,
    "k": 0.772, "l": 4.025, "m": 2.406, "n": 6.749, "o": 7.507,
    "p": 1.929, "q": 0.095, "r": 5.987, "s": 6.327, "t": 9.056,
    "u": 2.758, "v": 0.978, "w": 2.360, "x": 0.150, "y": 1.974,
    "z": 0.074,
}
_SPACE_PROB = 0.18          # spaces ≈ 18% of English text
_OOV_PROB = 0.0005          # smoothing mass for any other character

_MODEL_CACHE: dict[str, np.ndarray] = {}


def _build_logprob_table() -> np.ndarray:
    """256-entry log-prob lookup over latin-1 code units (vectorizable)."""
    table = np.full(256, math.log(_OOV_PROB), dtype=np.float64)
    letter_mass = sum(_LETTER_FREQ.values())  # ≈ 100
    scale = (1.0 - _SPACE_PROB) * 0.95 / letter_mass
    for ch, pct in _LETTER_FREQ.items():
        logp = math.log(pct * scale)
        table[ord(ch)] = logp
        table[ord(ch.upper())] = logp
    table[ord(" ")] = math.log(_SPACE_PROB)
    return table


def _get_table() -> np.ndarray:
    t = _MODEL_CACHE.get("table")
    if t is None:
        t = _build_logprob_table()
        _MODEL_CACHE["table"] = t
    return t


def perplexity_python(text: str | None) -> float | None:
    """Reference scalar implementation (pytest parity check)."""
    if text is None:
        return None
    if len(text) == 0:
        return float("inf")
    table = _get_table()
    total = 0.0
    for ch in text:
        code = ord(ch)
        total += table[code] if code < 256 else math.log(_OOV_PROB)
    return round(math.exp(-total / len(text)), 4)


def _score_series(s: pd.Series) -> pd.Series:
    """Whole-batch vectorization: concatenate every row's bytes into one
    buffer and reduce per-row with np.add.reduceat — zero per-row Python
    beyond the encode. latin-1 maps code units 0-255 1:1; chars >255
    become '?' (the OOV bucket)."""
    table = _get_table()
    notnull = s.notna()
    texts = s[notnull]
    if len(texts) == 0:
        return pd.Series([None] * len(s), index=s.index, dtype="float64")
    encoded = texts.str.encode("latin-1", errors="replace")
    lengths = encoded.str.len().to_numpy(dtype=np.int64)
    buf = np.frombuffer(b"".join(encoded.to_numpy()), dtype=np.uint8)
    logp = table[buf]
    offsets = np.zeros(len(lengths), dtype=np.int64)
    np.cumsum(lengths[:-1], out=offsets[1:])
    # reduceat needs non-empty segments; empty rows → inf afterwards
    safe_offsets = np.minimum(offsets, max(len(buf) - 1, 0))
    sums = (
        np.add.reduceat(logp, safe_offsets)
        if len(buf) else np.zeros(len(lengths))
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        ppl = np.round(np.exp(-sums / lengths), 4)
    ppl = np.where(lengths == 0, np.inf, ppl)
    out = pd.Series(np.nan, index=s.index, dtype="float64")
    out[notnull] = ppl
    # nulls must reach Arrow as None (NaN is a *value* for doubles)
    return out.astype(object).where(notnull, None)


def perplexity_pandas_udf():
    @pandas_udf("double")
    def perplexity_udf(s: pd.Series) -> pd.Series:
        return _score_series(s)

    return perplexity_udf
