"""PII scrub: regex bank + reference-fidelity clean_text.

Two layers, by design:

1. ``scrub_bank_expr`` — the production scrub bank (emails, phones,
   handles, urls, timestamps, geo, ip, ssn) as a chain of native
   ``regexp_replace`` column expressions. Pure Catalyst / whole-stage
   codegen, zero Python in the hot path. Patterns are written in the
   RE2-compatible subset (no lookaround, no backreferences) so the exact
   same bank runs in Spark (Java regex), DuckDB (RE2, the correctness
   oracle), and Python ``re`` (pytest goldens).

2. ``clean_text_pandas_udf`` — byte-faithful reproduction of the
   reference's ``clean_text`` (/root/reference/SMParser/smparserbase.py:85-96):
   first_name -> {{FIRSTNAME}} (case-insensitive), last_name ->
   {{LASTNAME}} (ci), username -> {{USERNAME}} (ci), each comma-split
   alias -> {{ALIAS}}, then ``@\\S*`` -> {{HANDLE}}, then an NER pass.
   Substitution ORDER is semantics. The reference passes ``re.I`` as the
   *count* positional for aliases (smparserbase.py:94) — a bug making
   alias substitution case-SENSITIVE and limited to 2 replacements; we
   reproduce it bug-for-bug when ``cfg.reproduce_alias_bug`` (default)
   and document the fixed mode.

   The regex bank is compiled ONCE per Python worker (module-level
   cache — the Spark analogue of the reference's class-attribute
   scrubber singleton, smparserbase.py:72-79) and applied batch-wise
   over Arrow record batches.

NER: the reference uses scrubadub + TextBlobNameDetector
(smparserbase.py:74-75). Neither ships in this environment, so
``ner_scrub_text`` is a DETERMINISTIC STAND-IN: a capitalized-bigram
detector against a fixed first-name lexicon, replacing matches with
``{{NAME}}`` — same interface, same "model loaded lazily per worker"
pattern, clearly marked. Production swap seam: pass ``ner_impl=`` (any
picklable ``str -> str``, e.g. a scrubadub pipeline wrapper) to
``clean_text_pandas_udf`` — the callable ships inside the UDF closure
(so it reaches every Python worker, unlike driver-side module state)
and keys the same per-worker compiled-bank cache
(tests/test_scrub.py::TestNerSwapSeam).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..config import ScrubConfig

# ---------------------------------------------------------------------------
# 1. Production scrub bank (ordered!). RE2-compatible subset only.
# ---------------------------------------------------------------------------
# Order is semantics (north star: "names, phones, emails, handles,
# timestamps, geo ... applied batch-wise"): timestamps before phones so
# `2024-01-02 10:11:12` is not half-eaten by the phone pattern; emails
# before handles so `user@host.com` does not decay to `user{{HANDLE}}`.
SCRUB_BANK: list[tuple[str, str, str]] = [
    ("timestamp", r"\b\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}(:\d{2})?)?\b", "{{TIMESTAMP}}"),
    ("url", r"https?://[^\s]+", "{{URL}}"),
    ("email", r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b", "{{EMAIL}}"),
    ("handle", r"@\w+", "{{HANDLE}}"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "{{SSN}}"),
    # creditcard before phone: 4x4 digit groups are more specific than
    # the phone shapes and must not be half-eaten
    ("creditcard", r"\b\d{4}[- ]?\d{4}[- ]?\d{4}[- ]?\d{4}\b", "{{CREDITCARD}}"),
    # \b sits inside the alternatives: a leading "(" has no word boundary
    ("phone", r"(\b\+?1[-. ]?)?(\(\d{3}\) ?|\b\d{3}[-. ])\d{3}[-. ]\d{4}\b", "{{PHONE}}"),
    ("ip", r"\b\d{1,3}(\.\d{1,3}){3}\b", "{{IP}}"),
    ("mac", r"\b[0-9A-Fa-f]{2}(:[0-9A-Fa-f]{2}){5}\b", "{{MAC}}"),
    ("geo", r"-?\d{1,3}\.\d{3,}, ?-?\d{1,3}\.\d{3,}", "{{GEO}}"),
    ("iban", r"\b[A-Z]{2}\d{2}[A-Z0-9]{11,30}\b", "{{IBAN}}"),
]


def scrub_bank_expr(col: Column) -> Column:
    """Apply the full scrub bank as a native regexp_replace chain.

    Catalyst folds this into one whole-stage-codegen projection; at 100 TB
    this is the entire scrub cost for the non-NER path — no Python.
    """
    out = col
    for _name, pattern, token in SCRUB_BANK:
        out = F.regexp_replace(out, pattern, token)
    return out


def scrub_bank_sql(col_sql: str) -> str:
    """The identical bank as a DuckDB SQL expression (oracle parity).

    DuckDB's regexp_replace needs the explicit 'g' flag to match
    Spark/Python replace-all semantics.
    """
    out = col_sql
    for _name, pattern, token in SCRUB_BANK:
        pat = pattern.replace("'", "''")
        out = f"regexp_replace({out}, '{pat}', '{token}', 'g')"
    return out


def scrub_bank_python(text: str) -> str:
    """Same bank in plain Python (pytest goldens / oracle cross-check)."""
    for _name, pattern, token in SCRUB_BANK:
        text = re.sub(pattern, token, text)
    return text


# Matches any token the bank can insert — derived from SCRUB_BANK so a
# bank edit cannot drift the counter. RE2-safe (literal braces escaped,
# plain alternation).
PII_TOKEN_RE = (
    r"\{\{(" + "|".join(tok[2:-2] for _n, _p, tok in SCRUB_BANK) + r")\}\}"
)


def pii_token_count_expr(scrubbed: Column) -> Column:
    """PII hits per document, counted AFTER the scrub as inserted
    ``{{CLASS}}`` tokens — counting on the scrubbed text (which the
    pipeline computes anyway) inherits the bank's sequential-order
    semantics for free: an email's inner ``@host`` is never
    double-counted as a handle, because the email pattern consumed it
    first. One ``regexp_count``, stays in codegen.

    Known tradeoff (same class as encoding.py's mojibake-lookalike
    note): a LITERAL pre-existing ``{{EMAIL}}``-style token in the raw
    page (pages documenting this scrub format, or adversarial text)
    counts toward the density and can push a legitimate page over
    ``pii_max_bp``. Accepted: such pages are vanishingly rare, the
    failure mode is a conservative DROP (never an under-scrub), and
    subtracting a pre-scrub count would add a second corpus-wide
    regexp pass to every caller."""
    return F.regexp_count(scrubbed, F.lit(PII_TOKEN_RE)).cast("bigint")


def pii_token_count_sql(scrubbed_sql: str) -> str:
    return (f"cast(len(regexp_extract_all({scrubbed_sql}, "
            f"'{PII_TOKEN_RE}')) as bigint)")


def pii_density_keep_expr(hits: Column, n_words: Column,
                          max_hits_bp: int = 300) -> Column:
    """FineWeb-style document DROP policy: a page whose PII density
    exceeds the threshold is dropped outright instead of scrubbed —
    past a point the page IS contact data (directories, people-search
    dumps, leaked lists) and no redaction makes it trainable.
    ``max_hits_bp`` is in basis points of the word count (300 = 3 PII
    hits per 100 words); the comparison is pure integer math, so both
    engines agree bit-for-bit with no float boundary."""
    return hits * F.lit(10000) <= F.lit(max_hits_bp) * F.greatest(
        n_words.cast("bigint"), F.lit(1))


def pii_density_keep_sql(hits_sql: str, n_words_sql: str,
                         max_hits_bp: int = 300) -> str:
    return (f"({hits_sql} * 10000 <= {max_hits_bp} * "
            f"greatest(cast({n_words_sql} as bigint), 1))")


# ---------------------------------------------------------------------------
# 2. Reference-fidelity clean_text (smparserbase.py:85-96)
# ---------------------------------------------------------------------------

_COMPILED_BANKS: dict[tuple, "_CompiledCleanText"] = {}  # per-worker cache


class _CompiledCleanText:
    """Regex bank for one ScrubConfig, compiled once per Python worker.

    The reference recompiles its patterns on every record
    (smparserbase.py:88-95); we deliberately do not copy that
    inefficiency — this is the compile-once-per-executor idiom the
    north star requires.
    """

    def __init__(self, cfg: ScrubConfig, ner: bool = True, ner_impl=None):
        self.cfg = cfg
        self.ner = ner
        self.ner_impl = ner_impl  # None → built-in lexicon stand-in
        # Reference treats names as raw regex patterns (not escaped) —
        # reproduced as-is; clean_text order is load-bearing.
        self.first = re.compile(cfg.first_name, re.I)
        self.last = re.compile(cfg.last_name, re.I)
        self.user = re.compile(cfg.username, re.I)
        if cfg.reproduce_alias_bug:
            # re.I passed as count → case-sensitive, count=re.I (== 2)
            self.aliases = [(re.compile(a), int(re.I)) for a in cfg.aliases]
        else:
            self.aliases = [(re.compile(a, re.I), 0) for a in cfg.aliases]
        self.handle = re.compile(r"@\S*")

    def clean(self, text: str) -> str:
        t = self.first.sub("{{FIRSTNAME}}", text)
        t = self.last.sub("{{LASTNAME}}", t)
        t = self.user.sub("{{USERNAME}}", t)
        for pat, count in self.aliases:
            t = pat.sub("{{ALIAS}}", t, count=count)
        t = self.handle.sub("{{HANDLE}}", t)
        if self.ner:
            t = (self.ner_impl or ner_scrub_text)(t)
        return t


def _impl_key(ner_impl) -> tuple:
    """Stable identity for a swapped NER impl (module+qualname survive
    pickling into workers; object ids don't)."""
    if ner_impl is None:
        return ("builtin",)
    return (getattr(ner_impl, "__module__", "?"),
            getattr(ner_impl, "__qualname__", repr(ner_impl)))


def _get_compiled(cfg: ScrubConfig, ner: bool,
                  ner_impl=None) -> _CompiledCleanText:
    key = (
        cfg.first_name,
        cfg.last_name,
        cfg.username,
        cfg.person_alias,
        cfg.reproduce_alias_bug,
        ner,
        _impl_key(ner_impl),
    )
    bank = _COMPILED_BANKS.get(key)
    if bank is None:
        bank = _CompiledCleanText(cfg, ner=ner, ner_impl=ner_impl)
        _COMPILED_BANKS[key] = bank
    return bank


def clean_text_python(text: str, cfg: ScrubConfig, ner: bool = True,
                      ner_impl=None) -> str:
    """Driver-side single-string clean_text (tests / goldens)."""
    return _get_compiled(cfg, ner, ner_impl).clean(text)


def clean_text_pandas_udf(cfg: ScrubConfig, ner: bool = True, ner_impl=None):
    """Vectorized clean_text: Series→Series over Arrow batches.

    Returns a pandas UDF capturing the (small, picklable) config; the
    compiled bank + NER lexicon materialize lazily inside each Python
    worker, once, exactly like the reference's class-level scrubber.

    ``ner_impl``: production NER swap seam — a picklable ``str -> str``
    (e.g. wrapping scrubadub + TextBlobNameDetector, the reference's
    pipeline at smparserbase.py:72-79). It is captured in the UDF
    closure, so it reaches every Python worker and inherits the same
    compile-once-per-worker caching as the built-in stand-in.
    """

    @pandas_udf("string")
    def clean_text_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        bank = _get_compiled(cfg, ner, ner_impl)
        for s in it:
            yield s.map(lambda x: bank.clean(x) if x is not None else None)

    return clean_text_udf


# ---------------------------------------------------------------------------
# 3. NER stand-in (deterministic; scrubadub/TextBlob not in container)
# ---------------------------------------------------------------------------

# Lexicon: ~600 common US given names (functions/names.py — SSA-style
# public lists), loaded once per worker. A real deployment replaces
# _ner_scrub with scrubadub's TextBlobNameDetector pipeline (reference
# smparserbase.py:74-75); the lexicon path stays as a cheap pre-filter.
from .names import HONORIFICS, name_lexicon  # noqa: E402

_NAME_LEXICON = name_lexicon()

_CAP_RUN = re.compile(r"\b[A-Z][a-z]+(?: [A-Z][a-z]+)*\b")

# Honorific-anchored: 'Dr. Quill' / 'Mrs Featherstone' are names by
# construction, even when the surname is outside any frequency lexicon.
_HONORIFIC = re.compile(
    r"\b(" + "|".join(HONORIFICS) + r")\.? ([A-Z][a-z]+)(?: ([A-Z][a-z]+))?"
)


def ner_scrub_text(text: str) -> str:
    """Deterministic NER stand-in: honorific-anchored + lexicon-gated
    capitalized-name scrub.

    Pass 1 replaces '<Honorific> <Cap> [<Cap>]' spans with
    '<Honorific> {{NAME}}' (titles are not PII; the name is). Pass 2:
    within each run of capitalized words, a word whose lowercase form is
    in the name lexicon is replaced with {{NAME}} and the immediately
    following capitalized word (surname position) is folded into the
    same token, mirroring scrubadub's span-level replacement.
    """
    text = _HONORIFIC.sub(lambda m: f"{m.group(1)} {{{{NAME}}}}", text)

    def _sub(m: re.Match) -> str:
        words = m.group(0).split(" ")
        out: list[str] = []
        i = 0
        while i < len(words):
            if words[i].lower() in _NAME_LEXICON:
                out.append("{{NAME}}")
                i += 2  # fold the surname-position word into the span
            else:
                out.append(words[i])
                i += 1
        return " ".join(out)

    return _CAP_RUN.sub(_sub, text)


def ner_scrub_pandas_udf():
    """NER stand-in as a vectorized pandas UDF (model-per-worker idiom)."""

    @pandas_udf("string")
    def ner_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            yield s.map(lambda x: ner_scrub_text(x) if x is not None else None)

    return ner_udf
