"""HTML → text extraction (the crawl front door).

The engine's input table (BASELINE input_hint) carries the raw page as
``html:binary`` next to the reference-extracted ``text:string``; the
north rule requires the engine's own extraction to be **byte-identical
per url** to that reference text. This module is the extractor: a pure
``regexp_replace``/``replace`` chain (whole-stage codegen, RE2-subset,
exact DuckDB twin — no Python in the hot path):

1. decode UTF-8 bytes;
2. drop ``<head>…</head>`` whole (title/meta/head scripts are chrome,
   not content — the trafilatura/resiliparse main-content convention);
3. drop ``<script>``/``<style>`` blocks and ``<!-- comments -->``
   anywhere in the body (their character data is code, not text, and
   may contain raw ``<``/``>``);
4. strip remaining tags (attributes included);
5. unescape the HTML core entities — ``&lt; &gt;`` first, ``&amp;``
   LAST (the exact inverse of escaping ``&`` FIRST, so round-trip is
   byte-exact on any input, including text that spells "&lt;").

``html_escape_*`` is the matching escape used by the deterministic page
synthesizer (sources/webpages.py) — extractor ∘ synthesizer ≡ identity
is the tested invariant standing in for "byte-identical vs reference".

Real crawls contain tag soup this subset doesn't parse (unclosed tags,
attributes with raw '>', cdata); at that point extraction swaps to a
real parser behind the same column signature. The Spark-side contract
(binary in, string out, codegen chain, cross-engine twin) is the part
that carries to 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# removal patterns, applied in order; (?s) dotall + lazy body so one
# pattern spans newlines without eating sibling blocks. RE2-subset
# (no lookaround/backrefs) per the repo's oracle-regex invariant.
_DROP_PATTERNS = (
    r"(?s)<head[^>]*>.*?</head>",
    r"(?s)<script[^>]*>.*?</script>",
    r"(?s)<style[^>]*>.*?</style>",
    r"(?s)<!--.*?-->",
    r"<[^>]*>",
)

# (entity, char): unescape order — &amp; LAST; escape order is reversed
# (& FIRST), making the pair an exact inverse on arbitrary input.
_ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&amp;", "&"))


def html_text_expr(html: Column) -> Column:
    """binary html → extracted text (pure codegen column expression)."""
    s = F.decode(html, "UTF-8")
    for pat in _DROP_PATTERNS:
        s = F.regexp_replace(s, pat, "")
    for ent, ch in _ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return s


def html_text_sql(html: str) -> str:
    """DuckDB twin of html_text_expr (html is a BLOB expression)."""
    s = f"decode({html})"
    for pat in _DROP_PATTERNS:
        s = f"regexp_replace({s}, '{pat}', '', 'g')"
    for ent, ch in _ENTITIES:
        s = f"replace({s}, '{ent}', '{ch}')"
    return s


def html_text_python(html: bytes) -> str:
    """Scalar reference for tests."""
    import re

    s = html.decode("utf-8")
    for pat in _DROP_PATTERNS:
        s = re.sub(pat, "", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return s


def html_escape_expr(text: Column) -> Column:
    """Character-data escape the page synthesizer applies (& first)."""
    s = text
    for ent, ch in reversed(_ENTITIES):
        s = F.replace(s, F.lit(ch), F.lit(ent))
    return s


def html_escape_sql(text: str) -> str:
    s = text
    for ent, ch in reversed(_ENTITIES):
        s = f"replace({s}, '{ch}', '{ent}')"
    return s


def html_escape_python(text: str) -> str:
    for ent, ch in reversed(_ENTITIES):
        text = text.replace(ch, ent)
    return text
