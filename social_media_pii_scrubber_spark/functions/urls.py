"""URL canonicalization for crawl dedup (url-level, before text-level).

Crawls see the same page under fragment variants, tracking parameters,
and scheme/host case differences; canonicalizing before the url-hash
partition/dedup collapses them. Pure regexp_replace chain (whole-stage
codegen, RE2-subset, exact DuckDB twin):

1. strip the fragment (#…);
2. lowercase the scheme://host prefix (paths stay case-sensitive);
3. drop tracking params (utm_*, fbclid, gclid, ref);
4. tidy leftover separators ('?&' → '?', '&&' → '&', trailing ?/&).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The param NAME must be anchored at a '?'/'&' separator (kept via
# backreference) — unanchored, any param merely ENDING in 'ref' (pref=,
# href=) was corrupted and distinct URLs collapsed under url-dedup.
_TRACKING = r"([?&])(utm_[A-Za-z0-9_]+|fbclid|gclid|ref)=[^&#]*"


# NOTE on anchors: Java regex `$` also matches before a FINAL newline
# while RE2's matches only at absolute end — so twin-facing patterns use
# (?s) dotall + `\z` (both engines agree on those) and never bare `$`.

def url_canonicalize_expr(url: Column) -> Column:
    u = F.regexp_replace(url, r"(?s)#.*", "")                   # 1
    head = F.lower(F.regexp_extract(u, r"^([A-Za-z]+://[^/?]*)", 1))
    tail = F.regexp_extract(u, r"(?s)^[A-Za-z]+://[^/?]*(.*)", 1)
    u = F.when(head != "", F.concat(head, tail)).otherwise(u)   # 2
    u = F.regexp_replace(u, _TRACKING, "$1")                    # 3
    u = F.regexp_replace(u, r"\?&+", "?")                       # 4
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"[?&]+\z", "")
    return u


def url_canonicalize_sql(url: str) -> str:
    u = f"regexp_replace({url}, '(?s)#.*', '')"
    head = f"lower(regexp_extract({u}, '^([A-Za-z]+://[^/?]*)', 1))"
    tail = f"regexp_extract({u}, '(?s)^[A-Za-z]+://[^/?]*(.*)', 1)"
    u = f"(case when {head} != '' then {head} || {tail} else {u} end)"
    u = f"regexp_replace({u}, '{_TRACKING}', '\\1', 'g')"
    u = f"regexp_replace({u}, '\\?&+', '?', 'g')"
    u = f"regexp_replace({u}, '&&+', '&', 'g')"
    u = f"regexp_replace({u}, '[?&]+\\z', '', 'g')"
    return u


def url_canonicalize_python(url: str) -> str:
    """Scalar reference for tests (\\Z is Python's \\z)."""
    import re

    u = re.sub(r"(?s)#.*", "", url)
    m = re.match(r"(?s)^([A-Za-z]+://[^/?]*)(.*)", u)
    if m:
        u = m.group(1).lower() + m.group(2)
    u = re.sub(_TRACKING, r"\1", u)
    u = re.sub(r"\?&+", "?", u)
    u = re.sub(r"&&+", "&", u)
    u = re.sub(r"[?&]+\Z", "", u)
    return u
