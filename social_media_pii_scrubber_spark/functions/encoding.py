"""Mojibake (encoding-damage) repair as a pure column-expression chain.

Web crawls carry a steady fraction of UTF-8 text that was decoded as
cp1252/latin-1 somewhere upstream ("Ã©" where "é" was meant, "â€™"
for a right single quote). Production corpus pipelines (CCNet, C4,
FineWeb) run ftfy or an equivalent repair pass before any quality
scoring, because the damage corrupts every downstream signal (langid
stopword hits, symbol ratios, dedup fingerprints). ftfy itself is a
per-row Python loop and is environment-blocked here anyway (COVERAGE
"Environment-blocked seams"); this module derives the repair table
from first principles instead — for every target character, the
mojibake form IS ``utf8(target)`` decoded as sloppy-cp1252 (cp1252
with the five undefined bytes falling back to latin-1, exactly the
confusion that produced the damage) — and compiles the table into an
ordered literal-replace chain that stays in whole-stage codegen. The
DuckDB twin renders the same table in the same order, so both engines
agree byte-for-byte with no fixture.

Scale notes: the chain is guarded by a 6-character marker test
(every mojibake form starts with one of ``Â Ã Å Æ Ë â`` — the
cp1252 renderings of the UTF-8 lead bytes C2/C3/C5/C6/CB/E2), so
clean rows pay six ``contains`` scans, not ~120 replaces. No shuffle,
no UDF, no state. One pass repairs one layer of damage; doubly-
encoded text (damage applied twice) needs two applications, which is
the documented ftfy behavior too.

Known tradeoff (shared with ftfy's default mode): text that
LEGITIMATELY contains a mojibake byte sequence (e.g. the literal
string "Ã©" in a page ABOUT encoding bugs) is rewritten. These
sequences are vanishingly rare in clean text precisely because they
are the damage signature.

Reference scope: the reference desktop tool never repairs encodings
(smparserbase.py reads platform exports as clean UTF-8); this is one
of the web-scale text-cleaning additions (north-star quality-filter
family).
"""

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Repair-table derivation (import-time, pure)
# ---------------------------------------------------------------------------

# Targets: the Latin-1 Supplement printables (U+00A1-U+00FF — accented
# letters, ° « » ç ñ ...) plus U+00A0 (nbsp: "Â " damage is extremely
# common), plus the cp1252 0x80-0x9F window characters (curly quotes,
# dashes, ellipsis, €, ™, ...) whose UTF-8 forms are the classic
# three-byte "â€œ"-style damage.
_CP1252_WINDOW = (
    "€‚ƒ„…†‡ˆ‰Š"
    "‹ŒŽ‘’“”•–—"
    "˜™š›œžŸ"
)
TARGETS = "".join(chr(c) for c in range(0xA0, 0x100)) + _CP1252_WINDOW


def _sloppy_cp1252(bs: bytes) -> str:
    """Decode bytes as cp1252, falling back to latin-1 for the five
    bytes cp1252 leaves undefined (81 8D 8F 90 9D) — the "sloppy"
    decoder real mojibake was produced by (ftfy's sloppy-windows-1252)."""
    out = []
    for b in bs:
        try:
            out.append(bytes([b]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append(chr(b))
    return "".join(out)


def damage(s: str) -> str:
    """utf8-encode then sloppy-cp1252-decode: produce the mojibake form
    of ``s`` (test/plant helper — the inverse of the repair chain for
    strings over TARGETS + ASCII)."""
    return _sloppy_cp1252(s.encode("utf-8"))


# Longer damage first (the three-byte punctuation forms), then
# lexicographic — deterministic, and a prefix of a longer form can
# never be consumed by a shorter rule before the longer one runs.
MOJIBAKE_PAIRS: list[tuple[str, str]] = sorted(
    ((damage(t), t) for t in TARGETS),
    key=lambda p: (-len(p[0]), p[0]),
)

# Every mojibake form starts with the cp1252 rendering of its UTF-8
# lead byte; continuation bytes (80-BF) can never render as one of
# these, so a damaged sequence always exposes a marker and the guard
# below can never skip a repairable row.
MARKERS = "ÂÃÅÆËâ"  # Â Ã Å Æ Ë â
assert all(m[0] in MARKERS for m, _ in MOJIBAKE_PAIRS)
assert len({m for m, _ in MOJIBAKE_PAIRS}) == len(MOJIBAKE_PAIRS)
# chr(31) is the pair separator inside the DuckDB twin's fold list
assert not any("\x1f" in m or "\x1f" in t for m, t in MOJIBAKE_PAIRS)


def fix_mojibake_py(s):
    """Scalar reference implementation — the spec both engines must
    match (same guard, same ordered literal replaces)."""
    if s is None:
        return None
    if not any(m in s for m in MARKERS):
        return s
    for moji, target in MOJIBAKE_PAIRS:
        s = s.replace(moji, target)
    return s


# ---------------------------------------------------------------------------
# Spark expression + DuckDB twin
# ---------------------------------------------------------------------------

def fix_mojibake_expr(col: Column) -> Column:
    """Repair chain as a guarded codegen expression. Clean rows (no
    marker character) short-circuit after at most six contains scans;
    damaged rows run the full ordered replace chain."""
    fixed = col
    for moji, target in MOJIBAKE_PAIRS:
        fixed = F.replace(fixed, F.lit(moji), F.lit(target))
    guard = None
    for m in MARKERS:
        c = col.contains(m)
        guard = c if guard is None else (guard | c)
    return F.when(guard, fixed).otherwise(col)


def _sql_lit(s: str) -> str:
    """Render a string as a DuckDB literal, splicing control characters
    (the sloppy-decoded 81/8D/8F/90/9D bytes land in C1) via chr() so
    the generated SQL stays printable."""
    parts, buf = [], []
    for ch in s:
        o = ord(ch)
        if o < 0x20 or 0x7F <= o <= 0x9F:
            if buf:
                parts.append("'" + "".join(buf).replace("'", "''") + "'")
                buf = []
            parts.append(f"chr({o})")
        else:
            buf.append(ch)
    if buf:
        parts.append("'" + "".join(buf).replace("'", "''") + "'")
    return " || ".join(parts) if parts else "''"


def fix_mojibake_sql(text: str) -> str:
    """DuckDB twin: the same table, the same order, the same guard.

    Shape differs from the Spark side on purpose: 123 nested
    ``replace()`` calls exceed DuckDB's binder recursion limit (128),
    so the twin folds the pair table with ``list_reduce`` instead —
    a WIDE constant list, not a deep tree. ``list_reduce`` applies
    pairs left-to-right, which is exactly the nesting order of the
    Spark chain, so the semantics are identical. Pairs travel as
    single strings joined by chr(31) (US separator — provably absent
    from the table: mojibake chars are >= 0x80-window renderings,
    targets >= U+00A0)."""
    items = ", ".join(
        _sql_lit(m + "\x1f" + t) for m, t in MOJIBAKE_PAIRS)
    fold = (
        f"list_reduce(list_prepend({text}, [{items}]), (acc, p) -> "
        f"replace(acc, split_part(p, chr(31), 1), "
        f"split_part(p, chr(31), 2)))")
    guard = " or ".join(
        f"contains({text}, {_sql_lit(m)})" for m in MARKERS)
    return f"(case when {guard} then {fold} else {text} end)"
