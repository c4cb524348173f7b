"""Mojibake repair: derived-table sanity, scalar-reference round trip,
and both engine renderings against the scalar reference.

The repair table is GENERATED (utf8(target) decoded as sloppy-cp1252),
so the tests validate the generator's properties rather than hand-kept
fixtures: every damage form must expose a marker character, damage()
must round-trip through the repair chain for any string over
TARGETS + ASCII that the repairer considers clean (the documented
mojibake-lookalike tradeoff is pinned separately), and both engines
must match fix_mojibake_py exactly
(including the control-character forms like the right double quote,
whose damage ends in the cp1252-undefined byte 0x9D)."""

import random

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from social_media_pii_scrubber_spark.functions import encoding as ENC


def _sample_strings(n=200, seed=11):
    rng = random.Random(seed)
    ascii_part = (
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
        "0123456789 .,;:!?()-'\"\n\t")
    alphabet = ENC.TARGETS + ascii_part
    return [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
        for _ in range(n)
    ]


class TestTable:
    def test_shape(self):
        assert len(ENC.MOJIBAKE_PAIRS) == len(ENC.TARGETS)
        for moji, target in ENC.MOJIBAKE_PAIRS:
            assert len(target) == 1
            assert 2 <= len(moji) <= 3  # 2- and 3-byte UTF-8 forms only
            assert moji[0] in ENC.MARKERS
            assert moji != target

    def test_longer_forms_sort_first(self):
        lens = [len(m) for m, _ in ENC.MOJIBAKE_PAIRS]
        assert lens == sorted(lens, reverse=True)

    def test_known_classics(self):
        table = dict(ENC.MOJIBAKE_PAIRS)
        assert table["Ã©"] == "é"          # Ã© -> é
        assert table["â€™"] == "’"  # â€™ -> ’
        # the control-char classic: ” damages to â€ + undecodable 0x9D
        assert table["â€\x9d"] == "”"

    def test_damage_roundtrip_property(self):
        # the chain inverts damage() for every string the repairer
        # considers CLEAN (fix(s) == s — ~95% of random samples over
        # TARGETS + ASCII). Strings that already contain a mojibake-
        # looking sequence (literal marker + continuation rendering,
        # e.g. "Ã" + "—") are the module's documented ftfy-parity
        # tradeoff: the repairer rewrites them in the original too, so
        # no single-pass repair can round-trip them.
        samples = _sample_strings()
        clean = [s for s in samples if ENC.fix_mojibake_py(s) == s]
        assert len(clean) >= len(samples) * 4 // 5  # property has teeth
        for s in clean:
            assert ENC.fix_mojibake_py(ENC.damage(s)) == s, repr(s)

    def test_mojibake_lookalike_converges_to_repaired_form(self):
        # the documented tradeoff, pinned: clean text containing the
        # literal pair "Ã" + "—" (which IS the damage form of "×") is
        # repaired to "×" — and damaging such a string then repairing
        # lands on that same repaired interpretation, not the original.
        s = "price Ã— quantity"           # literal Ã + em-dash
        assert ENC.fix_mojibake_py(s) == "price × quantity"
        assert (ENC.fix_mojibake_py(ENC.damage(s))
                == "price × quantity")

    def test_clean_and_marker_only_text_untouched(self):
        for s in ["plain ascii", "", "loose Ã marker only", None]:
            assert ENC.fix_mojibake_py(s) == s

    def test_double_damage_needs_two_passes(self):
        # documented ftfy-parity behavior: one pass peels one layer
        double = ENC.damage(ENC.damage("é"))
        once = ENC.fix_mojibake_py(double)
        assert once == ENC.damage("é")
        assert ENC.fix_mojibake_py(once) == "é"


class TestEngineTwins:
    def _corpus(self):
        raw = _sample_strings(60, seed=23)
        return (
            [ENC.damage(s) for s in raw]
            + raw
            + ["", " ", "plain", "loose Ã only",
               ENC.damage(ENC.damage("café — “x”"))]
        )

    def test_spark_expr_matches_reference(self, spark):
        corpus = self._corpus()
        df = spark.createDataFrame(pd.DataFrame({"t": corpus}))
        got = [
            r.f for r in
            df.select(ENC.fix_mojibake_expr(F.col("t")).alias("f"))
            .collect()
        ]
        assert got == [ENC.fix_mojibake_py(s) for s in corpus]

    def test_duckdb_twin_matches_reference(self):
        corpus = self._corpus()
        con = duckdb.connect()
        con.register("tt", pd.DataFrame({"t": corpus}))
        got = con.sql(
            f"select {ENC.fix_mojibake_sql('t')} as f from tt"
        ).df()["f"].tolist()
        assert got == [ENC.fix_mojibake_py(s) for s in corpus]
