"""Quality heuristics, langid, perplexity, timeparse: expr ↔ UDF ↔ python parity."""

import math

import pandas as pd
from pyspark.sql import functions as F

from social_media_pii_scrubber_spark.functions import quality as Q
from social_media_pii_scrubber_spark.functions.langid import (
    langid_expr, langid_pandas_udf,
)
from social_media_pii_scrubber_spark.functions.perplexity import (
    perplexity_pandas_udf, perplexity_python,
)
from social_media_pii_scrubber_spark.functions.timeparse import (
    SENTINEL_LIT, parse_when_expr, time_string_expr,
)


class TestQuality:
    def test_heuristics_hand_computed(self, spark):
        text = "the cat the cat runs"  # 5 words, 4 distinct, 2 stopwords
        df = spark.createDataFrame(pd.DataFrame({"t": [text]}))
        row = df.select(
            Q.n_words_expr(F.col("t")).alias("nw"),
            Q.distinct_ratio_expr(F.col("t")).alias("dr"),
            Q.stopword_fraction_expr(F.col("t")).alias("sw"),
            Q.mean_word_len_expr(F.col("t")).alias("mwl"),
            Q.symbol_ratio_expr(F.col("t")).alias("sr"),
        ).collect()[0]
        assert row.nw == 5
        assert row.dr == round(3 / 5, 6)  # the, cat, runs
        assert row.sw == round(2 / 5, 6)
        assert row.mwl == round(16 / 5, 6)
        assert row.sr == 0.0

    def test_keep_both_classes_on_corpus(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        counts = dict(
            docs.groupBy(Q.keep_expr(F.col("text")).alias("k")).count().collect()
        )
        keep_counts = {bool(k): v for k, v in counts.items()}
        assert keep_counts.get(True, 0) > 0 and keep_counts.get(False, 0) > 0


class TestLangid:
    def test_expr_udf_parity(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        both = docs.select(
            langid_expr(F.col("text")).alias("a"),
            langid_pandas_udf()(F.col("text")).alias("b"),
        )
        assert both.filter(F.col("a") != F.col("b")).count() == 0

    def test_obvious_languages(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"t": [
            "the cat and the dog went to the park",
            "der hund und die katze ist nicht da",
            "le chat et le chien est dans la maison",
            "el perro que corre por las calles para casa",
            "zzz qqq xxx",
        ]}))
        got = [r[0] for r in df.select(langid_expr(F.col("t"))).collect()]
        assert got == ["en", "de", "fr", "es", "und"]

    def test_margin_is_top1_minus_top2(self, spark):
        from social_media_pii_scrubber_spark.functions.langid import (
            langid_margin_expr,
        )

        df = spark.createDataFrame(pd.DataFrame({"t": [
            "the and of to is",          # en=5, others 0 → margin 5
            "the und",                   # en=1, de=1 → margin 0 (ambiguous)
            "the and der",               # en=2, de=1 → margin 1
            "zzz qqq",                   # all 0 → margin 0
        ]}))
        got = [r[0] for r in df.select(langid_margin_expr(F.col("t"))).collect()]
        assert got == [5, 0, 1, 0]


class TestPerplexity:
    def test_udf_matches_python(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
        rows = docs.select(
            "text", perplexity_pandas_udf()(F.col("text")).alias("ppl")
        ).collect()
        for r in rows:
            assert math.isclose(r.ppl, perplexity_python(r.text), rel_tol=1e-9)

    def test_english_beats_junk(self):
        eng = perplexity_python("the quick brown fox jumps over the lazy dog")
        junk = perplexity_python("@#$%^&* ~~ ||| @#$%^&* zzzz 0000")
        assert eng < junk


class TestTimeparse:
    def test_parse_chain(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"w": [
            "1600000000",                    # epoch seconds
            "2021-05-04T10:11:12+05:00",     # tz stripped, not converted
            "2021-05-04 10:11:12",
            "garbage",                       # → sentinel
            None,                            # → sentinel
        ]}))
        got = [str(r[0]) for r in df.select(parse_when_expr(F.col("w"))).collect()]
        assert got == [
            "2020-09-13 12:26:40",
            "2021-05-04 10:11:12",
            "2021-05-04 10:11:12",
            SENTINEL_LIT.replace("T", " "),
            SENTINEL_LIT.replace("T", " "),
        ]

    def test_time_string(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"ts": [pd.Timestamp("2024-01-05 19:07:00"),
                                 pd.Timestamp("2024-01-05 07:07:00")]})
        )
        got = [r[0] for r in df.select(time_string_expr(F.col("ts"))).collect()]
        assert got == ["7:07 PM", "7:07 AM"]


class TestNfcNormalize:
    def test_known_nfd_forms_compose(self, spark):
        import pandas as pd
        import unicodedata
        from social_media_pii_scrubber_spark.functions.text import (
            nfc_normalize_udf,
        )
        from pyspark.sql import functions as F

        raws = ["café", "Ångström", "plain ascii", "",
                "already éÅ"]
        df = spark.createDataFrame(pd.DataFrame({"t": raws}), "t string")
        got = [r.n for r in df.select(
            nfc_normalize_udf()(F.col("t")).alias("n")).collect()]
        want = [unicodedata.normalize("NFC", t) for t in raws]
        assert got == want
        assert got[0] == "café" and got[1] == "Ångström"
