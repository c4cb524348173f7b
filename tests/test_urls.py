"""URL canonicalization semantics (functions/urls.py)."""

import pandas as pd
from pyspark.sql import functions as F

from social_media_pii_scrubber_spark.functions.urls import (
    url_canonicalize_expr, url_canonicalize_python,
)

CASES = [
    ("HTTPS://Example.COM/Path/X", "https://example.com/Path/X"),
    ("https://a.co/p#section-2", "https://a.co/p"),
    ("https://a.co/p?utm_source=feed&id=7", "https://a.co/p?id=7"),
    ("https://a.co/p?id=7&utm_campaign=x", "https://a.co/p?id=7"),
    ("https://a.co/p?utm_source=x&utm_medium=y", "https://a.co/p"),
    ("https://a.co/p?fbclid=abc#frag", "https://a.co/p"),
    ("https://a.co/p?gclid=1&q=2&ref=hn", "https://a.co/p?q=2"),
    ("not a url at all", "not a url at all"),
    ("https://UPPER.example/q?ID=Case", "https://upper.example/q?ID=Case"),
    # regression: params merely ENDING in 'ref' are NOT tracking params
    ("https://ex.com/page?pref=dark&x=1", "https://ex.com/page?pref=dark&x=1"),
    ("https://ex.com/page?href=abc", "https://ex.com/page?href=abc"),
    ("https://ex.com/p?pref=1&ref=hn&href=2", "https://ex.com/p?pref=1&href=2"),
    ("https://a.co/p?utm_term_x=1&id=2", "https://a.co/p?id=2"),
]


def test_distinct_pref_values_stay_distinct(spark):
    """?pref=1 vs ?pref=2 must NOT collapse (url-dedup would wrongly
    drop non-duplicate pages)."""
    df = spark.createDataFrame(
        pd.DataFrame({"u": ["https://ex.com/p?pref=1", "https://ex.com/p?pref=2"]}),
        "u string")
    n = df.select(url_canonicalize_expr(F.col("u")).alias("c")).distinct().count()
    assert n == 2


def test_canonicalize_cases(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"u": [c[0] for c in CASES]}), "u string"
    )
    got = [r.c for r in
           df.select(url_canonicalize_expr(F.col("u")).alias("c")).collect()]
    assert got == [c[1] for c in CASES]
    # scalar reference agrees
    assert [url_canonicalize_python(c[0]) for c in CASES] == [c[1] for c in CASES]


def test_canonicalize_collapses_variants_for_dedup(spark):
    variants = [
        "https://h.example/doc/1",
        "HTTPS://H.Example/doc/1",
        "https://h.example/doc/1#top",
        "https://h.example/doc/1?utm_source=a",
    ]
    df = spark.createDataFrame(pd.DataFrame({"u": variants}), "u string")
    n = df.select(url_canonicalize_expr(F.col("u")).alias("c")) \
        .distinct().count()
    assert n == 1
