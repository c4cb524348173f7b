"""HTML → text extraction: the byte-identical front-door invariant.

The north rule requires the engine's own extraction from ``html:binary``
to be byte-identical per url to the reference-extracted ``text`` column
(BASELINE input_hint). These tests lock:

- extractor ∘ synthesizer ≡ identity on the documents-derived pages
  (every row, not a sample) — with the cross-engine form fuzzed in
  test_cross_engine_fuzz.py;
- each removal class (head chrome, body script, style, comment, tags,
  entities) does its own job;
- the from_html flagship equals the text-column flagship row-for-row
  (extraction is exact, so downstream keep/scrub must not change);
- extraction stays pure codegen: no Python barrier appears in the
  from_html plan, and the date filter still reaches the parquet scan
  below the extraction projection.
"""

import pandas as pd
from pyspark.sql import functions as F

from social_media_pii_scrubber_spark.config import ScrubConfig
from social_media_pii_scrubber_spark.functions.html import (
    html_escape_python, html_text_expr, html_text_python,
)
from social_media_pii_scrubber_spark.plans.pipeline import filter_scrub_pipeline
from social_media_pii_scrubber_spark.sources.webpages import (
    webpages_from_documents,
)

CFG = ScrubConfig()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_extraction_byte_identical_every_row(spark, sf_dir):
    pages = webpages_from_documents(spark, sf_dir)
    ext = html_text_expr(F.col("html"))
    n_bad = pages.filter(ext != F.col("text")).count()
    assert n_bad == 0


class TestRemovalClasses:
    """Each chrome class is removed independently (scalar reference —
    the Spark expr shares the pattern table, fuzz locks them equal)."""

    def test_head_dropped_whole(self):
        h = b'<html><head><title>T</title><meta x="y"></head><body>hi</body></html>'
        assert html_text_python(h) == "hi"

    def test_body_script_with_raw_angle_brackets(self):
        h = b"<body>a<script>if(1<2){x()}</script>b</body>"
        assert html_text_python(h) == "ab"

    def test_style_block(self):
        h = b"<body>a<style>p>em{color:red}</style>b</body>"
        assert html_text_python(h) == "ab"

    def test_comment(self):
        h = b"<body>a<!-- <p>not text</p> -->b</body>"
        assert html_text_python(h) == "ab"

    def test_tags_with_attributes(self):
        h = b'<div class="c" data-k="v">x</div>'
        assert html_text_python(h) == "x"

    def test_entities_unescape_order(self):
        # &amp;lt; must become &lt; (NOT <): &amp; is unescaped LAST
        assert html_text_python(b"&amp;lt;") == "&lt;"
        assert html_text_python(b"&lt;p&gt;") == "<p>"

    def test_escape_is_exact_inverse(self):
        for s in ["&lt;", "a&b<c>d", "&amp;amp;", "<script>x</script>", ""]:
            wrapped = ("<body>" + html_escape_python(s) + "</body>").encode()
            assert html_text_python(wrapped) == s

    def test_multiline_blocks(self):
        h = b"<head>\n<script>\nvar a=1;\n</script>\n</head><body>ok</body>"
        assert html_text_python(h) == "ok"


def test_from_html_flagship_equals_text_flagship(spark, sf_dir):
    pages = webpages_from_documents(spark, sf_dir)
    base = filter_scrub_pipeline(pages, CFG).df
    via_html = filter_scrub_pipeline(pages.drop("text"), CFG, from_html=True).df
    assert base.exceptAll(via_html).count() == 0
    assert via_html.exceptAll(base).count() == 0


def test_from_html_plan_is_codegen_only_with_pushdown(spark, tmp_path):
    """Extraction must not introduce a Python barrier, and the date
    filter must still reach the parquet scan below the extraction
    projection (filters never sit above UDF-free projections)."""
    pages = webpages_from_documents(spark, "/root/testdata/sf0.001")
    path = str(tmp_path / "pages.parquet")
    pages.write.mode("overwrite").parquet(path)
    stored = spark.read.parquet(path)
    df = filter_scrub_pipeline(stored.drop("text"), CFG, from_html=True).df
    p = _plan(df)
    assert "EvalPython" not in p, p[:2000]
    assert "PushedFilters" in p and "GreaterThanOrEqual(warc_ts" in p, p[:2000]
