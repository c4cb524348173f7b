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


class TestSubsetAssumptionsBreak:
    """ADVICE r04: the byte-identical guarantee is only proven against
    the repo's own synthesizer subset (escaped text, well-formed
    template). These cases feed the extractor pages that BREAK the
    subset and assert the breakage is SURFACED — the gate projection's
    byte_identical flag flips false — never silently passed as a match.
    """

    def _flag(self, spark, html_bytes: bytes, true_text: str):
        df = spark.createDataFrame(
            pd.DataFrame({"html": [html_bytes], "text": [true_text]}),
            "html binary, text string")
        ext = html_text_expr(F.col("html"))
        [r] = df.select(
            ext.alias("extracted_text"),
            (ext == F.col("text")).alias("byte_identical"),
        ).collect()
        return r

    def test_raw_gt_inside_attribute_is_flagged(self, spark):
        """An attribute containing a raw '>' truncates tag stripping
        early (documented limitation) — the leftover 'x">' residue must
        make byte_identical false, not pass."""
        h = b'<body><div title="a>b">content</div></body>'
        r = self._flag(spark, h, "content")
        assert r.byte_identical is False
        assert r.extracted_text != "content"

    def test_missing_head_close_is_flagged(self, spark):
        """A page missing </head> leaves head chrome in the extracted
        text (documented limitation) — flagged, not silently equal."""
        h = b"<html><head><title>CHROME</title><body>content</body></html>"
        r = self._flag(spark, h, "content")
        assert r.byte_identical is False
        assert "CHROME" in r.extracted_text

    def test_wellformed_page_still_passes(self, spark):
        """Control: inside the subset the flag stays true."""
        h = b"<html><head><title>t</title></head><body>content</body></html>"
        r = self._flag(spark, h, "content")
        assert r.byte_identical is True and r.extracted_text == "content"

    def test_fuzz_raw_gt_attributes_never_silently_match(self, spark):
        """Deterministic fuzz over attribute payloads with raw '>':
        whenever the scalar reference shows the extraction diverges
        from the true text, the Spark-side flag must be false — and
        Spark must agree with the scalar reference byte-for-byte (the
        subset breaking must not desynchronize the twins)."""
        cases = []
        for i, payload in enumerate(
                ["a>b", ">", "x > y", 'q">residue', "a>>b", "-->"]):
            body = f"w{i} content"
            h = f'<body><p title="{payload}">{body}</p></body>'.encode()
            cases.append((h, body))
        df = spark.createDataFrame(
            pd.DataFrame({"html": [h for h, _ in cases],
                          "text": [t for _, t in cases]}),
            "html binary, text string")
        ext = html_text_expr(F.col("html"))
        rows = df.select(
            "html", "text", ext.alias("extracted_text"),
            (ext == F.col("text")).alias("byte_identical"),
        ).collect()
        assert len(rows) == len(cases)
        for r in rows:
            want = html_text_python(bytes(r.html))
            assert r.extracted_text == want  # twins stay in lockstep
            assert r.byte_identical is (want == r.text)
            if want != r.text:
                assert r.byte_identical is False  # surfaced, not passed


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
