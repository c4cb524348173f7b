"""Deterministic synthesis of the engine's input table.

Target shape (BASELINE.json input_hint): Iceberg table of
Common-Crawl-style web pages with columns
``url:string, warc_ts:timestamp, html:binary, text:string, lang:string``.

Two synthesizers, both fully deterministic (no Date.now, no rand()):

- ``webpages_from_documents`` — derives the table from the driver's
  ``documents`` testdata with PURE column expressions, each with a
  DuckDB SQL twin (``WEBPAGES_FROM_DOCUMENTS_SQL``), so every
  downstream pipeline query stays oracle-checkable. PII is planted on
  deterministic doc_id residues so scrub tests have known targets.
- ``generate_webpages`` — spark.range-based generator at arbitrary row
  counts for the throughput bench: Zipf-skewed hosts (exercises
  salting), hash-mixed vocab text, planted PII/junk classes. Scales to
  any size without external data; generation itself is pure Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.html import html_escape_expr, html_escape_sql
from .tables import load_table

BASE_EPOCH = 1_704_067_200  # 2024-01-01T00:00:00Z

# Realistic-enough page template for the html:binary column: head with
# title/script/style chrome, body attributes, a comment, a body-level
# script — every removal class functions/html.py handles — around the
# entity-escaped text. extractor(html(text)) == text byte-identically
# is the north-rule invariant the html_extract gate entry checks.
# Script/style payloads contain raw '<' and '&' on purpose (block-level
# removal must never depend on the tag-stripper).
_HTML_P1 = '<!DOCTYPE html><html lang="'
_HTML_P2 = (
    '"><head><meta charset="utf-8"><title>synthetic crawl page</title>'
    '<script type="text/javascript">if(1<2){track("&amp;")}</script>'
    '<style>p>em{color:#081c3a}</style></head>'
    '<body class="main"><!-- crawler boilerplate --><p id="content">'
)
_HTML_SFX = '</p><script>consent(1<2)</script></body></html>'


def _html_expr(text, lang):
    """(text, lang) columns → html:binary (pure Catalyst)."""
    return F.encode(
        F.concat(F.lit(_HTML_P1), lang, F.lit(_HTML_P2),
                 html_escape_expr(text), F.lit(_HTML_SFX)),
        "utf-8",
    )


def _html_sql(text: str, lang: str) -> str:
    """DuckDB twin of _html_expr."""
    return (
        f"encode('{_HTML_P1}' || {lang} || '{_HTML_P2}' || "
        f"{html_escape_sql(text)} || '{_HTML_SFX}')"
    )

# PII planted on deterministic residues of doc_id (oracle-reproducible)
_PII_EMAIL_MOD = 7
_PII_PHONE_MOD = 11
_PII_HANDLE_MOD = 13
_PII_URL_MOD = 17
_PII_NAME_MOD = 19
_PII_GEO_MOD = 23


def _augmented_text_expr(text, doc_id):
    pieces = [
        text,
        F.when(doc_id % _PII_EMAIL_MOD == 0,
               F.concat(F.lit(" contact user"), doc_id.cast("string"),
                        F.lit("@example.com"))).otherwise(F.lit("")),
        F.when(doc_id % _PII_PHONE_MOD == 0,
               F.concat(F.lit(" call 555-"),
                        F.lpad((doc_id % 1000).cast("string"), 3, "0"),
                        F.lit("-"),
                        F.lpad((doc_id % 10000).cast("string"), 4, "0"))).otherwise(F.lit("")),
        F.when(doc_id % _PII_HANDLE_MOD == 0,
               F.concat(F.lit(" by @user"), doc_id.cast("string"))).otherwise(F.lit("")),
        F.when(doc_id % _PII_URL_MOD == 0,
               F.concat(F.lit(" see https://ref.example/item/"),
                        doc_id.cast("string"))).otherwise(F.lit("")),
        F.when(doc_id % _PII_NAME_MOD == 0,
               F.lit(" written by Maggie Nail")).otherwise(F.lit("")),
        F.when(doc_id % _PII_GEO_MOD == 0,
               F.lit(" at 40.7128, -74.0060")).otherwise(F.lit("")),
    ]
    return F.concat(*pieces)


def _augmented_text_sql(text: str, doc_id: str) -> str:
    return (
        f"{text}"
        f" || (case when {doc_id} % {_PII_EMAIL_MOD} = 0 then ' contact user' || cast({doc_id} as varchar) || '@example.com' else '' end)"
        f" || (case when {doc_id} % {_PII_PHONE_MOD} = 0 then ' call 555-' || lpad(cast({doc_id} % 1000 as varchar), 3, '0') || '-' || lpad(cast({doc_id} % 10000 as varchar), 4, '0') else '' end)"
        f" || (case when {doc_id} % {_PII_HANDLE_MOD} = 0 then ' by @user' || cast({doc_id} as varchar) else '' end)"
        f" || (case when {doc_id} % {_PII_URL_MOD} = 0 then ' see https://ref.example/item/' || cast({doc_id} as varchar) else '' end)"
        f" || (case when {doc_id} % {_PII_NAME_MOD} = 0 then ' written by Maggie Nail' else '' end)"
        f" || (case when {doc_id} % {_PII_GEO_MOD} = 0 then ' at 40.7128, -74.0060' else '' end)"
    )


def webpages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (url, warc_ts, html, text, lang) — oracle-checkable."""
    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    text = _augmented_text_expr(F.col("text"), d)
    host = (d % 37).cast("string")
    url = F.concat(F.lit("https://host"), host, F.lit(".example/doc/"), d.cast("string"))
    ts = F.timestamp_seconds(F.lit(BASE_EPOCH) + (d % 730) * 86400 + d % 86400)
    html = _html_expr(text, F.col("lang"))
    return docs.select(
        url.alias("url"),
        ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        F.col("lang").alias("lang"),
    )


def webpages_from_documents_sql(docs_table: str = "documents") -> str:
    """DuckDB twin of ``webpages_from_documents`` (as a CTE body)."""
    text = _augmented_text_sql("text", "doc_id")
    return (
        f"select"
        f" 'https://host' || cast(doc_id % 37 as varchar) || '.example/doc/' || cast(doc_id as varchar) as url,"
        f" epoch_ms((({BASE_EPOCH} + (doc_id % 730) * 86400 + doc_id % 86400)::bigint) * 1000) as warc_ts,"
        f" {_html_sql(f'({text})', 'lang')} as html,"
        f" {text} as text,"
        f" lang"
        f" from {docs_table}"
    )


# ---------------------------------------------------------------------------
# arbitrary-scale generator (bench path — no oracle needed)
# ---------------------------------------------------------------------------

_VOCAB = (
    "the of and to in is you that it he was for on are as with his they be at "
    "one have this from or had by word but what some we can out other were all "
    "there when up use your how said an each she which do their time if will "
    "way about many then them write would like so these her long make thing see "
    "him two has look more day could go come did number sound no most people my "
    "over know water than call first who may down side been now find".split()
)


def generate_webpages(spark: SparkSession, n_rows: int,
                      partitions: int | None = None,
                      with_labels: bool = False) -> DataFrame:
    """Deterministic Common-Crawl-style corpus at any scale.

    - hosts are Zipf-ish skewed: ~30% of pages land on host0 (the
      salting test case), the rest spread over 997 hosts;
    - text is hash-mixed vocab: 20-120 words picked by xxhash64(id, k),
      with deterministic junk classes (symbol soup, short stubs,
      repeated boilerplate) and planted PII on id residues;
    - all generation is Catalyst expressions over spark.range — no
      Python, so generating 10^8 rows is shuffle-free and linear.

    ``with_labels=True`` adds ``ref_keep``: the generator's own ground
    truth (junk classes are planted, so which rows deserve dropping is
    KNOWN, independent of any filter rule). This is the reference-label
    column the north rule's F1 ≥ 0.99 criterion is scored against
    (operators/evaluation.py; tests/test_keep_f1.py).
    """
    df = spark.range(0, n_rows, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    h = F.xxhash64(i)

    host = F.when(F.pmod(h, F.lit(10)) < 3, F.lit(0)).otherwise(F.pmod(h, F.lit(997)))
    url = F.concat(F.lit("https://host"), host.cast("string"),
                   F.lit(".example/p/"), i.cast("string"))
    ts = F.timestamp_seconds(F.lit(BASE_EPOCH) + F.pmod(F.xxhash64(i, F.lit(1)), F.lit(730 * 86400)))

    n_words = (F.pmod(F.xxhash64(i, F.lit(2)), F.lit(101)) + 20).cast("int")
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda k: F.element_at(vocab, (F.pmod(F.xxhash64(i, k), F.lit(len(_VOCAB))) + 1).cast("int")),
    )
    base_text = F.array_join(words, " ")

    junk_class = F.pmod(F.xxhash64(i, F.lit(3)), F.lit(10))
    text = (
        F.when(junk_class == 0, F.concat(F.lit("$$$ ###"), F.repeat(F.lit(" @!~%^&*()#"), 40)))
        .when(junk_class == 1, F.lit("too short"))
        .when(junk_class == 2, F.repeat(F.lit("repeat me "), 30))
        .otherwise(base_text)
    )
    text = _augmented_text_expr(text, i)

    lang = F.element_at(
        F.array(F.lit("en"), F.lit("en"), F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("es")),
        (F.pmod(F.xxhash64(i, F.lit(4)), F.lit(6)) + 1).cast("int"),
    )
    html = _html_expr(text, lang)

    cols = [
        url.alias("url"), ts.alias("warc_ts"), html.alias("html"),
        text.alias("text"), lang.alias("lang"),
    ]
    if with_labels:
        cols.append((junk_class >= 3).alias("ref_keep"))
    return df.select(*cols)
