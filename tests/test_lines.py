"""Line-level cleaning semantics (operators/lines.py)."""

import duckdb
import pandas as pd

from social_media_pii_scrubber_spark.operators.lines import (
    c4_line_filter_expr, c4_line_filter_sql, line_dedup, line_dedup_sql,
)
from pyspark.sql import functions as F

DOCS = [
    (1, "the shared boilerplate footer line.\nshort\nunique alpha content line one."),
    (2, "the shared boilerplate footer line.\nunique beta content line two."),
    (3, "short\nthe shared boilerplate footer line.\nunique gamma content line three."),
    (4, ""),
]


def _df(spark):
    return spark.createDataFrame(
        pd.DataFrame(DOCS, columns=["doc_id", "text"]),
        "doc_id long, text string")


def test_line_dedup_first_occurrence_wins(spark):
    got = {r.doc_id: r.text_deduped for r in
           line_dedup(_df(spark), "text", "doc_id").collect()}
    # doc 1 (lowest id) keeps the shared line; docs 2/3 lose it
    assert got[1] == DOCS[0][1]
    assert got[2] == "unique beta content line two."
    # short lines pass through unconditionally
    assert got[3] == "short\nunique gamma content line three."
    assert got[4] == ""


def test_line_dedup_within_doc_duplicates(spark):
    df = spark.createDataFrame(
        pd.DataFrame([(7, "same content line repeated here.\nmid line stays alone ok.\nsame content line repeated here.")],
                     columns=["doc_id", "text"]),
        "doc_id long, text string")
    got = line_dedup(df, "text", "doc_id").collect()[0].text_deduped
    assert got == "same content line repeated here.\nmid line stays alone ok."


def test_line_dedup_matches_duckdb(spark):
    spark_rows = {r.doc_id: r.text_deduped for r in
                  line_dedup(_df(spark), "text", "doc_id").collect()}
    con = duckdb.connect()
    con.register("t", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    duck = {int(r.doc_id): r.text_deduped for r in
            con.sql(line_dedup_sql("t", "text", "doc_id")).df().itertuples()}
    assert spark_rows == duck


PARA_DOCS = [
    (1, "the shared boilerplate paragraph\nspans two lines here.\n\n"
        "unique alpha paragraph content."),
    (2, "unique beta paragraph content.\n\n"
        "the shared boilerplate paragraph\nspans two lines here."),
    (3, "tiny\n\nunique gamma paragraph content."),
]


def test_paragraph_dedup_first_occurrence_wins(spark):
    """sep='\\n\\n' dedups at PARAGRAPH granularity: the shared
    two-line paragraph survives only in doc 1; single lines inside a
    paragraph are not dedup units; short paragraphs pass through."""
    from social_media_pii_scrubber_spark.operators.lines import paragraph_dedup

    df = spark.createDataFrame(
        pd.DataFrame(PARA_DOCS, columns=["doc_id", "text"]),
        "doc_id long, text string")
    got = {r.doc_id: r.text_deduped for r in
           paragraph_dedup(df, "text", "doc_id").collect()}
    assert got[1] == PARA_DOCS[0][1]
    assert got[2] == "unique beta paragraph content."
    assert got[3] == PARA_DOCS[2][1]  # 'tiny' is short: exempt


def test_paragraph_dedup_matches_duckdb(spark):
    from social_media_pii_scrubber_spark.operators.lines import paragraph_dedup

    df = spark.createDataFrame(
        pd.DataFrame(PARA_DOCS, columns=["doc_id", "text"]),
        "doc_id long, text string")
    spark_rows = {r.doc_id: r.text_deduped for r in
                  paragraph_dedup(df, "text", "doc_id").collect()}
    con = duckdb.connect()
    con.register("t", pd.DataFrame(PARA_DOCS, columns=["doc_id", "text"]))
    duck = {int(r.doc_id): r.text_deduped for r in
            con.sql(line_dedup_sql("t", "text", "doc_id",
                                   sep_sql="chr(10)||chr(10)"))
            .df().itertuples()}
    assert spark_rows == duck


def test_line_dedup_randomized_cross_engine(spark):
    """Seeded random corpora with a tiny line vocabulary (to force
    heavy cross-doc and within-doc duplication, empty lines, and
    short-line exemptions) must agree across engines — this locks the
    fingerprint-keyed rewrite against the raw-line-keyed DuckDB twin
    over many more shapes than the fixed cases above."""
    import random

    rng = random.Random(11)
    lines_pool = [
        "the quick brown fox jumps over it.",
        "a second content line for the pool here.",
        "short",
        "",
        "another sufficiently long content line appears.",
        "x y",
        "the final pooled line of content text.",
    ]
    for trial in range(4):
        docs = []
        for doc_id in range(rng.randint(3, 12)):
            n = rng.randint(0, 8)
            docs.append((doc_id, "\n".join(
                rng.choice(lines_pool) for _ in range(n))))
        pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
        df = spark.createDataFrame(pdf, "doc_id long, text string")
        got = {r.doc_id: r.text_deduped for r in
               line_dedup(df, "text", "doc_id").collect()}
        con = duckdb.connect()
        con.register("t", pdf)
        want = {int(r.doc_id): r.text_deduped for r in
                con.sql(line_dedup_sql("t", "text", "doc_id"))
                .df().itertuples()}
        assert got == want, trial


def test_c4_line_filter(spark):
    text = ("good sentence with enough words.\n"
            "no terminal punctuation here at all\n"
            "short one.\n"
            "Please accept our cookie policy today.\n"
            "enable javascript to view this page.\n"
            "function() { return 1; }\n"
            "another fine long sentence stays!")
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": [text]}),
                               "doc_id long, text string")
    got = df.select(c4_line_filter_expr(F.col("text")).alias("c")).collect()[0].c
    assert got == ("good sentence with enough words.\n"
                   "another fine long sentence stays!")
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"doc_id": [1], "text": [text]}))
    duck = con.sql(f"select {c4_line_filter_sql('text')} as c from t").df().c[0]
    assert duck == got


def test_line_dedup_row_parity_edge_cases(spark):
    """r07 slim-shuffle rewrite: row-set parity with the pre-r07
    groupBy-reassembly output — null-text docs and docs whose EVERY
    line is removed produce NO output row (they never exploded a kept
    line before); untouched docs pass through byte-identical without
    being re-assembled."""
    docs = spark.createDataFrame(
        [
            (1, "first unique long content line here.\nsecond unique long content line."),
            # every line of doc 2 duplicates doc 1's (and qualifies) -> doc 2 vanishes
            (2, "first unique long content line here.\nsecond unique long content line."),
            (3, None),              # null text -> vanishes
            (4, "short"),           # non-qualifying only -> unchanged
            (5, ""),                # empty text -> one short line -> unchanged ('')
        ],
        "doc_id long, text string")
    got = {r.doc_id: r.text_deduped for r in
           line_dedup(docs, "text", "doc_id").collect()}
    assert set(got) == {1, 4, 5}
    assert got[1] == ("first unique long content line here.\n"
                      "second unique long content line.")
    assert got[4] == "short"
    assert got[5] == ""


def test_line_dedup_partial_removal_rebuild(spark):
    """A doc that loses SOME lines is rebuilt from the surviving lines
    in original order with the original separator."""
    docs = spark.createDataFrame(
        [
            (1, "the shared boilerplate footer line one.\nkeep alpha unique line here."),
            (2, "intro beta unique line first.\nthe shared boilerplate footer line one.\noutro beta unique line last."),
        ],
        "doc_id long, text string")
    got = {r.doc_id: r.text_deduped for r in
           line_dedup(docs, "text", "doc_id").collect()}
    assert got[1] == docs.collect()[0].text
    assert got[2] == "intro beta unique line first.\noutro beta unique line last."
