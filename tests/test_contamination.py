"""Benchmark-contamination detection semantics (operators/contamination.py)."""

import pandas as pd
from pyspark.sql import functions as F

from social_media_pii_scrubber_spark.operators.contamination import (
    contaminated_docs, decontaminate,
)


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]), "doc_id long, text string"
    )


EVAL_TEXT = "the quick brown fox jumps over the lazy dog tonight"


def test_copy_and_partial_overlap_flagged(spark):
    train = _df(spark, [
        (1, EVAL_TEXT),                                      # verbatim copy
        (2, "intro words then " + EVAL_TEXT + " and more"),  # embedded copy
        (3, "the quick brown cat sits still"),               # 1 shared shingle
        (4, "completely unrelated training content here"),   # none
    ])
    ev = _df(spark, [(100, EVAL_TEXT)])
    got = {r.id: r.n_shared
           for r in contaminated_docs(train, ev, "text", "doc_id",
                                      min_shared=2).collect()}
    assert 1 in got and 2 in got
    assert 3 not in got          # below min_shared
    assert 4 not in got
    assert got[1] >= got[3] if 3 in got else True


def test_repeated_single_shingle_not_flagged(spark):
    """One bank shingle repeated >= min_shared times inside a single
    train doc must NOT flag it: the contract counts DISTINCT shared
    shingles (GPT-3 appendix-C style)."""
    # 'the quick brown' is the ONLY 3-shingle shared with the eval bank;
    # it occurs 3 times in doc 1 (boundary shingles 'aaa the quick' etc.
    # are not in the bank).
    train = _df(spark, [
        (1, "aaa the quick brown bbb the quick brown ccc the quick brown ddd"),
        (2, EVAL_TEXT),                                   # genuinely shared
    ])
    ev = _df(spark, [(100, EVAL_TEXT)])
    got = {r.id: r.n_shared
           for r in contaminated_docs(train, ev, "text", "doc_id",
                                      min_shared=2).collect()}
    assert 1 not in got
    assert 2 in got


def test_decontaminate_flags(spark):
    train = _df(spark, [
        (1, EVAL_TEXT),
        (2, "completely unrelated training content here"),
    ])
    ev = _df(spark, [(100, EVAL_TEXT)])
    got = {r.doc_id: r.keep_decontam
           for r in decontaminate(train, ev, "text", "doc_id").collect()}
    assert got == {1: False, 2: True}
