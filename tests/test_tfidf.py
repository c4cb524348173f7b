"""TF-IDF vectors + sparse cosine pairs (operators/tfidf.py)."""

import pandas as pd
from pyspark.sql import functions as F

from social_media_pii_scrubber_spark.operators.tfidf import (
    tf_idf, tfidf_similar_pairs,
)


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]), "doc_id long, text string"
    )


def test_identical_docs_cosine_one(spark):
    df = _df(spark, [
        (1, "spark shuffles the partitions"),
        (2, "spark shuffles the partitions"),
        (3, "completely different words entirely"),
    ])
    pairs = {(r.id_a, r.id_b): r.cosine
             for r in tfidf_similar_pairs(df, "text", "doc_id",
                                          threshold=0.5,
                                          max_df_fraction=1.0).collect()}
    assert pairs.get((1, 2)) == 1.0
    assert all(k == (1, 2) for k in pairs)


def test_max_df_pruning_drops_common_terms(spark):
    df = _df(spark, [
        (1, "common alpha"), (2, "common beta"),
        (3, "common gamma"), (4, "common delta"),
    ])
    v = tf_idf(df, "text", "doc_id", max_df_fraction=0.5)
    terms = {r.term for r in v.collect()}
    assert "common" not in terms         # in 4/4 docs → pruned
    assert {"alpha", "beta", "gamma", "delta"} <= terms
    # and with the common term pruned, no pair shares any term
    pairs = tfidf_similar_pairs(df, "text", "doc_id",
                                threshold=0.0, max_df_fraction=0.5)
    assert pairs.count() == 0


def test_idf_downweights_frequent_terms(spark):
    df = _df(spark, [
        (1, "shared rare1"), (2, "shared rare2"), (3, "shared rare3"),
        (4, "unrelated text"),
    ])
    v = {(r.doc_id, r.term): r.tfidf
         for r in tf_idf(df, "text", "doc_id").collect()}
    # 'shared' (df=3) must weigh less than 'rare1' (df=1) in the same doc
    assert v[(1, "shared")] < v[(1, "rare1")]
