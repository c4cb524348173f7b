"""Toxicity score/keep/scrub semantics + UDF↔expr parity."""

import pandas as pd
from pyspark.sql import functions as F

from social_media_pii_scrubber_spark.functions import toxicity as TX


def _df(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"i": range(len(texts)), "t": texts}), "i long, t string"
    )


def test_score_weights_and_keep(spark):
    df = _df(spark, [
        "a perfectly fine sentence about spark",         # 0.0 → keep
        "you stupid idiot",                              # (0.6+0.8)/3 → drop
        "hate",                                          # 1.0 → drop
    ])
    rows = sorted(df.select(
        "i",
        TX.toxicity_score_expr(F.col("t")).alias("s"),
        TX.toxicity_keep_expr(F.col("t")).alias("k"),
    ).collect(), key=lambda r: r.i)
    assert rows[0].s == 0.0 and rows[0].k
    assert abs(rows[1].s - round(1.4 / 3, 6)) < 1e-9 and not rows[1].k
    assert rows[2].s == 1.0 and not rows[2].k


def test_scrub_case_insensitive_word_bounded(spark):
    df = _df(spark, ["you STUPID idiot", "Stupidity is not scrubbed"])
    got = [r.o for r in df.select(
        TX.toxicity_scrub_expr(F.col("t")).alias("o")).collect()]
    assert got[0] == "you {{TOXIC}} {{TOXIC}}"
    assert got[1] == "Stupidity is not scrubbed"  # no match inside words


def test_udf_expr_parity(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet") \
        .select("doc_id", "text").limit(200)
    planted = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.col("text"), F.lit(" hate dumb loser"))
               ).otherwise(F.col("text")),
    )
    mism = planted.select(
        TX.toxicity_score_expr(F.col("text")).alias("a"),
        TX.toxicity_score_pandas_udf()(F.col("text")).alias("b"),
    ).filter(F.col("a") != F.col("b")).count()
    assert mism == 0
