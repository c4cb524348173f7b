"""Chunking + sequence-packing semantics (operators/packing.py)."""

import pandas as pd
from pyspark.sql import functions as F

from social_media_pii_scrubber_spark.operators.packing import (
    chunk_text, pack_sequences,
)


def test_chunk_windows_and_overlap(spark):
    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": [text]}),
                               "doc_id long, text string")
    rows = sorted(chunk_text(df, "text", "doc_id", max_tokens=4, overlap=1)
                  .collect(), key=lambda r: r.chunk_idx)
    # stride 3 over 10 tokens → starts 1,4,7,10 → 4 chunks
    assert [r.n_tokens for r in rows] == [4, 4, 4, 1]
    assert rows[0].chunk_text == "w0 w1 w2 w3"
    assert rows[1].chunk_text == "w3 w4 w5 w6"   # 1-token overlap
    assert rows[3].chunk_text == "w9"
    # every token appears; consecutive chunks share exactly `overlap`
    assert rows[0].chunk_text.split()[-1:] == rows[1].chunk_text.split()[:1]


def test_chunk_short_doc_single_chunk(spark):
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["a b"]}),
                               "doc_id long, text string")
    rows = chunk_text(df, "text", "doc_id", max_tokens=128, overlap=16).collect()
    assert len(rows) == 1 and rows[0].n_tokens == 2


def test_pack_sequences_plan(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 16, 32, 48], "n_tok": [300, 300, 300, 300]}),
        "doc_id long, n_tok long",
    )  # all ids ≡ 0 mod 16 → one bucket, one ordered stream
    rows = {r.doc_id: (r.bucket, r.bin, r.offset)
            for r in pack_sequences(df, "doc_id", "n_tok",
                                    budget=512, n_buckets=16).collect()}
    assert rows[0] == (0, 0, 0)
    assert rows[16] == (0, 0, 300)
    assert rows[32] == (0, 1, 88)    # starts at 600 → bin 1, offset 88
    assert rows[48] == (0, 1, 388)


def test_pack_layout_independent(spark):
    base = spark.range(0, 200).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97 + 5).alias("n_tok")
    )
    a = {r.doc_id: (r.bucket, r.bin, r.offset)
         for r in pack_sequences(base, "doc_id", "n_tok").collect()}
    b = {r.doc_id: (r.bucket, r.bin, r.offset)
         for r in pack_sequences(base.repartition(7), "doc_id", "n_tok").collect()}
    assert a == b
