"""Distributed BPE training (operators/bpe.py) vs the scalar
replication, plus encode semantics."""

import pandas as pd
from pyspark.sql import functions as F

from social_media_pii_scrubber_spark.operators import bpe as B

TEXTS = [
    "the cat sat on the mat",
    "the hat and the cat",
    "a bat a cat a rat",
    "matter chatter batter",
    "the the the hat hat",
]


def _df(spark, texts=TEXTS):
    return spark.createDataFrame(pd.DataFrame({"text": texts}), "text string")


class TestTrain:
    def test_matches_scalar_reference(self, spark):
        got = B.train_bpe(_df(spark), "text", 12)
        want = B.train_bpe_python(TEXTS, 12)
        assert got == want and len(got) == 12

    def test_distributed_fallback_matches_driver_path(self, spark):
        """driver_vocab_max=0 forces the all-DataFrame per-merge loop;
        it must produce the exact merge list of the driver path and the
        naive scalar replication."""
        got = B.train_bpe(_df(spark), "text", 12, driver_vocab_max=0)
        assert got == B.train_bpe_python(TEXTS, 12)

    def test_incremental_loop_matches_naive_recount_randomized(self):
        """The driver loop's incremental pair-count index vs the naive
        full-recount replication over seeded random corpora — any drift
        in decrement/stale-entry handling shows up here."""
        import random

        rng = random.Random(7)
        for trial in range(25):
            words = ["".join(rng.choice("abcde")
                             for _ in range(rng.randint(1, 7)))
                     for _ in range(rng.randint(1, 40))]
            texts = [" ".join(rng.sample(words, rng.randint(1, len(words))))
                     for _ in range(rng.randint(1, 10))]
            n = rng.randint(1, 30)
            from collections import Counter
            vocab = dict(Counter(
                w for t in texts for w in t.strip().lower().split() if w))
            assert (B._merge_loop_weighted(vocab, n)
                    == B.train_bpe_python(texts, n)), (trial, texts, n)

    def test_deterministic_tie_break(self, spark):
        """'ab' and 'cd' pair counts tie — the lexicographically first
        pair must win in both implementations."""
        texts = ["ab cd", "ab cd"]
        got = B.train_bpe(_df(spark, texts), "text", 1)
        assert got == [("a", "b")]
        assert B.train_bpe_python(texts, 1) == [("a", "b")]

    def test_early_stop_when_no_pairs_left(self, spark):
        texts = ["a b", "b a"]  # single-char words: no pairs at all
        assert B.train_bpe(_df(spark, texts), "text", 5) == []

    def test_overlapping_run_counts_and_merges_left_to_right(self, spark):
        """'aaaa' with merge (a,a): left-to-right gives [aa, aa], never
        the overlapping [a, aa, a] factoring."""
        texts = ["aaaa aaaa"]
        merges = B.train_bpe(_df(spark, texts), "text", 1)
        assert merges == [("a", "a")]
        [row] = _df(spark, texts).select(
            B.bpe_encode_expr(F.col("text"), merges).alias("t")).collect()
        assert row.t == ["aa", "aa", "aa", "aa"]


class TestEncode:
    def test_roundtrip_concat_preserves_text(self, spark):
        """Encoding is a segmentation: concatenating a word's tokens
        must reproduce the word."""
        merges = B.train_bpe_python(TEXTS, 12)
        df = _df(spark).select(
            F.col("text"),
            B.bpe_encode_expr(F.col("text"), merges).alias("toks"))
        for r in df.collect():
            assert "".join(r.toks) == "".join(r.text.lower().split())

    def test_trained_merges_compress(self, spark):
        """More merges → fewer tokens on the training corpus."""
        df = _df(spark)
        m12 = B.train_bpe_python(TEXTS, 12)
        n0 = df.select(F.sum(F.size(B.bpe_encode_expr(F.col("text"), [])))
                       .alias("n")).collect()[0].n
        n12 = df.select(F.sum(F.size(B.bpe_encode_expr(F.col("text"), m12)))
                        .alias("n")).collect()[0].n
        assert n12 < n0


class TestMinCount:
    def test_pruned_vocab_ignores_rare_types(self, spark):
        """min_count=2 must learn from the repeated words only — the
        singleton junk word's pairs can't win a merge."""
        texts = ["zz zz zz", "qxj"]  # 'qxj' is a singleton junk type
        got = B.train_bpe(_df(spark, texts), "text", 2, min_count=2)
        assert got == [("z", "z")]
