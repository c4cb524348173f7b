"""Distributed BPE tokenizer training (Sennrich et al. 2016).

The tokenizer-fitting stage of a pretraining pipeline, as DataFrame
ops. The scalable shape: ONE corpus pass collapses the corpus to the
weighted word vocabulary (word types × counts — orders of magnitude
smaller than the corpus, and the only thing BPE statistics depend on).
The merge loop then runs entirely driver-side on that collapsed vocab
(``_merge_loop_weighted``: incremental pair-count maintenance, the
standard Sennrich learn_bpe index) — one Spark job total instead of
one per merge, which matters when production vocabs want 32k merges
(VERDICT r04 item 3). The driver footprint is bounded by the TYPE
inventory, not the corpus: ``driver_vocab_max`` (default 2M types,
≲1 GB with symbol lists) guards the collect; a corpus whose pruned
vocab exceeds it falls back to ``_train_bpe_distributed``, the
all-DataFrame per-merge loop:

  1. pair counts: explode zip_with(syms, syms[2:]) weighted by the
     word count — one partial-agg'd shuffle over the vocab;
  2. argmax pair, deterministic (count desc, then lexicographic pair)
     — a 1-row collect, the model parameter;
  3. apply the merge to every word with a left-to-right aggregate()
     fold (lambda-variable accumulator — no captured-tree
     re-evaluation, see functions/text.py let_expr);
  4. localCheckpoint every few iterations to truncate the growing
     lineage (components.py's iterative pattern).

All three merge-loop implementations (driver incremental, distributed,
and the naive-recount scalar replication ``train_bpe_python`` kept
independent for the fixture oracle) are exact-match cross-checked in
tests/test_bpe.py.

Deterministic end to end (counts are exact integers, ties break
lexicographically), so the oracle gate value-checks the Spark result
against an independent scalar replication via a fixture table — the
kmeans/perplexity pattern for iterative, non-SQL-expressible ops.

No end-of-word marker is appended (both implementations agree);
symbols are plain strings, so distinct merge paths yielding the same
string unify — the behavior of standard string-keyed BPE trainers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CHECKPOINT_EVERY = 8


def word_vocab(df: DataFrame, text_col: str,
               min_count: int = 1) -> DataFrame:
    """(w, cnt): lowercase whitespace word types with corpus counts —
    the one corpus-sized pass. At web scale the type inventory is
    noise-heavy (URLs, hashes, typos); ``min_count`` prunes singleton
    junk BEFORE the iteration loop — rare types contribute negligible
    pair mass but dominate the vocab row count."""
    vocab = (
        df.select(F.explode(F.split(F.trim(F.lower(F.col(text_col))),
                                    r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    )
    if min_count > 1:
        vocab = vocab.filter(F.col("cnt") >= min_count)
    return vocab


def _pair_counts(tok: DataFrame) -> DataFrame:
    """(a, b, n): adjacent-symbol pair counts weighted by word count.
    zip_with keeps the symbol array in HOF-argument position; the
    trailing (last, null) pair is filtered out."""
    pairs = F.filter(
        F.zip_with(
            F.col("syms"),
            F.slice(F.col("syms"), 2,
                    F.greatest(F.size(F.col("syms")), F.lit(1))),
            lambda a, b: F.when(b.isNotNull(),
                                F.struct(a.alias("a"), b.alias("b"))),
        ),
        lambda p: p.isNotNull(),
    )
    return (
        tok.select(F.col("cnt"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").alias("n"))
    )


def _apply_merge_expr(syms: Column, a: str, b: str) -> Column:
    """Left-to-right non-overlapping merge of adjacent (a, b) into
    a+b via an aggregate() fold. The accumulator is a lambda variable
    (O(1) reads); the slice-copy on a merge is O(len) per hit, fine at
    word length."""
    la, lb = F.lit(a), F.lit(b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == la) & (x == lb),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(la, lb)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


DRIVER_VOCAB_MAX = 2_000_000


def _apply_merge_scalar(syms: list[str], a: str, b: str) -> list[str]:
    """Left-to-right non-overlapping merge — scalar twin of
    ``_apply_merge_expr``."""
    out: list[str] = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def _merge_loop_weighted(vocab: dict[str, int], n_merges: int
                         ) -> list[tuple[str, str]]:
    """Driver-side merge loop over a weighted type vocabulary with
    incremental pair-count maintenance (Sennrich learn_bpe's index):
    each merge touches only the words that contain the winning pair
    and re-counts just those words — O(affected words) per merge, not
    O(vocab). Argmax is a linear scan of live pairs (count desc, then
    lexicographic — identical tie-break to the distributed and naive
    paths; a heap would shave the scan but the scan is never the
    bottleneck at type-inventory scale)."""
    toks = {w: list(w) for w in vocab}
    pc: dict[tuple[str, str], int] = {}
    pw: dict[tuple[str, str], set] = {}
    for w, syms in toks.items():
        c = vocab[w]
        for p in zip(syms, syms[1:]):
            pc[p] = pc.get(p, 0) + c
            pw.setdefault(p, set()).add(w)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pc:
            break
        best = min(pc, key=lambda p: (-pc[p], p))
        merges.append(best)
        a, b = best
        for w in list(pw.get(best, ())):
            syms = toks[w]
            new = _apply_merge_scalar(syms, a, b)
            if new == syms:  # stale index entry — pair already gone
                continue
            c = vocab[w]
            for p in zip(syms, syms[1:]):
                pc[p] -= c
                if pc[p] == 0:
                    del pc[p]
            for p in zip(new, new[1:]):
                pc[p] = pc.get(p, 0) + c
                pw.setdefault(p, set()).add(w)
            toks[w] = new
        pw.pop(best, None)
    return merges


def _train_bpe_distributed(tok: DataFrame, n_merges: int
                           ) -> list[tuple[str, str]]:
    """All-DataFrame per-merge loop — the fallback when the type
    vocabulary itself exceeds driver memory. One pair-count job +
    1-row argmax collect per merge (the collect is the model
    parameter, never corpus-sized)."""
    tok = tok.localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        top = (
            _pair_counts(tok)
            .orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        tok = tok.select("cnt",
                         _apply_merge_expr(F.col("syms"), a, b).alias("syms"))
        if (i + 1) % CHECKPOINT_EVERY == 0:
            tok = tok.localCheckpoint(eager=True)
    return merges


def train_bpe(df: DataFrame, text_col: str, n_merges: int,
              min_count: int = 1,
              driver_vocab_max: int = DRIVER_VOCAB_MAX
              ) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges over the corpus. Returns the
    ordered merge list — the model artifact. Stops early if no pair
    remains. ``min_count`` > 1 is the web-scale profile: prune the
    crawl's singleton junk types before iterating.

    One corpus pass collapses to the weighted type vocab, which is
    localCheckpointed so the size guard, the driver collect, and the
    distributed fallback all read the materialized vocab — the corpus
    is never collapsed twice, and a vocab over ``driver_vocab_max``
    costs one count() on the checkpoint, not a discarded driver-sized
    transfer. All paths produce identical merges."""
    vocab = word_vocab(df, text_col, min_count=min_count)
    if driver_vocab_max > 0:
        vocab = vocab.localCheckpoint(eager=True)  # the one corpus pass
        if vocab.count() <= driver_vocab_max:
            return _merge_loop_weighted(
                {r["w"]: r["cnt"] for r in vocab.collect()}, n_merges)
    return _train_bpe_distributed(
        vocab.select("cnt", F.split(F.col("w"), "").alias("syms")), n_merges)


def bpe_encode_expr(text: Column, merges: list[tuple[str, str]]) -> Column:
    """Tokenize a text column with a trained merge list: per word,
    replay the merges in order (the standard greedy application).
    Merge list enters as literals — model parameters, bounded."""
    def encode_word(w: Column) -> Column:
        syms = F.split(w, "")
        for a, b in merges:
            syms = _apply_merge_expr(syms, a, b)
        return syms

    words = F.filter(F.split(F.trim(F.lower(text)), r"\s+"),
                     lambda x: x != "")
    return F.flatten(F.transform(words, encode_word))


def train_bpe_python(texts: list[str], n_merges: int
                     ) -> list[tuple[str, str]]:
    """Independent scalar replication (Counter-based) for the fixture
    oracle and tests."""
    from collections import Counter

    vocab = Counter(
        w for t in texts for w in t.strip().lower().split() if w)
    toks = {w: list(w) for w in vocab}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, syms in toks.items():
            c = vocab[w]
            for x, y in zip(syms, syms[1:]):
                pc[(x, y)] += c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for w, syms in toks.items():
            out: list[str] = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            toks[w] = out
    return merges
