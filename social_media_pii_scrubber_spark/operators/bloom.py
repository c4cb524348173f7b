"""Bloom-filter-accelerated incremental (cross-snapshot) dedup.

The rolling-crawl workflow (`__spark_entry__.q_incremental_dedup`)
drops NEW-snapshot docs whose fingerprint appeared in the PREVIOUS
snapshot via a plain ``left_anti`` join. At 100 TB that join shuffles
the ENTIRE new snapshot on fp even though the overwhelming majority of
new docs are not duplicates. This module adds the standard at-scale
accelerator — the same idea as Spark's own injected runtime bloom
filters (``spark.sql.optimizer.runtime.bloomFilter.enabled``), but
usable from PySpark where the optimizer does not inject one across an
explicit anti-join:

1. BUILD (one scan of prev, pure JVM): k seeded ``xxhash64`` bit
   positions per fingerprint → ``explode`` → ``groupBy(word_idx)
   .agg(bit_or(bit))``. The partial aggregation bounds every map task's
   output at ``n_bits/64`` rows regardless of corpus size, and the
   driver collects at most ``n_bits/64`` (word_idx, word) rows — a
   CONSTRUCTION-BOUNDED model dimension (default 512 KiB), never
   corpus-sized.
2. PROBE (one scan of new, one vectorized pandas UDF): the k positions
   are computed JVM-side; the UDF only gathers bits from the broadcast
   numpy bitmap. Docs the bloom rejects are DEFINITELY new (no false
   negatives) and skip the join entirely.
3. VERIFY: only bloom-positive docs (true dups + ~fpp of the rest) run
   the exact ``left_anti`` — so the expensive shuffle sees
   ``|dups| + fpp·|new|`` rows instead of ``|new|``.

The output is row-for-row IDENTICAL to the plain anti-join (the bloom
is a conservative pre-filter; false positives are re-checked exactly),
so the operator keeps the exact NOT-EXISTS DuckDB oracle.

Null fingerprints: ``left_anti`` keeps null-key rows (null never
equals anything), and ``xxhash64`` SKIPS null arguments rather than
returning null — so nulls are routed around the bloom explicitly:
excluded from the build, and sent straight to "definitely new" on the
probe side.

Sizing: fpp ≈ (1 − e^(−k·n/m))^k for n items in m bits with k hashes.
The default (m = 2^22, k = 5) holds fpp < 1e-4 up to n ≈ 300k items;
at web scale pick m from the expected prev-snapshot cardinality and
cap it like Spark caps its runtime filters (maxNumBits) — past the
cap, fpp degrades gracefully (more rows re-checked exactly, never a
wrong answer).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

DEFAULT_N_BITS = 1 << 22     # 4 Mi bits = 512 KiB bitmap
DEFAULT_N_HASHES = 5
_U64_MASK = (1 << 64) - 1


def _positions(fp: Column, n_bits: int, n_hashes: int) -> Column:
    """Array of the k bloom bit positions for a fingerprint — pure
    column expressions (seeded xxhash64, non-negative via pmod).

    PINNED ASSUMPTION: xxhash64 SKIPS null arguments (a null ``fp``
    still yields a valid bigint — the hash of the seed literal alone),
    so this array never contains nulls. bloom_incremental_dedup relies
    on that: Spark extracts Python UDFs and evaluates them BEFORE any
    enclosing CASE/when guard, so null-fp rows DO reach the probe
    UDF's np.vstack even though the when(fp.isNull(), ...) branch
    discards the result. If a change here ever propagates nulls into
    the array, pre-filter null-fp rows out of the probe input instead
    of trusting the when() guard."""
    return F.array(*[
        F.pmod(F.xxhash64(F.lit(i), fp), F.lit(n_bits))
        for i in range(n_hashes)
    ])


def bloom_build(prev: DataFrame, fp_col: str,
                n_bits: int = DEFAULT_N_BITS,
                n_hashes: int = DEFAULT_N_HASHES):
    """Scan ``prev`` once and return a broadcast numpy uint64 bitmap.

    All corpus-sized work is JVM-side codegen + one partial-agg'd
    shuffle bounded at n_bits/64 rows per task; only the aggregated
    word table (≤ n_bits/64 rows) reaches the driver."""
    pos = (
        prev.filter(F.col(fp_col).isNotNull())
        .select(F.explode(_positions(F.col(fp_col), n_bits, n_hashes))
                .alias("pos"))
    )
    words = (
        pos.select(
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            # shiftleft's Python wrapper takes only int shift amounts;
            # the SQL form accepts a column
            F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("bit"),
        )
        .groupBy("word_idx").agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    bitmap = np.zeros(n_bits // 64, dtype=np.uint64)
    for r in words:
        bitmap[r["word_idx"]] = np.uint64(r["word"] & _U64_MASK)
    return prev.sparkSession.sparkContext.broadcast(bitmap)


def bloom_might_contain_udf(bitmap_bc):
    """Vectorized membership check over the broadcast bitmap: the k
    positions arrive pre-computed (JVM-side) as array<bigint>; the UDF
    is a pure numpy gather — no hashing in Python."""
    @pandas_udf("boolean")
    def check(pos: pd.Series) -> pd.Series:
        if len(pos) == 0:
            return pd.Series([], dtype=bool)
        bm = bitmap_bc.value
        mat = np.vstack(pos.to_numpy())            # (rows, k) int64
        hits = (bm[mat >> 6] >> (mat & 63).astype(np.uint64)) & np.uint64(1)
        return pd.Series(hits.all(axis=1))
    return check


def bloom_incremental_dedup(new: DataFrame, prev: DataFrame, fp_col: str,
                            n_bits: int = DEFAULT_N_BITS,
                            n_hashes: int = DEFAULT_N_HASHES) -> DataFrame:
    """``new`` minus ``prev`` on ``fp_col`` — exact ``left_anti``
    semantics (identical output, same DuckDB NOT-EXISTS oracle), with
    the join's left side pre-filtered to bloom-positive rows only.

    ``prev`` needs just the fingerprint column; it is consumed once to
    build the bitmap and once (bloom-positive rows only) as the join's
    right side."""
    bitmap_bc = bloom_build(prev, fp_col, n_bits, n_hashes)
    fp = F.col(fp_col)
    probed = new.withColumn(
        "_maybe_dup",
        F.when(fp.isNull(), F.lit(False)).otherwise(
            bloom_might_contain_udf(bitmap_bc)(
                _positions(fp, n_bits, n_hashes))),
    )
    definitely_new = probed.filter(~F.col("_maybe_dup")).drop("_maybe_dup")
    prev_fp = prev.select(fp_col).filter(fp.isNotNull()).distinct()
    verified_new = (
        probed.filter(F.col("_maybe_dup")).drop("_maybe_dup")
        # plain left_anti: prev is corpus-sized at web scale — AQE
        # decides the physical strategy (repo invariant: no forced
        # broadcast on corpus-growing sides)
        .join(prev_fp, on=fp_col, how="left_anti")
    )
    return definitely_new.unionByName(verified_new)
