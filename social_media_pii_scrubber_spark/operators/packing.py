"""Chunking + sequence packing for LLM training-data preparation.

- ``chunk_text`` — split each document into max-token windows with
  overlap (the pretraining/RAG chunker). Pure per-row array ops: one
  split, one strided ``sequence`` of window starts, one ``transform``
  building (chunk, n_tokens) structs, one posexplode. Linear, no
  shuffle, whole plan stays in the scan's stage.
- ``pack_sequences`` — concat-and-chunk bin assignment: documents are
  streamed in a deterministic order within hash-spread buckets and cut
  into fixed token-budget bins by a running cumulative sum. One window
  per bucket; bucket count = write parallelism. The (bucket, bin,
  offset) triple is a complete, reproducible packing plan — the actual
  byte concatenation happens at write time from it.

Both with exact DuckDB twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_text(df: DataFrame, text_col: str, id_col: str,
               max_tokens: int = 128, overlap: int = 16) -> DataFrame:
    """(id, chunk_idx, chunk_text, n_tokens): strided token windows."""
    assert 0 <= overlap < max_tokens
    stride = max_tokens - overlap
    from ..functions.text import let_expr

    # let-bound: the per-chunk slice lambda must reference the token
    # array as a lambda variable, not re-inline the split() (Spark
    # re-evaluates captured trees per element — O(words²/stride))
    def body(w):
        n = F.size(w)
        starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride))
        return F.transform(
            starts,
            lambda s: F.struct(
                F.array_join(F.slice(w, s, max_tokens), " ").alias("chunk_text"),
                F.size(F.slice(w, s, max_tokens)).alias("n_tokens"),
            ),
        )

    chunks = let_expr(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), body)
    return df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "_c")
    ).select(
        id_col, "chunk_idx",
        F.col("_c.chunk_text").alias("chunk_text"),
        F.col("_c.n_tokens").alias("n_tokens"),
    )


def chunk_text_sql(table_sql: str, text_col: str, id_col: str,
                   max_tokens: int = 128, overlap: int = 16) -> str:
    stride = max_tokens - overlap
    w = f"regexp_split_to_array(trim(lower({text_col})), '\\s+')"
    return (
        f"with src as (select {id_col}, {w} as w from {table_sql}), "
        f"st as (select {id_col}, w, "
        f"  range(1, greatest(len(w), 1) + 1, {stride}) as starts from src), "
        f"ex as (select {id_col}, w, unnest(starts) as s, "
        f"  generate_subscripts(starts, 1) - 1 as chunk_idx from st) "
        f"select {id_col}, chunk_idx, "
        f"array_to_string(list_slice(w, s, s + {max_tokens} - 1), ' ') as chunk_text, "
        f"len(list_slice(w, s, s + {max_tokens} - 1)) as n_tokens from ex"
    )


def pack_sequences(df: DataFrame, id_col: str, tokens_col: str,
                   budget: int = 2048, n_buckets: int = 64) -> DataFrame:
    """(id, bucket, bin, offset): reproducible concat-and-chunk plan.

    Documents are spread across ``n_buckets`` independent streams (the
    write parallelism), ordered by id within each; a running token sum
    assigns each document its bin (floor(start/budget)) and offset
    within the stream. Deterministic under any cluster layout.

    The id-mod bucket keeps the DuckDB twin trivial; hash numeric-
    unstable keys first (sampling._hash_prefix_expr) at scale.
    """
    bucket = F.pmod(F.col(id_col), F.lit(n_buckets)).cast("int")
    win = (
        Window.partitionBy("bucket").orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(tokens_col).over(win), F.lit(0))
    return (
        df.withColumn("bucket", bucket)
        .select(
            F.col(id_col), "bucket",
            F.floor(start / budget).cast("bigint").alias("bin"),
            F.pmod(start, F.lit(budget)).cast("bigint").alias("offset"),
        )
    )


def pack_sequences_sql(table_sql: str, id_col: str, tokens_col: str,
                       budget: int = 2048, n_buckets: int = 64) -> str:
    start = (
        f"coalesce(sum({tokens_col}) over (partition by {id_col} % {n_buckets} "
        f"order by {id_col} asc rows between unbounded preceding and 1 preceding), 0)"
    )
    return (
        f"select {id_col}, cast({id_col} % {n_buckets} as int) as bucket, "
        f"cast(floor({start} / {budget}) as bigint) as bin, "
        f"cast({start} % {budget} as bigint) as offset "
        f"from {table_sql}"
    )
