"""Similarity search over embedding columns (array<float>).

Two tiers, as a real pipeline would ship them:

- ``cosine_topk``: brute-force exact top-k. The query set is broadcast
  (it is small by construction); the corpus is scanned once; ranking is
  a window per query. At 100 TB of embeddings this is the baseline you
  validate the ANN path against on samples.
- ``lsh_topk``: random-hyperplane LSH bucketing — each vector gets a
  sign-pattern bucket from a fixed set of deterministic hyperplanes;
  search only touches the query's bucket. The bucket column is also the
  natural partition key, so at scale the bucket join prunes both I/O
  (partition pruning) and compute.

All arithmetic is promoted to double before the dot product so the
DuckDB oracle (which computes in double) matches bit-for-bit after
rounding to 4 decimals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# deterministic hyperplanes: dimension indices paired with signs.
# hyperplane h = e[i0] - e[i1] (difference of two coordinate axes) —
# portable to SQL as sign(v[i0] - v[i1]).
LSH_PLANES: tuple[tuple[int, int], ...] = ((0, 1), (2, 3), (4, 5), (6, 7))


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def cosine_expr(a: Column, b: Column) -> Column:
    """cosine(a, b), computed in double, rounded to 4 decimals."""
    a, b = _as_double(a), _as_double(b)
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.round(dot / F.nullif(na * nb, F.lit(0.0)), 4)


def cosine_sql(a: str, b: str) -> str:
    da = f"list_transform({a}, x -> cast(x as double))"
    db = f"list_transform({b}, x -> cast(x as double))"
    dot = f"list_sum(list_transform(list_zip({da}, {db}), p -> p[1] * p[2]))"
    na = f"sqrt(list_sum(list_transform({da}, x -> x * x)))"
    nb = f"sqrt(list_sum(list_transform({db}, x -> x * x)))"
    return f"round({dot} / nullif({na} * {nb}, 0.0), 4)"


def cosine_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
                vec_col: str, k: int = 5) -> DataFrame:
    """Exact top-k: (query_id, match_id, cosine), k rows per query.

    Deterministic ranking: (rounded cosine desc, match id asc) so ties
    at the k-boundary resolve identically in any engine.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("match_id"), F.col(vec_col).alias("cvec")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id", "match_id", cosine_expr(F.col("qvec"), F.col("cvec")).alias("cosine")
    ).filter(F.col("query_id") != F.col("match_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("match_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "match_id", "cosine", "rk")
    )


def cosine_topk_sql(corpus_sql: str, query_pred: str, id_col: str,
                    vec_col: str, k: int = 5) -> str:
    cos = cosine_sql(f"q.{vec_col}", f"c.{vec_col}")
    return (
        f"with q as (select {id_col} as query_id, {vec_col} from {corpus_sql} where {query_pred}), "
        f"c as (select {id_col} as match_id, {vec_col} from {corpus_sql}), "
        f"scored as (select query_id, match_id, {cos} as cosine "
        f"  from c cross join q where query_id != match_id), "
        f"ranked as (select *, row_number() over (partition by query_id "
        f"  order by cosine desc, match_id asc) as rk from scored) "
        f"select query_id, match_id, cosine, rk from ranked where rk <= {k}"
    )


def lsh_bucket_expr(vec: Column) -> Column:
    """Sign-pattern bucket from the fixed hyperplanes (string of 0/1)."""
    v = _as_double(vec)
    bits = [
        F.when(v[i] - v[j] > 0, F.lit("1")).otherwise(F.lit("0"))
        for i, j in LSH_PLANES
    ]
    return F.concat(*bits)


def lsh_bucket_sql(vec: str) -> str:
    bits = " || ".join(
        f"(case when cast({vec}[{i + 1}] as double) - cast({vec}[{j + 1}] as double) > 0 "
        f"then '1' else '0' end)"
        for i, j in LSH_PLANES
    )
    return f"({bits})"


def lsh_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
             vec_col: str, k: int = 5) -> DataFrame:
    """ANN top-k: rank only within the query's LSH bucket.

    Same output schema as cosine_topk; recall < 1.0 by construction —
    the scale path trades exactness for touching ~1/2^n_planes of the data.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        lsh_bucket_expr(F.col(vec_col)).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("match_id"),
        F.col(vec_col).alias("cvec"),
        lsh_bucket_expr(F.col(vec_col)).alias("bucket"),
    )
    scored = c.join(F.broadcast(q), on="bucket").select(
        "query_id", "match_id",
        cosine_expr(F.col("qvec"), F.col("cvec")).alias("cosine"),
    ).filter(F.col("query_id") != F.col("match_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("match_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "match_id", "cosine", "rk")
    )


def lsh_topk_sql(corpus_sql: str, query_pred: str, id_col: str,
                 vec_col: str, k: int = 5) -> str:
    cos = cosine_sql(f"q.{vec_col}", f"c.{vec_col}")
    bq = lsh_bucket_sql(f"q.{vec_col}")
    bc = lsh_bucket_sql(f"c.{vec_col}")
    return (
        f"with q as (select {id_col} as query_id, {vec_col} from {corpus_sql} where {query_pred}), "
        f"c as (select {id_col} as match_id, {vec_col} from {corpus_sql}), "
        f"scored as (select query_id, match_id, {cos} as cosine "
        f"  from c join q on {bc} = {bq} where query_id != match_id), "
        f"ranked as (select *, row_number() over (partition by query_id "
        f"  order by cosine desc, match_id asc) as rk from scored) "
        f"select query_id, match_id, cosine, rk from ranked where rk <= {k}"
    )
