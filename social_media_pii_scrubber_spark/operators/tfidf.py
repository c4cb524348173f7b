"""TF-IDF vectors + sparse cosine similarity (inverted-index pattern).

Term-weighted similarity complements the MinHash/SimHash near-dup
family: those catch copies, tf-idf catches topical similarity. The
physical pattern is the one production sparse-similarity jobs use:

- ``tf_idf`` — (id, term, weight) long-form vectors: one explode, one
  (id, term) partial-agg count, one docfreq agg joined back on term.
  The docfreq join is deliberately NOT hint-broadcast: the vocabulary
  of a 10^12-doc web corpus (typos, ids, urls-as-tokens) is billions of
  terms — AQE broadcasts it when genuinely small and shuffle-joins
  otherwise (the term shuffle exists in the pair join anyway). No
  driver collect; corpus size N rides along as a broadcast 1-row frame.
- ``tfidf_similar_pairs`` — pairs by joining the long form with itself
  ON TERM (the inverted index): per-term posting lists multiply, so the
  quadratic term is Σ df_t² — bounded by ``max_df_fraction``, which
  drops terms appearing in too many docs (they carry ~no idf weight and
  ALL the join cost). That pruning is what makes the pattern survive
  100 TB; the threshold keeps the output sparse.

Both have exact DuckDB twins (weights rounded to 6 decimals,
cosines to 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tf_idf(df: DataFrame, text_col: str, id_col: str,
           max_df_fraction: float = 1.0) -> DataFrame:
    """(id, term, tfidf): tf = in-doc count, idf = ln(N / df_t)."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    tc = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    n = df.agg(F.count(F.lit(1)).alias("_n"))
    docfreq = (
        tc.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
        .crossJoin(F.broadcast(n))
        .filter(F.col("df_t") <= F.col("_n") * max_df_fraction)
    )
    return tc.join(docfreq, on="term").select(
        F.col(id_col), "term",
        F.round(F.col("tf") * F.log(F.col("_n") / F.col("df_t")), 6).alias("tfidf"),
    )


def tf_idf_sql(table_sql: str, text_col: str, id_col: str,
               max_df_fraction: float = 1.0) -> str:
    return (
        f"with src as (select * from {table_sql}), "
        f"toks as (select {id_col}, unnest(regexp_split_to_array("
        f"trim(lower({text_col})), '\\s+')) as term from src), "
        f"tc as (select {id_col}, term, count(*) as tf from toks "
        f"  where term != '' group by {id_col}, term), "
        f"n as (select count(*) as _n from src), "
        f"docfreq as (select term, count(*) as df_t from tc group by term), "
        f"kept as (select term, df_t, _n from docfreq, n "
        f"  where df_t <= _n * {max_df_fraction}) "
        f"select {id_col}, tc.term, round(tf * ln(_n * 1.0 / df_t), 6) as tfidf "
        f"from tc join kept on tc.term = kept.term"
    )


def tfidf_similar_pairs(df: DataFrame, text_col: str, id_col: str,
                        threshold: float = 0.5,
                        max_df_fraction: float = 0.5) -> DataFrame:
    """(id_a, id_b, cosine) for pairs with tf-idf cosine ≥ threshold."""
    v = tf_idf(df, text_col, id_col, max_df_fraction)
    norms = v.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col("tfidf") * F.col("tfidf"))).alias("norm")
    )
    a = v.select(F.col(id_col).alias("id_a"), "term", F.col("tfidf").alias("wa"))
    b = v.select(F.col(id_col).alias("id_b"), "term", F.col("tfidf").alias("wb"))
    dots = (
        a.join(b, on="term")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col(id_col).alias("id_a"), F.col("norm").alias("na"))
    nb = norms.select(F.col(id_col).alias("id_b"), F.col("norm").alias("nb"))
    return (
        dots.join(na, "id_a").join(nb, "id_b")
        .select(
            "id_a", "id_b",
            F.round(F.col("dot") / F.nullif(F.col("na") * F.col("nb"), F.lit(0.0)), 4
                    ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def tfidf_similar_pairs_sql(table_sql: str, text_col: str, id_col: str,
                            threshold: float = 0.5,
                            max_df_fraction: float = 0.5) -> str:
    v = tf_idf_sql(table_sql, text_col, id_col, max_df_fraction)
    return (
        f"with v as ({v}), "
        f"norms as (select {id_col}, sqrt(sum(tfidf * tfidf)) as norm "
        f"  from v group by {id_col}), "
        f"dots as (select a.{id_col} as id_a, b.{id_col} as id_b, "
        f"  sum(a.tfidf * b.tfidf) as dot "
        f"  from v a join v b on a.term = b.term and a.{id_col} < b.{id_col} "
        f"  group by a.{id_col}, b.{id_col}) "
        f"select id_a, id_b, round(dot / nullif(na.norm * nb.norm, 0.0), 4) as cosine "
        f"from dots join norms na on dots.id_a = na.{id_col} "
        f"join norms nb on dots.id_b = nb.{id_col} "
        f"where round(dot / nullif(na.norm * nb.norm, 0.0), 4) >= {threshold}"
    )
