"""Pivot / category aggregation operators (reference A3-A5).

A3 (FB reactions crosstab) is the reference's most complex aggregation:
sort → groupby type → Counter per category + per-type totals
(/root/reference/SMParser/smparsers.py:62-69 — the author's own TODO
says "refactor this in Pandas pivot?"). In Spark it is ONE shuffle:
``groupBy(type).pivot(category, cats).count()`` with the category list
passed explicitly — never let pivot() run its implicit distinct scan at
100 TB. The Total column comes from the same shuffled pass via a
row-wise sum of the pivoted counts instead of a second aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# reference category list (smparsers.py:43)
REACTION_CATEGORIES = ["photo", "comment", "post", "link", "album", "video", "other"]


def extract_category_expr(
    title: Column, categories: list[str] | None = None, default: str = "other"
) -> Column:
    """A5 — LAST-match-wins substring categorization.

    The reference loop overwrites on every hit (smparsers.py:55-58), so
    the last category in list order that appears as a substring wins —
    the equivalent when-chain must run in REVERSE list order.
    """
    cats = categories or REACTION_CATEGORIES
    expr = F.lit(default)
    for cat in cats:  # later list entries override earlier → build forward
        expr = F.when(title.contains(cat), F.lit(cat)).otherwise(expr)
    # note: building forward with otherwise(previous) makes the LAST
    # matching category win, matching the reference loop.
    return expr


def extract_category_sql(
    title: str, categories: list[str] | None = None, default: str = "other"
) -> str:
    cats = categories or REACTION_CATEGORIES
    whens = " ".join(
        f"when {title} like '%{c}%' then '{c}'" for c in reversed(cats)
    )
    return f"(case {whens} else '{default}' end)"


def pivot_count(
    df: DataFrame, group_col: str, pivot_col: str, categories: list[str],
    total_name: str = "Total",
) -> DataFrame:
    """A3 — crosstab with a per-group total, single shuffle.

    Output schema: (group, total, <one column per category>).
    """
    pivoted = (
        df.groupBy(group_col)
        .pivot(pivot_col, categories)
        .agg(F.count(F.lit(1)))
        .na.fill(0, categories)
    )
    # Total = sum over the LISTED categories only (rows whose pivot value
    # is outside `categories` are not counted) — the SQL twin renders the
    # same sum-of-category-counts. Cast bigint explicitly: the driver's
    # value hash is type-sensitive and the seed literal would otherwise
    # leave INT in the mix.
    total = sum((F.col(c) for c in categories), F.lit(0)).cast("bigint").alias(total_name)
    return pivoted.select(group_col, total, *categories)


def pivot_count_sql(
    table_sql: str, group_col: str, pivot_col: str, categories: list[str],
    total_name: str = "Total",
) -> str:
    """DuckDB twin of ``pivot_count``.

    count(case...) (BIGINT) rather than sum(case...) — DuckDB's sum
    returns HUGEINT, which the driver's type-sensitive value hash
    distinguishes from Spark's BIGINT counts. Total is the sum of the
    per-category counts, matching the Spark side exactly even when pivot
    values fall outside `categories`.
    """
    counts = {
        c: f"count(case when {pivot_col} = '{c}' then 1 end)" for c in categories
    }
    cat_cols = ", ".join(f'{e} as "{c}"' for c, e in counts.items())
    total = " + ".join(counts.values())
    return (
        f"select {group_col}, cast({total} as bigint) as {total_name}, {cat_cols} "
        f"from {table_sql} group by {group_col}"
    )


def dynamic_pivot_count(
    df: DataFrame, group_col: str, pivot_col: str, blank_default: str = "OTHER"
) -> DataFrame:
    """A4 — pivot whose column set derives from the data (SC story views,
    smparsers.py:524-537; blank media type → OTHER at :530).

    The implicit-distinct pivot is acceptable ONLY for low-cardinality
    category domains; at scale pass the domain explicitly (pivot_count).
    """
    norm = F.when(F.trim(F.col(pivot_col)) == "", F.lit(blank_default)).otherwise(
        F.col(pivot_col)
    )
    return (
        df.withColumn(pivot_col, norm)
        .groupBy(group_col)
        .pivot(pivot_col)
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )
