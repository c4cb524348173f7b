"""Join operators (reference J1-J4).

The reference's only join machinery is membership probing against
in-memory Python sets — i.e. broadcast semi/anti joins. We express them
as real joins and FORCE the broadcast: the probe side in production is
the 100 TB page table, the build side (favorites bank, alias bank,
already-emitted comments) is small. A shuffle join here would be the
single worst plan regression at scale, so ``F.broadcast`` is explicit
rather than left to the threshold heuristic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def semi_flag_join(
    df: DataFrame, keys: DataFrame, on: str, flag_name: str
) -> DataFrame:
    """J1 — flag each row whether its key appears in `keys`.

    Reference: TT browsed videos flagged Favorite/Liked by set membership
    (/root/reference/SMParser/smparsers.py:435-436, 443-444). The flag
    variant (left join + coalesce) rather than left_semi, because the
    reference KEEPS non-members with a blank flag.
    """
    marked = keys.select(on).distinct().withColumn(flag_name, F.lit(True))
    out = df.join(F.broadcast(marked), on=on, how="left")
    return out.withColumn(flag_name, F.coalesce(F.col(flag_name), F.lit(False)))


def anti_join(df: DataFrame, exclude: DataFrame, on: str) -> DataFrame:
    """J2/P6 — drop rows whose key appears in `exclude`.

    Reference: FB comments minus the subject's own post comments
    (smparsers.py:207; set built at :126-127, :175-176).
    """
    return df.join(F.broadcast(exclude.select(on).distinct()), on=on, how="left_anti")


def zip_longest_join(dfs: list[DataFrame], fill: str = "",
                     max_rows: int = 1_000_000) -> DataFrame:
    """J4 — positional outer zip of N single-column DataFrames.

    Reference: ``itertools.zip_longest(_a,_b,_c,_d, fillvalue='')``
    (smparsers.py:558-559). Spark has no positional alignment, so each
    side gets a row_number over an explicit order and the sides
    full-outer-join on it. Callers MUST pass DataFrames with a
    deterministic order column named ``_ord`` (positional semantics only
    exist relative to an ordering — at scale "file order" is not a
    thing, so the order key is part of the contract).

    SIZE BOUND: the global-order row_number is a single-partition sort —
    deliberately so; the reference zips 4 report lists of at most a few
    hundred rows. ``max_rows`` enforces the bound at execution time
    (raise_error inside the plan, no extra action): a side longer than
    that means this operator is being misused for corpus-scale data.
    """
    out: DataFrame | None = None
    for i, df in enumerate(dfs):
        value_col = [c for c in df.columns if c != "_ord"][0]
        w = Window.orderBy("_ord")
        rn = F.row_number().over(w)
        rn = F.when(rn <= max_rows, rn).otherwise(F.raise_error(F.lit(
            f"zip_longest_join side exceeds max_rows={max_rows}: "
            "the positional zip is single-partition by design"
        )))
        side = df.select(rn.alias("rn"), F.col(value_col))
        out = side if out is None else out.join(side, on="rn", how="full")
    assert out is not None
    value_cols = [c for c in out.columns if c != "rn"]
    return out.select(
        "rn", *[F.coalesce(F.col(c), F.lit(fill)).alias(c) for c in value_cols]
    )
