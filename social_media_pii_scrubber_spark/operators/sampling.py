"""Deterministic sampling / splitting / capping for training pipelines.

``df.sample()`` is seed-per-partition: the kept set changes when the
partitioning changes, which breaks checkpoint resume and cross-run
reproducibility. Every operator here derives its decision from a HASH
OF THE ROW KEY, so results are identical on any cluster layout, any
retry, any engine:

- ``sample_by_hash``   — Bernoulli-by-hash keep/drop at a given rate;
- ``split_by_hash``    — disjoint train/val/test assignment by weights;
- ``cap_per_key``      — at most N rows per key (host caps for crawl
  skew), deterministic rank order;
- ``train_char_lm``    — corpus-trained byte-unigram log-prob table
  (the training counterpart of functions/perplexity.py's scorer).

Hash portability: decisions compare a fixed-width md5-hex prefix
against a threshold string, so the DuckDB twin is bit-identical (the
same trick functions/text.py uses for fingerprints). Rate granularity
is 1/16^6 ≈ 6e-8 of the keyspace per hex step.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PREFIX_LEN = 6  # hex chars compared → 16^6 buckets


def _hash_prefix_expr(key: Column, seed: int) -> Column:
    return F.substring(F.md5(F.concat(key.cast("string"), F.lit(f":{seed}"))), 1, _PREFIX_LEN)


def _hash_prefix_sql(key: str, seed: int) -> str:
    return f"substr(md5(cast({key} as varchar) || ':{seed}'), 1, {_PREFIX_LEN})"


def _threshold_hex(rate: float) -> str:
    """Largest prefix strictly below this marks 'kept': rate→hex bound.

    rate≥1 returns a string above every hex prefix ('g' > 'f'): a plain
    format() would yield 7 chars and compare LOWER than most 6-char
    prefixes lexicographically.
    """
    n = int(round(rate * 16 ** _PREFIX_LEN))
    if n >= 16 ** _PREFIX_LEN:
        return "g" * _PREFIX_LEN
    return format(n, f"0{_PREFIX_LEN}x")


def sample_by_hash(df: DataFrame, key_col: str, rate: float,
                   seed: int = 42) -> DataFrame:
    """Keep a deterministic ~``rate`` fraction of rows by key hash."""
    keep = _hash_prefix_expr(F.col(key_col), seed) < F.lit(_threshold_hex(rate))
    return df.filter(keep)


def sample_by_hash_sql(table_sql: str, key_col: str, rate: float,
                       seed: int = 42) -> str:
    return (
        f"select * from {table_sql} "
        f"where {_hash_prefix_sql(key_col, seed)} < '{_threshold_hex(rate)}'"
    )


def split_by_hash(df: DataFrame, key_col: str,
                  weights: dict[str, float], seed: int = 42) -> DataFrame:
    """Assign each row to exactly one named split by key hash.

    ``weights`` maps split name → fraction (must sum to ~1). Row keys
    hash to a point in [0, 1); cumulative weight boundaries carve the
    splits — disjoint, exhaustive, stable across runs and engines.
    """
    assert math.isclose(sum(weights.values()), 1.0, abs_tol=1e-9), "weights must sum to 1"
    h = _hash_prefix_expr(F.col(key_col), seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        bound = F.lit(_threshold_hex(acc))
        expr = F.when(h < bound, F.lit(name)) if expr is None else expr.when(h < bound, F.lit(name))
    expr = (expr.otherwise(F.lit(names[-1])) if expr is not None
            else F.lit(names[-1]))
    return df.withColumn("split", expr)


def split_by_hash_sql(table_sql: str, key_col: str,
                      weights: dict[str, float], seed: int = 42) -> str:
    h = _hash_prefix_sql(key_col, seed)
    names = list(weights)
    whens, acc = [], 0.0
    for name in names[:-1]:
        acc += weights[name]
        whens.append(f"when {h} < '{_threshold_hex(acc)}' then '{name}'")
    case = f"(case {' '.join(whens)} else '{names[-1]}' end)"
    return f"select *, {case} as split from {table_sql}"


def stratified_sample_by_hash(df: DataFrame, key_col: str, strata_col: str,
                              rates: dict[str, float],
                              default_rate: float = 0.0,
                              seed: int = 42) -> DataFrame:
    """Per-stratum deterministic sampling (language/quality-balanced
    corpora): each stratum gets its own keep rate; strata not listed get
    ``default_rate``. Same layout-independent hash decision as
    ``sample_by_hash`` — one scan, no shuffle."""
    h = _hash_prefix_expr(F.col(key_col), seed)
    bound = F.lit(_threshold_hex(default_rate))
    for name, rate in rates.items():
        bound = F.when(F.col(strata_col) == name,
                       F.lit(_threshold_hex(rate))).otherwise(bound)
    return df.filter(h < bound)


def stratified_sample_by_hash_sql(table_sql: str, key_col: str,
                                  strata_col: str, rates: dict[str, float],
                                  default_rate: float = 0.0,
                                  seed: int = 42) -> str:
    h = _hash_prefix_sql(key_col, seed)
    whens = " ".join(
        f"when {strata_col} = '{n}' then '{_threshold_hex(r)}'"
        for n, r in rates.items()
    )
    case = f"(case {whens} else '{_threshold_hex(default_rate)}' end)"
    return f"select * from {table_sql} where {h} < {case}"


def cap_per_key(df: DataFrame, key_col: str, n: int,
                order_col: str) -> DataFrame:
    """At most ``n`` rows per key, keeping the first by ``order_col``
    (host caps: bound any single domain's contribution to the corpus).

    One shuffle on the key; the per-key sort is the cost — for a
    pathologically hot key, pre-filter with ``sample_by_hash`` scoped to
    that key before the exact cap (the window must see all survivors).
    """
    w = Window.partitionBy(key_col).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n)
        .drop("_rk")
    )


def cap_per_key_sql(table_sql: str, key_col: str, n: int, order_col: str) -> str:
    return (
        f"select * exclude (_rk) from (select *, row_number() over "
        f"(partition by {key_col} order by {order_col} asc) as _rk "
        f"from {table_sql}) where _rk <= {n}"
    )


def take_by_token_budget(df: DataFrame, key_col: str, strata_col: str,
                         token_col: str, budgets: dict[str, int],
                         seed: int = 11) -> DataFrame:
    """Data mixing: fill each stratum's TOKEN budget deterministically.

    Training mixes are specified in tokens per source/language ("100B
    en, 30B de, …"), not row rates — this operator keeps, per stratum,
    the hash-ordered prefix of rows whose running token total stays
    within the stratum's budget. Hash order (portable md5 prefix of the
    key, same convention as sample_by_hash) makes the selection
    layout-independent and stable across reruns; strata without a
    budget keep nothing.

    Adds ``cum_tokens`` (running total including the row) and
    ``keep_mix``. One shuffle on the stratum + a per-stratum sort (the
    window). At 10^12 rows with few strata that sort is the cost: the
    scale path is a two-pass approximation — aggregate per-stratum
    token totals, convert budgets to rates, ``stratified_sample_by_
    hash``, then (optionally) this exact operator on the ~budget-sized
    survivor set to trim the overshoot."""
    h = _hash_prefix_expr(F.col(key_col), seed)
    mapping = F.create_map(*[F.lit(x) for kv in budgets.items() for x in kv])
    w = (
        Window.partitionBy(strata_col)
        .orderBy(h.asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col).cast("long")).over(w)
    return (
        df.withColumn("cum_tokens", cum)
        .withColumn(
            "keep_mix",
            F.coalesce(F.col("cum_tokens") <= mapping[F.col(strata_col)],
                       F.lit(False)),
        )
    )


def take_by_token_budget_sql(table_sql: str, key_col: str, strata_col: str,
                             token_col: str, budgets: dict[str, int],
                             seed: int = 11) -> str:
    cases = " ".join(
        f"when '{s}' then {b}" for s, b in budgets.items()
    )
    budget = f"(case {strata_col} {cases} else null end)"
    # cast: DuckDB sum(BIGINT) -> HUGEINT; the driver's value hash is
    # type-sensitive (repo invariant — see pivots.py)
    cum = (
        f"cast(sum(cast({token_col} as bigint)) over (partition by {strata_col} "
        f"order by {_hash_prefix_sql(key_col, seed)} asc, {key_col} asc "
        f"rows between unbounded preceding and current row) as bigint)"
    )
    return (
        f"select * , coalesce(cum_tokens <= {budget}, false) as keep_mix "
        f"from (select *, {cum} as cum_tokens from {table_sql})"
    )


def shuffle_hash_expr(key: Column, seed: int) -> Column:
    """Full md5 hex of key:seed — the shuffle-order key (same decision-
    hash convention as the samplers, full width so order ties are
    astronomically unlikely before the key tiebreak)."""
    return F.md5(F.concat(key.cast("string"), F.lit(f":{seed}")))


def shard_expr(h: Column, n_shards: int) -> Column:
    """Shard id from a shuffle hash: int(hex[:12]) mod n — a pure
    codegen projection shared by ``global_shuffle`` and the
    order-only shard writer (sources/sinks.py)."""
    return (F.conv(F.substring(h, 1, 12), 16, 10).cast("bigint")
            % n_shards).cast("int")


def global_shuffle(df: DataFrame, key_col: str, n_shards: int,
                   seed: int = 17, with_pos: bool = True) -> DataFrame:
    """Deterministic global shuffle + shard assignment — the final
    stage of training-data prep (training wants i.i.d. batch order;
    crawls arrive grouped by host/snapshot/time, and THAT correlation
    is what a plain partitioned write preserves).

    shard = int(md5(key:seed)[:12]) mod n_shards — a pure codegen
    projection, layout-independent and engine-portable like every
    decision hash in this module. ``with_pos`` adds the row's dense
    position within its shard (row_number ordered by the full hash,
    key-tiebroken): that is ONE exchange on shard + a per-shard
    external sort — exactly the cost any engine pays to materialize a
    shuffled order, and Spark's sort spills rather than OOMs. At scale
    pick n_shards >= cluster parallelism so each shard (corpus/n rows)
    fits a task's spill budget comfortably; md5 is uniform, so shards
    balance to +-O(sqrt) without salting. Writers that only need the
    ORDER (not the index) should skip with_pos and instead
    ``repartition(n, "shard").sortWithinPartitions("_h")`` — same
    exchange, no window dense-rank bookkeeping."""
    h = shuffle_hash_expr(F.col(key_col), seed)
    out = df.withColumn("_h", h).withColumn(
        "shard", shard_expr(F.col("_h"), n_shards))
    if with_pos:
        w = Window.partitionBy("shard").orderBy(
            F.col("_h").asc(), F.col(key_col).asc())
        out = out.withColumn(
            "pos", F.row_number().over(w).cast("bigint"))
    return out.drop("_h")


def global_shuffle_sql(table_sql: str, key_col: str, n_shards: int,
                       seed: int = 17) -> str:
    h = f"md5(cast({key_col} as varchar) || ':{seed}')"
    shard = (f"cast(('0x' || substr({h}, 1, 12))::bigint "
             f"% {n_shards} as int)")
    return (
        f"select * exclude (_h), cast(row_number() over "
        f"(partition by shard order by _h asc, {key_col} asc) "
        f"as bigint) as pos "
        f"from (select *, {h} as _h, {shard} as shard from {table_sql})"
    )


def train_char_lm(df: DataFrame, text_col: str,
                  oov_count: int = 1) -> DataFrame:
    """Byte-unigram LM training: (code, logprob) from corpus counts.

    The training counterpart of functions/perplexity.py's scorer:
    explode characters → ONE partial-aggregated groupBy over at most 256
    keys (the shuffle moves ≤256 rows per task) → add-one smoothing →
    log-probability. Non-ASCII folds into code 63 ('?'), matching the
    scorer's latin-1/'?' OOV bucket.
    """
    ch = F.explode(F.split(F.col(text_col), "")).alias("ch")
    codes = df.select(ch).filter(F.col("ch") != "").select(
        F.when(F.ascii("ch") < 256, F.ascii("ch")).otherwise(F.lit(63)).alias("code")
    )
    counts = codes.groupBy("code").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(
        F.sum("cnt").alias("_total"), F.count(F.lit(1)).alias("_vocab")
    )
    return counts.crossJoin(F.broadcast(total)).select(
        "code",
        F.round(
            F.log((F.col("cnt") + oov_count)
                  / (F.col("_total") + oov_count * F.col("_vocab"))),
            6,
        ).alias("logprob"),
    )


def train_char_lm_sql(table_sql: str, text_col: str, oov_count: int = 1) -> str:
    return (
        f"with codes as (select case when ascii(ch) < 256 then ascii(ch) "
        f"else 63 end as code from (select unnest(string_split({text_col}, '')) "
        f"as ch from {table_sql}) where ch != ''), "
        f"counts as (select code, count(*) as cnt from codes group by code), "
        f"tot as (select sum(cnt) as t, count(*) as v from counts) "
        f"select code, round(ln((cnt + {oov_count}) * 1.0 / (t + {oov_count} * v)), 6) "
        f"as logprob from counts, tot"
    )


# --- CCNet-style score bucketing (head / middle / tail) ---------------------

CCNET_LABELS = ("head", "middle", "tail")


def _bucket_labels(n_buckets: int, labels) -> list[str]:
    if labels is not None:
        assert len(labels) == n_buckets
        return list(labels)
    return list(CCNET_LABELS) if n_buckets == 3 else [
        str(i) for i in range(n_buckets)]


def score_buckets(df: DataFrame, score_col: str, id_col: str,
                  strata_col: str | None = None, n_buckets: int = 3,
                  labels=None) -> DataFrame:
    """CCNet-style equal-count quality buckets (Wenzek et al. 2020:
    per-language perplexity head/middle/tail): bucket index =
    floor(n · (rank−1) / count) within the stratum, rank ordered by
    (score asc, id asc) so ties are deterministic. Low score → 'head'
    (CCNet: low perplexity = closest to the LM's training domain).

    Exact-rank form — one partitioned sort window per stratum; the
    oracle profile. At 10^12 docs use bucket_by_thresholds with
    quantile thresholds estimated from a sample (the shape CCNet
    itself uses) — comparison tagging, no global sort."""
    part = [strata_col] if strata_col else []
    # NULLS LAST pinned on BOTH engines: Spark's bare asc sorts nulls
    # FIRST, DuckDB's sorts them LAST — an unpinned twin drifts on the
    # first null score (and a null score means unknown quality, which
    # belongs in the tail, not the head)
    wrank = Window.partitionBy(*part).orderBy(
        F.col(score_col).asc_nulls_last(), F.col(id_col).asc())
    wcnt = Window.partitionBy(*part)
    idx = F.floor(
        F.lit(n_buckets) * (F.row_number().over(wrank) - 1)
        / F.count(F.lit(1)).over(wcnt)
    ).cast("int")
    lab = _bucket_labels(n_buckets, labels)
    return df.withColumn(
        "bucket",
        F.element_at(F.array(*[F.lit(x) for x in lab]), idx + 1),
    )


def score_buckets_sql(table_sql: str, score_col: str, id_col: str,
                      strata_col: str | None = None, n_buckets: int = 3,
                      labels=None) -> str:
    lab = _bucket_labels(n_buckets, labels)
    arr = "[" + ", ".join(f"'{x}'" for x in lab) + "]"
    part = f"partition by {strata_col} " if strata_col else ""
    return (
        f"select *, ({arr})[cast(floor({n_buckets} * "
        f"(row_number() over ({part}order by {score_col} asc nulls last, "
        f"{id_col} asc)"
        f" - 1) / (count(*) over ({part.rstrip() or ''}))) as int) + 1] "
        f"as bucket from {table_sql}"
    )


def bucket_by_thresholds(df: DataFrame, score_col: str,
                         thresholds: list[float], labels=None) -> DataFrame:
    """Production bucketing: tag by comparison against precomputed
    ascending quantile thresholds (len(labels) == len(thresholds)+1;
    estimate thresholds with df.approxQuantile on a sample — CCNet's
    own shape). Pure per-row comparisons: no shuffle, no sort."""
    lab = _bucket_labels(len(thresholds) + 1, labels)
    expr = F.lit(lab[-1])
    for t, name in zip(reversed(thresholds), reversed(lab[:-1])):
        expr = F.when(F.col(score_col) <= t, F.lit(name)).otherwise(expr)
    return df.withColumn("bucket", expr)
