"""Deterministic stratified sampling — seeded hash-based per-stratum rate
sampling for corpus mixing (the "sample 10% of en, 100% of low-resource
langs" stage every training-data pipeline runs before tokenization).

Determinism discipline: the keep decision for a row is a pure function of
(key, seed) — ``hash(key ':' seed) mod 1_000_000 < rate * 1_000_000`` — so
the sample is exactly reproducible across runs, engines and partitionings
(no ``DataFrame.sample``, whose Bernoulli draw depends on partition layout
and Spark's RNG stream). Re-running with the same seed on a grown corpus
keeps every previously-kept row (hash-stable incremental sampling).

Scale shape: the rates table is stratum-small → **broadcast** join; the
keep decision is one hash + one comparison per row (JVM codegen, no
shuffle); the metrics pass is one groupBy per side. With
``hasher="md5_60"`` the decision is bit-identical in DuckDB
(``(('0x' || substr(md5(k),1,15))::BIGINT) % 1000000``), which is what the
``stratified_sample`` driver gate pins; production uses ``xxhash64``.

Reference analog: the reference's admin-weight blending assigns per-class
inclusion weights at import (SURVEY.md §2 A5/A6); here the per-stratum
rate plays that role for corpus composition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import dedup

_SCALE = 1_000_000


def sample_bucket(key_col, seed: int = 0, hasher: str = "xxhash64") -> Column:
    """Uniform bucket in [0, 1_000_000) from (key, seed) — the pure
    function behind every keep decision."""
    k = F.concat(key_col.cast("string"), F.lit(f":{int(seed)}"))
    return F.pmod(dedup.hash_col(k, hasher), F.lit(_SCALE))


def stratified_sample(
    df: DataFrame,
    rates: DataFrame,
    strata: tuple[str, ...] = ("lang",),
    key_col: str = "doc_id",
    seed: int = 0,
    hasher: str = "xxhash64",
    rate_col: str = "rate",
) -> DataFrame:
    """Keep each row iff its seeded hash bucket falls under its stratum's
    rate. ``rates``: one row per stratum (strata columns + ``rate_col`` in
    [0, 1]). Strata absent from ``rates`` are dropped entirely (rate 0) —
    an explicit allowlist, the safe default for corpus mixing."""
    thr = (F.col(rate_col) * _SCALE).cast("long").alias("_thr")
    r = F.broadcast(rates.select(*strata, thr))
    bucket = sample_bucket(F.col(key_col), seed=seed, hasher=hasher)
    return (
        df.join(r, list(strata), "left")
        .where(bucket < F.coalesce(F.col("_thr"), F.lit(0)))
        .drop("_thr")
    )


def sample_metrics(
    df: DataFrame,
    sampled: DataFrame,
    strata: tuple[str, ...] = ("lang",),
) -> DataFrame:
    """Per-stratum achieved-rate report: (strata..., n_total, n_kept,
    achieved_rate). One groupBy per side; achieved_rate is a single float
    division over exact counts."""
    tot = df.groupBy(*strata).agg(F.count(F.lit(1)).alias("n_total"))
    kept = sampled.groupBy(*strata).agg(F.count(F.lit(1)).alias("n_kept"))
    j = tot.join(kept, list(strata), "left")
    n_kept = F.coalesce(F.col("n_kept"), F.lit(0))
    return j.select(
        *strata,
        "n_total",
        n_kept.alias("n_kept"),
        (n_kept.cast("double") / F.col("n_total").cast("double")).alias(
            "achieved_rate"
        ),
    )


def pps_systematic_sample(
    df: DataFrame,
    weight_col: str,
    n_per_stratum: int,
    strata: tuple[str, ...] = ("lang",),
    key_col: str = "doc_id",
    seed: int = 0,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Systematic probability-proportional-to-size sampling: per stratum,
    exactly ``n_per_stratum`` picks distributed over the rows with
    probability proportional to integer ``weight_col`` (e.g. byte or token
    counts — "sample 1M documents proportional to token count" for corpus
    mixing where long documents should be drawn more often).

    Mechanics (all INTEGER arithmetic — exactly reproducible across runs,
    engines and partitionings, same discipline as ``stratified_sample``):
    rows are ordered by their seeded hash bucket (a deterministic shuffle,
    key as tiebreak), cum_i = running weight sum, W = stratum total, and
    row i receives ``n_picks = floor(cum_i*n/W) - floor(cum_{i-1}*n/W)``
    (>= 1 means selected; a row heavier than W/n can carry several picks —
    kept once with its multiplicity). The per-stratum pick count sums to
    exactly n by telescoping. Rows with weight <= 0 are excluded.

    Bounds: cum*n must fit in a signed 64-bit (W * n < 2^63) — holds for
    any per-stratum slice a sampling job would take in one pass; under
    ANSI mode an overflow fails loudly rather than sampling wrong.

    Scale shape: ONE Exchange on the strata columns (running-sum window +
    the same-keyed total), no joins, no collect. Output: the selected rows
    + ``n_picks``."""
    n = int(n_per_stratum)
    if n <= 0:
        raise ValueError(f"n_per_stratum must be > 0, got {n_per_stratum}")
    from pyspark.sql import Window

    w = F.col(weight_col).cast("long")
    bucket = sample_bucket(F.col(key_col), seed=seed, hasher=hasher)
    base = df.filter(w > 0).withColumn("_bucket", bucket)
    order = Window.partitionBy(*strata).orderBy(
        "_bucket", F.col(key_col).cast("string")
    )
    whole = Window.partitionBy(*strata)
    cum = F.sum(w).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = F.sum(w).over(whole)
    # integer division (DIV), not `/`: long / long is DOUBLE in Spark and
    # loses exactness past 2^53 — the floor must be true integer floor
    staged = base.select(
        "*",
        (cum * F.lit(n)).alias("_cumn"),
        (w * F.lit(n)).alias("_wn"),
        tot.alias("_tot"),
    )
    picks = F.expr("_cumn DIV _tot") - F.expr("(_cumn - _wn) DIV _tot")
    out = staged.withColumn("n_picks", picks.cast("long")).drop(
        "_bucket", "_cumn", "_wn", "_tot"
    )
    return out.filter(F.col("n_picks") >= 1)
