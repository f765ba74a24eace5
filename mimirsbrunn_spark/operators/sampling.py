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
