"""Continuous-aggregate tier cascade: 1m → 1h → 1d → 30d.

Each tier aggregates the PREVIOUS tier's output (sums of sums, counts of
counts) — never the raw pages, and never averages of averages: avg page size
is derived at read time as bytes_sum / doc_count (SURVEY.md §2.4 note).

Scale: the 1m tier is already ≤ |hosts| × |minutes| × |langs| rows — orders of
magnitude smaller than the pages table — so cascade shuffles are cheap. Salting
is unnecessary here (the heavy skew was absorbed by series.salted_agg); the
groupBy still gets Spark's map-side partial aggregation for free.

Reference analog: the max-normalization + weight-blend pipeline computed once
at import, not per query (/root/reference/src/utils.rs:58-72,
src/stops.rs:72-88 — the "materialize early" principle, SURVEY.md §4 P14).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .series import TIER_ORDER, bucket_col


def rollup(prev_tier: DataFrame, tier: str) -> DataFrame:
    """One cascade step: re-bucket the previous tier and re-aggregate."""
    return (
        prev_tier.select(
            "host",
            bucket_col("bucket_ts", tier).alias("bucket_ts"),
            "lang",
            "doc_count",
            "bytes_sum",
        )
        .groupBy("host", "bucket_ts", "lang")
        .agg(
            F.sum("doc_count").alias("doc_count"),
            F.sum("bytes_sum").alias("bytes_sum"),
        )
    )


def cascade(base_1m: DataFrame) -> dict[str, DataFrame]:
    """All tiers from the base series: {'1m': df, '1h': df, '1d': df, '30d': df}."""
    tiers = {"1m": base_1m}
    for prev, cur in zip(TIER_ORDER, TIER_ORDER[1:]):
        tiers[cur] = rollup(tiers[prev], cur)
    return tiers


def with_avg_page_size(tier_df: DataFrame) -> DataFrame:
    """Read-time derived metric (never stored, never re-averaged)."""
    return tier_df.withColumn(
        "avg_page_size", F.col("bytes_sum") / F.col("doc_count")
    )


def host_series(tier_df: DataFrame) -> DataFrame:
    """Host-level series (summed across langs) — gap-fill input."""
    return tier_df.groupBy("host", "bucket_ts").agg(
        F.sum("doc_count").alias("doc_count"),
        F.sum("bytes_sum").alias("bytes_sum"),
    )
