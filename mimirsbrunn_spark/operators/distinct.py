"""Distinct-count continuous aggregates — the classic NOT-trivially-mergeable
metric (distinct urls per host per bucket). Reference analog: the admin/street
dedup counts the reference recomputes per import batch
(/root/reference/libs/mimir/src/utils.rs dedup passes); TimescaleDB ships the
same capability as the ``hyperloglog``/``approx_count_distinct`` hyperfunction
family rolled up through continuous aggregates.

Two modes, same output shape:

- ``distinct_rollup`` (exact): per (keys, bucket) ``count_distinct`` — correct
  at any scale but NOT mergeable: a 1d count cannot be derived from 1h counts,
  so each tier must re-aggregate the raw item column (full shuffle of raw data
  per tier). The DuckDB-oracle-able twin.
- ``sketch_rollup`` / ``sketch_cascade`` (mergeable): per (keys, bucket)
  Datasketches HLL sketch (``hll_sketch_agg``, JVM-side, whole-stage codegen)
  stored as a binary column in the tier table. Parent tiers MERGE child
  sketches (``hll_union_agg``) — the raw data is touched exactly once at the
  finest tier, after which every coarser tier is sketch-bytes arithmetic, the
  same single-touch property the numeric tier cascade has. With identical lgK
  the union is register-lossless (per-register max), so a merged sketch holds
  the SAME state a direct build would — but Datasketches estimates a
  direct-built sketch with the HIP estimator and a unioned one with the
  composite estimator, so the two ESTIMATES can differ by a sub-percent
  amount once the sketch leaves exact coupon mode; merge ORDER (which
  varies with parallelism) can likewise shift an estimate by ±1-2 at
  mode-promotion boundaries. The tests pin exact equality in coupon range
  and agreement within the estimator error beyond; cross-parallelism runs
  compare within the sketch RSE (test_spark_submit).

At 100 TB: sketches are ≤ 2^lgK bytes per series-bucket regardless of
cardinality; the cascade shuffles only (keys, bucket, sketch) rows. The exact
mode exists for backfill verification at small scale and as the oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..series import TIER_SECONDS


def _bucket_ts(tier: str):
    sec = TIER_SECONDS[tier]
    return F.timestamp_seconds(
        (F.unix_timestamp("bucket_ts") / sec).cast("long") * sec
    ).alias("bucket_ts")


def distinct_rollup(
    df: DataFrame,
    tier: str,
    by: tuple[str, ...] = ("host",),
    item_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Exact distinct items per (keys, tier bucket) from raw rows. Output:
    (*by, bucket_ts, distinct_count). One shuffle of (keys, bucket, item)."""
    sec = TIER_SECONDS[tier]
    bucket = F.timestamp_seconds(
        (F.unix_timestamp(ts_col) / sec).cast("long") * sec
    ).alias("bucket_ts")
    return (
        df.select(*by, bucket, F.col(item_col).alias("_it"))
        .groupBy(*by, "bucket_ts")
        .agg(F.count_distinct("_it").alias("distinct_count"))
    )


def sketch_rollup(
    df: DataFrame,
    tier: str,
    by: tuple[str, ...] = ("host",),
    item_col: str = "url",
    ts_col: str = "warc_ts",
    lgk: int = 12,
) -> DataFrame:
    """HLL sketch of distinct items per (keys, tier bucket) — the single
    raw-data touch of the sketch cascade. Output: (*by, bucket_ts,
    url_sketch binary, distinct_est long)."""
    sec = TIER_SECONDS[tier]
    bucket = F.timestamp_seconds(
        (F.unix_timestamp(ts_col) / sec).cast("long") * sec
    ).alias("bucket_ts")
    return (
        df.select(*by, bucket, F.col(item_col).alias("_it"))
        .groupBy(*by, "bucket_ts")
        .agg(F.hll_sketch_agg("_it", F.lit(lgk)).alias("url_sketch"))
        .withColumn(
            "distinct_est", F.hll_sketch_estimate("url_sketch").cast("long")
        )
    )


def sketch_cascade(
    sketch_tier_df: DataFrame,
    parent_tier: str,
    by: tuple[str, ...] = ("host",),
) -> DataFrame:
    """Parent tier from a child SKETCH tier by merging sketches — no raw
    data. Same schema as ``sketch_rollup``; with equal lgK the merged
    registers equal a direct parent build's (union is lossless), estimates
    agree within the HIP-vs-composite estimator gap (≪ the sketch's RSE)."""
    return (
        sketch_tier_df.groupBy(*by, _bucket_ts(parent_tier))
        .agg(F.hll_union_agg("url_sketch").alias("url_sketch"))
        .withColumn(
            "distinct_est", F.hll_sketch_estimate("url_sketch").cast("long")
        )
    )
