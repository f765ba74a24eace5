"""Gap-fill: per-host time spine + locf + linear interpolation.

Semantics (pinned, shared with oracle/reference.py):
- spine per (host, tier): every bucket from the host's first to last observed
  bucket, generated with ``sequence()`` + ``explode`` (no driver loops);
- locf  = last observed value at or before t
          (``last(col, ignorenulls=True)`` over an unbounded-preceding window);
- linear = for a missing bucket with anchors (t0,v0) ≤ t ≤ (t1,v1):
          v0 + (v1 − v0)·(t − t0)/(t1 − t0), float64 over epoch seconds;
- observed buckets: locf = linear = float64(actual), is_filled = false.

Window-skew note (north rule): window functions cannot be salted without
changing semantics, but the window input here is the *rolled-up* host series —
bounded by the time range (≤ ~50k buckets/host/month at 1m), not by the raw
doc count — so a hot host costs the same window work as a cold one. The
raw-data skew was already absorbed by series.salted_agg. This is the explicit
design answer to host-key skew in window aggregates (SURVEY.md §7.5 item 2).

Reference analog: the as-of/top-1 semantics of nearest-address reverse geocode
(/root/reference/libs/mimir/src/rubber.rs:513-547 — exp-decay then top-1) →
locf is the degenerate "most recent anchor wins" as-of join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .series import TIER_SECONDS


def spine(series_df: DataFrame, tier: str, by: tuple[str, ...] = ("host",)) -> DataFrame:
    """Per-group dense bucket spine via sequence+explode. ``by`` is the
    series key — ("host",) for host-level series, ("host", "lang") for
    per-language series (the north star's per-language doc-count family)."""
    step = TIER_SECONDS[tier]
    bounds = series_df.groupBy(*by).agg(
        F.min("bucket_ts").alias("_min"), F.max("bucket_ts").alias("_max")
    )
    # bounds is one tiny row per group — without a repartition the whole
    # explode (up to ~50k buckets/group/month at 1m) would run in 1-2 tasks;
    # spreading groups first makes spine generation parallel.
    bounds = bounds.repartition(*[F.col(c) for c in by])
    return bounds.select(
        *by,
        F.explode(
            F.sequence(
                F.col("_min").cast("long"),
                F.col("_max").cast("long"),
                F.lit(step),
            )
        ).alias("bucket_sec"),
    ).select(*by, F.timestamp_seconds("bucket_sec").alias("bucket_ts"))


def gapfill(
    series_df: DataFrame,
    tier: str,
    metrics=("doc_count", "bytes_sum"),
    by: tuple[str, ...] = ("host",),
) -> DataFrame:
    """Long-format gap-filled series:
    *by, bucket_ts, metric, value_locf, value_linear, is_filled.

    Shuffle shape: the spine is NOT joined to the series (a join would
    shuffle the full stacked data once for the join keys and again for the
    window). Instead observed rows and null-valued spine rows are UNIONed
    (narrow) and deduplicated inside the same window sort that computes
    locf/linear — one Exchange of the stacked data total, plus the tiny
    bounds aggregate."""
    sp = spine(series_df, tier, by)

    # observed rows, long format: one row per (group, bucket, metric)
    obs = series_df.select(
        *by,
        "bucket_ts",
        F.expr(
            "stack({n}, {args})".format(
                n=len(metrics),
                args=", ".join(f"'{m}', cast({m} as double)" for m in metrics),
            )
        ).alias("metric", "value"),
        F.lit(1).alias("_obs"),
    )
    # spine rows: null value for every metric
    spn = sp.select(
        *by,
        "bucket_ts",
        F.explode(F.array(*[F.lit(m) for m in metrics])).alias("metric"),
        F.lit(None).cast("double").alias("value"),
        F.lit(0).alias("_obs"),
    )
    unioned = obs.unionByName(spn)

    # dedup: where a bucket has both an observed and a spine row, the spine
    # row (sorted after via _obs desc) sees its own bucket_ts as lag() and
    # drops — same partitioning as the fill windows, so no extra Exchange.
    w_dedup = Window.partitionBy(*by, "metric").orderBy(
        F.col("bucket_ts"), F.col("_obs").desc()
    )
    stacked = (
        unioned.withColumn("_dup", F.lag("bucket_ts").over(w_dedup) == F.col("bucket_ts"))
        .filter(~F.coalesce(F.col("_dup"), F.lit(False)))
        .drop("_dup", "_obs")
    )

    w = Window.partitionBy(*by, "metric").orderBy("bucket_ts")
    w_prev = w.rowsBetween(Window.unboundedPreceding, 0)
    w_next = w.rowsBetween(0, Window.unboundedFollowing)

    sec = F.col("bucket_ts").cast("double")
    prev_val = F.last("value", ignorenulls=True).over(w_prev)
    prev_ts = F.last(F.when(F.col("value").isNotNull(), sec), ignorenulls=True).over(w_prev)
    next_val = F.first("value", ignorenulls=True).over(w_next)
    next_ts = F.first(F.when(F.col("value").isNotNull(), sec), ignorenulls=True).over(w_next)

    linear = F.when(F.col("value").isNotNull(), F.col("value")).otherwise(
        prev_val + (next_val - prev_val) * ((sec - prev_ts) / (next_ts - prev_ts))
    )
    return stacked.select(
        *by,
        "bucket_ts",
        "metric",
        F.coalesce("value", prev_val).alias("value_locf"),
        linear.alias("value_linear"),
        F.col("value").isNull().alias("is_filled"),
    )
