"""Gap-fill: per-host dense bucket fill + locf + linear interpolation.

Semantics (pinned, shared with oracle/reference.py):
- coverage per (group, tier): every bucket from the group's first to last
  observed bucket on the tier grid;
- locf  = last observed non-null value at or before t;
- linear = for a missing bucket with anchors (t0,v0) ≤ t ≤ (t1,v1):
          v0 + (v1 − v0)·(t − t0)/(t1 − t0), float64 over epoch seconds;
- observed buckets: locf = linear = float64(actual), is_filled = false
  (an observed bucket with a NULL metric value counts as missing for that
  metric: filled from its neighbours like a gap bucket).

Shuffle shape (single-Exchange design): no spine is generated and nothing
is joined or unioned. One window pass over the OBSERVED rows (partitioned
by the series key, ordered by bucket) computes, per metric, the previous
and next non-null anchors; each observed row then *emits* the gap buckets
between its predecessor and itself via ``sequence`` + ``explode`` (narrow),
with locf/linear evaluated from the carried anchors. Total cost: ONE
Exchange and ONE sort of the observed rows in wide format — versus the
spine-union alternative, which shuffles and sorts ~2× the rows in long
format and needs a bounds aggregate besides.

Window-skew note (north rule): window functions cannot be salted without
changing semantics, but the window input here is the *rolled-up* host
series — bounded by the time range (≤ ~50k buckets/host/month at 1m), not
by the raw doc count — so a hot host costs the same window work as a cold
one. The raw-data skew was already absorbed by series.salted_agg. This is
the explicit design answer to host-key skew in window aggregates
(SURVEY.md §7.5 item 2).

Reference analog: the as-of/top-1 semantics of nearest-address reverse
geocode (/root/reference/libs/mimir/src/rubber.rs:513-547 — exp-decay then
top-1) → locf is the degenerate "most recent anchor wins" as-of join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .series import TIER_SECONDS


def gapfill(
    series_df: DataFrame,
    tier: str,
    metrics=("doc_count", "bytes_sum"),
    by: tuple[str, ...] = ("host",),
) -> DataFrame:
    """Long-format gap-filled series:
    *by, bucket_ts, metric, value_locf, value_linear, is_filled.

    One Exchange, one sort (see module docstring): anchors via a single
    Window over observed rows, gap buckets emitted by the row that closes
    each gap (``sequence(prev+step, cur−step)`` → explode), metrics
    stacked to long format by a second narrow explode.
    """
    step = TIER_SECONDS[tier]
    sec = F.col("bucket_ts").cast("long")

    w = Window.partitionBy(*by).orderBy("bucket_ts")
    # strictly-before frame: the observed row's own locf is
    # coalesce(value, last non-null BEFORE it) — identical to the
    # at-or-before anchor, and the same column doubles as the gap rows'
    # prev anchor (a gap bucket's "at or before" ends at the prior row).
    w_prev = w.rowsBetween(Window.unboundedPreceding, -1)
    w_next = w.rowsBetween(0, Window.unboundedFollowing)

    anchored = series_df.select(
        *by,
        "bucket_ts",
        *[F.col(m).cast("double").alias(m) for m in metrics],
    )
    for m in metrics:
        v = F.col(m)
        nn_sec = F.when(v.isNotNull(), sec.cast("double"))
        anchored = (
            anchored.withColumn(f"_pv_{m}", F.last(m, ignorenulls=True).over(w_prev))
            .withColumn(f"_pt_{m}", F.last(nn_sec, ignorenulls=True).over(w_prev))
            .withColumn(f"_nv_{m}", F.first(m, ignorenulls=True).over(w_next))
            .withColumn(f"_nt_{m}", F.first(nn_sec, ignorenulls=True).over(w_next))
        )
    anchored = anchored.withColumn("_lag_sec", F.lag(sec).over(w))

    # each observed row emits the gap buckets it closes, then itself
    gap_secs = F.when(
        F.col("_lag_sec").isNotNull() & (sec - F.col("_lag_sec") > step),
        F.sequence(F.col("_lag_sec") + step, sec - step, F.lit(step)),
    ).otherwise(F.array().cast("array<long>"))
    entries = F.concat(
        F.transform(
            gap_secs,
            lambda t: F.struct(t.alias("sec"), F.lit(True).alias("gap")),
        ),
        F.array(F.struct(sec.alias("sec"), F.lit(False).alias("gap"))),
    )
    e = anchored.withColumn("_e", F.explode(entries))

    t = F.col("_e.sec").cast("double")
    is_gap = F.col("_e.gap")
    metric_structs = []
    for m in metrics:
        v = F.col(m)
        pv, pt = F.col(f"_pv_{m}"), F.col(f"_pt_{m}")
        nv, nt = F.col(f"_nv_{m}"), F.col(f"_nt_{m}")
        interp = pv + (nv - pv) * ((t - pt) / (nt - pt))
        metric_structs.append(
            F.struct(
                F.lit(m).alias("metric"),
                F.when(is_gap | v.isNull(), pv).otherwise(v).alias("value_locf"),
                F.when(is_gap | v.isNull(), interp).otherwise(v).alias("value_linear"),
                (is_gap | v.isNull()).alias("is_filled"),
            )
        )

    return e.select(
        *by,
        F.timestamp_seconds("_e.sec").alias("bucket_ts"),
        F.explode(F.array(*metric_structs)).alias("_m"),
    ).select(
        *by,
        "bucket_ts",
        "_m.metric",
        "_m.value_locf",
        "_m.value_linear",
        "_m.is_filled",
    )
