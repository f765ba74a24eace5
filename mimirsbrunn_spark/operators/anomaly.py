"""Batch anomaly detection + seasonal forecasting over series tables —
window math only, one shuffle on the series key for each (the same
hyperfunction family as counters.py; streaming twin:
streaming.stateful anomaly op).

- ``zscore_anomaly``: trailing-window z-score. Each point is compared to
  the mean/std of the PRIOR ``window_n`` points (strictly before it, so a
  spike never suppresses its own detection). Sums/sumsq stay exact longs
  for integer metrics (doc_count-scale values; for byte-scale metrics pass
  ``exact=False`` to sum doubles — v² of a 2³¹ value overflows a long sum
  under ANSI); mean/std/z are derived as one deterministic double
  expression so a DuckDB oracle reproduces them to far beyond the 6-dp
  rounding the gate compares.
- ``forecast_seasonal_naive``: the classic seasonal-naive forecast —
  the next ``horizon_n`` buckets repeat the value one season earlier.
  Implemented spine-free: historical rows are SHIFTED forward one season
  and filtered to the (max_ts, max_ts + horizon] window per key — no join
  against a generated spine, one window pass for the per-key max.

At 100 TB both are a single Exchange on (keys); frames are bounded
(window_n rows / one season), so a hot series costs O(points in range),
never O(doc count) — raw-data skew was absorbed by series.salted_agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def zscore_anomaly(
    series: DataFrame,
    keys: tuple[str, ...] = ("host",),
    ts_col: str = "bucket_ts",
    value_col: str = "doc_count",
    window_n: int = 24,
    threshold: float = 3.0,
    min_points: int = 8,
    exact: bool = True,
) -> DataFrame:
    """Output: (*keys, ts_col, value, zscore, is_anomaly). ``zscore`` is
    NULL (and is_anomaly false) while the trailing window holds fewer than
    ``min_points`` points or has zero variance."""
    w = Window.partitionBy(*keys).orderBy(ts_col).rowsBetween(-window_n, -1)
    v = F.col(value_col).cast("long" if exact else "double")
    n = F.count(value_col).over(w).cast("double")
    s = F.sum(v).over(w).cast("double")
    ss = F.sum(v * v).over(w).cast("double")
    mean = s / n
    # clamp: float error can push a zero variance a hair negative, and
    # sqrt(negative) is NaN in Spark but an error in some engines; operands
    # are non-null whenever the n >= min_points guard passes, so greatest()
    # is cross-engine safe here
    var = F.greatest((ss - s * s / n) / n, F.lit(0.0))
    std = F.sqrt(var)
    z = F.when(
        (F.count(value_col).over(w) >= min_points) & (std > 0),
        (F.col(value_col).cast("double") - mean) / std,
    )
    return series.select(
        *keys,
        ts_col,
        F.col(value_col).alias("value"),
        z.alias("zscore"),
        F.coalesce(F.abs(z) > F.lit(threshold), F.lit(False)).alias("is_anomaly"),
    )


def forecast_seasonal_naive(
    series: DataFrame,
    keys: tuple[str, ...] = ("host",),
    ts_col: str = "bucket_ts",
    value_col: str = "doc_count",
    step_sec: int = 3600,
    season_n: int = 24,
    horizon_n: int = 24,
    anchor_ts: int | None = None,
) -> DataFrame:
    """Forecast the next ``horizon_n`` buckets per key by repeating the
    value one season (``season_n`` buckets) earlier. ``horizon_n`` must be
    ≤ ``season_n`` (one season of history projects one season forward;
    longer horizons would need iterated application). Buckets missing in
    the source season are missing in the forecast (compose with
    gapfill.gapfill first for a dense forecast).

    ``anchor_ts``: forecast forward from this fixed bucket for EVERY key
    (the "what happens after the table end" serving semantic — exactly
    partition-prunable, used by query_api.read_forecast). Default: each
    key forecasts from its own last observed bucket (window max).
    Output: (*keys, ts_sec long, predicted)."""
    if horizon_n > season_n:
        raise ValueError("horizon_n must be <= season_n (seasonal-naive)")
    sec = F.col(ts_col).cast("long")
    if anchor_ts is not None:
        anchor = F.lit(int(anchor_ts))
        shifted = series.select(
            *keys,
            (sec + season_n * step_sec).alias("ts_sec"),
            F.col(value_col).alias("predicted"),
        )
        return shifted.filter(
            (F.col("ts_sec") > anchor)
            & (F.col("ts_sec") <= anchor + horizon_n * step_sec)
        )
    wmax = Window.partitionBy(*keys)
    shifted = series.select(
        *keys,
        (sec + season_n * step_sec).alias("ts_sec"),
        F.col(value_col).alias("predicted"),
        F.max(sec).over(wmax).alias("_max_ts"),
    )
    return shifted.filter(
        (F.col("ts_sec") > F.col("_max_ts"))
        & (F.col("ts_sec") <= F.col("_max_ts") + horizon_n * step_sec)
    ).drop("_max_ts")


def seasonal_zscore(
    series: DataFrame,
    keys: tuple[str, ...] = ("host",),
    ts_col: str = "bucket_sec",
    value_col: str = "doc_count",
    season_sec: int = 86400,
    threshold: float = 3.0,
    min_points: int = 4,
) -> DataFrame:
    """Seasonal-profile z-score: each point is compared to the OTHER points
    of the same phase-of-season for its key (leave-one-out, so a single
    spike never suppresses its own detection) — "is 14:00 today unusual
    for 14:00 on this host". ``phase = ts % season_sec`` (pass hourly
    buckets with season_sec=86400 for an hour-of-day profile).

    Exactness: per-(key, phase) n/S/SS are exact BIGINT window sums; the
    leave-one-out mean/var/z are one deterministic double expression
    (identical operand order to the DuckDB twin):
        m  = (S - x) / n1
        var = max(((SS - x*x) - (S - x)*(S - x)/n1) / n1, 0)
    so a gate comparison at 6 decimals is safe. Values must be integer
    doc-count scale (SS is a long sum — byte-scale values overflow it).

    A point whose LOO window has ZERO variance but differs from its (then
    exact) mean is flagged anomalous with ``zscore`` NULL — the classic LOO
    blind spot (a lone spike against a constant profile excludes itself
    from its own window) would otherwise suppress exactly the clearest
    anomalies. The flat-window var/mean are exactly representable doubles
    (integer sums < 2^53), so the std = 0 / x <> m tests are cross-engine
    exact.

    One Exchange on (*keys, phase); frames are whole-partition but a
    partition holds only the same-phase buckets of one key's retention
    window (e.g. 30 rows for 30 d of daily phases) — O(tier length).
    Output: (*keys, ts, phase, value, zscore, is_anomaly)."""
    phase = (F.col(ts_col).cast("long") % F.lit(int(season_sec))).alias("phase")
    base = series.select(*keys, F.col(ts_col), phase, F.col(value_col).alias("value"))
    w = Window.partitionBy(*keys, "phase")
    x = F.col("value").cast("long")
    n = F.count("value").over(w)
    s = F.sum(x).over(w)
    ss = F.sum(x * x).over(w)
    n1 = (n - F.lit(1)).cast("double")
    sx = (s - x).cast("double")
    m = sx / n1
    var = F.greatest(
        ((ss - x * x).cast("double") - sx * sx / n1) / n1, F.lit(0.0)
    )
    std = F.sqrt(var)
    guard = (n - F.lit(1)) >= F.lit(int(min_points))
    z = F.when(guard & (std > 0), (x.cast("double") - m) / std)
    flat_out = guard & (std == F.lit(0.0)) & (x.cast("double") != m)
    return base.select(
        *keys,
        ts_col,
        "phase",
        "value",
        z.alias("zscore"),
        (
            F.coalesce(F.abs(z) > F.lit(float(threshold)), F.lit(False))
            | flat_out
        ).alias("is_anomaly"),
    )


def mad_zscore(
    series: DataFrame,
    keys: tuple[str, ...] = ("host",),
    ts_col: str = "bucket_sec",
    value_col: str = "doc_count",
    threshold: float = 3.5,
    min_points: int = 8,
    scale: float = 0.6745,
) -> DataFrame:
    """Robust (median/MAD) z-score per series key — the outlier detector
    that survives what breaks ``zscore_anomaly`` on web-traffic series:
    heavy-tailed values, where one crawl burst inflates the mean AND the
    std enough to mask every other anomaly. Median and MAD have a 50%
    breakdown point; z = scale * (x - median) / MAD with the conventional
    0.6745 consistency factor (MAD/0.6745 estimates sigma for a normal),
    flagged at the classic |z| > 3.5.

    Exactness (the reason this does NOT use percentile/median built-ins):
    both medians are computed by RANK math — row_number over the ordered
    partition picks the two middle rows, median = avg of those ≤2 values —
    so there is no interpolation semantic to diverge across engines. For
    integer inputs every intermediate is an exactly-representable double
    (a long, or the midpoint of two longs; |x - med| is then a multiple of
    0.5), and ties in the sort cannot change WHICH VALUE sits at a given
    rank, only which row carries it — the median is tie-invariant. A gate
    comparison at 6 decimals is safe.

    A key whose MAD is zero (>50% of points equal the median — e.g. a
    mostly-idle host) gets the flat-profile clause: a point differing from
    the median is anomalous with ``zscore`` NULL, mirroring
    ``seasonal_zscore``'s blind-spot handling.

    Scale shape: ONE Exchange on (*keys); the two ranked passes are extra
    sorts riding the same partitioning, frames are whole-partition over
    one key's tier window (O(series length), never O(doc count)).
    Output: (*keys, ts, value, median, mad, zscore, is_anomaly)."""
    x = F.col(value_col).cast("long")
    base = series.select(*keys, F.col(ts_col), x.alias("value"))
    whole = Window.partitionBy(*keys)
    n = F.count("value").over(whole)
    rn1 = F.row_number().over(
        Window.partitionBy(*keys).orderBy("value", ts_col)
    )
    mid1 = F.expr("(_n + 1) DIV 2")  # middle ranks via true integer floor
    mid2 = F.expr("(_n + 2) DIV 2")
    staged = base.select("*", n.alias("_n"), rn1.alias("_rn1"))
    med = F.avg(
        F.when(
            (F.col("_rn1") == mid1) | (F.col("_rn1") == mid2),
            F.col("value").cast("double"),
        )
    ).over(whole)
    with_med = staged.select("*", med.alias("median"))
    d = F.abs(F.col("value").cast("double") - F.col("median"))
    rn2 = F.row_number().over(
        Window.partitionBy(*keys).orderBy(d.asc(), F.col(ts_col))
    )
    staged2 = with_med.select("*", d.alias("_d"), rn2.alias("_rn2"))
    mad = F.avg(
        F.when(
            (F.col("_rn2") == mid1) | (F.col("_rn2") == mid2), F.col("_d")
        )
    ).over(whole)
    out = staged2.select("*", mad.alias("mad"))
    guard = F.col("_n") >= F.lit(int(min_points))
    z = F.when(
        guard & (F.col("mad") > 0),
        F.lit(float(scale))
        * (F.col("value").cast("double") - F.col("median"))
        / F.col("mad"),
    )
    flat_out = (
        guard
        & (F.col("mad") == F.lit(0.0))
        & (F.col("value").cast("double") != F.col("median"))
    )
    return out.select(
        *keys,
        ts_col,
        "value",
        "median",
        "mad",
        z.alias("zscore"),
        (
            F.coalesce(F.abs(z) > F.lit(float(threshold)), F.lit(False))
            | flat_out
        ).alias("is_anomaly"),
    )
