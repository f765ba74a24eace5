"""Counter / gauge aggregates for irregular time series — the classic
timeseries-engine reads the rollup tiers don't directly answer:

- ``counter_rate``: per-key instantaneous rate of a monotonic counter with
  RESET detection (a counter that wraps or restarts yields delta < 0; the
  post-reset value itself is the delta, the standard Prometheus/Timescale
  ``rate``/``counter_agg`` convention).
- ``counter_increase``: reset-aware total increase per fixed time bucket
  (Prometheus ``increase`` / Timescale ``counter_agg -> delta`` rolled up);
  each sample's delta attributes to the bucket of the LATER sample.
- ``time_weighted_avg``: locf time-weighted mean over a query window
  [t0, t1) — each observation weighted by how long it was the latest value,
  segments clipped to the window (TimescaleDB ``time_weight('locf')``).
- ``state_durations``: seconds spent in each locf state over [t0, t1)
  (TimescaleDB ``state_agg``/``duration_in``), same clipped-segment math
  grouped by the state value.
- ``ohlc``: per-bucket open/high/low/close (TimescaleDB ``candlestick_agg``)
  via argmin/argmax — requires unique timestamps within a key (true for the
  engine's series tables, one row per (key, bucket)).
- ``heartbeat_uptime``: covered seconds of the union of [ts, ts+ttl)
  liveness intervals per key (TimescaleDB ``heartbeat_agg`` → uptime) — the
  interval-union length computed with a running-max window, no merge loop.

All are pure window/aggregate math over the engine's series tables (no
UDFs, whole-stage codegen end to end) and shuffle once on the series key —
the same partitioning every other per-host window op in this engine uses,
so at 100 TB they ride the tiers' existing layout.

Cross-engine float rule (gate.py docstring): inputs stay integral; the only
float op is one final division of two exact integers per output row —
IEEE-deterministic, safe to value-hash against DuckDB.

Reference analog: the reference's read path serves max-normalized weights
and decayed scores computed at query time (libs/mimir/src/rubber.rs scoring
reads); rate/time-weight are the timeseries-tier counterparts of those
derived read-time metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def counter_rate(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts_sec",
    value_col: str = "counter",
) -> DataFrame:
    """(keys, ts, rate, is_reset) per input row. ``rate`` is
    delta/seconds-since-previous-sample within the key, NULL for the key's
    first sample and for duplicate timestamps (dt=0). A negative delta is a
    counter reset: the post-reset sample counts from 0, so delta = value.

    One shuffle (window on key_cols); integer lag math + one division.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    prev_v = F.lag(value_col).over(w)
    prev_t = F.lag(ts_col).over(w)
    delta = F.when(F.col(value_col) >= prev_v, F.col(value_col) - prev_v).otherwise(
        F.col(value_col)
    )
    dt = F.col(ts_col) - prev_t
    rate = delta.cast("double") / F.nullif(dt, F.lit(0)).cast("double")
    return df.select(
        *key_cols,
        F.col(ts_col),
        rate.alias("rate"),
        F.coalesce(F.col(value_col) < prev_v, F.lit(False)).alias("is_reset"),
    )


def time_weighted_avg(
    df: DataFrame,
    key_cols: list[str],
    t0: int,
    t1: int,
    ts_col: str = "ts_sec",
    value_col: str = "value",
) -> DataFrame:
    """One row per key: the locf time-weighted mean of ``value_col`` over
    [t0, t1). Each sample holds (locf) until the next sample or t1; segments
    are clipped to the window; samples at/after t1 contribute nothing; a
    sample before t0 anchors the window's left edge (its segment is clipped
    to start at t0). Keys with zero covered seconds are omitted.

    Output: (keys, twa, covered_sec) where twa = Σ value·seconds / Σ seconds
    — both sums exact integers, one final division.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    seg_end = F.least(F.coalesce(F.lead(ts_col).over(w), F.lit(t1)), F.lit(t1))
    seg_start = F.greatest(F.col(ts_col), F.lit(t0))
    # a pre-window sample anchors [t0, next); a segment entirely outside the
    # window clamps to 0 (seg_end <= seg_start)
    weight = F.greatest(seg_end - seg_start, F.lit(0))
    segs = df.select(
        *key_cols,
        (F.col(value_col).cast("long") * weight.cast("long")).alias("_vw"),
        weight.cast("long").alias("_w"),
    )
    out = (
        segs.groupBy(*key_cols)
        .agg(F.sum("_vw").alias("_svw"), F.sum("_w").alias("covered_sec"))
        .filter(F.col("covered_sec") > 0)
    )
    return out.select(
        *key_cols,
        (F.col("_svw").cast("double") / F.col("covered_sec").cast("double")).alias("twa"),
        "covered_sec",
    )


def counter_increase(
    df: DataFrame,
    key_cols: list[str],
    bucket_sec: int,
    ts_col: str = "ts_sec",
    value_col: str = "counter",
) -> DataFrame:
    """Reset-aware total counter increase per ``bucket_sec`` bucket:
    each sample's delta vs the key's previous sample (post-reset value
    itself on reset, as in ``counter_rate``) attributed to the bucket of
    the LATER sample; the key's first sample contributes nothing. Output:
    (keys, bucket_sec aligned ts ``bucket_ts_sec``, increase, n_resets).

    Two shuffles sharing the key prefix (window on keys, then
    groupBy(keys, bucket)) — AQE coalesces the second into the small
    per-bucket row set."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    prev_v = F.lag(value_col).over(w)
    # NULL prev (key's first sample) must yield NULL delta, not fall into
    # the otherwise-branch (when(NULL-cond) does)
    delta = (
        F.when(prev_v.isNull(), F.lit(None).cast("long"))
        .when(F.col(value_col) >= prev_v, F.col(value_col) - prev_v)
        .otherwise(F.col(value_col))
    )
    rows = df.select(
        *key_cols,
        (F.col(ts_col) - F.col(ts_col) % bucket_sec).alias("bucket_ts_sec"),
        delta.alias("_d"),
        (F.col(value_col) < prev_v).cast("int").alias("_r"),
    ).filter(F.col("_d").isNotNull())
    return rows.groupBy(*key_cols, "bucket_ts_sec").agg(
        F.sum("_d").alias("increase"), F.sum("_r").alias("n_resets")
    )


def state_durations(
    df: DataFrame,
    key_cols: list[str],
    t0: int,
    t1: int,
    ts_col: str = "ts_sec",
    state_col: str = "state",
) -> DataFrame:
    """Seconds spent in each locf state over [t0, t1): each sample's state
    holds until the key's next sample or t1, segments clipped to the
    window (the ``time_weighted_avg`` segment math grouped by state).
    Output: (keys, state, duration_sec), zero-length segments omitted."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    seg_end = F.least(F.coalesce(F.lead(ts_col).over(w), F.lit(t1)), F.lit(t1))
    seg_start = F.greatest(F.col(ts_col), F.lit(t0))
    weight = F.greatest(seg_end - seg_start, F.lit(0))
    return (
        df.select(*key_cols, F.col(state_col).alias("state"), weight.cast("long").alias("_w"))
        .groupBy(*key_cols, "state")
        .agg(F.sum("_w").alias("duration_sec"))
        .filter(F.col("duration_sec") > 0)
    )


def ohlc(
    df: DataFrame,
    key_cols: list[str],
    bucket_sec: int,
    ts_col: str = "ts_sec",
    value_col: str = "value",
) -> DataFrame:
    """Per-bucket candlestick: open = value at the bucket's earliest ts,
    close = at its latest, high/low = max/min. Single map-side-combinable
    groupBy (min_by/max_by partial-aggregate like min/max). Timestamps must
    be unique within (keys, bucket) for open/close determinism — true for
    the engine's series tables."""
    b = (F.col(ts_col) - F.col(ts_col) % bucket_sec).alias("bucket_ts_sec")
    return df.groupBy(*key_cols, b).agg(
        F.min_by(value_col, ts_col).alias("open"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        F.max_by(value_col, ts_col).alias("close"),
        F.count(F.lit(1)).alias("n_samples"),
    )


def heartbeat_uptime(
    df: DataFrame,
    key_cols: list[str],
    ttl_sec: int,
    ts_col: str = "ts_sec",
) -> DataFrame:
    """Union length of the per-key liveness intervals [ts, ts+ttl): each
    heartbeat extends liveness by ``ttl_sec``; overlapping intervals merge.
    Computed without an interval-merge loop: with samples ordered by ts,
    each row adds max(0, (ts+ttl) − max(ts, running-max of previous ends))
    — the standard one-pass interval-union identity. Output: (keys,
    uptime_sec, n_heartbeats, first_ts, last_ts). One shuffle (window and
    groupBy share the key)."""
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    end = F.col(ts_col) + ttl_sec
    prev_max_end = F.max(F.col(ts_col) + ttl_sec).over(w)
    covered = F.greatest(
        end - F.greatest(F.col(ts_col), F.coalesce(prev_max_end, F.col(ts_col))),
        F.lit(0),
    )
    return (
        df.select(*key_cols, F.col(ts_col), covered.alias("_c"))
        .groupBy(*key_cols)
        .agg(
            F.sum("_c").alias("uptime_sec"),
            F.count(F.lit(1)).alias("n_heartbeats"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
        )
    )


def idelta(
    df: DataFrame,
    key_cols: list[str],
    bucket_sec: int,
    ts_col: str = "ts_sec",
    value_col: str = "value",
) -> DataFrame:
    """Instantaneous delta/rate per bucket (TimescaleDB ``idelta_right`` /
    Prometheus ``irate``): the difference between the LAST TWO samples
    inside each (key, bucket) window, and that difference divided by their
    time gap. Buckets holding fewer than two samples are dropped (the
    instantaneous delta is undefined there — emitting NULLs would just
    push the emptiness downstream). Output: (keys, bucket_ts_sec, idelta,
    irate).

    Both window functions share one partitioning (keys + bucket, ordered
    by ts) — a single Exchange; the final filter keeps one row per
    qualifying bucket. Integer lag math + one division per output row
    (cross-engine float rule, gate.py docstring).
    """
    bucket = (F.col(ts_col) - F.col(ts_col) % bucket_sec).alias("bucket_ts_sec")
    rows = df.select(*key_cols, bucket, F.col(ts_col), F.col(value_col))
    # ONE ascending window for lag, row_number AND count — a desc window for
    # "last row" would break ties differently from the asc lag under
    # duplicate timestamps and could select the first row (NULL prev)
    w = Window.partitionBy(*key_cols, "bucket_ts_sec").orderBy(ts_col)
    wall = Window.partitionBy(*key_cols, "bucket_ts_sec")
    prev_v = F.lag(value_col).over(w)
    prev_t = F.lag(ts_col).over(w)
    is_last = F.row_number().over(w) == F.count(F.lit(1)).over(wall)
    d = F.col(value_col) - prev_v
    dt = F.col(ts_col) - prev_t
    return (
        rows.select(
            *key_cols,
            "bucket_ts_sec",
            d.alias("idelta"),
            (d.cast("double") / F.nullif(dt, F.lit(0)).cast("double")).alias("irate"),
            prev_v.alias("_pv"),
            is_last.alias("_last"),
        )
        .where(F.col("_last") & F.col("_pv").isNotNull())
        .drop("_pv", "_last")
    )


def cadence_stats(
    events: DataFrame,
    keys: tuple[str, ...] = ("host",),
    ts_col: str = "ts_sec",
    min_gaps: int = 2,
) -> DataFrame:
    """Crawl-cadence health per key from the inter-arrival gaps: how
    regularly is this host being crawled? Emits, per key, the exact gap
    count / mean gap / coefficient of variation (std/mean — the standard
    dimensionless regularity score: ~0 = metronomic, ≥1 = bursty) and the
    max gap (the worst coverage hole, the alerting signal).

    Exactness: gaps are integer lag deltas; n/Σg/Σg² aggregate as exact
    BIGINTs (map-side combinable), and mean/cv are derived in one double
    formula each — hash-safe vs a DuckDB twin (gate.py float rule).
    Population std (÷n), matching the engine's other variance ops. Keys
    with fewer than ``min_gaps`` gaps get cv NULL (a single gap has no
    spread); duplicate timestamps contribute zero-length gaps (they count —
    a double-crawl is cadence noise, not a no-op).

    Scale shape: ONE Exchange on (*keys) for the lag window; the groupBy
    rides the same partitioning. Σg² accumulates as DECIMAL(38,0) — a long
    sum would overflow at ~10⁶ gaps of year-scale spans (10⁶·(3·10⁷)² >
    2⁶³) — which is exact, merge-associative, and only cast to double in
    the final formula (both engines round the same exact integer).
    Output: (*keys, n_gaps, mean_gap, cv, max_gap)."""
    sec = F.col(ts_col).cast("long")
    w = Window.partitionBy(*keys).orderBy(sec)
    g = (sec - F.lag(sec).over(w)).alias("gap")
    gaps = events.select(*keys, g).filter(F.col("gap").isNotNull())
    gd = F.col("gap").cast("decimal(38,0)")
    agg = gaps.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap").alias("_s"),
        F.sum(gd * gd).alias("_ss"),
        F.max("gap").alias("max_gap"),
    )
    n = F.col("n_gaps").cast("double")
    s = F.col("_s").cast("double")
    ss = F.col("_ss").cast("double")
    mean = s / n
    var = F.greatest((ss - s * s / n) / n, F.lit(0.0))
    cv = F.when(
        (F.col("n_gaps") >= F.lit(int(min_gaps))) & (F.col("_s") > 0),
        F.sqrt(var) / mean,
    )
    return agg.select(
        *keys,
        "n_gaps",
        mean.alias("mean_gap"),
        cv.alias("cv"),
        "max_gap",
    )
