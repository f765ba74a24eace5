"""Counter / gauge aggregates for irregular time series — the two classic
timeseries-engine reads the rollup tiers don't directly answer:

- ``counter_rate``: per-key instantaneous rate of a monotonic counter with
  RESET detection (a counter that wraps or restarts yields delta < 0; the
  post-reset value itself is the delta, the standard Prometheus/Timescale
  ``rate``/``counter_agg`` convention).
- ``time_weighted_avg``: locf time-weighted mean over a query window
  [t0, t1) — each observation weighted by how long it was the latest value,
  segments clipped to the window (TimescaleDB ``time_weight('locf')``).

Both are pure window/aggregate math over the engine's series tables (no
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
