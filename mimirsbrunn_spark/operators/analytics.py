"""Event-analytics aggregates over the pages/events stream: hopping
(sliding) windows and first-seen cohort retention.

- ``hopping_window_agg``: count/sum per key over a sliding window of length
  ``window_sec`` advancing every ``hop_sec`` (Flink HOP / Spark
  ``F.window(slideDuration)``). Implemented with integer bucket arithmetic
  instead of ``F.window`` so the window key stays a BIGINT epoch second
  (cross-engine determinism, gate.py docstring) and the fan-out factor is
  explicit: each event replicates to exactly ``window_sec // hop_sec``
  window starts via ``explode`` BEFORE the aggregation, so the map-side
  combine absorbs the replication — the shuffle carries one partial row per
  (key, window), not per replicated event. At 100 TB the cost is the same
  single Exchange as the plain tier rollup, ×(window/hop) partial keys.

- ``cohort_retention``: classic retention triangle — users bucketed by the
  period of their FIRST event (cohort), then distinct-user counts per
  (cohort, periods-since-cohort). Two shuffles, both on ``user`` first:
  the min-groupBy and the join back co-partition on the same key (AQE
  reuses the exchange), and the final (cohort, offset) aggregation is tiny
  (periods², not users). The distinct is exact — at 10¹² events the
  distinct-per-cell state is bounded by users, not events, and the
  HLL-sketch variant in operators/distinct.py is the drop-in when even
  that is too wide.

Reference analog: the reference computes per-admin aggregate statistics at
import time (libs/mimir/src/admin_geofinder.rs build stats) and serves
count-shaped facets; hopping windows / cohorts are the event-stream
counterparts over the engine's pages table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hopping_window_agg(
    df: DataFrame,
    key_cols: list[str],
    window_sec: int,
    hop_sec: int,
    ts_col: str = "ts_sec",
    value_col: str | None = None,
) -> DataFrame:
    """(keys, window_start_sec, doc_count[, value_sum]) — one row per key
    per hop-aligned window [window_start, window_start + window_sec) that
    contains at least one event. ``window_sec`` must be a multiple of
    ``hop_sec``.

    An event at ts belongs to the ``window_sec/hop_sec`` windows whose
    start lies in (ts - window_sec, ts], hop-aligned — enumerated as
    floor(ts/hop)*hop - j*hop for j in 0..n_hops-1.
    """
    if window_sec % hop_sec:
        raise ValueError(f"window_sec {window_sec} not a multiple of hop_sec {hop_sec}")
    n_hops = window_sec // hop_sec
    anchor = F.col(ts_col) - F.col(ts_col) % hop_sec
    starts = F.array(*[(anchor - j * hop_sec) for j in range(n_hops)])
    exploded = df.select(
        *key_cols,
        F.explode(starts).alias("window_start_sec"),
        *([F.col(value_col)] if value_col else []),
    )
    aggs = [F.count(F.lit(1)).alias("doc_count")]
    if value_col:
        aggs.append(F.sum(value_col).alias("value_sum"))
    return exploded.groupBy(*key_cols, "window_start_sec").agg(*aggs)


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str = "ts_sec",
    period_sec: int = 604_800,
) -> DataFrame:
    """(cohort_sec, period_offset, users) — distinct ``user_col`` count per
    (first-seen period, periods since first seen). ``period_offset`` 0 is
    the cohort size itself; retention rate is users / cohort size, left to
    the caller (a per-row division downstream keeps this output integral).
    """
    first = df.groupBy(user_col).agg(F.min(ts_col).alias("_first_ts"))
    cohort = (F.col("_first_ts") - F.col("_first_ts") % period_sec).alias("cohort_sec")
    period = (F.col(ts_col) - F.col(ts_col) % period_sec)
    joined = df.select(user_col, F.col(ts_col)).join(first, user_col)
    return (
        joined.select(
            F.col(user_col),
            cohort,
            ((period - (F.col("_first_ts") - F.col("_first_ts") % period_sec)) / period_sec)
            .cast("long")
            .alias("period_offset"),
        )
        .groupBy("cohort_sec", "period_offset")
        .agg(F.count_distinct(F.col(user_col)).alias("users"))
    )
