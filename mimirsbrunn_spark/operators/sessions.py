"""Gap-based sessionization over event streams.

Two Spark-first forms of the same semantics (a session = consecutive events
of one key with inter-event gap ≤ ``gap``):

- ``sessionize``: explicit window math — lag() marks session starts, a
  running sum numbers them (deterministic session ids usable as join keys;
  one shuffle on the key, same single-sort shape as gapfill).
- ``session_aggregate``: Spark's native ``session_window`` groupBy — the
  engine-managed merging session window (also valid under Structured
  Streaming with a watermark, where the window state merges across
  micro-batches).

Both are DuckDB-oracle-expressible (lag + cumulative sum), so the gate
verifies values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    by: tuple[str, ...] = ("user_id",),
    ts: str = "ts",
    gap_sec: int = 1800,
    tiebreak: str | None = None,
) -> DataFrame:
    """Events + a ``session_idx`` column (1-based per key, in time order).
    ``tiebreak`` orders equal timestamps deterministically."""
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(*by).orderBy(*order)
    prev = F.lag(F.col(ts)).over(w)
    new_session = (
        prev.isNull() | ((F.col(ts).cast("double") - prev.cast("double")) > gap_sec)
    ).cast("long")
    run = Window.partitionBy(*by).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    return events.withColumn("session_idx", F.sum(new_session).over(run))


def session_stats(
    events: DataFrame,
    by: tuple[str, ...] = ("user_id",),
    ts: str = "ts",
    gap_sec: int = 1800,
    tiebreak: str | None = None,
) -> DataFrame:
    """One row per session: (by..., session_idx, n_events, start, end,
    duration_sec)."""
    s = sessionize(events, by, ts, gap_sec, tiebreak)
    return s.groupBy(*by, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        (F.max(F.col(ts).cast("double")) - F.min(F.col(ts).cast("double"))).alias(
            "duration_sec"
        ),
    )


def session_aggregate(
    events: DataFrame,
    by: tuple[str, ...] = ("user_id",),
    ts: str = "ts",
    gap_sec: int = 1800,
) -> DataFrame:
    """Native session_window aggregate (merging windows; streaming-valid).
    Note: session_window's window END is last_event + gap, so duration here
    includes the trailing gap — use session_stats for exact event spans."""
    return (
        events.groupBy(*by, F.session_window(F.col(ts), f"{gap_sec} seconds").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(*by, F.col("w.start").alias("session_start"), F.col("w.end"), "n_events")
    )
