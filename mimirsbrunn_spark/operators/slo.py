"""SLO error-budget burn rates with multiwindow alerting — the serving-side
read every production timeseries engine grows next to its counter rollups
(the Google SRE workbook's multiwindow multi-burn-rate alerts; TimescaleDB
users build the same thing from ``counter_agg`` + a range window).

Pipeline shape:

- ``error_rollup``: per (key, bucket) integer sufficient stats — total
  requests and error requests. One groupBy on the series key: the same
  single Exchange as every other tier rollup, and the stats merge across
  tiers by integer summation (exactly order-independent), so at 100 TB the
  burn read serves from the published 1h tier, never the raw pages.
- ``multiwindow_burn``: short- and long-window burn rates per bucket. The
  long window is an integer RANGE-frame sum over the short-window partials
  (no self-join, no second shuffle — the window rides the rollup's
  partitioning), and each burn rate is ONE float expression over exact
  integers per output row, IEEE-deterministic and DuckDB-hashable per the
  engine's cross-engine float rule (gate.py docstring).

An alert fires when BOTH windows burn hot (short catches the spike, long
suppresses flapping) — the canonical page condition is
``burn_1h >= 14.4 AND burn_6h >= 6`` for a 99.9 % SLO's fast-burn page;
thresholds are parameters here.

Reference analog: the reference serves derived read-time metrics (decayed
scores, normalized weights) from its published indices
(libs/mimir/src/rubber.rs); burn rate is the timeseries-tier counterpart —
a derived, windowed read over already-rolled-up state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def error_rollup(
    df: DataFrame,
    err_col,
    ts_col: str = "warc_sec",
    keys: tuple[str, ...] = ("host",),
    step: int = 3600,
) -> DataFrame:
    """(keys..., bucket_sec, tot, err): integer sufficient stats per fixed
    time bucket. ``err_col`` is a boolean Column marking failed requests."""
    b = (F.col(ts_col) - (F.col(ts_col) % F.lit(step))).alias("bucket_sec")
    return (
        df.select(*keys, b, err_col.cast("long").alias("_e"))
        .groupBy(*keys, "bucket_sec")
        .agg(
            F.count(F.lit(1)).alias("tot"),
            # coalesce: a group whose every predicate is NULL must publish
            # err=0, not err=NULL (per-row NULL still doesn't burn — the
            # cast drops it from the sum; only the empty-sum case changes).
            # Matches the gate's SQL twin (CASE WHEN … ELSE 0) and keeps
            # burn_short/burn_long non-NULL downstream. ADVICE r4 #1.
            F.coalesce(F.sum("_e"), F.lit(0)).alias("err"),
        )
    )


def multiwindow_burn(
    hourly: DataFrame,
    error_budget: float = 0.01,
    long_buckets: int = 6,
    step: int = 3600,
    keys: tuple[str, ...] = ("host",),
    page_short: float = 14.4,
    page_long: float = 6.0,
) -> DataFrame:
    """Short/long-window burn rates + page flag from per-bucket stats.

    burn = error_ratio / error_budget (budget = 1 - SLO, e.g. 0.01 for a
    99 % SLO — the budget is the parameter, not the SLO, so the division
    uses the caller's literal directly: DuckDB folds ``1.0 - 0.99`` in
    exact DECIMAL arithmetic while Python uses IEEE doubles, and deriving
    the budget from the SLO therefore diverges across engines). The long
    window aggregates the previous ``long_buckets`` buckets (inclusive)
    with an integer RANGE frame. Early buckets use the partial window,
    matching Prometheus' behavior at series start. Output: (keys...,
    bucket_sec, tot, err, burn_short, burn_long, page_alert).
    """
    wl = (
        Window.partitionBy(*keys)
        .orderBy("bucket_sec")
        .rangeBetween(-(long_buckets - 1) * step, Window.currentRow)
    )
    tot_l = F.sum("tot").over(wl)
    err_l = F.sum("err").over(wl)
    budget = F.lit(float(error_budget))
    burn_s = F.col("err").cast("double") / F.col("tot").cast("double") / budget
    burn_l = err_l.cast("double") / tot_l.cast("double") / budget
    return hourly.select(
        *keys,
        "bucket_sec",
        "tot",
        "err",
        burn_s.alias("burn_short"),
        burn_l.alias("burn_long"),
        ((burn_s >= F.lit(page_short)) & (burn_l >= F.lit(page_long))).alias("page_alert"),
    )
