"""Exponential smoothing over per-key time series — EWMA and Holt linear
(double exponential / PromQL ``double_exponential_smoothing``), the missing
sibling of the counters family (idelta/irate/increase in counters.py).

Semantics (pinned, both engines):

- ``ewma``:  e_1 = x_1;  e_t = alpha * x_t + (1 - alpha) * e_{t-1}.
- ``holt_linear`` (level s, trend b):  s_1 = x_1, b_1 = 0;
      s_t = sf * x_t + (1 - sf) * (s_{t-1} + b_{t-1})
      b_t = tf * (s_t - s_{t-1}) + (1 - tf) * b_{t-1}
  (Prometheus seeds b_1 from the first delta; we pin b_1 = 0 so a
  one-point series is defined — divergence documented here.)

Cross-engine determinism: the recursions are evaluated in EXACTLY this
operand order on float64 in both engines (numpy scalar loop here, a
recursive CTE in the DuckDB gate twin), so results are bit-identical;
outputs crossing a comparison boundary are still rounded to 6 decimals per
the engine float rule (gate.py docstring). Smoothing factors should be
exact binary fractions (0.25, 0.5, ...) when bit-parity matters.

Scale shape: a smoothed series is inherently sequential per key, so the
operator is ONE Exchange on the key columns (``applyInPandas``) and a
per-group pass whose length is bounded by the retention tier (e.g. 720
rows for 30 d of hourly buckets) — the group loop is O(tier length), never
O(corpus). No collect, no driver loop; Arrow-batched like the LTTB /
stateful-anomaly precedents (query_api.read_plot, streaming.py).

Reference analog: the reference scores with exponential distance decay
(/root/reference/libs/bragi/src/query.rs — the decay/scoring family,
SURVEY.md §2 G7); here the decay is over time steps instead of meters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _grouped_schema(df: DataFrame, new_cols: list[str]) -> T.StructType:
    fields = list(df.schema.fields) + [
        T.StructField(c, T.DoubleType(), True) for c in new_cols
    ]
    return T.StructType(fields)


def ewma(
    series: DataFrame,
    alpha: float,
    keys: tuple[str, ...] = ("host",),
    ts_col: str = "bucket_sec",
    value_col: str = "value",
    out_col: str = "ewma",
) -> DataFrame:
    """Per-key exponentially-weighted moving average, ordered by ``ts_col``.
    Returns the input columns plus ``out_col`` (float64)."""
    a = float(alpha)
    if not 0.0 < a <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    schema = _grouped_schema(series, [out_col])

    def _one(pdf):
        import numpy as np

        pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        x = pdf[value_col].to_numpy(dtype="float64")
        e = np.empty(len(x), dtype="float64")
        if len(x):
            acc = x[0]
            e[0] = acc
            for i in range(1, len(x)):
                acc = a * x[i] + (1.0 - a) * acc
                e[i] = acc
        pdf[out_col] = e
        return pdf

    return series.groupBy(*[F.col(k) for k in keys]).applyInPandas(_one, schema)


def holt_linear(
    series: DataFrame,
    sf: float,
    tf: float,
    keys: tuple[str, ...] = ("host",),
    ts_col: str = "bucket_sec",
    value_col: str = "value",
    level_col: str = "smooth",
    trend_col: str = "trend",
) -> DataFrame:
    """Per-key Holt linear (double exponential) smoothing: level + trend
    columns per row. ``sf`` = level smoothing factor, ``tf`` = trend
    smoothing factor (PromQL double_exponential_smoothing argument order)."""
    s_f, t_f = float(sf), float(tf)
    for name, v in (("sf", s_f), ("tf", t_f)):
        if not 0.0 < v < 1.0:
            raise ValueError(f"{name} must be in (0, 1), got {v}")
    schema = _grouped_schema(series, [level_col, trend_col])

    def _one(pdf):
        import numpy as np

        pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        x = pdf[value_col].to_numpy(dtype="float64")
        lv = np.empty(len(x), dtype="float64")
        tr = np.empty(len(x), dtype="float64")
        if len(x):
            s, b = x[0], 0.0
            lv[0], tr[0] = s, b
            for i in range(1, len(x)):
                s_new = s_f * x[i] + (1.0 - s_f) * (s + b)
                b = t_f * (s_new - s) + (1.0 - t_f) * b
                s = s_new
                lv[i], tr[i] = s, b
        pdf[level_col] = lv
        pdf[trend_col] = tr
        return pdf

    return series.groupBy(*[F.col(k) for k in keys]).applyInPandas(_one, schema)


def forecast_holt(
    series: DataFrame,
    sf: float,
    tf: float,
    horizon_buckets: int,
    bucket_sec: int,
    keys: tuple[str, ...] = ("host",),
    ts_col: str = "bucket_sec",
    value_col: str = "value",
) -> DataFrame:
    """h-step-ahead linear forecast from the LAST Holt state per key:
    one row per (key, step) with forecast = s_T + step * b_T. Composes
    holt_linear with an argmax-per-key pick and a ``sequence`` explode —
    no extra pandas stage."""
    sm = holt_linear(
        series, sf, tf, keys=keys, ts_col=ts_col, value_col=value_col
    )
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).desc())
    last = (
        sm.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    step = F.explode(
        F.sequence(F.lit(1), F.lit(int(horizon_buckets)))
    ).alias("step")
    return last.select(*keys, ts_col, "smooth", "trend", step).select(
        *keys,
        (F.col(ts_col) + F.col("step") * F.lit(int(bucket_sec))).alias(ts_col),
        F.col("step").cast("long").alias("step"),
        (F.col("smooth") + F.col("step") * F.col("trend")).alias("forecast"),
    )
