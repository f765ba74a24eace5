"""Visualization-grade series downsampling — the read-side reduction every
timeseries engine ships for plotting dense series:

- ``m4_downsample``: the M4 operator (Jugel et al., VLDB 2014): per pixel
  bucket keep the rows carrying min-ts, max-ts, min-value and max-value —
  the exact row set needed for a pixel-perfect line rendering. Pure window
  math (one shuffle on the series key), so it gates against a DuckDB
  oracle with the identical predicate.
- ``lttb_downsample``: Largest-Triangle-Three-Buckets (Steinarsson 2013) —
  picks per bucket the point maximizing the triangle area with the
  previously SELECTED point and the next bucket's centroid. The selection
  is sequential within a series (each choice depends on the previous one),
  which no built-in Spark operator expresses — this is the deliberate
  ``applyInPandas`` escape hatch: series are independent, so the work still
  fans out per key; inside a key it is vectorized numpy. Verified against
  an independent pure-python oracle in tests (not SQL-expressible).

Scale: both partition by the series key — the same layout as every other
per-key window op here. A single series' points must fit one worker for
LTTB (they do by construction: downsampling inputs are already
tier-rollup-sized, bounded by time range / tier step, not by raw doc
count).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def m4_downsample(
    df: DataFrame,
    key_cols: list[str],
    bucket_sec: int,
    ts_col: str = "ts_sec",
    value_col: str = "value",
) -> DataFrame:
    """Keep, per (keys, pixel bucket), every row achieving the bucket's
    first/last timestamp or min/max value (ties all kept — a deterministic
    row SET, hashable cross-engine). Output: input columns projected to
    (keys, ts, value) + ``bucket_ts_sec``."""
    b = (F.col(ts_col) - F.col(ts_col) % bucket_sec).alias("bucket_ts_sec")
    rows = df.select(*key_cols, F.col(ts_col), F.col(value_col), b)
    wb = Window.partitionBy(*key_cols, "bucket_ts_sec")
    keep = (
        (F.col(ts_col) == F.min(ts_col).over(wb))
        | (F.col(ts_col) == F.max(ts_col).over(wb))
        | (F.col(value_col) == F.min(value_col).over(wb))
        | (F.col(value_col) == F.max(value_col).over(wb))
    )
    return rows.withColumn("_keep", keep).filter("_keep").drop("_keep")


def _lttb_series(ts, vals, n_out):
    """LTTB over one series (numpy arrays, ts ascending). Returns the index
    array of selected points. First and last points always kept."""
    import numpy as np

    n = len(ts)
    if n_out >= n or n_out < 3:
        return np.arange(n)
    # bucket boundaries over the interior points (exclude first/last)
    edges = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
    sel = [0]
    prev = 0
    for i in range(n_out - 2):
        lo, hi = edges[i], edges[i + 1]
        if hi <= lo:  # int-rounded edges can collapse when n_out ~ n
            hi = lo + 1
        nlo, nhi = edges[i + 1], edges[i + 2] if i + 2 < len(edges) else n
        # centroid of the NEXT bucket (or the last point for the final one)
        if nlo < nhi:
            cx, cy = ts[nlo:nhi].mean(), vals[nlo:nhi].mean()
        else:
            cx, cy = ts[n - 1], vals[n - 1]
        ax, ay = ts[prev], vals[prev]
        # triangle area vs (prev selected, candidate, next centroid)
        area = np.abs(
            (ax - cx) * (vals[lo:hi] - ay) - (ax - ts[lo:hi]) * (cy - ay)
        )
        prev = lo + int(area.argmax())
        sel.append(prev)
    sel.append(n - 1)
    # clamped buckets can double-select an index; the result is a row SET
    return np.unique(np.asarray(sel, dtype=np.int64))


def lttb_downsample(
    df: DataFrame,
    key_cols: list[str],
    n_out: int,
    ts_col: str = "ts_sec",
    value_col: str = "value",
) -> DataFrame:
    """Per-key LTTB to ``n_out`` points. Output: (keys, ts, value). Series
    shorter than ``n_out`` pass through unchanged."""
    import numpy as np

    out_fields = [df.schema[c] for c in (*key_cols, ts_col, value_col)]
    from pyspark.sql.types import StructType

    schema = StructType(out_fields)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        idx = _lttb_series(
            pdf[ts_col].to_numpy(np.float64), pdf[value_col].to_numpy(np.float64), n_out
        )
        return pdf.iloc[idx][[*key_cols, ts_col, value_col]]

    return df.select(*key_cols, ts_col, value_col).groupBy(*key_cols).applyInPandas(
        fn, schema
    )
