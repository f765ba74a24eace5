"""Batch anomaly + forecast: z-scores against a pandas rolling oracle,
guard semantics (min_points, zero variance), and seasonal-naive forecasts
against hand-computed expectations."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mimirsbrunn_spark.operators.anomaly import (
    forecast_seasonal_naive,
    zscore_anomaly,
)


def _series(spark, vals, host="h"):
    rows = [(host, i * 3600, int(v)) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "host string, ts_sec long, doc_count long")


def test_zscore_matches_pandas(spark):
    rng = np.random.default_rng(7)
    vals = rng.integers(50, 150, 100).tolist()
    vals[60] = 2000  # a real spike
    df = zscore_anomaly(
        _series(spark, vals), ts_col="ts_sec", window_n=24, threshold=3.0, min_points=8
    )
    got = {r["ts_sec"]: (r["zscore"], r["is_anomaly"]) for r in df.collect()}

    s = pd.Series(vals, dtype="float64")
    shifted = s.shift(1)
    mean = shifted.rolling(24, min_periods=1).mean()
    var = shifted.rolling(24, min_periods=1).var(ddof=0)
    for i, v in enumerate(vals):
        z, flag = got[i * 3600]
        n = min(i, 24)
        if n < 8 or var[i] == 0 or np.isnan(var[i]):
            assert z is None and flag is False, i
        else:
            want = (v - mean[i]) / np.sqrt(var[i])
            assert z == pytest.approx(want, rel=1e-9), i
            assert flag == (abs(want) > 3.0), i
    # the engineered spike is flagged
    assert got[60 * 3600][1] is True


def test_zscore_zero_variance_guard(spark):
    df = zscore_anomaly(
        _series(spark, [5] * 30), ts_col="ts_sec", window_n=24, min_points=8
    )
    assert df.filter(F.col("zscore").isNotNull()).count() == 0
    assert df.filter(F.col("is_anomaly")).count() == 0


def test_forecast_seasonal_naive_hand(spark):
    # two full days of hourly data; forecast repeats the LAST day
    vals = list(range(24)) + [100 + i for i in range(24)]
    fc = forecast_seasonal_naive(
        _series(spark, vals), ts_col="ts_sec", step_sec=3600, season_n=24, horizon_n=24
    )
    got = {r["ts_sec"]: r["predicted"] for r in fc.collect()}
    assert len(got) == 24
    last_ts = 47 * 3600
    for k in range(1, 25):
        assert got[last_ts + k * 3600] == vals[24 + k - 1], k


def test_forecast_horizon_cap(spark):
    with pytest.raises(ValueError):
        forecast_seasonal_naive(_series(spark, [1, 2]), season_n=4, horizon_n=5)


def test_forecast_gappy_series_stays_sparse(spark):
    """Missing source buckets are missing in the forecast (documented)."""
    rows = [("h", 0, 1), ("h", 3600, 2), ("h", 3 * 3600, 4)]  # hour 2 missing
    df = spark.createDataFrame(rows, "host string, ts_sec long, doc_count long")
    fc = forecast_seasonal_naive(
        df, ts_col="ts_sec", step_sec=3600, season_n=4, horizon_n=4
    )
    got = {r["ts_sec"]: r["predicted"] for r in fc.collect()}
    # max_ts = 3h; forecast window (3h, 7h]: shifts of hours 0,1,3 → 4h,5h,7h
    assert got == {4 * 3600: 1, 5 * 3600: 2, 7 * 3600: 4}
