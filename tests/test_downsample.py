"""M4 / LTTB downsampling: hand-checked M4 row sets and the LTTB greedy
invariant verified point-by-point (the invariant IS the definition, so
checking it directly is a stronger oracle than a reimplementation)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mimirsbrunn_spark.operators.downsample import (
    _lttb_series,
    lttb_downsample,
    m4_downsample,
)


def test_m4_hand_computed(spark):
    rows = [
        # bucket 0: first=0, last=180, min at 120, max at 60
        ("a", 0, 10),
        ("a", 60, 40),
        ("a", 120, 5),
        ("a", 180, 20),
        # bucket 7200: single row carries all four roles
        ("a", 7200, 3),
        # value tie on the max -> BOTH rows kept (row-set semantics)
        ("b", 0, 9),
        ("b", 60, 9),
        ("b", 120, 1),
    ]
    df = spark.createDataFrame(rows, "host string, ts_sec long, value long")
    got = {
        (r["host"], r["ts_sec"])
        for r in m4_downsample(df, ["host"], bucket_sec=7200).collect()
    }
    assert got == {
        ("a", 0), ("a", 60), ("a", 120), ("a", 180),
        ("a", 7200),
        ("b", 0), ("b", 60), ("b", 120),
    }


def test_m4_reduces_dense_series(spark):
    n = 5000
    df = spark.range(n).select(
        F.lit("h").alias("host"),
        (F.col("id") * 60).alias("ts_sec"),
        # 5003 prime > n: values are a permutation (no ties), so the
        # ≤ 4-rows-per-bucket bound is exact
        ((F.col("id") * 37) % 5003).alias("value"),
    )
    out = m4_downsample(df, ["host"], bucket_sec=86400)
    n_buckets = n * 60 // 86400 + 1
    assert 0 < out.count() <= 4 * n_buckets


def _check_lttb_invariant(ts, vals, sel, n_out):
    """sel must start/end at the series ends and each interior selection
    must maximize triangle area vs (previous selected, next bucket
    centroid) within its bucket."""
    n = len(ts)
    edges = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
    assert sel[0] == 0 and sel[-1] == n - 1
    assert len(sel) == n_out
    for i in range(n_out - 2):
        lo, hi = edges[i], edges[i + 1]
        nlo = edges[i + 1]
        nhi = edges[i + 2] if i + 2 < len(edges) else n
        cx, cy = ts[nlo:nhi].mean(), vals[nlo:nhi].mean()
        ax, ay = ts[sel[i]], vals[sel[i]]
        area = np.abs((ax - cx) * (vals[lo:hi] - ay) - (ax - ts[lo:hi]) * (cy - ay))
        chosen = sel[i + 1]
        assert lo <= chosen < hi
        assert area[chosen - lo] == pytest.approx(area.max())


def test_lttb_series_invariant():
    rng = np.random.default_rng(42)
    ts = np.arange(500, dtype=np.float64) * 60
    vals = np.cumsum(rng.normal(size=500))
    n_out = 50
    sel = _lttb_series(ts, vals, n_out)
    _check_lttb_invariant(ts, vals, sel, n_out)


def test_lttb_passthrough_short_series():
    ts = np.arange(10, dtype=np.float64)
    vals = ts * 2
    assert list(_lttb_series(ts, vals, 20)) == list(range(10))


def test_lttb_downsample_spark_matches_local(spark):
    rng = np.random.default_rng(7)
    hosts, rows = ["a", "b"], []
    series = {}
    for h in hosts:
        vals = np.cumsum(rng.normal(size=300))
        series[h] = vals
        rows += [(h, int(i * 60), float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "host string, ts_sec long, value double")
    out = lttb_downsample(df, ["host"], n_out=40)
    got = {
        h: sorted(r["ts_sec"] for r in out.collect() if r["host"] == h) for h in hosts
    }
    for h in hosts:
        ts = np.arange(300, dtype=np.float64) * 60
        sel = _lttb_series(ts, series[h], 40)
        assert got[h] == [int(ts[i]) for i in sel]
        _check_lttb_invariant(ts, series[h], sel, 40)
