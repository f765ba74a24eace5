"""HDR percentile sketch + SLO multiwindow burn rate.

HDR: accuracy is pinned against exact numpy percentiles (rel. error ≤ 2^-k
by construction — we assert the bound with the bucket's own granularity),
and the merge is pinned EXACT: sketch(A ∪ B) equals the integer-sum merge
of sketch(A) and sketch(B) row-for-row, which is what makes the tier
cascade lossless.

SLO: a crafted incident timeline is verified against a brute-force pandas
oracle of the multiwindow math, plus the page-alert truth table (short
spike alone must NOT page; sustained burn must).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mimirsbrunn_spark.operators.histograms import (
    HDR_K,
    hdr_histogram,
    hdr_quantile,
    hdr_quantiles_multi,
)
from mimirsbrunn_spark.operators.slo import error_rollup, multiwindow_burn


def _hdr_bin_py(v: int, k: int = HDR_K) -> int:
    u = max(int(v), 0) + 1
    e = u.bit_length() - 1
    pe = 2**e
    return min(e * 2**k + (u - pe) * 2**k // pe, 40 * 2**k + (2**k - 1))


def _hdr_ub_py(b: int, k: int = HDR_K) -> int:
    e, sub = b // 2**k, b % 2**k
    pe = 2**e
    return pe + -(-((sub + 1) * pe) // 2**k) - 2  # ceil div


def test_hdr_bin_matches_pure_python_reference(spark):
    rng = np.random.default_rng(7)
    vals = np.unique(
        np.concatenate(
            [
                rng.integers(0, 50, 200),
                rng.integers(0, 10**6, 500),
                (rng.pareto(1.2, 300) * 1000).astype(np.int64),
                np.array([0, 1, 2, 31, 32, 33, 63, 64, 2**20 - 1, 2**20, 2**40, 2**45]),
            ]
        )
    )
    df = spark.createDataFrame(pd.DataFrame({"v": vals, "key": "k"}))
    got = (
        hdr_histogram(df, value_col="v", keys=("key",))
        .select("bin")
        .distinct()
        .toPandas()["bin"]
        .sort_values()
        .tolist()
    )
    want = sorted({_hdr_bin_py(v) for v in vals})
    assert got == want


def test_hdr_quantile_accuracy_bound(spark):
    rng = np.random.default_rng(11)
    vals = (rng.lognormal(8, 2, 5000)).astype(np.int64)
    df = spark.createDataFrame(pd.DataFrame({"v": vals, "key": "k"}))
    h = hdr_histogram(df, value_col="v", keys=("key",))
    for q in (0.5, 0.9, 0.99):
        est = hdr_quantile(h, q, keys=("key",), out_col="est").collect()[0]["est"]
        # exact quantile with the same ceil(q*n) rank convention
        exact = int(np.sort(vals)[int(np.ceil(q * len(vals))) - 1])
        # est is the bucket upper bound: exact <= est and the bucket's lower
        # bound (rel. width 2^-k of the octave) stays below exact.
        assert exact <= est
        assert est <= exact * (1 + 2 ** -float(HDR_K)) + 2
    # sanity: estimates are monotone in q
    e50, e99 = (
        hdr_quantile(h, 0.5, keys=("key",), out_col="e").collect()[0]["e"],
        hdr_quantile(h, 0.99, keys=("key",), out_col="e").collect()[0]["e"],
    )
    assert e50 <= e99


def test_hdr_merge_is_exact(spark):
    rng = np.random.default_rng(3)
    a = pd.DataFrame({"v": rng.integers(0, 10**5, 3000), "key": "k"})
    b = pd.DataFrame({"v": (rng.pareto(1.1, 2000) * 500).astype(np.int64), "key": "k"})
    ha = hdr_histogram(spark.createDataFrame(a), "v", keys=("key",))
    hb = hdr_histogram(spark.createDataFrame(b), "v", keys=("key",))
    merged = (
        ha.unionByName(hb)
        .groupBy("key", "bin")
        .agg(F.sum("n").alias("n"))
        .orderBy("bin")
        .collect()
    )
    direct = (
        hdr_histogram(spark.createDataFrame(pd.concat([a, b])), "v", keys=("key",))
        .orderBy("bin")
        .collect()
    )
    assert [tuple(r) for r in merged] == [tuple(r) for r in direct]


@pytest.fixture(scope="module")
def incident_df(spark):
    """12 hourly buckets for one host: quiet (1 % errors), a one-hour spike
    (30 %), then a sustained 20 % burn for 6 hours."""
    rows = []
    t0 = 1_700_000_000 - 1_700_000_000 % 3600
    plan = [1, 1, 1, 30, 1, 1, 20, 20, 20, 20, 20, 20]  # errors per 100 reqs
    for i, epct in enumerate(plan):
        for j in range(100):
            rows.append(
                {
                    "host": "h1",
                    "warc_sec": t0 + i * 3600 + j * 30,
                    "is_err": j < epct,
                }
            )
    return spark.createDataFrame(pd.DataFrame(rows)), pd.DataFrame(rows), t0


def test_slo_burn_matches_pandas_oracle(spark, incident_df):
    df, pdf, t0 = incident_df
    hourly = error_rollup(df, F.col("is_err"), ts_col="warc_sec", keys=("host",))
    out = (
        multiwindow_burn(hourly, error_budget=0.01, long_buckets=6)
        .orderBy("bucket_sec")
        .toPandas()
    )
    # brute-force oracle
    pdf = pdf.assign(bucket=pdf.warc_sec - pdf.warc_sec % 3600)
    g = pdf.groupby("bucket").agg(tot=("is_err", "size"), err=("is_err", "sum"))
    for _, r in out.iterrows():
        b = r.bucket_sec
        win = g.loc[(g.index > b - 6 * 3600) & (g.index <= b)]
        assert r.tot == g.loc[b, "tot"] and r.err == g.loc[b, "err"]
        assert r.burn_short == pytest.approx(g.loc[b, "err"] / g.loc[b, "tot"] / 0.01)
        assert r.burn_long == pytest.approx(win.err.sum() / win.tot.sum() / 0.01)


def test_slo_page_alert_truth_table(spark, incident_df):
    df, _, t0 = incident_df
    hourly = error_rollup(df, F.col("is_err"), ts_col="warc_sec", keys=("host",))
    out = (
        multiwindow_burn(hourly, error_budget=0.01, long_buckets=6)
        .orderBy("bucket_sec")
        .toPandas()
    )
    alerts = out.page_alert.tolist()
    # hour 3's 30 % spike: burn_short = 30 >= 14.4 but the 6h window is
    # (1+1+1+30)/400/0.01 = 8.25 >= 6 → it DOES page (fast-burn pair fires
    # on a fresh series); hour 0-2 quiet must not; the sustained 20 % hours
    # page once the long window crosses 6.
    assert alerts[0] is False and alerts[1] is False and alerts[2] is False
    assert alerts[3] is True  # spike: short 30, long 8.25
    assert alerts[4] is False and alerts[5] is False  # short back to 1
    assert out.burn_short.iloc[6] == pytest.approx(20.0)
    assert alerts[6] is True  # 20 % with long window 54/600/0.01 = 9.0
    assert all(alerts[7:12])  # sustained burn keeps paging


# -- property-based invariants of the HDR index math (pure python twin of the
# -- Spark/DuckDB formula; parity with Spark is pinned above on sampled values)

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=0, max_value=2**40 - 2))
def test_hdr_index_invariants(v):
    # below the MAX_BIN cap (~1 TB, mirroring the log-2 sketch's clamp)
    b = _hdr_bin_py(v)
    ub = _hdr_ub_py(b)
    # the bucket holds its value, and its width honors the 2^-k bound
    assert v <= ub
    lo = _hdr_ub_py(b - 1) + 1 if b > 0 else 0
    assert lo <= v
    assert ub - lo + 1 <= max((v + 1) >> HDR_K, 1) + 1


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=2**41 - 2, max_value=2**62))
def test_hdr_index_cap(v):
    # beyond ~1 TB every value clamps into the terminal bucket (same
    # contract as the log-2 sketch's MAX_BIN) — quantiles there report the
    # cap bucket's bound, an explicit saturation, not an error
    assert _hdr_bin_py(v) == 40 * 2**HDR_K + (2**HDR_K - 1)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=2**47 - 1))
def test_hdr_index_monotone(v):
    assert _hdr_bin_py(v) <= _hdr_bin_py(v + 1)


def test_hdr_quantiles_multi_equals_single(spark):
    rng = np.random.default_rng(5)
    pdf = pd.DataFrame(
        {
            "v": rng.integers(1, 10**6, 4000),
            "key": rng.choice(["a", "b", "c"], 4000),
        }
    )
    h = hdr_histogram(spark.createDataFrame(pdf), "v", keys=("key",))
    multi = hdr_quantiles_multi(h, {"p50": 0.5, "p95": 0.95}, keys=("key",))
    s50 = hdr_quantile(h, 0.5, keys=("key",), out_col="p50")
    s95 = hdr_quantile(h, 0.95, keys=("key",), out_col="p95")
    want = s50.join(s95, "key")
    assert multi.exceptAll(want).count() == 0
    assert multi.count() == want.count() == 3
    # the pick groupBy rides the window's partitioning: no Exchange between
    plan = multi._jdf.queryExecution().executedPlan().toString()
    post_window = plan.split("Window")[0]  # operators ABOVE the window
    assert "Exchange" not in post_window


@settings(max_examples=12, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=40), min_size=3, max_size=10),
    st.integers(min_value=2, max_value=8),
)
def test_multiwindow_burn_random_plans_match_pandas(spark, plan, long_buckets):
    """Randomized incident plans (errors-per-50-requests per hour) against
    the brute-force pandas oracle, across long-window widths."""
    rows = []
    t0 = 1_600_000_000 - 1_600_000_000 % 3600
    for i, e in enumerate(plan):
        for j in range(50):
            rows.append({"host": "h", "warc_sec": t0 + i * 3600 + j, "e": j < e})
    pdf = pd.DataFrame(rows)
    hourly = error_rollup(spark.createDataFrame(pdf), F.col("e"), ts_col="warc_sec")
    out = (
        multiwindow_burn(hourly, error_budget=0.01, long_buckets=long_buckets)
        .orderBy("bucket_sec")
        .toPandas()
    )
    g = (
        pdf.assign(b=pdf.warc_sec - pdf.warc_sec % 3600)
        .groupby("b")
        .agg(tot=("e", "size"), err=("e", "sum"))
    )
    for _, r in out.iterrows():
        win = g.loc[(g.index > r.bucket_sec - long_buckets * 3600) & (g.index <= r.bucket_sec)]
        assert r.burn_long == pytest.approx(win.err.sum() / win.tot.sum() / 0.01)
        assert r.burn_short == pytest.approx(
            g.loc[r.bucket_sec, "err"] / g.loc[r.bucket_sec, "tot"] / 0.01
        )
