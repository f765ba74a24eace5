"""counter_rate / time_weighted_avg vs hand-computed and pandas oracles."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mimirsbrunn_spark.operators.counters import counter_rate, time_weighted_avg


@pytest.fixture(scope="module")
def counter_df(spark):
    rows = [
        # host a: steady counter, one reset at t=300 (50 -> 7)
        ("a", 0, 10),
        ("a", 60, 22),
        ("a", 180, 46),
        ("a", 300, 7),
        ("a", 360, 19),
        # host b: single sample (rate undefined)
        ("b", 0, 5),
        # host c: duplicate timestamp (dt=0 -> NULL rate, not an error)
        ("c", 100, 3),
        ("c", 100, 9),
    ]
    return spark.createDataFrame(rows, "host string, ts_sec long, counter long")


def test_counter_rate_resets_and_edges(counter_df):
    rows = counter_rate(counter_df, ["host"]).collect()
    by = {(r["host"], r["ts_sec"]): (r["rate"], r["is_reset"]) for r in rows}
    assert by[("a", 0)] == (None, False)
    assert by[("a", 60)] == pytest.approx((12 / 60, False))
    assert by[("a", 180)] == pytest.approx((24 / 120, False))
    # reset: delta = post-reset value, not 7-46
    assert by[("a", 300)][0] == pytest.approx(7 / 120)
    assert by[("a", 300)][1] is True
    assert by[("a", 360)] == pytest.approx((12 / 60, False))
    assert by[("b", 0)] == (None, False)
    # dup timestamp: second row has dt=0 -> NULL rate
    rates_c = [r["rate"] for r in rows if r["host"] == "c"]
    assert len(rates_c) == 2 and all(x is None for x in rates_c)


def test_counter_rate_matches_pandas(spark, pages_df):
    """Random-ish fixture: per-host minutely cumsum counter with wrap."""
    from pyspark.sql import Window

    from mimirsbrunn_spark.ingest import with_host

    hs = (
        with_host(pages_df).groupBy(
            "host", (F.unix_timestamp("warc_ts") - F.unix_timestamp("warc_ts") % 60).alias("ts_sec")
        )
        .agg(F.sum("page_size").alias("b"))
    )
    w = Window.partitionBy("host").orderBy("ts_sec")
    c = hs.select("host", "ts_sec", (F.sum("b").over(w) % 10_000).alias("counter"))
    got = counter_rate(c, ["host"]).toPandas().sort_values(["host", "ts_sec"])

    pdf = c.toPandas().sort_values(["host", "ts_sec"])
    out = []
    for host, g in pdf.groupby("host"):
        prev_v = prev_t = None
        for _, r in g.iterrows():
            if prev_v is None:
                out.append((host, r.ts_sec, None, False))
            else:
                delta = r.counter - prev_v if r.counter >= prev_v else r.counter
                out.append((host, r.ts_sec, delta / (r.ts_sec - prev_t), r.counter < prev_v))
            prev_v, prev_t = r.counter, r.ts_sec
    want = pd.DataFrame(out, columns=["host", "ts_sec", "rate", "is_reset"]).sort_values(
        ["host", "ts_sec"]
    )
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want.reset_index(drop=True),
        check_dtype=False,
    )


def test_time_weighted_avg_clipping(spark):
    rows = [
        # host a: samples at 0(v=10), 100(v=20), 250(v=40); window [50, 200)
        #   seg 0->100 clipped to [50,100): 10 * 50
        #   seg 100->250 clipped to [100,200): 20 * 100
        #   => twa = (500 + 2000) / 150 = 16.666...
        ("a", 0, 10),
        ("a", 100, 20),
        ("a", 250, 40),
        # host b: entirely after the window -> omitted
        ("b", 300, 5),
        # host c: single sample before the window, locf anchors whole window
        ("c", 10, 7),
    ]
    df = spark.createDataFrame(rows, "host string, ts_sec long, value long")
    got = {r["host"]: r for r in time_weighted_avg(df, ["host"], t0=50, t1=200).collect()}
    assert set(got) == {"a", "c"}
    assert got["a"]["twa"] == pytest.approx(2500 / 150)
    assert got["a"]["covered_sec"] == 150
    assert got["c"]["twa"] == pytest.approx(7.0)
    assert got["c"]["covered_sec"] == 150


def test_counter_increase_buckets_and_resets(spark):
    from mimirsbrunn_spark.operators.counters import counter_increase

    rows = [
        # host a: deltas 12 (t=60), 24 (t=180), reset->7 (t=3700), 13 (t=3800)
        ("a", 0, 10),
        ("a", 60, 22),
        ("a", 180, 46),
        ("a", 3700, 7),
        ("a", 3800, 20),
        # host b: single sample -> no increase rows at all
        ("b", 0, 5),
    ]
    df = spark.createDataFrame(rows, "host string, ts_sec long, counter long")
    got = {
        (r["host"], r["bucket_ts_sec"]): (r["increase"], r["n_resets"])
        for r in counter_increase(df, ["host"], bucket_sec=3600).collect()
    }
    assert got == {("a", 0): (36, 0), ("a", 3600): (20, 1)}


def test_ohlc_hand_computed(spark):
    from mimirsbrunn_spark.operators.counters import ohlc

    rows = [
        ("a", 0, 10),
        ("a", 60, 40),
        ("a", 120, 5),
        ("a", 3599, 20),  # same bucket; close carrier
        ("a", 3600, 99),  # next bucket alone
    ]
    df = spark.createDataFrame(rows, "host string, ts_sec long, value long")
    got = {
        (r["host"], r["bucket_ts_sec"]): (r["open"], r["high"], r["low"], r["close"], r["n_samples"])
        for r in ohlc(df, ["host"], bucket_sec=3600).collect()
    }
    assert got == {("a", 0): (10, 40, 5, 20, 4), ("a", 3600): (99, 99, 99, 99, 1)}


def test_state_durations_hand_computed(spark):
    from mimirsbrunn_spark.operators.counters import state_durations

    rows = [
        # up [0,100), down [100,250), up [250, t1)
        ("a", 0, "up"),
        ("a", 100, "down"),
        ("a", 250, "up"),
        # b: enters after t0; locf only from its first sample
        ("b", 150, "up"),
    ]
    df = spark.createDataFrame(rows, "host string, ts_sec long, state string")
    got = {
        (r["host"], r["state"]): r["duration_sec"]
        for r in state_durations(df, ["host"], t0=50, t1=300).collect()
    }
    assert got == {("a", "up"): 50 + 50, ("a", "down"): 150, ("b", "up"): 150}


def test_heartbeat_uptime_interval_union(spark):
    from mimirsbrunn_spark.operators.counters import heartbeat_uptime

    rows = [
        # a: [0,300) ∪ [100,400) ∪ [1000,1300) -> 400 + 300
        ("a", 0),
        ("a", 100),
        ("a", 1000),
        # b: heartbeat contained in an earlier interval (running-max case):
        # [0,300) ∪ [50,350) ∪ [200,500) -> 500
        ("b", 0),
        ("b", 50),
        ("b", 200),
        # c: single heartbeat
        ("c", 7),
    ]
    df = spark.createDataFrame(rows, "host string, ts_sec long")
    got = {
        r["host"]: (r["uptime_sec"], r["n_heartbeats"], r["first_ts"], r["last_ts"])
        for r in heartbeat_uptime(df, ["host"], ttl_sec=300).collect()
    }
    assert got == {"a": (700, 3, 0, 1000), "b": (500, 3, 0, 200), "c": (300, 1, 7, 7)}


def test_gate_queries_run(spark):
    """The two new gate entries execute and produce stable schemas at sf0.001
    (value equality vs DuckDB is the driver's check_oracle job)."""
    from mimirsbrunn_spark.gate import q_counter_rate, q_time_weighted

    r = q_counter_rate(spark, "/root/testdata/sf0.001")
    assert r.columns == ["host", "ts_sec", "rate", "is_reset"]
    assert r.count() > 0 and r.filter("is_reset").count() > 0
    t = q_time_weighted(spark, "/root/testdata/sf0.001")
    assert t.columns == ["host", "twa", "covered_sec"]
    assert t.count() > 0


# --------------------------------------------------------------------------
# crawl-cadence stats
# --------------------------------------------------------------------------


def _py_cadence(ts):
    import math

    ts = sorted(ts)
    gaps = [b - a for a, b in zip(ts, ts[1:])]
    n = len(gaps)
    s = sum(gaps)
    ss = sum(g * g for g in gaps)
    mean = s / n
    var = max((ss - s * s / n) / n, 0.0)
    cv = math.sqrt(var) / mean if n >= 2 and s > 0 else None
    return n, mean, cv, max(gaps)


def test_cadence_stats_matches_reference(spark):
    from mimirsbrunn_spark.operators import counters

    cases = {
        "regular": [i * 3600 for i in range(10)],          # metronomic: cv 0
        "bursty": [0, 10, 20, 30, 86400, 86410, 200000],
        "dup": [0, 100, 100, 200],                          # zero-length gap counts
        "single": [5],                                      # no gaps: absent
        "two": [0, 50],                                     # 1 gap: cv NULL
    }
    rows = [(k, t) for k, ts in cases.items() for t in ts]
    df = spark.createDataFrame(rows, "host string, ts_sec long")
    out = {
        r.host: (r.n_gaps, r.mean_gap, r.cv, r.max_gap)
        for r in counters.cadence_stats(df).collect()
    }
    assert "single" not in out
    for k, ts in cases.items():
        if len(ts) < 2:
            continue
        n, mean, cv, mx = _py_cadence(ts)
        gn, gm, gcv, gmx = out[k]
        assert (gn, gm, gmx) == (n, mean, mx), k
        assert (gcv is None) == (cv is None)
        if cv is not None:
            assert abs(gcv - cv) < 1e-12, k
    assert out["regular"][2] == 0.0


def test_cadence_stats_decimal_no_overflow_and_plan(spark):
    from mimirsbrunn_spark.operators import counters

    # 2000 year-scale gaps: sum of squares ~2e18*2000 overflows a long sum
    big = spark.createDataFrame(
        [("h", i * 31_000_000) for i in range(2000)], "host string, ts_sec long"
    )
    r = counters.cadence_stats(big).collect()[0]
    assert r.n_gaps == 1999 and r.cv == 0.0 and r.max_gap == 31_000_000
    plan = (
        counters.cadence_stats(big)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1  # groupBy rides the lag-window partitioning
