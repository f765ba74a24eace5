"""Adversarial edge probes on the newest operators: semantics under NULLs,
negatives, duplicates, and degenerate groups must be pinned, not
accidental — these are the inputs a 10^12-row crawl WILL contain."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mimirsbrunn_spark.operators.histograms import (
    hdr_histogram,
    hdr_quantiles_multi,
)
from mimirsbrunn_spark.operators.slo import error_rollup, multiwindow_burn


def test_hdr_negative_and_zero_values_clamp_to_bucket_zero(spark):
    """Negative sizes (corrupt length fields) clamp to the v=0 bucket —
    they must neither crash nor create phantom negative bins."""
    pdf = pd.DataFrame({"v": [-5, -1, 0, 0, 1], "key": "k"})
    h = (
        hdr_histogram(spark.createDataFrame(pdf), "v", keys=("key",))
        .orderBy("bin")
        .collect()
    )
    assert [r.bin for r in h] == [0, 32]  # v<=0 -> u=1 -> bin 0; v=1 -> u=2 -> octave 1
    assert h[0].n == 4 and h[1].n == 1


def test_hdr_quantile_singleton_and_uniform_groups(spark):
    """Degenerate groups: a single row, and a group where every value is
    identical — the quantile must be that value's bucket bound for every q."""
    pdf = pd.DataFrame(
        {"v": [7] + [100] * 50, "key": ["solo"] + ["uniform"] * 50}
    )
    h = hdr_histogram(spark.createDataFrame(pdf), "v", keys=("key",))
    out = {
        r.key: (r.p01, r.p99)
        for r in hdr_quantiles_multi(h, {"p01": 0.01, "p99": 0.99}, keys=("key",)).collect()
    }
    assert out["solo"][0] == out["solo"][1] >= 7
    assert out["uniform"][0] == out["uniform"][1] >= 100


def test_error_rollup_null_predicate_counts_total_not_error(spark):
    """A NULL predicate result (NULL operand — e.g. missing status) counts
    the request in ``tot`` but NOT in ``err``: unknown outcome never burns
    budget, and never crashes the sum."""
    pdf = pd.DataFrame(
        {
            "host": ["h"] * 4,
            "warc_sec": [0, 10, 20, 30],
            "size": pd.array([7, 14, None, 3], dtype="Int64"),
        }
    )
    out = error_rollup(
        spark.createDataFrame(pdf), F.expr("size % 7 = 0"), ts_col="warc_sec"
    ).collect()[0]
    assert out.tot == 4
    assert out.err == 2  # 7 and 14; NULL row excluded, 3 not an error


def test_burn_single_bucket_series_long_equals_short(spark):
    """A series with one bucket: the long window holds exactly the short
    window — burn_long == burn_short, no NULL division."""
    pdf = pd.DataFrame({"host": ["h"] * 10, "warc_sec": range(10), "e": [True] * 2 + [False] * 8})
    hourly = error_rollup(spark.createDataFrame(pdf), F.col("e"), ts_col="warc_sec")
    r = multiwindow_burn(hourly, error_budget=0.01).collect()[0]
    assert r.burn_short == r.burn_long == pytest.approx(20.0)


def test_series_null_host_rows_are_kept_as_their_own_group(spark):
    """with_host yields NULL for unparseable urls; the rollup keeps them as
    a NULL-host group (Spark groupBy semantics) rather than dropping data —
    pinned so a future 'cleanup' can't silently discard rows."""
    from mimirsbrunn_spark.ingest import with_host
    from mimirsbrunn_spark.series import series_1m

    pdf = pd.DataFrame(
        {
            "url": ["https://ok.example.com/a", "not a url at all"],
            "warc_ts": pd.to_datetime(["2024-01-01 00:00:30"] * 2),
            "html": [b"x" * 10, b"y" * 20],
            "text": ["x", "y"],
            "lang": ["en", "en"],
        }
    )
    out = series_1m(with_host(spark.createDataFrame(pdf)))
    rows = {r.host: r.doc_count for r in out.collect()}
    assert rows.get("ok.example.com") == 1
    assert None in rows and rows[None] == 1


def test_geo_empty_geometry_yields_null_not_crash(spark):
    """ANSI mode (Spark 4 default) turns element_at OOB into a job-killing
    error: an empty ring / empty way must instead produce NULL/NaN outputs.
    One corrupt geometry in a planet import must never abort the job."""
    import math

    from mimirsbrunn_spark.operators.geo import way_middle_coord, with_centroid

    df = spark.createDataFrame(
        [
            ([0.0, 4.0, 4.0, 0.0], [0.0, 0.0, 4.0, 4.0]),
            ([], []),
        ],
        "xs array<double>, ys array<double>",
    )
    rows = with_centroid(df).orderBy(F.size("xs").desc()).collect()
    assert rows[0].cx == pytest.approx(2.0) and rows[0].cy == pytest.approx(2.0)
    assert rows[1].cx is None or math.isnan(rows[1].cx)  # degenerate, not a crash

    x, y = way_middle_coord(F.col("xs"), F.col("ys"))
    mids = df.select(x.alias("x"), y.alias("y")).orderBy(F.col("x").desc_nulls_last()).collect()
    assert mids[0].x == 4.0
    assert mids[1].x is None and mids[1].y is None
