"""Calendar month buckets: the civil-calendar integer algorithm against
Python's datetime (ground truth) across 1970–2100, boundary/leap cases by
hand, and the monthly continuous aggregate."""

import datetime
import random

from pyspark.sql import functions as F

from mimirsbrunn_spark.functions.timebucket import (
    month_bucket_sec,
    month_bucket_sec_civil,
    monthly_rollup,
)


def _truth(sec: int) -> int:
    dt = datetime.datetime.fromtimestamp(sec, datetime.timezone.utc)
    return int(
        datetime.datetime(dt.year, dt.month, 1, tzinfo=datetime.timezone.utc).timestamp()
    )


def test_month_bucket_matches_datetime_randomized(spark):
    rng = random.Random(42)
    secs = sorted({rng.randrange(0, 4_102_444_800) for _ in range(600)})  # ..2100
    df = spark.createDataFrame([(s,) for s in secs], "sec long")
    got = {
        r["sec"]: r["m"]
        for r in df.select("sec", month_bucket_sec(F.col("sec")).alias("m")).collect()
    }
    for s in secs:
        assert got[s] == _truth(s), s


def test_month_bucket_boundaries(spark):
    cases = [
        0,                                   # epoch == month start
        int(datetime.datetime(2024, 1, 31, 23, 59, 59, tzinfo=datetime.timezone.utc).timestamp()),
        int(datetime.datetime(2024, 2, 1, tzinfo=datetime.timezone.utc).timestamp()),
        int(datetime.datetime(2024, 2, 29, 12, tzinfo=datetime.timezone.utc).timestamp()),  # leap day
        int(datetime.datetime(2100, 2, 28, 23, tzinfo=datetime.timezone.utc).timestamp()),  # 2100 NOT leap
        int(datetime.datetime(1999, 12, 31, 23, 59, 59, tzinfo=datetime.timezone.utc).timestamp()),
        int(datetime.datetime(2000, 2, 29, tzinfo=datetime.timezone.utc).timestamp()),  # 400-year leap
    ]
    df = spark.createDataFrame([(s,) for s in cases], "sec long")
    got = {
        r["sec"]: r["m"]
        for r in df.select("sec", month_bucket_sec(F.col("sec")).alias("m")).collect()
    }
    for s in cases:
        assert got[s] == _truth(s), s


def test_month_bucket_fast_path_equals_civil_algorithm(spark):
    """The DATE-function fast path and the documented civil-calendar
    integer algorithm (the DuckDB oracle's form) are the same function."""
    rng = random.Random(7)
    secs = sorted({rng.randrange(0, 4_102_444_800) for _ in range(400)})
    df = spark.createDataFrame([(s,) for s in secs], "sec long")
    bad = df.select(
        month_bucket_sec(F.col("sec")).alias("fast"),
        month_bucket_sec_civil(F.col("sec")).alias("civil"),
    ).filter(F.col("fast") != F.col("civil"))
    assert bad.count() == 0


def test_monthly_rollup_counts(spark):
    jan31 = int(datetime.datetime(2024, 1, 31, 23, tzinfo=datetime.timezone.utc).timestamp())
    feb1 = int(datetime.datetime(2024, 2, 1, 1, tzinfo=datetime.timezone.utc).timestamp())
    rows = [("a", jan31), ("a", jan31 + 60), ("a", feb1), ("b", feb1)]
    df = spark.createDataFrame(rows, "host string, sec long").select(
        "host", F.timestamp_seconds("sec").alias("warc_ts")
    )
    got = {
        (r["host"], r["month_sec"]): r["doc_count"]
        for r in monthly_rollup(df).collect()
    }
    jan = _truth(jan31)
    feb = _truth(feb1)
    assert got == {("a", jan): 2, ("a", feb): 1, ("b", feb): 1}
