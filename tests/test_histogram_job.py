"""Published histogram tiers: cascaded tables equal direct-from-raw builds
EXACTLY at every tier (integer-sum merges), quantile-over-range equals the
operator applied to the same counts, and pruned reads touch fewer files."""

from pyspark.sql import functions as F

from mimirsbrunn_spark.ingest import read_pages, with_host
from mimirsbrunn_spark.jobs.histogram_job import (
    read_histogram,
    read_quantile,
    run_histogram_job,
)
from mimirsbrunn_spark.operators.histograms import (
    histogram_quantile,
    size_histogram,
)
from mimirsbrunn_spark.series import bucket_col


def test_histogram_job_publish_exact(spark, small_pages_path, tmp_path):
    out = str(tmp_path / "hist_out")
    run_histogram_job(spark, small_pages_path, out)
    pages = with_host(read_pages(spark, small_pages_path))

    for tier in ("1h", "1d", "30d"):
        direct = size_histogram(
            pages.select(
                "host", bucket_col("warc_ts", tier).alias("bucket_ts"), "page_size"
            )
        )
        served = read_histogram(spark, out, tier)
        assert served.count() == direct.count() > 0, tier
        assert served.exceptAll(direct).count() == 0, tier


def test_quantile_over_range_and_pruning(spark, small_pages_path, tmp_path):
    out = str(tmp_path / "hist_out")
    run_histogram_job(spark, small_pages_path, out)

    full = read_histogram(spark, out, "1h")
    mn, mx = full.agg(
        F.min(F.col("bucket_ts").cast("long")), F.max(F.col("bucket_ts").cast("long"))
    ).first()
    t0, t1 = mn + 86400, mn + 3 * 86400

    # served quantile == operator over the identically pruned counts
    want = histogram_quantile(
        read_histogram(spark, out, "1h", t0=t0, t1=t1)
        .groupBy("host", "bin")
        .agg(F.sum("n").alias("n")),
        0.9,
        keys=("host",),
    )
    got = read_quantile(spark, out, 0.9, t0=t0, t1=t1)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0

    # per-bucket form matches the per-bucket operator
    pb = read_quantile(spark, out, 0.5, t0=t0, t1=t1, per_bucket=True)
    pb_want = histogram_quantile(
        read_histogram(spark, out, "1h", t0=t0, t1=t1), 0.5
    )
    assert pb.count() == pb_want.count() > 0
    assert pb.exceptAll(pb_want).count() == 0

    # pruning actually prunes
    narrow = read_histogram(spark, out, "1h", t0=t0, t1=t1)
    assert len(narrow.inputFiles()) < len(full.inputFiles())
    ref = full.filter(
        (F.col("bucket_ts").cast("long") >= t0) & (F.col("bucket_ts").cast("long") < t1)
    )
    assert narrow.count() == ref.count() > 0
