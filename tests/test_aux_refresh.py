"""Incremental refresh of the auxiliary aggregate tiers: bootstrap on a
day-truncated table, then refresh with the held-out day(s) — the result
must equal a full rebuild over everything. Histograms and top-N are exact
(integer sums / deterministic ranks → bit-identical); distinct sketches
compare estimate-for-estimate within the sketch RSE (merge/insert order
differs between the two paths). Also pins the cross-year 30d invalidation
(a January day dirties the PRIOR year's 30d partition)."""

import pytest
from pyspark.sql import functions as F

from mimirsbrunn_spark.ingest import read_pages
from mimirsbrunn_spark.jobs.aux_refresh import dirty_parent_pkeys
from mimirsbrunn_spark.tables import SnapshotTable


@pytest.fixture(scope="module")
def split_pages(spark, small_pages_path, tmp_path_factory):
    """(all_pages_path, boot_pages_path, held_out_days): the last 2 days of
    the fixture are held out of the bootstrap."""
    root = tmp_path_factory.mktemp("auxsplit")
    pages = read_pages(spark, small_pages_path)
    days = sorted(
        r["d"] for r in pages.select(
            F.date_format("warc_ts", "yyyy-MM-dd").alias("d")
        ).distinct().collect()
    )
    held = days[-2:]
    boot = str(root / "boot_pages")
    pages.filter(~F.date_format("warc_ts", "yyyy-MM-dd").isin(held)).write.parquet(boot)
    return small_pages_path, boot, held


def _table_rows(spark, out, name, drop=()):
    df = SnapshotTable(f"{out}/{name}").read(spark).drop("pkey", *drop)
    return df


def test_hist_incremental_equals_full(spark, split_pages, tmp_path):
    from mimirsbrunn_spark.jobs.histogram_job import run_histogram_job

    all_p, boot_p, held = split_pages
    full, inc = str(tmp_path / "full"), str(tmp_path / "inc")
    run_histogram_job(spark, all_p, full)
    run_histogram_job(spark, boot_p, inc)
    run_histogram_job(spark, all_p, inc, days=held)
    for tier in ("1h", "1d", "30d"):
        a = _table_rows(spark, full, f"hist_{tier}")
        b = _table_rows(spark, inc, f"hist_{tier}")
        assert a.count() == b.count() > 0, tier
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, tier


def test_topn_incremental_equals_full(spark, split_pages, tmp_path):
    from mimirsbrunn_spark.jobs.topn_job import run_topn_job

    all_p, boot_p, held = split_pages
    full, inc = str(tmp_path / "full"), str(tmp_path / "inc")
    kw = dict(n=3, slack=4, item_col="lang")  # complete lists → deterministic
    run_topn_job(spark, all_p, full, **kw)
    run_topn_job(spark, boot_p, inc, **kw)
    run_topn_job(spark, all_p, inc, days=held, **kw)
    for tier in ("1h", "1d", "30d"):
        a = _table_rows(spark, full, f"topn_{tier}")
        b = _table_rows(spark, inc, f"topn_{tier}")
        assert a.count() == b.count() > 0, tier
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, tier


def test_distinct_incremental_estimates_match(spark, split_pages, tmp_path):
    from mimirsbrunn_spark.jobs.distinct_job import run_distinct_job

    all_p, boot_p, held = split_pages
    full, inc = str(tmp_path / "full"), str(tmp_path / "inc")
    run_distinct_job(spark, all_p, full)
    run_distinct_job(spark, boot_p, inc)
    run_distinct_job(spark, all_p, inc, days=held)
    for tier in ("1h", "1d", "30d"):
        a = _table_rows(spark, full, f"distinct_{tier}", drop=("url_sketch",))
        b = _table_rows(spark, inc, f"distinct_{tier}", drop=("url_sketch",))
        j = a.withColumnRenamed("distinct_est", "ea").join(
            b.withColumnRenamed("distinct_est", "eb"), ["host", "bucket_ts"], "full"
        )
        bad = j.filter(
            "ea IS NULL OR eb IS NULL OR abs(ea - eb) > greatest(0.02 * eb, 1)"
        ).count()
        assert bad == 0 and j.count() > 0, tier


def test_dirty_parent_pkeys_cross_year(spark):
    """A 30d bucket that starts in late December covers early-January days:
    the January dirty day must invalidate the PRIOR year's partition."""
    # 2024-01-03 lies in the 30d bucket starting 2023-12-07 (epoch-aligned)
    import datetime as dt

    day = "2024-01-03"
    pk = dirty_parent_pkeys([day], "30d")
    sec = int(dt.datetime(2024, 1, 3, tzinfo=dt.timezone.utc).timestamp())
    start = sec - sec % 2_592_000
    want = dt.datetime.fromtimestamp(start, dt.timezone.utc).strftime("%Y")
    assert want == "2023"  # the covering epoch-aligned bucket starts Dec 2023
    assert pk == [want]
    assert dirty_parent_pkeys([day], "1d") == ["2024-01"]
