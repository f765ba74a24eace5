"""File-level zone maps: commit-time (host, bucket_ts) min/max stats in the
manifest + stats-based file skipping on read (the Iceberg
lower_bounds/upper_bounds + sort-order analog). Serving queries scoped to a
few hosts must touch only the files whose host range can hold them — the
partition key (time) alone can't prune those."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mimirsbrunn_spark.jobs.rollup_job import run_rollup_job
from mimirsbrunn_spark.query_api import read_chunks, read_gapfill, read_rollup
from mimirsbrunn_spark.tables import SnapshotTable


def _mkdf(spark, n_hosts=8, n_rows=400):
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = [
        (
            f"host-{i % n_hosts:02d}.example",
            base + dt.timedelta(minutes=7 * i),
            i,
        )
        for i in range(n_rows)
    ]
    return spark.createDataFrame(rows, "host string, bucket_ts timestamp, doc_count long")


def test_commit_records_zone_maps(spark, tmp_path):
    tbl = SnapshotTable(str(tmp_path / "t"))
    df = _mkdf(spark).withColumn("day", F.to_date("bucket_ts"))
    tbl.commit(
        df,
        partition_by="day",
        stats_cols=("host", "bucket_ts"),
        cluster_by=("host",),
        cluster_files=4,
    )
    snap = tbl.snapshot(tbl.current_snapshot_id())
    assert snap.files and snap.file_stats
    # every file's recorded bounds match its actual data exactly
    for f in snap.files:
        st = snap.file_stats[f]
        pdf = spark.read.parquet(f).toPandas()
        assert st["host"] == [pdf["host"].min(), pdf["host"].max()]
        ts = pdf["bucket_ts"].map(
            lambda t: int(t.replace(tzinfo=dt.timezone.utc).timestamp())
        )
        assert st["bucket_ts"] == [int(ts.min()), int(ts.max())]


def test_stats_filter_prunes_and_results_exact(spark, tmp_path):
    tbl = SnapshotTable(str(tmp_path / "t"))
    df = _mkdf(spark, n_hosts=8)
    tbl.commit(df, stats_cols=("host",), cluster_by=("host",), cluster_files=4)
    snap = tbl.snapshot(tbl.current_snapshot_id())
    assert len(snap.files) > 2, "clustered commit should produce several files"
    want = ["host-00.example"]
    pruned = tbl.read(spark, stats_filters={"host": set(want)})
    assert 0 < len(pruned.inputFiles()) < len(snap.files)
    got = sorted(
        (r.host, r.doc_count) for r in pruned.filter(F.col("host").isin(want)).collect()
    )
    exp = sorted(
        (r.host, r.doc_count)
        for r in tbl.read(spark).filter(F.col("host").isin(want)).collect()
    )
    assert got == exp


def test_stats_range_filter_on_timestamps(spark, tmp_path):
    tbl = SnapshotTable(str(tmp_path / "t"))
    # cluster by time so bucket_ts zone maps are tight per file
    tbl.commit(
        _mkdf(spark), stats_cols=("bucket_ts",), cluster_by=("bucket_ts",), cluster_files=4
    )
    snap = tbl.snapshot(tbl.current_snapshot_id())
    t0 = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())
    t1 = t0 + 3600
    pruned = tbl.read(spark, stats_filters={"bucket_ts": (t0, t1 - 1)})
    assert len(pruned.inputFiles()) < len(snap.files)
    sec = F.col("bucket_ts").cast("long")
    assert (
        pruned.filter((sec >= t0) & (sec < t1)).count()
        == tbl.read(spark).filter((sec >= t0) & (sec < t1)).count()
    )


def test_missing_stats_never_prunes(spark, tmp_path):
    """A commit without stats_cols (legacy manifest) must be unaffected by
    stats_filters — pruning can't hide rows the manifest can't bound."""
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(_mkdf(spark))
    n = tbl.read(spark).count()
    assert tbl.read(spark, stats_filters={"host": {"host-00.example"}}).count() == n
    # type-mismatched predicate (ints vs string stats) also never prunes
    tbl2 = SnapshotTable(str(tmp_path / "t2"))
    tbl2.commit(_mkdf(spark), stats_cols=("host",))
    assert tbl2.read(spark, stats_filters={"host": (0, 5)}).count() == n


def test_stats_survive_partition_drop(spark, tmp_path):
    tbl = SnapshotTable(str(tmp_path / "t"))
    df = _mkdf(spark).withColumn("day", F.to_date("bucket_ts"))
    tbl.commit(
        df, partition_by="day", stats_cols=("host",), cluster_by=("host",), cluster_files=4
    )
    days = sorted({v for v in tbl.snapshot(tbl.current_snapshot_id()).partitions.values()})
    tbl.drop_partition_values({days[0]})
    snap = tbl.snapshot(tbl.current_snapshot_id())
    assert snap.files
    assert all(f in snap.file_stats for f in snap.files)


def test_compaction_preserves_layout(spark, tmp_path):
    """compact() on a partitioned + clustered table must reproduce the
    declared layout — partition values, zone maps, and clustering survive
    the rewrite (a compaction that flattens the layout silently disables
    manifest pruning for every later read)."""
    from mimirsbrunn_spark.retention import compact

    tbl = SnapshotTable(str(tmp_path / "t"))
    df = _mkdf(spark).withColumn("day", F.to_date("bucket_ts"))
    # several appends → many small files
    for d in sorted({r.day for r in df.select("day").distinct().collect()}):
        tbl.commit(
            df.filter(F.col("day") == F.lit(d)),
            partition_by="day",
            stats_cols=("host",),
            cluster_by=("host",),
            cluster_files=3,
        )
    before = tbl.snapshot(tbl.current_snapshot_id())
    rows_before = before.row_count
    compact(spark, tbl)
    after = tbl.snapshot(tbl.current_snapshot_id())
    assert after.row_count == rows_before
    assert after.layout == before.layout
    assert all(after.partitions.get(f) for f in after.files), "partitioning lost"
    assert all(f in after.file_stats for f in after.files), "zone maps lost"
    # host-scoped stats pruning still skips files after compaction
    pruned = tbl.read(spark, stats_filters={"host": {"host-00.example"}})
    assert len(pruned.inputFiles()) < len(after.files)


@pytest.fixture(scope="module")
def served(spark, small_pages_path, tmp_path_factory):
    from mimirsbrunn_spark.config import EngineConfig

    out = str(tmp_path_factory.mktemp("zm_out"))
    run_rollup_job(
        spark, small_pages_path, out, job_id="zm", config=EngineConfig(cluster_files=4)
    )
    return out


def test_read_rollup_host_scoped_skips_files(spark, served):
    """End-to-end: rollup_job publishes host-clustered files with zone maps;
    a host-scoped read touches strictly fewer files and returns exactly the
    full read filtered to that host."""
    full = read_rollup(spark, served, "1h")
    host = full.select("host").first().host
    scoped = read_rollup(spark, served, "1h", hosts=[host])
    assert 0 < len(scoped.inputFiles()) < len(full.inputFiles())
    got = sorted(map(tuple, scoped.collect()))
    exp = sorted(map(tuple, full.filter(F.col("host") == host).collect()))
    assert got == exp


def test_read_gapfill_host_scoped_skips_files(spark, served):
    full = read_gapfill(spark, served, "1h")
    host = full.select("host").first().host
    scoped = read_gapfill(spark, served, "1h", hosts=[host])
    assert 0 < len(scoped.inputFiles()) < len(full.inputFiles())
    assert scoped.count() == full.filter(F.col("host") == host).count()


def test_read_chunks_host_scoped_results_exact(spark, served):
    full = read_chunks(spark, served, "1h")
    host = full.select("host").first().host
    scoped = read_chunks(spark, served, "1h", hosts=[host])
    got = sorted(map(tuple, scoped.collect()))
    exp = sorted(map(tuple, full.filter(F.col("host") == host).collect()))
    assert got == exp
