"""Retention/vacuum/compaction + streaming-equals-batch tests."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mimirsbrunn_spark import retention, series, tiers
from mimirsbrunn_spark.config import EngineConfig
from mimirsbrunn_spark.tables import SnapshotTable


def test_retention_expiry(spark, small_pages_path, tmp_path):
    pages = spark.read.parquet(small_pages_path)
    hourly = tiers.rollup(series.series_1m(pages), "1h")
    tbl = SnapshotTable(str(tmp_path / "t1h"))
    tbl.commit(hourly, mode="replace")
    n0 = tbl.read(spark).count()

    max_ts = hourly.agg(F.max(F.col("bucket_ts").cast("long"))).collect()[0][0]
    # keep only the last day
    expired = retention.expire_tier(
        spark, tbl, "1h", now_epoch=max_ts, retention_seconds={"1h": 86400}
    )
    n1 = tbl.read(spark).count()
    assert expired > 0 and n0 - n1 == expired
    cutoff = max_ts - 86400
    assert tbl.read(spark).filter(F.col("bucket_ts").cast("long") < cutoff).count() == 0
    # keep-forever tier: no-op, no new snapshot
    sid = tbl.current_snapshot_id()
    assert retention.expire_tier(spark, tbl, "30d", now_epoch=max_ts) == 0
    assert tbl.current_snapshot_id() == sid


def test_vacuum_and_compact(spark, tmp_path):
    tbl = SnapshotTable(str(tmp_path / "t"))
    for i in range(4):
        tbl.commit(spark.range(i * 10, (i + 1) * 10).toDF("id"), mode="append")
    data_root = os.path.join(tbl.path, "data")
    assert len(os.listdir(data_root)) == 4

    retention.compact(spark, tbl, target_files=2)
    removed = retention.vacuum(tbl, keep_snapshots=1)
    assert len(removed) == 4  # pre-compaction sets deleted
    assert tbl.read(spark).count() == 40
    assert sorted(r.id for r in tbl.read(spark).collect()) == list(range(40))
    assert len(tbl.snapshots()) == 1


def test_config_layering(tmp_path):
    cfg = EngineConfig.load()
    assert cfg.n_salts == 16
    toml = tmp_path / "engine.toml"
    toml.write_text("[engine]\nn_salts = 8\nminhash_k = 64\n")
    cfg = EngineConfig.load(str(toml))
    assert cfg.n_salts == 8 and cfg.minhash_k == 64
    cfg = EngineConfig.load(str(toml), n_salts=4)
    assert cfg.n_salts == 4  # override wins over file
    with pytest.raises(KeyError):
        EngineConfig.load(str(toml), bogus=1)


def test_streaming_equals_batch(spark, small_pages_path, small_pages_pdf, tmp_path):
    """Streaming (watermark + 1m windows, availableNow drain) must equal the
    batch series exactly. Append mode only emits a window once the watermark
    passes it, so a bounded drain needs a watermark-closing sentinel event
    after the real data — the documented operational pattern for finite
    backfills through the streaming path."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mimirsbrunn_spark.streaming import run_stream_to_table
    from oracle import reference as oracle

    stream_dir = str(tmp_path / "stream_in")
    shutil.copytree(small_pages_path, stream_dir)
    sentinel_ts = small_pages_pdf["warc_ts"].max() + pd.Timedelta(days=1)
    sentinel = pd.DataFrame(
        {
            "url": ["https://zzz-sentinel.invalid/close"],
            "warc_ts": [sentinel_ts],
            "html": [b""],
            "text": [""],
            "lang": ["unknown"],
        }
    )
    schema = pa.schema(
        [
            pa.field("url", pa.string()),
            pa.field("warc_ts", pa.timestamp("us")),
            pa.field("html", pa.binary()),
            pa.field("text", pa.string()),
            pa.field("lang", pa.string()),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(sentinel, schema=schema, preserve_index=False),
        f"{stream_dir}/part-sentinel.parquet",
    )

    tbl = SnapshotTable(str(tmp_path / "stream_series"))
    run_stream_to_table(
        spark,
        stream_dir,
        tbl,
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
    )
    got = (
        tbl.read(spark)
        .filter("host != 'zzz-sentinel.invalid'")
        .toPandas()
        .sort_values(["host", "bucket_ts", "lang"], kind="mergesort")
        .reset_index(drop=True)
    )
    got["bucket_ts"] = got["bucket_ts"].astype("datetime64[us]")
    want = oracle.series_1m(small_pages_pdf)
    pd.testing.assert_frame_equal(
        got[["host", "bucket_ts", "lang", "doc_count", "bytes_sum"]],
        want,
        check_dtype=False,
    )


def test_job_retention_stage(spark, small_pages_path, tmp_path):
    from pyspark.sql import functions as F

    from mimirsbrunn_spark.config import EngineConfig
    from mimirsbrunn_spark.jobs.rollup_job import run_rollup_job

    out = str(tmp_path / "out_ret")
    cfg = EngineConfig.load(retention={"1m": 86400, "1h": 2 * 86400})
    pages = spark.read.parquet(small_pages_path)
    max_ts = pages.agg(F.max(F.col("warc_ts").cast("long"))).collect()[0][0]
    run_rollup_job(spark, small_pages_path, out, config=cfg, retention_now_epoch=max_ts)

    t = SnapshotTable(f"{out}/rollup_1h").read(spark)
    assert t.filter(F.col("bucket_ts").cast("long") < max_ts - 2 * 86400).count() == 0
    assert t.count() > 0
    m = SnapshotTable(f"{out}/metrics").read(spark)
    assert m.filter("stage = 'retention'").count() > 0

    # 1m series retention is metadata-only (partition drop): expired days are
    # gone from the current snapshot but the parent snapshot still has them
    s_tbl = SnapshotTable(f"{out}/series_1m")
    cur = s_tbl.snapshot(s_tbl.current_snapshot_id())
    assert cur.meta.get("retention") == "1m"
    import datetime as dt

    cutoff_day = dt.datetime.fromtimestamp(
        max_ts - cfg.retention["1m"], dt.timezone.utc
    ).date().isoformat()
    assert all(not (v and v < cutoff_day) for v in cur.partitions.values())
    parent = s_tbl.snapshot(cur.parent_id)
    assert len(parent.files) >= len(cur.files)


def test_maintenance_job(spark, small_pages_path, tmp_path):
    from mimirsbrunn_spark.jobs.maintenance_job import run_maintenance
    from mimirsbrunn_spark.jobs.rollup_job import run_rollup_job

    out = str(tmp_path / "out_m")
    run_rollup_job(spark, small_pages_path, out)
    before = SnapshotTable(f"{out}/series_1m").read(spark).count()
    summary = run_maintenance(spark, out, target_files=2, keep_snapshots=1)
    assert "series_1m" in summary and summary["series_1m"]["compacted"]
    after_tbl = SnapshotTable(f"{out}/series_1m")
    assert after_tbl.read(spark).count() == before
    assert len(after_tbl.snapshots()) == 1
    # lineage survives vacuum (resume still works: second run processes 0)
    assert run_rollup_job(spark, small_pages_path, out)["days_processed"] == 0
