"""Read-side query API — the "bragi" analog (SURVEY.md §2.9/§3).

The reference serves scored, filtered, paged reads over the published
indexes; here the read surface is rollup queries over published tier tables:
tier selection, time-range pruning, host/lang filters, on-demand gap-fill,
derived metrics, deterministic paging. Every knob is an explicit parameter
(the reference's explicitly-parameterized query-settings discipline,
/root/reference/libs/bragi/src/query_settings.rs:1-83).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import gapfill as gf
from .series import TIER_ORDER, TIER_SECONDS
from .tables import SnapshotTable


def pick_tier(t0: int, t1: int, max_points: int = 10_000) -> str:
    """Coarsest-fitting tier selection: the finest tier whose point count
    over [t0, t1) stays under ``max_points`` (continuous-aggregate read
    routing — the engine analog of index-set selection S16,
    /root/reference/libs/mimir/src/rubber.rs:254-300)."""
    span = max(t1 - t0, 1)
    for tier in TIER_ORDER:
        if span // TIER_SECONDS[tier] <= max_points:
            return tier
    return TIER_ORDER[-1]


def read_rollup(
    spark: SparkSession,
    out_dir: str,
    tier: str,
    t0: int | None = None,
    t1: int | None = None,
    hosts: list[str] | None = None,
    langs: list[str] | None = None,
    fill: str | None = None,
    limit: int | None = None,
    offset: int = 0,
) -> DataFrame:
    """Query a published tier. Filters are plain predicates (partition/file
    pruning at the scan); ``fill`` ∈ {None, 'locf', 'linear'} applies
    on-demand gap-fill to the host-level series."""
    tbl = SnapshotTable(f"{out_dir}/rollup_{tier}" if tier != "1m" else f"{out_dir}/series_1m")
    df = tbl.read(spark)
    if t0 is not None:
        df = df.filter(F.col("bucket_ts").cast("long") >= t0)
    if t1 is not None:
        df = df.filter(F.col("bucket_ts").cast("long") < t1)
    if hosts:
        df = df.filter(F.col("host").isin(hosts))
    if langs:
        df = df.filter(F.col("lang").isin(langs))

    if fill is None:
        out = df.withColumn("avg_page_size", F.col("bytes_sum") / F.col("doc_count"))
        order = ["host", "bucket_ts", "lang"]
    else:
        assert fill in ("locf", "linear")
        hs = df.groupBy("host", "bucket_ts").agg(
            F.sum("doc_count").alias("doc_count"), F.sum("bytes_sum").alias("bytes_sum")
        )
        filled = gf.gapfill(hs, tier)
        value = F.col("value_locf") if fill == "locf" else F.col("value_linear")
        out = filled.select("host", "bucket_ts", "metric", value.alias("value"), "is_filled")
        order = ["host", "metric", "bucket_ts"]

    out = out.orderBy(*order)
    if offset:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return out


def register_views(spark: SparkSession, out_dir: str, prefix: str = "") -> list[str]:
    """Register every published table under ``out_dir`` as a temp view so
    the whole read surface is plain ``spark.sql`` (the DataFrame API and
    SQL are the same Catalyst plans — views cost nothing). Returns the view
    names registered. Views read the CURRENT snapshot at registration time
    (re-register after a publish to advance, matching snapshot-isolation
    reader semantics)."""
    import os

    names = []
    for name in sorted(os.listdir(out_dir)):
        tbl = SnapshotTable(os.path.join(out_dir, name))
        if not tbl.exists():
            continue
        view = f"{prefix}{name}"
        tbl.read(spark).createOrReplaceTempView(view)
        names.append(view)
    return names


def table_report(spark: SparkSession, out_dir: str) -> dict:
    """Operational snapshot of a published output dir: per table the current
    snapshot id, row count (manifest arithmetic — no scans), snapshot-chain
    length, partition count and bounds; plus lineage progress. The
    engine's answer to the reference's import-stats/admin surface
    (/root/reference/src/addr_reader.rs:33-65 per-country stats)."""
    import os

    report: dict = {"tables": {}, "lineage": None}
    for name in sorted(os.listdir(out_dir)):
        tbl = SnapshotTable(os.path.join(out_dir, name))
        if not tbl.exists():
            continue
        snap = tbl.snapshot(tbl.current_snapshot_id())
        parts = sorted({v for v in snap.partitions.values() if v})
        report["tables"][name] = {
            "snapshot_id": snap.snapshot_id,
            "rows": snap.row_count,
            "files": len(snap.files),
            "snapshots": len(tbl.snapshots()),
            "partitions": len(parts),
            "partition_min": parts[0] if parts else None,
            "partition_max": parts[-1] if parts else None,
        }
    lin_path = os.path.join(out_dir, "lineage")
    lin = SnapshotTable(lin_path)
    if lin.exists():
        rows = lin.read(spark).select("partition_id").collect()
        report["lineage"] = {
            "partitions_done": len(rows),
            "latest": max((r.partition_id for r in rows), default=None),
        }
    return report


def read_chunks(
    spark: SparkSession,
    out_dir: str,
    tier: str,
    t0: int | None = None,
    t1: int | None = None,
    hosts: list[str] | None = None,
) -> DataFrame:
    """Serve the host-level series directly FROM COMPRESSED chunk storage:
    chunk rows are pruned by host and coarse time range (chunk_start /
    n_points bounds — a chunk is touched only if it can intersect [t0, t1)),
    then decoded (vectorized three-phase decode) and row-filtered exactly.
    The compressed read path a 100 TB serving tier uses instead of the
    uncompressed rollup tables."""
    from . import codecs
    from .series import TIER_SECONDS

    tbl = SnapshotTable(f"{out_dir}/chunks_{tier}")
    df = tbl.read(spark)
    if hosts:
        df = df.filter(F.col("host").isin(hosts))
    step = TIER_SECONDS[tier]
    if t1 is not None:
        df = df.filter(F.col("chunk_start").cast("long") < t1)
    if t0 is not None:
        # a chunk ends at most n_points * step after its start
        df = df.filter(F.col("chunk_start").cast("long") + F.col("n_points") * step > t0)
    out = codecs.decode_chunks(df)
    if t0 is not None:
        out = out.filter(F.col("bucket_ts").cast("long") >= t0)
    if t1 is not None:
        out = out.filter(F.col("bucket_ts").cast("long") < t1)
    return out
