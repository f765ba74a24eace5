"""Table-maintenance job: compaction + snapshot vacuum over a rollup output
directory — the operational companion of rollup_job (the reference's
ghost-index cleanup duty, /root/reference/libs/mimir/src/rubber.rs:566-602,
run as its own lifecycle step).

Usage: python -m mimirsbrunn_spark.jobs.maintenance_job --out <dir>
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .. import retention
from ..tables import SnapshotTable


def run_maintenance(
    spark: SparkSession,
    out_dir: str,
    target_files: int = 8,
    keep_snapshots: int = 2,
    max_file_sets: int = 4,
) -> dict:
    """Compact + vacuum every snapshot table under ``out_dir``. Lineage and
    metrics are vacuumed but never compacted away (audit trail).

    Compaction triggers: an UNPARTITIONED table when its file count exceeds
    ``target_files`` (the rewrite converges to exactly that many); a
    PARTITIONED table when its current snapshot references more than
    ``max_file_sets`` append commits (file-set dirs) — a layout-preserving
    rewrite keeps at least one file per partition value, so a raw file-count
    trigger would never go quiet and maintenance would rewrite the whole
    table every run. One compaction collapses the table to a single file
    set, so this trigger self-quiesces."""
    summary = {}
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(os.path.join(path, "_snapshots")):
            continue
        tbl = SnapshotTable(path)
        if not tbl.exists():
            continue
        snap = tbl.snapshot(tbl.current_snapshot_id())
        data_root = os.path.join(path, "data")
        file_sets = {
            os.path.relpath(f, data_root).split(os.sep)[0] for f in snap.files
        }
        partitioned = bool(snap.layout.get("partition_by"))
        need = (
            len(file_sets) > max_file_sets
            if partitioned
            else len(snap.files) > target_files
        )
        compacted = False
        if name not in ("lineage", "metrics") and need:
            retention.compact(spark, tbl, target_files=target_files)
            compacted = True
        removed = retention.vacuum(tbl, keep_snapshots=keep_snapshots)
        summary[name] = {"compacted": compacted, "removed_file_sets": len(removed)}
    return summary


def main() -> None:  # pragma: no cover - thin CLI wrapper
    import argparse

    from ..session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--target-files", type=int, default=8,
        help="compaction target for UNPARTITIONED tables (file count)",
    )
    ap.add_argument("--keep-snapshots", type=int, default=2)
    ap.add_argument(
        "--max-file-sets", type=int, default=4,
        help="compaction trigger for PARTITIONED tables: rewrite when the "
        "current snapshot references more than this many append commits",
    )
    args = ap.parse_args()
    spark = get_spark(app_name="maintenance_job")
    print(
        run_maintenance(
            spark, args.out, args.target_files, args.keep_snapshots, args.max_file_sets
        )
    )


if __name__ == "__main__":  # pragma: no cover
    main()
