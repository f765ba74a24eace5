"""Publication consistency checker — the engine's fsck.

A serving layout published by ``rollup_job`` carries redundant structure
(manifest stats vs parquet footers, lineage vs partition row counts, each
tier vs an aggregate of its parent, gap-fill observed rows vs the tier,
compressed chunks vs the uncompressed rollup). This job cross-checks all
of it and reports exactly what disagrees — the operational answer to "did
a crash / bad deploy / stray write corrupt the published tables?".

Reference lifecycle analog: the reference validates a finished import by
querying the freshly-published index end-to-end before swapping the alias
(/root/reference/tests/rubber_test.rs via tests/tests.rs:149-152); this
job is that validation for the rollup store, run on demand or after a
suspect incident.

Scale shape: NOTHING here reads raw pages. Manifest and lineage checks
are driver-side arithmetic plus parquet FOOTER reads (``--deep``); the
cross-tier check aggregates the parent TIER (bounded by bucket grid ×
keys, ~1000× smaller than raw at any scale); the chunk check decodes only
the chunks of sampled hosts through the manifest-pruned ``read_chunks``
path. History a tier legitimately preserves past its parent's retention
(the preserve∪rebuild contract) is excluded from the strict comparison
and reported separately as ``preserved_rows``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import tiers
from ..tables import Lineage, SnapshotTable, _footer_stats

TIER_PARENT = {"1h": "1m", "1d": "1h", "30d": "1d"}


def _table(out_dir: str, tier: str) -> SnapshotTable:
    name = "series_1m" if tier == "1m" else f"rollup_{tier}"
    return SnapshotTable(f"{out_dir}/{name}")


def _tier_df(spark: SparkSession, out_dir: str, tier: str) -> DataFrame:
    df = _table(out_dir, tier).read(spark)
    for aux in ("pkey", "day"):
        if aux in df.columns:
            df = df.drop(aux)
    return df


def check_manifest(tbl: SnapshotTable, deep: bool = False) -> dict:
    """Manifest ↔ filesystem: every referenced data file exists; with
    ``deep``, each file's parquet footer must reproduce the manifest's
    recorded row count and zone-map bounds (``_footer_stats`` is the same
    function that wrote them, so equality is exact)."""
    import os

    sid = tbl.current_snapshot_id()
    if sid is None:
        return {"ok": False, "error": "no snapshot"}
    snap = tbl.snapshot(sid)
    missing = [f for f in snap.files if not os.path.exists(f)]
    row_mismatch: list[str] = []
    stats_mismatch: list[str] = []
    if deep:
        import pyarrow.parquet as pq

        stats_cols = tuple((snap.layout or {}).get("stats_cols", ()) or ())
        for f in snap.files:
            if f in missing:
                continue
            pf = pq.ParquetFile(f)
            rec = snap.file_rows.get(f)
            if rec is not None and pf.metadata.num_rows != rec:
                row_mismatch.append(f)
            rec_stats = snap.file_stats.get(f)
            if rec_stats and stats_cols:
                if _footer_stats(pf, stats_cols) != rec_stats:
                    stats_mismatch.append(f)
    return {
        "ok": not (missing or row_mismatch or stats_mismatch),
        "files": len(snap.files),
        "missing": missing,
        "row_mismatch": row_mismatch,
        "stats_mismatch": stats_mismatch,
    }


def check_lineage(spark: SparkSession, out_dir: str) -> dict:
    """Lineage ledger ↔ series manifest: every committed day's recorded
    row count must equal the partition's manifest row count (both sides
    are metadata arithmetic — no scan)."""
    series_tbl = SnapshotTable(f"{out_dir}/series_1m")
    lin = Lineage(f"{out_dir}/lineage")
    if not lin.table.exists() or not series_tbl.exists():
        return {"ok": False, "error": "missing lineage or series table"}
    rows = (
        lin.table.read(spark)
        .groupBy("partition_id")
        .agg(F.max(F.struct("output_snapshot", "row_count")).alias("s"))
        .select("partition_id", F.col("s.row_count").alias("rows"))
        .collect()
    )
    mismatch = {}
    for r in rows:
        day = r.partition_id.removeprefix("day=")
        actual = series_tbl.partition_row_count(day)
        if actual != r.rows:
            mismatch[day] = {"lineage": r.rows, "manifest": actual}
    return {"ok": not mismatch, "days": len(rows), "mismatch": mismatch}


def check_tier_consistency(
    spark: SparkSession, out_dir: str, child: str, sample: int = 5
) -> dict:
    """Child tier ↔ aggregate of its parent over the span the parent
    covers. The continuous-aggregate invariant: within covered buckets the
    two must match EXACTLY (integer sums). Child buckets starting before
    the parent's first fully-covered bucket are legitimate preserved
    history (retention contract) — counted, not compared."""
    from ..series import TIER_SECONDS

    parent = TIER_PARENT[child]
    p_tbl, c_tbl = _table(out_dir, parent), _table(out_dir, child)
    if not p_tbl.exists() or not c_tbl.exists():
        return {"ok": False, "error": f"missing {parent} or {child} table"}
    p_df = _tier_df(spark, out_dir, parent)
    c_df = _tier_df(spark, out_dir, child)
    cols = ["host", "bucket_ts", "lang", "doc_count", "bytes_sum"]
    expected = tiers.rollup(p_df, child).select(*cols)

    sec = F.col("bucket_ts").cast("long")
    step = TIER_SECONDS[child]
    p_min = p_df.agg(F.min(sec)).first()[0]
    if p_min is None:
        return {"ok": False, "error": f"{parent} tier is empty"}
    # the preserved span uses EXACTLY the rebuild's truncation-aware rule
    # (rollup_job): floor at the parent's retention truncation bound when
    # evidence survives; with none, a conservative observed-min floor only
    # when the child provably holds pre-parent buckets; otherwise every
    # child bucket — including the one straddling the data's natural start
    # — is fully rebuildable from the parent and must match.
    from .rollup_job import _tier_has_rows_strictly_below, _truncation_watermark_epoch

    wm = _truncation_watermark_epoch(p_tbl)
    if wm is not None:
        floor_b = -(-wm // step) * step
    elif _tier_has_rows_strictly_below(spark, c_tbl, (p_min // step) * step):
        floor_b = -(-p_min // step) * step
    else:
        floor_b = None

    c_cov = c_df.select(*cols)
    e_cov = expected
    if floor_b is not None:
        c_cov = c_cov.filter(sec >= floor_b)
        e_cov = e_cov.filter(sec >= floor_b)
    extra = c_cov.exceptAll(e_cov)
    missing = e_cov.exceptAll(c_cov)
    n_extra, n_missing = extra.count(), missing.count()
    preserved = c_df.filter(sec < floor_b).count() if floor_b is not None else 0
    out = {
        "ok": n_extra == 0 and n_missing == 0,
        "extra_rows": n_extra,
        "missing_rows": n_missing,
        "preserved_rows": preserved,
    }
    if n_extra or n_missing:
        out["sample_extra"] = [r.asDict() for r in extra.limit(sample).collect()]
        out["sample_missing"] = [r.asDict() for r in missing.limit(sample).collect()]
    return out


def check_gapfill_observed(spark: SparkSession, out_dir: str, tier: str) -> dict:
    """Published gap-fill table ↔ the tier it was filled from: every
    observed (is_filled = false) row must carry exactly the tier's value
    in BOTH fill columns; every (host, bucket) of the tier must appear
    observed. Exact float64-of-integer comparisons."""
    gf_tbl = SnapshotTable(f"{out_dir}/gapfill_{tier}")
    if not gf_tbl.exists() or not _table(out_dir, tier).exists():
        return {"ok": False, "error": f"missing gapfill_{tier} or tier table"}
    gf = gf_tbl.read(spark)
    if "pkey" in gf.columns:
        gf = gf.drop("pkey")
    hs = tiers.host_series(_tier_df(spark, out_dir, tier))
    long = hs.selectExpr(
        "host",
        "bucket_ts",
        "stack(2, 'doc_count', cast(doc_count as double), "
        "'bytes_sum', cast(bytes_sum as double)) as (metric, value)",
    )
    j = long.join(gf, ["host", "bucket_ts", "metric"], "left")
    bad = j.filter(
        F.col("is_filled").isNull()  # tier row absent from the gapfill table
        | F.col("is_filled")  # present but marked filled
        | (F.col("value_locf") != F.col("value"))
        | (F.col("value_linear") != F.col("value"))
    )
    n_bad = bad.count()
    n_points = long.count()
    # the left join proves tier ⊆ observed-and-matching; equal counts then
    # prove observed ⊆ tier too (no phantom observed rows)
    n_obs = gf.filter(~F.col("is_filled")).count()
    return {
        "ok": n_bad == 0 and n_obs == n_points,
        "tier_points": n_points,
        "observed_rows": n_obs,
        "mismatch_rows": n_bad,
    }


def check_chunks_decode(
    spark: SparkSession, out_dir: str, tier: str, n_hosts: int = 3
) -> dict:
    """Compressed chunks ↔ uncompressed rollup for sampled hosts: decode
    through the manifest-pruned ``read_chunks`` path and compare the full
    per-host series exactly. Bounded work: only the sampled hosts' chunk
    files are read."""
    from ..query_api import read_chunks

    if not SnapshotTable(f"{out_dir}/chunks_{tier}").exists():
        return {"ok": False, "error": f"missing chunks_{tier} table"}
    hs = tiers.host_series(_tier_df(spark, out_dir, tier))
    hosts = [r.host for r in hs.select("host").distinct().orderBy("host").limit(n_hosts).collect()]
    if not hosts:
        return {"ok": True, "hosts": [], "mismatch_rows": 0}
    want = hs.filter(F.col("host").isin(hosts)).select(
        "host", "bucket_ts", "doc_count", "bytes_sum"
    )
    got = read_chunks(spark, out_dir, tier, hosts=hosts).select(
        "host", "bucket_ts", "doc_count", "bytes_sum"
    )
    n_bad = got.exceptAll(want).count() + want.exceptAll(got).count()
    return {"ok": n_bad == 0, "hosts": hosts, "mismatch_rows": n_bad}


def check_aux_cascade(spark: SparkSession, out_dir: str, prefix: str, child: str) -> dict:
    """Published aux tier ↔ exact re-aggregation of its finer sibling
    (exact-merge families only: the log-2 ``hist_*`` / HDR ``hdr_*``
    histograms and the ``slo_*`` error stats all merge by integer sums, so
    cascade equality is EXACT). Aux tiers are replace-published with no
    history-preservation contract (histogram_job/slo_job; aux_refresh is
    bit-identical by design), so strict equality is the invariant — unlike
    the rollup tiers there is no preserved span to exclude. The HLL/topn
    cascades are intentionally NOT checked here: their merge is lossy
    relative to a direct rebuild."""
    from ..operators.histograms import rollup_histogram

    parent = TIER_PARENT[child]
    p_tbl = SnapshotTable(f"{out_dir}/{prefix}_{parent}")
    c_tbl = SnapshotTable(f"{out_dir}/{prefix}_{child}")
    if not p_tbl.exists() or not c_tbl.exists():
        return {"ok": False, "error": f"missing {prefix}_{parent} or {prefix}_{child}"}
    if prefix == "slo":
        from .slo_job import _rollup_stats

        cols = ["host", "bucket_ts", "tot", "err"]
        cascade = _rollup_stats
    else:
        cols = ["host", "bucket_ts", "bin", "n"]
        cascade = lambda df, t: rollup_histogram(df, t, keys=("host",))  # noqa: E731
    p_df = p_tbl.read(spark).select(*cols)
    c_df = c_tbl.read(spark).select(*cols)
    expected = cascade(p_df, child).select(*cols)
    extra = c_df.exceptAll(expected)
    missing = expected.exceptAll(c_df)
    n_extra, n_missing = extra.count(), missing.count()
    out = {"ok": n_extra == 0 and n_missing == 0, "extra_rows": n_extra, "missing_rows": n_missing}
    if n_extra or n_missing:
        out["sample_extra"] = [r.asDict() for r in extra.limit(5).collect()]
        out["sample_missing"] = [r.asDict() for r in missing.limit(5).collect()]
    return out


def _safe(fn, *args, **kw) -> dict:
    """An fsck must report, never die: a data-level check over a table
    whose files are gone raises from deep inside Spark — catch and turn it
    into a failed check with the cause."""
    try:
        return fn(*args, **kw)
    except Exception as e:  # noqa: BLE001 - any failure IS the finding
        return {"ok": False, "error": f"{type(e).__name__}: {str(e)[:300]}"}


def verify_publication(
    spark: SparkSession, out_dir: str, deep: bool = False, chunk_hosts: int = 3
) -> dict:
    """Run every check over a published layout; ``ok`` iff all pass."""
    report: dict = {"checks": {}}
    names = ["series_1m"] + [
        f"{kind}_{t}" for t in ("1h", "1d", "30d") for kind in ("rollup", "gapfill", "chunks")
    ]
    for name in names:
        tbl = SnapshotTable(f"{out_dir}/{name}")
        if tbl.exists():
            report["checks"][f"manifest:{name}"] = _safe(check_manifest, tbl, deep=deep)
    report["checks"]["lineage"] = _safe(check_lineage, spark, out_dir)
    for child in ("1h", "1d", "30d"):
        report["checks"][f"tier:{child}"] = _safe(
            check_tier_consistency, spark, out_dir, child
        )
        report["checks"][f"gapfill:{child}"] = _safe(
            check_gapfill_observed, spark, out_dir, child
        )
        report["checks"][f"chunks:{child}"] = _safe(
            check_chunks_decode, spark, out_dir, child, n_hosts=chunk_hosts
        )
    # aux-tier layouts (histogram_job/slo_job) sharing the directory:
    # exact-merge families get manifest + cascade checks; absent families
    # are skipped.
    for prefix, children in (("hist", ("1d", "30d")), ("hdr", ("1d", "30d")), ("slo", ("1d",))):
        if not SnapshotTable(f"{out_dir}/{prefix}_1h").exists():
            continue
        for t in ("1h",) + children:
            tbl = SnapshotTable(f"{out_dir}/{prefix}_{t}")
            if tbl.exists():
                report["checks"][f"manifest:{prefix}_{t}"] = _safe(
                    check_manifest, tbl, deep=deep
                )
        for child in children:
            report["checks"][f"aux:{prefix}:{child}"] = _safe(
                check_aux_cascade, spark, out_dir, prefix, child
            )
    report["ok"] = all(c.get("ok") for c in report["checks"].values())
    return report


def main() -> None:  # pragma: no cover - thin CLI wrapper
    import argparse
    import json

    from ..session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="published layout dir")
    ap.add_argument("--deep", action="store_true", help="also re-read parquet footers")
    ap.add_argument("--chunk-hosts", type=int, default=3)
    args = ap.parse_args()
    spark = get_spark(app_name="verify_job")
    report = verify_publication(spark, args.out, deep=args.deep, chunk_hosts=args.chunk_hosts)
    print(json.dumps(report, default=str))
    raise SystemExit(0 if report["ok"] else 1)


if __name__ == "__main__":  # pragma: no cover
    main()
