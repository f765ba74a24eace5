#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line.

Two workload groups:
- gate queries (events-derived pages rollups + gap-fill) at the sf dir;
- the flagship synthetic-pages rollup pipeline (dedup → salted 1m series →
  tier cascade → gap-fill → chunk encode) on a cached deterministic pages
  table (SPARK_GRAFT_BENCH_ROWS, default 1M rows) — reported as
  rollup_mdocs_per_sec, the BASELINE.md throughput metric.

Timings use a noop-format write (full execution, no driver collect).

Noise control: the sandbox host throttles CPU in bursts (identical runs vary
2-4x — measured, see BENCH/BASELINE.md), so each query runs
$SPARK_GRAFT_BENCH_REPS times (default 3) and the MIN is reported — the
standard noise-robust estimator on shared VMs. Set reps=1 to reproduce the
round-1 single-shot methodology.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _calibrate(spark) -> float:
    """Fixed pure-JVM probe (~1-2 s on an unthrottled host): a codegen'd
    range-sum plus one small shuffle. Run at the start, middle and end of
    the bench; the MIN estimates the host's clean speed for this window, so
    cross-round comparisons can use throttle-normalized numbers
    (norm = sec / calib_sec) instead of trusting raw wall clock across
    rounds — VERDICT r4 task 2."""
    from pyspark.sql import functions as F

    t0 = time.time()
    spark.range(150_000_000).select(
        F.sum(F.col("id") % F.lit(97)).alias("s")
    ).collect()
    _force(
        spark.range(8_000_000)
        .groupBy(F.pmod(F.col("id"), F.lit(512)).alias("k"))
        .count()
    )
    return round(time.time() - t0, 3)


def _pages_cache(spark, n_rows: int) -> str:
    """Bench pages table, generated distributed (synth_spark) and cached."""
    path = f"/tmp/mimir_bench_cache/pages_spark_{n_rows}"
    if not os.path.exists(path):
        from mimirsbrunn_spark.synth_spark import write_bench_pages

        write_bench_pages(spark, path, n_rows)
    return path


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    bench_rows = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "1000000"))
    reps = max(int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")), 1)

    spreads: dict[str, dict] = {}

    def timed(fn, _name=None) -> float:
        # report the MIN (noise-robust on a throttling host) and publish the
        # full rep spread so a regression is distinguishable from a throttle
        # window without re-running (min vs med divergence = host noise)
        times = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        times.sort()
        if _name is not None:
            spreads[_name] = {
                "min": round(times[0], 3),
                "med": round(times[len(times) // 2], 3),
                "max": round(times[-1], 3),
                "n": len(times),
            }
        return round(times[0], 3)

    from mimirsbrunn_spark import codecs, gapfill, gate, series, tiers
    from mimirsbrunn_spark.session import get_spark

    spark = get_spark(
        app_name="bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    pages_path = _pages_cache(spark, bench_rows)

    calib: list[float] = [_calibrate(spark)]
    timings: dict[str, float] = {}

    # group 1: gate queries at the sf dir
    for name, fn in gate.core_queries().items():
        timings[name] = timed(lambda fn=fn: _force(fn(spark, sf_dir)), _name=name)

    calib.append(_calibrate(spark))

    # group 2: flagship pages pipeline at bench scale. Tiers are MATERIALIZED
    # continuous aggregates (the production shape — rollup_job publishes each
    # tier as a table); downstream stages read the materialized parent tier
    # rather than recomputing the raw scan.
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="bench_tiers_")
    pages = spark.read.parquet(pages_path)
    n_docs = pages.count()

    timings["pages_series_1m"] = timed(
        lambda: series.series_1m(pages).write.mode("overwrite").parquet(f"{work}/series_1m"),
        _name="pages_series_1m",
    )

    def _cascade():
        all_t = tiers.cascade(spark.read.parquet(f"{work}/series_1m"))
        all_t["1h"].write.mode("overwrite").parquet(f"{work}/rollup_1h")
        _force(all_t["1d"])
        _force(all_t["30d"])

    timings["pages_cascade"] = timed(_cascade, _name="pages_cascade")

    hourly = spark.read.parquet(f"{work}/rollup_1h")
    hs = tiers.host_series(hourly)
    timings["pages_gapfill_1h"] = timed(lambda: _force(gapfill.gapfill(hs, "1h")), _name="pages_gapfill_1h")
    timings["pages_chunks_1h"] = timed(lambda: _force(codecs.encode_chunks(hs, "1h")), _name="pages_chunks_1h")

    shutil.rmtree(work, ignore_errors=True)

    # group 3: the SERVING reads — the engine's product (VERDICT r3 item 8).
    # Publish once per bench size (cached like the pages table: rollup_job →
    # partitioned/zone-mapped serving tables + compressed chunks), then time
    # the four read paths a dashboard/API tier actually issues. Reported in
    # their own section (not in headline_total_sec, which is pinned to the
    # round-1 composition for cross-round comparability).
    from pyspark.sql import functions as F

    from mimirsbrunn_spark import query_api
    from mimirsbrunn_spark.tables import SnapshotTable

    pub = f"/tmp/mimir_bench_cache/published_{bench_rows}"
    if not SnapshotTable(f"{pub}/rollup_1h").exists():
        from mimirsbrunn_spark.jobs.rollup_job import run_rollup_job

        run_rollup_job(spark, pages_path, pub, job_id="bench_publish")
    # gate each publish on ITS OWN table so an interrupted prior run can't
    # leave slo_1h missing while hdr_1h exists (ADVICE r4 #2)
    if not SnapshotTable(f"{pub}/hdr_1h").exists():
        from mimirsbrunn_spark.jobs.histogram_job import run_histogram_job

        run_histogram_job(spark, pages_path, pub, sketch="hdr")
    if not SnapshotTable(f"{pub}/slo_1h").exists():
        from mimirsbrunn_spark.jobs.slo_job import run_slo_job

        run_slo_job(spark, pages_path, pub, "page_size % 7 = 0")
    srs = SnapshotTable(f"{pub}/series_1m").read(spark)
    mn, mx = srs.agg(
        F.min(F.col("bucket_ts").cast("long")), F.max(F.col("bucket_ts").cast("long"))
    ).first()
    hosts = [r[0] for r in srs.select("host").distinct().limit(3).collect()]
    mid0 = mn + (mx - mn) // 4
    mid1 = mn + 3 * (mx - mn) // 4

    serving: dict[str, float] = {}
    serving["read_rollup_1h_window"] = timed(
        lambda: _force(
            query_api.read_rollup(spark, pub, "1h", t0=mid0, t1=mid1, hosts=hosts)
        ),
        _name="read_rollup_1h_window",
    )
    serving["read_range_total_full"] = timed(
        lambda: _force(query_api.read_range_total(spark, pub, mn, mx + 60)),
        _name="read_range_total_full",
    )
    serving["read_realtime_1h"] = timed(
        lambda: _force(query_api.read_realtime(spark, pub, "1h", pages)),
        _name="read_realtime_1h",
    )
    serving["read_chunks_1h_hosts"] = timed(
        lambda: _force(
            query_api.read_chunks(spark, pub, "1h", t0=mid0, t1=mid1, hosts=hosts)
        ),
        _name="read_chunks_1h_hosts",
    )
    serving["read_plot_m4"] = timed(
        lambda: _force(query_api.read_plot(spark, pub, mn, mx + 60, n_px=800)),
        _name="read_plot_m4",
    )

    from mimirsbrunn_spark.jobs.histogram_job import read_quantile
    from mimirsbrunn_spark.jobs.slo_job import read_burn

    serving["read_hdr_p95_window"] = timed(
        lambda: _force(
            read_quantile(spark, pub, 0.95, tier="1h", t0=mid0, t1=mid1, sketch="hdr")
        ),
        _name="read_hdr_p95_window",
    )
    serving["read_burn_window"] = timed(
        lambda: _force(read_burn(spark, pub, t0=mid0, t1=mid1, hosts=hosts)),
        _name="read_burn_window",
    )

    calib.append(_calibrate(spark))

    pipeline_sec = timings["pages_series_1m"] + timings["pages_cascade"]
    total = round(sum(timings.values()), 3)
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    calib_min = min(calib)

    # Compact headline (the driver records only the LAST ~2000 stdout chars
    # — BENCH_r03/r04.json both came back "parsed": null because the full
    # spread outgrew that tail, VERDICT r4 task 1). The full per-query
    # spreads + serving reads + calibration samples go to a committed file;
    # the final stdout line stays under the driver's window.
    full = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "bench_rows": n_docs,
        "rollup_mdocs_per_sec": round(n_docs / pipeline_sec / 1e6, 4),
        "cpus": cpus,
        "reps": reps,
        "calib_sec": calib,
        "calib_min": calib_min,
        "norm_total": round(total / calib_min, 3),
        "serving": serving,
        "spreads": spreads,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    full_path = os.environ.get(
        "SPARK_GRAFT_BENCH_FULL_OUT", os.path.join(here, "BENCH", "bench_last_full.json")
    )
    try:
        os.makedirs(os.path.dirname(full_path), exist_ok=True)
        with open(full_path, "w") as fh:
            json.dump(full, fh, indent=1)
    except OSError:
        full_path = None

    compact = {
        k: full[k]
        for k in (
            "metric", "value", "unit", "sf", "bench_rows",
            "rollup_mdocs_per_sec", "cpus", "calib_min", "norm_total",
        )
    }
    compact["queries"] = {k: round(v, 2) for k, v in timings.items()}
    compact["serving_total_sec"] = round(sum(serving.values()), 2)
    compact["full"] = "BENCH/bench_last_full.json" if full_path else None
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900:  # last-resort: never outgrow the driver tail again
        compact["queries"] = dict(
            sorted(compact["queries"].items(), key=lambda kv: -kv[1])[:20]
        )
        line = json.dumps(compact, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
