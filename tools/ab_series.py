#!/usr/bin/env python
"""A/B: fused single-shuffle dedup+salted-agg (r2 shape, series.series_1m)
vs the r1 two-shuffle shape (dropDuplicates → salted_agg) on the
pages_series_1m bench workload — the 1m series computed from the cached
bench pages table and WRITTEN to parquet (the exact workload that regressed
4.0 s → 6.66 s between BENCH_r01 and BENCH_r02; VERDICT r2 item 2).

Shapes are run INTERLEAVED (A B A B …) so a host throttle window hits both;
min + median per shape are printed as one JSON line.

  SPARK_GRAFT_BENCH_ROWS (default 1_000_000)   input size
  SPARK_GRAFT_AB_REPS   (default 5)            reps per shape
  SPARK_GRAFT_CPUS      (default 32)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mimirsbrunn_spark import series  # noqa: E402
from mimirsbrunn_spark.ingest import with_host  # noqa: E402
from mimirsbrunn_spark.series import bucket_col, salted_agg  # noqa: E402
from mimirsbrunn_spark.session import get_spark  # noqa: E402


def _project(pages):
    return with_host(pages).select(
        "url",
        "warc_ts",
        "host",
        bucket_col("warc_ts", "1m").alias("bucket_ts"),
        "lang",
        "page_size",
    )


def series_1m_two_shuffle(pages, n_salts: int = 16):
    """The r1 shape: full-row dedup shuffle, then the salted partial-agg
    shuffle — two passes of the projected data."""
    deduped = _project(pages).dropDuplicates()
    return salted_agg(
        deduped,
        keys=["host", "bucket_ts", "lang"],
        aggs=[
            (lambda: F.count(F.lit(1)), lambda c: F.sum(c), "doc_count"),
            (lambda: F.sum("page_size"), lambda c: F.sum(c), "bytes_sum"),
        ],
        n_salts=n_salts,
    )


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_rows = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "1000000"))
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "5"))
    spark = get_spark(app_name="ab_series", master=f"local[{cpus}]", shuffle_partitions=cpus)

    path = f"/tmp/mimir_bench_cache/pages_spark_{n_rows}"
    if not os.path.exists(path):
        from mimirsbrunn_spark.synth_spark import write_bench_pages

        write_bench_pages(spark, path, n_rows)
    pages = spark.read.parquet(path)
    work = tempfile.mkdtemp(prefix="ab_series_")

    shapes = {
        "fused_one_shuffle": lambda: series.series_1m(pages),
        "two_shuffle_r1": lambda: series_1m_two_shuffle(pages),
    }
    # equality sanity once (cheap at any size): both shapes same result
    a = shapes["fused_one_shuffle"]()
    b = shapes["two_shuffle_r1"]()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, "shapes disagree"

    times: dict[str, list[float]] = {k: [] for k in shapes}
    for r in range(reps):
        for name, mk in shapes.items():
            t0 = time.time()
            mk().write.mode("overwrite").parquet(f"{work}/{name}")
            times[name].append(round(time.time() - t0, 3))
    shutil.rmtree(work, ignore_errors=True)

    out = {
        "workload": "pages_series_1m (compute + parquet write)",
        "rows": n_rows,
        "cpus": cpus,
        "reps": reps,
    }
    for name, ts in times.items():
        s = sorted(ts)
        out[name] = {"min": s[0], "med": s[len(s) // 2], "all": ts}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
