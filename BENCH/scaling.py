#!/usr/bin/env python
"""Scaling-efficiency harness (north rule): run the identical rollup workload
at two parallelism levels — local[8] vs local[32], the sandbox proxy for N vs
4N executors — and report throughput at both plus efficiency
(throughput_32 / throughput_8) / 4. Target ≥ 0.8.

Each level runs in a fresh subprocess (own JVM) so nothing is warm-shared;
the workload is the flagship pipeline: pages scan → dedup → salted 1m series
→ 1h/1d/30d cascade → materialize. Usage:

    python BENCH/scaling.py [n_rows]        # default 2_000_000
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKLOAD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from mimirsbrunn_spark.session import get_spark
from mimirsbrunn_spark import series, tiers

cpus = {cpus}
spark = get_spark(app_name=f"scaling[{cpus}]", master=f"local[{cpus}]",
                  shuffle_partitions=cpus)
pages = spark.read.parquet({pages!r})
n = pages.count()

# warm-up (JIT + file listing), excluded from timing
series.series_1m(pages.limit(10000)).write.format("noop").mode("overwrite").save()

t0 = time.time()
base = series.series_1m(pages)
all_t = tiers.cascade(base)
all_t["1h"].write.format("noop").mode("overwrite").save()
all_t["30d"].write.format("noop").mode("overwrite").save()
elapsed = time.time() - t0
print(json.dumps({{"cpus": cpus, "rows": n, "seconds": round(elapsed, 3),
                  "docs_per_sec": round(n / elapsed)}}))
spark.stop()
"""


def run_level(cpus: int, pages: str) -> dict:
    code = WORKLOAD.format(repo=REPO, cpus=cpus, pages=pages)
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        check=True,
        cwd="/tmp",
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    sys.path.insert(0, REPO)
    from bench import _pages_cache

    pages = _pages_cache(n_rows)
    results = [run_level(c, pages) for c in (8, 32)]
    eff = (results[1]["docs_per_sec"] / results[0]["docs_per_sec"]) / 4
    report = {
        "levels": results,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "passed": eff >= 0.8,
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
