#!/usr/bin/env python
"""Scaling-efficiency harness (north rule): run the identical rollup workload
at two parallelism levels — N and 4N cores, the sandbox proxy for N vs 4N
executors — and report throughput at both plus efficiency
(throughput_4N / throughput_N) / 4. Target ≥ 0.8.

Hardware note (measured, see BENCH/BASELINE.md): ≥16 concurrent threads
sit above the host's bursty CPU cap, so the clean comparison is
local[1] vs local[4] (the default here), run under hard cpusets.

Methodology: each level runs in a fresh pinned subprocess (own JVM,
taskset cpuset, warm-up pass excluded from timing), fixed
shuffle_partitions across levels (comparing cluster sizes, not plans),
`reps` repetitions interleaved across levels, max-throughput taken per
level; BENCH/BASELINE.md additionally reports per-pair efficiencies and
the 4-independent-JVM executor-proxy control.

Usage: python BENCH/scaling.py [n_rows] [levelA] [levelB] [reps]
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
# shuffle partitions are sized by DATA (task input ~30 MB: the dedup/agg
# hash tables then fit in L3 instead of thrashing DRAM) and held IDENTICAL
# across levels — the config policy a real deployment uses; per-level
# retuning would compare two different plans, not two cluster sizes.
spark = get_spark(app_name=f"scaling[{cpus}]", master=f"local[{cpus}]",
                  shuffle_partitions=64,
                  extra_conf={{"spark.sql.files.maxPartitionBytes": "16m"}})
pages = spark.read.parquet({pages!r})
n = pages.count()

# warm-up (JIT + listing), excluded from timing
series.series_1m(pages.limit(100000)).write.format("noop").mode("overwrite").save()

t0 = time.time()
# materialize the base tier once, cascade from it — the shape rollup_job
# runs in production (each tier derives from the previous MATERIALIZED
# tier); without this the two tier writes re-execute the full raw pass
base = series.series_1m(pages).persist()
base.count()
all_t = tiers.cascade(base)
all_t["1h"].write.format("noop").mode("overwrite").save()
all_t["30d"].write.format("noop").mode("overwrite").save()
elapsed = time.time() - t0
print(json.dumps({{"cpus": cpus, "rows": n, "seconds": round(elapsed, 3),
                  "docs_per_sec": round(n / elapsed)}}))
spark.stop()
"""


def bench_table(n_rows: int) -> str:
    path = f"/tmp/mimir_bench_cache/pages_spark_{n_rows}"
    if not os.path.exists(path):
        gen = (
            "import sys; sys.path.insert(0, {repo!r})\n"
            "from mimirsbrunn_spark.session import get_spark\n"
            "from mimirsbrunn_spark.synth_spark import write_bench_pages\n"
            "spark = get_spark(master='local[32]')\n"
            f"write_bench_pages(spark, {path!r}, {n_rows})\n"
            "spark.stop()\n"
        ).format(repo=REPO)
        subprocess.run([sys.executable, "-c", gen], check=True, cwd="/tmp")
    return path


def run_level(cpus: int, pages: str, pin: bool = True) -> dict:
    """One fresh-JVM run of the workload at ``cpus`` parallelism.

    ``pin=True`` (default) wraps the process in ``taskset -c 0..cpus-1``: a
    hard cpuset, so JVM service threads (GC, JIT, shuffle/netty pools) CANNOT
    borrow idle host cores the way a bare local[N] lets them — local[1]
    without the pin is really "1 compute thread + 32 CPUs of free helpers",
    which overstates small-N throughput and understates scaling efficiency.
    Java 17 sizes its pools from the affinity mask, so this faithfully
    emulates an N-core executor host."""
    code = WORKLOAD.format(repo=REPO, cpus=cpus, pages=pages)
    cmd = [sys.executable, "-c", code]
    if pin:
        cmd = ["taskset", "-c", f"0-{cpus - 1}" if cpus > 1 else "0"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, check=True, cwd="/tmp")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    a = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    b = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    pages = bench_table(n_rows)

    runs: dict[int, list[dict]] = {a: [], b: []}
    for _ in range(reps):  # interleave to balance drift
        for level in (a, b):
            runs[level].append(run_level(level, pages))
            print(f"  run level={level}: {runs[level][-1]}", file=sys.stderr)

    best = {
        lvl: max(rs, key=lambda r: r["docs_per_sec"]) for lvl, rs in runs.items()
    }
    ratio = b / a
    eff = (best[b]["docs_per_sec"] / best[a]["docs_per_sec"]) / ratio
    print(
        json.dumps(
            {
                "levels": [best[a], best[b]],
                "all_runs": runs,
                "scaling_efficiency": round(eff, 3),
                "target": 0.8,
                "passed": eff >= 0.8,
                "methodology": "hard cpuset per level (taskset -c 0..N-1); "
                "fresh JVM per run; interleaved reps; max-throughput per level",
            }
        )
    )


if __name__ == "__main__":
    main()
