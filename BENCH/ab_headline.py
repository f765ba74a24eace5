#!/usr/bin/env python
"""Throttle-immune cross-round headline comparison (VERDICT r4 task 2).

Interleaves HEAD vs a pinned prior-round checkout on the most expensive
headline queries: each measurement is one fresh subprocess (own JVM) that
times ONLY the query region, and runs alternate A,B,A,B,... so every pair
is time-adjacent — the host's burst throttle (2-4x swings, BENCH/BASELINE.md)
hits both sides of a pair equally and the per-pair RATIO is meaningful even
when raw seconds are not. This is the methodology scaling_procs.py uses for
the north-rule scaling numbers, applied to cross-round perf claims.

Usage:
  python BENCH/ab_headline.py <ref_commit> [reps] [out.json]

Both checkouts read the SAME cached bench pages table and the SAME
materialized series_1m/rollup_1h parquet (prepared once with HEAD), so the
pair measures code, not input generation.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "1000000"))

# the 6 most expensive headline queries in BENCH/bench_r4_best.json —
# together ~40% of headline_total_sec, and the ones whose regression would
# matter at 100 TB (shuffle-shape-dominated).
QUERIES = (
    "pages_gapfill_1h",
    "pages_cascade",
    "pages_chunks_1h",
    "pages_series_1m",
    "codec_roundtrip",
    "gapfill_1h",
)

WORKER = r"""
import json, sys, time
root, sf_dir, cpus, pages, work, names = (
    sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4], sys.argv[5],
    sys.argv[6].split(","),
)
sys.path.insert(0, root)
from mimirsbrunn_spark.session import get_spark
from mimirsbrunn_spark import codecs, gapfill, gate, series, tiers

spark = get_spark(app_name="ab_headline", master=f"local[{cpus}]",
                  shuffle_partitions=cpus)

def force(df):
    df.write.format("noop").mode("overwrite").save()

pages_df = spark.read.parquet(pages)
s1m = spark.read.parquet(f"{work}/series_1m")
hs = tiers.host_series(spark.read.parquet(f"{work}/rollup_1h"))
core = gate.core_queries()

RUNNERS = {
    "pages_series_1m": lambda: force(series.series_1m(pages_df)),
    "pages_cascade": lambda: [force(t) for t in tiers.cascade(s1m).values()],
    "pages_gapfill_1h": lambda: force(gapfill.gapfill(hs, "1h")),
    "pages_chunks_1h": lambda: force(codecs.encode_chunks(hs, "1h")),
    "codec_roundtrip": lambda: force(core["codec_roundtrip"](spark, sf_dir)),
    "gapfill_1h": lambda: force(core["gapfill_1h"](spark, sf_dir)),
}

# one untimed warm-up pass (JIT, file listing) so the timed region is steady
for n in names:
    RUNNERS[n]()
out = {}
for n in names:
    t0 = time.time()
    RUNNERS[n]()
    out[n] = round(time.time() - t0, 3)
print("ABRESULT " + json.dumps(out))
spark.stop()
"""


def _run_side(root: str, pages: str, work: str) -> dict[str, float]:
    p = subprocess.run(
        [sys.executable, "-c", WORKER, root, SF_DIR, str(CPUS), pages, work,
         ",".join(QUERIES)],
        capture_output=True, text=True, cwd="/tmp",
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(f"worker failed for {root}:\n{p.stderr[-2000:]}")


def main() -> None:
    ref = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    out_path = sys.argv[3] if len(sys.argv) > 3 else None

    ref_root = tempfile.mkdtemp(prefix="ab_ref_")
    subprocess.run(["git", "-C", REPO, "worktree", "add", "--detach",
                    ref_root, ref], check=True, capture_output=True)
    try:
        # shared prep with HEAD code: bench pages cache + materialized tiers
        prep = (
            "import sys; sys.path.insert(0, %r)\n"
            "from mimirsbrunn_spark.session import get_spark\n"
            "from mimirsbrunn_spark import series, tiers\n"
            "import bench\n"
            "spark = get_spark(app_name='ab_prep', master='local[%d]', shuffle_partitions=%d)\n"
            "pages = bench._pages_cache(spark, %d)\n"
            "df = spark.read.parquet(pages)\n"
            "series.series_1m(df).write.mode('overwrite').parquet(%r)\n"
            "spark.read.parquet(%r).transform(lambda d: tiers.cascade(d)['1h'])"
            ".write.mode('overwrite').parquet(%r)\n"
            "print('PREP', pages)\n"
        )
        work = tempfile.mkdtemp(prefix="ab_work_")
        prep_src = prep % (REPO, CPUS, CPUS, BENCH_ROWS,
                           f"{work}/series_1m", f"{work}/series_1m",
                           f"{work}/rollup_1h")
        p = subprocess.run([sys.executable, "-c", prep_src],
                           capture_output=True, text=True, cwd="/tmp")
        pages = next(l.split()[1] for l in p.stdout.splitlines()
                     if l.startswith("PREP"))

        pairs: list[dict] = []
        for rep in range(reps):
            t0 = time.time()
            # alternate leg order: a periodic host throttle whose phase
            # aligns with the pair cadence would otherwise hit the SAME
            # side's leg every rep (observed: 3/3 reps slowing only the
            # second leg's series_1m 6x while a manual replay showed
            # parity) — order flipping turns that bias into noise the
            # median rejects
            if rep % 2 == 0:
                head = _run_side(REPO, pages, work)
                refr = _run_side(ref_root, pages, work)
            else:
                refr = _run_side(ref_root, pages, work)
                head = _run_side(REPO, pages, work)
            pairs.append({
                "head": head, "ref": refr, "head_first": rep % 2 == 0,
                "ratio": {q: round(head[q] / refr[q], 3) for q in QUERIES},
                "wall": round(time.time() - t0, 1),
            })
            print(f"rep {rep}: ratios {pairs[-1]['ratio']}", file=sys.stderr)

        summary = {}
        for q in QUERIES:
            rs = sorted(p["ratio"][q] for p in pairs)
            summary[q] = {
                "head_min": min(p["head"][q] for p in pairs),
                "ref_min": min(p["ref"][q] for p in pairs),
                "pair_ratios": rs,
                "median_ratio": rs[len(rs) // 2],
            }
        med = sorted(s["median_ratio"] for s in summary.values())
        result = {
            "ref_commit": ref,
            "reps": reps,
            "queries": summary,
            "median_of_median_ratios": med[len(med) // 2],
            "note": "ratio = HEAD_sec / ref_sec per time-adjacent pair; "
                    "<1 means HEAD faster. Paired to cancel host throttle.",
        }
        line = json.dumps(result)
        print(line)
        if out_path:
            with open(out_path, "w") as fh:
                fh.write(line + "\n")
    finally:
        subprocess.run(["git", "-C", REPO, "worktree", "remove", "--force",
                        ref_root], capture_output=True)


if __name__ == "__main__":
    main()
