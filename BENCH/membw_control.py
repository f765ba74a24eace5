#!/usr/bin/env python
"""Platform memory-bandwidth control for the N-vs-4N scaling proxy.

Runs the SAME fleet shape as ``scaling_procs.py`` — N vs 4N separate
processes, one pinned core each, file-barrier-synchronized timed regions —
but the per-process workload is pure streaming memory traffic (numpy
copy + reduce sweeps over a buffer far larger than LLC; no JVM, no Spark,
no Python-level loops). What it measures is the HOST's aggregate-bandwidth
retention when 4x as many cores stream concurrently: the hard ceiling any
shuffle/scan-bound engine inherits on this box. If the engine's measured
N->4N efficiency matches this control's, the shortfall is the platform's
memory subsystem, not the engine's partitioning.

Usage: python BENCH/membw_control.py [levelA] [levelB] [reps] [out.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

WORKLOAD = r"""
import json, os, time
import numpy as np

# 512 MiB of float64 — ~100x a server-class LLC slice; sweeps stream from DRAM
a = np.random.default_rng(0).random(64 * 1024 * 1024)
b = np.empty_like(a)
nbytes_per_sweep = a.nbytes * 3  # copyto: read+write; sum: read

# warm-up (page-fault the buffers), excluded from timing
np.copyto(b, a); s = a.sum()

open({ready!r}, "w").close()
while not os.path.exists({go!r}):
    time.sleep(0.05)

t0 = time.time()
sweeps = 0
acc = 0.0
while time.time() - t0 < {seconds}:
    np.copyto(b, a)
    acc += b.sum()
    sweeps += 1
elapsed = time.time() - t0
gbps = sweeps * nbytes_per_sweep / elapsed / 1e9
print(json.dumps({{"sweeps": sweeps, "seconds": round(elapsed, 3),
                  "gb_per_sec": round(gbps, 3), "acc": acc}}))
"""


def run_level(n_procs: int, seconds: int = 20) -> dict:
    with tempfile.TemporaryDirectory(prefix="membw_") as bar:
        go = os.path.join(bar, "go")
        procs = []
        for k in range(n_procs):
            ready = os.path.join(bar, f"ready_{k}")
            code = WORKLOAD.format(ready=ready, go=go, seconds=seconds)
            p = subprocess.Popen(
                ["taskset", "-c", str(k), sys.executable, "-c", code],
                stdout=subprocess.PIPE,
                stderr=subprocess.DEVNULL,
                text=True,
                cwd="/tmp",
            )
            procs.append((k, ready, p))
        deadline = time.time() + 300
        while time.time() < deadline:
            if all(os.path.exists(r) for _, r, _ in procs):
                break
            for _, _, p in procs:
                if p.poll() not in (None, 0):
                    raise RuntimeError("control process died before barrier")
            time.sleep(0.2)
        else:
            raise RuntimeError("barrier timeout")
        open(go, "w").close()
        results = []
        for k, _, p in procs:
            out, _ = p.communicate(timeout=600)
            if p.returncode != 0:
                raise RuntimeError(f"control proc {k} failed")
            r = json.loads(out.strip().splitlines()[-1])
            r.pop("acc", None)
            r["core"] = k
            results.append(r)
    return {
        "n_procs": n_procs,
        "per_proc": results,
        "aggregate_gb_per_sec": round(sum(r["gb_per_sec"] for r in results), 3),
    }


def main() -> None:
    a = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    out_path = sys.argv[4] if len(sys.argv) > 4 else None

    runs: dict[int, list[dict]] = {a: [], b: []}
    for i in range(reps):  # interleave to balance host drift
        for level in (a, b):
            r = run_level(level)
            runs[level].append(r)
            print(
                f"  rep {i} level={level}: agg={r['aggregate_gb_per_sec']} GB/s "
                f"({[p['gb_per_sec'] for p in r['per_proc']]})",
                file=sys.stderr,
            )

    best = {
        lvl: max(rs, key=lambda r: r["aggregate_gb_per_sec"])
        for lvl, rs in runs.items()
    }
    ratio = b / a
    eff = (
        best[b]["aggregate_gb_per_sec"] / best[a]["aggregate_gb_per_sec"]
    ) / ratio
    pair_effs = [
        round(
            (rb["aggregate_gb_per_sec"] / ra["aggregate_gb_per_sec"]) / ratio, 3
        )
        for ra, rb in zip(runs[a], runs[b])
    ]
    out = {
        "control": "pure streaming memory bandwidth (numpy copy+reduce, "
        "512 MiB/proc), same pinned-process + barrier fleet as "
        "scaling_procs.py",
        "levels": best,
        "all_runs": {str(k): v for k, v in runs.items()},
        "bandwidth_scaling_efficiency": round(eff, 3),
        "per_pair_efficiencies": pair_effs,
    }
    print(json.dumps({k: out[k] for k in
                      ("bandwidth_scaling_efficiency", "per_pair_efficiencies")}))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
