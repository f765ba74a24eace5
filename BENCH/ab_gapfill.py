"""Interleaved A/B: spine-union gapfill (HEAD~2, 3 Exchanges) vs the
single-Exchange anchor rewrite, on a synthetic host series large enough for
shuffle shape to dominate (throttle-robust: interleaved pairs, min-of-reps
reported with all raw numbers)."""
import importlib.util
import json
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from mimirsbrunn_spark.session import get_spark

# old implementation from git, loaded as a separate module
old_src = subprocess.run(
    ["git", "-C", "/root/repo", "show", "fd388e6~1:mimirsbrunn_spark/gapfill.py"],
    capture_output=True, text=True, check=True,
).stdout
old_src = old_src.replace(
    "from .series import TIER_SECONDS",
    "from mimirsbrunn_spark.series import TIER_SECONDS",
)
open("/tmp/gapfill_old.py", "w").write(old_src)
spec = importlib.util.spec_from_file_location("gapfill_old", "/tmp/gapfill_old.py")
old = importlib.util.module_from_spec(spec)
sys.modules["gapfill_old"] = old
spec.loader.exec_module(old)
from mimirsbrunn_spark import gapfill as new

spark = get_spark(app_name="ab_gapfill", master="local[32]", shuffle_partitions=64)

# synthetic rolled-up 1h host series: 3000 hosts x 2000 hourly buckets,
# ~35% of buckets observed (pseudo-random gaps) -> ~2.1M observed rows
n_hosts, n_buckets = 3000, 2000
base = (
    spark.range(n_hosts * n_buckets)
    .filter(F.pmod(F.xxhash64("id"), F.lit(100)) < 35)
    .select(
        F.concat(F.lit("h"), (F.col("id") % n_hosts).cast("string")).alias("host"),
        F.timestamp_seconds(
            F.lit(1704067200) + (F.col("id") / n_hosts).cast("long") * 3600
        ).alias("bucket_ts"),
        F.pmod(F.xxhash64("id"), F.lit(50)).alias("doc_count"),
        (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(10_000)) * 17).alias("bytes_sum"),
    )
)
base = base.cache()
n_obs = base.count()
print("observed rows:", n_obs, file=sys.stderr)

def run(mod):
    t = time.time()
    out = mod.gapfill(base, "1h")
    n = out.count()
    return time.time() - t, n

runs = {"old": [], "new": []}
rows = {}
for rep in range(3):
    for name, mod in (("old", old), ("new", new)):
        sec, n = run(mod)
        runs[name].append(round(sec, 3))
        rows[name] = n
assert rows["old"] == rows["new"], rows
print(json.dumps({
    "workload": f"{n_hosts} hosts x {n_buckets} 1h buckets, {n_obs} observed rows (35%), metrics=2",
    "output_rows": rows["new"],
    "old_spine_union_sec": runs["old"],
    "new_single_exchange_sec": runs["new"],
    "min_old": min(runs["old"]),
    "min_new": min(runs["new"]),
    "speedup_min_over_min": round(min(runs["old"]) / min(runs["new"]), 3),
}))
spark.stop()
