"""Real-Iceberg integration (skip-if-absent, VERDICT r3 item 5): when the
environment ships the iceberg-spark-runtime jar, run the WHOLE rollup job
through ``IcebergTable`` against a local Hadoop catalog and assert
partition replacement and snapshot-id time travel — so the day jars appear
the seam is proven with zero new code. In this sandbox the jar is absent
and the test SKIPS (not deleted); the adapter stays mock-verified down to
the overwrite-condition shape in test_tableio.py.

The Iceberg session needs its OWN static confs (SQL extensions + catalog),
which cannot be applied to the suite's already-running JVM — the test runs
in a clean subprocess instead."""

from __future__ import annotations

import glob
import os
import subprocess
import sys

import pytest


def _find_iceberg_jar() -> str | None:
    candidates: list[str] = []
    spark_home = os.environ.get("SPARK_HOME")
    if spark_home:
        candidates.append(f"{spark_home}/jars/iceberg-spark-runtime*.jar")
    try:
        import pyspark

        candidates.append(
            os.path.join(os.path.dirname(pyspark.__file__), "jars", "iceberg-spark-runtime*.jar")
        )
    except ImportError:  # pragma: no cover
        pass
    candidates.append(os.path.expanduser("~/.ivy2/jars/*iceberg-spark-runtime*.jar"))
    candidates.append("/opt/spark/jars/iceberg-spark-runtime*.jar")
    for pat in candidates:
        hits = glob.glob(pat)
        if hits:
            return hits[0]
    return None


ICEBERG_JAR = _find_iceberg_jar()

_DRIVER = r"""
import sys, os
sys.path.insert(0, os.environ["REPO_DIR"])
from pyspark.sql import SparkSession, functions as F

warehouse = os.environ["ICEBERG_WAREHOUSE"]
spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.jars", os.environ["ICEBERG_JAR"])
    .config(
        "spark.sql.extensions",
        "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
    )
    .config("spark.sql.catalog.it", "org.apache.iceberg.spark.SparkCatalog")
    .config("spark.sql.catalog.it.type", "hadoop")
    .config("spark.sql.catalog.it.warehouse", warehouse)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    .getOrCreate()
)
spark.sql("CREATE NAMESPACE IF NOT EXISTS it.db")

from mimirsbrunn_spark.tableio import IcebergTable
from mimirsbrunn_spark.jobs.rollup_job import run_rollup_job
from mimirsbrunn_spark.synth import write_pages_parquet
from mimirsbrunn_spark.tables import SnapshotTable

pages = os.path.join(warehouse, "pages")
write_pages_parquet(pages, n_rows=3000, n_hosts=10, seed=11)

tables = {}
def factory(name):
    col = "day" if name == "series_1m" else "pkey"
    tables[name] = IcebergTable(spark, f"it.db.{name}", partition_col=col)
    return tables[name]

out = os.path.join(warehouse, "aux")
summary = run_rollup_job(spark, pages, out, job_id="it1", table_factory=factory)
assert summary["series_rows"] > 0

srs = tables["series_1m"]
sid1 = srs.current_snapshot_id()
assert sid1 is not None

# partition replacement: overwrite ONE day with itself filtered; the
# replaced partition must contain exactly the new rows, others untouched
days = [r[0] for r in srs.read(spark).select(F.col("day").cast("string")).distinct().collect()]
d0 = sorted(days)[0]
before_other = srs.read(spark).filter(F.col("day").cast("string") != d0).count()
repl = srs.read(spark).filter(F.col("day").cast("string") == d0).limit(5)
n_repl = repl.count()
srs.replace_partitions(repl, {d0}, partition_by="day")
assert srs.partition_row_count(d0) == n_repl
assert srs.read(spark).filter(F.col("day").cast("string") != d0).count() == before_other

# snapshot-id time travel: the pre-replace snapshot still reads the old rows
sid2 = srs.current_snapshot_id()
assert sid2 != sid1
assert srs.read_at(spark, sid1).count() > srs.read_at(spark, sid2).count()

# metadata partition drop
srs.drop_partition_values({d0})
assert srs.partition_row_count(d0) == 0

# the published tiers match a SnapshotTable control run
out2 = os.path.join(warehouse, "control")
run_rollup_job(spark, pages, out2, job_id="it2")
for name in ("rollup_1h", "rollup_1d", "rollup_30d"):
    a = tables[name].read(spark)
    b = SnapshotTable(os.path.join(out2, name)).read(spark)
    cols = sorted(set(a.columns) & set(b.columns))
    a, b = a.select(*cols), b.select(*cols)
    assert a.count() == b.count() > 0, name
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, name

print("ICEBERG_IT_OK")
"""


@pytest.mark.skipif(
    ICEBERG_JAR is None,
    reason="iceberg-spark-runtime jar not present in this environment",
)
def test_rollup_job_against_real_iceberg_catalog(tmp_path):
    env = dict(
        os.environ,
        REPO_DIR=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ICEBERG_WAREHOUSE=str(tmp_path / "warehouse"),
        ICEBERG_JAR=ICEBERG_JAR or "",
    )
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER],
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-4000:]
    assert "ICEBERG_IT_OK" in proc.stdout
