"""The north rule's deployment clause, executed for real: the rollup job
runs under ``spark-submit --py-files <zip>`` — a separate driver process,
the engine resolved ONLY from the zip artifact (PYTHONPATH stripped, cwd
outside the repo), master taken from the submit command line — and produces
exactly the tables the in-process API produces.

Reference analog: the reference ships binaries invoked by an external
scheduler (osm2mimir et al., /root/reference/src/bin/osm2mimir.rs:41-163);
spark-submit is the Spark-native equivalent of that process boundary.
"""

import os
import shutil
import subprocess
import sys

import pytest

from mimirsbrunn_spark import build_pyfiles_zip

SPARK_SUBMIT = shutil.which("spark-submit")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_build_pyfiles_zip_is_self_contained(tmp_path):
    """The zip alone (no repo on sys.path) must satisfy the import."""
    import zipfile

    zp = build_pyfiles_zip(str(tmp_path))
    names = zipfile.ZipFile(zp).namelist()
    assert "mimirsbrunn_spark/__init__.py" in names
    assert "mimirsbrunn_spark/jobs/rollup_job.py" in names
    # importable from the zip with the repo stripped from the path
    probe = subprocess.run(
        [sys.executable, "-c", "import mimirsbrunn_spark.jobs.rollup_job as m; print(m.__name__)"],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        env={**os.environ, "PYTHONPATH": zp},
    )
    assert probe.returncode == 0, probe.stderr
    assert probe.stdout.strip() == "mimirsbrunn_spark.jobs.rollup_job"


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_rollup_job_via_spark_submit(spark, small_pages_path, tmp_path):
    zp = build_pyfiles_zip(str(tmp_path))
    out_sub = str(tmp_path / "out_submit")

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["SPARK_DRIVER_MEM"] = "4g"  # irrelevant (submit provides it); belt+braces
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[4]",
            "--driver-memory",
            "4g",
            "--conf",
            "spark.ui.enabled=false",
            "--py-files",
            zp,
            os.path.join(REPO, "tools", "submit_rollup.py"),
            "--pages",
            small_pages_path,
            "--out",
            out_sub,
            "--aggregates",
            "distinct,topn,hist",
            "--maintain",
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # outside the repo: only the zip provides the engine
        env=env,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]

    # the submitted run must equal the in-process run, table for table
    from mimirsbrunn_spark.jobs.rollup_job import run_rollup_job
    from mimirsbrunn_spark.tables import SnapshotTable

    out_ref = str(tmp_path / "out_ref")
    run_rollup_job(spark, small_pages_path, out_ref)
    from mimirsbrunn_spark.jobs.distinct_job import run_distinct_job
    from mimirsbrunn_spark.jobs.histogram_job import run_histogram_job
    from mimirsbrunn_spark.jobs.topn_job import run_topn_job

    run_distinct_job(spark, small_pages_path, out_ref)
    run_topn_job(spark, small_pages_path, out_ref)
    run_histogram_job(spark, small_pages_path, out_ref)
    for name in (
        "series_1m", "rollup_1h", "rollup_1d", "rollup_30d", "gapfill_1h",
        "distinct_1h", "distinct_30d", "topn_1h", "topn_30d", "hist_1h", "hist_30d",
    ):
        a = SnapshotTable(f"{out_sub}/{name}").read(spark)
        b = SnapshotTable(f"{out_ref}/{name}").read(spark)
        if name.startswith("distinct_"):
            # HLL sketch bytes AND (at merge-promotion boundaries) their
            # estimates are merge-order-dependent across parallelism; the
            # serving contract is the estimate within the sketch's error,
            # so compare per-key estimates at 2% (lgK=12 RSE is ~1.6%)
            j = (
                a.selectExpr("host", "bucket_ts", "distinct_est as ea")
                .join(b.selectExpr("host", "bucket_ts", "distinct_est as eb"),
                      ["host", "bucket_ts"], "full")
            )
            bad = j.filter(
                "ea IS NULL OR eb IS NULL OR abs(ea - eb) > greatest(0.02 * eb, 1)"
            ).count()
            assert bad == 0 and j.count() > 0, name
            continue
        assert a.count() == b.count() > 0, name
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, name

    # master really came from the submit command, not from get_spark defaults
    # (main() prints the summary dict with the live sparkContext.master)
    assert "'master': 'local[4]'" in proc.stdout, proc.stdout[-2000:]
    # --maintain ran table maintenance over the output dir
    assert "'maintenance':" in proc.stdout, proc.stdout[-2000:]
