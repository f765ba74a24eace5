"""SparkSession factory with the engine's standard configuration.

Determinism requirements (SURVEY.md §7.5): UTC session timezone, Arrow
enabled, AQE on (skew-join backstop). ``spark.sql.shuffle.partitions``
defaults to the local core count — at cluster scale this is set per-job via
spark-submit --conf; nothing in the engine assumes a particular value.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mimirsbrunn_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    # Make the package importable inside Python workers no matter where the
    # driver was launched from. Local mode: workers inherit the env, so
    # PYTHONPATH is enough. Cluster mode: ship the package with
    # ``spark-submit --py-files`` (jobs/README) — this is a no-op there.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pypath = os.environ.get("PYTHONPATH", "")
    if repo_root not in pypath.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{repo_root}{os.pathsep}{pypath}" if pypath else repo_root
        )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    shuffle_partitions = shuffle_partitions or cpus
    # Under spark-submit the JVM gateway is already up (PythonRunner exports
    # PYSPARK_GATEWAY_PORT) and carries --master/--driver-memory from the
    # submit command; setting them here would silently override the cluster
    # deployment. Outside spark-submit (plain python, tests, notebooks) we
    # must pick a master ourselves.
    under_submit = "PYSPARK_GATEWAY_PORT" in os.environ and master is None
    builder = SparkSession.builder.appName(app_name)
    if not under_submit:
        builder = builder.master(master or f"local[{cpus}]").config(
            # local mode: the driver heap IS the cluster memory — size it for
            # the thread count or 32 executor threads GC-thrash an 8g default
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEM", "48g"),
        )
    builder = (
        builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # naive parquet timestamps are UTC instants (not NTZ): keeps epoch
        # arithmetic (cast to long) legal and aligned with the pandas oracle
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # INT96 timestamps (the legacy default) carry NO parquet column
        # statistics — TIMESTAMP_MICROS makes timestamp zone maps real
        # (tables.commit stats_cols) and is the type every modern reader
        # (Iceberg, DuckDB, pyarrow) expects
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "snappy")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
