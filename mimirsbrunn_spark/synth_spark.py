"""Distributed deterministic pages generator (bench/scaling scale).

The pandas generator (synth.py) is the *correctness* fixture source (it pairs
with the oracle); this one generates the same table shape entirely with JVM
expressions over ``spark.range`` — parallel, seedless-deterministic (pure
functions of the row id), fast enough for 10^7–10^8-row bench tables.

Shape goals (FIXTURES.md): Zipf-ish host skew, per-host hourly silence gaps,
varying html sizes, ~1% exact duplicates, per-host-biased lang. ``text`` is
left empty — the rollup bench path never reads it (column pruning keeps it
out of the scan), and text-invariant correctness is covered by the pandas
fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH = 1704067200  # 2024-01-01 UTC


def generate_pages_spark(
    spark: SparkSession,
    n_rows: int,
    n_hosts: int = 200,
    span_days: int = 35,
    dup_frac: float = 0.01,
    partitions: int | None = None,
) -> DataFrame:
    partitions = partitions or spark.sparkContext.defaultParallelism
    n_base = int(n_rows * (1 - dup_frac))
    base = spark.range(0, n_base, 1, partitions)

    u = (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1_000_000)) / 1_000_000.0)
    # Zipf-ish skew: density of host_idx concentrates near 0 (u^4 folding)
    host_idx = F.least(
        F.floor(F.lit(n_hosts) * F.pow(u, F.lit(4.0))).cast("int"), F.lit(n_hosts - 1)
    )
    span_s = span_days * 86400
    raw_sec = F.pmod(F.xxhash64("id", F.lit(2)), F.lit(span_s))
    hour = F.floor(raw_sec / 3600)
    # per-host silent hours (gap injection, same rule as synth.py)
    sec = F.when(
        F.pmod(hour + host_idx, F.lit(5)) == 0, F.pmod(raw_sec + 3600, F.lit(span_s))
    ).otherwise(raw_sec)

    u2 = (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(1_000_000)) / 1_000_000.0)
    # log-normal-ish html length in [0, ~1200] bytes
    html_len = F.floor(F.exp(F.lit(4.0) + F.lit(3.0) * u2)).cast("int")
    md5s = F.md5(F.col("id").cast("string"))  # 32 hex chars = 16 bytes
    html = F.unhex(F.substring(F.repeat(md5s, 80), 1, html_len * 2))

    lang = F.element_at(
        F.array(*[F.lit(l) for l in ["en", "de", "fr", "es", "zh", "unknown"]]),
        (F.pmod(F.xxhash64("id", F.lit(4)) + host_idx, F.lit(6)) + 1).cast("int"),
    )

    pages = base.select(
        F.concat(
            F.lit("https://host-"),
            F.format_string("%03d", host_idx),
            F.lit(".example.com/p/"),
            F.col("id"),
        ).alias("url"),
        F.timestamp_seconds(sec + F.lit(EPOCH)).alias("warc_ts"),
        html.alias("html"),
        F.lit("").alias("text"),
        lang.alias("lang"),
    )
    n_dup = n_rows - n_base
    if n_dup > 0:
        # exact duplicates of a deterministic id slice
        dups = pages.filter(F.pmod(F.xxhash64("url"), F.lit(int(1 / dup_frac))) == 0).limit(n_dup)
        pages = pages.unionByName(dups)
    return pages


def write_bench_pages(spark: SparkSession, path: str, n_rows: int, **kw) -> None:
    generate_pages_spark(spark, n_rows, **kw).write.mode("overwrite").parquet(path)
