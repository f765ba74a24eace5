"""Mergeable size-distribution sketches: log-bucketed histograms + derived
percentiles per rollup tier (the TimescaleDB ``percentile_agg`` /
Datasketches-rollup analog, built purely from Spark primitives).

Design for exactness under the engine's north star: the SKETCH is integer
bucket counts in LONG format (host, bucket_ts, bin, n) — merging across
time buckets or tiers is plain integer summation, so tier cascades of
histograms are exactly order-independent (same discipline as
doc_count/bytes_sum). Only the derived read-time quantile is approximate
(resolution = the log-2 bin), and it is a deterministic pure function of
the counts, so a DuckDB oracle verifies it value-for-value.

bin(v) = floor(log2(v + 1)), capped to ``max_bin`` — i.e. bin b covers
[2^b - 1, 2^(b+1) - 1). Computed with the integer bit-length trick
(63 - #leading-zeros) rather than float log2: float rounding at exact
powers of two would flip bins per-platform; bit math cannot.

Scale: the histogram rollup is one groupBy over (key, bin) — ≤ max_bin+1
rows per series bucket; quantile derivation is a window cumsum over ≤ 41
rows per bucket. Nothing here touches raw doc counts after the base tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_BIN = 40  # 2^40 ≈ 1 TB page size — beyond any real page


def size_bin(col, max_bin: int = MAX_BIN):
    """floor(log2(v + 1)) via bit length (exact integer math): for v >= 0,
    bit_length(v + 1) - 1; capped at max_bin; negatives clamp to 0."""
    v = F.greatest(col.cast("long"), F.lit(0)) + F.lit(1)
    # bit_length(x) for x >= 1 == 64 - leading_zeros; Spark exposes bit_length
    # in BITS of the binary repr for strings only, so use floor(log2) via
    # repeated comparisons... no: use the well-defined expression
    # 63 - bit_count for powers is wrong; instead: length of bin repr.
    blen = F.length(F.conv(v.cast("string"), 10, 2))  # digits of binary repr
    return F.least(blen - 1, F.lit(max_bin)).cast("int")


def size_histogram(
    series_or_pages: DataFrame,
    value_col: str = "page_size",
    keys: tuple[str, ...] = ("host", "bucket_ts"),
    max_bin: int = MAX_BIN,
) -> DataFrame:
    """(keys..., bin, n): integer bucket counts — the mergeable sketch."""
    return (
        series_or_pages.select(*keys, size_bin(F.col(value_col), max_bin).alias("bin"))
        .groupBy(*keys, "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def rollup_histogram(hist: DataFrame, tier: str, keys: tuple[str, ...] = ("host",)) -> DataFrame:
    """Cascade step: re-bucket time and SUM counts — exact merge."""
    from ..series import bucket_col

    return (
        hist.select(
            *keys, bucket_col("bucket_ts", tier).alias("bucket_ts"), "bin", "n"
        )
        .groupBy(*keys, "bucket_ts", "bin")
        .agg(F.sum("n").alias("n"))
    )


# ---------------------------------------------------------------------------
# HDR sketch: sub-bucketed log histogram with configurable relative error
# ---------------------------------------------------------------------------
#
# The log-2 histogram above has factor-2 buckets (50 % worst-case relative
# error on the derived quantile). The HDR sketch refines each octave into
# 2^k linear sub-buckets, bounding relative error at 2^-k (k=5 → ≤ 3.125 %)
# while keeping everything that makes the log-2 sketch scale-safe: the state
# is integer counts in LONG format, merge across time buckets / tiers is
# plain integer summation (exactly order-independent), and the bucket index
# is a deterministic pure function of the value, so a DuckDB oracle can
# recompute it bit-for-bit. This is the TimescaleDB ``uddsketch`` /
# ``approx_percentile`` analog and the HdrHistogram layout used by
# Prometheus-style latency SLOs.
#
# Index math (u = value + 1 ≥ 1, e = floor(log2(u)) via bit length,
# pe = 2^e as an exact DOUBLE):
#
#     bin = e * 2^k + floor((u - pe) * 2^k / pe)
#
# One formula for every e: for e ≥ k it is the top-k-bits sub-bucket; for
# e < k the multiplier 2^k/pe is a positive power of two, so small values
# map injectively. All intermediates are integers below 2^53 scaled by
# powers of two — every float op here (multiply/divide by 2^j, floor) is
# EXACT in IEEE double, so Spark and DuckDB agree bit-for-bit.
#
# Upper bound of bin (e = bin div 2^k, sub = bin mod 2^k):
#
#     ub(v) = pe + ceil((sub + 1) * pe / 2^k) - 2
#
# (-1 to step back from the next bucket's first u, -1 more to undo u=v+1.)

HDR_K = 5  # 2^5 = 32 sub-buckets per octave → quantile rel. error ≤ 3.125 %


def hdr_bin(col, k: int = HDR_K, max_bin: int | None = None):
    """HDR bucket index of a non-negative integer value (exact float math —
    see module comment); negatives clamp to 0."""
    u = F.greatest(col.cast("long"), F.lit(0)) + F.lit(1)
    e = F.length(F.conv(u.cast("string"), 10, 2)) - 1
    pe = F.pow(F.lit(2.0), e)
    sub = F.floor((u - pe) * F.lit(float(2**k)) / pe).cast("long")
    b = (e.cast("long") * F.lit(2**k) + sub).cast("int")
    cap = (MAX_BIN if max_bin is None else max_bin) * 2**k + (2**k - 1)
    return F.least(b, F.lit(cap))


def hdr_value_ub(bin_col, k: int = HDR_K):
    """Largest value an HDR bucket can hold — deterministic pure function of
    the index, the read-time representative reported by hdr_quantile."""
    e = F.floor(bin_col / F.lit(2**k)).cast("int")
    sub = (bin_col % F.lit(2**k)).cast("long")
    pe = F.pow(F.lit(2.0), e)
    return (pe + F.ceil((sub + 1) * pe / F.lit(float(2**k)))).cast("long") - 2


def hdr_histogram(
    df: DataFrame,
    value_col: str,
    keys: tuple[str, ...] = ("host", "bucket_ts"),
    k: int = HDR_K,
) -> DataFrame:
    """(keys..., bin, n): integer HDR bucket counts — the mergeable sketch.
    Same LONG layout as size_histogram, so rollup_histogram cascades it
    unchanged (integer-sum merge, exactly order-independent)."""
    return (
        df.select(*keys, hdr_bin(F.col(value_col), k).alias("bin"))
        .groupBy(*keys, "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def hdr_quantile(
    hist: DataFrame,
    q: float,
    keys: tuple[str, ...] = ("host", "bucket_ts"),
    out_col: str = "quantile_ub",
    k: int = HDR_K,
) -> DataFrame:
    """Read-time quantile from HDR counts: smallest bin whose cumulative
    count reaches ceil(q * total), reported as the bin's upper bound —
    within 2^-k relative of the exact quantile by construction."""
    w = Window.partitionBy(*keys).orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy(*keys)
    cum = F.sum("n").over(w)
    total = F.sum("n").over(wt)
    need = F.ceil(F.lit(float(q)) * total)
    hit = hist.withColumn("_cum", cum).withColumn("_need", need).filter(
        F.col("_cum") >= F.col("_need")
    )
    wmin = Window.partitionBy(*keys).orderBy("bin")
    return (
        hit.withColumn("_rn", F.row_number().over(wmin))
        .filter(F.col("_rn") == 1)
        .select(*keys, hdr_value_ub(F.col("bin"), k).alias(out_col))
    )


def hdr_quantiles_multi(
    hist: DataFrame,
    qs: dict[str, float],
    keys: tuple[str, ...] = ("host", "bucket_ts"),
    k: int = HDR_K,
) -> DataFrame:
    """All requested quantiles in ONE pass: a single cumsum window plus a
    groupBy on the same keys (partitioning reused — no second Exchange),
    instead of one window + join per quantile. ``qs`` maps output column
    name → q. Same pick rule as hdr_quantile: smallest bin whose cumulative
    count reaches ceil(q * total), reported as the bin's upper bound."""
    w = Window.partitionBy(*keys).orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy(*keys)
    d = hist.withColumn("_cum", F.sum("n").over(w)).withColumn(
        "_total", F.sum("n").over(wt)
    )
    aggs = [
        F.min(
            F.when(
                F.col("_cum") >= F.ceil(F.lit(float(q)) * F.col("_total")), F.col("bin")
            )
        ).alias(f"_b_{name}")
        for name, q in qs.items()
    ]
    picked = d.groupBy(*keys).agg(*aggs)
    return picked.select(
        *keys, *[hdr_value_ub(F.col(f"_b_{name}"), k).alias(name) for name in qs]
    )


def histogram_quantile(
    hist: DataFrame,
    q: float,
    keys: tuple[str, ...] = ("host", "bucket_ts"),
    out_col: str = "quantile_ub",
) -> DataFrame:
    """Read-time quantile from the counts: the smallest bin whose cumulative
    count reaches ceil(q * total); reported as the bin's upper bound
    2^(bin+1) - 2 (the largest value the bin can hold). Deterministic pure
    function of the sketch — DuckDB-oracle-verifiable."""
    w = Window.partitionBy(*keys).orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy(*keys)
    cum = F.sum("n").over(w)
    total = F.sum("n").over(wt)
    need = F.ceil(F.lit(float(q)) * total)
    hit = hist.withColumn("_cum", cum).withColumn("_need", need).filter(
        F.col("_cum") >= F.col("_need")
    )
    wmin = Window.partitionBy(*keys).orderBy("bin")
    return (
        hit.withColumn("_rn", F.row_number().over(wmin))
        .filter(F.col("_rn") == 1)
        .select(
            *keys,
            (F.pow(F.lit(2.0), F.col("bin") + 1) - 2).cast("long").alias(out_col),
        )
    )
