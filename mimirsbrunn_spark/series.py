"""Base 1-minute series with explicit skew handling.

The north rule mandates "salted window aggregates over skew-repartitioned
host keys": host popularity is Zipfian (a handful of hosts dominate), so a
plain groupBy(host, ...) would hash all of a hot host's rows to one reducer.

Two-stage salted aggregation:
  stage 1 (partial): groupBy(host, bucket_ts, lang, salt) — the salt spreads a
      hot (host, bucket) over ``n_salts`` reducers; Spark's map-side partial
      aggregation further combines within each task before the shuffle.
  stage 2 (final):   groupBy(host, bucket_ts, lang) over the tiny partial
      result — sums of sums / counts of counts, all integer (exactness:
      SURVEY.md §7.5 — integer measures are reduction-order-independent).

At 100 TB: stage 1's shuffle carries ≤ n_salts × |distinct (host,bucket,lang)|
rows regardless of input skew; stage 2's input is already small. AQE skew
handling stays on as a backstop but is not relied upon.

Reference analog: stop-point counts + weight normalization
(/root/reference/src/bin/stops2mimir.rs:94-103, src/stops.rs:44-58).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ingest import with_host

TIER_SECONDS = {"1m": 60, "1h": 3600, "1d": 86400, "30d": 2_592_000}
TIER_ORDER = ["1m", "1h", "1d", "30d"]


def bucket_col(ts_col: str, tier: str):
    """Floor a timestamp column to the tier bucket, anchored at the Unix
    epoch, UTC (pinned semantics shared with oracle/reference.py)."""
    step = TIER_SECONDS[tier]
    sec = F.col(ts_col).cast("long")
    return F.timestamp_seconds((sec - ((sec % step) + step) % step))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list,
    salt_col=None,
    n_salts: int = 16,
) -> DataFrame:
    """Generic two-stage salted aggregation for additive integer measures.

    ``aggs`` is a list of (partial_expr_fn, final_expr_fn, name) where
    partial_expr_fn() builds the stage-1 aggregate over raw columns and
    final_expr_fn(name) the stage-2 re-aggregate over the partial column.
    """
    salt = salt_col if salt_col is not None else F.pmod(F.xxhash64(*keys, F.spark_partition_id()), F.lit(n_salts))
    partial = df.groupBy(*keys, salt.alias("_salt")).agg(
        *[p().alias(name) for p, _, name in aggs]
    )
    return partial.groupBy(*keys).agg(*[fin(name).alias(name) for _, fin, name in aggs])


def _auto_salts(df: DataFrame, n_salts: int | None) -> int:
    """Default salt count: min(16, shuffle partitions). The salt's job is
    spreading a hot key over n_salts REDUCERS, so salts beyond the reducer
    count buy no extra spread — they only multiply the partial-aggregate
    cardinality (output rows ≈ groups × salts-present), which is pure
    overhead: at 4 reducers, 16 salts make the partial→final exchange 4×
    bigger for identical skew protection (measured: ~12% of the whole
    rollup chain's CPU at 4 cores). At high parallelism the cap of 16
    bounds the final-agg blow-up; deployments with single series hot
    enough to saturate 16 reducers pass n_salts explicitly."""
    if n_salts is not None:
        return n_salts
    try:
        p = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        p = 16
    return max(1, min(16, p))


def dedup_salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list,
    salt_col,
    n_salts: int | None = None,
    repartition_keys: list[str] | None = None,
    derive: dict | None = None,
) -> DataFrame:
    """Dedup + salted aggregation with ONE full-data shuffle.

    The naive pipeline shuffles the data twice: once for dropDuplicates
    (keyed on every column) and once for the salted partial aggregate. But
    if the salt is materialized as a column, then (repartition keys + salt)
    is a SUBSET of the dedup key set AND of the partial-agg group keys —
    hash partitioning on a subset satisfies ClusteredDistribution for both,
    so an explicit repartition on that subset serves the dedup aggregate
    and the salted partial aggregate alike: Catalyst inserts no further
    Exchange. Only the (tiny) final re-aggregate shuffles again.

    ``repartition_keys`` (default: all of ``keys``) lets callers shuffle on
    a smaller subset so columns derivable from the carried data need not
    ride the exchange at all: ``derive`` maps new column names to
    expressions computed AFTER the dedup (withColumn is a projection — it
    preserves the clustering), so ``keys``/``aggs`` may reference them.

    At 100 TB this halves the dominant shuffle: one pass of the ~40 B/row
    projected data instead of two. Skew guarantee unchanged — a hot
    (keys) group is spread over ``n_salts`` partitions by the salt."""
    n_salts = _auto_salts(df, n_salts)
    rkeys = repartition_keys if repartition_keys is not None else keys
    salted = df.withColumn("_salt", F.pmod(salt_col, F.lit(n_salts)))
    clustered = salted.repartition(*[F.col(c) for c in rkeys], F.col("_salt"))
    deduped = clustered.dropDuplicates()  # reuses the repartition (subset keys)
    for name, expr in (derive or {}).items():
        deduped = deduped.withColumn(name, expr)
    partial = deduped.groupBy(*keys, "_salt").agg(
        *[p().alias(name) for p, _, name in aggs]
    )
    return partial.groupBy(*keys).agg(*[fin(name).alias(name) for _, fin, name in aggs])


def series_1m(pages: DataFrame, n_salts: int | None = None) -> DataFrame:
    """pages → base tier (host, bucket_ts, lang) → doc_count, bytes_sum.

    Column-pruning discipline: derive the (tiny) columns the series needs
    FIRST, then dedup — the dedup shuffle carries ~40 bytes/row instead of
    the full html payload (at 100 TB that is the difference between
    shuffling 100 TB and shuffling ~0.1% of it). Payload-equality of
    duplicates is guaranteed by ingest.check_duplicate_payloads."""
    # Full-row dropDuplicates (no subset) compiles to a pure HashAggregate on
    # the grouping keys; a subset dedup would compile to SortAggregate with
    # first() buffers — two full sorts of the input. Equivalent semantics
    # because duplicate fetches are exact copies (ingest.check_duplicate_payloads).
    # Duplicates of a (url, warc_ts) agree on every projected column AND on
    # the url-derived salt, so the single repartition in dedup_salted_agg
    # routes them together — dedup + partial agg share one shuffle.
    #
    # The url itself is needed only as a dedup key, so it is carried as a
    # 128-bit fingerprint (two independent xxhash64 lanes) instead of the
    # string: the dominant shuffle's rows become fixed-width and ~40%
    # smaller, and the dedup HashAggregate compares 16 bytes instead of a
    # variable-length string. A false merge needs two urls with equal
    # 128-bit fingerprints AND equal (warc_ts, host, lang, page_size) —
    # P ≈ n²·2⁻¹²⁹ within a bucket, ~10⁻¹⁵ even at 10¹² docs.
    #
    # Exchange payload is pared to the minimum: warc_ts (seconds; valid
    # through 2106) and page_size (< 2 GiB) ride ONE packed long (_wp =
    # sec << 31 | size — bijective, so deduping on _wp equals deduping on
    # the pair), and bucket_ts is NOT shuffled at all — it is derived from
    # _wp after the exchange. The repartition therefore hashes only
    # (host, salt), a subset of both the dedup key set and the partial-agg
    # group keys, which still satisfies ClusteredDistribution for both.
    p = with_host(pages).select(
        F.xxhash64("url").alias("_uf1"),
        F.xxhash64("url", F.lit(-7046029254386353131)).alias("_uf2"),
        F.shiftleft(F.col("warc_ts").cast("long"), 31)
        .bitwiseOR(F.col("page_size"))
        .alias("_wp"),
        "host",
        "lang",
    )
    sec = F.shiftright(F.col("_wp"), 31)
    step = TIER_SECONDS["1m"]
    bucket = F.timestamp_seconds(sec - ((sec % step) + step) % step)
    psize = F.col("_wp").bitwiseAND(F.lit((1 << 31) - 1))
    return dedup_salted_agg(
        p,
        keys=["host", "bucket_ts", "lang"],
        aggs=[
            (lambda: F.count(F.lit(1)), lambda c: F.sum(c), "doc_count"),
            (lambda: F.sum(psize), lambda c: F.sum(c), "bytes_sum"),
        ],
        salt_col=F.col("_uf1"),
        n_salts=n_salts,
        repartition_keys=["host"],
        derive={"bucket_ts": bucket},
    )
