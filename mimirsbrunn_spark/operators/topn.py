"""Top-N heavy hitters per time bucket as a mergeable continuous aggregate
(the TimescaleDB ``topn_agg``/space-saving analog; reference analog: the
admin/street importance ranking served per zoom level,
/root/reference/libs/mimir/src/rubber.rs ranked reads).

Model: the stored tier row set is the per-bucket candidate list — the exact
top ``n*slack`` items by count (deterministic order: count desc, item asc).

- ``topn_rollup`` (finest tier): exact counts per (keys, bucket, item), one
  shuffle, then a per-bucket rank window over the (already tiny) count rows.
  Fully SQL-expressible — this is the DuckDB-gated surface.
- ``topn_cascade`` (parent tiers): sum the CHILD LISTS' counts per parent
  bucket and re-rank — no raw data. This is where approximation enters: an
  item absent from every child list cannot be recovered. The classical
  bound is carried as a column: ``max_missed`` = Σ over child buckets of
  (the child's smallest kept count, if that child's list was full/truncated,
  else 0). Any unreported item's true parent count ≤ max_missed, so whenever
  the served n-th count exceeds max_missed the served top-n IS the exact
  top-n. Tests pin both the equality-under-sufficient-slack and the bound
  on an adversarially truncated cascade.
- ``topn_serve``: final top-``n`` cut of a stored candidate list.

At 100 TB: the finest tier's shuffle carries (keys, bucket, item) — the
same shape as the distinct-count rollup; every parent tier shuffles only
≤ n*slack rows per child bucket. ``slack`` converts straight into the
guarantee margin, not into raw-data cost."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..series import TIER_SECONDS


def _bucket(ts_col: str, tier: str):
    sec = TIER_SECONDS[tier]
    return F.timestamp_seconds(
        (F.unix_timestamp(ts_col) / sec).cast("long") * sec
    ).alias("bucket_ts")


def _ranked(counts: DataFrame, by: tuple[str, ...], limit: int | None) -> DataFrame:
    w = Window.partitionBy(*by, "bucket_ts").orderBy(
        F.col("cnt").desc(), F.col("item").asc()
    )
    out = counts.withColumn("rank", F.row_number().over(w))
    return out.filter(F.col("rank") <= limit) if limit else out


def topn_rollup(
    df: DataFrame,
    tier: str,
    n: int,
    by: tuple[str, ...] = (),
    item_col: str = "url",
    ts_col: str = "warc_ts",
    slack: int = 4,
) -> DataFrame:
    """Exact top-(n*slack) candidate list per (keys, tier bucket) from raw
    rows. Output: (*by, bucket_ts, item, cnt, rank, max_missed=0)."""
    counts = (
        df.select(*by, _bucket(ts_col, tier), F.col(item_col).alias("item"))
        .groupBy(*by, "bucket_ts", "item")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return _ranked(counts, by, n * slack).withColumn(
        "max_missed", F.lit(0).cast("long")
    )


def topn_cascade(
    child: DataFrame,
    parent_tier: str,
    n: int,
    by: tuple[str, ...] = (),
    slack: int = 4,
) -> DataFrame:
    """Parent candidate list from CHILD LISTS only (no raw data), with the
    heavy-hitters error bound.

    Per parent bucket: counts are summed per item across child lists and
    re-ranked; ``max_missed`` adds the child's own max_missed to the child's
    smallest kept count for every child list that was full (len == its
    keep limit — the only lists that can hide an item). An item missing
    from the output has true count ≤ max_missed."""
    limit = n * slack
    pb = _bucket("bucket_ts", parent_tier)

    merged = (
        child.select(*by, pb, "item", "cnt")
        .groupBy(*by, "bucket_ts", "item")
        .agg(F.sum("cnt").alias("cnt"))
    )

    # per child bucket: smallest kept count + inherited bound, counted only
    # when the child list could be hiding items (it reached its keep limit)
    child_stats = child.groupBy(*by, "bucket_ts").agg(
        F.min("cnt").alias("_floor"),
        F.max("max_missed").alias("_inherited"),
        F.count(F.lit(1)).alias("_len"),
    )
    bound = (
        child_stats.select(
            *by,
            pb,
            F.when(F.col("_len") >= limit, F.col("_floor") + F.col("_inherited"))
            .otherwise(F.col("_inherited"))
            .alias("_miss"),
        )
        .groupBy(*by, "bucket_ts")
        .agg(F.sum("_miss").alias("max_missed"))
    )

    return _ranked(merged, by, limit).join(bound, [*by, "bucket_ts"])


def topn_serve(candidates: DataFrame, n: int) -> DataFrame:
    """Final top-n cut of a stored candidate list (rank is already the
    deterministic (cnt desc, item asc) order)."""
    return candidates.filter(F.col("rank") <= n)
