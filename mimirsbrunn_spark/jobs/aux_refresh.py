"""Incremental (invalidation-based) refresh shared by the auxiliary
aggregate tier jobs (distinct/topn/histogram) — the TimescaleDB
continuous-aggregate invalidation pattern the numeric tiers already have
(tiers.incremental_refresh), applied to the pkey-partitioned aux layout.

A daily run with ``days=[...]`` touches:
1. finest tier (pkey = day): rebuild exactly the dirty day partitions from
   the pages of those days (metadata-only drop + append — the idempotent
   resume primitive rollup_job uses);
2. each parent tier: the dirty parent PARTITIONS are those holding a
   bucket that covers a dirty day (a 30d bucket that started in December
   dirties the PRIOR year's partition when a January day changes — the
   covering-bucket start, not the day's own year, picks the pkey). Those
   partitions' buckets are recomputed from the child tier read over just
   the covering child-partition range (manifest pruning), then swapped in.

At 100 TB a daily refresh reads one day of raw pages plus a bounded slice
of the (already tiny) child tiers, instead of re-scanning the raw table
per tier per run. Full-history rebuild remains the bootstrap path.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import tiers
from ..series import TIER_SECONDS
from ..tables import SnapshotTable

_UTC = dt.timezone.utc


def _day_sec(day: str) -> int:
    return int(dt.datetime.strptime(day, "%Y-%m-%d").replace(tzinfo=_UTC).timestamp())


def dirty_parent_pkeys(days: list[str], tier: str) -> list[str]:
    """Partition keys of the ``tier`` buckets covering the dirty days —
    keyed by the COVERING BUCKET's start (an epoch-aligned 30d bucket that
    began in the prior year claims that year's pkey)."""
    step = TIER_SECONDS[tier]
    fmt = tiers.TIER_PARTITION_FMT[tier][1]
    out = set()
    for d in days:
        sec = _day_sec(d)
        # every bucket overlapping [day, day+24h): first start <= day start
        start = sec - sec % step
        while start < sec + 86400:
            out.add(dt.datetime.fromtimestamp(start, _UTC).strftime(fmt))
            start += step
    return sorted(out)


def _child_range(pkeys: list[str], tier: str, child_tier: str) -> tuple[str, str]:
    """Child-tier partition-key range covering every bucket in the given
    parent partitions (the last bucket of a partition may extend one full
    bucket width past the partition's nominal end — include it)."""
    step = TIER_SECONDS[tier]
    fmt_c = tiers.TIER_PARTITION_FMT[child_tier][1]
    fmt_p = "%Y-%m" if tier == "1d" else "%Y"
    lo = dt.datetime.strptime(min(pkeys), fmt_p).replace(tzinfo=_UTC)
    hi = dt.datetime.strptime(max(pkeys), fmt_p).replace(tzinfo=_UTC)
    # nominal end of the max partition period + one bucket width
    hi_end = (hi.replace(year=hi.year + 1, month=1) if tier == "30d"
              else (hi.replace(year=hi.year + 1, month=1) if hi.month == 12
                    else hi.replace(month=hi.month + 1)))
    hi_sec = int(hi_end.timestamp()) + step
    return lo.strftime(fmt_c), dt.datetime.fromtimestamp(hi_sec, _UTC).strftime(fmt_c)


def refresh_aux_tiers(
    spark: SparkSession,
    out_dir: str,
    prefix: str,
    days: list[str],
    day_pages: DataFrame,
    build_finest,
    build_cascade,
    tier_list: tuple[str, ...] = ("1h", "1d", "30d"),
) -> dict:
    """Incrementally refresh ``{prefix}_{tier}`` tables for ``days``.

    ``day_pages``: the raw pages ALREADY restricted to the dirty days.
    ``build_finest(day_pages, tier) -> DataFrame``; ``build_cascade(child,
    tier) -> DataFrame`` (same contracts as the jobs' full-build path).
    Returns {tier: refreshed partition keys}."""
    if not days:
        return {}
    refreshed: dict = {}

    finest = tier_list[0]
    tbl = SnapshotTable(f"{out_dir}/{prefix}_{finest}")
    fresh = build_finest(day_pages, finest).withColumn(
        "pkey", tiers.partition_key_col(finest)
    )
    tbl.drop_partition_values(set(days), meta={"refresh_days": days})
    tbl.commit(fresh, mode="append", partition_by="pkey", meta={"refresh_days": days})
    refreshed[finest] = sorted(set(days))
    child_tbl, child_tier = tbl, finest

    for tier in tier_list[1:]:
        pkeys = dirty_parent_pkeys(days, tier)
        c_lo, c_hi = _child_range(pkeys, tier, child_tier)
        child = child_tbl.read(
            spark, partition_min=c_lo, partition_max=c_hi
        ).drop("pkey")
        parent = (
            build_cascade(child, tier)
            .withColumn("pkey", tiers.partition_key_col(tier))
            .filter(F.col("pkey").isin(pkeys))
        )
        tbl = SnapshotTable(f"{out_dir}/{prefix}_{tier}")
        tbl.drop_partition_values(set(pkeys), meta={"refresh_days": days})
        tbl.commit(parent, mode="append", partition_by="pkey", meta={"refresh_days": days})
        refreshed[tier] = pkeys
        child_tbl, child_tier = tbl, tier
    return refreshed
