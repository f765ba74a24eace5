"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (hourly crawl-rate rollup with locf
gap-fill) on sf0.001. ``queries()``/``oracle_sql()`` expose every implemented
operator; the driver compares each pair at sf=0.01 via DuckDB
(row count + schema + order-insensitive value hash → CORRECTNESS_r{N}.json).

Implementation lives in ``mimirsbrunn_spark`` (see SURVEY.md §7); this module
is a thin registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: hourly crawl-rate per host with locf gap-fill, sf0.001."""
    from mimirsbrunn_spark import gate

    return gate.q_gapfill_1h(spark, "/root/testdata/sf0.001")


# Gates with no MEANINGFUL driver CORRECTNESS row yet: added after the r3
# driver run, never reached under the 50-entry cap, or (search_scored)
# re-pinned in r4 because the r3 row was vacuous. These lead the registry so
# round 4 gives every one of them its first real row; everything beyond
# position 50 is r3-green AND covered by the committed all-gate
# check_oracle reports (BENCH/check_oracle_r4*.json), re-run locally each
# round.
_NEVER_DRIVER_VERIFIED = (
    "search_scored",
    "search_fuzzy",
    "pii_scrub",
    "series_corr",
    "idelta_1h",
    "sliding_1h_15m",
    "cohort_retention",
    "corr_cascade",
    "hdr_quantiles",
    "slo_burn",
)


def _ordered(core: dict, rel: dict, ops: dict) -> dict:
    """Registry order = driver verification priority (the driver checks at
    most the FIRST 50 entries per round — VERDICT r3 'what's wrong' #2).
    Verification debt first: never-driver-verified gates, then the ops
    family (r2-green only), then the engine-core gates, with the
    trivially-stable relational gates (green in r2 AND r3) absorbing the
    overflow. tools/check_oracle.py still runs ALL entries locally each
    round."""
    merged: dict = {}
    merged.update(rel)
    merged.update(ops)
    merged.update(core)
    out: dict = {k: merged[k] for k in _NEVER_DRIVER_VERIFIED if k in merged}
    for fam in (ops, core, rel):
        out.update({k: v for k, v in fam.items() if k not in out})
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mimirsbrunn_spark import gate, gate_ops, gate_rel

    return _ordered(gate.core_queries(), gate_rel.rel_queries(), gate_ops.ops_queries())


def oracle_sql() -> dict[str, str]:
    from mimirsbrunn_spark import gate, gate_ops, gate_rel

    return _ordered(
        gate.core_oracle_sql(), gate_rel.rel_oracle_sql(), gate_ops.ops_oracle_sql()
    )
