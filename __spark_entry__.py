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


def _ordered(core: dict, rel: dict, ops: dict) -> dict:
    """Registry order = driver verification priority. The driver checks at
    most the FIRST 50 entries per round, so the families that went
    unverified in round 3 (the ops/LLM-pipeline gates and the re-pinned
    composed-search gates — VERDICT r3 'what's wrong' #2) lead; the
    trivially-stable relational gates (green in r2 AND r3) absorb the
    overflow. tools/check_oracle.py still runs ALL entries locally each
    round (BENCH/check_oracle_r4.json)."""
    first = {k: rel[k] for k in ("search_scored", "search_fuzzy") if k in rel}
    out: dict = {}
    out.update(first)
    out.update(ops)
    out.update(core)
    out.update({k: v for k, v in rel.items() if k not in first})
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mimirsbrunn_spark import gate, gate_ops, gate_rel

    return _ordered(gate.core_queries(), gate_rel.rel_queries(), gate_ops.ops_queries())


def oracle_sql() -> dict[str, str]:
    from mimirsbrunn_spark import gate, gate_ops, gate_rel

    return _ordered(
        gate.core_oracle_sql(), gate_rel.rel_oracle_sql(), gate_ops.ops_oracle_sql()
    )
