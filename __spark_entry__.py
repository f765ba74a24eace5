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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mimirsbrunn_spark import gate, gate_ops, gate_rel

    qs: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    qs.update(gate.core_queries())
    qs.update(gate_rel.rel_queries())
    qs.update(gate_ops.ops_queries())
    return qs


def oracle_sql() -> dict[str, str]:
    from mimirsbrunn_spark import gate, gate_ops, gate_rel

    sqls: dict[str, str] = {}
    sqls.update(gate.core_oracle_sql())
    sqls.update(gate_rel.rel_oracle_sql())
    sqls.update(gate_ops.ops_oracle_sql())
    return sqls
