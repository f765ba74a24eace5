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


def _driver_row_history() -> dict[str, tuple[int, int]]:
    """gate name -> (last driver round with a row, total driver rows), read
    from the committed CORRECTNESS_r*.json ledgers next to this file. Gates
    with no row ever map to (0, 0)."""
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    hist: dict[str, tuple[int, int]] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
            rows = json.load(open(path))
        except (ValueError, OSError, json.JSONDecodeError):
            continue
        for name in rows:
            last, n = hist.get(name, (0, 0))
            hist[name] = (max(last, rnd), n + 1)
    return hist


def _ordered(core: dict, rel: dict, ops: dict) -> dict:
    """Registry order = driver verification priority (the driver checks at
    most the FIRST 50 entries per round — VERDICT r3 'what's wrong' #2).

    Codified rotation by driver-row age (VERDICT r4 task 3): sort every gate
    by (last round it got a driver CORRECTNESS row, total rows it has ever
    had, name) ascending — never-verified gates lead, then the stalest, so
    no gate goes more than ceil(n_gates/50) rounds without a driver row and
    the ordering self-updates each round as new ledgers land.
    tools/check_oracle.py still runs ALL entries locally each round."""
    merged: dict = {}
    merged.update(rel)
    merged.update(ops)
    merged.update(core)
    hist = _driver_row_history()
    key = lambda name: (*hist.get(name, (0, 0)), name)  # noqa: E731
    return {name: merged[name] for name in sorted(merged, key=key)}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mimirsbrunn_spark import gate, gate_ops, gate_rel

    return _ordered(gate.core_queries(), gate_rel.rel_queries(), gate_ops.ops_queries())


def oracle_sql() -> dict[str, str]:
    from mimirsbrunn_spark import gate, gate_ops, gate_rel

    return _ordered(
        gate.core_oracle_sql(), gate_rel.rel_oracle_sql(), gate_ops.ops_oracle_sql()
    )
