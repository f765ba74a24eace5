"""Plan-inspection utilities — the engine's "is this the plan I want?"
toolkit (SURVEY.md §4 discipline: every operator's physical plan is checked,
not assumed; used by tests/test_plans.py and ad-hoc tuning).
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def plan_str(df: DataFrame, mode: str = "formatted") -> str:
    """Capture df.explain(mode) output as a string."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the plan (simple mode — each
    node appears once)."""
    return plan_str(df, "simple").count("Exchange")


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema lines of every scan — verify column pruning reached parquet."""
    return [l.strip() for l in plan_str(df).splitlines() if "ReadSchema" in l]


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lines of every scan — verify predicate pushdown."""
    return [l.strip() for l in plan_str(df).splitlines() if "PushedFilters" in l]


def assert_no_sort_aggregate(df: DataFrame) -> None:
    p = plan_str(df)
    assert "SortAggregate" not in p, "plan regressed to sort-based aggregation"


def assert_broadcast_join(df: DataFrame) -> None:
    p = plan_str(df)
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p, (
        "expected a broadcast join; got:\n" + p[:2000]
    )
