"""As-of join (backward): for each left row, the most recent right row at
or before its timestamp, per group key.

Spark has no native as-of join; the standard workarounds are a range join
(quadratic blowup) or a windowed union. This implements the UNION + LOCF
shape — the same single-shuffle pattern as gapfill.py: tag both inputs,
union them (narrow), sort once per group inside a window, and carry right
values forward onto left rows with ``last(..., ignorenulls=True)``. One
Exchange of (left+right) total; no join operator at all.

Reference analog: locf gap-fill is the degenerate as-of (gapfill.py); the
reverse-geocode "most recent anchor wins" top-1 join
(/root/reference/libs/mimir/src/rubber.rs:513-547) is the same semantics
over distance instead of time. DuckDB's ASOF JOIN provides the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: tuple[str, ...] = ("host",),
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_vals: tuple[str, ...] = ("value",),
    prefix: str = "asof_",
    tolerance_sec: float | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join. Output = every left row + ``prefix``-named
    columns holding the matched right row's values and timestamp (null when
    no right row at or before, or outside ``tolerance_sec``). Ties at the
    same right timestamp resolve to the greatest ``tiebreak`` column value
    (pass one for determinism when right timestamps can collide)."""
    lcols = [c for c in left.columns]
    rtypes = dict(zip(right.schema.names, right.schema.fields))

    l = left.withColumn("_ts", F.col(left_ts)).withColumn("_src", F.lit(1))
    for v in right_vals:
        l = l.withColumn(prefix + v, F.lit(None).cast(rtypes[v].dataType))
    l = l.withColumn(prefix + "ts", F.lit(None).cast(rtypes[right_ts].dataType))
    l = l.withColumn("_tie", F.lit(None).cast("long"))

    r = right.select(
        *by,
        F.col(right_ts).alias("_ts"),
        *[F.col(v).alias(prefix + v) for v in right_vals],
    )
    r = r.withColumn(prefix + "ts", F.col("_ts")).withColumn("_src", F.lit(0))
    r = r.withColumn(
        "_tie", F.col(prefix + tiebreak).cast("long") if tiebreak else F.lit(0).cast("long")
    )
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(zip(left.schema.names, left.schema.fields))[c].dataType))

    u = l.unionByName(r.select(*l.columns))

    # right rows (_src=0) sort before left rows at the same ts → inclusive
    # backward match; among right ties, the greatest _tie sorts last → wins.
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("_ts"), F.col("_src"), F.col("_tie"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        *[c for c in u.columns if not c.startswith(prefix) and c not in ("_tie",)],
        *[F.last(prefix + v, ignorenulls=True).over(w).alias(prefix + v) for v in right_vals],
        F.last(prefix + "ts", ignorenulls=True).over(w).alias(prefix + "ts"),
    )
    out = filled.filter(F.col("_src") == 1).drop("_src", "_ts")
    if tolerance_sec is not None:
        stale = (
            F.col(left_ts).cast("double") - F.col(prefix + "ts").cast("double")
        ) > float(tolerance_sec)
        for v in [*right_vals, "ts"]:
            out = out.withColumn(
                prefix + v, F.when(stale, F.lit(None)).otherwise(F.col(prefix + v))
            )
    return out
