"""First-match-wins rule engine (the reference's POI type rules, SURVEY.md F3:
/root/reference/src/osm_reader/poi.rs:83-119 — the first rule whose tag
filters ALL match classifies the record; config validated for dangling ids,
first-match semantics tested poi.rs:350-419).

Spark-first: rules become one chained ``when().otherwise()`` column
expression (whole-stage codegen, no join, no UDF) built from a declarative
rule list — the analog of the reference's TOML rule config. A broadcast-join
variant is provided for rule sets too large to inline (priority +
row_number), which is the 10^5-rules path.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


@dataclass
class Rule:
    """All ``conditions`` (col → required value or list) must match."""

    rule_id: str
    conditions: dict
    output: str


def _cond_expr(conditions: dict) -> Column:
    expr = F.lit(True)
    for col, want in conditions.items():
        c = F.col(col).isin(want) if isinstance(want, (list, tuple)) else (F.col(col) == want)
        expr = expr & c
    return expr


def classify(df: DataFrame, rules: list[Rule], out_col: str = "rule_match", default=None) -> DataFrame:
    """First-match-wins via chained when() — rules inlined into codegen."""
    expr = F.lit(default).cast("string")
    for rule in reversed(rules):  # earlier rules take precedence
        expr = F.when(_cond_expr(rule.conditions), F.lit(rule.output)).otherwise(expr)
    return df.withColumn(out_col, expr)


def classify_joined(
    df: DataFrame,
    rules_df: DataFrame,
    on: list[str],
    out_col: str = "rule_match",
) -> DataFrame:
    """Large-rule-set variant: broadcast equi-join on the condition columns +
    priority row_number → first match. ``rules_df`` columns: ``on`` columns,
    ``priority int``, ``output string``."""
    key = [c for c in df.columns if c not in on]
    joined = df.join(F.broadcast(rules_df), on, "left")
    w = Window.partitionBy(*key).orderBy(F.asc_nulls_last("priority"))
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .withColumn(out_col, F.col("output"))
        .drop("_rn", "priority", "output")
    )


def validate_rules(rules: list[Rule], valid_outputs: set[str]) -> None:
    """Dangling-output validation (poi.rs config check analog)."""
    bad = [r.rule_id for r in rules if r.output not in valid_outputs]
    if bad:
        raise ValueError(f"rules reference unknown outputs: {bad}")
