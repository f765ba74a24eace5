"""Composed scored-search: the reference's single most-used read path.

One parameterized entry point, ``search(docs, params)``, composing every
scoring/filter ingredient the engine already ships — the graft of
``build_query`` (/root/reference/libs/bragi/src/query.rs:175-462), which
assembles must (string query) + filters (type / coverage / shape) + should
(importance + proximity) into one ES bool query, plus the two-pass
prefix→fuzzy fallback of ``search_documents`` (query.rs:667-714):

  must        token match: pass 1 requires a label PREFIX match; if pass 1
              returns nothing, pass 2 admits docs passing the
              minimum_should_match ladder (G10, scoring.msm_required)
  filters     doc-type whitelist (F9, query.rs:436-459), coverage semi-join
              (F7, the datasets/shape scope), arbitrary extra predicate
              (the geoshape hook, F10)
  should      score = type_boost × field_value_factor(weight) (G12/G8,
              query.rs:150-172) + match_boost × clause-overlap ratio
  paging      deterministic order (rounded score desc, id asc) + offset/limit
              (O1, query.rs:527-535)

Plan shape: everything is column math over one scan — the coverage
semi-join is the only join (LeftSemi, broadcastable when the coverage set
is small). Two execution modes:

  single_pass (default)  ONE Spark plan / ONE action: both pass predicates
              are computed as flags on the scored rows, a 1-row aggregate
              (any pass-1 hit?) is broadcast-cross-joined back, and the
              filter keeps pass-1 rows iff any exist, else pass-2 rows.
              Constructing the DataFrame triggers NO job — the fallback
              decision rides inside the plan, not the driver.
  two_action  the reference's literal sequential two-request flow
              (query.rs:667-714): probe pass 1 with limit(1).count(), fall
              back to the fuzzy pass driver-side. Kept for parity tests.

Scores are rounded to 6 decimals BEFORE ordering so paging is deterministic
cross-engine (libm/JVM last-ulp slack never reorders a page).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.scoring import (
    clause_overlap,
    field_value_factor,
    importance_score,
    msm_required,
)


@dataclass
class SearchParams:
    """Every knob explicit — the reference's query-settings discipline
    (/root/reference/libs/bragi/src/query_settings.rs:1-83)."""

    query: str
    types: list[str] | None = None
    type_weights: dict[str, float] = field(default_factory=dict)
    weight_factor: float = 1.0
    weight_missing: float = 0.0
    weight_modifier: str | None = "log1p"
    match_boost: float = 1.0
    offset: int = 0
    limit: int | None = 10


def _score(params: SearchParams, type_col, weight_col, overlap_col, n_clauses: int):
    if params.type_weights:
        # the shared G12 blend (functions/scoring.importance_score) — one
        # implementation of the reference's function_score semantics
        importance = importance_score(
            type_col,
            weight_col,
            params.type_weights,
            factor=params.weight_factor,
            missing=params.weight_missing,
            modifier=params.weight_modifier,
        )
    else:
        # no per-type functions configured: every type weighs 1.0 (the
        # reference's behavior with an empty weight list)
        importance = field_value_factor(
            weight_col, params.weight_factor, params.weight_missing, params.weight_modifier
        )
    match_ratio = overlap_col.cast("double") / F.lit(float(n_clauses))
    return importance + F.lit(float(params.match_boost)) * match_ratio


def search(
    docs: DataFrame,
    params: SearchParams,
    id_col: str = "id",
    label_col: str = "label",
    type_col: str = "doc_type",
    weight_col: str = "weight",
    coverage: DataFrame | None = None,
    coverage_on: str | None = None,
    predicate=None,
    mode: str = "single_pass",
) -> DataFrame:
    """Run the composed search over ``docs``. ``coverage`` restricts results
    to ids present in it (semi-join on ``coverage_on``, which must name a
    column of both sides); ``predicate`` is an arbitrary extra Column filter
    (the geoshape scope hook). Returns (id, label, doc_type, score_r, pass)
    ordered for paging."""
    if mode not in ("single_pass", "two_action"):
        raise ValueError(f"unknown search mode {mode!r}")
    tokens = params.query.split()
    n = len(tokens)
    if n == 0:
        # an empty/whitespace query would divide the match ratio by zero,
        # prefix-match every label (startswith('') is always true) and page
        # the whole corpus with null scores — reject it loudly instead
        raise ValueError("search query must contain at least one token")
    qt = F.array(*[F.lit(t) for t in tokens])

    base = docs
    if params.types:
        base = base.filter(F.col(type_col).isin(params.types))
    if predicate is not None:
        base = base.filter(predicate)
    if coverage is not None:
        key = coverage_on or id_col
        base = base.join(coverage.select(key).distinct(), on=key, how="left_semi")

    dt = F.split(F.col(label_col), " ")
    overlap = clause_overlap(qt, dt)

    def shape(df: DataFrame, which: int) -> DataFrame:
        scored = df.select(
            F.col(id_col).alias("id"),
            F.col(label_col).alias("label"),
            F.col(type_col).alias("doc_type"),
            F.round(_score(params, F.col(type_col), F.col(weight_col), overlap, n), 6).alias(
                "score_r"
            ),
            F.lit(which).alias("pass_no"),
        )
        return scored

    if mode == "single_pass":
        # both pass predicates become flags on the scored candidates; a
        # 1-row aggregate (did ANY candidate pass the strict prefix?) is
        # broadcast back and the filter picks the pass inside the plan —
        # no driver-side probe action, one Spark job end-to-end
        scored = base.select(
            F.col(id_col).alias("id"),
            F.col(label_col).alias("label"),
            F.col(type_col).alias("doc_type"),
            F.round(_score(params, F.col(type_col), F.col(weight_col), overlap, n), 6).alias(
                "score_r"
            ),
            F.col(label_col).startswith(params.query).alias("_p1"),
            (overlap >= msm_required(F.lit(n))).alias("_p2"),
        )
        any_p1 = scored.agg(F.max(F.col("_p1").cast("int")).alias("_any_p1"))
        out = (
            scored.crossJoin(F.broadcast(any_p1))
            .filter(
                ((F.col("_any_p1") == 1) & F.col("_p1"))
                | ((F.col("_any_p1") == 0) & F.col("_p2"))
            )
            .withColumn(
                "pass_no", F.when(F.col("_any_p1") == 1, F.lit(1)).otherwise(F.lit(2))
            )
            .drop("_p1", "_p2", "_any_p1")
        )
    else:
        # pass 1: strict prefix match on the label (the reference's
        # exact-match first request). Driver-side fallback control flow,
        # like the reference's sequential requests — limit(1) keeps the
        # probe cheap.
        pass1 = base.filter(F.col(label_col).startswith(params.query))
        if pass1.limit(1).count() > 0:
            out = shape(pass1, 1)
        else:
            # pass 2: fuzzy — minimum_should_match ladder over token clauses
            out = shape(base.filter(overlap >= msm_required(F.lit(n))), 2)

    out = out.orderBy(F.desc("score_r"), F.asc("id"))
    if params.offset:
        out = out.offset(params.offset)
    if params.limit is not None:
        out = out.limit(params.limit)
    return out
