"""Duplicate-passage detection — corpus-wide repeated-span statistics, the
span-granular approximation of exact substring dedup (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better": remove any
50-token span that repeats verbatim; suffix arrays don't distribute, but
strided span fingerprints give the same signal as a bucketed groupBy).

Pipeline shape (scale-first):

- Each document emits token windows of ``n`` tokens at stride ``stride``
  over the SAME normalization as decontam/dedup (lower, non-alphanumeric
  runs → space). Positions are kept — internal repetition counts too.
- A span is *duplicated* iff its gram occurs ≥ ``min_occurrences`` times
  corpus-wide (any document, any position). Occurrence counts come from
  ONE groupBy on the gram key; the per-span verdict is a join back on the
  same key (Exchange reuse — the join rides the groupBy's partitioning),
  then one groupBy per doc. Three shuffles total, all on bounded keys;
  hot grams (site boilerplate repeated in millions of docs) are exactly
  the rows the count-≥-2 filter keeps, so the dup-set side is one row per
  DISTINCT gram — AQE skew handling covers the probe side.
- Production keys are ``xxhash64(gram)`` (8-byte shuffle keys); the gate
  twin uses the gram string (hasher="none") so DuckDB computes the exact
  same table.

Per-doc output is integer sufficient stats (total_spans, dup_spans) plus
one float division — cross-engine deterministic per the engine float rule
(gate.py docstring). Documents shorter than ``n`` tokens have 0 spans and
dup_frac 0.

Reference analog: the arg-min/first-wins dedup family (SURVEY.md §2
A1/A11 — /root/reference/libs/mimir/src/objects.rs merge rules) lifted
from whole-document identity to span granularity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import decontam, dedup


def span_grams(col, n: int = 20, stride: int = 10, hasher: str = "xxhash64") -> Column:
    """Strided n-token window keys for one document (positions preserved —
    NOT distinct). hasher="none" keeps the space-joined gram string (the
    DuckDB twin's key); otherwise grams are hashed to 8-byte keys."""
    toks = decontam.norm_tokens(col)
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1), F.lit(int(stride))),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    if hasher == "none":
        return grams
    return F.transform(grams, lambda g: dedup.hash_col(g, hasher))


def doc_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 20,
    stride: int = 10,
    hasher: str = "xxhash64",
) -> DataFrame:
    """(id_col, _g): one row per span position."""
    return docs.select(
        F.col(id_col),
        F.explode(span_grams(F.col(text_col), n=n, stride=stride, hasher=hasher)).alias("_g"),
    )


def duplicate_passages(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 20,
    stride: int = 10,
    min_occurrences: int = 2,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Per-document duplicated-span stats vs the whole corpus.

    Returns (id_col, total_spans, dup_spans, dup_frac) for EVERY input
    document (zero-span documents included with totals 0)."""
    spans = doc_spans(
        docs, id_col=id_col, text_col=text_col, n=n, stride=stride, hasher=hasher
    )
    dup_keys = (
        spans.groupBy("_g")
        .agg(F.count(F.lit(1)).alias("_occ"))
        .where(F.col("_occ") >= int(min_occurrences))
        .select("_g", F.lit(1).alias("_dup"))
    )
    per = (
        spans.join(dup_keys, "_g", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("total_spans"),
            F.coalesce(F.sum("_dup"), F.lit(0)).alias("dup_spans"),
        )
    )
    joined = docs.select(id_col).join(per, id_col, "left")
    total = F.coalesce(F.col("total_spans"), F.lit(0))
    dup = F.coalesce(F.col("dup_spans"), F.lit(0))
    return joined.select(
        id_col,
        total.alias("total_spans"),
        dup.alias("dup_spans"),
        (dup.cast("double") / F.greatest(total, F.lit(1)).cast("double")).alias(
            "dup_frac"
        ),
    )


def drop_duplicated_docs(
    docs: DataFrame,
    max_dup_frac: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kw,
) -> tuple[DataFrame, DataFrame]:
    """(kept, dropped) curation-funnel stage: drop documents whose
    duplicated-span fraction exceeds ``max_dup_frac``. Both sides carry
    the stats columns for per-stage funnel reporting."""
    stats = duplicate_passages(docs, id_col=id_col, text_col=text_col, **kw)
    joined = docs.join(stats, id_col, "left")
    keep = F.coalesce(F.col("dup_frac"), F.lit(0.0)) <= F.lit(float(max_dup_frac))
    return joined.where(keep), joined.where(~keep)
