"""Benchmark decontamination — 13-gram overlap of corpus pages against an
eval corpus (the GPT-3/PaLM decontamination recipe: a training document is
contaminated if any normalized 13-token n-gram also occurs in an eval set).

Pipeline shape (scale-first):

- Both sides normalize identically (lower, non-alphanumeric runs → one
  space, whitespace split) and emit per-document DISTINCT n-gram keys.
- The eval side is tiny relative to a 100 TB crawl (eval suites are
  10^4-10^6 documents), so its distinct-gram set is **broadcast**: the
  corpus-side probe is a broadcast hash join — zero shuffle of the
  exploded corpus grams, the same shape as ``dedup.minhash_candidates``'s
  bucket join but with the small side pinned to a map-side hash table.
- Production keys are ``xxhash64`` of the gram (8 bytes instead of ~80-char
  strings through the join); the gate variant joins on the gram string
  itself so the DuckDB twin is exactly equal (hasher="none").
- Per-document output is integer sufficient stats (total distinct grams,
  matched distinct grams) plus ONE float division per row — cross-engine
  deterministic per the engine's float rule (gate.py docstring).

Documents shorter than ``n`` tokens emit zero grams and are, by
definition, uncontaminated (contam_frac = 0 with total_grams = 0).

Reference analog: the coverage/membership semi-join filter family
(/root/reference/libs/bragi/src/query.rs:98-113) — membership of a derived
key set drives a keep/drop decision; here the key set is n-gram
fingerprints and the decision is the curation funnel's decontamination
stage (jobs/curation_job.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import dedup


def norm_tokens(col) -> Column:
    """Lowercased alphanumeric tokens; '' and all-punct text → []."""
    cleaned = F.trim(F.regexp_replace(F.lower(col), r"[^a-z0-9]+", " "))
    return F.filter(F.split(cleaned, " "), lambda t: t != F.lit(""))


def ngram_keys(col, n: int = 13, hasher: str = "xxhash64") -> Column:
    """DISTINCT n-gram join keys for one document's text. With
    hasher="none" the key is the space-joined gram string (what the DuckDB
    gate twin computes); otherwise the gram string is hashed
    (dedup.hash_col family) for an 8-byte shuffle/broadcast key."""
    toks = norm_tokens(col)
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.array_distinct(grams)
    if hasher == "none":
        return grams
    return F.transform(grams, lambda g: dedup.hash_col(g, hasher))


def contamination(
    docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    hasher: str = "xxhash64",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-document contamination stats vs the eval corpus.

    Returns (id_col, total_grams, matched_grams, contam_frac) for EVERY
    input document (zero-gram documents included with totals 0).
    ``broadcast_eval`` pins the eval gram set to a broadcast hash join —
    correct whenever the eval corpus is cluster-small (the normal case);
    set False to let AQE pick for a pathologically large eval side.
    """
    keys = ngram_keys(F.col(text_col), n=n, hasher=hasher)
    dg = docs.select(F.col(id_col), F.explode_outer(keys).alias("_g"))
    eg = (
        eval_docs.select(F.explode(ngram_keys(F.col(text_col), n=n, hasher=hasher)).alias("_g"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    if broadcast_eval:
        eg = F.broadcast(eg)
    per = (
        dg.join(eg, "_g", "left")
        .groupBy(id_col)
        .agg(
            F.count("_g").alias("total_grams"),  # non-NULL grams only
            F.coalesce(F.sum("_hit"), F.lit(0)).alias("matched_grams"),
        )
    )
    frac = F.col("matched_grams").cast("double") / F.greatest(
        F.col("total_grams"), F.lit(1)
    ).cast("double")
    return per.select(
        id_col, "total_grams", "matched_grams", frac.alias("contam_frac")
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    max_frac: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    hasher: str = "xxhash64",
) -> tuple[DataFrame, DataFrame]:
    """(kept, dropped): documents whose contamination fraction is <= / >
    ``max_frac``. The default 0.0 drops a document on ANY shared 13-gram
    (the conservative published recipe); both sides carry the stats columns
    so the funnel can report per-stage reasons."""
    stats = contamination(
        docs, eval_docs, id_col=id_col, text_col=text_col, n=n, hasher=hasher
    )
    joined = docs.join(stats, id_col, "left")
    keep = F.coalesce(F.col("contam_frac"), F.lit(0.0)) <= F.lit(float(max_frac))
    return joined.where(keep), joined.where(~keep)
