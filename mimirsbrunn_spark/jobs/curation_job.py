"""End-to-end training-data curation job: the operator library composed
into the pipeline a dataset team actually runs over a crawl.

    documents ──url canon──► exact dedup ──near-dup clusters──► quality/
      lang filters ──► published `curated` snapshot table + per-stage
      survivor metrics (the funnel)

Stages (each one of this repo's tested operators):
  1. canonical URL identity (functions/urls.canonicalize_url) — collapses
     tracking-param/case/port variants before any content hashing;
  2. exact dedup on normalized text (operators/dedup.exact_dedup);
  3. near-dup clustering: minhash LSH pairs → connected components →
     keep-min-id per cluster (operators/dedup.dedup_clusters);
  4. quality + language filters (operators/text): token count bounds,
     stopword ratio floor, language allow-list;
  5. replace-commit of the survivors into a SnapshotTable + a metrics row
     per funnel stage (the import-stats discipline, A7).

Everything is DataFrame-declarative; the only Python kernels are the ones
the operators already own (simhash's bit-vote if enabled). At 100 TB each
stage is shuffle-bounded exactly as documented in its operator module.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.urls import canonicalize_url
from ..operators import dedup, text
from ..tables import Metrics, SnapshotTable


def curate(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    url_col: str | None = None,
    langs: tuple[str, ...] | None = ("en", "de", "fr"),
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    min_stopword_ratio: float = 0.0,
    near_dup_threshold: float = 0.8,
    minhash_kw: dict | None = None,
    eval_docs: DataFrame | None = None,
    max_contam_frac: float = 0.0,
    decontam_ngram: int = 13,
    sample_rates: DataFrame | None = None,
    sample_strata: tuple[str, ...] = ("lang",),
    sample_seed: int = 0,
) -> tuple[DataFrame, dict[str, DataFrame]]:
    """Return (curated DataFrame, {stage: survivors-so-far DataFrame}).
    Stages are lazily composed; counts are the caller's to trigger (the job
    wrapper below counts once per stage for the funnel metrics)."""
    stages: dict[str, DataFrame] = {}
    d = documents
    if url_col is not None:
        # canonical-URL dedup: keep min id per canonical URL
        from pyspark.sql import Window

        canon = d.withColumn("_canon", canonicalize_url(F.col(url_col)))
        rn = F.row_number().over(
            Window.partitionBy("_canon").orderBy(F.col(id_col))
        )
        d = canon.withColumn("_rn", rn).filter(F.col("_rn") == 1).drop("_rn", "_canon")
    stages["url_canon"] = d

    d = dedup.exact_dedup(d, id_col=id_col, text_col=text_col)
    stages["exact_dedup"] = d

    clusters = dedup.dedup_clusters(
        d, threshold=near_dup_threshold, id_col=id_col, text_col=text_col,
        **(minhash_kw or {}),
    )
    losers = clusters.filter(F.col(id_col) != F.col("keep_id")).select(id_col)
    d = d.join(losers, id_col, "left_anti")
    stages["near_dup"] = d

    toks = text.token_count(F.col(text_col))
    d = d.filter((toks >= min_tokens) & (toks <= max_tokens))
    if min_stopword_ratio > 0:
        d = d.filter(text.stopword_ratio(F.col(text_col)) >= min_stopword_ratio)
    stages["quality"] = d

    if langs is not None:
        d = d.withColumn("_lang_pred", text.lang_id(F.col(text_col))).filter(
            F.col("_lang_pred").isin(list(langs))
        ).drop("_lang_pred")
    stages["language"] = d

    if eval_docs is not None:
        # benchmark decontamination: drop any page sharing a 13-gram with
        # the eval corpus (operators/decontam.py, broadcast-probed)
        from ..operators import decontam

        kept, _dropped = decontam.decontaminate(
            d, eval_docs, max_frac=max_contam_frac,
            id_col=id_col, text_col=text_col, n=decontam_ngram,
        )
        d = kept.drop("total_grams", "matched_grams", "contam_frac")
        stages["decontaminate"] = d

    if sample_rates is not None:
        # deterministic corpus mixing: seeded per-stratum hash sampling
        from ..operators import sampling

        d = sampling.stratified_sample(
            d, sample_rates, strata=sample_strata, key_col=id_col,
            seed=sample_seed,
        )
        stages["stratified_sample"] = d
    return d, stages


def run_curation_job(
    spark: SparkSession,
    documents_path: str,
    out_dir: str,
    job_id: str = "curation",
    **curate_kw,
) -> dict:
    """Run the funnel, publish survivors, record per-stage metrics.
    Returns the funnel counts."""
    docs = spark.read.parquet(documents_path)
    curated, stages = curate(docs, **curate_kw)

    metrics = Metrics(f"{out_dir}/metrics")
    funnel = {"input": docs.count()}
    for stage, df in stages.items():
        funnel[stage] = df.count()

    tbl = SnapshotTable(f"{out_dir}/curated")
    t0 = time.time()
    tbl.commit(curated, mode="replace", meta={"job": job_id, "funnel": funnel})
    metrics.record(
        spark,
        job_id,
        stage="funnel",
        kv={**{f"n_{k}": float(v) for k, v in funnel.items()},
            "seconds": time.time() - t0},
    )
    return funnel
