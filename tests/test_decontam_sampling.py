"""Decontamination (13-gram eval overlap) and deterministic stratified
sampling: crafted-corpus value checks, plan-shape assertions (broadcast, no
corpus shuffle), determinism/incremental-stability properties, and the
curation-funnel integration."""

import pytest
from pyspark.sql import functions as F

from mimirsbrunn_spark.operators import decontam, sampling

WORDS = ("alpha bravo charlie delta echo foxtrot golf hotel india juliett "
         "kilo lima mike november oscar papa quebec romeo sierra tango")


@pytest.fixture(scope="module")
def corpus(spark):
    # 20-token docs; 13-grams need >=13 tokens
    rows = [
        (1, WORDS),                                   # identical to eval doc
        (2, WORDS.replace("alpha", "zulu")),          # shares tail 13-grams
        (3, "uniform victor whiskey xray yankee zulu one two three four "
            "five six seven eight nine ten eleven twelve thirteen fourteen"),
        (4, "short doc under thirteen tokens here"),  # 0 grams
        (5, None),                                    # NULL text
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def eval_docs(spark):
    return spark.createDataFrame([(100, WORDS)], "doc_id long, text string")


def test_ngram_counts_and_normalization(spark):
    # 20 tokens -> 8 distinct 13-grams; punctuation/case collapse
    df = spark.createDataFrame([(1, WORDS.upper().replace(" ", ", "))],
                               "doc_id long, text string")
    n = df.select(F.size(decontam.ngram_keys(F.col("text"), hasher="none"))
                  .alias("n")).first().n
    assert n == 8


def test_contamination_values(spark, corpus, eval_docs):
    got = {r.doc_id: r for r in decontam.contamination(corpus, eval_docs).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    # doc 1: all 8 grams match
    assert got[1].total_grams == 8 and got[1].matched_grams == 8
    assert got[1].contam_frac == 1.0
    # doc 2: first token differs -> first gram(s) touched; tail grams
    # (windows not containing position 1) still match: windows 2..8 = 7
    assert got[2].total_grams == 8 and got[2].matched_grams == 7
    # doc 3: disjoint vocabulary
    assert got[3].matched_grams == 0 and got[3].total_grams == 8
    # short + NULL docs: zero grams, frac 0 (not NULL)
    for d in (4, 5):
        assert got[d].total_grams == 0 and got[d].matched_grams == 0
        assert got[d].contam_frac == 0.0


def test_contamination_hashed_equals_string_keys(spark, corpus, eval_docs):
    a = decontam.contamination(corpus, eval_docs, hasher="none")
    b = decontam.contamination(corpus, eval_docs, hasher="xxhash64")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_decontaminate_split_and_funnel(spark, corpus, eval_docs):
    kept, dropped = decontam.decontaminate(corpus, eval_docs, max_frac=0.0)
    assert {r.doc_id for r in kept.collect()} == {3, 4, 5}
    assert {r.doc_id for r in dropped.collect()} == {1, 2}
    # threshold: doc 2 (7/8 = 0.875) survives a 0.9 ceiling, doc 1 doesn't
    kept9, _ = decontam.decontaminate(corpus, eval_docs, max_frac=0.9)
    assert {r.doc_id for r in kept9.collect()} == {2, 3, 4, 5}


def test_decontam_plan_broadcasts_eval(spark, corpus, eval_docs):
    plan = decontam.contamination(corpus, eval_docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the corpus side must not be exchanged for the probe join
    assert "SortMergeJoin" not in plan


# --- stratified sampling ----------------------------------------------------


@pytest.fixture(scope="module")
def docs_langs(spark):
    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(3000)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


@pytest.fixture(scope="module")
def rates(spark):
    return spark.createDataFrame(
        [("en", 0.25), ("de", 1.0), ("fr", 0.0)], "lang string, rate double"
    )


def test_stratified_sample_rates_and_allowlist(spark, docs_langs, rates):
    out = sampling.stratified_sample(docs_langs, rates, seed=7)
    got = {r.lang: r.n_kept for r in
           sampling.sample_metrics(docs_langs, out).collect()}
    assert got["de"] == 1000            # rate 1.0 keeps everything
    assert got.get("fr", 0) == 0        # rate 0.0 drops everything
    assert 180 <= got["en"] <= 320      # ~250 expected at rate 0.25
    # a stratum absent from rates is dropped (explicit allowlist)
    extra = docs_langs.withColumn("lang", F.lit("zz"))
    assert sampling.stratified_sample(extra, rates, seed=7).count() == 0


def test_stratified_sample_deterministic_and_incremental(spark, docs_langs, rates):
    a = {r.doc_id for r in sampling.stratified_sample(
        docs_langs, rates, seed=7).select("doc_id").collect()}
    b = {r.doc_id for r in sampling.stratified_sample(
        docs_langs.repartition(13), rates, seed=7).select("doc_id").collect()}
    assert a == b                       # partition-layout independent
    c = {r.doc_id for r in sampling.stratified_sample(
        docs_langs, rates, seed=8).select("doc_id").collect()}
    assert a != c                       # seed actually matters
    # hash-stable incremental property: sampling a superset keeps exactly
    # the old sample plus new-row decisions (no resampling of old rows)
    grown = docs_langs.union(spark.createDataFrame(
        [(10_000 + i, "en") for i in range(300)], "doc_id long, lang string"))
    g = {r.doc_id for r in sampling.stratified_sample(
        grown, rates, seed=7).select("doc_id").collect()}
    assert a == {x for x in g if x < 10_000}


def test_sample_metrics_shape(spark, docs_langs, rates):
    out = sampling.stratified_sample(docs_langs, rates, seed=7)
    m = {r.lang: r for r in sampling.sample_metrics(docs_langs, out).collect()}
    assert m["de"].achieved_rate == 1.0
    assert m["fr"].n_kept == 0 and m["fr"].achieved_rate == 0.0
    assert m["en"].n_total == 1000


def test_sampling_plan_broadcasts_rates(spark, docs_langs, rates):
    plan = sampling.stratified_sample(docs_langs, rates, seed=7) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_curation_funnel_with_decontam_and_sampling(spark):
    from mimirsbrunn_spark.jobs.curation_job import curate

    rows = [(i, f"{WORDS} document number {i} about topic {i % 5} with "
                "several additional english filler words for the quality "
                "stage to accept the page") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ev = spark.createDataFrame(
        [(999, "document number 7 about topic 2 with several additional "
               "english filler words for the quality stage")],
        "doc_id long, text string")
    rates = spark.createDataFrame([("en", 1.0)], "lang string, rate double")
    curated, stages = curate(
        docs.withColumn("lang", F.lit("en")), langs=None, min_tokens=5,
        near_dup_threshold=0.95, eval_docs=ev, sample_rates=rates,
    )
    pre = {r.doc_id for r in stages["language"].select("doc_id").collect()}
    post = {r.doc_id for r in stages["decontaminate"].select("doc_id").collect()}
    assert 7 in pre and 7 not in post   # the eval-overlapping page dropped
    assert stages["stratified_sample"].count() == len(post)  # rate 1.0


# --------------------------------------------------------------------------
# PPS systematic sampling
# --------------------------------------------------------------------------


def _py_pps(rows, n, seed_order):
    """rows: list of (key, stratum, w). seed_order: key -> sort bucket."""
    out = {}
    by_stratum = {}
    for k, s, w in rows:
        if w > 0:
            by_stratum.setdefault(s, []).append((k, w))
    for s, items in by_stratum.items():
        items.sort(key=lambda kw: (seed_order[kw[0]], str(kw[0])))
        tot = sum(w for _, w in items)
        cum = 0
        for k, w in items:
            prev = cum
            cum += w
            picks = (cum * n) // tot - (prev * n) // tot
            if picks >= 1:
                out[(s, k)] = picks
    return out


def test_pps_exact_n_and_multiplicity(spark):
    from mimirsbrunn_spark.operators import sampling

    rows = [(f"d{i}", "en" if i % 2 else "de", (i % 7) + 1) for i in range(200)]
    rows.append(("huge", "en", 10_000))  # heavier than W/n: multi-pick row
    df = spark.createDataFrame(rows, "doc_id string, lang string, w long")
    n = 10
    got = sampling.pps_systematic_sample(
        df, "w", n, strata=("lang",), key_col="doc_id", seed=7
    ).collect()
    # per stratum the pick count telescopes to exactly n
    by_lang = {}
    for r in got:
        by_lang[r.lang] = by_lang.get(r.lang, 0) + r.n_picks
    assert by_lang == {"en": n, "de": n}
    # the heavy row must be selected and carry multiplicity > 1
    heavy = [r for r in got if r.doc_id == "huge"]
    assert heavy and heavy[0].n_picks > 1
    # exact agreement with the python reference (same hash order)
    order = {
        r.doc_id: r.b
        for r in df.select(
            "doc_id",
            sampling.sample_bucket(F.col("doc_id"), seed=7).alias("b"),
        ).collect()
    }
    exp = _py_pps([(r, l, w) for r, l, w in rows], n, order)
    assert {(r.lang, r.doc_id): r.n_picks for r in got} == exp


def test_pps_drops_nonpositive_weights_and_validates(spark):
    from mimirsbrunn_spark.operators import sampling

    df = spark.createDataFrame(
        [("a", "en", 0), ("b", "en", -3), ("c", "en", 5)],
        "doc_id string, lang string, w long",
    )
    got = sampling.pps_systematic_sample(df, "w", 3, key_col="doc_id").collect()
    assert [(r.doc_id, r.n_picks) for r in got] == [("c", 3)]
    import pytest as _pt

    with _pt.raises(ValueError):
        sampling.pps_systematic_sample(df, "w", 0, key_col="doc_id")


def test_pps_deterministic_across_partitionings(spark):
    from mimirsbrunn_spark.operators import sampling

    rows = [(f"d{i}", "en", (i * 13) % 50 + 1) for i in range(500)]
    df1 = spark.createDataFrame(rows, "doc_id string, lang string, w long")
    df2 = df1.repartition(17)
    a = {
        (r.doc_id, r.n_picks)
        for r in sampling.pps_systematic_sample(df1, "w", 25, key_col="doc_id").collect()
    }
    b = {
        (r.doc_id, r.n_picks)
        for r in sampling.pps_systematic_sample(df2, "w", 25, key_col="doc_id").collect()
    }
    assert a == b and len(a) <= 25
