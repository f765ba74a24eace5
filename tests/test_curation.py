"""End-to-end curation funnel: composed operators over a crafted corpus
with known survivors at every stage."""

import pytest
from pyspark.sql import functions as F

from mimirsbrunn_spark.jobs.curation_job import curate, run_curation_job
from mimirsbrunn_spark.tables import SnapshotTable


@pytest.fixture(scope="module")
def corpus(spark):
    base = ("the quick brown fox jumps over the lazy dog near the old stone "
            "bridge by the river in the morning light of early summer today")
    rows = [
        # url-canon dups (same canonical URL, different tracking junk)
        (1, "https://e.com/a?utm_source=x",
         "an entirely separate essay about the habits of mountain goats on "
         "steep alpine ridges where the snow remains until the late spring"),
        (2, "https://E.COM/a?gclid=9",
         "an entirely separate essay about the goats and their winter paths"),
        # exact dup pair (normalized text identical)
        (3, "https://e.com/b", base + " two"),
        (4, "https://e.com/c", "  " + base + " two "),
        # near-dup of 3 (one word changed)
        (5, "https://e.com/d", (base + " two").replace("jumps", "leaps")),
        # too short
        (6, "https://e.com/e", "tiny text"),
        # wrong language (german markers)
        (7, "https://e.com/f", "der schnelle braune fuchs springt und ist der beste im wald "
                               "und die hunde sind nicht da aber das licht ist schoen heute"),
        # clean survivor
        (8, "https://e.com/g", "a completely different long document about spark dataframes "
                               "and the shuffles that the engine plans for the cluster today"),
    ]
    return spark.createDataFrame(rows, "doc_id long, url string, text string")


def test_curation_funnel(spark, corpus, tmp_path):
    curated, stages = curate(
        corpus,
        url_col="url",
        langs=("en",),
        min_tokens=5,
        near_dup_threshold=0.5,
    )
    got_ids = {r.doc_id for r in curated.select("doc_id").collect()}
    # 2 lost to url canon; 4 lost to exact dedup; 5 lost to near-dup cluster
    # with 3; 6 lost to min_tokens; 7 lost to language filter
    assert got_ids == {1, 3, 8}
    assert {r.doc_id for r in stages["url_canon"].collect()} == {1, 3, 4, 5, 6, 7, 8}
    assert {r.doc_id for r in stages["exact_dedup"].collect()} == {1, 3, 5, 6, 7, 8}
    assert {r.doc_id for r in stages["near_dup"].collect()} == {1, 3, 6, 7, 8}

    # job wrapper: publishes + funnel metrics
    src = str(tmp_path / "docs")
    corpus.write.parquet(src)
    out = str(tmp_path / "out")
    funnel = run_curation_job(
        spark, src, out, url_col="url", langs=("en",), min_tokens=5,
        near_dup_threshold=0.5,
    )
    assert funnel == {
        "input": 8, "url_canon": 7, "exact_dedup": 6, "near_dup": 5,
        "quality": 4, "language": 3,
    }
    assert SnapshotTable(f"{out}/curated").read(spark).count() == 3
    m = SnapshotTable(f"{out}/metrics").read(spark)
    assert m.filter("stage = 'funnel' and key = 'n_language'").count() == 1
