"""Generator determinism + fixture-shape guarantees (FIXTURES.md §1)."""

import numpy as np
import pandas as pd

from mimirsbrunn_spark.synth import generate_pages
from oracle.reference import extract_text_py


def test_generator_deterministic():
    a = generate_pages(n_rows=3000, n_hosts=10, span_days=3)
    b = generate_pages(n_rows=3000, n_hosts=10, span_days=3)
    pd.testing.assert_frame_equal(a, b)


def test_fixture_shape_guarantees():
    df = generate_pages(n_rows=5000, n_hosts=10, span_days=4)
    # duplicates exist and are exact copies
    dups = df[df.duplicated(subset=["url", "warc_ts"], keep=False)]
    assert len(dups) > 0
    for _, g in dups.groupby(["url", "warc_ts"]):
        assert g["html"].nunique() == 1 and g["lang"].nunique() == 1
    # empty html exists; text matches pinned extraction everywhere
    assert (df["html"].map(len) == 0).any()
    sample = df.sample(200, random_state=0)
    assert all(extract_text_py(h) == t for h, t in zip(sample["html"], sample["text"]))
    # single-observation hosts exist
    counts = df["url"].str.extract(r"//([^/]+)/", expand=False).value_counts()
    assert (counts == 1).any()
    # per-host hour gaps exist (the gating rule leaves silent hours)
    h = df["url"].str.extract(r"//([^/]+)/", expand=False)
    top = counts.index[0]
    hours = set(df.loc[h == top, "warc_ts"].dt.floor("h"))
    span_hours = pd.date_range(min(hours), max(hours), freq="h")
    assert len(hours) < len(span_hours)  # gaps present


def test_spark_generator_deterministic(spark):
    from mimirsbrunn_spark.synth_spark import generate_pages_spark

    a = generate_pages_spark(spark, 20_000, n_hosts=20).orderBy("url").collect()
    b = generate_pages_spark(spark, 20_000, n_hosts=20).orderBy("url").collect()
    assert a == b
