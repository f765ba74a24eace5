"""Top-N heavy-hitter continuous aggregates: exact finest-tier semantics by
hand, cascade==direct equality when child lists are complete, and the
space-saving error bound (``max_missed``) on an adversarially truncated
cascade."""

from pyspark.sql import functions as F

from mimirsbrunn_spark.operators.topn import topn_cascade, topn_rollup, topn_serve


def _mk(spark, rows):
    return spark.createDataFrame(rows, "sec long, url string").select(
        F.timestamp_seconds("sec").alias("warc_ts"), "url"
    )


def test_topn_exact_hand_with_ties(spark):
    """cnt desc, item asc deterministic order; rank is dense row_number."""
    rows = (
        [(0, "b")] * 3 + [(0, "a")] * 3 + [(0, "c")] * 1
        + [(3600, "z")] * 2 + [(3600, "y")] * 1
    )
    got = topn_rollup(_mk(spark, rows), "1h", n=2, slack=1).collect()
    by_bucket = {}
    for r in got:
        by_bucket.setdefault(int(r["bucket_ts"].timestamp()), []).append(
            (r["rank"], r["item"], r["cnt"], r["max_missed"])
        )
    assert sorted(by_bucket[0]) == [(1, "a", 3, 0), (2, "b", 3, 0)]  # tie: item asc
    assert sorted(by_bucket[3600]) == [(1, "z", 2, 0), (2, "y", 1, 0)]


def test_cascade_equals_direct_when_lists_complete(spark):
    """With per-child-bucket cardinality under the keep limit nothing is
    truncated, so the cascaded parent list == the direct parent list
    (ranks, counts and max_missed=0 alike)."""
    rows = [
        (h * 3600 + i, f"u{(i * 7 + h) % 9}")
        for h in range(30)
        for i in range(40)
    ]
    pg = _mk(spark, rows)
    n, slack = 3, 4  # limit 12 > 9 distinct per bucket
    child = topn_rollup(pg, "1h", n, slack=slack)
    got = topn_cascade(child, "1d", n, slack=slack)
    want = topn_rollup(pg, "1d", n, slack=slack)
    key = ["bucket_ts", "item", "cnt", "rank"]
    assert got.select(*key).exceptAll(want.select(*key)).count() == 0
    assert want.select(*key).exceptAll(got.select(*key)).count() == 0
    assert got.filter(F.col("max_missed") != 0).count() == 0
    served = topn_serve(got, n)
    assert served.groupBy("bucket_ts").count().agg(F.max("count")).first()[0] <= n


def test_cascade_error_bound_adversarial(spark):
    """Force truncation (many distinct items per child bucket, tiny limit):
    every item absent from the cascaded parent list must have true parent
    count <= the bucket's max_missed, and max_missed must be positive for
    buckets built from truncated children."""
    # 2 child (1h) buckets in one parent (1d) bucket; 20 items each with
    # near-flat counts so the per-child floor is large relative to heads.
    rows = []
    for b, base in ((0, 0), (1, 3600)):
        for i in range(20):
            reps = 3 + (i % 3) + (3 if i == b else 0)  # mild heads u0/u1
            rows += [(base + i, f"u{i:02d}")] * reps
    pg = _mk(spark, rows)
    n, slack = 2, 2  # limit 4 << 20 distinct: heavy truncation
    child = topn_rollup(pg, "1h", n, slack=slack)
    casc = topn_cascade(child, "1d", n, slack=slack)

    truth = {
        r["item"]: r["cnt"]
        for r in pg.select(F.col("url").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    kept = {r["item"] for r in casc.collect()}
    bound = casc.agg(F.max("max_missed")).first()[0]
    assert bound and bound > 0
    missed = {i: c for i, c in truth.items() if i not in kept}
    assert missed  # the fixture really truncates
    assert all(c <= bound for c in missed.values()), (bound, missed)


def test_two_level_cascade_inherits_bound(spark):
    """1h -> 1d -> 30d: the 30d bound includes the 1d level's own
    max_missed (inherited), not just the 1d floors."""
    rows = []
    for day in range(2):
        for b in range(2):
            base = day * 86400 + b * 3600
            for i in range(20):
                rows += [(base + i, f"u{i:02d}")] * (2 + i % 3)
    pg = _mk(spark, rows)
    n, slack = 2, 2
    c1h = topn_rollup(pg, "1h", n, slack=slack)
    c1d = topn_cascade(c1h, "1d", n, slack=slack)
    c30 = topn_cascade(c1d, "30d", n, slack=slack)
    b1d = c1d.agg(F.max("max_missed")).first()[0]
    b30 = c30.agg(F.max("max_missed")).first()[0]
    assert b30 >= b1d > 0
    # bound stays sound vs raw truth at the 30d level
    truth = {
        r["item"]: r["cnt"]
        for r in pg.groupBy(F.col("url").alias("item"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    kept = {r["item"] for r in c30.collect()}
    missed = {i: c for i, c in truth.items() if i not in kept}
    if missed:
        assert max(missed.values()) <= b30
