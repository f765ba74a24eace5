"""Sources (CSV/JSONL/error budget), spatial join, rule engine, query API."""

import gzip
import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from mimirsbrunn_spark import query_api, sources
from mimirsbrunn_spark.operators import geo, rules


def test_csv_headerless_with_bad_records(spark, tmp_path):
    # BANO-style headerless rows + one corrupt line (S1 + F5)
    p = tmp_path / "bano.csv"
    p.write_text(
        "id1,10,Rue A,75001,Paris,src,48.85,2.35\n"
        "id2,12,Rue B,75002,Paris,src,48.86,2.36\n"
        "id3,not_a_number,Rue C,75003,Paris,src,bad,coords,extra,fields\n"
    )
    schema = (
        "id string, nb int, street string, zip string, city string, "
        "src string, lat double, lon double"
    )
    df = sources.read_csv(spark, str(p), schema, header=False)
    good, bad = sources.split_corrupt(df)
    assert bad == 1 and good.count() == 2
    assert good.filter(F.col("street") == "Rue A").count() == 1


def test_csv_gzip_glob(spark, tmp_path):
    # S3 gzip-transparent + S4 directory glob
    (tmp_path / "d").mkdir()
    with gzip.open(tmp_path / "d" / "a.csv.gz", "wt") as f:
        f.write("x1,1\nx2,2\n")
    (tmp_path / "d" / "b.csv").write_text("x3,3\n")
    df = sources.read_csv(spark, str(tmp_path / "d" / "*.csv*"), "k string, v int")
    good, bad = sources.split_corrupt(df)
    assert bad == 0
    assert sorted(r.k for r in good.collect()) == ["x1", "x2", "x3"]


def test_jsonl(spark, tmp_path):
    p = tmp_path / "z.jsonl"
    p.write_text("\n".join(json.dumps({"id": i, "name": f"z{i}"}) for i in range(5)))
    good, bad = sources.split_corrupt(
        sources.read_jsonl(spark, str(p), "id long, name string")
    )
    assert bad == 0 and good.count() == 5


def test_error_budget_sink(spark, tmp_path):
    df = spark.range(10).toDF("id")
    bad = F.col("id") > 7
    n = sources.write_with_error_budget(df, str(tmp_path / "out"), max_errors=2, bad_filter=bad)
    assert n == 2
    assert spark.read.parquet(str(tmp_path / "out")).count() == 8
    with pytest.raises(RuntimeError, match="error budget"):
        sources.write_with_error_budget(df, str(tmp_path / "out2"), max_errors=1, bad_filter=bad)


@pytest.fixture(scope="module")
def polys(spark):
    # unit square at origin, big rect, and a triangle
    rows = [
        (1, [0.0, 1.0, 1.0, 0.0], [0.0, 0.0, 1.0, 1.0]),
        (2, [-5.0, 5.0, 5.0, -5.0], [-5.0, -5.0, 5.0, 5.0]),
        (3, [10.0, 12.0, 11.0], [10.0, 10.0, 12.0]),
    ]
    return spark.createDataFrame(rows, geo.POLY_SCHEMA)


def test_spatial_join(spark, polys):
    pts = spark.createDataFrame(
        [
            (100, 0.5, 0.5),   # in square + rect
            (101, 3.0, 3.0),   # in rect only
            (102, 11.0, 10.5),  # in triangle
            (103, 50.0, 50.0),  # nowhere
            (104, 11.0, 11.9),  # near triangle apex — bbox hit, exact miss?
        ],
        "point_id long, x double, y double",
    )
    got = {(r.point_id, r.poly_id) for r in geo.spatial_join(pts, polys).collect()}
    assert (100, 1) in got and (100, 2) in got
    assert (101, 2) in got and (101, 1) not in got
    assert (102, 3) in got
    assert not any(p == 103 for p, _ in got)
    # oracle cross-check with pure numpy ray casting
    import itertools

    prows = polys.collect()
    ptrows = pts.collect()
    want = set()
    for pt, pl in itertools.product(ptrows, prows):
        xa, ya = np.array(pl.xs), np.array(pl.ys)
        xb, yb = np.roll(xa, -1), np.roll(ya, -1)
        crosses = ((ya > pt.y) != (yb > pt.y)) & (
            pt.x < (xb - xa) * (pt.y - ya) / (yb - ya) + xa
        )
        if crosses.sum() % 2 == 1:
            want.add((pt.point_id, pl.poly_id))
    assert got == want


def test_nearest_neighbor_join(spark):
    sites = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 1.0, 1.0), (3, 5.0, 5.0)], "site_id long, x double, y double"
    )
    probes = spark.createDataFrame(
        [(10, 0.2, 0.1), (11, 0.9, 1.2), (12, 4.5, 4.9)], "probe_id long, x double, y double"
    )
    got = {r.probe_id: r.site_id for r in geo.nearest_neighbor_join(probes, sites, cell=2.0).collect()}
    assert got == {10: 1, 11: 2, 12: 3}


def test_rule_engine_first_match(spark):
    df = spark.createDataFrame(
        [("amenity", "restaurant", "yes"), ("amenity", "bank", "no"), ("shop", "bakery", "yes")],
        "k string, v string, open string",
    )
    rs = [
        rules.Rule("r1", {"k": "amenity", "v": "restaurant"}, "poi.food"),
        rules.Rule("r2", {"k": "amenity"}, "poi.amenity"),  # broader rule later
        rules.Rule("r3", {"k": "shop", "open": "yes"}, "poi.shop"),
    ]
    rules.validate_rules(rs, {"poi.food", "poi.amenity", "poi.shop"})
    got = {(r.k, r.v): r.rule_match for r in rules.classify(df, rs).collect()}
    assert got[("amenity", "restaurant")] == "poi.food"  # first match wins
    assert got[("amenity", "bank")] == "poi.amenity"
    assert got[("shop", "bakery")] == "poi.shop"
    with pytest.raises(ValueError, match="unknown outputs"):
        rules.validate_rules(rs, {"poi.food"})


def test_rule_engine_joined_variant(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id long, tag string")
    rdf = spark.createDataFrame(
        [("a", 1, "first"), ("a", 2, "second"), ("b", 1, "only")],
        "tag string, priority int, output string",
    )
    got = {r.id: r.rule_match for r in rules.classify_joined(df, rdf, on=["tag"]).collect()}
    assert got == {1: "first", 2: "only", 3: None}


def test_query_api(spark, small_pages_path, tmp_path):
    from mimirsbrunn_spark.jobs.rollup_job import run_rollup_job

    out = str(tmp_path / "out")
    run_rollup_job(spark, small_pages_path, out)

    assert query_api.pick_tier(0, 3600 * 5, max_points=10) == "1h"
    assert query_api.pick_tier(0, 86400 * 400, max_points=100) == "30d"

    df = query_api.read_rollup(spark, out, "1h", limit=5)
    assert df.count() == 5 and "avg_page_size" in df.columns

    hosts = [r.host for r in df.select("host").distinct().collect()]
    filled = query_api.read_rollup(spark, out, "1h", hosts=hosts[:1], fill="locf")
    assert filled.filter("is_filled").count() >= 0
    assert set(filled.select("metric").distinct().toPandas()["metric"]) == {
        "doc_count",
        "bytes_sum",
    }
    # range pruning
    t0 = int(df.agg(F.min(F.col("bucket_ts").cast("long"))).collect()[0][0])
    narrow = query_api.read_rollup(spark, out, "1h", t0=t0, t1=t0 + 7200)
    assert narrow.agg(F.count_distinct("bucket_ts")).collect()[0][0] <= 2
