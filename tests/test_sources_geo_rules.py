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


def test_gtfs_stops_reader(spark, tmp_path):
    """S10: typed GTFS stops scan + stop-area point counts."""
    from mimirsbrunn_spark.sources import gtfs_stop_areas, read_gtfs_stops, split_corrupt

    p = tmp_path / "stops.txt"
    p.write_text(
        "stop_id,stop_lat,stop_lon,stop_name,location_type,visible,parent_station\n"
        "SA1,48.85,2.35,Chatelet,1,1,\n"
        "SP1,48.851,2.351,Chatelet Quai 1,0,1,SA1\n"
        "SP2,48.852,2.352,Chatelet Quai 2,0,1,SA1\n"
        "SA2,45.75,4.85,Part-Dieu,1,1,\n"
        "SP3,45.751,4.851,PD Quai A,,1,SA2\n"  # null location_type = stop point
        "BAD,not_a_lat,4.85,Broken,1,1,\n"
    )
    good, bad = split_corrupt(read_gtfs_stops(spark, str(p)))
    assert bad == 1
    areas = {r.stop_id: r.nb_stop_points for r in gtfs_stop_areas(good).collect()}
    assert areas == {"SA1": 2, "SA2": 1}


def test_ntfs_relational_reader(spark, tmp_path):
    """S9: dir of linked CSVs -> relational model with resolving joins."""
    from mimirsbrunn_spark.sources import ntfs_lines_with_modes, ntfs_stop_areas, read_ntfs

    d = tmp_path / "ntfs"
    d.mkdir()
    (d / "stops.txt").write_text(
        "stop_id,stop_name,stop_lat,stop_lon,location_type,parent_station\n"
        "SA1,Gare,48.8,2.3,1,\n"
        "SP1,Quai 1,48.81,2.31,0,SA1\n"
    )
    (d / "lines.txt").write_text(
        "line_id,line_name,commercial_mode_id\nL1,Metro 1,CM1\nL2,Bus 42,CM2\n"
    )
    (d / "routes.txt").write_text(
        "route_id,route_name,line_id\nR1,M1 Est,L1\nR2,M1 Ouest,L1\nR3,B42 Nord,L2\n"
    )
    (d / "commercial_modes.txt").write_text(
        "commercial_mode_id,commercial_mode_name\nCM1,Metro\nCM2,Bus\n"
    )
    model = read_ntfs(spark, str(d))
    assert set(model) == {"stops", "lines", "routes", "commercial_modes"}
    sa = {r.stop_id: r.nb_stop_points for r in ntfs_stop_areas(model).collect()}
    assert sa == {"SA1": 1}
    routes = {r.route_id: (r.line_name, r.commercial_mode_name)
              for r in ntfs_lines_with_modes(model).collect()}
    assert routes == {"R1": ("Metro 1", "Metro"), "R2": ("Metro 1", "Metro"),
                      "R3": ("Bus 42", "Bus")}


def test_navitia_poi_reader(spark, tmp_path):
    """S11: poi.txt + poi_type.txt (';'-separated) joined to typed POIs."""
    from mimirsbrunn_spark.sources import read_navitia_poi

    d = tmp_path / "poi"
    d.mkdir()
    (d / "poi.txt").write_text(
        "poi_id;poi_type_id;poi_name;lat;lon;visible;weight\n"
        "P1;T1;Louvre;48.86;2.33;1;5\n"
        "P2;T2;Velib 101;48.85;2.34;1;1\n"
        "P3;T9;Unknown type;48.0;2.0;1;1\n"
    )
    (d / "poi_type.txt").write_text(
        "poi_type_id;poi_type_name\nT1;museum\nT2;bike_rental\n"
    )
    got = {r.poi_id: r.poi_type_name for r in read_navitia_poi(spark, str(d)).collect()}
    assert got == {"P1": "museum", "P2": "bike_rental", "P3": None}


def test_inherit_city_weight(spark):
    """A6: entities copy their city admin's weight; no city -> keep own."""
    from mimirsbrunn_spark.operators.weights import inherit_city_weight

    entities = spark.createDataFrame(
        [("s1", "c1", 0.1), ("s2", "c1", 0.2), ("s3", "c2", 0.3), ("s4", "c9", 0.4)],
        "street_id string, city_key string, weight double",
    )
    admins = spark.createDataFrame(
        [("c1", 7.0, True), ("c1", 5.0, True), ("c2", 3.0, False), ("c9x", 9.0, True)],
        "city_key string, weight double, is_city boolean",
    )
    got = {r.street_id: r.weight for r in
           inherit_city_weight(entities, admins, "city_key").collect()}
    # c1 has two city rows -> max wins; c2's admin is not a city -> own weight
    assert got == {"s1": 7.0, "s2": 7.0, "s3": 0.3, "s4": 0.4}


def test_zips_at_max_level(spark):
    """A8: all zips at the highest level having any; empty levels skipped."""
    from mimirsbrunn_spark.operators.weights import zips_at_max_level

    rows = spark.createDataFrame(
        [
            ("e1", 8, ["75001"]),
            ("e1", 10, []),            # higher level but NO zips -> skipped
            ("e1", 8, ["75002"]),      # same max level -> merged
            ("e1", 6, ["75"]),
            ("e2", 4, None),           # null zips -> skipped entirely
        ],
        "entity_id string, level int, zip_codes array<string>",
    )
    got = {r.entity_id: r.zips for r in zips_at_max_level(rows).collect()}
    assert got == {"e1": ["75001", "75002"]}


def test_zoom_ratio_blend(spark):
    """G9: ln1p interpolation with clamping; blend endpoints."""
    import math

    from mimirsbrunn_spark.functions.scoring import blend_weight, zoom_ratio

    df = spark.createDataFrame([(r,) for r in [10.0, 100.0, 1000.0, 5000.0, 1.0]], "radius double")
    z = zoom_ratio(F.col("radius"), 100.0, 1000.0)
    got = [r.z for r in df.select(z.alias("z")).collect()]
    assert got[0] == 0.0 and got[4] == 0.0      # clamped below
    assert got[1] == 0.0 and got[3] == 1.0       # at min / clamped above
    want_mid = (math.log1p(1000.0) - math.log1p(100.0)) / (math.log1p(1000.0) - math.log1p(100.0))
    assert abs(got[2] - want_mid) < 1e-12        # at max -> 1
    b = df.select(blend_weight(z, 2.0, 10.0).alias("w")).collect()
    assert b[0].w == 2.0 and b[2].w == 10.0
