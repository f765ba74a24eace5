"""Source connectors — the reference's importer scan family (SURVEY.md §2.1)
re-expressed as Spark readers.

| ref | reference reader | here |
|-----|------------------|------|
| S1  | headerless CSV (BANO), /root/reference/src/bin/bano2mimir.rs:54-64   | read_csv(schema, header=False) |
| S2  | headered CSV (OpenAddresses), openaddresses2mimir.rs:47-60           | read_csv(header=True) |
| S3  | gzip-transparent source, src/addr_reader.rs:128-147                  | built-in (Spark reads .gz) |
| S4  | directory scan + extension filter, openaddresses2mimir.rs:237-253    | glob paths |
| S8  | JSONL(.gz) scan (cosmogony), cosmogony2mimir.rs:163-166              | read_jsonl(schema) |
| S12 | chunked parallel bulk sink w/ error budget, rubber.rs:652-746        | write_with_error_budget |
| S15 | full scan (scroll), rubber.rs:805-835                                | plain table read |

Bad-record policy mirrors F5 (drop + count, src/addr_reader.rs:39-52):
readers run PERMISSIVE with a corrupt-record column; `split_corrupt` returns
(good, bad_count) so callers can enforce an error budget like the
reference's max_bulk_errors (rubber.rs:99,736-744).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT = "_corrupt_record"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = False,
    sep: str = ",",
) -> DataFrame:
    """CSV scan (S1 headerless / S2 headered). ``path`` may be a glob over a
    directory (S4: 'dir/*.csv*' also matches .csv.gz — S3 is free in Spark).
    Schema is explicit — schema-on-read inference is nondeterministic at
    scale and forbidden here."""
    full_schema = f"{schema}, {CORRUPT} string"
    return (
        spark.read.schema(full_schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT)
        .csv(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """JSON-lines scan (S8), gzip-transparent, explicit schema."""
    full_schema = f"{schema}, {CORRUPT} string"
    return (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT)
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, int]:
    """(clean rows without the corrupt column, bad-record count) — the
    drop-with-logging policy F5. The count is one aggregate, not a collect."""
    # Spark disallows queries touching only the corrupt-record column on raw
    # CSV/JSON scans (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache first, the
    # documented pattern. The cache also makes the two passes one scan.
    df = df.cache()
    bad = df.filter(F.col(CORRUPT).isNotNull()).count()
    good = df.filter(F.col(CORRUPT).isNull()).drop(CORRUPT)
    return good, bad


# --- S10: GTFS stops.txt (stops2mimir.rs:83-93,149-156) --------------------

GTFS_STOPS_SCHEMA = (
    "stop_id string, stop_lat double, stop_lon double, stop_name string, "
    "location_type int, visible int, parent_station string"
)


def read_gtfs_stops(spark: SparkSession, path: str) -> DataFrame:
    """Typed GTFS stops scan (S10). location_type: 0/null = stop point,
    1 = stop area; ``visible`` and ``parent_station`` optional."""
    return read_csv(spark, path, GTFS_STOPS_SCHEMA, header=True)


def gtfs_stop_areas(stops: DataFrame) -> DataFrame:
    """Stop areas + their stop-point counts (the nb_stop_points weight input,
    stops2mimir.rs:94-117): children counted by parent_station, left join so
    childless areas keep count 0."""
    areas = stops.filter(F.col("location_type") == 1)
    points = stops.filter(
        (F.col("location_type").isNull() | (F.col("location_type") == 0))
        & F.col("parent_station").isNotNull()
    )
    counts = points.groupBy(F.col("parent_station").alias("stop_id")).agg(
        F.count(F.lit(1)).alias("nb_stop_points")
    )
    return areas.join(counts, "stop_id", "left").withColumn(
        "nb_stop_points", F.coalesce("nb_stop_points", F.lit(0))
    )


# --- S9: NTFS multi-CSV relational scan (ntfs2mimir.rs:201, the
#     transit_model linked-CSV dir) ----------------------------------------

NTFS_SCHEMAS = {
    "stops": (
        "stop_id string, stop_name string, stop_lat double, stop_lon double, "
        "location_type int, parent_station string"
    ),
    "lines": "line_id string, line_name string, commercial_mode_id string",
    "routes": "route_id string, route_name string, line_id string",
    "commercial_modes": "commercial_mode_id string, commercial_mode_name string",
}


def read_ntfs(spark: SparkSession, ntfs_dir: str) -> dict[str, DataFrame]:
    """Read an NTFS directory as a relational model (S9): one typed
    DataFrame per linked CSV present (missing optional files are simply
    absent from the dict, like transit_model's optional collections)."""
    import os

    model = {}
    for name, schema in NTFS_SCHEMAS.items():
        p = os.path.join(ntfs_dir, f"{name}.txt")
        if os.path.exists(p):
            model[name] = read_csv(spark, p, schema, header=True)
    return model


def ntfs_stop_areas(model: dict[str, DataFrame]) -> DataFrame:
    """Stop areas + stop-point counts from the linked stops collection
    (the nb_stop_points map, ntfs2mimir.rs:203-215)."""
    return gtfs_stop_areas(model["stops"].withColumn("visible", F.lit(1))).drop("visible")


def ntfs_lines_with_modes(model: dict[str, DataFrame]) -> DataFrame:
    """Lines resolved to their commercial mode names via the linked
    commercial_modes collection (the mimir::CommercialMode build,
    ntfs2mimir.rs:103-110); routes resolve to lines the same way. Mode
    tables are tiny → broadcast."""
    lines = model["lines"].join(
        F.broadcast(model["commercial_modes"]), "commercial_mode_id", "left"
    )
    if "routes" in model:
        return model["routes"].join(
            F.broadcast(lines.select("line_id", "line_name", "commercial_mode_name")),
            "line_id",
            "left",
        )
    return lines


# --- S11: navitia .poi file scan (poi2mimir.rs:150-170) --------------------

POI_SCHEMA = (
    "poi_id string, poi_type_id string, poi_name string, lat double, lon double, "
    "visible int, weight int"
)
POI_TYPE_SCHEMA = "poi_type_id string, poi_type_name string"


def read_navitia_poi(spark: SparkSession, poi_dir: str) -> DataFrame:
    """navitia .poi model: poi.txt + poi_type.txt (';'-separated, headered),
    joined so each POI carries its resolved type name (the NavitiaModel
    try_from_path analog). Types are tiny → broadcast."""
    import os

    pois = read_csv(spark, os.path.join(poi_dir, "poi.txt"), POI_SCHEMA, header=True, sep=";")
    types = read_csv(
        spark, os.path.join(poi_dir, "poi_type.txt"), POI_TYPE_SCHEMA, header=True, sep=";"
    )
    good_p, _ = split_corrupt(pois)
    good_t, _ = split_corrupt(types)
    return good_p.join(F.broadcast(good_t), "poi_type_id", "left")


def write_with_error_budget(
    df: DataFrame,
    path: str,
    max_errors: int = 0,
    bad_filter=None,
    fmt: str = "parquet",
) -> int:
    """Bulk sink with an error budget (S12): rows matching ``bad_filter`` are
    counted and withheld; if the count exceeds ``max_errors`` the whole write
    aborts (the reference aborts the import past max_bulk_errors). Returns
    the number of bad rows."""
    if bad_filter is not None:
        bad = df.filter(bad_filter).count()
        if bad > max_errors:
            raise RuntimeError(f"error budget exceeded: {bad} > {max_errors}")
        df = df.filter(~bad_filter)
    else:
        bad = 0
    df.write.mode("overwrite").format(fmt).save(path)
    return bad
