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
