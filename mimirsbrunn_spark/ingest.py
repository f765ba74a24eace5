"""Pages ingestion: scan, host derivation, exact dedup, text invariant.

Capability graft of the reference's per-record converter stage + dedup
(/root/reference/src/addr_reader.rs:35-52 converter closures with bad-record
drops; /root/reference/src/osm_reader/street.rs:202-246 arg-min dedup), as
declarative DataFrame ops so Catalyst pushes filters/pruning into the scan.

Scale notes: everything here is narrow (no shuffle) except ``dedup_pages``,
which shuffles on (url, warc_ts) — high-cardinality keys, so no skew. The
text-invariant check is an aggregation producing one row (a violation count),
never a collect of data rows.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

# Printable-ASCII byte table used by the vectorized extractor: bytes 0x20..0x7E
# kept, everything else deleted (pinned spec, oracle/reference.py).
_DELETE = bytes(b for b in range(256) if not (0x20 <= b <= 0x7E))


def _extract_text_batch(html: pd.Series) -> pd.Series:
    """Arrow-batched text extraction. ``bytes.translate`` with a delete table
    runs in C per value — no per-byte Python. Must match
    oracle.reference.extract_text_py byte-for-byte (per-row invariant,
    BASELINE.json input_hint)."""
    return html.map(lambda b: b.translate(None, delete=_DELETE).decode("ascii"))


def extract_text_udf():
    """Lazily-built pandas UDF (registration needs an active SparkSession)."""
    return pandas_udf(_extract_text_batch, "string")


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """Scan the pages table. With real Iceberg this is
    ``spark.read.table("pages")``; the sandbox uses parquet paths. Column
    pruning + predicate pushdown are Catalyst's (verified in tests via
    .explain containing PushedFilters/ReadSchema).

    Naive parquet timestamps must be read as UTC instants: under a vanilla
    session (no get_spark confs — exactly what a driver harness or
    spark-submit default gives you) Spark 4 infers TIMESTAMP_NTZ, which
    breaks every epoch-second cast downstream. Pin the conf here, at the
    scan seam, like gate._table does (same tz discipline, SURVEY.md §7.5)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    return spark.read.parquet(path)


def with_host(pages: DataFrame) -> DataFrame:
    """Derive url_host + page_size. JVM-side expressions only (codegen'd).

    ``try_parse_url``, not ``parse_url``: Spark 4's parse_url THROWS on a
    malformed url (INVALID_URL), and a 10^12-page crawl WILL contain some —
    one bad row must yield a NULL host (kept as its own group downstream),
    never crash the job. Pinned in tests/test_edge_semantics.py."""
    return pages.withColumn(
        "host", F.expr("try_parse_url(url, 'HOST')")
    ).withColumn("page_size", F.coalesce(F.length("html"), F.lit(0)).cast("long"))


def dedup_pages(pages: DataFrame) -> DataFrame:
    """Collapse exact duplicate (url, warc_ts) fetches.

    Duplicates are exact copies (fixture invariant, asserted by
    ``check_duplicate_payloads``), so dropDuplicates is value-deterministic.
    Reference analog: street dedup keep-min-id
    (/root/reference/src/osm_reader/street.rs:202-246)."""
    return pages.dropDuplicates(["url", "warc_ts"])


def check_text_invariant(pages: DataFrame) -> int:
    """Count rows whose stored ``text`` differs from re-extraction of ``html``.
    Must be 0. Distributed: one aggregate row comes back to the driver."""
    return (
        pages.withColumn("_re", extract_text_udf()("html"))
        .filter(F.col("_re") != F.col("text"))
        .count()
    )


def check_duplicate_payloads(pages: DataFrame) -> int:
    """Count (url, warc_ts) groups whose duplicate rows are NOT exact copies
    (must be 0 — guards the dedup determinism assumption)."""
    return (
        pages.groupBy("url", "warc_ts")
        .agg(F.count_distinct(F.struct("html", "text", "lang")).alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
