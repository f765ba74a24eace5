"""Structured Streaming ingest: continuous 1m series from a pages stream.

The reference is pure batch (SURVEY.md §2.10 — no streaming operators), and
the north rule specifies batch spark-submit jobs; this module is the
Spark-first continuous-operation path for the same semantics:

- ``readStream`` over the pages location (file source — at deploy time an
  Iceberg/Kafka source drops in);
- event-time tumbling window of 1 minute on ``warc_ts`` with a watermark for
  late data;
- ``foreachBatch`` merge into the same SnapshotTable the batch job writes,
  so downstream tiers/gap-fill/codecs are shared verbatim (micro-batch
  commit = the reference's per-dataset incremental alias republish,
  /root/reference/libs/mimir/src/rubber.rs:553-602).

Exactness note: streaming append-mode emits a window only once its watermark
passes, and the per-batch aggregate is the same integer arithmetic as the
batch path — so for a bounded input drained with ``availableNow`` the result
must equal series.series_1m exactly (asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ingest import PAGES_SCHEMA, with_host
from .tables import SnapshotTable


def stream_series_1m(
    spark: SparkSession,
    pages_dir: str,
    watermark: str = "10 minutes",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming 1m series (append mode after watermark). Dedup of exact
    duplicate (url, warc_ts) fetches uses dropDuplicatesWithinWatermark —
    state is bounded by the watermark horizon (unbounded-key dedup state
    would OOM a year-long stream)."""
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.parquet(pages_dir)
    deduped = pages.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
        ["url", "warc_ts"]
    )
    p = with_host(deduped)
    return (
        p.groupBy(
            F.col("host"),
            F.window("warc_ts", "1 minute").alias("w"),
            F.col("lang"),
        )
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.sum("page_size").alias("bytes_sum"),
        )
        .select(
            "host",
            F.col("w.start").alias("bucket_ts"),
            "lang",
            "doc_count",
            "bytes_sum",
        )
    )


def idempotent_batch_commit(table: SnapshotTable, batch_df: DataFrame, batch_id: int) -> bool:
    """foreachBatch-safe append: after a failure/restart Structured Streaming
    REPLAYS the last un-checkpointed batch with the same batch_id, so a naive
    append would double-commit those rows. Skip (return False) when a snapshot
    for this batch_id already exists in the current chain. (Walking the chain
    is O(snapshots) driver-side JSON reads; Iceberg's snapshot-summary lookup
    plays this role at deploy time.)"""
    if batch_df.isEmpty():
        return False
    if table.exists() and any(
        s.meta.get("stream_batch") == batch_id for s in table.snapshots()
    ):
        return False
    table.commit(batch_df, mode="append", meta={"stream_batch": batch_id})
    return True


def run_stream_to_table(
    spark: SparkSession,
    pages_dir: str,
    table: SnapshotTable,
    checkpoint_dir: str,
    available_now: bool = True,
) -> None:
    """Drain the stream into a SnapshotTable via foreachBatch append-commits
    (one atomic snapshot per micro-batch — resumable from the streaming
    checkpoint AND inspectable via table time travel)."""
    series = stream_series_1m(spark, pages_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        idempotent_batch_commit(table, batch_df, batch_id)

    writer = (
        series.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:  # pragma: no cover - continuous mode is deploy-time only
        writer.start()
