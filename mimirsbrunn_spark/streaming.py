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


# ---------------------------------------------------------------------------
# custom stateful operator: per-host crawl-rate anomaly detection
# ---------------------------------------------------------------------------
# applyInPandasWithState (Arrow-batched arbitrary state — the Spark-first
# custom-operator escape hatch, SURVEY.md §2.10 extension). Spark forbids
# stateful ops AFTER a streaming aggregation, so this consumes RAW page
# events per host and maintains (current minute, count, EMA) itself:
# a minute closes when a later-minute event arrives for that host; the
# closed minute emits with its anomaly flag vs the EMA *before* it, then
# folds into the EMA. Late events for already-closed minutes are DROPPED
# and counted in the row's `late_dropped` (bounded state — the watermark
# analog is explicit here). Deterministic: rows sort by (warc_ts, url)
# inside each batch; EMA is IEEE double arithmetic in event order.

ANOMALY_SCHEMA = (
    "host string, bucket_ts timestamp, doc_count long, ema_before double, "
    "is_anomaly boolean, late_dropped long"
)
ANOMALY_STATE_SCHEMA = "ema double, n long, cur_min long, cur_count long, late long"


def _anomaly_fn(alpha: float, k: float, warmup: int):
    import pandas as pd

    def fn(key, pdf_iter, state):
        (host,) = key
        ema, n, cur_min, cur_count, late = (
            state.get if state.exists else (0.0, 0, -1, 0, 0)
        )
        out = {c: [] for c in ("host", "bucket_ts", "doc_count", "ema_before", "is_anomaly", "late_dropped")}

        def close(minute, count):
            nonlocal ema, n, late
            out["host"].append(host)
            out["bucket_ts"].append(pd.Timestamp(minute * 60, unit="s"))
            out["doc_count"].append(count)
            out["ema_before"].append(ema)
            out["is_anomaly"].append(bool(n >= warmup and count > k * ema))
            out["late_dropped"].append(late)
            ema = count if n == 0 else alpha * count + (1.0 - alpha) * ema
            n += 1
            late = 0

        # A large group spans multiple Arrow chunks with no cross-chunk
        # ordering guarantee — concatenate and sort ONCE so an earlier
        # timestamp arriving in a later chunk isn't misclassified as late
        # (determinism must not depend on arrow.maxRecordsPerBatch).
        chunks = list(pdf_iter)
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["warc_ts", "url"], kind="mergesort"
            )
            for ts in pdf["warc_ts"]:
                minute = int(pd.Timestamp(ts).value // 1_000_000_000) // 60
                if minute == cur_min:
                    cur_count += 1
                elif minute > cur_min:
                    if cur_min >= 0:
                        close(cur_min, cur_count)
                    cur_min, cur_count = minute, 1
                else:  # late event for a closed minute
                    late += 1
        state.update((ema, n, cur_min, cur_count, late))
        if out["host"]:
            yield pd.DataFrame(out)

    return fn


def stream_rate_anomalies(
    spark: SparkSession,
    pages_dir: str,
    alpha: float = 0.3,
    k: float = 3.0,
    warmup: int = 3,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming per-host crawl-rate anomalies over raw pages. Returns the
    streaming DataFrame (append mode); drain with foreachBatch/memory sink."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = with_host(reader.parquet(pages_dir))
    return pages.select("host", "url", "warc_ts").groupBy("host").applyInPandasWithState(
        _anomaly_fn(alpha, k, warmup),
        outputStructType=ANOMALY_SCHEMA,
        stateStructType=ANOMALY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def rate_anomalies_batch_oracle(pages_pdf, alpha: float = 0.3, k: float = 3.0, warmup: int = 3):
    """Single-node pandas oracle for stream_rate_anomalies (all-in-one-batch
    semantics: every minute except each host's last closes)."""
    import pandas as pd

    from oracle.reference import host_of

    rows = []
    pdf = pages_pdf.copy()
    pdf["host"] = host_of(pdf["url"])
    pdf["minute"] = pdf["warc_ts"].astype("datetime64[us]").astype("int64") // 60_000_000
    for host, g in pdf.sort_values(["warc_ts", "url"], kind="mergesort").groupby("host"):
        ema, n = 0.0, 0
        minutes = list(g.groupby("minute").size().items())  # ascending minute
        for minute, count in minutes[:-1]:  # last minute never closes
            rows.append(
                (host, pd.Timestamp(minute * 60, unit="s"), count, ema,
                 bool(n >= warmup and count > k * ema), 0)
            )
            ema = count if n == 0 else alpha * count + (1.0 - alpha) * ema
            n += 1
    return pd.DataFrame(
        rows, columns=["host", "bucket_ts", "doc_count", "ema_before", "is_anomaly", "late_dropped"]
    )


def idempotent_batch_commit(
    table: SnapshotTable, batch_df: DataFrame, batch_id: int, **commit_kw
) -> bool:
    """foreachBatch-safe append: after a failure/restart Structured Streaming
    REPLAYS the last un-checkpointed batch with the same batch_id, so a naive
    append would double-commit those rows. Skip (return False) when a snapshot
    for this batch_id already exists in the current chain. (Walking the chain
    is O(snapshots) driver-side JSON reads; Iceberg's snapshot-summary lookup
    plays this role at deploy time.) Extra kwargs (partition_by, stats_cols,
    ...) pass through to the commit."""
    if batch_df.isEmpty():
        return False
    if table.exists() and any(
        s.meta.get("stream_batch") == batch_id for s in table.snapshots()
    ):
        return False
    table.commit(batch_df, mode="append", meta={"stream_batch": batch_id}, **commit_kw)
    return True


def run_stream_to_table(
    spark: SparkSession,
    pages_dir: str,
    table: SnapshotTable,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Drain the stream into a SnapshotTable via foreachBatch append-commits
    (one atomic snapshot per micro-batch — resumable from the streaming
    checkpoint AND inspectable via table time travel). Returns the
    StreamingQuery handle: None for availableNow (already drained and
    terminated), the LIVE query for continuous mode — the caller must keep
    it and awaitTermination()/stop(), otherwise a spark-submit driver would
    return immediately and kill the just-started stream.

    Each batch commits with the SAME serving layout as the batch job's
    series table (the rollup_job SERVING_STATS/SERVING_CLUSTER constants):
    day-partitioned, host-clustered, with (host, bucket_ts) zone maps. A
    micro-batch spans a narrow time window, so the day partition and the
    per-file bucket_ts bounds are tight — time-scoped reads of the streamed
    table prune at the manifest level, host-scoped reads skip files, and
    retention's drop_partitions is metadata-only (an unpartitioned streamed
    table would satisfy none of these)."""
    from .jobs.rollup_job import SERVING_CLUSTER, SERVING_STATS

    series = stream_series_1m(spark, pages_dir).withColumn(
        "day", F.to_date("bucket_ts")
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        idempotent_batch_commit(
            table,
            batch_df,
            batch_id,
            partition_by="day",
            stats_cols=SERVING_STATS,
            cluster_by=SERVING_CLUSTER,
        )

    writer = (
        series.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return None
    return writer.start()  # pragma: no cover - continuous mode is deploy-time only


def stream_hopping(
    spark: SparkSession,
    pages_dir: str,
    window: str = "1 hour",
    hop: str = "15 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming hopping (sliding) windows per host: doc_count + bytes_sum
    over a ``window`` that advances every ``hop`` — the streaming twin of
    operators/analytics.hopping_window_agg. Uses the built-in sliding
    ``F.window`` (same epoch-aligned window-start set as the batch
    operator's explode enumeration, so a bounded drain equals the batch
    result row-for-row — pinned in tests). Append mode after the
    watermark; state is one partial aggregate per open (host, window),
    bounded by watermark horizon × window/hop."""
    pages = spark.readStream.schema(PAGES_SCHEMA).parquet(pages_dir)
    p = with_host(pages.withWatermark("warc_ts", watermark))
    return (
        p.groupBy(F.col("host"), F.window("warc_ts", window, hop).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.sum("page_size").alias("value_sum"),
        )
        .select(
            "host",
            F.col("w.start").cast("long").alias("window_start_sec"),
            "doc_count",
            "value_sum",
        )
    )


def stream_error_stats(
    spark: SparkSession,
    pages_dir: str,
    err_predicate_sql: str,
    step: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming per-host error-budget sufficient stats — the streaming twin
    of operators/slo.error_rollup: integer (tot, err) per (host, bucket).
    ``err_predicate_sql`` is a boolean SQL expression over the page columns
    marking a failed fetch (e.g. a status column at deploy time). The output
    feeds operators/slo.multiwindow_burn unchanged (the lambda pattern the
    engine already uses for realtime serving: materialize the streamed
    stats, derive burn rates at read time — the long RANGE window needs the
    committed history, not in-flight state). Append mode after watermark;
    state is one integer partial per open (host, bucket)."""
    pages = spark.readStream.schema(PAGES_SCHEMA).parquet(pages_dir)
    p = with_host(pages.withWatermark("warc_ts", watermark))
    return (
        p.groupBy(F.col("host"), F.window("warc_ts", step).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("tot"),
            # all-NULL-predicate group publishes err=0, not NULL (ADVICE r4 #1)
            F.coalesce(
                F.sum(F.expr(err_predicate_sql).cast("long")), F.lit(0)
            ).alias("err"),
        )
        .select(
            "host",
            F.col("w.start").cast("long").alias("bucket_sec"),
            "tot",
            "err",
        )
    )
