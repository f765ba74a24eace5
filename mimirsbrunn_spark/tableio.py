"""TableIO: the storage-backend seam between the engine and its table format.

The engine's jobs (rollup_job, maintenance_job, streaming sink) talk to
tables through this narrow protocol. Two implementations:

- ``SnapshotTable`` (tables.py): the self-contained snapshot format this
  sandbox ships (no Iceberg jars available) — manifest JSON + immutable
  parquet file sets, atomic pointer swap.
- ``IcebergTable`` (here): the deploy-time adapter over a real Iceberg
  catalog — ``df.writeTo(ident).append()`` / ``createOrReplace()``,
  snapshot-id time travel via the read option, metadata DELETEs for
  partition drops. It uses only public Spark/Iceberg SQL surface; it needs
  a session with an Iceberg catalog configured (not available in this
  sandbox, so tests drive it against a recording mock).

The protocol is duck-typed (python Protocol): SnapshotTable already
conforms; nothing imports Iceberg at module load.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

from pyspark.sql import DataFrame, SparkSession


@runtime_checkable
class TableIO(Protocol):
    """What the engine's jobs need from a table backend."""

    def commit(
        self,
        df: DataFrame,
        mode: str = "append",
        meta: dict | None = None,
        partition_by: str | None = None,
        stats_cols: tuple[str, ...] = (),
        cluster_by: tuple[str, ...] = (),
        cluster_files: int | None = None,
    ) -> int: ...

    def replace_partitions(
        self,
        df: DataFrame,
        values,
        meta: dict | None = None,
        partition_by: str | None = None,
        stats_cols: tuple[str, ...] = (),
        cluster_by: tuple[str, ...] = (),
        cluster_files: int | None = None,
    ) -> int: ...

    def read(self, spark: SparkSession, **kw) -> DataFrame: ...

    def read_at(self, spark: SparkSession, snapshot_id: int, **kw) -> DataFrame: ...

    def exists(self) -> bool: ...

    def current_snapshot_id(self) -> int | None: ...

    def drop_partition_values(self, values, meta: dict | None = None) -> int | None: ...

    def partition_row_count(self, value: str) -> int: ...

    def row_count(self) -> int: ...


class IcebergTable:
    """Iceberg-catalog adapter. ``ident`` is the catalog table identifier
    (e.g. ``prod.db.series_1m``); ``partition_col`` names the Iceberg
    partition column (declared at table creation).

    Snapshot ids come from the table's ``.snapshots`` metadata view;
    ``read_at`` uses the documented ``snapshot-id`` read option. Partition
    drops are ``DELETE WHERE col IN (...)`` — metadata-only in Iceberg when
    the predicate aligns with partition boundaries. ``partition_row_count``
    reads the ``.partitions`` metadata view (record_count), not the data."""

    def __init__(self, spark: SparkSession, ident: str, partition_col: str | None = None):
        self.spark = spark
        self.ident = ident
        self.partition_col = partition_col

    # -- TableIO ------------------------------------------------------------

    def commit(
        self,
        df,
        mode="append",
        meta=None,
        partition_by=None,
        stats_cols=(),
        cluster_by=(),
        cluster_files=None,
        **_,
    ):
        """``cluster_by`` is honored by physically range-clustering the
        rows before the write, via the SAME helper SnapshotTable.commit uses
        (tables.cluster_for_write) so the two backends produce identical
        file-bound quality. Iceberg records per-file column bounds for EVERY
        column automatically, so ``stats_cols`` needs no action here; tight
        bounds are what clustering buys. Clustering is skipped only for
        non-DataFrame inputs (the mock-driven unit tests) — a real DataFrame
        with a bad cluster column RAISES rather than silently committing
        unclustered."""
        assert mode in ("append", "replace")
        if cluster_by and isinstance(df, DataFrame):
            from .tables import cluster_for_write

            df = cluster_for_write(df, partition_by, cluster_by, cluster_files)
        writer = df.writeTo(self.ident)
        if partition_by:
            try:
                from pyspark.sql import functions as F

                part_col = F.col(partition_by)
            except Exception:  # no active session (mock-driven unit tests)
                part_col = partition_by
            writer = writer.partitionedBy(part_col)
        for k, v in (meta or {}).items():
            writer = writer.tableProperty(f"engine.meta.{k}", str(v))
        if mode == "replace":
            writer.createOrReplace()
        elif not self.exists():
            writer.create()
        else:
            writer.append()
        return self.current_snapshot_id()

    def replace_partitions(
        self,
        df,
        values,
        meta=None,
        partition_by=None,
        stats_cols=(),
        cluster_by=(),
        cluster_files=None,
    ):
        """Atomic partition overwrite via Iceberg's filter overwrite
        (``overwrite(condition)`` — one snapshot that deletes every row
        whose partition value is in ``values`` AND appends df). NOT dynamic
        ``overwritePartitions``: dynamic mode only touches partitions
        present in df, so a listed partition receiving zero rows would keep
        its stale data — diverging from SnapshotTable.replace_partitions,
        which clears every listed partition."""
        assert self.exists(), "replace_partitions needs an existing table"
        col = partition_by or self.partition_col
        if col is None:
            raise ValueError("replace_partitions needs a partition column")
        from pyspark.sql import functions as F

        if isinstance(df, DataFrame):
            # SnapshotTable's stray-row guard, reproduced: filter overwrite
            # deletes only the listed partitions but appends ALL of df, so a
            # row outside `values` would double-count against its partition's
            # surviving files. One cheap take(1) on the df being written.
            # NULL partition keys are strays too — `~isin` evaluates to NULL
            # for them (three-valued logic) and would silently pass the
            # guard, yet the overwrite condition below never deletes
            # NULL-keyed rows, so they'd accumulate across every replace.
            stray = df.filter(
                (~F.col(col).cast("string").isin(sorted(values)))
                | F.col(col).isNull()
            ).take(1)
            if stray:
                raise ValueError(
                    f"replace_partitions: df contains rows for partitions not "
                    f"in the replaced set (e.g. {stray[0]})"
                )
            if cluster_by:
                from .tables import cluster_for_write

                df = cluster_for_write(df, col, cluster_by, cluster_files)
        writer = df.writeTo(self.ident)
        for k, v in (meta or {}).items():
            writer = writer.tableProperty(f"engine.meta.{k}", str(v))
        # plain column ref (NO cast wrapper): Iceberg's overwrite-by-filter
        # must strictly project the delete condition onto the partition
        # spec, and a CAST-wrapped column does not convert — Spark coerces
        # the IN-list literals to the column's type instead
        try:
            cond = F.col(col).isin(sorted(values))
        except Exception:
            # No active SparkContext — reachable ONLY from mock-driven unit
            # tests (a real DataFrameWriterV2 cannot exist without a session,
            # so a real .overwrite never receives this string). The string
            # mirrors the Column so the mock log records the same predicate.
            cond = f"{col} IN ({', '.join(repr(str(v)) for v in sorted(values))})"
        writer.overwrite(cond)
        return self.current_snapshot_id()

    def read(self, spark=None, **_):
        return (spark or self.spark).read.table(self.ident)

    def read_at(self, spark=None, snapshot_id=None, **_):
        return (
            (spark or self.spark)
            .read.option("snapshot-id", snapshot_id)
            .table(self.ident)
        )

    def exists(self) -> bool:
        return self.spark.catalog.tableExists(self.ident)

    def current_snapshot_id(self) -> int | None:
        rows = self.spark.sql(
            f"SELECT snapshot_id FROM {self.ident}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return int(rows[0][0]) if rows else None

    def drop_partition_values(self, values, meta=None) -> int | None:
        if not self.exists() or not values:
            return None
        col = self.partition_col
        if col is None:
            raise ValueError("drop_partition_values needs partition_col")
        vals = ", ".join(f"'{v}'" for v in sorted(values))
        self.spark.sql(f"DELETE FROM {self.ident} WHERE CAST({col} AS STRING) IN ({vals})")
        return self.current_snapshot_id()

    def partition_row_count(self, value: str) -> int:
        col = self.partition_col
        rows = self.spark.sql(
            f"SELECT COALESCE(SUM(record_count), 0) FROM {self.ident}.partitions "
            f"WHERE CAST(partition.{col} AS STRING) = '{value}'"
        ).collect()
        return int(rows[0][0] or 0)

    def row_count(self) -> int:
        """Current row count from the snapshot summary ('total-records') —
        Iceberg metadata, no data scan."""
        rows = self.spark.sql(
            f"SELECT summary['total-records'] FROM {self.ident}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return int(rows[0][0]) if rows and rows[0][0] is not None else 0
