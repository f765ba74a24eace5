"""TableIO seam: SnapshotTable conforms to the protocol; the Iceberg
adapter drives the public writeTo/snapshot-id/DELETE surface (verified
against a recording mock catalog — no Iceberg jars in the sandbox);
rollup_job runs unchanged through an explicit table_factory."""

from mimirsbrunn_spark.tableio import IcebergTable, TableIO
from mimirsbrunn_spark.tables import SnapshotTable


class FakeWriter:
    def __init__(self, log):
        self.log = log

    def partitionedBy(self, col):
        self.log.append(("partitionedBy", str(col)))
        return self

    def tableProperty(self, k, v):
        self.log.append(("tableProperty", k, v))
        return self

    def append(self):
        self.log.append(("append",))

    def create(self):
        self.log.append(("create",))

    def createOrReplace(self):
        self.log.append(("createOrReplace",))


class FakeDF:
    def __init__(self, log):
        self.log = log

    def writeTo(self, ident):
        self.log.append(("writeTo", ident))
        return FakeWriter(self.log)


class FakeRow(tuple):
    pass


class FakeResult:
    def __init__(self, rows):
        self.rows = rows

    def collect(self):
        return self.rows


class FakeCatalog:
    def __init__(self, exists):
        self._exists = exists

    def tableExists(self, ident):
        return self._exists


class FakeSpark:
    def __init__(self, exists=True, snapshot_id=7):
        self.log = []
        self.catalog = FakeCatalog(exists)
        self._sid = snapshot_id

    def sql(self, q):
        self.log.append(("sql", q))
        if ".snapshots" in q:
            return FakeResult([(self._sid,)])
        if ".partitions" in q:
            return FakeResult([(42,)])
        return FakeResult([])


def test_snapshot_table_conforms():
    t = SnapshotTable("/tmp/_proto_probe")
    assert isinstance(t, TableIO)


def test_iceberg_append_and_replace():
    spark = FakeSpark(exists=True)
    t = IcebergTable(spark, "cat.db.series_1m", partition_col="day")
    log = []
    sid = t.commit(FakeDF(log), mode="append", meta={"partition": "day=2024-01-01"})
    assert ("writeTo", "cat.db.series_1m") in log
    assert ("append",) in log and ("createOrReplace",) not in log
    assert ("tableProperty", "engine.meta.partition", "day=2024-01-01") in log
    assert sid == 7

    log2 = []
    t.commit(FakeDF(log2), mode="replace", partition_by="day")
    assert ("createOrReplace",) in log2
    assert any(c[0] == "partitionedBy" for c in log2)


def test_iceberg_create_when_missing():
    spark = FakeSpark(exists=False)
    t = IcebergTable(spark, "cat.db.t")
    log = []
    t.commit(FakeDF(log), mode="append")
    assert ("create",) in log and ("append",) not in log


def test_iceberg_drop_and_partition_count():
    spark = FakeSpark(exists=True)
    t = IcebergTable(spark, "cat.db.series_1m", partition_col="day")
    t.drop_partition_values({"2024-01-02", "2024-01-01"})
    deletes = [q for (_, q) in spark.log if q.startswith("DELETE")]
    assert deletes == [
        "DELETE FROM cat.db.series_1m WHERE CAST(day AS STRING) IN ('2024-01-01', '2024-01-02')"
    ]
    assert t.partition_row_count("2024-01-01") == 42
    assert any(".partitions" in q for (_, q) in spark.log)


def test_rollup_job_explicit_factory(spark, small_pages_path, tmp_path):
    from mimirsbrunn_spark.jobs.rollup_job import run_rollup_job

    out = str(tmp_path / "out_tf")
    summary = run_rollup_job(
        spark,
        small_pages_path,
        out,
        table_factory=lambda name: SnapshotTable(f"{out}/{name}"),
    )
    assert summary["days_processed"] == summary["days_total"] > 0
    assert SnapshotTable(f"{out}/rollup_1d").read(spark).count() > 0
