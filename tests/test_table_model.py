"""Model-based randomized test of the snapshot-table layer: a seeded random
sequence of every mutation the engine uses (append / replace /
replace_partitions / drop_partition_values / drop_partitions / compact /
update_meta / vacuum) is applied both to a SnapshotTable and to a plain
Python dict model; after every step the table must agree with the model on
content, manifest row arithmetic, and (until vacuumed) time travel.

This is the layer retention/maintenance correctness stands on — the
per-operation unit tests each pin one path; this pins their COMPOSITION."""

import random

import pytest
from pyspark.sql import functions as F

from mimirsbrunn_spark.retention import compact, vacuum
from mimirsbrunn_spark.tables import SnapshotTable

PARTS = ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"]


def _df(spark, rows):
    return spark.createDataFrame(rows or [], "p string, v long")


def _content(spark, tbl):
    return sorted((r.p, r.v) for r in tbl.read(spark).collect())


def _model_rows(model):
    return sorted((p, v) for p, vs in model.items() for v in vs)


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_snapshot_table_random_ops_vs_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    tbl = SnapshotTable(str(tmp_path / f"t{seed}"))
    model: dict[str, list[int]] = {}
    history: list[tuple[int, list]] = []  # (snapshot_id, model rows)
    nxt = 0
    vacuumed = False

    def fresh_rows(k=6):
        nonlocal nxt
        out = []
        for _ in range(k):
            out.append((rng.choice(PARTS), nxt))
            nxt += 1
        return out

    # seed commit so every op has a table to act on
    rows = fresh_rows()
    tbl.commit(_df(spark, rows), partition_by="p", stats_cols=("v",))
    for p, v in rows:
        model.setdefault(p, []).append(v)
    history.append((tbl.current_snapshot_id(), _model_rows(model)))

    for _ in range(12):
        op = rng.choice(
            ["append", "replace", "replace_parts", "drop_values", "drop_below",
             "compact", "update_meta", "vacuum"]
        )
        if op == "append":
            rows = fresh_rows()
            tbl.commit(_df(spark, rows), mode="append", partition_by="p", stats_cols=("v",))
            for p, v in rows:
                model.setdefault(p, []).append(v)
        elif op == "replace":
            rows = fresh_rows()
            tbl.commit(_df(spark, rows), mode="replace", partition_by="p", stats_cols=("v",))
            model = {}
            for p, v in rows:
                model.setdefault(p, []).append(v)
        elif op == "replace_parts":
            target = set(rng.sample(PARTS, rng.randint(1, 2)))
            rows = [(p, v) for p, v in fresh_rows() if p in target]
            tbl.replace_partitions(
                _df(spark, rows), target, partition_by="p", stats_cols=("v",)
            )
            for p in target:
                model.pop(p, None)
            for p, v in rows:
                model.setdefault(p, []).append(v)
        elif op == "drop_values":
            target = {rng.choice(PARTS)}
            tbl.drop_partition_values(target)
            for p in target:
                model.pop(p, None)
        elif op == "drop_below":
            below = rng.choice(PARTS)
            tbl.drop_partitions(spark, below=below)
            model = {p: vs for p, vs in model.items() if p >= below}
        elif op == "compact":
            compact(spark, tbl)
        elif op == "update_meta":
            tbl.update_meta({"mark": rng.randint(0, 9)})
        elif op == "vacuum":
            vacuum(tbl, keep_snapshots=1)
            vacuumed = True
            history.clear()

        # invariants after EVERY op
        assert _content(spark, tbl) == _model_rows(model)
        snap = tbl.snapshot(tbl.current_snapshot_id())
        assert tbl.row_count() == len(_model_rows(model))
        assert snap.row_count == sum(snap.file_rows[f] for f in snap.files)
        for p in PARTS:
            assert tbl.partition_row_count(p) == len(model.get(p, []))
        # stats pruning must never hide rows: a full-range filter keeps all
        assert (
            tbl.read(spark, stats_filters={"v": (0, None)}).count()
            == len(_model_rows(model))
        )
        history.append((tbl.current_snapshot_id(), _model_rows(model)))

    # time travel: every snapshot since the last vacuum replays its model
    for sid, rows in history:
        assert sorted((r.p, r.v) for r in tbl.read_at(spark, sid).collect()) == rows


def test_append_inherits_declared_layout(spark, tmp_path):
    """An append with no layout args must inherit the table's declared
    layout (files written partitioned + stats'd, manifest layout unchanged)
    rather than silently downgrading the table to layout {} — which would
    disable manifest pruning, zone maps, and the partitioned-retention fast
    path for every later read."""
    import pytest

    from mimirsbrunn_spark.tables import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "t"))
    df1 = spark.createDataFrame(
        [("2024-01-01", "a", 1.0), ("2024-01-02", "b", 2.0)],
        "pkey string, host string, v double",
    )
    tbl.commit(
        df1, mode="replace", partition_by="pkey", stats_cols=("host",), cluster_by=("host",)
    )
    declared = tbl.snapshot(tbl.current_snapshot_id()).layout

    df2 = spark.createDataFrame(
        [("2024-01-03", "c", 3.0)], "pkey string, host string, v double"
    )
    tbl.commit(df2, mode="append")  # NO layout args
    after = tbl.snapshot(tbl.current_snapshot_id())
    assert after.layout == declared, "ad-hoc append rewrote the declared layout"
    # the appended files conform: every file carries a real partition value
    # and host zone maps
    assert all(after.partitions.get(f) for f in after.files)
    assert all("host" in after.file_stats.get(f, {}) for f in after.files)
    assert tbl.read(spark).count() == 3

    # conflicting partition column: loud error, not a silent respec
    with pytest.raises(ValueError, match="conflicts with the table's declared layout"):
        tbl.commit(df2.withColumnRenamed("pkey", "other"), mode="append", partition_by="other")
    # conflicting stats_cols / cluster_by: same — an append can never respec
    # the declared pruning layout
    with pytest.raises(ValueError, match="stats_cols.*conflicts"):
        tbl.commit(df2, mode="append", stats_cols=("v",))
    with pytest.raises(ValueError, match="cluster_by.*conflicts"):
        tbl.commit(df2, mode="append", cluster_by=("v",))
    # a PARTIAL append (partition_by only) still inherits the rest
    tbl.commit(df2.withColumn("pkey", F.lit("2024-01-04")), mode="append", partition_by="pkey")
    assert tbl.snapshot(tbl.current_snapshot_id()).layout == declared
