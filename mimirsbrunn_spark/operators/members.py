"""Relation→member resolution (S6/J8): linked OSM-style data as relational
joins over typed member tables.

The reference walks linked pbf objects in memory: a street relation's
member ways are looked up in the object map, each way's node ids resolve to
node coords, and the street takes its admin from a middle node
(/root/reference/src/osm_reader/street.rs:163-199 — relation member loop;
/root/reference/src/osm_reader/osm_utils.rs:36-56 — get_way_coord via the
obj_map). Spark-first, the object map becomes three tables

    nodes(node_id, x, y)
    ways(way_id, node_ids array<long>)
    relations(rel_id, way_ids array<long>)

and "lookup" becomes explode → equi-join → ordered re-collect. The
dependency-closure scan (S6: read only what a filtered relation set needs)
is a pair of semi-joins, so at 100 TB the node table is scanned once with
the needed-id set pushed in (broadcast when the closure is small, shuffle
semi-join otherwise) — never loaded wholesale into driver memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_way_nodes(ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """ways(way_id, node_ids) × nodes(node_id, x, y) →
    (way_id, xs, ys) with coords in node-list order (J8: the member-
    resolution join). Ways referencing a missing node keep the remaining
    coords (the reference's filter_map skips unresolvable members)."""
    exploded = ways.select("way_id", F.posexplode("node_ids").alias("pos", "node_id"))
    joined = exploded.join(nodes, "node_id")
    return (
        joined.groupBy("way_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "x", "y"))
            ).alias("pts")
        )
        .select(
            "way_id",
            F.col("pts.x").alias("xs"),
            F.col("pts.y").alias("ys"),
        )
    )


def resolve_relation_ways(relations: DataFrame, resolved_ways: DataFrame) -> DataFrame:
    """relations(rel_id, way_ids) × resolved ways(way_id, xs, ys) →
    (rel_id, way_id, xs, ys), one row per resolved member way (member order
    is not meaningful for admin boundaries; sort by way_id for determinism)."""
    exploded = relations.select("rel_id", F.explode("way_ids").alias("way_id"))
    return exploded.join(resolved_ways, "way_id").select("rel_id", "way_id", "xs", "ys")


def dependency_closure(
    relations: DataFrame,
    ways: DataFrame,
    nodes: DataFrame,
    broadcast_ids: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """S6: given a (filtered) relation set, return (needed_ways,
    needed_nodes) — the minimal member closure, computed with semi-joins so
    the big tables are scanned once and never collected. ``broadcast_ids``
    broadcasts the needed-id sets (the common case: a filtered relation set
    is small relative to the world's nodes)."""
    way_ids = relations.select(F.explode("way_ids").alias("way_id")).distinct()
    w = F.broadcast(way_ids) if broadcast_ids else way_ids
    needed_ways = ways.join(w, "way_id", "left_semi")
    node_ids = needed_ways.select(F.explode("node_ids").alias("node_id")).distinct()
    ni = F.broadcast(node_ids) if broadcast_ids else node_ids
    needed_nodes = nodes.join(ni, "node_id", "left_semi")
    return needed_ways, needed_nodes


def street_coords(relations: DataFrame, ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """End-to-end street.rs:163-199 analog: filtered street relations →
    member closure → per-way middle-node coord (the admin-probe point).
    Returns (rel_id, way_id, x, y)."""
    from .geo import way_middle_coord

    needed_ways, needed_nodes = dependency_closure(relations, ways, nodes)
    rw = resolve_relation_ways(relations, resolve_way_nodes(needed_ways, needed_nodes))
    mx, my = way_middle_coord(F.col("xs"), F.col("ys"))
    return rw.select("rel_id", "way_id", mx.alias("x"), my.alias("y"))
