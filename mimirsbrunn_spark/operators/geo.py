"""Geospatial operators: the reference's workhorse spatial join re-expressed
for Spark (SURVEY.md J1/G2/G3/J5).

The reference builds an in-process R-tree over admin polygons and probes
every point through an envelope (AABB) prefilter then an exact containment
test (/root/reference/src/admin_geofinder.rs:105-251, envelope fn :47-65,
exact contains :96-99). The Spark-first equivalent:

1. grid-cell bucketing: polygons are exploded to the cells their bbox
   covers; points map to exactly one cell → **equi-join on cell id** (the
   shuffle-friendly analog of the R-tree lookup);
2. bbox prefilter inside the joined pair (cheap comparisons, G3);
3. exact point-in-polygon verify via a vectorized ray-casting numpy kernel
   in a pandas UDF (G2) — only on bbox-surviving pairs.

Broadcast is used when the polygon side is small (the reference's case:
admin sets fit in RAM); the cell join path is the 100 TB-side fallback.

Reverse geocode (J5, rubber.rs:513-547): nearest-point join = cell
neighborhood equi-join + haversine + row_number top-1.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

POLY_SCHEMA = "poly_id long, xs array<double>, ys array<double>"


def _cells_for_bbox(minx, miny, maxx, maxy, cell: float):
    return [
        (cx, cy)
        for cx in range(int(np.floor(minx / cell)), int(np.floor(maxx / cell)) + 1)
        for cy in range(int(np.floor(miny / cell)), int(np.floor(maxy / cell)) + 1)
    ]


def polygons_with_cells(polys: DataFrame, cell: float = 1.0, pad: float = 0.0) -> DataFrame:
    """Explode polygons to covering grid cells + attach bbox columns.
    Built-ins only: bbox from array min/max, cells via sequence×sequence.
    ``pad`` expands the CELL coverage (not the bbox columns) by a distance —
    the within-``pad`` candidate-generation primitive for distance queries."""
    p = polys.select(
        "*",
        F.array_min("xs").alias("minx"),
        F.array_max("xs").alias("maxx"),
        F.array_min("ys").alias("miny"),
        F.array_max("ys").alias("maxy"),
    )
    cxs = F.sequence(
        F.floor((F.col("minx") - pad) / cell).cast("int"),
        F.floor((F.col("maxx") + pad) / cell).cast("int"),
    )
    cys = F.sequence(
        F.floor((F.col("miny") - pad) / cell).cast("int"),
        F.floor((F.col("maxy") + pad) / cell).cast("int"),
    )
    return (
        p.withColumn("cx", F.explode(cxs))
        .withColumn("cy", F.explode(cys))
        .withColumn("cell_id", F.concat_ws(":", "cx", "cy"))
        .drop("cx", "cy")
    )


def points_with_cell(points: DataFrame, cell: float = 1.0, x="x", y="y") -> DataFrame:
    return points.withColumn(
        "cell_id",
        F.concat_ws(
            ":",
            F.floor(F.col(x) / cell).cast("int"),
            F.floor(F.col(y) / cell).cast("int"),
        ),
    )


def _pip_batch(it):
    """Ray-casting point-in-polygon, vectorized over the batch's points per
    polygon row-group (numpy; no per-vertex Python)."""
    for pdf in it:
        out = np.zeros(len(pdf), dtype=bool)
        for i, (px, py, xs, ys) in enumerate(
            zip(pdf["x"], pdf["y"], pdf["xs"], pdf["ys"])
        ):
            xa = np.asarray(xs, dtype=np.float64)
            ya = np.asarray(ys, dtype=np.float64)
            xb = np.roll(xa, -1)
            yb = np.roll(ya, -1)
            crosses = ((ya > py) != (yb > py)) & (
                px < (xb - xa) * (py - ya) / (yb - ya) + xa
            )
            out[i] = crosses.sum() % 2 == 1
        yield pd.DataFrame(
            {"point_id": pdf["point_id"], "poly_id": pdf["poly_id"], "inside": out}
        )


def spatial_join(
    points: DataFrame,
    polys: DataFrame,
    cell: float = 1.0,
    broadcast_polys: bool = True,
) -> DataFrame:
    """(point_id, poly_id) pairs where the point lies inside the polygon.
    Cell equi-join → bbox prefilter → exact ray-cast verify."""
    pc = points_with_cell(points.select("point_id", "x", "y"), cell)
    gc = polygons_with_cells(polys, cell)
    right = F.broadcast(gc) if broadcast_polys else gc
    cand = pc.join(right, "cell_id").filter(
        (F.col("x") >= F.col("minx"))
        & (F.col("x") <= F.col("maxx"))
        & (F.col("y") >= F.col("miny"))
        & (F.col("y") <= F.col("maxy"))
    )
    verified = cand.select("point_id", "x", "y", "poly_id", "xs", "ys").mapInPandas(
        _pip_batch, schema="point_id long, poly_id long, inside boolean"
    )
    return verified.filter("inside").drop("inside").dropDuplicates(["point_id", "poly_id"])


# --- G5: polygon centroid (osm_utils.rs:58-68 make_centroid) --------------


def centroid_cols(xs_col: str = "xs", ys_col: str = "ys"):
    """Area-weighted polygon centroid (shoelace formula — the geo crate's
    Centroid algorithm), as pure JVM column expressions. Returns
    (cx, cy) Columns. Degenerate (zero-area) rings fall back to the vertex
    mean, like geo's centroid of a collapsed polygon."""
    n = f"size({xs_col})"
    # next-vertex rotation: [x2..xn, x1]; try_element_at, not element_at —
    # ANSI mode (Spark 4 default) THROWS on index-out-of-bounds, so a single
    # empty/corrupt ring in a planet-scale import would kill the job instead
    # of yielding a NULL/NaN centroid (tests/test_edge_semantics.py)
    xr = f"concat(slice({xs_col}, 2, greatest({n} - 1, 0)), array(try_element_at({xs_col}, 1)))"
    yr = f"concat(slice({ys_col}, 2, greatest({n} - 1, 0)), array(try_element_at({ys_col}, 1)))"
    cross = (
        f"zip_with({xs_col}, {yr}, (a, b) -> a * b)"
        f", zip_with({xr}, {ys_col}, (a, b) -> a * b)"
    )
    cross_sum = (
        f"aggregate(zip_with({cross}, (u, v) -> u - v), cast(0.0 as double), (acc, t) -> acc + t)"
    )
    area2 = F.expr(cross_sum)  # 2*signed area
    sx = F.expr(
        f"aggregate(zip_with(zip_with({xs_col}, {xr}, (a, b) -> a + b),"
        f" zip_with({cross}, (u, v) -> u - v), (s, c) -> s * c),"
        " cast(0.0 as double), (acc, t) -> acc + t)"
    )
    sy = F.expr(
        f"aggregate(zip_with(zip_with({ys_col}, {yr}, (a, b) -> a + b),"
        f" zip_with({cross}, (u, v) -> u - v), (s, c) -> s * c),"
        " cast(0.0 as double), (acc, t) -> acc + t)"
    )
    mean_x = F.expr(f"aggregate({xs_col}, cast(0.0 as double), (a, t) -> a + t) / {n}")
    mean_y = F.expr(f"aggregate({ys_col}, cast(0.0 as double), (a, t) -> a + t) / {n}")
    cx = F.when(F.abs(area2) < 1e-12, mean_x).otherwise(sx / (3 * area2))
    cy = F.when(F.abs(area2) < 1e-12, mean_y).otherwise(sy / (3 * area2))
    return cx, cy


def with_centroid(polys: DataFrame, xs_col: str = "xs", ys_col: str = "ys") -> DataFrame:
    cx, cy = centroid_cols(xs_col, ys_col)
    return polys.withColumn("cx", cx).withColumn("cy", cy)


# --- G6: way middle-node coord (osm_utils.rs:36-56 get_way_coord) ----------


def way_middle_coord(nodes_xs_col, nodes_ys_col):
    """The coord of the way's middle node (index n/2, 0-based — the
    reference prefers a middle node so way ends near admin boundaries don't
    misassign the street). Returns (x, y) Columns."""
    idx = (F.size(nodes_xs_col) / 2).cast("int") + 1  # element_at is 1-based
    # try_element_at: an empty way yields NULL coords instead of an ANSI
    # INVALID_ARRAY_INDEX crash (corrupt input must not kill the import)
    return (
        F.try_element_at(nodes_xs_col, idx),
        F.try_element_at(nodes_ys_col, idx),
    )


# --- G4: point↔boundary distance (admin_geofinder.rs:85-94 distance_2) ----


def _boundary_dist_batch(it):
    """Min euclidean distance from each point to the polygon's boundary
    edges (clamped point-to-segment projection, vectorized over edges).
    0.0 when the point lies inside (matching geo's euclidean_distance of a
    contained point)."""
    for pdf in it:
        out = np.empty(len(pdf), dtype=np.float64)
        for i, (px, py, xs, ys) in enumerate(
            zip(pdf["x"], pdf["y"], pdf["xs"], pdf["ys"])
        ):
            xa = np.asarray(xs, dtype=np.float64)
            ya = np.asarray(ys, dtype=np.float64)
            xb = np.roll(xa, -1)
            yb = np.roll(ya, -1)
            crosses = ((ya > py) != (yb > py)) & (
                px < (xb - xa) * (py - ya) / (yb - ya) + xa
            )
            if crosses.sum() % 2 == 1:  # inside
                out[i] = 0.0
                continue
            dx, dy = xb - xa, yb - ya
            seg2 = dx * dx + dy * dy
            t = np.where(seg2 > 0, ((px - xa) * dx + (py - ya) * dy) / np.where(seg2 > 0, seg2, 1), 0.0)
            t = np.clip(t, 0.0, 1.0)
            qx, qy = xa + t * dx, ya + t * dy
            out[i] = float(np.sqrt(np.min((px - qx) ** 2 + (py - qy) ** 2)))
        yield pd.DataFrame(
            {"point_id": pdf["point_id"], "poly_id": pdf["poly_id"], "boundary_dist": out}
        )


def point_boundary_distance(points: DataFrame, polys: DataFrame) -> DataFrame:
    """(point_id, poly_id, boundary_dist) for every point×polygon pair the
    caller provides (pre-filter with spatial_join / cell bucketing at scale;
    the reference's R-tree distance_2 probes play the same role). Arrow-
    batched numpy kernel — no per-vertex Python."""
    pairs = points.select("point_id", "x", "y").crossJoin(
        F.broadcast(polys.select("poly_id", "xs", "ys"))
    )
    return pairs.mapInPandas(
        _boundary_dist_batch, schema="point_id long, poly_id long, boundary_dist double"
    )


def point_boundary_distance_bucketed(
    points: DataFrame, polys: DataFrame, cell: float = 1.0, max_dist: float = 1.0
) -> DataFrame:
    """Scale path for G4: (point_id, poly_id, boundary_dist) for every pair
    within ``max_dist`` of each other — candidate pairs come from a cell
    EQUI-join (polygon cells padded by max_dist), never a cross join, so the
    plan has no CartesianProduct/BroadcastNestedLoopJoin and the work is
    proportional to nearby pairs, not |points|×|polys|. Complete for all
    pairs with boundary_dist <= max_dist (a polygon within max_dist of a
    point covers that point's cell after padding); farther pairs are
    dropped — the same contract as the reference's bounded R-tree distance
    probes (admin_geofinder.rs:85-94)."""
    pc = points_with_cell(points.select("point_id", "x", "y"), cell)
    gc = polygons_with_cells(polys.select("poly_id", "xs", "ys"), cell, pad=max_dist)
    cand = pc.join(gc, "cell_id").select("point_id", "x", "y", "poly_id", "xs", "ys")
    out = cand.mapInPandas(
        _boundary_dist_batch, schema="point_id long, poly_id long, boundary_dist double"
    )
    return out.filter(F.col("boundary_dist") <= max_dist)


def nearest_neighbor_join(
    probes: DataFrame,
    sites: DataFrame,
    cell: float = 1.0,
    max_radius_cells: int = 1,
) -> DataFrame:
    """Top-1 nearest site per probe within the cell neighborhood (J5):
    neighborhood equi-join (cell ± radius) → euclidean distance →
    row_number over (probe) ordered by (distance, site_id) → rank 1."""
    r = max_radius_cells
    neighbor_cells = F.array(
        *[
            F.concat_ws(
                ":",
                (F.floor(F.col("x") / cell) + dx).cast("int"),
                (F.floor(F.col("y") / cell) + dy).cast("int"),
            )
            for dx in range(-r, r + 1)
            for dy in range(-r, r + 1)
        ]
    )
    p = probes.select("probe_id", "x", "y").withColumn("cell_id", F.explode(neighbor_cells))
    s = points_with_cell(
        sites.select(F.col("site_id"), F.col("x").alias("sx"), F.col("y").alias("sy")),
        cell,
        x="sx",
        y="sy",
    )
    cand = p.join(s, "cell_id")
    dist = F.sqrt(
        (F.col("x") - F.col("sx")) * (F.col("x") - F.col("sx"))
        + (F.col("y") - F.col("sy")) * (F.col("y") - F.col("sy"))
    )
    w = Window.partitionBy("probe_id").orderBy(F.asc("dist"), F.asc("site_id"))
    return (
        cand.select("probe_id", "site_id", dist.alias("dist"))
        .dropDuplicates(["probe_id", "site_id"])
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
