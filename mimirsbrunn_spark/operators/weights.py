"""Weight/zip aggregation operators (A6/A8).

A6 — street/POI weight inheritance: each entity copies the weight of its
city-level admin (/root/reference/src/osm_reader/street.rs:309-318,
poi.rs:217-226) — an equi-join on the admin key + coalesce (entities with
no city admin keep their own weight / 0).

A8 — zip-codes-at-max-level: among an entity's admins, find the highest
level that has any zip codes, and take ALL zips at that level
(/root/reference/src/utils.rs:37-53 get_zip_codes_from_admins).

Both are broadcast-friendly: admin tables are tiny relative to the entity
tables at 100 TB, so the joins never shuffle the big side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def inherit_city_weight(
    entities: DataFrame,
    admins: DataFrame,
    key: str,
    admin_weight_col: str = "weight",
    is_city_col: str = "is_city",
    out_col: str = "weight",
    broadcast_admins: bool = True,
) -> DataFrame:
    """A6: entities take their city admin's weight (join + coalesce).
    ``admins`` rows with ``is_city_col`` true are the donor set; ties (two
    city admins per key) resolve to the max weight, deterministically."""
    city = (
        admins.filter(F.col(is_city_col))
        .groupBy(key)
        .agg(F.max(admin_weight_col).alias("_aw"))
    )
    donor = F.broadcast(city) if broadcast_admins else city
    existing = F.col(out_col) if out_col in entities.columns else F.lit(0.0)
    return (
        entities.join(donor, key, "left")
        .withColumn(out_col, F.coalesce(F.col("_aw"), existing, F.lit(0.0)))
        .drop("_aw")
    )


def zips_at_max_level(
    admin_rows: DataFrame,
    entity_col: str = "entity_id",
    level_col: str = "level",
    zips_col: str = "zip_codes",
) -> DataFrame:
    """A8: per entity, the flattened zip list of the highest admin level
    that has any zips (levels with empty/null zip lists don't count — the
    reference's fold skips them). Returns (entity, zips sorted array);
    entities with no zipped level are absent (the reference returns [])."""
    has = admin_rows.filter(F.size(F.coalesce(F.col(zips_col), F.array())) > 0)
    mx = has.groupBy(entity_col).agg(F.max(level_col).alias("_mlvl"))
    return (
        has.join(mx, entity_col)
        .filter(F.col(level_col) == F.col("_mlvl"))
        .groupBy(entity_col)
        .agg(F.array_sort(F.flatten(F.collect_list(zips_col))).alias("zips"))
    )
