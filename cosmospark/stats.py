"""Output stats (reference cosmogony/src/model.rs:19-46).

Three grouped counts over the final zone table:
* ``level_counts``      — zones per admin_level
* ``zone_type_counts``  — zones per zone_type
* ``wikidata_counts``   — zones with a wikidata id per admin_level
  (the ``if wikidata.is_some()`` guard at model.rs:41-44 == count(col))
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def compute_stats(zones: DataFrame) -> dict:
    by_level = (
        zones.groupBy("admin_level")
        .agg(F.count("*").alias("n"), F.count("wikidata").alias("wd"))
        .collect()
    )
    by_type = zones.groupBy("zone_type").count().collect()
    return {
        "zone_count": sum(r["n"] for r in by_level),
        "level_counts": {r["admin_level"]: r["n"] for r in by_level},
        "zone_type_counts": {r["zone_type"]: r["count"] for r in by_type},
        "wikidata_counts": {r["admin_level"]: r["wd"] for r in by_level},
    }


def stats_df(zones: DataFrame) -> DataFrame:
    """Stats as a DataFrame (for SQL-oracle cross-checks)."""
    return (
        zones.groupBy("admin_level")
        .agg(F.count("*").alias("n_zones"), F.count("wikidata").alias("n_wikidata"))
        .orderBy("admin_level")
    )
