"""The full zone pipeline: build_zones (reference src/lib.rs:236-277).

Stage DAG (each stage optionally checkpointed via cosmospark.checkpoint):

  1. extract    — filters S2-S4 + projection P1/P2 over raw tagged rows
  2. geometry   — bbox/area/zip/wikidata derivation
  3. inclusions — containment self-join (J1)
  4. typing     — country lookup (J3) + libpostal typing (J4)
  5. hierarchy  — parent assignment (J5+J6)
  6. names      — center-tag merge (P4) + international names (P3)
  7. labels     — parent-chain labels (W3+A5+P5)
  8. clean      — drop untyped (P7)

The zone side is broadcast-scale by design (≤ ~10^6 rows planet-wide —
the reference holds all zones in one process's RAM, README.md:55-62), so
every join here is a broadcast hash join; the only shuffles are the tiny
groupBys on zone ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cosmospark import checkpoint as ckpt
from cosmospark.hierarchy import build_hierarchy, find_inclusions, with_bbox_and_area
from cosmospark.labels import compute_labels, compute_names, with_zip_codes
from cosmospark.typer import assign_country, clean_untagged_zones, type_zones


def admin_relations(raw: DataFrame) -> DataFrame:
    """S2 (src/lib.rs:31-42): boundary=administrative with admin_level."""
    return raw.filter(
        (F.col("tags")["boundary"] == "administrative")
        & F.col("tags")["admin_level"].isNotNull()
    )


PLACE_VALUES = ["city", "town", "village", "suburb", "quarter", "neighbourhood"]


def place_nodes(raw: DataFrame, additional: bool = False) -> DataFrame:
    """S3/S4 (src/lib.rs:44-64): place nodes (city..neighbourhood), plus
    capital=yes when ``additional``."""
    cond = F.col("tags")["place"].isin(PLACE_VALUES)
    if additional:
        cond = cond | (F.col("tags")["capital"] == "yes")
    return raw.filter(cond)


def extract_places(raw: DataFrame) -> DataFrame:
    """P2 (src/zone_ext.rs:49-116 + additional_zones.rs:122-158): place
    nodes → boundary-less place records for Voronoi generation.
    zone_type parses the ``place`` tag with the reference's synonyms."""
    from cosmospark.ztypes import TYPE_SYNONYMS

    syn = F.col("tags")["place"]
    for k, v in TYPE_SYNONYMS.items():
        syn = F.when(F.col("tags")["place"] == k, F.lit(v)).otherwise(syn)
    z = raw.withColumn("zone_type", syn)
    if "name" not in z.columns:
        z = z.withColumn("name", F.col("tags")["name"])
    z = z.filter(F.col("name").isNotNull() & (F.col("name") != ""))
    if "admin_level" not in z.columns:
        z = z.withColumn("admin_level", F.col("tags")["admin_level"].cast("int"))
    if "lon" not in z.columns:
        z = z.withColumn("lon", F.col("center.lon")).withColumn("lat", F.col("center.lat"))
    return z.select("osm_id", "name", "zone_type", "admin_level", "lon", "lat", "tags")


def extract_zone_fields(raw: DataFrame) -> DataFrame:
    """P1-ish projection (src/zone_ext.rs:118-234): rows without a name
    are dropped (:126-135); admin_level parsed from tags when absent;
    wikidata from tags."""
    z = raw
    if "name" not in z.columns:
        z = z.withColumn("name", F.col("tags")["name"])
    else:
        z = z.withColumn("name", F.coalesce(F.col("name"), F.col("tags")["name"]))
    z = z.filter(F.col("name").isNotNull())
    if "admin_level" not in z.columns:
        z = z.withColumn("admin_level", F.col("tags")["admin_level"].cast("int"))
    else:
        z = z.withColumn(
            "admin_level",
            F.coalesce(F.col("admin_level"), F.col("tags")["admin_level"].cast("int")),
        )
    if "wikidata" not in z.columns:
        z = z.withColumn("wikidata", F.col("tags")["wikidata"])
    return z


def build_zones(
    spark: SparkSession,
    zones_raw: DataFrame,
    rules: dict[str, DataFrame],
    checkpoint_root: str | None = None,
    filter_langs: list[str] | None = None,
    keep_untyped: bool = False,
    places_raw: DataFrame | None = None,
    enable_voronoi: bool = False,
) -> DataFrame:
    """zones_raw (ZONES_RAW_SCHEMA-ish) → fully typed/parented/labelled
    zone table (ZONE_OUT_SCHEMA)."""

    def _prep():
        z = extract_zone_fields(zones_raw)
        z = with_bbox_and_area(z)
        z = with_zip_codes(z)
        return z

    zones = ckpt.run_stage(spark, checkpoint_root, "prep", _prep)
    zones = zones.cache()

    inclusions = ckpt.run_stage(
        spark, checkpoint_root, "inclusions", lambda: find_inclusions(zones)
    ).cache()

    def _typed():
        z = assign_country(zones, inclusions, rules)
        return type_zones(z, inclusions, rules)

    typed = ckpt.run_stage(spark, checkpoint_root, "typed", _typed).cache()

    parented = ckpt.run_stage(
        spark, checkpoint_root, "parented", lambda: build_hierarchy(typed, inclusions)
    )

    # stage 3d (src/lib.rs:219 compute_additional_places) — voronoi city
    # generation, off by default like the reference's --disable-voronoi
    # golden tests (tests/cosmogony_test.rs:113)
    if enable_voronoi and places_raw is not None:
        from cosmospark.voronoi import compute_additional_places, publish_new_places

        def _with_places():
            places = extract_places(places_raw)
            new = compute_additional_places(parented, places)
            return publish_new_places(parented, new)

        parented = ckpt.run_stage(spark, checkpoint_root, "voronoi", _with_places)

    def _labelled():
        z = compute_names(parented)
        return compute_labels(z, filter_langs=filter_langs)

    labelled = ckpt.run_stage(spark, checkpoint_root, "labelled", _labelled)

    out = labelled if keep_untyped else clean_untagged_zones(labelled)
    return out


# ---------------------------------------------------------------------------
# Sinks / sources (S5/S6): JSONL is the native distributed format;
# gzip via codec option. Format sniffing by extension mirrors
# cosmogony/src/file_format.rs:12-44.


def write_zones(zones: DataFrame, path: str) -> None:
    writer = zones.write.mode("overwrite")
    if path.endswith(".gz"):
        writer = writer.option("compression", "gzip")
    writer.json(path)


def read_zones(spark: SparkSession, path: str, schema=None) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)
