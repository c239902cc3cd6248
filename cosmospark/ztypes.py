"""Zone model: types, ordering, Spark schemas.

Mirrors the reference's Zone record (cosmogony/src/zone.rs:59-107) and the
load-bearing ZoneType ordering (zone.rs:12-23): the enum order drives both
parent selection (min_by_key, src/hierarchy_builder.rs:127) and the
can_be_child_of constraint (src/zone_ext.rs:360-363).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Order is LOAD-BEARING: index = rank used by min_by/can_be_child_of.
ZONE_TYPES = [
    "suburb",
    "city_district",
    "city",
    "state_district",
    "state",
    "country_region",
    "country",
    "non_administrative",
]

TYPE_RANK = {t: i for i, t in enumerate(ZONE_TYPES)}

# Rust Option<ZoneType> ordering: None < Some(anything)
# (zone_typer uses it only through can_be_child_of / min_by on Some values;
# we encode NULL-typed zones with rank -1 where Option ordering matters).
NULL_TYPE_RANK = -1

# synonyms accepted by ZoneType::parse (zone.rs:40-52)
TYPE_SYNONYMS = {
    "quarter": "suburb",
    "neighbourhood": "suburb",
    "town": "city",
    "village": "city",
}


def parse_zone_type(s: str | None) -> str | None:
    if s is None:
        return None
    s = TYPE_SYNONYMS.get(s, s)
    return s if s in TYPE_RANK else None


RINGS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("poly", T.IntegerType()),
            T.StructField("ring", T.IntegerType()),
            T.StructField("xs", T.ArrayType(T.DoubleType())),
            T.StructField("ys", T.ArrayType(T.DoubleType())),
        ]
    )
)

BBOX_TYPE = T.StructType(
    [
        T.StructField("minx", T.DoubleType()),
        T.StructField("miny", T.DoubleType()),
        T.StructField("maxx", T.DoubleType()),
        T.StructField("maxy", T.DoubleType()),
    ]
)

CENTER_TYPE = T.StructType(
    [T.StructField("lon", T.DoubleType()), T.StructField("lat", T.DoubleType())]
)

# zones_raw: the post-extraction zone record, before typing/parenting
# (FIXTURES.md F1)
ZONES_RAW_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("osm_id", T.StringType(), False),
        T.StructField("admin_level", T.IntegerType(), True),
        T.StructField("zone_type", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("center_tags", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("center", CENTER_TYPE, True),
        T.StructField("rings", RINGS_TYPE, True),
        T.StructField("bbox", BBOX_TYPE, True),
        T.StructField("is_generated", T.BooleanType(), True),
    ]
)

# full output Zone schema (zone.rs:59-107 → SURVEY.md §1.2)
ZONE_OUT_SCHEMA = T.StructType(
    list(ZONES_RAW_SCHEMA.fields)
    + [
        T.StructField("parent", T.LongType(), True),
        T.StructField("country_code", T.StringType(), True),
        T.StructField("zip_codes", T.ArrayType(T.StringType()), True),
        T.StructField("wikidata", T.StringType(), True),
        # loc_name / alt_name from relation tags (src/zone_ext.rs:152-162;
        # empty string when absent, matching the reference's default)
        T.StructField("loc_name", T.StringType(), True),
        T.StructField("alt_name", T.StringType(), True),
        T.StructField("label", T.StringType(), True),
        T.StructField(
            "international_labels", T.MapType(T.StringType(), T.StringType()), True
        ),
    ]
)

IMAGES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
        T.StructField("lon", T.DoubleType(), False),
        T.StructField("lat", T.DoubleType(), False),
    ]
)
