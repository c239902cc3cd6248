"""Golden test for zone typing: the 8-zone libpostal scenario from the
reference (src/zone_typer.rs:422-501) plus the country finder."""

import pytest
from pyspark.sql import functions as F

from cosmospark.typer import assign_country, clean_untagged_zones, make_rules, type_zones

# the complex_rules() yaml (zone_typer.rs:397-417) as rule tables
LEVELS = [
    ("FR", "2", "country"),
    ("FR", "4", "state"),
    ("FR", "5", "state_district"),
    ("FR", "6", "state_district"),
    ("FR", "8", "city"),
    ("FR", "9", "suburb"),
]
ID_OVERRIDES = [
    ("FR", "relation:z1", "city_district"),
    ("FR", "relation:z4", None),  # explicit removal
    ("FR", "relation:z5", "city_district"),
]
CONTAINED_BY = [
    ("FR", "relation:big_zone", "9", "suburb"),
]

ZONES = [
    # (id, osm_id, admin_level)
    (0, "relation:z1", None),
    (1, "relation:z2", 5),
    (2, "relation:z3", 9),
    (3, "relation:z4", 9),
    (4, "relation:z5", 7),
    (5, "relation:z6", 7),
    (6, "relation:big_zone", 4),
    (7, "relation:very_big_zone", 2),
]

INCLUSIONS = [
    # included_by edges (zone_typer.rs:455-463)
    (0, 6),  # z1 ⊂ big_zone
    (1, 6),  # z2 ⊂ big_zone
    (2, 7),  # z3 ⊂ very_big_zone
    (2, 6),  # z3 ⊂ big_zone
    (3, 6),  # z4 ⊂ big_zone
]

EXPECTED = {
    "relation:z1": "city_district",  # id override beats missing level
    "relation:z2": "state_district",  # contained_by miss → default 5
    "relation:z3": "suburb",  # big_zone sub-rule for level 9
    "relation:z4": None,  # explicit-null id override wins over contained_by
    "relation:z5": "city_district",  # simple id override
    "relation:z6": None,  # level 7 unmapped
    "relation:big_zone": "state",
    "relation:very_big_zone": "country",
}


@pytest.fixture(scope="module")
def typed(spark):
    zones = spark.createDataFrame(
        [(i, o, l, "FR") for i, o, l in ZONES],
        "id long, osm_id string, admin_level int, country_code string",
    )
    inclusions = spark.createDataFrame(INCLUSIONS, "child long, parent long")
    rules = make_rules(spark, LEVELS, ID_OVERRIDES, CONTAINED_BY)
    out = type_zones(zones, inclusions, rules)
    return {r["osm_id"]: r["zone_type"] for r in out.collect()}


class TestTyper:
    def test_golden_scenario(self, typed):
        assert typed == EXPECTED

    def test_clean_untagged(self, spark):
        z = spark.createDataFrame(
            [(0, "city"), (1, None)], "id long, zone_type string"
        )
        assert clean_untagged_zones(z).count() == 1


class TestCountryFinder:
    def test_max_level_country_wins(self, spark):
        # zone 2 is included in both a country (level 2, FR) and a
        # sub-country ISO-tagged zone (level 4, XX with no rule → ignored),
        # plus an overseas country (level 3, GB) → GB wins on max level
        zones = spark.createDataFrame(
            [
                (0, "relation:fr", 2, {"ISO3166-1:alpha2": "fr"}),
                (1, "relation:gb", 3, {"ISO3166-1:alpha2": "GB"}),
                (2, "relation:child", 8, {}),
                (3, "relation:norule", 4, {"ISO3166-1:alpha2": "XX"}),
            ],
            "id long, osm_id string, admin_level int, tags map<string,string>",
        )
        inclusions = spark.createDataFrame(
            [(2, 0), (2, 1), (2, 3)], "child long, parent long"
        )
        rules = make_rules(spark, [("FR", "2", "country"), ("GB", "2", "country")])
        out = assign_country(zones, inclusions, rules)
        got = {r["osm_id"]: r["country_code"] for r in out.collect()}
        assert got["relation:child"] == "GB"
        # a country zone finds itself (self edge)
        assert got["relation:fr"] == "FR"
        assert got["relation:gb"] == "GB"
        # the ruleless ISO zone gets no country (not even itself)
        assert got["relation:norule"] is None
