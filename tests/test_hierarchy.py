"""Golden tests for the containment self-join + parent assignment.

Expected parent tables are copied verbatim from the reference's unit
tests (src/hierarchy_builder.rs:206-287): the four-squares world under
five zone-type permutations.
"""

import pytest
from pyspark.sql import functions as F

from cosmospark.fixtures import four_squares_zones
from cosmospark.hierarchy import build_hierarchy, find_inclusions, with_bbox_and_area
from cosmospark.ztypes import ZONES_RAW_SCHEMA


def make_zones_df(spark, types):
    return spark.createDataFrame(four_squares_zones(types), schema=ZONES_RAW_SCHEMA)


def parents_of(spark, types):
    zones = with_bbox_and_area(make_zones_df(spark, types))
    zones = zones.cache()
    inclusions = find_inclusions(zones)
    out = build_hierarchy(zones, inclusions)
    res = {r["id"]: r["parent"] for r in out.select("id", "parent").collect()}
    zones.unpersist()
    return res


def inclusion_edges(spark, types):
    zones = with_bbox_and_area(make_zones_df(spark, types))
    edges = find_inclusions(zones).collect()
    return {(r["child"], r["parent"]) for r in edges}


class TestInclusions:
    def test_four_squares_edges(self, spark):
        # z0 covers z1, z2, z3; z1 covers z2. z3 covers nothing (overlaps z1).
        edges = inclusion_edges(spark, ("country", "state", "city", "state"))
        assert edges == {(1, 0), (2, 0), (2, 1), (3, 0)}


class TestHierarchy:
    def test_base(self, spark):
        # hierarchy_test (hierarchy_builder.rs:206-217)
        assert parents_of(spark, ("country", "state", "city", "state")) == {
            0: None,
            1: 0,
            2: 1,
            3: 0,
        }

    def test_parent_only_admin(self, spark):
        # z1 non_administrative → cannot be a parent (rs:220-234)
        assert parents_of(spark, ("country", "non_administrative", "city", "state")) == {
            0: None,
            1: 0,
            2: 0,
            3: 0,
        }

    def test_equal_type_not_parent(self, spark):
        # z2 State cannot attach to State z1 (rs:237-251)
        assert parents_of(spark, ("country", "state", "state", "state")) == {
            0: None,
            1: 0,
            2: 0,
            3: 0,
        }

    def test_inverted_type(self, spark):
        # z2 CountryRegion: only z0 Country is greater (rs:255-269)
        assert parents_of(spark, ("country", "state", "country_region", "state")) == {
            0: None,
            1: 0,
            2: 0,
            3: 0,
        }

    def test_untyped_cannot_parent(self, spark):
        # z1 zone_type=None → not admin → not a parent, but still attaches
        # to z0 itself (rs:274-287)
        assert parents_of(spark, ("country", None, "city", "state")) == {
            0: None,
            1: 0,
            2: 0,
            3: 0,
        }
