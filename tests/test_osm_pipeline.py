"""Raw-OSM front door tests: S2-S4 filters wired end-to-end, P1 member
extraction (label tag-merge, admin_centre/label center, loc_name /
alt_name), golden lux counts from raw OSM tables, --country-code."""

import pytest
from pyspark.sql import functions as F

from cosmospark.fixtures import LUX_RULES_LEVELS, LUX_X0, LUX_Y0, lux_osm_world
from cosmospark.pipeline import (
    build_zones_from_osm,
    extract_zones_from_osm,
    osm_place_zones,
    place_nodes,
)
from cosmospark.typer import make_rules


REL_SCHEMA = "relation_id long, tags map<string,string>"
MEM_SCHEMA = "relation_id long, way_id long, role string"
WAY_SCHEMA = "way_id long, node_ids array<long>"
NODE_SCHEMA = "node_id long, lon double, lat double, tags map<string,string>"
NMEM_SCHEMA = "relation_id long, node_id long, role string"


@pytest.fixture(scope="module")
def osm_tables(spark):
    w = lux_osm_world()
    return {
        "relations": spark.createDataFrame(w["relations"], REL_SCHEMA),
        "rel_members": spark.createDataFrame(w["rel_members"], MEM_SCHEMA),
        "ways": spark.createDataFrame(w["ways"], WAY_SCHEMA),
        "nodes": spark.createDataFrame(w["nodes"], NODE_SCHEMA),
        "rel_node_members": spark.createDataFrame(w["rel_node_members"], NMEM_SCHEMA),
    }


@pytest.fixture(scope="module")
def extracted(osm_tables):
    df = extract_zones_from_osm(
        osm_tables["relations"],
        osm_tables["rel_members"],
        osm_tables["ways"],
        osm_tables["nodes"],
        osm_tables["rel_node_members"],
    ).cache()
    df.count()
    return df


class TestExtract:
    def test_s2_filters(self, extracted):
        ids = {r["osm_id"] for r in extracted.select("osm_id").collect()}
        assert "relation:7000" not in ids  # nameless admin relation skipped
        assert "relation:7001" not in ids  # boundary != administrative
        assert "relation:2171347" in ids
        # place=suburb relation admitted (src/lib.rs:73 parity)
        assert "relation:7100" in ids
        # 201 zones survive (198 typed + 2 level-10 + 1 suburb relation)
        assert extracted.count() == 201

    def test_label_member_tag_merge(self, extracted):
        r = extracted.filter(F.col("osm_id") == "relation:2171347").first()
        # or_insert: node's name:br + population merged, own name:fr wins
        assert r["tags"]["name:br"] == "Lussemburg"
        assert r["tags"]["population"] == "672050"
        assert r["tags"]["name:fr"] == "Luxembourg"

    def test_center_prefers_admin_centre(self, extracted):
        r = extracted.filter(F.col("osm_id") == "relation:4000").first()
        assert r["center"]["lon"] == pytest.approx(LUX_X0 + 0.5)
        assert r["center"]["lat"] == pytest.approx(LUX_Y0 + 0.5)
        assert r["center_tags"] == {"population": "12000"}

    def test_center_from_label_node_fallback(self, extracted):
        # the Gatineau case (tests/cosmogony_test.rs:287-311): no
        # admin_centre member → center comes from the label node, and
        # center_tags carries its population
        r = extracted.filter(F.col("osm_id") == "relation:4001").first()
        assert r["center"]["lon"] == pytest.approx(LUX_X0 + 0.5)
        assert r["center"]["lat"] == pytest.approx(LUX_Y0 + 1.5)
        assert r["center_tags"]["population"] == "291041"
        assert r["tags"]["name:fr"] == "Gatineau-fr"

    def test_center_none_without_member_nodes(self, extracted):
        # no member node → center NULL here; the centroid fallback (NaN
        # guard included) happens in with_bbox_and_area downstream
        r = extracted.filter(F.col("osm_id") == "relation:4005").first()
        assert r["center"] is None

    def test_loc_alt_name_and_dense_ids(self, extracted):
        rows = extracted.select("id", "osm_id", "loc_name", "alt_name").collect()
        assert {r["loc_name"] for r in rows} == {""}  # fixture has none; default ""
        ids = sorted(r["id"] for r in rows)
        assert ids == list(range(201))  # dense, 0-based
        # dense order = relation_id order (BTreeMap order, src/lib.rs:77)
        by_id = sorted(rows, key=lambda r: r["id"])
        rel_ids = [int(r["osm_id"].split(":")[1]) for r in by_id]
        assert rel_ids == sorted(rel_ids)

    def test_rings_assembled(self, extracted):
        import numpy as np

        from cosmospark import geom

        r = extracted.filter(F.col("osm_id") == "relation:2171347").first()
        rings = geom.rows_to_rings([row.asDict() for row in r["rings"]])
        assert geom.area(rings) == pytest.approx(13.0 * 10.0)
        assert geom.pip(np.array([LUX_X0 + 5]), np.array([LUX_Y0 + 5]), rings)[0]


class TestPlaceNodes:
    def test_s3_vs_s4(self, osm_tables):
        nodes = osm_tables["nodes"]
        s3 = place_nodes(nodes)  # city/town/village/suburb/quarter/neighbourhood
        s4 = place_nodes(nodes, additional=True)  # + capital=yes
        assert s3.count() == 1
        assert s4.count() == 2

    def test_osm_place_zones_shape(self, osm_tables):
        p = osm_place_zones(osm_tables["nodes"])
        rows = {r["name"]: r for r in p.collect()}
        assert set(rows) == {"Placeville", "Capital Hamlet"}
        assert rows["Placeville"]["osm_id"].startswith("node:")
        assert rows["Placeville"]["lon"] == pytest.approx(LUX_X0 + 3.5)


class TestEndToEnd:
    def test_golden_counts_from_raw_osm(self, spark, osm_tables):
        rules = make_rules(spark, LUX_RULES_LEVELS)
        out = build_zones_from_osm(
            spark,
            osm_tables["relations"],
            osm_tables["rel_members"],
            osm_tables["ways"],
            osm_tables["nodes"],
            rules,
            rel_node_members=osm_tables["rel_node_members"],
        ).cache()
        # golden structure of tests/cosmogony_test.rs:134-150 (voronoi off)
        assert out.count() == 198
        levels = {
            r["admin_level"]: r["n"]
            for r in out.groupBy("admin_level").agg(F.count("*").alias("n")).collect()
        }
        assert levels == {2: 1, 6: 13, 8: 105, 9: 79}
        types = {
            r["zone_type"]: r["n"]
            for r in out.groupBy("zone_type").agg(F.count("*").alias("n")).collect()
        }
        assert types == {"country": 1, "state_district": 13, "city": 105, "suburb": 79}
        # parents: every canton's parent is the country
        country_id = out.filter("admin_level = 2").first()["id"]
        cantons = out.filter("admin_level = 6").select("parent").collect()
        assert all(r["parent"] == country_id for r in cantons)
        # the Gatineau-case zone kept its label-node center through the
        # whole pipeline (explicit centers win over the centroid)
        g = out.filter(F.col("osm_id") == "relation:4001").first()
        assert g["center"]["lat"] == pytest.approx(LUX_Y0 + 1.5)

    def test_typing_stats_counters(self, spark, osm_tables):
        rules = make_rules(spark, LUX_RULES_LEVELS)
        stats: dict = {}
        build_zones_from_osm(
            spark,
            osm_tables["relations"],
            osm_tables["rel_members"],
            osm_tables["ways"],
            osm_tables["nodes"],
            rules,
            rel_node_members=osm_tables["rel_node_members"],
            stats=stats,
        ).count()
        assert stats["zone_without_country"] == 0
        # the 2 level-10 rows have no LU rule → unhandled_admin_level;
        # the suburb relation has no admin_level at all → keyed 0
        assert stats["unhandled_admin_level"] == {"LU": {0: 1, 10: 2}}

    def test_no_country_error_and_forced_code(self, spark, osm_tables):
        # strip the ISO tag → no country zone exists → hard error
        # (src/lib.rs:119-124) unless --country-code forces one
        rels = osm_tables["relations"].withColumn(
            "tags", F.expr("map_filter(tags, (k, v) -> k != 'ISO3166-1:alpha2')")
        )
        rules = make_rules(spark, LUX_RULES_LEVELS)
        args = (
            rels,
            osm_tables["rel_members"],
            osm_tables["ways"],
            osm_tables["nodes"],
            rules,
        )
        with pytest.raises(ValueError, match="no country"):
            build_zones_from_osm(spark, *args).count()
        out = build_zones_from_osm(spark, *args, country_code="lu").cache()
        assert out.count() == 198  # forced + uppercased code types everything
        assert out.select("country_code").distinct().collect()[0][0] == "LU"
