"""End-to-end pipeline with Voronoi place generation: mirrors the
reference's voronoi-on Luxembourg run (198 admin zones + generated
cities = 208 total, tests/cosmogony_test.rs:46)."""

import pytest
from pyspark.sql import functions as F

from cosmospark.fixtures import LUX_RULES_LEVELS, LUX_X0, LUX_Y0, lux_world
from cosmospark.pipeline import build_zones
from cosmospark.typer import make_rules
from cosmospark.ztypes import ZONES_RAW_SCHEMA

PLACES_SCHEMA = (
    "osm_id string, name string, admin_level int, lon double, lat double, "
    "tags map<string,string>"
)


def make_places(spark):
    """10 place nodes inside communes 79..104 (the communes with no
    localities): two in commune 100 (voronoi split), 8 solo."""
    rows = []
    # commune k = 100 → canton i=12, j=4 → rect (14, 49, 15, 50.25)
    rows.append(("node:9000", "TwinA", None, 14.25, 49.5, {"place": "suburb"}))
    rows.append(("node:9001", "TwinB", None, 14.75, 49.5, {"place": "suburb"}))
    # 8 solo places, one per commune k=80..87 (canton 10, j=0..7)
    for m in range(8):
        cx = LUX_X0 + 10 + 0.5  # canton 10 center strip
        cy = LUX_Y0 + m * 1.25 + 0.6
        rows.append((f"node:{9100 + m}", f"Solo{m}", None, cx, cy, {"place": "suburb"}))
    return spark.createDataFrame(rows, PLACES_SCHEMA)


@pytest.fixture(scope="module")
def vor_out(spark):
    raw = spark.createDataFrame(lux_world(), schema=ZONES_RAW_SCHEMA)
    rules = make_rules(spark, LUX_RULES_LEVELS)
    out = build_zones(
        spark, raw, rules, places_raw=make_places(spark), enable_voronoi=True
    ).cache()
    out.count()
    return out


class TestVoronoiPipeline:
    def test_total_count_208(self, vor_out):
        # 198 admin + 10 generated — the reference's voronoi-on shape
        assert vor_out.count() == 208

    def test_generated_flags_and_parents(self, vor_out):
        gen = {r["name"]: r for r in vor_out.filter(F.col("is_generated")).collect()}
        assert set(gen) == {"TwinA", "TwinB"} | {f"Solo{m}" for m in range(8)}
        by_id = {r["id"]: r for r in vor_out.collect()}
        for name, r in gen.items():
            parent = by_id[r["parent"]]
            assert parent["zone_type"] == "city"  # commune

    def test_generated_labels_chain(self, vor_out):
        gen = {r["name"]: r for r in vor_out.filter(F.col("is_generated")).collect()}
        lbl = gen["TwinA"]["label"]
        # zip suffixes attach only to the label's FIRST element
        # (zone_ext.rs:370-372) — TwinA has no zips, so none appear
        assert lbl == "TwinA, Commune 12-4, Canton 12, Lëtzebuerg"

    def test_twins_split_commune(self, vor_out):
        import numpy as np

        from cosmospark import geom

        gen = {r["name"]: r for r in vor_out.filter(F.col("is_generated")).collect()}
        ra = geom.rows_to_rings(gen["TwinA"]["rings"])
        rb = geom.rows_to_rings(gen["TwinB"]["rings"])
        # the two halves partition the 1.25-area... commune area = 1*1.25
        assert geom.area(ra) + geom.area(rb) == pytest.approx(1.25)
        assert geom.pip_covers(np.array([14.25]), np.array([49.5]), ra)[0]
        assert geom.pip_covers(np.array([14.75]), np.array([49.5]), rb)[0]

    def test_admin_counts_unchanged(self, vor_out):
        got = {
            r["admin_level"]: r["n"]
            for r in vor_out.filter(~F.col("is_generated"))
            .groupBy("admin_level")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert got == {2: 1, 6: 13, 8: 105, 9: 79}
