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


class TestIvoryCoastRatio:
    """The reference's Ivory Coast shape (118 admin → 4471 zones,
    tests/cosmogony_test.rs:329-332) scaled down: few admin zones, many
    places → the zone table multiplies; plus a NON-rectangular admin
    suburb whose geometry must be subtracted EXACTLY from the generated
    cells (round 1 bbox-approximated it)."""

    @pytest.fixture(scope="class")
    def ratio_out(self, spark):
        import numpy as np

        from cosmospark import geom

        def zone(zid, osm, lvl, name, rings, tags):
            b = geom.bbox(rings)
            c = geom.centroid(rings)
            return {
                "id": zid, "osm_id": osm, "admin_level": lvl, "zone_type": None,
                "name": name, "tags": tags, "center_tags": {},
                "center": {"lon": c[0], "lat": c[1]},
                "rings": geom.rings_to_rows(rings),
                "bbox": {"minx": b[0], "miny": b[1], "maxx": b[2], "maxy": b[3]},
                "is_generated": False,
            }

        admin_tags = {"boundary": "administrative"}
        world = [
            zone(0, "relation:1", 2, "Country", geom.make_rect(0, 0, 10, 10),
                 {**admin_tags, "admin_level": "2", "ISO3166-1:alpha2": "CI"}),
        ]
        quads = [(0, 0, 5, 5), (5, 0, 10, 5), (0, 5, 5, 10), (5, 5, 10, 10)]
        for q, r in enumerate(quads):
            world.append(
                zone(1 + q, f"relation:{10 + q}", 8, f"Commune{q}",
                     geom.make_rect(*r), {**admin_tags, "admin_level": "8"})
            )
        # non-rect admin suburb (triangle) inside commune 0
        tri = [(0, 0, np.array([0.5, 2.0, 0.5]), np.array([0.5, 0.5, 2.0]))]
        world.append(
            zone(5, "relation:20", 9, "TriSuburb", tri,
                 {**admin_tags, "admin_level": "9"})
        )

        # 15 deterministic places per commune (integer-grid positions,
        # none inside the triangle)
        places = []
        k = 0
        for q, (a, b, c, d) in enumerate(quads):
            for m in range(15):
                # (m*7)%15 is a permutation of 0..14 (gcd(7,15)=1) →
                # all 15 positions are distinct (coincident places would
                # make the voronoi bisector degenerate)
                px = a + 1.0 + ((m * 7) % 15) / 5.0  # 1.0 .. 3.8 offset
                py = b + 1.0 + ((m * 11) % 15) / 5.0
                places.append(
                    (f"node:{9000 + k}", f"P{q}_{m}", None, px, py, {"place": "suburb"})
                )
                k += 1
        rules = make_rules(
            spark, [("CI", "2", "country"), ("CI", "8", "city"), ("CI", "9", "suburb")]
        )
        raw = spark.createDataFrame(world, schema=ZONES_RAW_SCHEMA)
        pl = spark.createDataFrame(places, PLACES_SCHEMA)
        out = build_zones(spark, raw, rules, places_raw=pl, enable_voronoi=True).cache()
        out.count()
        return out

    def test_zone_count_multiplies(self, ratio_out):
        # 6 admin zones → 66 total (11× blow-up, the Ivory-Coast shape)
        assert ratio_out.filter(~F.col("is_generated")).count() == 6
        assert ratio_out.filter(F.col("is_generated")).count() == 60
        assert ratio_out.count() == 66

    def test_nonrect_suburb_subtracted_exactly(self, ratio_out):
        import numpy as np

        from cosmospark import geom

        tri = [(0, 0, np.array([0.5, 2.0, 0.5]), np.array([0.5, 0.5, 2.0]))]
        gen = [
            geom.rows_to_rings(r["rings"])
            for r in ratio_out.filter(F.col("is_generated")).collect()
        ]
        # interior points of the triangle must be covered by NO generated
        # zone (the admin suburb owns them) — the bbox approximation of
        # round 1 would also have wrongly carved the bbox corner
        t_pts = (np.array([0.7, 1.0, 0.8]), np.array([0.7, 0.8, 1.2]))
        for rings in gen:
            assert not geom.pip(t_pts[0], t_pts[1], rings).any()
        # a point inside the triangle's BBOX but outside the triangle
        # stays covered by some generated zone (the round-1 bbox
        # approximation would have carved it out); disjointness of the
        # cells is asserted by the exact area sum below
        bx = np.array([1.8])
        by = np.array([1.8])
        assert any(geom.pip(bx, by, rings).any() for rings in gen)
        # generated areas in commune 0 sum to commune - triangle
        comm0 = [
            geom.rows_to_rings(r["rings"])
            for r in ratio_out.filter(
                F.col("is_generated") & F.col("name").startswith("P0_")
            ).collect()
        ]
        total = sum(geom.area(r) for r in comm0)
        assert total == pytest.approx(25.0 - geom.area(tri), rel=1e-6)
