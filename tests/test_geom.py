"""Unit tests for the numpy geometry kernels.

Fixture geometry is the four-squares set from the reference's own unit
tests (src/hierarchy_builder.rs:157-195): z0 (0,0)-(10,10) Country,
z1 (1,1)-(9,9) State, z2 (2,2)-(8,8) City, z3 (0,0)-(10,5) State —
z3 shares edges with z0, exercising covers-vs-contains
(src/zone_ext.rs:244-246).
"""

import numpy as np
import pytest

from cosmospark import geom


def sq(a, b, c, d):
    return geom.make_rect(a, b, c, d)


Z0 = sq(0, 0, 10, 10)
Z1 = sq(1, 1, 9, 9)
Z2 = sq(2, 2, 8, 8)
Z3 = sq(0, 0, 10, 5)


class TestPip:
    def test_inside_outside(self):
        px = np.array([5.0, 11.0, -1.0, 5.0])
        py = np.array([5.0, 5.0, 5.0, 11.0])
        assert geom.pip(px, py, Z0).tolist() == [True, False, False, False]

    def test_boundary_strict_vs_covers(self):
        # boundary points: strict pip may go either way per even-odd, but
        # pip_covers must include them
        px = np.array([0.0, 10.0, 5.0])
        py = np.array([5.0, 5.0, 0.0])
        assert geom.pip_covers(px, py, Z0).tolist() == [True, True, True]

    def test_hole(self):
        donut = [
            (0, 0, np.array([0.0, 0, 10, 10]), np.array([0.0, 10, 10, 0])),
            (0, 1, np.array([4.0, 4, 6, 6]), np.array([4.0, 6, 6, 4])),
        ]
        px = np.array([5.0, 2.0])
        py = np.array([5.0, 2.0])
        assert geom.pip(px, py, donut).tolist() == [False, True]

    def test_multipolygon(self):
        two = sq(0, 0, 1, 1) + [(1, 0, np.array([5.0, 5, 6, 6]), np.array([5.0, 6, 6, 5]))]
        px = np.array([0.5, 5.5, 3.0])
        py = np.array([0.5, 5.5, 3.0])
        assert geom.pip(px, py, two).tolist() == [True, True, False]

    def test_brute_force_oracle(self):
        # random triangle vs a dense grid, checked against matplotlib-free
        # half-plane oracle
        tri = [(0, 0, np.array([0.0, 4.0, 0.0]), np.array([0.0, 0.0, 4.0]))]
        rng = np.random.default_rng(7)
        px = rng.uniform(-1, 5, 500)
        py = rng.uniform(-1, 5, 500)
        got = geom.pip(px, py, tri)
        exp = (px > 0) & (py > 0) & (px + py < 4)
        # exclude near-boundary points from the strictness comparison
        margin = (
            (np.abs(px) > 1e-9) & (np.abs(py) > 1e-9) & (np.abs(px + py - 4) > 1e-9)
        )
        assert (got[margin] == exp[margin]).all()


class TestCovers:
    def test_nested_squares(self):
        assert geom.covers(Z0, Z1)
        assert geom.covers(Z1, Z2)
        assert geom.covers(Z0, Z2)
        assert not geom.covers(Z1, Z0)
        assert not geom.covers(Z2, Z1)

    def test_shared_edge_covers(self):
        # z3 (0,0)-(10,5) shares its west/south/east edges with z0: GEOS
        # contains would be false, covers must be true
        # (src/zone_ext.rs:244-246)
        assert geom.covers(Z0, Z3)
        assert not geom.covers(Z3, Z0)

    def test_self_covers(self):
        assert geom.covers(Z0, Z0)

    def test_partial_overlap_not_covered(self):
        other = sq(5, 5, 15, 15)
        assert not geom.covers(Z0, other)
        assert not geom.covers(other, Z0)

    def test_disjoint(self):
        assert not geom.covers(Z0, sq(20, 20, 30, 30))

    def test_z3_z1_cross(self):
        # z3 crosses z1 (overlap, neither covers)
        assert not geom.covers(Z3, Z1)
        assert not geom.covers(Z1, Z3)

    def test_hole_inside_b_not_covered(self):
        # A = donut (0..10 with hole 4..6); B = (3,3)-(7,7) contains the
        # hole strictly: all B samples are inside A's exterior and no
        # edges properly cross, but A does NOT cover B (the hole region
        # is B-interior not covered by A) — GEOS covers agrees
        donut = [
            (0, 0, np.array([0.0, 0, 10, 10]), np.array([0.0, 10, 10, 0])),
            (0, 1, np.array([4.0, 4, 6, 6]), np.array([4.0, 6, 6, 4])),
        ]
        assert not geom.covers(donut, sq(3, 3, 7, 7))
        # B disjoint from the hole is still covered
        assert geom.covers(donut, sq(1, 1, 3, 3))
        # B fully inside the hole: not covered (pip rejects)
        assert not geom.covers(donut, sq(4.5, 4.5, 5.5, 5.5))

    def test_identical_holes_covered(self):
        # A and B share the same hole: A covers B (hole samples lie ON
        # B's boundary, not strictly inside)
        hole = (np.array([4.0, 4, 6, 6]), np.array([4.0, 6, 6, 4]))
        a = [
            (0, 0, np.array([0.0, 0, 10, 10]), np.array([0.0, 10, 10, 0])),
            (0, 1, *hole),
        ]
        b = [
            (0, 0, np.array([1.0, 1, 9, 9]), np.array([1.0, 9, 9, 1])),
            (0, 1, *hole),
        ]
        assert geom.covers(a, b)

    def test_bbox_covered_by_respects_holes(self):
        # a FULL-cell candidate rect sitting over A's hole must NOT be
        # marked covered (the ZoneIndex FULL-cell bug from round 1)
        donut = [
            (0, 0, np.array([0.0, 0, 10, 10]), np.array([0.0, 10, 10, 0])),
            (0, 1, np.array([4.0, 4, 6, 6]), np.array([4.0, 6, 6, 4])),
        ]
        assert not geom.bbox_covered_by((3.0, 3.0, 7.0, 7.0), donut)
        assert geom.bbox_covered_by((1.0, 1.0, 3.0, 3.0), donut)


class TestIntersects:
    def test_overlap(self):
        assert geom.intersects(Z1, Z3)
        assert geom.intersects(Z3, Z1)

    def test_containment_is_intersection(self):
        assert geom.intersects(Z0, Z2)

    def test_disjoint(self):
        assert not geom.intersects(Z2, sq(20, 20, 21, 21))

    def test_edge_touch(self):
        assert geom.intersects(Z0, sq(10, 0, 20, 10))


class TestScalars:
    def test_area(self):
        assert geom.area(Z0) == pytest.approx(100.0)
        assert geom.area(Z3) == pytest.approx(50.0)

    def test_area_with_hole(self):
        donut = [
            (0, 0, np.array([0.0, 0, 10, 10]), np.array([0.0, 10, 10, 0])),
            (0, 1, np.array([4.0, 4, 6, 6]), np.array([4.0, 6, 6, 4])),
        ]
        assert geom.area(donut) == pytest.approx(96.0)

    def test_centroid(self):
        assert geom.centroid(Z0) == pytest.approx((5.0, 5.0))
        assert geom.centroid(Z3) == pytest.approx((5.0, 2.5))

    def test_centroid_degenerate_nan_guard(self):
        line = [(0, 0, np.array([0.0, 1.0]), np.array([0.0, 1.0]))]
        assert geom.centroid(line) is None

    def test_bbox(self):
        assert geom.bbox(Z3) == (0.0, 0.0, 10.0, 5.0)

    def test_bbox_covered_by(self):
        assert geom.bbox_covered_by((2, 2, 3, 3), Z0)
        assert not geom.bbox_covered_by((9, 9, 11, 11), Z0)

    def test_roundtrip_rows(self):
        rows = geom.rings_to_rows(Z3)
        back = geom.rows_to_rings(rows)
        assert geom.covers(back, Z3) and geom.covers(Z3, back)


class TestRectsFullyCovered:
    """The vectorized FULL-cell marker must be SOUND (every marked rect
    is exactly covered) — conservativeness (missing some covered rects
    near edges) is allowed and only costs a PIP later."""

    def _check(self, rings, n=400, span=12.0):
        rng = np.random.default_rng(17)
        a = rng.uniform(-1, span, n)
        b = rng.uniform(-1, span, n)
        w = rng.uniform(0.05, 2.0, n)
        h = rng.uniform(0.05, 2.0, n)
        fast = geom.rects_fully_covered(a, b, a + w, b + h, rings)
        for i in np.nonzero(fast)[0]:
            assert geom.bbox_covered_by((a[i], b[i], a[i] + w[i], b[i] + h[i]), rings)
        return fast

    def test_sound_on_square(self):
        fast = self._check(Z0)
        assert fast.sum() > 0  # and it actually marks interior rects

    def test_sound_on_donut(self):
        donut = [
            (0, 0, np.array([0.0, 0, 10, 10]), np.array([0.0, 10, 10, 0])),
            (0, 1, np.array([4.0, 4, 6, 6]), np.array([4.0, 6, 6, 4])),
        ]
        fast = self._check(donut)
        assert fast.sum() > 0
        # a rect strictly inside the hole is never marked
        assert not geom.rects_fully_covered(
            np.array([4.6]), np.array([4.6]), np.array([5.4]), np.array([5.4]), donut
        )[0]

    def test_sound_on_triangle(self):
        tri = [(0, 0, np.array([0.0, 12.0, 0.0]), np.array([0.0, 0.0, 12.0]))]
        fast = self._check(tri)
        assert fast.sum() > 0
