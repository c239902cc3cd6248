"""Exact polygon difference tests: triangulation, convex-wedge
subtraction, and the full subtract_polygon against a dense point-grid
numpy oracle (membership in A\\B == in A and not in B)."""

import numpy as np
import pytest

from cosmospark import clip, geom
from cosmospark.voronoi import subtract_zone


def grid(b, n=120):
    minx, miny, maxx, maxy = b
    xs = np.linspace(minx - 0.3, maxx + 0.3, n)
    ys = np.linspace(miny - 0.3, maxy + 0.3, n)
    gx, gy = np.meshgrid(xs, ys)
    return gx.ravel(), gy.ravel()


def check_difference(a_rings, b_rings, n=120, tol=0.02):
    """Membership + area cross-check against the brute-force oracle,
    excluding points near any boundary (clip output edges are exact but
    grid points on edges are membership-ambiguous)."""
    out = clip.subtract_polygon(a_rings, b_rings)
    gx, gy = grid(geom.bbox(a_rings), n)
    in_a = geom.pip(gx, gy, a_rings)
    in_b = geom.pip(gx, gy, b_rings)
    expect = in_a & ~in_b
    got = geom.pip(gx, gy, out) if out else np.zeros(len(gx), dtype=bool)
    near = (
        geom.on_boundary(gx, gy, a_rings, eps=1e-6)
        | geom.on_boundary(gx, gy, b_rings, eps=1e-6)
    )
    if out:
        near |= geom.on_boundary(gx, gy, out, eps=1e-6)
    ok = got[~near] == expect[~near]
    assert ok.all(), f"{(~ok).sum()} of {len(ok)} grid points disagree"
    # area check (shoelace vs inclusion-exclusion is implicit in grids;
    # use exact expected area when computable)
    return out


def tri(ax, ay, bx, by, cx, cy):
    return [(0, 0, np.array([ax, bx, cx], float), np.array([ay, by, cy], float))]


class TestTriangulate:
    def test_convex_square(self):
        tris = clip.triangulate(np.array([0.0, 4, 4, 0]), np.array([0.0, 0, 4, 4]))
        assert len(tris) == 2
        assert sum(abs(clip._ring_area_signed(x, y)) for x, y in tris) == pytest.approx(16.0)

    def test_concave_L(self):
        # L-shape: (0,0)(4,0)(4,2)(2,2)(2,4)(0,4), area 12
        xs = np.array([0.0, 4, 4, 2, 2, 0])
        ys = np.array([0.0, 0, 2, 2, 4, 4])
        tris = clip.triangulate(xs, ys)
        assert sum(abs(clip._ring_area_signed(x, y)) for x, y in tris) == pytest.approx(12.0)

    def test_cw_input_normalized(self):
        tris = clip.triangulate(np.array([0.0, 0, 4, 4]), np.array([0.0, 4, 4, 0]))
        assert sum(abs(clip._ring_area_signed(x, y)) for x, y in tris) == pytest.approx(16.0)


class TestSubtractConvex:
    def test_triangle_from_square(self):
        sq = geom.make_rect(0, 0, 10, 10)
        out = clip.subtract_convex(sq, np.array([2.0, 6, 2]), np.array([2.0, 2, 6]))
        assert geom.area(out) == pytest.approx(100.0 - 8.0)

    def test_disjoint_convex(self):
        sq = geom.make_rect(0, 0, 10, 10)
        out = clip.subtract_convex(sq, np.array([20.0, 22, 20]), np.array([20.0, 20, 22]))
        assert geom.area(out) == pytest.approx(100.0)

    def test_subject_hole_preserved(self):
        donut = [
            (0, 0, np.array([0.0, 0, 10, 10]), np.array([0.0, 10, 10, 0])),
            (0, 1, np.array([7.0, 7, 9, 9]), np.array([7.0, 9, 9, 7])),
        ]
        out = clip.subtract_convex(donut, np.array([1.0, 3, 1]), np.array([1.0, 1, 3]))
        assert geom.area(out) == pytest.approx(100.0 - 4.0 - 2.0)


class TestSubtractPolygon:
    def test_triangle_oracle(self):
        a = geom.make_rect(0, 0, 10, 10)
        b = tri(1, 1, 8, 2, 3, 9)
        out = check_difference(a, b)
        exp = 100.0 - geom.area(b)
        assert geom.area(out) == pytest.approx(exp, rel=1e-9)

    def test_concave_subtrahend_oracle(self):
        a = geom.make_rect(0, 0, 10, 10)
        xs = np.array([1.0, 7, 7, 4, 4, 1])
        ys = np.array([1.0, 1, 3, 3, 7, 7])
        b = [(0, 0, xs, ys)]
        out = check_difference(a, b)
        assert geom.area(out) == pytest.approx(100.0 - geom.area(b), rel=1e-9)

    def test_partial_overlap_oracle(self):
        from cosmospark.voronoi import clip_rect

        a = geom.make_rect(0, 0, 10, 10)
        b = tri(8, 8, 14, 9, 9, 14)  # pokes out of A
        out = check_difference(a, b)
        # exact oracle: area(A \ B) = area(A) - area(B ∩ A), the latter
        # via an independent SH clip of the triangle to the square
        ix, iy = clip_rect(b[0][2], b[0][3], (0.0, 0.0, 10.0, 10.0))
        inter = abs(clip._ring_area_signed(ix, iy))
        assert geom.area(out) == pytest.approx(100.0 - inter, rel=1e-9)

    def test_subtrahend_covering_all(self):
        a = geom.make_rect(2, 2, 4, 4)
        b = [(0, 0, np.array([0.0, 10, 5]), np.array([0.0, 0, 12]))]
        out = clip.subtract_polygon(a, b)
        assert geom.area(out) == pytest.approx(0.0, abs=1e-9) or out == []

    def test_multi_triangle_sequence_disjointness(self):
        # subtracting two disjoint triangles must not double-count
        a = geom.make_rect(0, 0, 10, 10)
        b = tri(1, 1, 3, 1, 1, 3) + [
            (1, 0, np.array([6.0, 9, 6]), np.array([6.0, 6, 9]))
        ]
        out = check_difference(a, b)
        assert geom.area(out) == pytest.approx(100.0 - 2.0 - 4.5, rel=1e-9)


class TestSubtractZoneDispatch:
    def test_rect_fast_path(self):
        a = geom.make_rect(0, 0, 10, 10)
        out = subtract_zone(a, geom.make_rect(2, 2, 4, 4))
        assert geom.area(out) == pytest.approx(96.0)

    def test_non_rect_now_exact(self):
        # round-1 behavior subtracted the bbox (area 96); exact is 98
        a = geom.make_rect(0, 0, 10, 10)
        b = tri(2, 2, 4, 2, 2, 4)
        out = subtract_zone(a, b)
        assert geom.area(out) == pytest.approx(98.0, rel=1e-9)

    def test_holed_subtrahend_retained(self):
        # VERDICT r2 #3: area inside the subtrahend's hole is RETAINED
        # (GEOS semantics), not over-subtracted — and no warning
        import warnings

        a = geom.make_rect(0, 0, 10, 10)
        b = [
            (0, 0, np.array([2.0, 6, 6, 2]), np.array([2.0, 2, 6, 6])),
            (0, 1, np.array([3.0, 5, 5, 3]), np.array([3.0, 3, 5, 5])),
        ]
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            out = subtract_zone(a, b)
        # 100 − (16 filled) + (4 hole retained)
        assert geom.area(out) == pytest.approx(100.0 - 16.0 + 4.0, rel=1e-9)


class TestHolePreservingDifference:
    def test_donut_subtrahend_grid_oracle(self):
        a = geom.make_rect(0, 0, 10, 10)
        b = [
            (0, 0, np.array([2.0, 6, 6, 2]), np.array([2.0, 2, 6, 6])),
            (0, 1, np.array([3.0, 5, 5, 3]), np.array([3.0, 3, 5, 5])),
        ]
        out = check_difference(a, b)
        assert geom.area(out) == pytest.approx(100.0 - 16.0 + 4.0, rel=1e-9)

    def test_donut_partial_overlap_grid_oracle(self):
        # subtrahend donut straddles A's edge; its hole partially inside
        a = geom.make_rect(0, 0, 10, 10)
        b = [
            (0, 0, np.array([7.0, 13, 13, 7]), np.array([7.0, 7, 13, 13])),
            (0, 1, np.array([9.0, 11, 11, 9]), np.array([9.0, 9, 11, 11])),
        ]
        out = check_difference(a, b)
        # A \ B = 100 − (A∩ext = 9) + (A∩hole = 1)
        assert geom.area(out) == pytest.approx(100.0 - 9.0 + 1.0, rel=1e-9)

    def test_concave_hole_grid_oracle(self):
        # L-shaped hole → the hole triangulates into >1 triangle
        a = geom.make_rect(0, 0, 10, 10)
        hx = np.array([2.0, 6, 6, 4, 4, 2])
        hy = np.array([2.0, 2, 4, 4, 6, 6])
        b = [
            (0, 0, np.array([1.0, 7, 7, 1]), np.array([1.0, 1, 7, 7])),
            (0, 1, hx, hy),
        ]
        out = check_difference(a, b)
        assert geom.area(out) == pytest.approx(
            100.0 - 36.0 + geom.area([(0, 0, hx, hy)]), rel=1e-9
        )

    def test_holed_subject_and_holed_subtrahend(self):
        a = [
            (0, 0, np.array([0.0, 10, 10, 0]), np.array([0.0, 0, 10, 10])),
            (0, 1, np.array([7.0, 9, 9, 7]), np.array([7.0, 7, 9, 9])),
        ]
        b = [
            (0, 0, np.array([1.0, 5, 5, 1]), np.array([1.0, 1, 5, 5])),
            (0, 1, np.array([2.0, 4, 4, 2]), np.array([2.0, 2, 4, 4])),
        ]
        out = check_difference(a, b)
        # (100 − 4 subject hole) − (16 filled ext) + (4 subtrahend hole)
        assert geom.area(out) == pytest.approx(96.0 - 16.0 + 4.0, rel=1e-9)

    def test_two_subtrahend_polys_one_holed(self):
        a = geom.make_rect(0, 0, 12, 12)
        b = [
            (0, 0, np.array([1.0, 4, 4, 1]), np.array([1.0, 1, 4, 4])),
            (0, 1, np.array([2.0, 3, 3, 2]), np.array([2.0, 2, 3, 3])),
            (1, 0, np.array([6.0, 9, 6]), np.array([6.0, 6, 9])),
        ]
        out = check_difference(a, b)
        assert geom.area(out) == pytest.approx(144.0 - 9.0 + 1.0 - 4.5, rel=1e-9)


class TestIntersectConvex:
    def test_square_triangle(self):
        # triangle (5,5)(13,5)(5,13) ∩ [0,10]²: strip [5,8]×[5,10] = 15
        # plus ∫₈¹⁰ (13−x) dx = 8 → 23
        a = geom.make_rect(0, 0, 10, 10)
        out = clip.intersect_convex(a, np.array([5.0, 13, 5]), np.array([5.0, 5, 13]))
        assert geom.area(out) == pytest.approx(23.0, rel=1e-9)

    def test_subject_hole_preserved(self):
        donut = [
            (0, 0, np.array([0.0, 10, 10, 0]), np.array([0.0, 0, 10, 10])),
            (0, 1, np.array([2.0, 4, 4, 2]), np.array([2.0, 2, 4, 4])),
        ]
        out = clip.intersect_convex(
            donut, np.array([1.0, 5, 5, 1]), np.array([1.0, 1, 5, 5])
        )
        assert geom.area(out) == pytest.approx(16.0 - 4.0, rel=1e-9)

    def test_disjoint_is_empty(self):
        a = geom.make_rect(0, 0, 2, 2)
        out = clip.intersect_convex(a, np.array([5.0, 7, 5]), np.array([5.0, 5, 7]))
        assert out == []


class TestConvexHull:
    def test_hull_of_concave_ring(self):
        xs = np.array([0.0, 4, 4, 2, 2, 0])
        ys = np.array([0.0, 0, 2, 2, 4, 4])
        hx, hy = clip.convex_hull(xs, ys)
        assert abs(clip._ring_area_signed(hx, hy)) == pytest.approx(14.0)
        assert clip._ring_area_signed(hx, hy) > 0  # CCW

    def test_hull_of_convex_equals_input_set(self):
        xs = np.array([0.0, 4, 4, 0])
        ys = np.array([0.0, 0, 4, 4])
        hx, hy = clip.convex_hull(xs, ys)
        assert set(zip(hx.tolist(), hy.tolist())) == set(zip(xs.tolist(), ys.tolist()))
