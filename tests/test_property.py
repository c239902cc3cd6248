"""Property-based tests (hypothesis) for the pure-numpy kernels and
codecs — the layers everything else stands on."""

import numpy as np
from hypothesis import given, settings, strategies as st

from cosmospark import cells, geom
from cosmospark.xxh import Long, xxhash64

coord = st.floats(min_value=-170.0, max_value=170.0, allow_nan=False, width=64)
lat_c = st.floats(min_value=-80.0, max_value=80.0, allow_nan=False, width=64)


@st.composite
def rects(draw):
    x0 = draw(coord)
    y0 = draw(lat_c)
    w = draw(st.floats(min_value=0.01, max_value=20.0))
    h = draw(st.floats(min_value=0.01, max_value=20.0))
    return (x0, y0, x0 + w, y0 + h)


class TestCellsProperties:
    @given(
        st.lists(coord, min_size=1, max_size=50),
        st.lists(lat_c, min_size=1, max_size=50),
        st.integers(min_value=2, max_value=20),
    )
    @settings(max_examples=60, deadline=None)
    def test_prefix_property(self, lons, lats, res):
        # res-r cell is ALWAYS the 2-bit-truncated prefix of the res-(r+1)
        # cell — the invariant the hierarchical rollup rides on
        n = min(len(lons), len(lats))
        lon = np.array(lons[:n])
        lat = np.array(lats[:n])
        fine = cells.cell_encode(lon, lat, res + 1)
        coarse = cells.cell_encode(lon, lat, res)
        assert (fine >> 2 == coarse).all()

    @given(rects(), st.integers(min_value=2, max_value=14))
    @settings(max_examples=60, deadline=None)
    def test_cells_for_bbox_covers_bbox_points(self, rect, res):
        minx, miny, maxx, maxy = rect
        cc = set(int(c) for c in cells.cells_for_bbox(minx, miny, maxx, maxy, res))
        # any point of the bbox encodes to one of the covering cells
        rng = np.random.default_rng(1)
        px = rng.uniform(minx, maxx, 20)
        py = rng.uniform(miny, maxy, 20)
        enc = cells.cell_encode(px, py, res)
        assert all(int(c) in cc for c in enc)

    @given(rects(), st.integers(min_value=4, max_value=1024))
    @settings(max_examples=60, deadline=None)
    def test_fit_res_respects_budget(self, rect, max_cells):
        minx, miny, maxx, maxy = rect
        res = cells.fit_res(minx, miny, maxx, maxy, max_cells)
        assert len(cells.cells_for_bbox(minx, miny, maxx, maxy, res)) <= max_cells

    @given(rects())
    @settings(max_examples=40, deadline=None)
    def test_cell_bounds_batch_matches_scalar(self, rect):
        cc = cells.cells_for_bbox(*rect, 9)
        bminx, bminy, bmaxx, bmaxy = cells.cell_bounds_batch(cc, 9)
        for i, c in enumerate(cc[:8]):
            sx0, sy0, sx1, sy1 = cells.cell_bounds(int(c), 9)
            assert (sx0, sy0, sx1, sy1) == (bminx[i], bminy[i], bmaxx[i], bmaxy[i])


class TestGeomProperties:
    @given(rects(), rects())
    @settings(max_examples=80, deadline=None)
    def test_rect_covers_iff_bbox_contains(self, ra, rb):
        # for axis-aligned rectangles, covers == bbox containment
        a = geom.make_rect(*ra)
        b = geom.make_rect(*rb)
        expect = (
            ra[0] <= rb[0] and ra[1] <= rb[1] and ra[2] >= rb[2] and ra[3] >= rb[3]
        )
        assert geom.covers(a, b) == expect

    @given(rects())
    @settings(max_examples=40, deadline=None)
    def test_pack_unpack_round_trip(self, rect):
        rings = geom.make_rect(*rect) + [
            (0, 1, np.array([1.0, 1.5, 1.5]), np.array([1.0, 1.0, 1.5]))
        ]
        back = geom.unpack_rings(geom.pack_rings(rings))
        assert len(back) == len(rings)
        for (p, r, xs, ys), (p2, r2, xs2, ys2) in zip(rings, back):
            assert (p, r) == (p2, r2)
            assert np.array_equal(np.asarray(xs, float), xs2)
            assert np.array_equal(np.asarray(ys, float), ys2)

    @given(rects(), st.integers(min_value=0, max_value=2**31 - 1))
    @settings(max_examples=60, deadline=None)
    def test_pip_matches_rect_predicate(self, rect, seed):
        minx, miny, maxx, maxy = rect
        rng = np.random.default_rng(seed)
        px = rng.uniform(minx - 1, maxx + 1, 50)
        py = rng.uniform(miny - 1, maxy + 1, 50)
        got = geom.pip(px, py, geom.make_rect(*rect))
        exp = (px > minx) & (px < maxx) & (py > miny) & (py < maxy)
        margin = (
            (np.abs(px - minx) > 1e-9) & (np.abs(px - maxx) > 1e-9)
            & (np.abs(py - miny) > 1e-9) & (np.abs(py - maxy) > 1e-9)
        )
        assert (got[margin] == exp[margin]).all()


class TestXxhProperties:
    @given(st.text(max_size=200))
    @settings(max_examples=100, deadline=None)
    def test_string_hash_total_and_stable(self, s):
        h1 = xxhash64(s)
        h2 = xxhash64(s)
        assert h1 == h2
        assert -(2**63) <= h1 < 2**63

    @given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
    @settings(max_examples=100, deadline=None)
    def test_long_hash_total(self, v):
        h = xxhash64(Long(v))
        assert -(2**63) <= h < 2**63


class TestClipProperties:
    @given(rects(), rects())
    @settings(max_examples=40, deadline=None)
    def test_difference_area_bounds(self, ra, rb):
        from cosmospark import clip

        a = geom.make_rect(*ra)
        b = geom.make_rect(*rb)
        out = clip.subtract_polygon(a, b)
        area_a = geom.area(a)
        area_out = geom.area(out) if out else 0.0
        # 0 ≤ area(A \ B) ≤ area(A), and equals area(A) - area(A ∩ B)
        ix0, iy0 = max(ra[0], rb[0]), max(ra[1], rb[1])
        ix1, iy1 = min(ra[2], rb[2]), min(ra[3], rb[3])
        inter = max(0.0, ix1 - ix0) * max(0.0, iy1 - iy0)
        assert abs(area_out - (area_a - inter)) <= 1e-6 * max(1.0, area_a)


@st.composite
def star_polys(draw):
    """Random simple CONCAVE polygon: radial (star-shaped) around a
    center — sorted angles, random radii. Always simple; almost always
    concave. Returns (cx, cy, xs, ys)."""
    seed = draw(st.integers(min_value=0, max_value=10**6))
    n = draw(st.integers(min_value=6, max_value=14))
    cx = draw(st.floats(min_value=-50.0, max_value=50.0, allow_nan=False))
    cy = draw(st.floats(min_value=-50.0, max_value=50.0, allow_nan=False))
    rng = np.random.default_rng(seed)
    # jittered full-circle angles: every gap ≤ 1.8·(2π/n) < π for n ≥ 6,
    # so the polygon is genuinely star-shaped around (cx, cy) — free
    # uniform angles can leave a > π gap, putting the center OUTSIDE the
    # polygon and breaking the scaled-copy containment premise
    th = np.linspace(0.0, 2.0 * np.pi, n, endpoint=False) + rng.uniform(
        0.0, 0.8, n
    ) * (2.0 * np.pi / n)
    r = rng.uniform(0.5, 1.5, n)
    return cx, cy, cx + r * np.cos(th), cy + r * np.sin(th)


class TestCoversProperties:
    """VERDICT r2 #9: the sampling-based covers kernel vs a dense-grid
    oracle on random CONCAVE polygons — no mis-accepts (covers=True with
    a grid point clearly interior to B but outside A) and no
    mis-rejects on guaranteed-contained scaled copies."""

    @staticmethod
    def _violation(A, B, n=70):
        b = geom.bbox(B)
        pad = 1e-6
        gx, gy = np.meshgrid(
            np.linspace(b[0] - pad, b[2] + pad, n),
            np.linspace(b[1] - pad, b[3] + pad, n),
        )
        gx, gy = gx.ravel(), gy.ravel()
        in_b = geom.pip(gx, gy, B) & ~geom.on_boundary(gx, gy, B, eps=1e-7)
        out_a = ~(geom.pip(gx, gy, A) | geom.on_boundary(gx, gy, A, eps=1e-7))
        return bool((in_b & out_a).any())

    @given(star_polys())
    @settings(max_examples=40, deadline=None)
    def test_scaled_copy_is_covered(self, poly):
        cx, cy, xs, ys = poly
        A = [(0, 0, xs, ys)]
        # a radial polygon is the fan of center-triangles; scaling toward
        # the center maps each triangle into itself → B ⊂ A guaranteed
        B = [(0, 0, cx + 0.6 * (xs - cx), cy + 0.6 * (ys - cy))]
        assert geom.covers(A, B)

    @given(star_polys(), st.floats(min_value=0.4, max_value=2.0))
    @settings(max_examples=40, deadline=None)
    def test_shifted_copy_consistent_with_grid(self, poly, shift):
        cx, cy, xs, ys = poly
        A = [(0, 0, xs, ys)]
        B = [(0, 0, xs + shift, ys)]
        got = geom.covers(A, B)
        if got:
            assert not self._violation(A, B)
        elif not self._violation(A, B):
            # covers=False without an interior violation is legitimate
            # only when B's boundary leaves A (crossing/bbox); sanity: a
            # clear violation must imply False (checked above)
            pass

    @given(star_polys(), star_polys())
    @settings(max_examples=40, deadline=None)
    def test_random_pairs_no_misaccept(self, pa, pb):
        _, _, axs, ays = pa
        cbx, cby, bxs, bys = pb
        A = [(0, 0, axs, ays)]
        # shrink B and drop it near A's center region to get a mix of
        # covered / partially-covered cases
        B = [(0, 0, cbx + 0.3 * (bxs - cbx), cby + 0.3 * (bys - cby))]
        if geom.covers(A, B):
            assert not self._violation(A, B)

    @given(star_polys())
    @settings(max_examples=20, deadline=None)
    def test_hole_of_a_inside_b_rejected(self, poly):
        cx, cy, xs, ys = poly
        # A = star with a small hole at its center; B = scaled copy that
        # strictly contains the hole → covers must be False
        h = 0.05
        hole = (0, 1, np.array([cx - h, cx + h, cx + h, cx - h]),
                np.array([cy - h, cy - h, cy + h, cy + h]))
        A = [(0, 0, xs, ys), hole]
        B = [(0, 0, cx + 0.6 * (xs - cx), cy + 0.6 * (ys - cy))]
        assert not geom.covers(A, B)


class TestRectsClassifyProperties:
    """rects_classify soundness on random concave polygons: class 0
    (OUTSIDE) rects contain no interior point of the polygon; class 1
    (FULL) rects are entirely inside. Verified against a dense point
    grid per rect. (Class 2 carries no claim — it pays the kernel.)"""

    @given(star_polys())
    @settings(max_examples=40, deadline=None)
    def test_full_and_empty_sound(self, poly):
        cx, cy, xs, ys = poly
        rr = [(0, 0, xs, ys)]
        minx, miny, maxx, maxy = geom.bbox(rr)
        # a grid of candidate rects spanning past the bbox
        k = 9
        exs = np.linspace(minx - 0.3, maxx + 0.3, k + 1)
        eys = np.linspace(miny - 0.3, maxy + 0.3, k + 1)
        r_minx, r_miny, r_maxx, r_maxy = [], [], [], []
        for i in range(k):
            for j in range(k):
                r_minx.append(exs[i]); r_maxx.append(exs[i + 1])
                r_miny.append(eys[j]); r_maxy.append(eys[j + 1])
        r_minx = np.array(r_minx); r_miny = np.array(r_miny)
        r_maxx = np.array(r_maxx); r_maxy = np.array(r_maxy)
        cls = geom.rects_classify(r_minx, r_miny, r_maxx, r_maxy, rr)
        m = 8
        for idx in range(len(cls)):
            if cls[idx] == 2:
                continue
            gx, gy = np.meshgrid(
                np.linspace(r_minx[idx], r_maxx[idx], m),
                np.linspace(r_miny[idx], r_maxy[idx], m),
            )
            gx, gy = gx.ravel(), gy.ravel()
            inside = geom.pip(gx, gy, rr) & ~geom.on_boundary(gx, gy, rr, eps=1e-9)
            outside = ~(geom.pip(gx, gy, rr) | geom.on_boundary(gx, gy, rr, eps=1e-9))
            if cls[idx] == 1:
                assert not outside.any(), "FULL rect has an outside point"
            else:
                assert not inside.any(), "OUTSIDE rect has an interior point"
