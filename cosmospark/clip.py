"""Exact polygon difference in pure numpy (no GEOS).

Replaces the round-1 bbox approximation for non-rectangular subtrahends
(reference uses GEOS difference, src/additional_zones.rs:198-235).

Construction:

* ``triangulate`` — deterministic ear clipping of a simple polygon
  (concave supported) into triangles.
* ``subtract_convex`` — A \\ C for convex C via the *wedge
  decomposition* of C's complement: with C's CCW edges e_1..e_k, the
  complement is the disjoint union of wedges
  W_i = {outside e_i} ∩ {inside e_1..e_{i-1}}; each W_i is convex, so
  Sutherland–Hodgman clipping of A against W_i is exact, and the pieces
  A ∩ W_i are disjoint by construction (the same idea as the 4-piece
  axis-rect decomposition in cosmospark.voronoi.subtract_rect,
  generalized to any convex polygon). Holes of A are clipped into the
  same wedges and re-attached to the piece they fall in.
* ``subtract_polygon`` — A \\ B for arbitrary simple B, holes of B
  preserved (GEOS difference semantics): triangulate B's exterior rings
  and subtract each triangle in turn (exact: the triangles partition the
  filled exterior; sequential subtraction of disjoint convex pieces
  composes exactly), then re-add A ∩ hole(B) pieces — area inside B's
  holes is retained, not subtracted.
* ``intersect_convex`` / ``convex_hull`` — A ∩ convex C (holes of A
  preserved) and a monotone-chain hull; together with
  ``subtract_polygon`` they give the exact concave-parent Voronoi path
  (cell = (hull ∩ halfplanes) \\ (hull \\ parent)).

Everything operates on the shared ring representation of
cosmospark.geom: list of (poly_idx, ring_idx, xs, ys).
"""

from __future__ import annotations

import numpy as np

from cosmospark import geom
from cosmospark.voronoi import clip_halfplane

_MIN_AREA = 1e-12


def _ring_area_signed(xs: np.ndarray, ys: np.ndarray) -> float:
    xs, ys = geom._close_ring(np.asarray(xs, float), np.asarray(ys, float))
    return 0.5 * float(np.sum(xs * np.roll(ys, -1) - np.roll(xs, -1) * ys))


def _ccw(xs: np.ndarray, ys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    xs, ys = geom._close_ring(np.asarray(xs, float), np.asarray(ys, float))
    if _ring_area_signed(xs, ys) < 0:
        return xs[::-1].copy(), ys[::-1].copy()
    return xs, ys


def triangulate(xs: np.ndarray, ys: np.ndarray) -> list[tuple[np.ndarray, np.ndarray]]:
    """Ear-clip a simple polygon (open ring) into triangles.

    O(n²); subtraction subtrahends are zone boundaries at voronoi time —
    bounded per task. Degenerate (near-collinear) ears are skipped; if
    numerical trouble leaves no ear, the remainder falls back to a fan
    (acceptable for valid admin polygons, which are simple)."""
    xs, ys = _ccw(xs, ys)
    idx = list(range(len(xs)))
    tris: list[tuple[np.ndarray, np.ndarray]] = []
    guard = 0
    while len(idx) > 3 and guard < 10 * len(xs):
        guard += 1
        n = len(idx)
        found = False
        for k in range(n):
            i0, i1, i2 = idx[(k - 1) % n], idx[k], idx[(k + 1) % n]
            ax, ay = xs[i0], ys[i0]
            bx, by = xs[i1], ys[i1]
            cx, cy = xs[i2], ys[i2]
            cross = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
            if cross <= _MIN_AREA:  # reflex or degenerate — not an ear
                continue
            # no other vertex strictly inside the candidate ear
            others = [j for j in idx if j not in (i0, i1, i2)]
            if others:
                px = xs[others]
                py = ys[others]
                d1 = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
                d2 = (cx - bx) * (py - by) - (cy - by) * (px - bx)
                d3 = (ax - cx) * (py - cy) - (ay - cy) * (px - cx)
                inside = (d1 > -_MIN_AREA) & (d2 > -_MIN_AREA) & (d3 > -_MIN_AREA)
                if inside.any():
                    continue
            tris.append((np.array([ax, bx, cx]), np.array([ay, by, cy])))
            idx.pop(k)
            found = True
            break
        if not found:
            break
    if len(idx) >= 3:
        # remainder: fan from the first vertex (exact when the remainder
        # is convex — the usual terminal state)
        for k in range(1, len(idx) - 1):
            i0, i1, i2 = idx[0], idx[k], idx[k + 1]
            if abs((xs[i1] - xs[i0]) * (ys[i2] - ys[i0]) - (ys[i1] - ys[i0]) * (xs[i2] - xs[i0])) > 2 * _MIN_AREA:
                tris.append(
                    (np.array([xs[i0], xs[i1], xs[i2]]), np.array([ys[i0], ys[i1], ys[i2]]))
                )
    return tris


def _clip_wedge(xs, ys, planes) -> tuple[np.ndarray, np.ndarray]:
    """SH-clip a ring against an intersection of half-planes."""
    for a, b, c in planes:
        xs, ys = clip_halfplane(xs, ys, a, b, c)
        if len(xs) == 0:
            break
    return xs, ys


def _wedges(cxs: np.ndarray, cys: np.ndarray):
    """The complement-of-convex-C wedge half-plane lists.

    Edge e_i of CCW C has inside = left side: a*x+b*y+c >= 0 with
    (a,b) the inward normal. Wedge W_i = {outside e_i} ∩
    {inside e_1..e_{i-1}}."""
    cxs, cys = _ccw(cxs, cys)
    k = len(cxs)
    edges = []
    for i in range(k):
        x1, y1 = cxs[i], cys[i]
        x2, y2 = cxs[(i + 1) % k], cys[(i + 1) % k]
        # inward normal for CCW ring: (-(y2-y1), x2-x1)
        a = -(y2 - y1)
        b = x2 - x1
        c = -(a * x1 + b * y1)
        edges.append((a, b, c))
    wedges = []
    for i, (a, b, c) in enumerate(edges):
        planes = [(-a, -b, -c)] + [edges[j] for j in range(i)]
        wedges.append(planes)
    return wedges


def subtract_convex(rings: list[geom.Ring], cxs: np.ndarray, cys: np.ndarray) -> list[geom.Ring]:
    """Multipolygon \\ convex polygon, exactly, holes of the subject
    preserved (clipped into the same wedge as their exterior piece)."""
    wedges = _wedges(cxs, cys)
    polys: dict[int, dict[int, geom.Ring]] = {}
    for p, r, xs, ys in rings:
        polys.setdefault(p, {})[r] = (p, r, xs, ys)
    out: list[geom.Ring] = []
    pidx = 0
    for p, by_ring in sorted(polys.items()):
        ext = by_ring.get(0)
        if ext is None:
            continue
        holes = [v for r, v in sorted(by_ring.items()) if r != 0]
        for planes in wedges:
            ex, ey = _clip_wedge(
                np.asarray(ext[2], float), np.asarray(ext[3], float), planes
            )
            if len(ex) < 3 or abs(_ring_area_signed(ex, ey)) <= _MIN_AREA:
                continue
            out.append((pidx, 0, ex, ey))
            nring = 1
            for _, _, hxs, hys in holes:
                hx, hy = _clip_wedge(np.asarray(hxs, float), np.asarray(hys, float), planes)
                if len(hx) >= 3 and abs(_ring_area_signed(hx, hy)) > _MIN_AREA:
                    out.append((pidx, nring, hx, hy))
                    nring += 1
            pidx += 1
    return out


def intersect_convex(rings: list[geom.Ring], cxs: np.ndarray, cys: np.ndarray) -> list[geom.Ring]:
    """Multipolygon ∩ convex polygon, holes of the subject preserved
    (clipped into the same convex region and re-attached)."""
    cxs, cys = _ccw(cxs, cys)
    k = len(cxs)
    planes = []
    for i in range(k):
        x1, y1 = cxs[i], cys[i]
        x2, y2 = cxs[(i + 1) % k], cys[(i + 1) % k]
        a = -(y2 - y1)  # inward normal of a CCW ring
        b = x2 - x1
        planes.append((a, b, -(a * x1 + b * y1)))
    polys: dict[int, dict[int, geom.Ring]] = {}
    for p, r, xs, ys in rings:
        polys.setdefault(p, {})[r] = (p, r, xs, ys)
    out: list[geom.Ring] = []
    pidx = 0
    for p, by_ring in sorted(polys.items()):
        ext = by_ring.get(0)
        if ext is None:
            continue
        ex, ey = _clip_wedge(np.asarray(ext[2], float), np.asarray(ext[3], float), planes)
        if len(ex) < 3 or abs(_ring_area_signed(ex, ey)) <= _MIN_AREA:
            continue
        out.append((pidx, 0, ex, ey))
        nring = 1
        for r, (_, _, hxs, hys) in sorted(by_ring.items()):
            if r == 0:
                continue
            hx, hy = _clip_wedge(np.asarray(hxs, float), np.asarray(hys, float), planes)
            if len(hx) >= 3 and abs(_ring_area_signed(hx, hy)) > _MIN_AREA:
                out.append((pidx, nring, hx, hy))
                nring += 1
        pidx += 1
    return out


def _subtract_filled_exterior(
    cur: list[geom.Ring], oxs: np.ndarray, oys: np.ndarray
) -> list[geom.Ring]:
    """cur \\ (filled simple polygon): ear-clip the subtrahend ring into
    triangles and subtract them sequentially (exact: the triangles
    partition it; each is convex). Pieces whose bbox is disjoint from a
    triangle skip the clip untouched."""
    for txs, tys in triangulate(np.asarray(oxs, float), np.asarray(oys, float)):
        tb = (float(txs.min()), float(tys.min()), float(txs.max()), float(tys.max()))
        nxt: list[geom.Ring] = []
        pidx = 0
        polys: dict[int, list[geom.Ring]] = {}
        for ring in cur:
            polys.setdefault(ring[0], []).append(ring)
        for p, group in sorted(polys.items()):
            gb = geom.bbox(group)
            if not geom.bbox_overlaps(gb, tb):
                for _, rr, xs, ys in group:
                    nxt.append((pidx, rr, xs, ys))
                pidx += 1
                continue
            pieces = subtract_convex(group, txs, tys)
            remap: dict[int, int] = {}
            for pp, rr, xs, ys in pieces:
                if pp not in remap:
                    remap[pp] = pidx
                    pidx += 1
                nxt.append((remap[pp], rr, xs, ys))
        cur = nxt
        if not cur:
            return []
    return cur


def subtract_polygon(rings: list[geom.Ring], other: list[geom.Ring]) -> list[geom.Ring]:
    """Multipolygon \\ multipolygon, HOLES OF THE SUBTRAHEND PRESERVED
    (GEOS difference semantics, the reference's
    src/additional_zones.rs:198-235): per subtrahend polygon
    P = ext \\ ∪holes,

        A \\ P  =  (A \\ ext) ∪ (A ∩ hole_1) ∪ … ∪ (A ∩ hole_k)

    — the parts of A inside P's holes are NOT subtracted. Each union
    term is disjoint (holes ⊆ ext interior, holes pairwise disjoint), so
    the pieces concatenate exactly. Round 2 treated holes as filled and
    over-subtracted with a warning."""
    cur = rings
    polys: dict[int, dict[int, geom.Ring]] = {}
    for p, r, xs, ys in other:
        polys.setdefault(p, {})[r] = (p, r, xs, ys)
    for p, by_ring in sorted(polys.items()):
        ext = by_ring.get(0)
        if ext is None:
            continue
        # pieces of cur inside this polygon's holes are retained area —
        # captured BEFORE the (filled) exterior is subtracted. Pieces
        # from different hole triangles are renumbered into disjoint
        # poly ids (each intersect_convex call restarts at 0).
        retained: list[geom.Ring] = []
        next_p = 0
        for r, (_, _, hxs, hys) in sorted(by_ring.items()):
            if r == 0:
                continue
            for txs, tys in triangulate(np.asarray(hxs, float), np.asarray(hys, float)):
                pieces = intersect_convex(cur, txs, tys)
                if not pieces:
                    continue
                retained.extend((next_p + pp, rr, xs, ys) for pp, rr, xs, ys in pieces)
                next_p += 1 + max(pp for pp, _, _, _ in pieces)
        cur = _subtract_filled_exterior(cur, ext[2], ext[3])
        if retained:
            base = 1 + max((rr[0] for rr in cur), default=-1)
            remap: dict[int, int] = {}
            readd: list[geom.Ring] = []
            for pp, rr, xs, ys in retained:
                if pp not in remap:
                    remap[pp] = base
                    base += 1
                readd.append((remap[pp], rr, xs, ys))
            cur = cur + readd
        if not cur:
            return []
    return cur


def convex_hull(xs: np.ndarray, ys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Convex hull of a point set (Andrew's monotone chain), CCW open
    ring. Used by the exact concave-parent Voronoi path: SH clipping is
    exact on the hull (convex), and hull \\ parent subtracts back out."""
    xs = np.asarray(xs, float)
    ys = np.asarray(ys, float)
    pts = sorted(set(zip(xs.tolist(), ys.tolist())))
    if len(pts) <= 2:
        px = np.array([p[0] for p in pts])
        py = np.array([p[1] for p in pts])
        return px, py

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list = []
    for p in reversed(pts):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    hull = lower[:-1] + upper[:-1]
    return np.array([p[0] for p in hull]), np.array([p[1] for p in hull])
