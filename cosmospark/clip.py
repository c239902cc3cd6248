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
* ``subtract_polygon`` — A \\ B for arbitrary simple B: triangulate B's
  exterior rings and subtract each triangle in turn. Exact because the
  triangles partition B; sequential subtraction of disjoint convex
  pieces composes exactly. Holes of B are over-subtracted (treated as
  filled) — callers warn.

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


def subtract_polygon(rings: list[geom.Ring], other: list[geom.Ring]) -> list[geom.Ring]:
    """Multipolygon \\ multipolygon (holes of ``other`` treated as
    filled): triangulate each exterior ring of ``other``, subtract the
    triangles sequentially. Pieces whose bbox is disjoint from a
    triangle skip the clip untouched."""
    cur = rings
    for _, r, oxs, oys in other:
        if r != 0:
            continue  # holes of the subtrahend: over-subtracted (caller warns)
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
