"""S2-style spherical cell index: cube faces + quadratic ST + Hilbert.

The north-star calls for "H3 cells (with S2 fallback)": `cells.py` is the
H3-style planar quadkey used on the hot fact path; this module is the S2
fallback for workloads where the planar grid's polar distortion matters
(global corpora, high-latitude imagery). It follows the public S2
construction — project the unit sphere onto the 6 cube faces
(gnomonic), apply the quadratic UV→ST correction so cell areas stay
within ~2.1× of each other, discretize ST to a 2^res × 2^res grid per
face, and order cells along a Hilbert curve so that id-adjacent cells
are spatially adjacent (better range locality than Morton when cells
become storage sort keys).

Cell id layout: ``(face << 2*res) | hilbert_d`` — like `cells.py`, a
*bijective prefix scheme*: ``parent(cell) == cell >> 2`` (the Hilbert
index nests: truncating 2 bits yields the parent's index, verified
exhaustively in tests), so multi-resolution rollups remain pure
integer-shift groupBys and never rescan the fact table.

The Hilbert transform is a 4-state machine (digit + next-state LUTs,
derived from the classic rotate-and-swap loop and asserted equal to it
in tests). That formulation matters for the SQL oracle: state is the
only value that chains between bit levels, so the generated SQL is a
linear chain of ``res`` subquery layers (16-way CASE each) instead of
an exponentially inlined rotation — both Spark SQL and DuckDB execute
the *identical* generated text, which is what the driver's value-hash
comparison exercises.

Everything is vectorized numpy (Arrow-batch friendly) + dialect-shared
SQL generators; no per-row Python anywhere.

Reference parity note: the reference has no spherical index (it uses an
in-memory rstar R-tree, src/hierarchy_builder.rs:34-74); this module is
graft-side scale infrastructure, same role as `cells.py`.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 30  # 3 face bits + 2*30 = 63 bits

# 4-state Hilbert machine, MSB-first. Quadrant key q = 2*bit(x) + bit(y).
# Derived from the canonical rotate-and-swap xy2d loop; tests assert
# bit-for-bit equality with that loop and the d>>2 nesting property.
HILBERT_DIGIT = np.array(
    [[0, 1, 3, 2], [0, 3, 1, 2], [2, 1, 3, 0], [2, 3, 1, 0]], dtype=np.int64
)
HILBERT_NEXT = np.array(
    [[1, 0, 2, 0], [0, 3, 1, 1], [2, 2, 0, 3], [3, 1, 3, 2]], dtype=np.int64
)

# Inverse machine (decode): for each state, digit -> quadrant, and the
# state reached after consuming that digit.
HILBERT_QUAD = np.zeros((4, 4), dtype=np.int64)
HILBERT_NEXT_INV = np.zeros((4, 4), dtype=np.int64)
for _s in range(4):
    for _q in range(4):
        _d = HILBERT_DIGIT[_s, _q]
        HILBERT_QUAD[_s, _d] = _q
        HILBERT_NEXT_INV[_s, _d] = HILBERT_NEXT[_s, _q]


def _unit_xyz(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    cl = np.cos(lat)
    return cl * np.cos(lon), cl * np.sin(lon), np.sin(lat)


def face_uv(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(face 0..5, u, v) per the public S2 face/UV convention.

    Face = axis of the largest-|.| vector component (+x,+y,+z,-x,-y,-z →
    0..5); u,v are the gnomonic coordinates on that face, each in
    [-1, 1]. The comparison order (|x| first, then |y|) is mirrored
    exactly in the SQL generator so ties break identically.
    """
    px, py, pz = _unit_xyz(lon, lat)
    ax, ay, az = np.abs(px), np.abs(py), np.abs(pz)
    on_x = (ax >= ay) & (ax >= az)
    on_y = ~on_x & (ay >= az)
    on_z = ~on_x & ~on_y
    face = np.where(
        on_x,
        np.where(px >= 0, 0, 3),
        np.where(on_y, np.where(py >= 0, 1, 4), np.where(pz >= 0, 2, 5)),
    ).astype(np.int64)
    u = np.empty_like(px)
    v = np.empty_like(px)
    # face 0 (+x): u=y/x  v=z/x      face 3 (-x): u=z/x  v=y/x
    # face 1 (+y): u=-x/y v=z/y      face 4 (-y): u=z/y  v=-x/y
    # face 2 (+z): u=-x/z v=-y/z     face 5 (-z): u=-y/z v=-x/z
    m = face == 0
    u[m], v[m] = py[m] / px[m], pz[m] / px[m]
    m = face == 1
    u[m], v[m] = -px[m] / py[m], pz[m] / py[m]
    m = face == 2
    u[m], v[m] = -px[m] / pz[m], -py[m] / pz[m]
    m = face == 3
    u[m], v[m] = pz[m] / px[m], py[m] / px[m]
    m = face == 4
    u[m], v[m] = pz[m] / py[m], -px[m] / py[m]
    m = face == 5
    u[m], v[m] = -py[m] / pz[m], -px[m] / pz[m]
    return face, u, v


def uv_to_st(u: np.ndarray) -> np.ndarray:
    """S2 quadratic projection: evens out cell areas across a face."""
    h = 0.5 * np.sqrt(1.0 + 3.0 * np.abs(u))  # sqrt(1-3u) == sqrt(1+3|u|) for u<0
    return np.where(u >= 0.0, h, 1.0 - h)


def st_to_uv(s: np.ndarray) -> np.ndarray:
    """Inverse of the quadratic projection."""
    s = np.asarray(s, dtype=np.float64)
    return np.where(
        s >= 0.5, (4.0 * s * s - 1.0) / 3.0, (1.0 - 4.0 * (1.0 - s) * (1.0 - s)) / 3.0
    )


def hilbert_xy2d(i: np.ndarray, j: np.ndarray, res: int) -> np.ndarray:
    """Vectorized MSB-first Hilbert index via the 4-state machine."""
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)
    st = np.zeros_like(i)
    d = np.zeros_like(i)
    for lev in range(res - 1, -1, -1):
        q = (((i >> lev) & 1) << 1) | ((j >> lev) & 1)
        idx = (st << 2) | q
        d = (d << 2) | HILBERT_DIGIT.ravel()[idx]
        st = HILBERT_NEXT.ravel()[idx]
    return d


def hilbert_d2xy(d: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse Hilbert: index → (i, j) grid coordinates."""
    d = np.asarray(d, dtype=np.int64)
    st = np.zeros_like(d)
    i = np.zeros_like(d)
    j = np.zeros_like(d)
    for lev in range(res - 1, -1, -1):
        dig = (d >> (2 * lev)) & 3
        idx = (st << 2) | dig
        q = HILBERT_QUAD.ravel()[idx]
        i |= (q >> 1) << lev
        j |= (q & 1) << lev
        st = HILBERT_NEXT_INV.ravel()[idx]
    return i, j


def s2_encode(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """lon/lat arrays → int64 S2-style cell ids at resolution ``res``."""
    assert 0 < res <= MAX_RES
    n = np.int64(1) << res
    face, u, v = face_uv(lon, lat)
    i = np.clip((uv_to_st(u) * n).astype(np.int64), 0, n - 1)
    j = np.clip((uv_to_st(v) * n).astype(np.int64), 0, n - 1)
    return (face << np.int64(2 * res)) | hilbert_xy2d(i, j, res)


def s2_parent(cell: np.ndarray, steps: int = 1) -> np.ndarray:
    """Ancestor ``steps`` levels coarser — the face bits shift with the
    Hilbert bits, so this is the same pure prefix shift as cells.py."""
    return np.asarray(cell, dtype=np.int64) >> (2 * steps)


def s2_decode(cell: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Cell id → (lon, lat) of the cell's ST center."""
    cell = np.asarray(cell, dtype=np.int64)
    n = np.int64(1) << res
    face = cell >> np.int64(2 * res)
    i, j = hilbert_d2xy(cell & ((np.int64(1) << (2 * res)) - 1), res)
    u = st_to_uv((i.astype(np.float64) + 0.5) / float(n))
    v = st_to_uv((j.astype(np.float64) + 0.5) / float(n))
    one = np.ones_like(u)
    # face → xyz: inverse of the face_uv table
    xs = [one, -u, -u, -one, v, v]
    ys = [u, one, -v, -v, -one, u]
    zs = [v, v, one, -u, -u, -one]
    x = np.choose(face, xs)
    y = np.choose(face, ys)
    z = np.choose(face, zs)
    lon = np.degrees(np.arctan2(y, x))
    lat = np.degrees(np.arctan2(z, np.hypot(x, y)))
    return lon, lat


# ---------------------------------------------------------------------------
# Dialect-shared SQL generation. Both Spark SQL and DuckDB run the SAME
# generated text; state is the only chained value so the plan is a
# linear stack of ``res`` thin projections (Catalyst keeps them in one
# WholeStageCodegen; DuckDB in one projection pipeline).


def sql_s2_face_uv(lon_col: str, lat_col: str) -> str:
    """SELECT-fragment layers computing face, u, v from lon/lat columns.

    Returns the body of a FROM-chain: ``(SELECT *, ... FROM %s)`` with
    ``%s`` the inner relation. Comparison order matches face_uv()."""
    xyz = (
        "SELECT *, "
        f"cos(radians({lat_col})) * cos(radians({lon_col})) AS _px, "
        f"cos(radians({lat_col})) * sin(radians({lon_col})) AS _py, "
        f"sin(radians({lat_col})) AS _pz FROM %s"
    )
    face = (
        "SELECT *, CASE "
        "WHEN abs(_px) >= abs(_py) AND abs(_px) >= abs(_pz) THEN "
        "  (CASE WHEN _px >= 0 THEN 0 ELSE 3 END) "
        "WHEN abs(_py) >= abs(_pz) THEN (CASE WHEN _py >= 0 THEN 1 ELSE 4 END) "
        "ELSE (CASE WHEN _pz >= 0 THEN 2 ELSE 5 END) END AS _face FROM (%s)"
    ) % xyz
    uv = (
        "SELECT *, "
        "CASE _face WHEN 0 THEN _py/_px WHEN 1 THEN -_px/_py WHEN 2 THEN -_px/_pz "
        "WHEN 3 THEN _pz/_px WHEN 4 THEN _pz/_py ELSE -_py/_pz END AS _u, "
        "CASE _face WHEN 0 THEN _pz/_px WHEN 1 THEN _pz/_py WHEN 2 THEN -_py/_pz "
        "WHEN 3 THEN _py/_px WHEN 4 THEN -_px/_py ELSE -_px/_pz END AS _v "
        "FROM (%s)"
    ) % face
    return uv


def _sql_st(e: str) -> str:
    return (
        f"CASE WHEN {e} >= 0 THEN 0.5 * sqrt(1.0 + 3.0 * {e}) "
        f"ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * {e}) END"
    )


def sql_s2_encode_from(
    inner_sql: str,
    lon_col: str,
    lat_col: str,
    res: int,
    keep_cols: tuple = ("pid", "lon", "lat"),
    out_col: str = "cell",
) -> str:
    """Full SELECT over ``inner_sql`` projecting ``keep_cols`` plus
    ``out_col`` = s2_encode(lon_col, lat_col, res).

    One subquery layer per Hilbert level; identical text runs in Spark
    SQL and DuckDB (the driver's oracle parity path). ``keep_cols`` is
    explicit because star-minus syntax differs across dialects
    (EXCLUDE vs EXCEPT)."""
    assert 0 < res <= MAX_RES
    n = 1 << res
    q = sql_s2_face_uv(lon_col, lat_col) % f"({inner_sql})"
    si = _sql_st("_u")
    sj = _sql_st("_v")
    q = (
        "SELECT *, "
        f"least(greatest(cast(floor({si} * {n}.0) as bigint), 0), {n - 1}) AS _i, "
        f"least(greatest(cast(floor({sj} * {n}.0) as bigint), 0), {n - 1}) AS _j "
        f"FROM ({q})"
    )
    # State-machine chain: _st{k}, _d{k} from the level-k quadrant.
    prev_st, prev_d = None, None
    for k, lev in enumerate(range(res - 1, -1, -1)):
        quad = f"(((_i >> {lev}) & 1) * 2 + ((_j >> {lev}) & 1))"
        key = quad if prev_st is None else f"({prev_st} * 4 + {quad})"
        dig_pairs = []
        nxt_pairs = []
        for s in range(4 if prev_st is not None else 1):
            for qd in range(4):
                dig_pairs.append((s * 4 + qd, int(HILBERT_DIGIT[s, qd])))
                nxt_pairs.append((s * 4 + qd, int(HILBERT_NEXT[s, qd])))
        dig = "CASE " + key + " " + " ".join(
            f"WHEN {kk} THEN {vv}" for kk, vv in dig_pairs
        ) + " END"
        nxt = "CASE " + key + " " + " ".join(
            f"WHEN {kk} THEN {vv}" for kk, vv in nxt_pairs
        ) + " END"
        d_expr = dig if prev_d is None else f"({prev_d} * 4 + {dig})"
        q = (
            f"SELECT *, cast({d_expr} as bigint) AS _d{k}, "
            f"cast({nxt} as bigint) AS _st{k} FROM ({q})"
        )
        prev_st, prev_d = f"_st{k}", f"_d{k}"
    keep = ", ".join(keep_cols) + ", " if keep_cols else ""
    q = (
        f"SELECT {keep}"
        f"cast(_face as bigint) * {4 ** res} + _d{res - 1} AS {out_col} FROM ({q})"
    )
    return q
