"""S2-style spherical cells: cube face + quadratic ST + Hilbert.

Validates the 4-state Hilbert machine against the classic
rotate-and-swap loop, the prefix-nesting property the rollup queries
rely on, the face/UV inverse tables, and numpy↔SQL parity of the
generated encode chain (the Spark↔DuckDB leg runs in the
test_oracle_parity sweep via geo_s2_encode / geo_s2_rollup).
"""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cosmospark import s2


def _classic_xy2d(n, x, y):
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_state_machine_matches_classic_loop():
    res = 4
    n = 1 << res
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    xs, ys = xs.ravel(), ys.ravel()
    got = s2.hilbert_xy2d(xs, ys, res)
    want = np.array([_classic_xy2d(n, int(a), int(b)) for a, b in zip(xs, ys)])
    np.testing.assert_array_equal(got, want)
    # d covers 0..n^2-1 exactly once (it's a space-filling bijection)
    assert sorted(got.tolist()) == list(range(n * n))


def test_hilbert_adjacency():
    # consecutive Hilbert indices are grid neighbours (the locality
    # property that makes the id a good storage sort key)
    res = 5
    d = np.arange(1 << (2 * res))
    i, j = s2.hilbert_d2xy(d, res)
    step = np.abs(np.diff(i)) + np.abs(np.diff(j))
    assert (step == 1).all()


def test_hilbert_roundtrip_and_nesting():
    rng = np.random.default_rng(3)
    i = rng.integers(0, 1 << 12, 4000)
    j = rng.integers(0, 1 << 12, 4000)
    d = s2.hilbert_xy2d(i, j, 12)
    ii, jj = s2.hilbert_d2xy(d, 12)
    np.testing.assert_array_equal(ii, i)
    np.testing.assert_array_equal(jj, j)
    # truncating 2 bits == encoding the parent grid cell
    np.testing.assert_array_equal(d >> 2, s2.hilbert_xy2d(i >> 1, j >> 1, 11))


def test_s2_encode_properties():
    rng = np.random.default_rng(11)
    lon = rng.uniform(-180, 180, 30000)
    lat = rng.uniform(-90, 90, 30000)
    c9 = s2.s2_encode(lon, lat, 9)
    # all six faces reached on a global sample
    assert set((c9 >> 18).tolist()) == set(range(6))
    # prefix nesting through the face bits (exact: floor on dyadic grids)
    np.testing.assert_array_equal(c9 >> 2, s2.s2_encode(lon, lat, 8))
    np.testing.assert_array_equal(s2.s2_parent(c9, 3), s2.s2_encode(lon, lat, 6))
    # id range: face < 6, hilbert < 4^res
    assert int(c9.max()) < 6 << 18
    assert int(c9.min()) >= 0


def test_s2_decode_center_reencodes_to_same_cell():
    rng = np.random.default_rng(5)
    lon = rng.uniform(-180, 180, 20000)
    lat = rng.uniform(-90, 90, 20000)
    for res in (4, 9):
        c = s2.s2_encode(lon, lat, res)
        dl, dt = s2.s2_decode(c, res)
        np.testing.assert_array_equal(s2.s2_encode(dl, dt, res), c)


def test_s2_poles_and_antimeridian():
    # the planar quadkey's pathological inputs are ordinary cells here
    lon = np.array([0.0, 0.0, 180.0, -180.0, 179.99, -179.99])
    lat = np.array([90.0, -90.0, 0.0, 0.0, 89.9, -89.9])
    c = s2.s2_encode(lon, lat, 9)
    assert (c >> 18)[0] == 2 and (c >> 18)[1] == 5  # polar caps on ±z faces
    # lon ±180 is the same meridian: same face (the meridian itself is a
    # cell boundary, so the two FP signs of sin(±pi) land in the two
    # boundary-adjacent cells — same face, grid neighbours)
    assert (c[2] >> 18) == (c[3] >> 18) == 3
    i2, j2 = s2.hilbert_d2xy(c[2] & ((1 << 18) - 1), 9)
    i3, j3 = s2.hilbert_d2xy(c[3] & ((1 << 18) - 1), 9)
    assert abs(int(i2) - int(i3)) + abs(int(j2) - int(j3)) == 1

    # area evenness: the quadratic ST transform keeps a polar cell
    # within ~2.1x of an equatorial one — sample counts per face on a
    # uniform sphere sample should be near-equal
    rng = np.random.default_rng(1)
    z = rng.uniform(-1, 1, 60000)
    phi = rng.uniform(-np.pi, np.pi, 60000)
    lat_s = np.degrees(np.arcsin(z))
    lon_s = np.degrees(phi)
    faces = s2.s2_encode(lon_s, lat_s, 9) >> 18
    counts = np.bincount(faces, minlength=6)
    assert counts.min() > 0.8 * counts.max()


def test_sql_chain_matches_numpy_in_duckdb():
    rng = np.random.default_rng(17)
    lon = rng.uniform(-180, 180, 20000)
    lat = rng.uniform(-90, 90, 20000)
    con = duckdb.connect()
    con.register("pts", pd.DataFrame({"pid": np.arange(len(lon)), "lon": lon, "lat": lat}))
    for res in (1, 4, 9):
        q = s2.sql_s2_encode_from("SELECT * FROM pts", "lon", "lat", res)
        got = con.execute(f"SELECT cell FROM ({q}) ORDER BY pid").fetchnumpy()["cell"]
        np.testing.assert_array_equal(got, s2.s2_encode(lon, lat, res))


def test_sql_chain_matches_numpy_in_spark(spark):
    n = 8000
    pts = (
        f"SELECT i AS pid, -180.0 + (i * 7919 % 36000) / 100.0 AS lon, "
        f"-90.0 + (i * 104729 % 18000) / 100.0 AS lat FROM range({n}) t(i)"
    )
    q = s2.sql_s2_encode_from(pts, "lon", "lat", 9)
    pdf = spark.sql(f"SELECT pid, lon, lat, cell FROM ({q}) ORDER BY pid").toPandas()
    np.testing.assert_array_equal(
        pdf["cell"].to_numpy(), s2.s2_encode(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), 9)
    )
    # plan shape: the res-layer projection stack stays in whole-stage
    # codegen with no exchange before the (cosmetic) output sort
    sdf = spark.sql(f"SELECT pid, cell FROM ({q})")
    plan = sdf._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "InMemoryTableScan" not in plan and "Python" not in plan


def test_s2_range_scan_pruning(spark):
    """The written Hilbert-sorted layout: partition pruning on face,
    pushed range filter on cell, and few overlapping row groups."""
    import glob

    import pyarrow.parquet as pq

    from cosmospark.queries import (
        _S2_STORE_RES,
        _s2_scan_range,
        _s2_sorted_layout,
        q_geo_s2_range_scan,
    )

    df = q_geo_s2_range_scan(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "face" in plan.split("PartitionFilters")[1][:120]
    pushed = plan.split("PushedFilters")[1][:160]
    assert "GreaterThanOrEqual(cell" in pushed and "LessThan(cell" in pushed

    # row-group min/max stats: the Hilbert sort makes the target range
    # contiguous, so only a small fraction of the face's row groups
    # overlap [lo, hi)
    face, lo, hi = _s2_scan_range()
    path = _s2_sorted_layout(spark)
    files = glob.glob(f"{path}/face={face}/*.parquet")
    assert files
    total = overlapping = 0
    cover_rows = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        col = md.schema.to_arrow_schema().names.index("cell")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col).statistics
            total += 1
            if st.min < hi and st.max >= lo:
                overlapping += 1
                cover_rows += md.row_group(rg).num_rows
    assert total >= 8, f"want many row groups, got {total}"
    assert overlapping / total <= 1 / 3, (overlapping, total)
    # sanity: the overlapping groups actually cover the result rows
    n_hits = df.agg(F.sum("n")).collect()[0][0]
    assert 0 < n_hits <= cover_rows


def test_s2_bbox_covering_compact_and_pushed(spark):
    """The bbox covering must stay COMPACT (Hilbert locality merges the
    286 res-7 cells into ≤ 16 ranges — fragmentation is what kills
    filter pushdown) and the whole range disjunction + exact bbox
    refine must reach the parquet scan; row-group stats then skip most
    of the face's groups."""
    import glob

    import pyarrow.parquet as pq

    from cosmospark.queries import (
        _S2_BBOX,
        _S2_COVER_RES,
        _S2_STORE_RES,
        q_geo_s2_bbox_scan,
        s2_bbox_covering,
        _s2_sorted_layout,
    )

    cover = s2_bbox_covering(*_S2_BBOX, _S2_COVER_RES)
    assert 2 <= len(cover) <= 16, len(cover)

    df = q_geo_s2_bbox_scan(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "GreaterThanOrEqual(cell" in plan  # ranges reached storage

    # row-group skipping: count groups overlapping ANY covering range
    shift = 2 * (_S2_STORE_RES - _S2_COVER_RES)
    ranges = [(lo << shift, hi << shift) for lo, hi in cover]
    # face = cell >> 2*res under the (face << 2*res) | hilbert layout
    # (the r6 copy of this line carried the same +2 shift bug as the
    # query — ADVICE r6)
    face = ranges[0][0] >> (2 * _S2_STORE_RES)
    path = _s2_sorted_layout(spark)
    total = overlapping = 0
    for f in glob.glob(f"{path}/face={face}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        col = md.schema.to_arrow_schema().names.index("cell")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col).statistics
            total += 1
            if any(st.min < hi and st.max >= lo for lo, hi in ranges):
                overlapping += 1
    assert total >= 8
    assert overlapping / total < 0.85, (overlapping, total)


def test_bbox_face_derivation_off_face0(spark):
    """VERDICT r6 #1 regression: the face set derived from the covering
    must be the TRUE faces (cell >> 2*res), not face >> 2. The r6 shift
    bug made any bbox off cube face 0 return empty/partial results
    because the load-bearing partition filter excluded the matching
    faces — the fixture bbox (face 0) could not catch it. Drive an
    off-face-0 bbox AND a face-boundary-spanning bbox end-to-end
    through the written store and compare with a brute numpy re-encode
    of the source points."""
    from cosmospark.queries import _S2_STORE_N, _S2_STORE_RES, _s2_bbox_scan_df
    from cosmospark import s2 as s2mod

    i = np.arange(_S2_STORE_N, dtype=np.int64)
    lon = -180.0 + (i * 7919 % 36000) / 100.0
    lat = -90.0 + (i * 104729 % 18000) / 100.0
    for bbox in [(85.0, 2.0, 95.0, 9.0), (40.0, 2.0, 50.0, 9.0)]:
        lon0, lat0, lon1, lat1 = bbox
        m = (lon >= lon0) & (lon <= lon1) & (lat >= lat0) & (lat <= lat1)
        cells = s2mod.s2_encode(lon[m], lat[m], _S2_STORE_RES)
        true_faces = set((cells >> (2 * _S2_STORE_RES)).tolist())
        assert true_faces != {0}, "bbox must exercise a non-zero face"
        r8 = cells >> (2 * (_S2_STORE_RES - 8))
        ids, counts = np.unique(r8, return_counts=True)
        brute = pd.DataFrame({"cell_r8": ids, "n": counts})
        got = _s2_bbox_scan_df(spark, bbox).toPandas()
        pd.testing.assert_frame_equal(got, brute, check_dtype=False)


def test_s2_bbox_covering_complete_random_boxes():
    """Property check (no Spark): for 40 deterministic random boxes at
    assorted latitudes/sizes, EVERY point inside the box encodes to a
    cell inside the covering ranges — the sampled covering misses no
    sliver cell, so the covering-prefilter + exact-refine composition
    can never under-return."""
    from cosmospark.queries import s2_bbox_covering

    rng = np.random.default_rng(7)
    res = 7
    for _ in range(40):
        lon0 = rng.uniform(-175, 160)
        lat0 = rng.uniform(-80, 70)
        lon1 = lon0 + rng.uniform(0.2, 15.0)
        lat1 = lat0 + rng.uniform(0.2, 10.0)
        ranges = s2_bbox_covering(lon0, lat0, lon1, lat1, res)
        los = np.array([lo for lo, _ in ranges])
        his = np.array([hi for _, hi in ranges])
        # dense interior points, including the exact corners/edges
        pl = np.concatenate(
            [rng.uniform(lon0, lon1, 4000), [lon0, lon1, lon0, lon1]]
        )
        pt = np.concatenate(
            [rng.uniform(lat0, lat1, 4000), [lat0, lat0, lat1, lat1]]
        )
        cells = s2.s2_encode(pl, pt, res)
        idx = np.searchsorted(los, cells, side="right") - 1
        ok = (idx >= 0) & (cells < his[np.clip(idx, 0, len(his) - 1)])
        assert ok.all(), (lon0, lat0, lon1, lat1, cells[~ok][:5])


def test_s2_range_scan_matches_unpruned(spark):
    """Same answer as a brute numpy re-encode of the source points (no
    written layout, no pruning, no Spark) — the IO path changes, the
    relation doesn't. Numpy (not a Spark SQL filter over the encode
    chain) on purpose: pushing `cell >= lo` through the res-12
    projection stack blows up PushDownPredicate exponentially in BOTH
    engines (see sql_geo_s2_range_scan's docstring)."""
    from cosmospark.queries import (
        _S2_STORE_N,
        _S2_STORE_RES,
        _s2_scan_range,
        q_geo_s2_range_scan,
    )
    from cosmospark import s2 as s2mod

    _, lo, hi = _s2_scan_range()
    i = np.arange(_S2_STORE_N, dtype=np.int64)
    lon = -180.0 + (i * 7919 % 36000) / 100.0
    lat = -90.0 + (i * 104729 % 18000) / 100.0
    cell = s2mod.s2_encode(lon, lat, _S2_STORE_RES)
    keep = cell[(cell >= lo) & (cell < hi)]
    r8 = keep >> (2 * (_S2_STORE_RES - 8))
    ids, counts = np.unique(r8, return_counts=True)
    brute = pd.DataFrame({"cell_r8": ids, "n": counts})
    got = q_geo_s2_range_scan(spark, "/root/testdata/sf0.001").toPandas()
    pd.testing.assert_frame_equal(got, brute, check_dtype=False)
