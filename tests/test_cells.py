"""Unit tests for the quadkey cell index and tile encoding."""

import numpy as np

from cosmospark import cells


class TestMorton:
    def test_roundtrip(self):
        rng = np.random.default_rng(3)
        res = 12
        x = rng.integers(0, 1 << res, 1000)
        y = rng.integers(0, 1 << res, 1000)
        code = cells.morton_interleave(x, y, res)
        bx, by = cells.morton_deinterleave(code, res)
        assert (bx == x).all() and (by == y).all()

    def test_prefix_property(self):
        # parent at res r-1 is the child code >> 2 — bijective prefix scheme
        rng = np.random.default_rng(4)
        lon = rng.uniform(-180, 180, 1000)
        lat = rng.uniform(-90, 90, 1000)
        c9 = cells.cell_encode(lon, lat, 9)
        c7 = cells.cell_encode(lon, lat, 7)
        c4 = cells.cell_encode(lon, lat, 4)
        assert (cells.cell_parent(c9, 2) == c7).all()
        assert (cells.cell_parent(c9, 5) == c4).all()
        assert (cells.cell_parent(c7, 3) == c4).all()

    def test_bounds_roundtrip(self):
        lon = np.array([6.13])  # Luxembourg City-ish
        lat = np.array([49.61])
        for res in (4, 7, 9):
            c = int(cells.cell_encode(lon, lat, res)[0])
            minx, miny, maxx, maxy = cells.cell_bounds(c, res)
            assert minx <= lon[0] <= maxx
            assert miny <= lat[0] <= maxy

    def test_cells_for_bbox_contains_point_cells(self):
        rng = np.random.default_rng(5)
        lon = rng.uniform(0, 10, 200)
        lat = rng.uniform(40, 50, 200)
        cover = set(cells.cells_for_bbox(0, 40, 10, 50, 6).tolist())
        pts = cells.cell_encode(lon, lat, 6)
        assert set(pts.tolist()) <= cover

    def test_fit_res_adaptive(self):
        # a tiny bbox fits at a fine res; the world needs a coarse one
        r_small = cells.fit_res(6.0, 49.0, 6.01, 49.01, max_cells=16)
        r_world = cells.fit_res(-180, -90, 180, 90, max_cells=16)
        assert r_small > r_world
        assert r_world <= 2


class TestTiles:
    def test_known_tile(self):
        # lon=0, lat=0 at z=1 → x=1, y=1 (slippy map convention)
        x, y = cells.tile_xy(np.array([0.1]), np.array([-0.1]), 1)
        assert (x[0], y[0]) == (1, 1)

    def test_pack_roundtrip(self):
        lon = np.array([6.13])
        lat = np.array([49.61])
        t = int(cells.tile_encode(lon, lat, 12)[0])
        z, x, y = cells.tile_decode(t)
        assert z == 12
        # Luxembourg: x=2117, y=1396 at z=12 (slippy formula:
        # y = floor((1 - asinh(tan φ)/π)/2 · 2^z))
        assert x == 2117 and y == 1396


class TestSqlParity:
    """The SQL expression builders must produce the same cells as numpy
    in BOTH Spark SQL and DuckDB — this is the oracle-parity guarantee."""

    def test_duckdb_matches_numpy(self):
        import duckdb

        rng = np.random.default_rng(6)
        lon = rng.uniform(-180, 180, 500)
        lat = rng.uniform(-90, 90, 500)
        res = 7
        expected = cells.cell_encode(lon, lat, res)
        expr = cells.sql_cell_encode("lon", "lat", res)
        con = duckdb.connect()
        con.register("pts", __import__("pandas").DataFrame({"lon": lon, "lat": lat}))
        got = con.sql(f"select {expr} as c from pts").df()["c"].to_numpy()
        assert (got == expected).all()


def test_col_cell_encode_matches_numpy(spark):
    """The JVM Column encoder must be bit-identical to the numpy kernel
    on random + edge coordinates at several resolutions (it feeds the
    partitioned assignment path, which must agree with broadcast)."""
    import numpy as np
    import pandas as pd
    import pyspark.sql.functions as F

    from cosmospark import cells

    rng = np.random.default_rng(42)
    lon = np.concatenate(
        [rng.uniform(-200, 200, 2000), [-180.0, 180.0, 0.0, -180.0001, 179.9999]]
    )
    lat = np.concatenate(
        [rng.uniform(-100, 100, 2000), [-90.0, 90.0, 0.0, -90.0001, 89.9999]]
    )
    pdf = pd.DataFrame({"lon": lon, "lat": lat})
    sdf = spark.createDataFrame(pdf)
    for res in (1, 7, 12, 26):
        want = cells.cell_encode(lon, lat, res)
        got = (
            sdf.select(
                cells.col_cell_encode(F.col("lon"), F.col("lat"), res).alias("c")
            )
            .toPandas()["c"]
            .to_numpy()
        )
        assert (got == want).all(), f"res={res}: {np.nonzero(got != want)[0][:5]}"
