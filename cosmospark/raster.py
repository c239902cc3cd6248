"""Raster ↔ vector tiling over the zone model.

The reference is vector-only (GEOS geometry end to end); the north-star
graft adds a raster leg: rasterize each zone's polygon into per-cell /
per-tile pixel occupancy masks (vector → raster), and recover vector
boxes from a mask (raster → vector), so an image fact table can be
joined against zone coverage at pixel granularity.

Scale shape: one mapInPandas over the ZONE table (zone-dim scale,
embarrassingly parallel per zone — 10^6 zones spread over executors),
each zone emitting one row per covering cell/tile. No shuffle; the
output is a (zone_id, cell) keyed table that equi-joins against
cell-encoded facts. All pixel tests run through the same numpy PIP
kernel as zone assignment (``geom.pip_covers``), vectorized across
every pixel of every covering cell of a zone in one call.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from cosmospark import cells, geom

_RASTER_SCHEMA = T.StructType(
    [
        T.StructField("zone_id", T.LongType()),
        T.StructField("cell", T.LongType()),
        T.StructField("mask", T.BinaryType()),
        T.StructField("n_inside", T.LongType()),
    ]
)


def _mask_rows(zid, rr, lon_c, lat_c, keys):
    """PIP every pixel center (ncells, px, px) in ONE kernel call and
    pack per-cell bitmasks; emit only cells with coverage."""
    ncells, px, _ = lon_c.shape
    hit = geom.pip_covers(lon_c.ravel(), lat_c.ravel(), rr).reshape(ncells, px, px)
    n_in = hit.sum(axis=(1, 2))
    rows = []
    for ci in np.nonzero(n_in)[0]:
        rows.append(
            {
                "zone_id": int(zid),
                "cell": int(keys[ci]),
                "mask": np.packbits(hit[ci].ravel()).tobytes(),
                "n_inside": int(n_in[ci]),
            }
        )
    return rows


def rasterize_zones_cells(
    zones: DataFrame, res: int, px: int = 8
) -> DataFrame:
    """Vector → raster on the linear quadkey grid: for every zone and
    every res-cell its bbox touches, a ``px``×``px`` occupancy bitmask
    of pixel centers (row-major, ``np.packbits`` layout) plus the
    inside-pixel count.

    Pixel centers are the centers of the uniform sub-lattice
    ``lon = -180 + (i + 0.5) * 360 / (2^res * px)`` (same for lat over
    180°) — pure +,*,/ arithmetic, so an SQL oracle reproduces them
    bit-for-bit."""
    z = zones.select(F.col("id").alias("zone_id"), "rings")

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        nf = float((1 << res) * px)
        off = np.arange(px, dtype=np.float64)
        for pdf in batches:
            rows: list[dict] = []
            for zid, rrows in zip(pdf["zone_id"], pdf["rings"]):
                if rrows is None or len(rrows) == 0:
                    continue
                rr = geom.rows_to_rings(rrows)
                minx, miny, maxx, maxy = geom.bbox(rr)
                cc = cells.cells_for_bbox(minx, miny, maxx, maxy, res)
                if not len(cc):
                    continue
                cx, cy = cells.morton_deinterleave(cc, res)
                # pixel center grids: (ncells, px) per axis → (ncells, px, px)
                ii = cx[:, None] * px + off[None, :]
                jj = cy[:, None] * px + off[None, :]
                lon1 = -180.0 + (ii + 0.5) * 360.0 / nf
                lat1 = -90.0 + (jj + 0.5) * 180.0 / nf
                lon_c = np.repeat(lon1[:, None, :], px, axis=1)
                lat_c = np.repeat(lat1[:, :, None], px, axis=2)
                rows.extend(_mask_rows(zid, rr, lon_c, lat_c, cc))
            yield pd.DataFrame(
                rows,
                columns=["zone_id", "cell", "mask", "n_inside"],
            )

    return z.mapInPandas(_run, _RASTER_SCHEMA)


def rasterize_zones_tiles(zones: DataFrame, z: int, px: int = 64) -> DataFrame:
    """Vector → raster on the web-mercator z/x/y tile pyramid (the
    ``tile_encode`` packing): per covering tile, a ``px``×``px`` pixel
    occupancy mask. Pixel x is linear in lon; pixel y inverts the
    mercator projection (``lat = atan(sinh(π(1 − 2·yf)))``)."""
    zz = zones.select(F.col("id").alias("zone_id"), "rings")
    n = 1 << z

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        off = np.arange(px, dtype=np.float64)
        for pdf in batches:
            rows: list[dict] = []
            for zid, rrows in zip(pdf["zone_id"], pdf["rings"]):
                if rrows is None or len(rrows) == 0:
                    continue
                rr = geom.rows_to_rings(rrows)
                minx, miny, maxx, maxy = geom.bbox(rr)
                tx0, ty1 = cells.tile_xy(np.array([minx]), np.array([miny]), z)
                tx1, ty0 = cells.tile_xy(np.array([maxx]), np.array([maxy]), z)
                txs = np.arange(tx0[0], tx1[0] + 1)
                tys = np.arange(ty0[0], ty1[0] + 1)
                tx, ty = np.meshgrid(txs, tys, indexing="ij")
                tx, ty = tx.ravel(), ty.ravel()
                keys = (np.int64(z) << 58) | (tx << 29) | ty
                lon1 = -180.0 + (tx[:, None] * px + off[None, :] + 0.5) * 360.0 / (n * px)
                yf = (ty[:, None] * px + off[None, :] + 0.5) / (n * px)
                lat1 = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * yf))))
                ncells = len(tx)
                lon_c = np.repeat(lon1[:, None, :], px, axis=1)
                # mercator y runs north→south: row b of the mask is the
                # b-th pixel DOWN from the tile's top edge
                lat_c = np.repeat(lat1[:, :, None], px, axis=2)
                rows.extend(_mask_rows(zid, rr, lon_c, lat_c, keys))
            yield pd.DataFrame(
                rows, columns=["zone_id", "cell", "mask", "n_inside"]
            )

    out = zz.mapInPandas(_run, _RASTER_SCHEMA)
    return out.withColumnRenamed("cell", "tile_id")


def unpack_mask(mask: bytes, px: int) -> np.ndarray:
    """packed mask bytes → (px, px) bool array (row-major)."""
    return np.unpackbits(np.frombuffer(mask, dtype=np.uint8))[: px * px].reshape(
        px, px
    ).astype(bool)


def mask_to_boxes(mask: bytes, px: int) -> np.ndarray:
    """Raster → vector: greedy rectangle decomposition of a mask.
    Row-RLE runs merged across consecutive rows with identical spans.
    Returns (m, 4) int boxes ``(row0, col0, row1, col1)`` (end
    exclusive) whose disjoint union is exactly the set pixels — the
    round-trip invariant ``boxes → raster == mask`` is tested."""
    m = unpack_mask(mask, px)
    open_runs: dict[tuple[int, int], int] = {}  # (col0, col1) -> row0
    boxes: list[tuple[int, int, int, int]] = []
    for r in range(px + 1):
        if r < px:
            d = np.diff(np.concatenate(([0], m[r].astype(np.int8), [0])))
            starts = np.nonzero(d == 1)[0]
            ends = np.nonzero(d == -1)[0]
            runs = set(zip(starts.tolist(), ends.tolist()))
        else:
            runs = set()
        for span, row0 in list(open_runs.items()):
            if span not in runs:
                boxes.append((row0, span[0], r, span[1]))
                del open_runs[span]
        for span in runs:
            if span not in open_runs:
                open_runs[span] = r
    return np.array(boxes, dtype=np.int64).reshape(-1, 4)


def boxes_to_mask(boxes: np.ndarray, px: int) -> np.ndarray:
    """Inverse of ``mask_to_boxes`` (for the round-trip check)."""
    m = np.zeros((px, px), dtype=bool)
    for r0, c0, r1, c1 in boxes:
        m[r0:r1, c0:c1] = True
    return m
