"""The web-scale fact job: point→zone assignment + cell/tile encoding.

This is the reimplementation of the reference's point-in-polygon parent
lookup (``get_parent`` / ``contains_center``, src/additional_zones.rs:102-120,
src/zone_ext.rs:279-284) redesigned for 10^12 rows:

* the zone dimension (small by design — the reference holds the whole
  planet's zones in one process) is compiled into a **per-cell candidate
  index** on the driver and broadcast to executors once;
* the fact side runs ONE narrow ``mapInPandas`` pass — scan → Arrow
  batch → vectorized numpy kernel → sink. No shuffle at all, so
  megacity-cell skew cannot produce a hot reducer on this path, and
  throughput scales linearly with executors (the north-rule scaling
  criterion);
* cells fully covered by a zone are flagged FULL at index-build time, so
  interior points skip the geometry test entirely — only boundary-cell
  points pay for exact PIP (the dominant cost saver at scale: interior
  cells vastly outnumber boundary cells at fine resolutions);
* points covered by no zone optionally fall back to kNN on zone
  centroids (nearest-zone lookup).

The per-zone choice mirrors build_hierarchy: smallest zone_type wins,
tie-broken by (area, zone_id) — deterministic under any partitioning.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from cosmospark import cells, geom
from cosmospark.ztypes import TYPE_RANK

DEFAULT_RESOLUTIONS = (4, 7, 9)
DEFAULT_TILE_Z = 12
INDEX_MAX_CELLS = 64  # finer zone indexing than the self-join: more FULL cells


# ---------------------------------------------------------------------------
# Zone index (driver-built, broadcast)


class ZoneIndex:
    """Per-(res, cell) candidate lists + packed geometries, CSR-encoded
    per resolution for vectorized numpy lookup inside Arrow batches."""

    def __init__(self, zone_rows: list[dict], max_cells: int = INDEX_MAX_CELLS):
        self.geoms: dict[int, list] = {}
        self.rank: dict[int, int] = {}
        self.area: dict[int, float] = {}
        cent_ids, cent_x, cent_y = [], [], []
        buckets: dict[tuple[int, int], list[tuple[int, bool]]] = {}

        for row in zone_rows:
            zid = int(row["id"])
            rings = geom.rows_to_rings(row["rings"]) if row["rings"] else None
            if rings is None:
                continue
            self.geoms[zid] = rings
            rk = TYPE_RANK.get(row.get("zone_type"), len(TYPE_RANK))
            self.rank[zid] = rk
            a = geom.area(rings)
            self.area[zid] = a
            c = geom.centroid(rings)
            if c is not None:
                cent_ids.append(zid)
                cent_x.append(c[0])
                cent_y.append(c[1])
            minx, miny, maxx, maxy = geom.bbox(rings)
            res = cells.fit_res(minx, miny, maxx, maxy, max_cells)
            for cell in cells.cells_for_bbox(minx, miny, maxx, maxy, res):
                rect = cells.cell_bounds(int(cell), res)
                # cell rect disjoint from bbox already excluded by cover;
                # FULL = the whole cell is inside the zone → skip PIP
                full = geom.bbox_covered_by(rect, rings)
                buckets.setdefault((res, int(cell)), []).append((zid, full))

        # dense rank/area lookup arrays (vectorized candidate scoring)
        self._zid_sorted = np.array(sorted(self.rank), dtype=np.int64)
        self._rank_arr = np.array([self.rank[z] for z in self._zid_sorted], dtype=np.int64)
        self._area_arr = np.array([self.area[z] for z in self._zid_sorted], dtype=np.float64)

        self.centroid_ids = np.array(cent_ids, dtype=np.int64)
        self.centroid_x = np.array(cent_x, dtype=np.float64)
        self.centroid_y = np.array(cent_y, dtype=np.float64)

        # CSR per resolution
        self.res_list: list[int] = sorted({r for (r, _) in buckets})
        self.csr: dict[int, tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]] = {}
        for res in self.res_list:
            items = sorted((c, v) for (r, c), v in buckets.items() if r == res)
            cell_ids = np.array([c for c, _ in items], dtype=np.int64)
            offs = np.zeros(len(items) + 1, dtype=np.int64)
            zids, fulls = [], []
            for i, (_, v) in enumerate(items):
                offs[i + 1] = offs[i] + len(v)
                for zid, full in v:
                    zids.append(zid)
                    fulls.append(full)
            self.csr[res] = (
                cell_ids,
                offs,
                np.array(zids, dtype=np.int64),
                np.array(fulls, dtype=bool),
            )

    # ---- batch kernels ----

    def candidates(self, lon: np.ndarray, lat: np.ndarray):
        """→ (pt_idx, zone_id, full) candidate triples for a point batch."""
        n = len(lon)
        if not self.res_list:
            return (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, bool))
        finest = max(self.res_list)
        base = cells.cell_encode(lon, lat, finest)
        pts_all, zs_all, fl_all = [], [], []
        for res in self.res_list:
            pc = base >> (2 * (finest - res))
            cell_ids, offs, zids, fulls = self.csr[res]
            pos = np.searchsorted(cell_ids, pc)
            pos_c = np.clip(pos, 0, len(cell_ids) - 1)
            hit = (len(cell_ids) > 0) & (cell_ids[pos_c] == pc)
            hit_idx = np.nonzero(hit)[0]
            if len(hit_idx) == 0:
                continue
            starts = offs[pos_c[hit_idx]]
            ends = offs[pos_c[hit_idx] + 1]
            counts = ends - starts
            pts = np.repeat(hit_idx, counts)
            # vectorized CSR range expansion (no per-range python loop)
            total = int(counts.sum())
            if total == 0:
                continue
            bases = np.zeros(len(counts), dtype=np.int64)
            np.cumsum(counts[:-1], out=bases[1:])
            flat = np.arange(total, dtype=np.int64) - np.repeat(bases, counts) + np.repeat(starts, counts)
            pts_all.append(pts)
            zs_all.append(zids[flat])
            fl_all.append(fulls[flat])
        if not pts_all:
            return (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, bool))
        return np.concatenate(pts_all), np.concatenate(zs_all), np.concatenate(fl_all)

    def assign(self, lon: np.ndarray, lat: np.ndarray, knn_fallback: bool = False) -> np.ndarray:
        """→ zone_id per point (-1 = unassigned): candidate lookup, FULL
        short-circuit, per-zone vectorized PIP, min-(rank, area, id)."""
        n = len(lon)
        pts, zs, full = self.candidates(lon, lat)

        if len(pts):
            accept = full.copy()
            todo = np.nonzero(~full)[0]
            if len(todo):
                order = np.argsort(zs[todo], kind="stable")
                todo = todo[order]
                bz = zs[todo]
                bounds = np.nonzero(np.diff(bz))[0] + 1
                for seg in np.split(np.arange(len(todo)), bounds):
                    if len(seg) == 0:
                        continue
                    zid = int(bz[seg[0]])
                    rows = todo[seg]
                    p = pts[rows]
                    ok = geom.pip_covers(lon[p], lat[p], self.geoms[zid])
                    accept[rows[ok]] = True
            pts, zs = pts[accept], zs[accept]

        out = np.full(n, -1, dtype=np.int64)
        if len(pts):
            pos = np.searchsorted(self._zid_sorted, zs)
            ranks = self._rank_arr[pos]
            areas = self._area_arr[pos]
            order = np.lexsort((zs, areas, ranks, pts))
            pts_o = pts[order]
            first = np.ones(len(pts_o), dtype=bool)
            first[1:] = pts_o[1:] != pts_o[:-1]
            out[pts_o[first]] = zs[order][first]

        if knn_fallback and (out == -1).any() and len(self.centroid_ids):
            miss = np.nonzero(out == -1)[0]
            # brute-force nearest centroid (zone dim is broadcast-scale;
            # the scale path would pre-bucket centroids by coarse cell)
            d2 = (lon[miss, None] - self.centroid_x[None, :]) ** 2 + (
                lat[miss, None] - self.centroid_y[None, :]
            ) ** 2
            out[miss] = self.centroid_ids[np.argmin(d2, axis=1)]
        return out


def build_zone_index(zones: DataFrame, max_cells: int = INDEX_MAX_CELLS) -> ZoneIndex:
    rows = [r.asDict(recursive=True) for r in zones.select("id", "zone_type", "rings").collect()]
    return ZoneIndex(rows, max_cells)


# ---------------------------------------------------------------------------
# Fact-side jobs


def encode_points(
    df: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    resolutions: tuple[int, ...] = DEFAULT_RESOLUTIONS,
    tile_z: int = DEFAULT_TILE_Z,
) -> DataFrame:
    """Add cell_r{res} (multi-resolution quadkey) + tile_id columns in one
    narrow Arrow pass (no shuffle). Finest res is encoded once; coarser
    ids are derived by prefix shifts (bijective prefix scheme)."""
    res_sorted = sorted(resolutions)
    finest = res_sorted[-1]
    out_fields = df.schema.fields + [
        T.StructField(f"cell_r{r}", T.LongType()) for r in res_sorted
    ] + [T.StructField("tile_id", T.LongType())]
    out_schema = T.StructType(out_fields)

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lon = pdf[lon_col].to_numpy(dtype=np.float64)
            lat = pdf[lat_col].to_numpy(dtype=np.float64)
            base = cells.cell_encode(lon, lat, finest)
            for r in res_sorted:
                pdf[f"cell_r{r}"] = base >> (2 * (finest - r))
            pdf["tile_id"] = cells.tile_encode(lon, lat, tile_z)
            yield pdf

    return df.mapInPandas(_encode, out_schema)


def assign_zones(
    points: DataFrame,
    zones: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    knn_fallback: bool = False,
    index_max_cells: int = INDEX_MAX_CELLS,
) -> DataFrame:
    """points + zone_id (long, -1 if unassigned and no kNN fallback).

    One broadcast + one narrow mapInPandas: the scalable path for the
    10^12-row fact table."""
    spark = points.sparkSession
    index = build_zone_index(zones, index_max_cells)
    bc = spark.sparkContext.broadcast(index)

    out_schema = T.StructType(points.schema.fields + [T.StructField("zone_id", T.LongType())])

    def _assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = bc.value
        for pdf in batches:
            lon = pdf[lon_col].to_numpy(dtype=np.float64)
            lat = pdf[lat_col].to_numpy(dtype=np.float64)
            pdf["zone_id"] = idx.assign(lon, lat, knn_fallback=knn_fallback)
            yield pdf

    return points.mapInPandas(_assign, out_schema)


# zoom level of a zone's tile pyramid, by zone type (coarse types → coarse
# tiles); the image's tile within its enclosing zone's pyramid
ZONE_TILE_Z = {
    "country": 5,
    "country_region": 6,
    "state": 7,
    "state_district": 9,
    "city": 11,
    "city_district": 12,
    "suburb": 13,
    "non_administrative": 12,
}


def encode_and_assign(
    points: DataFrame,
    zones: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    resolutions: tuple[int, ...] = DEFAULT_RESOLUTIONS,
    tile_z: int = DEFAULT_TILE_Z,
    knn_fallback: bool = False,
    index_max_cells: int = INDEX_MAX_CELLS,
) -> DataFrame:
    """Fused cell/tile encode + zone assignment in ONE mapInPandas pass.

    Chaining encode_points → assign_zones costs two Arrow round trips;
    at 10^12 rows the python-exchange is the dominant cost on this
    all-narrow path, so the fused variant halves it. Semantics identical
    to encode_points(...) then assign_zones(...)."""
    spark = points.sparkSession
    index = build_zone_index(zones, index_max_cells)
    bc = spark.sparkContext.broadcast(index)
    res_sorted = sorted(resolutions)
    finest = res_sorted[-1]

    out_fields = list(points.schema.fields)
    out_fields += [T.StructField(f"cell_r{r}", T.LongType()) for r in res_sorted]
    out_fields += [T.StructField("tile_id", T.LongType()), T.StructField("zone_id", T.LongType())]
    out_schema = T.StructType(out_fields)

    def _fused(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = bc.value
        for pdf in batches:
            lon = pdf[lon_col].to_numpy(dtype=np.float64)
            lat = pdf[lat_col].to_numpy(dtype=np.float64)
            base = cells.cell_encode(lon, lat, finest)
            for r in res_sorted:
                pdf[f"cell_r{r}"] = base >> (2 * (finest - r))
            pdf["tile_id"] = cells.tile_encode(lon, lat, tile_z)
            pdf["zone_id"] = idx.assign(lon, lat, knn_fallback=knn_fallback)
            yield pdf

    return points.mapInPandas(_fused, out_schema)


def assign_images(
    images: DataFrame,
    zones: DataFrame,
    resolutions: tuple[int, ...] = DEFAULT_RESOLUTIONS,
    tile_z: int = DEFAULT_TILE_Z,
    knn_fallback: bool = True,
) -> DataFrame:
    """The flagship fact job: encode cells/tiles, assign zones, and add
    the enclosing zone's pyramid tile (zone_tile_id) + zone metadata."""
    assigned = encode_and_assign(
        images, zones, resolutions=resolutions, tile_z=tile_z, knn_fallback=knn_fallback
    )

    zmeta = zones.select(
        F.col("id").alias("zone_id"),
        F.col("zone_type").alias("zone_type"),
        F.col("parent").alias("parent_zone_id"),
    )
    out = assigned.join(F.broadcast(zmeta), "zone_id", "left")

    zexpr = F.lit(None).cast("int")
    for t, z in ZONE_TILE_Z.items():
        zexpr = F.when(F.col("zone_type") == t, F.lit(z)).otherwise(zexpr)
    # the pyramid zoom is clamped to the image tile zoom: zone_tile_id is
    # derived from tile_id by ancestor shift, and a shift by a negative
    # amount (e.g. suburb z13 > default tile_z 12) is undefined — Spark
    # masks it to 63 and every suburb image would get a bogus tile
    out = out.withColumn(
        "_ztz", F.least(F.coalesce(zexpr, F.lit(tile_z)), F.lit(tile_z))
    )

    # re-derive the pyramid tile from the image's own tile by zoom shift:
    # tile (z,x,y) → ancestor at z' = (z', x >> (z-z'), y >> (z-z'))
    mask = (1 << 29) - 1
    out = out.withColumn(
        "zone_tile_id",
        F.expr(
            f"shiftleft(cast(_ztz as bigint), 58) | "
            f"shiftleft(shiftright(shiftright(tile_id, 29) & {mask}, {tile_z} - _ztz), 29) | "
            f"shiftright(tile_id & {mask}, {tile_z} - _ztz)"
        ),
    ).drop("_ztz")
    return out


def write_assignments(assigned: DataFrame, path: str, prefix_res: int = 4) -> dict:
    """Write the assignment fact table partitioned by coarse cell prefix
    (hive layout ``cell_prefix=<r4-cell>/``), with a snapshot manifest.

    The prefix scheme makes downstream spatial reads partition-prunable:
    any bbox query maps to a set of r4 prefixes, and Catalyst prunes the
    rest of the 10^12-row table at planning time. Manifest carries
    per-partition row counts (lineage, north-rule requirement).
    """
    import json as _json
    import os as _os

    col = f"cell_r{prefix_res}"
    if col not in assigned.columns:
        raise ValueError(f"{col} column required (run encode_points first)")
    (
        assigned.withColumn("cell_prefix", F.col(col))
        .write.mode("overwrite")
        .partitionBy("cell_prefix")
        .parquet(path)
    )
    spark = assigned.sparkSession
    counts = {
        str(r["cell_prefix"]): r["n"]
        for r in spark.read.parquet(path)
        .groupBy("cell_prefix")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    manifest = {
        "prefix_res": prefix_res,
        "n_rows": sum(counts.values()),
        "n_partitions": len(counts),
        "partition_rows": counts,
    }
    with open(_os.path.join(path, "_ASSIGN_MANIFEST.json"), "w") as fh:
        _json.dump(manifest, fh, indent=1)
    return manifest


# ---------------------------------------------------------------------------
# Hierarchical rollup + skew tooling


def salted_count(df: DataFrame, keys: list[str], n_salt: int = 16, salt_col: str | None = None) -> DataFrame:
    """Two-phase skew-proof count: groupBy(keys + salt) partial, then
    groupBy(keys) final. Catalyst's partial aggregation usually makes
    this implicit; the explicit salt guards pathological single-key skew
    (megacity cells) even under non-combinable downstream aggs."""
    if salt_col is not None:
        salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salt))
    else:
        salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salt))
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(F.count("*").alias("_c"))
    return partial.groupBy(*keys).agg(F.sum("_c").alias("n"))


def rollup_cells(assigned: DataFrame, resolutions: tuple[int, ...] = DEFAULT_RESOLUTIONS) -> DataFrame:
    """Hierarchical (cell, zone_type) rollup rebuilding the ZonesTree
    counts: aggregate ONCE at the finest resolution, then derive each
    coarser level from the previous by prefix shift — each step reduces
    an already-aggregated table, never rescanning the fact table."""
    res_sorted = sorted(resolutions)
    finest = res_sorted[-1]
    # cached: the finest-level aggregate is re-read by every coarser
    # reduce AND by the final union — without it the fact-table scan
    # re-executes per resolution level
    base = (
        assigned.groupBy(F.col(f"cell_r{finest}").alias("cell"), "zone_type")
        .agg(F.count("*").alias("n"))
        .withColumn("res", F.lit(finest))
        .cache()
    )
    out = base
    prev = base
    for coarser in reversed(res_sorted[:-1]):
        prev = (
            prev.withColumn("cell", F.shiftright(F.col("cell"), 2 * (finest - coarser)))
            .groupBy("cell", "zone_type")
            .agg(F.sum("n").alias("n"))
            .withColumn("res", F.lit(coarser))
        )
        finest = coarser
        out = out.unionByName(prev)
    return out
