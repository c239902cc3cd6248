"""Zone hierarchy construction as DataFrame jobs.

Reimplements (Spark-first, not a port):

* ``find_inclusions`` — the containment spatial self-join of
  src/hierarchy_builder.rs:76-95: for every zone, the set of zones that
  *cover* it (GEOS covers semantics, src/zone_ext.rs:236-277).
  The reference's R-tree bbox prefilter becomes a **hierarchical quadkey
  cell equi-join**: each zone is indexed at its adaptive resolution
  (coarse for countries, fine for suburbs); candidate pairs are produced
  by an equi-join on (res, cell) — Catalyst plans it as a hash join — and
  refined by (1) a JVM-side bbox-containment predicate and (2) the exact
  numpy ``covers`` kernel over Arrow batches.

* ``build_hierarchy`` — parent assignment of src/hierarchy_builder.rs:107-131:
  parent = the containing admin zone with the smallest ZoneType
  (``min_by_key(zone_type)``) subject to ``can_be_child_of``
  (src/zone_ext.rs:360-363). The Rust tie-break ("first minimum in
  inclusion order") is nondeterministic under Spark partition order, so we
  impose an explicit deterministic tie-break: (type_rank, area, parent_id).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from cosmospark import cells, geom
from cosmospark.ztypes import BBOX_TYPE, TYPE_RANK

MAX_CELLS_PER_ZONE = 16

_rank_pairs = sorted(TYPE_RANK.items())


def type_rank_col(col):
    """zone_type string → ordinal rank (NULL stays NULL)."""
    expr = F.lit(None).cast("int")
    for name, rank in _rank_pairs:
        expr = F.when(col == name, F.lit(rank)).otherwise(expr)
    return expr


def with_bbox_and_area(zones: DataFrame) -> DataFrame:
    """Derive bbox + area + centroid from the rings column (one batch
    pass). The centroid backs the reference's center fallback chain —
    admin_centre node, else label node, else polygon centroid with NaN
    guard (src/zone_ext.rs:186-210): explicit centers win via coalesce."""

    schema = T.StructType(
        [
            T.StructField("bbox", BBOX_TYPE),
            T.StructField("area", T.DoubleType()),
            T.StructField(
                "centroid",
                T.StructType(
                    [T.StructField("lon", T.DoubleType()), T.StructField("lat", T.DoubleType())]
                ),
            ),
        ]
    )

    @F.pandas_udf(schema)
    def _bbox_area(rings_s: pd.Series) -> pd.DataFrame:
        out = []
        for rows in rings_s:
            if rows is None or len(rows) == 0:
                out.append({"bbox": None, "area": None, "centroid": None})
                continue
            rr = geom.rows_to_rings(rows)
            minx, miny, maxx, maxy = geom.bbox(rr)
            c = geom.centroid(rr)
            out.append(
                {
                    "bbox": {"minx": minx, "miny": miny, "maxx": maxx, "maxy": maxy},
                    "area": geom.area(rr),
                    "centroid": {"lon": c[0], "lat": c[1]} if c else None,
                }
            )
        return pd.DataFrame(out)

    z = zones.withColumn("_ba", _bbox_area(F.col("rings")))
    bbox_col = (
        F.coalesce(F.col("bbox"), F.col("_ba.bbox")) if "bbox" in zones.columns else F.col("_ba.bbox")
    )
    z = z.withColumn("bbox", bbox_col).withColumn("area", F.col("_ba.area"))
    center_col = (
        F.coalesce(F.col("center"), F.col("_ba.centroid"))
        if "center" in zones.columns
        else F.col("_ba.centroid")
    )
    z = z.withColumn("center", center_col)
    return z.drop("_ba")


_CELLS_SCHEMA = T.ArrayType(
    T.StructType([T.StructField("res", T.IntegerType()), T.StructField("cell", T.LongType())])
)


@F.pandas_udf(_CELLS_SCHEMA)
def _own_cells(minx: pd.Series, miny: pd.Series, maxx: pd.Series, maxy: pd.Series) -> pd.Series:
    """Covering cells at each zone's adaptive resolution."""
    out = []
    for a, b, c, d in zip(minx, miny, maxx, maxy):
        if a is None or not np.isfinite(a):
            out.append([])
            continue
        res = cells.fit_res(a, b, c, d, MAX_CELLS_PER_ZONE)
        cc = cells.cells_for_bbox(a, b, c, d, res)
        out.append([{"res": res, "cell": int(v)} for v in cc])
    return pd.Series(out)


def zone_cell_index(zones: DataFrame) -> DataFrame:
    """(id, res, cell, own_res) — each zone's covering cells at its own
    adaptive resolution. This is the distributed analog of
    RTree::bulk_load (src/hierarchy_builder.rs:71)."""
    z = zones.select(
        "id",
        F.col("bbox.minx").alias("minx"),
        F.col("bbox.miny").alias("miny"),
        F.col("bbox.maxx").alias("maxx"),
        F.col("bbox.maxy").alias("maxy"),
    ).withColumn("rc", _own_cells("minx", "miny", "maxx", "maxy"))
    return (
        z.select("id", F.explode("rc").alias("e"))
        .select("id", F.col("e.res").alias("res"), F.col("e.cell").alias("cell"))
    )


def find_inclusions(zones: DataFrame, refine: bool = True) -> DataFrame:
    """Containment self-join → edge table (child, parent): parent covers child.

    Plan shape: zones → cell index (narrow) → equi-join on (res, cell)
    (hash join; both sides pre-filtered and column-pruned) → distinct
    candidate pairs → bbox-containment filter (JVM, whole-stage codegen)
    → exact covers refinement (Arrow batch, numpy kernel).
    """
    zones = _ensure_bbox(zones)

    parent_cells = zone_cell_index(zones).withColumnRenamed("id", "parent")

    # distinct parent resolutions (small driver-side list: ≤ MAX_RES values)
    res_list = [r.res for r in parent_cells.select("res").distinct().collect()]

    # child emits its bbox's covering-cell *ancestors* at every parent
    # resolution ≤ its own (a container's bbox is ≥ the child's, so its
    # adaptive res is ≤ the child's — finer parents cannot cover it)
    @F.pandas_udf(_CELLS_SCHEMA)
    def _anc_cells(minx: pd.Series, miny: pd.Series, maxx: pd.Series, maxy: pd.Series) -> pd.Series:
        out = []
        for a, b, c, d in zip(minx, miny, maxx, maxy):
            if a is None or not np.isfinite(a):
                out.append([])
                continue
            own = cells.fit_res(a, b, c, d, MAX_CELLS_PER_ZONE)
            acc = []
            for res in res_list:
                if res <= own:
                    for v in cells.cells_for_bbox(a, b, c, d, res):
                        acc.append({"res": res, "cell": int(v)})
            out.append(acc)
        return pd.Series(out)

    child_cells = (
        zones.select(
            F.col("id").alias("child"),
            F.col("bbox.minx").alias("minx"),
            F.col("bbox.miny").alias("miny"),
            F.col("bbox.maxx").alias("maxx"),
            F.col("bbox.maxy").alias("maxy"),
        )
        .withColumn("rc", _anc_cells("minx", "miny", "maxx", "maxy"))
        .select("child", F.explode("rc").alias("e"))
        .select("child", F.col("e.res").alias("res"), F.col("e.cell").alias("cell"))
    )

    pairs = (
        child_cells.join(parent_cells, ["res", "cell"])
        .filter(F.col("child") != F.col("parent"))
        .select("child", "parent")
        .distinct()
    )

    # bbox containment prefilter (JVM-side, pushed before geometry work)
    cb = zones.select(F.col("id").alias("child"), F.col("bbox").alias("c_bbox"))
    pb = zones.select(F.col("id").alias("parent"), F.col("bbox").alias("p_bbox"))
    pairs = (
        pairs.join(F.broadcast(cb), "child")
        .join(F.broadcast(pb), "parent")
        .filter(
            (F.col("p_bbox.minx") <= F.col("c_bbox.minx"))
            & (F.col("p_bbox.miny") <= F.col("c_bbox.miny"))
            & (F.col("p_bbox.maxx") >= F.col("c_bbox.maxx"))
            & (F.col("p_bbox.maxy") >= F.col("c_bbox.maxy"))
        )
        .select("child", "parent")
    )

    if not refine:
        return pairs

    # exact covers refinement over Arrow batches. NOTE: no broadcast hint
    # on the geometry joins — detailed planet geometry can be tens of GB
    # (10^6 zones × 10^3 vertices); AQE converts to broadcast-hash when
    # the side is actually small, and shuffles on id otherwise.
    cg = zones.select(F.col("id").alias("child"), F.col("rings").alias("c_rings"))
    pg = zones.select(F.col("id").alias("parent"), F.col("rings").alias("p_rings"))
    with_geo = pairs.join(cg, "child").join(pg, "parent")

    out_schema = T.StructType(
        [T.StructField("child", T.LongType()), T.StructField("parent", T.LongType())]
    )

    def _refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keep_child, keep_parent = [], []
            for row in pdf.itertuples(index=False):
                if row.c_rings is None or row.p_rings is None or len(row.p_rings) == 0:
                    continue
                if len(row.c_rings) == 0:
                    continue
                pr = geom.rows_to_rings(row.p_rings)
                cr = geom.rows_to_rings(row.c_rings)
                if geom.covers(pr, cr):
                    keep_child.append(row.child)
                    keep_parent.append(row.parent)
            yield pd.DataFrame({"child": keep_child, "parent": keep_parent})

    return with_geo.mapInPandas(_refine, out_schema)


def _ensure_bbox(zones: DataFrame) -> DataFrame:
    if "area" not in zones.columns:
        zones = with_bbox_and_area(zones)
    return zones


def build_hierarchy(zones: DataFrame, inclusions: DataFrame) -> DataFrame:
    """Assign each zone its parent: smallest-ZoneType containing admin zone.

    can_be_child_of (src/zone_ext.rs:360-363):
      parent.is_admin() AND (NOT child.is_admin() OR child.type < parent.type)
    is_admin = zone_type IS NOT NULL AND zone_type != 'non_administrative'
    (cosmogony/src/zone.rs:137-139).

    Selection = min_by(zone_type) (src/hierarchy_builder.rs:127) with the
    deterministic tie-break (type_rank, area, parent_id).
    """
    zones = _ensure_bbox(zones)

    child_side = zones.select(
        F.col("id").alias("child"),
        type_rank_col(F.col("zone_type")).alias("c_rank"),
        (F.col("zone_type").isNotNull() & (F.col("zone_type") != "non_administrative")).alias(
            "c_admin"
        ),
    )
    parent_side = zones.select(
        F.col("id").alias("parent"),
        type_rank_col(F.col("zone_type")).alias("p_rank"),
        (F.col("zone_type").isNotNull() & (F.col("zone_type") != "non_administrative")).alias(
            "p_admin"
        ),
        F.col("area").alias("p_area"),
    )

    cand = (
        inclusions.join(F.broadcast(child_side), "child")
        .join(F.broadcast(parent_side), "parent")
        .filter(F.col("p_admin") & (~F.col("c_admin") | (F.col("c_rank") < F.col("p_rank"))))
    )

    parents = cand.groupBy("child").agg(
        F.min_by(
            "parent", F.struct(F.col("p_rank"), F.col("p_area"), F.col("parent"))
        ).alias("parent")
    )

    return zones.join(
        parents.withColumnRenamed("child", "id"), "id", "left"
    )
