"""Raw-OSM ingestion: dependency closure + boundary ring assembly.

Covers the reference's PBF-side operators for when zone input arrives as
raw OSM object tables instead of pre-assembled geometries:

* S1 dependency closure (src/lib.rs:243-249 ``get_objs_and_deps``): the
  reference pulls matching relations **plus their transitive members**
  (ways, then nodes) while decoding. Relationally this is two semi-join
  hops: relations → member ways → way nodes.
* P1 boundary assembly (src/zone_ext.rs:183, external crate
  osm_boundaries_utils ``build_boundary``): stitch a relation's member
  ways into closed rings by endpoint matching (ways may be reversed /
  arbitrarily ordered), outer/inner roles → exterior/hole rings.

Spark shape: the closure is two equi-joins (ids are uniform keys — hash
joins, broadcast when the relation set is small); stitching groups way
segments per relation via ``applyInPandas`` (per-relation work is tiny:
admin boundaries have tens-to-thousands of ways).

Input tables:
  relations(relation_id long, tags map)            — filtered by S2
  rel_members(relation_id long, way_id long, role string)
  ways(way_id long, node_ids array<long>)
  nodes(node_id long, lon double, lat double[, tags map])
  rel_node_members(relation_id long, node_id long, role string[, seq int])
      — node members of relations (roles ``label`` / ``admin_centre``),
      used by the P1 member extraction (src/zone_ext.rs:166-210)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from cosmospark.ztypes import RINGS_TYPE


def dependency_closure(
    relations: DataFrame, rel_members: DataFrame, ways: DataFrame, nodes: DataFrame
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Restrict members/ways/nodes to those reachable from ``relations``
    (the get_objs_and_deps transitive closure as two semi-join hops)."""
    rel_ids = relations.select("relation_id").distinct()
    members = rel_members.join(rel_ids, "relation_id", "left_semi")
    kept_ways = ways.join(members.select("way_id").distinct(), "way_id", "left_semi")
    kept_nodes = nodes.join(
        kept_ways.select(F.explode("node_ids").alias("node_id")).distinct(),
        "node_id",
        "left_semi",
    )
    return members, kept_ways, kept_nodes


def _with_node_tags(nodes: DataFrame) -> DataFrame:
    if "tags" not in nodes.columns:
        nodes = nodes.withColumn("tags", F.expr("cast(map() as map<string,string>)"))
    return nodes


NODE_MEMBER_TYPE = T.StructType(
    [
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
    ]
)


def member_nodes(rel_node_members: DataFrame, nodes: DataFrame) -> DataFrame:
    """(relation_id, label_node, admin_centre_node) — each relation's
    role=``label`` / role=``admin_centre`` member node with coordinates
    and tags (src/zone_ext.rs:166-210). The reference takes the *first*
    member in relation order (``refs.iter().find``); member order is
    carried by the optional ``seq`` column (defaults to node_id — admin
    relations carry at most one node per role in practice)."""
    nm = rel_node_members.filter(F.col("role").isin("label", "admin_centre"))
    if "seq" not in nm.columns:
        nm = nm.withColumn("seq", F.col("node_id"))
    j = nm.join(_with_node_tags(nodes), "node_id").select(
        "relation_id", "role", "seq", F.struct("lon", "lat", "tags").alias("node")
    )

    def _pick(role: str, out: str) -> DataFrame:
        return (
            j.filter(F.col("role") == role)
            .groupBy("relation_id")
            .agg(F.min_by("node", F.col("seq")).alias(out))
        )

    labels = _pick("label", "label_node")
    centres = _pick("admin_centre", "admin_centre_node")
    return labels.join(centres, "relation_id", "full")


def _stitch(segments: list[tuple[list[int], np.ndarray, np.ndarray]]):
    """Stitch way segments (node-id list + coords) into closed rings by
    endpoint matching; ways may need reversal. Returns list of
    (node_ids_ring, xs, ys); unclosable leftovers are dropped (the
    reference's build_boundary also skips broken rings)."""
    segs = [
        (list(nids), np.asarray(xs, float), np.asarray(ys, float)) for nids, xs, ys in segments
    ]
    rings = []
    while segs:
        nids, xs, ys = segs.pop(0)
        nids, xs, ys = list(nids), list(xs), list(ys)
        progress = True
        while nids[0] != nids[-1] and progress:
            progress = False
            for i, (n2, x2, y2) in enumerate(segs):
                if n2[0] == nids[-1]:
                    nids += n2[1:]
                    xs += list(x2[1:])
                    ys += list(y2[1:])
                elif n2[-1] == nids[-1]:
                    nids += n2[-2::-1]
                    xs += list(x2[-2::-1])
                    ys += list(y2[-2::-1])
                elif n2[-1] == nids[0]:
                    nids = n2[:-1] + nids
                    xs = list(x2[:-1]) + xs
                    ys = list(y2[:-1]) + ys
                elif n2[0] == nids[0]:
                    nids = n2[::-1][:-1] + nids
                    xs = list(x2[::-1][:-1]) + xs
                    ys = list(y2[::-1][:-1]) + ys
                else:
                    continue
                segs.pop(i)
                progress = True
                break
        if len(nids) >= 4 and nids[0] == nids[-1]:
            rings.append((nids[:-1], np.array(xs[:-1]), np.array(ys[:-1])))
    return rings


def assemble_boundaries(
    relations: DataFrame, rel_members: DataFrame, ways: DataFrame, nodes: DataFrame
) -> DataFrame:
    """(relation_id, rings) — each admin relation's member ways stitched
    into a multipolygon. role='outer' (or empty) → exterior rings,
    role='inner' → holes attached to the enclosing exterior."""
    members, kept_ways, kept_nodes = dependency_closure(relations, rel_members, ways, nodes)

    # way → ordered coordinate arrays: explode node refs with position,
    # join coords, re-collect in order (all JVM-side)
    way_pts = (
        kept_ways.select("way_id", F.posexplode("node_ids").alias("pos", "node_id"))
        .join(kept_nodes, "node_id")
        .groupBy("way_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "node_id", "lon", "lat"))).alias("pts")
        )
    )
    seg = members.join(way_pts, "way_id").select(
        "relation_id",
        F.coalesce(F.col("role"), F.lit("outer")).alias("role"),
        F.expr("transform(pts, p -> p.node_id)").alias("nids"),
        F.expr("transform(pts, p -> p.lon)").alias("xs"),
        F.expr("transform(pts, p -> p.lat)").alias("ys"),
    )

    out_schema = T.StructType(
        [T.StructField("relation_id", T.LongType()), T.StructField("rings", RINGS_TYPE)]
    )

    def _assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from cosmospark import geom

        outer = [
            (list(r.nids), r.xs, r.ys)
            for r in pdf.itertuples(index=False)
            if r.role in ("outer", "")
        ]
        inner = [
            (list(r.nids), r.xs, r.ys) for r in pdf.itertuples(index=False) if r.role == "inner"
        ]
        exteriors = _stitch(outer)
        holes = _stitch(inner)
        rings = []
        for poly_idx, (_, xs, ys) in enumerate(exteriors):
            rings.append((poly_idx, 0, xs, ys))
        # attach each hole to the first exterior that covers it
        for _, hxs, hys in holes:
            for poly_idx, (_, xs, ys) in enumerate(exteriors):
                if geom.pip_covers(hxs[:1], hys[:1], [(0, 0, xs, ys)])[0]:
                    nring = 1 + sum(1 for (p, r, *_rest) in rings if p == poly_idx and r > 0)
                    rings.append((poly_idx, nring, hxs, hys))
                    break
        if not rings:
            return pd.DataFrame({"relation_id": pd.Series(dtype="int64"), "rings": []})
        return pd.DataFrame(
            {"relation_id": [int(key[0])], "rings": [geom.rings_to_rows(rings)]}
        )

    return seg.groupBy("relation_id").applyInPandas(_assemble, out_schema)
