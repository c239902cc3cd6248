"""Deterministic synthetic fixtures (no external data, fixed arithmetic).

* ``four_squares_zones`` — the reference's own hierarchy unit-test world
  (src/hierarchy_builder.rs:157-195).
* ``lux_world`` — a synthetic Luxembourg-like nested world whose count
  structure mirrors the reference's golden integration test
  (tests/cosmogony_test.rs:134-150): 1 country (level 2) ⊃ 13 cantons
  (level 6) ⊃ 105 communes (level 8) ⊃ 79 localities (level 9) + 2
  level-10 rows that must be dropped as untyped.
* ``gen_images`` — the web-scale fact table (FIXTURES.md F4) with
  numpy-codec'd pixel payloads and skew-concentrated coordinates.
"""

from __future__ import annotations

import numpy as np

from cosmospark import codecs, geom

# World placement: a 13x10-degree box roughly at Luxembourg's lon/lat
LUX_X0, LUX_Y0 = 2.0, 44.0
LUX_W, LUX_H = 13.0, 10.0


def _zone(zid, osm_id, level, ztype, name, rect, tags=None, center_tags=None, generated=False):
    if rect is not None:
        rect = tuple(float(v) for v in rect)
    rings = geom.make_rect(*rect) if rect is not None else None
    minx, miny, maxx, maxy = rect if rect is not None else (None,) * 4
    c = geom.centroid(rings) if rings is not None else None
    return {
        "id": zid,
        "osm_id": osm_id,
        "admin_level": level,
        "zone_type": ztype,
        "name": name,
        "tags": tags or {},
        "center_tags": center_tags or {},
        "center": {"lon": c[0], "lat": c[1]} if c else None,
        "rings": geom.rings_to_rows(rings) if rings is not None else None,
        "bbox": {"minx": minx, "miny": miny, "maxx": maxx, "maxy": maxy}
        if rect is not None
        else None,
        "is_generated": generated,
    }


def four_squares_zones(types=("country", "state", "city", "state")):
    """z0 (0,0)-(10,10), z1 (1,1)-(9,9), z2 (2,2)-(8,8), z3 (0,0)-(10,5).

    ``types`` lets tests reproduce the reference's type-permutation
    variants (hierarchy_builder.rs:206-287)."""
    rects = [(0, 0, 10, 10), (1, 1, 9, 9), (2, 2, 8, 8), (0, 0, 10, 5)]
    return [
        _zone(i, f"relation:{100 + i}", None, t, f"z{i}", r)
        for i, (r, t) in enumerate(zip(rects, types))
    ]


def lux_world() -> list[dict]:
    """Nested rectangles with the Luxembourg golden count structure.

    Layout (all rectangles, so PIP/containment is DuckDB-expressible):
      country: (X0, Y0) + 13 x 10
      canton i (0..12): column strip [X0+i, X0+i+1) x [Y0, Y0+10)
      communes: each canton is split into 8 vertical sub-strips of
        height 10/8 (104) + 1 extra commune inside canton 0 = 105
      localities: 79 rects inside the first 79 communes
      2 level-10 rows (untyped → dropped by clean_untagged_zones)
    """
    zones: list[dict] = []
    nid = 0

    def nxt():
        nonlocal nid
        nid += 1
        return nid - 1

    country_rect = (LUX_X0, LUX_Y0, LUX_X0 + LUX_W, LUX_Y0 + LUX_H)
    zones.append(
        _zone(
            nxt(),
            "relation:2171347",
            2,
            None,
            "Lëtzebuerg",
            country_rect,
            tags={
                "ISO3166-1:alpha2": "LU",
                "boundary": "administrative",
                "admin_level": "2",
                "name:fr": "Luxembourg",
                "name:de": "Luxemburg",
            },
        )
    )

    commune_rects = []
    for i in range(13):
        cx0 = LUX_X0 + i
        canton_rect = (cx0, LUX_Y0, cx0 + 1.0, LUX_Y0 + LUX_H)
        zones.append(
            _zone(
                nxt(),
                f"relation:{3000 + i}",
                6,
                None,
                f"Canton {i}",
                canton_rect,
                tags={"boundary": "administrative", "admin_level": "6"},
            )
        )
        for j in range(8):
            ch = LUX_H / 8.0
            rect = (cx0, LUX_Y0 + j * ch, cx0 + 1.0, LUX_Y0 + (j + 1) * ch)
            commune_rects.append((i, j, rect))

    # the 105th commune: a small box strictly inside canton 0's first strip
    commune_rects.append((0, 8, (LUX_X0 + 0.1, LUX_Y0 + 0.1, LUX_X0 + 0.4, LUX_Y0 + 0.4)))

    for k, (i, j, rect) in enumerate(commune_rects):
        zones.append(
            _zone(
                nxt(),
                f"relation:{4000 + k}",
                8,
                None,
                f"Commune {i}-{j}",
                rect,
                tags={
                    "boundary": "administrative",
                    "admin_level": "8",
                    "addr:postcode": f"{7000 + k}",
                    **({"wikidata": f"Q{9000 + k}"} if k % 2 == 0 else {}),
                },
            )
        )

    # 79 localities inside the first 79 communes (strictly interior rects)
    for k in range(79):
        i, j, (a, b, c, d) = commune_rects[k]
        w, h = c - a, d - b
        rect = (a + 0.2 * w, b + 0.2 * h, a + 0.6 * w, b + 0.6 * h)
        zones.append(
            _zone(
                nxt(),
                f"relation:{5000 + k}",
                9,
                None,
                f"Locality {k}",
                rect,
                tags={"boundary": "administrative", "admin_level": "9"},
            )
        )

    # 2 level-10 rows: no typing rule for level 10 → zone_type NULL → dropped
    for k in range(2):
        i, j, (a, b, c, d) = commune_rects[k]
        w, h = c - a, d - b
        rect = (a + 0.7 * w, b + 0.7 * h, a + 0.8 * w, b + 0.8 * h)
        zones.append(
            _zone(
                nxt(),
                f"relation:{6000 + k}",
                10,
                None,
                f"Micro {k}",
                rect,
                tags={"boundary": "administrative", "admin_level": "10"},
            )
        )
    return zones


LUX_RULES_LEVELS = [
    # (country, admin_level, zone_type) — libpostal-style default map
    ("LU", "2", "country"),
    ("LU", "6", "state_district"),
    ("LU", "8", "city"),
    ("LU", "9", "suburb"),
]


def detailed_lux_zones(n_vertices: int = 2048) -> list[dict]:
    """The lux world with *detailed* boundaries: every commune/locality
    rectangle becomes an inscribed n-vertex ellipse polygon, mirroring
    real admin boundaries (which carry 10^3–10^6 vertices). The country
    and cantons stay rectangles so every point still finds a parent.

    Used by the detailed-PIP scaling bench: many-vertex rings make the
    exact PIP refinement compute-dense (cache-resident edge tiles)."""
    out = []
    for z in lux_world():
        lvl = z["admin_level"]
        ztype = {2: "country", 6: "state_district", 8: "city", 9: "suburb"}.get(lvl)
        if ztype is None:
            continue
        z = dict(z)
        z["zone_type"] = ztype
        if lvl in (8, 9):
            b = z["bbox"]
            cx = (b["minx"] + b["maxx"]) / 2.0
            cy = (b["miny"] + b["maxy"]) / 2.0
            rx = (b["maxx"] - b["minx"]) / 2.0 * 0.98
            ry = (b["maxy"] - b["miny"]) / 2.0 * 0.98
            th = np.linspace(0.0, 2.0 * np.pi, n_vertices, endpoint=False)
            xs = cx + rx * np.cos(th)
            ys = cy + ry * np.sin(th)
            z["rings"] = geom.rings_to_rows([(0, 0, xs, ys)])
            z["bbox"] = {
                "minx": float(xs.min()),
                "miny": float(ys.min()),
                "maxx": float(xs.max()),
                "maxy": float(ys.max()),
            }
            c = geom.centroid([(0, 0, xs, ys)])
            z["center"] = {"lon": c[0], "lat": c[1]} if c else None
        out.append(z)
    return out


# ---------------------------------------------------------------------------
# Raw-OSM form of the lux world (the reference's actual input shape)


def lux_osm_world() -> dict[str, list]:
    """The lux_world as raw OSM object tables — relations + member ways +
    nodes — for the raw-OSM front door (S1-S4 + P1 member extraction).

    Mirrors the reference input (src/lib.rs:247-249 object soup): every
    rectangle becomes a relation with 4 member ways (deterministically
    rotated, one reversed, exercising the ring stitcher), plus:

    * the country carries a role=``label`` member node whose ``name:br``
      + ``population`` tags must be merged or_insert (name:fr must NOT
      overwrite the relation's own, src/zone_ext.rs:166-181);
    * relation 4000 has BOTH admin_centre and label member nodes —
      center must come from admin_centre (src/zone_ext.rs:184-192);
    * relation 4001 has ONLY a label node — center falls back to it (the
      Gatineau case, tests/cosmogony_test.rs:287-311);
    * a nameless admin relation and a non-admin relation that must be
      filtered out (S2, src/lib.rs:31-42 + zone_ext.rs:126-135);
    * two place nodes (S3/S4): one city, one capital=yes (additional).

    Returns dict of row-lists: relations, rel_members, ways, nodes,
    rel_node_members (schemas per cosmospark.assembly docstring).
    """
    relations, rel_members, ways, nodes, rel_node_members = [], [], [], [], []
    next_way = [1]
    next_node = [1]

    def add_rect_relation(rel_id: int, rect, tags: dict):
        minx, miny, maxx, maxy = rect
        corners = [(minx, miny), (maxx, miny), (maxx, maxy), (minx, maxy)]
        nids = []
        for x, y in corners:
            nid = next_node[0]
            next_node[0] += 1
            nodes.append((nid, float(x), float(y), {}))
            nids.append(nid)
        relations.append((rel_id, tags))
        # 4 edge ways, rotated by rel_id, one reversed per relation
        for k in range(4):
            e = (k + rel_id) % 4
            a, b = nids[e], nids[(e + 1) % 4]
            wid = next_way[0]
            next_way[0] += 1
            seq = [a, b] if (rel_id + k) % 3 else [b, a]
            ways.append((wid, seq))
            rel_members.append((rel_id, wid, "outer"))

    def add_member_node(rel_id: int, role: str, lon: float, lat: float, tags: dict):
        nid = next_node[0]
        next_node[0] += 1
        nodes.append((nid, float(lon), float(lat), tags))
        rel_node_members.append((rel_id, nid, role))

    for z in lux_world():
        rel_id = int(z["osm_id"].split(":")[1])
        b = z["bbox"]
        tags = dict(z["tags"])
        tags["name"] = z["name"]
        add_rect_relation(rel_id, (b["minx"], b["miny"], b["maxx"], b["maxy"]), tags)

    # country label member: name:br/population merge (or_insert — the
    # relation's own name:fr must win over the node's)
    add_member_node(
        2171347,
        "label",
        LUX_X0 + 6.0,
        LUX_Y0 + 5.0,
        {"name:br": "Lussemburg", "population": "672050", "name:fr": "SHOULD_NOT_WIN"},
    )
    # relation 4000: admin_centre beats label for center
    add_member_node(4000, "admin_centre", LUX_X0 + 0.5, LUX_Y0 + 0.5, {"population": "12000"})
    add_member_node(4000, "label", LUX_X0 + 0.25, LUX_Y0 + 0.25, {})
    # relation 4001 (the Gatineau case): label node only
    add_member_node(
        4001, "label", LUX_X0 + 0.5, LUX_Y0 + 1.5, {"population": "291041", "name:fr": "Gatineau-fr"}
    )

    # filtered-out relations: nameless admin + non-admin boundary
    add_rect_relation(
        7000,
        (LUX_X0, LUX_Y0, LUX_X0 + 1, LUX_Y0 + 1),
        {"boundary": "administrative", "admin_level": "8"},
    )
    add_rect_relation(
        7001,
        (LUX_X0, LUX_Y0, LUX_X0 + 2, LUX_Y0 + 2),
        {"boundary": "political", "name": "not admin", "admin_level": "8"},
    )
    # place=suburb relation WITHOUT boundary=administrative/admin_level:
    # admitted by the reference's is_admin || place==suburb front door
    # (src/lib.rs:73) — must be extracted (it stays untyped downstream:
    # no admin_level → no rule → cleaned by P7, like the reference)
    add_rect_relation(
        7100,
        (LUX_X0 + 0.1, LUX_Y0 + 0.1, LUX_X0 + 0.4, LUX_Y0 + 0.4),
        {"place": "suburb", "name": "Suburb Relation"},
    )

    # standalone place nodes (S3/S4 input for the voronoi path)
    nodes.append(
        (next_node[0], LUX_X0 + 3.5, LUX_Y0 + 3.5, {"place": "city", "name": "Placeville"})
    )
    next_node[0] += 1
    nodes.append(
        (
            next_node[0],
            LUX_X0 + 6.5,
            LUX_Y0 + 5.5,
            {"place": "hamlet", "capital": "yes", "name": "Capital Hamlet"},
        )
    )
    next_node[0] += 1

    return {
        "relations": relations,
        "rel_members": rel_members,
        "ways": ways,
        "nodes": nodes,
        "rel_node_members": rel_node_members,
    }


# ---------------------------------------------------------------------------
# Image fact table


def gen_images(
    n: int,
    seed: int = 42,
    px: int = 16,
    skew: float = 0.7,
    plant_neardup_every: int = 0,
    colocate_neardups: bool = False,
) -> list[dict]:
    """Deterministic image rows inside the lux_world box.

    ``skew`` fraction of coordinates concentrate in 2 megacity communes
    (exercises salting / AQE skew handling). ``plant_neardup_every=k``
    makes every k-th image a lightly-perturbed copy of its predecessor
    (±2 on a few pixels) so phash near-dup detection has true positives
    to find (random-noise images are never within hamming distance).
    ``colocate_neardups`` additionally places each planted copy 0.001°
    east of its original (duplicate street imagery is same-location),
    giving zone-constrained dedup true positives; it overrides the
    coordinates AFTER the usual rng draws, so the random stream — and
    therefore every other row — is identical to the flag-off fixture."""
    rng = np.random.default_rng(seed)
    rows = []
    mega = [(LUX_X0 + 0.0, LUX_Y0 + 0.0, LUX_X0 + 1.0, LUX_Y0 + 1.25),
            (LUX_X0 + 6.0, LUX_Y0 + 5.0, LUX_X0 + 7.0, LUX_Y0 + 6.25)]
    prev_arr = None
    for i in range(n):
        if rng.random() < skew:
            m = mega[i % 2]
            lon = rng.uniform(m[0], m[2])
            lat = rng.uniform(m[1], m[3])
        else:
            lon = rng.uniform(LUX_X0, LUX_X0 + LUX_W)
            lat = rng.uniform(LUX_Y0, LUX_Y0 + LUX_H)
        arr = rng.integers(0, 256, size=(px, px, 3), dtype=np.uint8)
        if (
            plant_neardup_every
            and prev_arr is not None
            and i % plant_neardup_every == plant_neardup_every - 1
        ):
            arr = prev_arr.astype(np.int16)
            mask = rng.random(arr.shape) < 0.35
            arr = np.clip(arr + mask * rng.integers(-40, 41, arr.shape), 0, 255).astype(
                np.uint8
            )
            if colocate_neardups:
                lon, lat = prev_lon + 0.001, prev_lat
        prev_arr = arr
        prev_lon, prev_lat = lon, lat
        fmt = "raw" if i % 2 == 0 else "lossy"
        blob = codecs.encode(arr, fmt)
        rows.append(
            {
                "image_id": f"img_{i:012d}",
                "bytes": bytes(blob),
                "w": px,
                "h": px,
                "fmt": fmt,
                "caption": f"photo {i} near ({lon:.3f},{lat:.3f}) tagged c{i % 7}",
                "phash": int(codecs.phash64(arr)),
                "lon": float(lon),
                "lat": float(lat),
            }
        )
    return rows


# ---------------------------------------------------------------------------
# Planet-shaped soak world (r5, VERDICT r4 #4): a zone dimension BIG
# ENOUGH to naturally exceed assign.BROADCAST_BUDGET_BYTES (the
# reference world is 198 tiny rectangles; a detailed planet is tens of
# GB of geometry). Generated DISTRIBUTED and deterministically — the
# driver never holds the geometry, mirroring how a real zone dim would
# arrive from the PBF pipeline.


def planet_zone_grid(n_zones: int, cols: int = 125):
    """Grid geometry parameters shared by the generator and tests:
    (cols, rows, cell_w, cell_h, lat0). Zones tile a [-180,180) ×
    [lat0, -lat0) grid, one near-circular polygon per cell, radius
    0.4·cell — so every zone is disjoint and each grid cell's center
    belongs to exactly its own zone (assignment truth by construction)."""
    rows = (n_zones + cols - 1) // cols
    cell_w = 360.0 / cols
    lat_span = 120.0
    cell_h = lat_span / rows
    return cols, rows, cell_w, cell_h, -60.0


def planet_zone_center(zid: int, n_zones: int, cols: int = 125):
    """Center (lon, lat) of zone ``zid`` — the by-construction truth
    point for assignment tests."""
    cols, rows, cell_w, cell_h, lat0 = planet_zone_grid(n_zones, cols)
    cx = -180.0 + (zid % cols + 0.5) * cell_w
    cy = lat0 + (zid // cols + 0.5) * cell_h
    return cx, cy


def planet_zones_df(spark, n_zones: int = 10_000, n_vertices: int = 2_000, cols: int = 125):
    """Distributed synthetic planet: ``n_zones`` disjoint near-circular
    polygons of ``n_vertices`` vertices each (deterministic radial
    ripple, no RNG). Geometry volume ≈ n_zones · n_vertices · 16 B —
    10⁴ × 2·10³ ≈ 320 MB, past the 256 MB broadcast budget."""
    import pandas as pd
    from pyspark.sql import functions as F

    from cosmospark.ztypes import ZONES_RAW_SCHEMA

    ncols, rows, cell_w, cell_h, lat0 = planet_zone_grid(n_zones, cols)
    theta = 2.0 * np.pi * np.arange(n_vertices) / n_vertices
    base_cos, base_sin = np.cos(theta), np.sin(theta)

    def _gen(batches):
        for pdf in batches:
            out = []
            for zid in pdf["id"]:
                zid = int(zid)
                cx = -180.0 + (zid % ncols + 0.5) * cell_w
                cy = lat0 + (zid // ncols + 0.5) * cell_h
                ripple = 1.0 + 0.08 * np.sin(7.0 * theta + zid)
                xs = cx + 0.4 * cell_w * ripple * base_cos
                ys = cy + 0.4 * cell_h * ripple * base_sin
                xs[-1], ys[-1] = xs[0], ys[0]  # closed ring
                out.append(
                    {
                        "id": zid,
                        "osm_id": f"relation:{zid + 1_000_000}",
                        "admin_level": 8,
                        "zone_type": "city",
                        "name": f"Zone {zid}",
                        "tags": {},
                        "center_tags": {},
                        "center": {"lon": float(cx), "lat": float(cy)},
                        "rings": [
                            {
                                "poly": 0,
                                "ring": 0,
                                "xs": [float(v) for v in xs],
                                "ys": [float(v) for v in ys],
                            }
                        ],
                        "bbox": {
                            "minx": float(xs.min()),
                            "miny": float(ys.min()),
                            "maxx": float(xs.max()),
                            "maxy": float(ys.max()),
                        },
                        "is_generated": False,
                    }
                )
            yield pd.DataFrame(out)

    return (
        spark.range(n_zones)
        .repartition(32)
        .mapInPandas(_gen, ZONES_RAW_SCHEMA)
    )
