"""OSM PBF source tests: wire-codec round-trip, blob indexing,
distributed decode, and the full generate-from-.osm.pbf pipeline
reproducing the golden Luxembourg counts (the reference's own entry
surface, src/lib.rs:243-249 + tests/cosmogony_test.rs)."""

import pytest
from pyspark.sql import functions as F

from cosmospark import pbf
from cosmospark.fixtures import LUX_RULES_LEVELS, lux_osm_world
from cosmospark.typer import make_rules


def _world_as_pbf(tmp_path, compress=True, nodes_per_block=200):
    w = lux_osm_world()
    nodes = [(nid, lon, lat, tags) for nid, lon, lat, tags in w["nodes"]]
    ways = [(wid, refs, {}) for wid, refs in w["ways"]]
    members_by_rel: dict[int, list] = {}
    for rid, wid, role in w["rel_members"]:
        members_by_rel.setdefault(rid, []).append(("way", wid, role))
    for rid, nid, role in w["rel_node_members"]:
        members_by_rel.setdefault(rid, []).append(("node", nid, role))
    relations = [(rid, tags, members_by_rel.get(rid, [])) for rid, tags in w["relations"]]
    path = str(tmp_path / "lux.osm.pbf")
    pbf.write_osm_pbf(
        path, nodes, ways, relations, compress=compress, nodes_per_block=nodes_per_block
    )
    return path, w


class TestWireCodec:
    def test_varint_zigzag_round_trip(self):
        for v in (0, 1, 127, 128, 300, 2**35, 2**63 - 1):
            buf = pbf._varint(v)
            got, i = pbf._read_varint(buf, 0)
            assert got == v and i == len(buf)
        for v in (0, -1, 1, -2**40, 2**40):
            assert pbf._zigzag(pbf._zz(v)) == v

    def test_blob_index_and_block_decode(self, tmp_path):
        path, w = _world_as_pbf(tmp_path, nodes_per_block=100)
        idx = pbf.blob_index(path)
        assert idx[0]["type"] == "OSMHeader"
        data_blobs = [b for b in idx if b["type"] == "OSMData"]
        assert len(data_blobs) >= 3  # several node blocks + ways + relations
        # decode every block and pool the entities
        nodes, ways, relations = [], [], []
        with open(path, "rb") as fh:
            for b in data_blobs:
                fh.seek(b["offset"])
                blk = pbf.decode_primitive_block(pbf._blob_payload(fh.read(b["size"])))
                nodes += blk["nodes"]
                ways += blk["ways"]
                relations += blk["relations"]
        assert len(nodes) == len(w["nodes"])
        assert len(ways) == len(w["ways"])
        assert len(relations) == len(w["relations"])
        # coordinates survive the granularity quantization to ≤1e-7 deg
        src = {nid: (lon, lat) for nid, lon, lat, _ in w["nodes"]}
        for nid, lon, lat, tags in nodes:
            slon, slat = src[nid]
            assert lon == pytest.approx(slon, abs=1e-6)
            assert lat == pytest.approx(slat, abs=1e-6)
        # tags survive, including unicode
        rel_tags = {rid: tags for rid, tags, _ in relations}
        assert rel_tags[2171347]["name"] == "Lëtzebuerg"
        assert rel_tags[2171347]["ISO3166-1:alpha2"] == "LU"
        # member roles + order survive
        mem = {rid: ms for rid, _, ms in relations}
        roles_4000 = [(t, role) for t, _, role in mem[4000] if t == "node"]
        assert ("node", "admin_centre") in roles_4000 and ("node", "label") in roles_4000

    def test_uncompressed_blobs(self, tmp_path):
        path, w = _world_as_pbf(tmp_path, compress=False)
        idx = pbf.blob_index(path)
        with open(path, "rb") as fh:
            b = [x for x in idx if x["type"] == "OSMData"][0]
            fh.seek(b["offset"])
            blk = pbf.decode_primitive_block(pbf._blob_payload(fh.read(b["size"])))
        assert blk["nodes"]


class TestDistributedScan:
    def test_tables_match_fixture(self, spark, tmp_path):
        path, w = _world_as_pbf(tmp_path)
        t = pbf.read_osm_pbf(spark, path)
        assert t["relations"].count() == len(w["relations"])
        assert t["ways"].count() == len(w["ways"])
        assert t["nodes"].count() == len(w["nodes"])
        assert t["rel_members"].count() == len(w["rel_members"])
        assert t["rel_node_members"].count() == len(w["rel_node_members"])
        # spot-check a way's ref order
        way0 = w["ways"][0]
        got = t["ways"].filter(F.col("way_id") == way0[0]).first()
        assert list(got["node_ids"]) == list(way0[1])

    def test_generate_from_pbf_golden_counts(self, spark, tmp_path):
        # the reference's CLI surface end-to-end: .osm.pbf → typed,
        # parented zone table with the golden Luxembourg structure
        path, _ = _world_as_pbf(tmp_path)
        rules = make_rules(spark, LUX_RULES_LEVELS)
        out = pbf.build_zones_from_pbf(spark, path, rules).cache()
        assert out.count() == 198
        levels = {
            r["admin_level"]: r["n"]
            for r in out.groupBy("admin_level").agg(F.count("*").alias("n")).collect()
        }
        assert levels == {2: 1, 6: 13, 8: 105, 9: 79}
        # the Gatineau label-node center survives the PBF round trip
        g = out.filter(F.col("osm_id") == "relation:4001").first()
        assert g["center"]["lat"] == pytest.approx(44.0 + 1.5, abs=1e-6)
