"""Raw-OSM ingestion tests: dependency closure semi-joins and boundary
ring stitching (shuffled/reversed ways, holes, multipolygons)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cosmospark import geom
from cosmospark.assembly import _stitch, assemble_boundaries, dependency_closure


class TestStitch:
    def test_square_from_shuffled_reversed_ways(self):
        # square 0,0→10,0→10,10→0,10 split into 4 ways, given out of
        # order with one reversed
        w1 = ([1, 2], [0.0, 10.0], [0.0, 0.0])
        w2 = ([3, 2], [10.0, 10.0], [10.0, 0.0])  # reversed
        w3 = ([3, 4], [10.0, 0.0], [10.0, 10.0])
        w4 = ([4, 1], [0.0, 0.0], [10.0, 0.0])
        rings = _stitch([w3, w1, w4, w2])
        assert len(rings) == 1
        nids, xs, ys = rings[0]
        assert set(nids) == {1, 2, 3, 4}
        assert geom.area([(0, 0, np.array(xs), np.array(ys))]) == pytest.approx(100.0)

    def test_two_disjoint_rings(self):
        a1 = ([1, 2, 3, 1], [0.0, 1, 0, 0], [0.0, 0, 1, 0])
        b1 = ([7, 8], [5.0, 6.0], [5.0, 5.0])
        b2 = ([8, 9], [6.0, 6.0], [5.0, 6.0])
        b3 = ([9, 7], [6.0, 5.0], [6.0, 5.0])
        rings = _stitch([a1, b1, b2, b3])
        assert len(rings) == 2

    def test_unclosable_dropped(self):
        dangling = ([1, 2], [0.0, 1.0], [0.0, 0.0])
        assert _stitch([dangling]) == []


@pytest.fixture(scope="module")
def osm_world(spark):
    """One relation: a 10x10 square boundary (4 outer ways) with a 2x2
    inner hole (1 closed inner way)."""
    relations = spark.createDataFrame(
        [(100, {"boundary": "administrative", "admin_level": "8", "name": "sq"})],
        "relation_id long, tags map<string,string>",
    )
    rel_members = spark.createDataFrame(
        [(100, 1, "outer"), (100, 2, "outer"), (100, 3, "outer"), (100, 4, "outer"), (100, 5, "inner"),
         (999, 77, "outer")],  # member of an unmatched relation → dropped by closure
        "relation_id long, way_id long, role string",
    )
    ways = spark.createDataFrame(
        [
            (1, [10, 11]), (2, [11, 12]), (3, [12, 13]), (4, [13, 10]),
            (5, [20, 21, 22, 23, 20]),
            (77, [30, 31]),
        ],
        "way_id long, node_ids array<long>",
    )
    nodes = spark.createDataFrame(
        [
            (10, 0.0, 0.0), (11, 10.0, 0.0), (12, 10.0, 10.0), (13, 0.0, 10.0),
            (20, 4.0, 4.0), (21, 6.0, 4.0), (22, 6.0, 6.0), (23, 4.0, 6.0),
            (30, 99.0, 99.0), (31, 98.0, 98.0),
        ],
        "node_id long, lon double, lat double",
    )
    return relations, rel_members, ways, nodes


class TestAssembly:
    def test_closure_prunes_unreferenced(self, spark, osm_world):
        relations, rel_members, ways, nodes = osm_world
        members, kept_ways, kept_nodes = dependency_closure(relations, rel_members, ways, nodes)
        assert members.count() == 5
        assert kept_ways.count() == 5
        assert kept_nodes.count() == 8  # nodes 30/31 pruned

    def test_multipolygon_with_hole(self, spark, osm_world):
        relations, rel_members, ways, nodes = osm_world
        out = assemble_boundaries(relations, rel_members, ways, nodes).collect()
        assert len(out) == 1
        rings = geom.rows_to_rings(out[0]["rings"])
        assert geom.area(rings) == pytest.approx(96.0)  # 100 - 4 hole
        inside, in_hole = geom.pip(
            np.array([1.0, 5.0]), np.array([1.0, 5.0]), rings
        )
        assert inside and not in_hole
