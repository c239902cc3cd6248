"""Partitioned assignment sink: cell-prefix hive layout + manifest, and
partition pruning on read (the spatial-read scale path)."""

import os

import pytest
from pyspark.sql import functions as F

from cosmospark.assign import encode_and_assign, write_assignments
from cosmospark.queries import _lux_typed_zones


class TestAssignmentSink:
    def test_write_read_prune(self, spark, tmp_path):
        zones = _lux_typed_zones(spark)
        pts = spark.range(5000).select(
            F.col("id").alias("pid"),
            F.expr("cast(2.0 + (id * 7919 % 1300) / 100.0 as double)").alias("lon"),
            F.expr("cast(44.0 + (id * 104729 % 1000) / 100.0 as double)").alias("lat"),
        )
        assigned = encode_and_assign(pts, zones)
        path = str(tmp_path / "assignments")
        manifest = write_assignments(assigned, path)
        assert manifest["n_rows"] == 5000
        assert manifest["n_partitions"] >= 2
        assert sum(manifest["partition_rows"].values()) == 5000

        back = spark.read.parquet(path)
        assert back.count() == 5000
        # partition pruning: a filter on the prefix column touches only
        # matching hive partitions
        one_prefix = int(next(iter(manifest["partition_rows"])))
        pruned = back.filter(F.col("cell_prefix") == one_prefix)
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert pruned.count() == manifest["partition_rows"][str(one_prefix)]


class TestZoneFormats:
    """4-format round-trip (reference tests/cosmogony_test.rs:35-105):
    jsonl / jsonl.gz / json / json.gz all reproduce the same zone table;
    the whole-doc formats carry the {zones, meta} envelope."""

    @pytest.fixture(scope="class")
    def small_zones(self, spark):
        from cosmospark.fixtures import LUX_RULES_LEVELS, lux_world
        from cosmospark.pipeline import build_zones
        from cosmospark.typer import make_rules
        from cosmospark.ztypes import ZONES_RAW_SCHEMA

        raw = spark.createDataFrame(lux_world()[:30], schema=ZONES_RAW_SCHEMA)
        rules = make_rules(spark, LUX_RULES_LEVELS)
        out = build_zones(spark, raw, rules).select(
            "id", "osm_id", "name", "zone_type", "parent", "label",
            "admin_level", "wikidata",
        )
        return out.cache()

    @pytest.mark.parametrize("ext", ["jsonl", "jsonl.gz", "json", "json.gz"])
    def test_round_trip(self, spark, tmp_path, small_zones, ext):
        from cosmospark.pipeline import read_meta, read_zones, write_zones

        path = str(tmp_path / f"zones.{ext}")
        write_zones(small_zones, path)
        back = read_zones(spark, path)
        exp = {r["osm_id"]: r.asDict() for r in small_zones.collect()}
        got = {r["osm_id"]: r.asDict() for r in back.select(*exp[next(iter(exp))].keys()).collect()}
        assert got == exp
        meta = read_meta(path)
        if ext.startswith("json."):  # json.gz
            assert meta is not None
        if ext in ("json", "json.gz"):
            assert meta["stats"]["zone_count"] == len(exp)
        else:
            assert meta is None

    def test_whole_doc_envelope_shape(self, tmp_path, small_zones):
        import json

        from cosmospark.pipeline import write_zones

        path = str(tmp_path / "zones.json")
        write_zones(small_zones, path, osm_filename="lux.osm.pbf")
        with open(path) as fh:
            doc = json.load(fh)
        assert set(doc) == {"zones", "meta"}
        assert doc["meta"]["osm_filename"] == "lux.osm.pbf"
        assert len(doc["zones"]) == small_zones.count()
