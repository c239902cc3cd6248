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
