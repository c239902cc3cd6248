"""IVF-partitioned vector store: layout, manifest, partition pruning,
and search parity with the flat q_ann_ivf query."""

import pytest
from pyspark.sql import functions as F

from cosmospark import ann
from cosmospark.queries import IVF_K, IVF_PROBES, _ivf_centroids, q_ann_ivf

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "vectors")
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = _ivf_centroids(SF_DIR)
    manifest = ann.write_ivf(e, path, cents)
    return path, cents, manifest, e


class TestIvfStore:
    def test_manifest_and_layout(self, spark, store):
        path, cents, manifest, e = store
        assert manifest["n_rows"] == e.count()
        assert manifest["n_lists"] == IVF_K
        assert sum(manifest["list_rows"].values()) == manifest["n_rows"]
        # hive layout: list_id dirs on disk
        import os

        dirs = [d for d in os.listdir(path) if d.startswith("list_id=")]
        assert len(dirs) == len(manifest["list_rows"])

    def test_partition_pruning(self, spark, store):
        path, cents, manifest, _ = store
        probes = ann.probe_lists(cents[0], cents, IVF_PROBES)
        pruned = spark.read.parquet(path).filter(F.col("list_id").isin(probes))
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "list_id" in plan
        expected = sum(manifest["list_rows"][p] for p in probes)
        assert pruned.count() == expected
        assert expected < manifest["n_rows"]  # probing actually prunes

    def test_search_matches_flat_query(self, spark, store):
        path, cents, _, _ = store
        got = [
            (r["vec_id"], r["cos_sim"])
            for r in ann.search_ivf(
                spark, path, cents[0], k=10, n_probes=IVF_PROBES, exclude_vec_id=0
            ).collect()
        ]
        exp = [
            (r["vec_id"], r["cos_sim"])
            for r in q_ann_ivf(spark, SF_DIR).orderBy("rk").collect()
        ]
        assert got == exp
