"""End-to-end image pipeline test: generated parquet → fused decode/
invariant/phash/PIP job; every per-row invariant must hold
(BASELINE.json input_hint)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cosmospark.imagejob import _coords_for, _pixels_for, gen_images_parquet, image_pipeline
from cosmospark.queries import _lux_typed_zones


@pytest.fixture(scope="module")
def img_parquet(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("img") / "images.parquet")
    gen_images_parquet(path, 5000, px=16)
    return path


class TestImagePipeline:
    def test_invariants_and_assignment(self, spark, img_parquet):
        zones = _lux_typed_zones(spark)
        images = spark.read.parquet(img_parquet)
        out = image_pipeline(images, zones, px=16).cache()
        n = out.count()
        assert n == 5000
        agg = out.agg(
            F.sum(F.col("pixels_ok").cast("long")).alias("pix"),
            F.sum(F.col("phash_ok").cast("long")).alias("ph"),
            F.sum(F.col("caption_ok").cast("long")).alias("cap"),
            F.sum((F.col("zone_id") >= 0).cast("long")).alias("assigned"),
            F.min("psnr_db").alias("min_psnr"),
        ).collect()[0]
        assert agg["pix"] == 5000
        assert agg["ph"] == 5000
        assert agg["cap"] == 5000
        assert agg["assigned"] == 5000  # all coords inside the lux world
        assert agg["min_psnr"] >= 40.0

    def test_cells_match_library(self, spark, img_parquet):
        from cosmospark import cells

        zones = _lux_typed_zones(spark)
        images = spark.read.parquet(img_parquet)
        rows = image_pipeline(images, zones, px=16).orderBy("pid").limit(100).collect()
        pid = np.array([r["pid"] for r in rows], dtype=np.int64)
        lon, lat = _coords_for(pid)
        exp9 = cells.cell_encode(lon, lat, 9)
        exp_tile = cells.tile_encode(lon, lat, 12)
        assert (np.array([r["cell_r9"] for r in rows]) == exp9).all()
        assert (np.array([r["cell_r4"] for r in rows]) == exp9 >> 10).all()
        assert (np.array([r["tile_id"] for r in rows]) == exp_tile).all()

    def test_corrupted_payload_detected(self, spark, img_parquet):
        zones = _lux_typed_zones(spark)
        images = spark.read.parquet(img_parquet)
        # flip the phash of one row: invariant must catch it
        tampered = images.withColumn(
            "phash",
            F.when(F.col("pid") == 7, F.col("phash") + 1).otherwise(F.col("phash")),
        )
        out = image_pipeline(tampered, zones, px=16)
        bad = out.filter(~F.col("phash_ok")).select("pid").collect()
        assert [r["pid"] for r in bad] == [7]
