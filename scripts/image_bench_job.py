"""spark-submit job: full image pipeline throughput (decode → pixel/
phash/caption invariants → H3-encode → PIP zone assignment).

Run: spark-submit --master local[N] --py-files cosmospark.zip \
         scripts/image_bench_job.py --data /tmp/img_bench.parquet

This is the representative 100 TB workload: byte payloads + compute-dense
per-row work, so throughput scales with cores (unlike the thin points-only
PIP path, which saturates the Arrow exchange on a single box).
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--px", type=int, default=16)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("cosmospark-image-bench")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
        # many small input files → one task each; no repartition shuffle
        .config("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    from cosmospark.imagejob import image_pipeline
    from cosmospark.queries import _lux_typed_zones

    zones = _lux_typed_zones(spark)
    images = spark.read.parquet(args.data)
    n_rows = images.count()

    def job():
        out = image_pipeline(images, zones, px=args.px)
        return out.agg(
            F.count("*").alias("n"),
            F.sum(F.col("pixels_ok").cast("long")).alias("pix_ok"),
            F.sum(F.col("phash_ok").cast("long")).alias("ph_ok"),
            F.sum(F.col("caption_ok").cast("long")).alias("cap_ok"),
            F.sum((F.col("zone_id") >= 0).cast("long")).alias("assigned"),
            F.min("psnr_db").alias("min_psnr"),
        ).collect()[0]

    job()  # warm: JVM JIT, python daemons, page cache
    t0 = time.time()
    r = job()
    wall = time.time() - t0

    print(
        json.dumps(
            {
                "cores": cores,
                "rows": n_rows,
                "wall_sec": round(wall, 3),
                "images_per_sec": round(n_rows / wall),
                "pixels_ok": r["pix_ok"],
                "phash_ok": r["ph_ok"],
                "caption_ok": r["cap_ok"],
                "assigned": r["assigned"],
                "min_psnr_db": round(float(r["min_psnr"]), 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
