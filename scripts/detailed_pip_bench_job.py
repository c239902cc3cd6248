"""spark-submit job: PIP zone-assignment against DETAILED boundaries
(2048-vertex polygons — the shape of real admin geometry).

Run: spark-submit --master local[N] --py-files cosmospark.zip \
         scripts/detailed_pip_bench_job.py --rows 2000000

Per-point work is dominated by exact ray-casting against many-vertex
rings with cache-tiled temporaries → compute-bound → scales with cores.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--start", type=int, default=0, help="row-id shard offset")
    ap.add_argument("--vertices", type=int, default=2048)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("cosmospark-detailed-pip-bench")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    from cosmospark.assign import encode_and_assign
    from cosmospark.fixtures import detailed_lux_zones
    from cosmospark.ztypes import ZONES_RAW_SCHEMA

    zones = spark.createDataFrame(detailed_lux_zones(args.vertices), schema=ZONES_RAW_SCHEMA)

    def pts(n):
        return spark.range(args.start, args.start + n, numPartitions=cores * 4).select(
            F.col("id").alias("pid"),
            F.expr("cast(2.0 + (id * 7919 % 1300) / 100.0 as double)").alias("lon"),
            F.expr("cast(44.0 + (id * 104729 % 1000) / 100.0 as double)").alias("lat"),
        )

    def job(n):
        return (
            encode_and_assign(pts(n), zones)
            .agg(
                F.count("*").alias("total"),
                F.sum((F.col("zone_id") >= 0).cast("long")).alias("assigned"),
            )
            .collect()[0]
        )

    # bounded warmup: enough rows to JIT the JVM pipeline and spawn the
    # python daemons; a full-size warmup would double the harness cost
    # at the shard sizes that amortize the per-run fixed overhead
    # (driver index build + broadcast ≈ 7-8 s) below 10%
    job(min(args.rows, 400_000))
    t0 = time.time()
    r = job(args.rows)
    wall = time.time() - t0

    print(
        json.dumps(
            {
                "cores": cores,
                "rows": args.rows,
                "vertices": args.vertices,
                "assigned": r["assigned"],
                "wall_sec": round(wall, 3),
                "images_per_sec": round(args.rows / wall),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
