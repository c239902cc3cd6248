"""spark-submit job: H3-encode + PIP zone-assignment throughput.

Run:  spark-submit --master local[N] --py-files cosmospark.zip \
          scripts/pip_bench_job.py --rows 16000000

Prints one JSON line {"cores", "rows", "wall_sec", "images_per_sec"}.
This is the north-rule scaling job: identical input at two parallelism
levels; the orchestrator (scripts/bench_scaling.py) computes efficiency.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16_000_000)
    ap.add_argument("--warmup-rows", type=int, default=0)  # 0 = same as rows
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("cosmospark-pip-bench")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    from cosmospark.assign import encode_and_assign
    from cosmospark.queries import _lux_typed_zones

    zones = _lux_typed_zones(spark)

    def pts(n):
        return spark.range(n, numPartitions=cores * 4).select(
            F.col("id").alias("pid"),
            F.expr("cast(2.0 + (id * 7919 % 1300) / 100.0 as double)").alias("lon"),
            F.expr("cast(44.0 + (id * 104729 % 1000) / 100.0 as double)").alias("lat"),
        )

    def job(n):
        return encode_and_assign(pts(n), zones).filter(F.col("zone_id") >= 0).count()

    # warm up JVM JIT + python daemons + broadcast: full-size warmup so the
    # measured run is steady-state (what a long-running cluster job sees)
    job(args.warmup_rows or args.rows)

    t0 = time.time()
    n = job(args.rows)
    wall = time.time() - t0

    print(
        json.dumps(
            {
                "cores": cores,
                "rows": args.rows,
                "assigned": n,
                "wall_sec": round(wall, 3),
                "images_per_sec": round(args.rows / wall),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
