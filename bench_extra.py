"""Auxiliary bench: isolate a subset of suite entries with the SAME
methodology as bench.py (one warmup, scrub with JIT drain, best-of-N
timed runs against the noop sink) without running the whole suite.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py \
        ngram_jaccard dedup_keep_best

Prints one JSON line {"queries": {name: sec}, "cpu_sec": {...}, "sf": ...}.
bench.py stays the artifact of record; this file exists for guide-§1.4
isolation while optimizing (OPTIMIZATION_r07.md cites these numbers).
"""

from __future__ import annotations

import gc as _gc
import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_runs = int(os.environ.get("COSMOSPARK_BENCH_RUNS", "3"))
    names = sys.argv[1:]

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from cosmospark.queries import queries
    from cosmospark.session import get_spark

    spark = get_spark(
        app_name="cosmospark-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    def _scrub():
        spark.catalog.clearCache()
        _gc.collect()
        spark._jvm.System.gc()
        mx = spark._jvm.java.lang.management.ManagementFactory.getCompilationMXBean()
        last = mx.getTotalCompilationTime()
        deadline = time.time() + 25
        while time.time() < deadline:
            time.sleep(0.25)
            cur = mx.getTotalCompilationTime()
            if cur - last < 20:
                break
            last = cur

    qs = queries()
    timings: dict[str, float] = {}
    for name in names:
        fn = lambda: (  # noqa: E731
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        )
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        fn()  # warmup
        _scrub()
        best = float("inf")
        for _ in range(n_runs):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
            _scrub()
        timings[name] = round(best, 3)
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({"queries": timings, "sf": sf_dir, "cpus": cpus}))
    spark.stop()


if __name__ == "__main__":
    main()
