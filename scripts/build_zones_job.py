"""spark-submit entry for the full zone build — the deployment shape the
engine runs with on a cluster:

    spark-submit --master <cluster> --py-files cosmospark.zip \\
        scripts/build_zones_job.py --input planet.osm.pbf \\
        --output zones.jsonl --checkpoint s3://bucket/stages \\
        [--rules rules.json] [--country-code XX] [--enable-voronoi]

Reads raw OSM (PBF or zones_raw JSONL), runs the staged pipeline with
parquet snapshot checkpoints (resumable), writes any of the 4 output
formats, and prints the stats JSON line. Locally:

    spark-submit --master 'local[8]' --py-files /tmp/cosmospark.zip \\
        scripts/build_zones_job.py --input lux.osm.pbf --output out.jsonl
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--rules", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--country-code", default=None)
    ap.add_argument("--filter-langs", default=None)
    ap.add_argument("--enable-voronoi", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("cosmospark-build-zones").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from cosmospark.__main__ import _load_rules
    from cosmospark.pipeline import build_zones, read_zones, write_zones
    from cosmospark.stats import compute_stats
    from cosmospark.ztypes import ZONES_RAW_SCHEMA

    rules = _load_rules(spark, args.rules)
    counters: dict = {}
    common = dict(
        checkpoint_root=args.checkpoint,
        filter_langs=args.filter_langs.split(",") if args.filter_langs else None,
        country_code=args.country_code,
        stats=counters,
        enable_voronoi=args.enable_voronoi,
    )
    if args.input.endswith((".pbf", ".osm.pbf")):
        from cosmospark.pbf import build_zones_from_pbf

        out = build_zones_from_pbf(spark, args.input, rules, **common)
    else:
        raw = read_zones(spark, args.input, schema=ZONES_RAW_SCHEMA)
        out = build_zones(spark, raw, rules, **common)

    stats_doc = {**compute_stats(out), **counters}
    write_zones(out, args.output, osm_filename=args.input, stats=stats_doc)
    print(json.dumps(stats_doc))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
