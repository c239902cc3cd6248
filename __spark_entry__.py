"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship job on sf0.001: derive deterministic geo points
                from the orders table, H3-encode + PIP-assign them to the
                198-zone synthetic Luxembourg world via the broadcast
                ZoneIndex, and return per-zone-type counts.
queries()     — one entry per implemented operator (SURVEY.md §2 +
                training-data + multimodal ops); see cosmospark/queries.py.
oracle_sql()  — matching DuckDB SQL for EVERY query (82/82): xxhash64-
                based ops use the Spark-bit-identical pure-Python XXH64
                (cosmospark/xxh.py) to materialize signatures the SQL
                then verifies relationally; fake-codec payloads are
                re-derived in SQL via HUGEINT LCG arithmetic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from cosmospark.assign import assign_zones, encode_points
    from cosmospark.queries import _lux_typed_zones

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    pts = orders.select(
        F.col("o_orderkey").alias("pid"),
        F.expr("2.0 + (o_orderkey * 7919 % 1300) / 100.0").alias("lon"),
        F.expr("44.0 + (o_orderkey * 104729 % 1000) / 100.0").alias("lat"),
    )
    zones = _lux_typed_zones(spark)
    assigned = assign_zones(encode_points(pts), zones)
    ztype = zones.select(F.col("id").alias("zone_id"), F.col("zone_type").alias("zone_type"))
    return (
        assigned.join(F.broadcast(ztype), "zone_id", "left")
        .groupBy("zone_type")
        .agg(F.count("*").alias("n_points"))
        .orderBy("zone_type")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from cosmospark.queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from cosmospark.queries import oracle_sql as _o

    return _o()
