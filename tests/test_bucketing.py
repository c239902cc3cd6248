"""Bucketed co-located joins: the equi-join of two tables bucketed on
the same key plans with ZERO Exchange operators (and, with sortBy, zero
Sort operators) — the shuffle is paid once at write time."""

import pytest
from pyspark.sql import functions as F

from cosmospark.bucketing import read_bucketed, write_bucketed


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    docs = spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("grp"),
        F.xxhash64("id").alias("fp"),
    )
    stats = spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 31 % 1000).alias("score"),
    )
    write_bucketed(docs, "b_docs", str(tmp_path / "b_docs"), ["doc_id"], 8)
    write_bucketed(stats, "b_stats", str(tmp_path / "b_stats"), ["doc_id"], 8)
    yield read_bucketed(spark, "b_docs"), read_bucketed(spark, "b_stats")
    spark.sql("DROP TABLE IF EXISTS b_docs")
    spark.sql("DROP TABLE IF EXISTS b_stats")


def test_cobucketed_join_has_no_exchange(spark, bucketed_pair):
    docs, stats = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = docs.join(stats, "doc_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle either side
        assert joined.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_plain_parquet_rejoin_would_shuffle(spark, bucketed_pair, tmp_path):
    # control: the SAME data written as plain parquet shuffles — the
    # bucket spec (table metadata), not the bytes, carries the win
    docs, stats = bucketed_pair
    docs.write.mode("overwrite").parquet(str(tmp_path / "plain_docs"))
    stats.write.mode("overwrite").parquet(str(tmp_path / "plain_stats"))
    a = spark.read.parquet(str(tmp_path / "plain_docs"))
    b = spark.read.parquet(str(tmp_path / "plain_stats"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = a.join(b, "doc_id")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_aggregation_no_exchange(spark, bucketed_pair):
    # groupBy on the bucket key also rides the bucketing: partial+final
    # aggregation collapses to one stage, no shuffle
    docs, _ = bucketed_pair
    agg = docs.groupBy("doc_id").agg(F.count("*").alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_write_splittable_scan_parallelism(spark, tmp_path):
    """write_splittable must produce a layout whose scan can run wider
    than one task: many row groups / files, and a Spark scan of it
    plans more than one partition (the r4/r5 row-group lesson)."""
    import pyarrow.parquet as pq
    import os

    from pyspark.sql import functions as F

    from cosmospark.bucketing import write_splittable

    df = spark.range(50_000).select(
        F.col("id"), F.repeat(F.lit("x"), 200).alias("pad")
    )
    out = str(tmp_path / "split")
    write_splittable(df.coalesce(1), out, rows_per_group=5_000)
    groups = 0
    for name in os.listdir(out):
        if name.endswith(".parquet"):
            groups += pq.ParquetFile(os.path.join(out, name)).metadata.num_row_groups
    assert groups >= 8, f"only {groups} row groups"
    # a fresh scan can execute wider than one task
    back = spark.read.parquet(out)
    nparts = back.rdd.getNumPartitions()
    assert nparts > 1, f"scan planned {nparts} partition(s)"
