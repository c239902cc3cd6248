"""Bucketed storage for co-located, shuffle-free equi-joins.

The 100 TB deployment repeatedly joins the assignment fact table to
per-key side tables (doc stats, zone rollups, dedup verdicts) on the
same high-cardinality key. Hash-bucketing both sides at write time
(`bucketBy` + `sortBy`) makes every later equi-join on that key
EXCHANGE-FREE: Catalyst proves both children share the
HashPartitioning(key, n) output partitioning and plans a SortMergeJoin
with no shuffle on either side — the join cost becomes a co-located
merge, paid once at write time instead of per query.

This is the storage-layout counterpart of cosmospark.assign's
cell-prefix partitioning (which prunes SCANS); bucketing co-locates
JOINS. The reference has no analog (single-process, everything in
RAM); this is a graft-scale component (SURVEY.md §4 partitioning
strategy).

Spark's bucketed format requires table-backed parquet (saveAsTable);
tables are written EXTERNAL (explicit ``path``) so the data lives in
the caller's lake layout, with the metastore entry carrying only the
bucket spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Write ``df`` as an external parquet table hash-bucketed on
    ``bucket_cols`` (and sorted within buckets on ``sort_cols``,
    defaulting to the bucket columns — pre-sorting also removes the
    join's Sort operators)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    sort_cols = sort_cols or bucket_cols
    (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*sort_cols)
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket-spec metadata (a plain
    ``spark.read.parquet`` of the same files would lose the spec and
    reintroduce the shuffle)."""
    return spark.table(table)


def write_splittable(
    df: DataFrame,
    path: str,
    rows_per_group: int = 65_536,
    mode: str = "overwrite",
) -> None:
    """Write parquet sized for SCAN PARALLELISM: both the per-file row
    cap and the parquet row-group size are bounded at ``rows_per_group``
    rows, so a later scan can split the data at that granularity.

    This is the write-side fix for a lesson this engine hit twice
    (imagejob r4: a one-row-group file ran a 200k-row pipeline 4-wide on
    32 cores; minhash/simhash r5: hash work directly on a
    single-row-group scan stage capped 1-wide): parquet splits at
    ROW-GROUP granularity, so the writer — not the reader — decides the
    maximum parallelism of every downstream scan-stage computation.
    Readers can work around a bad layout with a repartition exchange;
    writing it right costs nothing.

    ``parquet.block.size`` bounds row groups by BYTES; Spark's
    ``maxRecordsPerFile`` bounds files by ROWS. Using both keeps groups
    small for wide rows (bytes bound) and files small for narrow rows
    (row bound)."""
    (
        df.write.mode(mode)
        .option("maxRecordsPerFile", rows_per_group)
        # 8 MB row groups: small enough that even wide rows split well,
        # large enough that footer/dictionary overhead stays negligible
        .option("parquet.block.size", 8 * 1024 * 1024)
        .parquet(path)
    )
