"""Shard merge with dense-id re-offsetting (reference src/merger.rs:23-77).

Semantics: shards are concatenated **in argument order**; shard k's ids
(and parent pointers) are shifted by offset_k = Σ_{j<k} (max_id_j + 1)
(the running ``get_updated_id`` offset at merger.rs:35-56). The
reference's jsonl-only streaming constraint (merger.rs:64-67) is moot in
Spark — per-shard max ids are one tiny agg each; the union is lazy.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def merge_zones(shards: list[DataFrame]) -> DataFrame:
    """unionByName of shards with ids/parents re-offset per shard order."""
    if not shards:
        raise ValueError("no shards to merge")
    offsets = []
    running = 0
    for df in shards:
        offsets.append(running)
        mx = df.agg(F.max("id")).collect()[0][0]
        running += (int(mx) + 1) if mx is not None else 0

    shifted = []
    for df, off in zip(shards, offsets):
        s = df.withColumn("id", F.col("id") + F.lit(off))
        if "parent" in df.columns:
            s = s.withColumn("parent", F.col("parent") + F.lit(off))
        shifted.append(s)
    return reduce(lambda a, b: a.unionByName(b), shifted)
