"""Distributed graph operators for the training-data pipeline.

The one that matters at 100 TB: connected components over a near-dup
pair graph (minhash/simhash/jaccard edges), which turns pairwise
near-duplicate hits into dedup CLUSTERS — keep one canonical doc per
component, drop the rest. The reference has no graph ops; this is a
graft addition (BASELINE.json training-pipeline axis).

Algorithm: iterative min-label propagation to fixpoint — each round
every node takes the minimum label among itself and its neighbors
(converges in O(graph diameter) rounds; the classic Spark/Pregel CC
shape). Each round is one shuffle join + one aggregate; lineage is
truncated with localCheckpoint every round so the plan tree stays O(1)
deep (iterative self-joins otherwise OOM the driver's plan compiler —
see PySpark plan-tree growth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """(node, lab): every node labelled with the MINIMUM node id of its
    connected component (isolated nodes label themselves). Fixpoint is
    detected with one tiny agg per round; raises if ``max_iter`` rounds
    don't converge (pathological diameter)."""
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = (
        sym.unionByName(sym.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .cache()
    )
    labels = nodes.select(
        F.col(id_col).alias("node"), F.col(id_col).cast("long").alias("lab")
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        nb_min = (
            sym.join(
                labels.select(F.col("node").alias("u"), "lab"), "u"
            )
            .groupBy(F.col("v").alias("node"))
            .agg(F.min("lab").alias("nlab"))
        )
        stepped = labels.join(nb_min, "node", "left").select(
            "node",
            "lab",
            F.least(F.col("lab"), F.coalesce(F.col("nlab"), F.col("lab"))).alias(
                "lab2"
            ),
        )
        stepped = stepped.localCheckpoint(eager=True)
        changed = stepped.filter(F.col("lab2") < F.col("lab")).limit(1).count()
        labels = stepped.select("node", F.col("lab2").alias("lab"))
        if changed == 0:
            sym.unpersist()
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
