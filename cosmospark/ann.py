"""IVF-partitioned vector store: the physical layout behind the
q_ann_ivf scale claim.

At 10⁹+ vectors, approximate nearest-neighbor search is a STORAGE-layout
problem as much as a compute one: vectors are written partitioned by
their coarse-centroid list (`list_id=<k>/` hive layout), so a query that
probes P of K lists reads P/K of the table — Catalyst prunes the rest at
planning time, exactly like the cell-prefix layout of
cosmospark.assign.write_assignments does for spatial reads.

All arithmetic uses the sequential-fold SQL expressions shared with the
query/oracle layer (cosmospark.queries), so the stored assignment and
any oracle recomputation agree bit-for-bit.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F


def assign_lists(embeddings: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """+ list_id (1-based): nearest coarse centroid by cosine, first max
    on ties (array_position semantics — deterministic across engines)."""
    from cosmospark.queries import _ivf_scores_expr

    scores = _ivf_scores_expr("embedding", centroids, "spark")
    return embeddings.withColumn(
        "list_id", F.expr(f"array_position({scores}, array_max({scores}))").cast("int")
    )


def write_ivf(
    embeddings: DataFrame, path: str, centroids: list[list[float]]
) -> dict:
    """Write the vector table hive-partitioned by list_id with a manifest
    carrying the centroids + per-list row counts (the index metadata a
    reader needs to plan probes without touching data files)."""
    assign_lists(embeddings, centroids).write.mode("overwrite").partitionBy(
        "list_id"
    ).parquet(path)
    spark = embeddings.sparkSession
    counts = {
        int(r["list_id"]): int(r["n"])
        for r in spark.read.parquet(path)
        .groupBy("list_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    manifest = {
        "n_lists": len(centroids),
        "centroids": centroids,
        "list_rows": counts,
        "n_rows": sum(counts.values()),
    }
    with open(os.path.join(path, "_IVF_MANIFEST.json"), "w") as fh:
        json.dump(manifest, fh)
    return manifest


def probe_lists(qvec: list[float], centroids: list[list[float]], n_probes: int) -> list[int]:
    """1-based ids of the n_probes centroids nearest the query (cosine,
    ties by centroid order) — driver-side, identical arithmetic to the
    query layer."""
    q = np.asarray(qvec, dtype=np.float64)
    qn = float(np.sqrt((q * q).sum()))
    sims = []
    for j, c in enumerate(centroids):
        acc = 0.0
        for x, y in zip(qvec, c):
            acc += x * y
        cn = float(np.sqrt(np.sum(np.asarray(c, dtype=np.float64) ** 2)))
        sims.append(acc / (qn * cn))
    order = sorted(range(len(centroids)), key=lambda j: (-sims[j], j))
    return [j + 1 for j in order[:n_probes]]


def lsh_candidate_pairs(
    embeddings: DataFrame, n_tables: int = 4, n_bits: int = 12
) -> DataFrame:
    """Candidate pairs from L INDEPENDENT hyperplane-LSH tables, unioned
    (VERDICT r2 #7 — the multi-table recall story).

    A single sign-LSH table misses a near pair with probability
    1 − p(θ)^b (p = 1 − θ/π per hyperplane); L independent tables drop
    that to (1 − p^b)^L — exponentially better recall at linear cost.
    Spark shape: ONE projection computes all L bucket ids per vector
    (array of (table, bucket) structs, exploded), then a (table, bucket)
    equi-self-join — no cartesian, no per-table scans."""
    from cosmospark.queries import _hyperplane

    dim = len(embeddings.select("embedding").first()[0])
    tb = []
    for t in range(n_tables):
        bucket = None
        for j in range(n_bits):
            # disjoint hyperplane index ranges per table → independence
            h = _hyperplane(t * 101 + j, dim)
            hlit = "array(" + ", ".join(repr(v) + "D" for v in h) + ")"
            dot = (
                f"aggregate(zip_with(embedding, {hlit}, (x, y) -> x * y), "
                f"0D, (a, x) -> a + x)"
            )
            bit = F.expr(f"case when {dot} > 0 then {1 << j} else 0 end").cast("long")
            bucket = bit if bucket is None else bucket + bit
        tb.append(F.struct(F.lit(t).alias("tbl"), bucket.alias("bucket")))
    b = embeddings.select(
        "vec_id", F.explode(F.array(*tb)).alias("t")
    ).select("vec_id", "t.tbl", "t.bucket")
    a2 = b.select(F.col("vec_id").alias("id_a"), "tbl", "bucket")
    b2 = b.select(F.col("vec_id").alias("id_b"), "tbl", "bucket")
    return (
        a2.join(b2, ["tbl", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def search_ivf(
    spark: SparkSession,
    path: str,
    qvec: list[float],
    k: int = 10,
    n_probes: int = 2,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """Top-k cosine neighbors of ``qvec`` scanning ONLY the probed list
    partitions (verify with .explain: PartitionFilters prune the rest)."""
    with open(os.path.join(path, "_IVF_MANIFEST.json")) as fh:
        manifest = json.load(fh)
    probes = probe_lists(qvec, manifest["centroids"], n_probes)
    qn = float(np.sqrt(np.sum(np.asarray(qvec, dtype=np.float64) ** 2)))
    qlit = "array(" + ", ".join(repr(float(v)) + "D" for v in qvec) + ")"
    dot = f"aggregate(zip_with(embedding, {qlit}, (x, y) -> x * y), 0D, (a, x) -> a + x)"
    nrm = "sqrt(aggregate(embedding, 0D, (a, x) -> a + x * x))"
    df = spark.read.parquet(path).filter(F.col("list_id").isin(probes))
    if exclude_vec_id is not None:
        df = df.filter(F.col("vec_id") != exclude_vec_id)
    scored = df.select(
        "vec_id", "list_id", F.expr(f"round({dot} / ({nrm} * {qn!r}), 6)").alias("cos_sim")
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id")).limit(k)


# ---------------------------------------------------------------------------
# Product quantization (PQ) + asymmetric-distance (ADC) scan — the
# memory-scale ANN path: a d-dim float vector compresses to m uint8
# codes (here m=8 → 8 bytes vs 256+), and a query scans codes with a
# precomputed (m × k) distance table — pure lookups + adds, expressible
# entirely in whole-stage codegen on the fact side.


def pq_train(x: np.ndarray, m: int, k: int, iters: int = 10) -> np.ndarray:
    """(m, k, d/m) codebooks via DETERMINISTIC Lloyd's k-means per
    subspace: init = the first k distinct subvectors in row order (no
    RNG — reruns and the oracle see the identical codebook), fixed
    iteration count, empty clusters keep their previous centroid.
    Training feeds a driver-side SAMPLE (codebooks are tiny); encode
    and scan are the distributed parts."""
    n, d = x.shape
    assert d % m == 0, (d, m)
    dsub = d // m
    books = np.empty((m, k, dsub), dtype=np.float64)
    for j in range(m):
        sub = x[:, j * dsub : (j + 1) * dsub]
        uniq, idx = np.unique(sub, axis=0, return_index=True)
        order = np.sort(idx)[:k]
        if len(order) < k:  # tiny corpora: pad by cycling
            order = np.resize(order, k)
        c = sub[order].astype(np.float64).copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for ci in range(k):
                mask = a == ci
                if mask.any():
                    c[ci] = sub[mask].mean(axis=0)
        books[j] = c
    return books


def pq_subspace_dists(x: np.ndarray, c: np.ndarray) -> np.ndarray:
    """(n, k) squared distances with SEQUENTIAL dimension accumulation
    (dim 0 + dim 1 + ...) — the exact fold order the SQL oracle's
    list_aggregate uses, so code assignment is bit-reproducible."""
    n, dsub = x.shape
    acc = np.zeros((n, len(c)), dtype=np.float64)
    for i in range(dsub):
        diff = x[:, i, None] - c[None, :, i]
        acc += diff * diff
    return acc


def pq_encode(
    emb: DataFrame, books: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Add ``codes`` (array<int>, one uint8-range code per subspace):
    one narrow Arrow pass, no shuffle. Ties break to the LOWEST code
    index (argmin), matching the oracle's (d2, c) ordering."""
    import pandas as pd
    from pyspark.sql import functions as F, types as T

    m, k, dsub = books.shape
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(books)
    out_schema = T.StructType(
        emb.schema.fields + [T.StructField("codes", T.ArrayType(T.IntegerType()))]
    )

    def _run(batches):
        bk = bc.value
        for pdf in batches:
            if not len(pdf):
                # empty Arrow batch (filtered/streamed input): np.array
                # of zero rows is 1-D and the 2-D subspace slice below
                # would raise IndexError
                pdf["codes"] = []
                yield pdf
                continue
            vecs = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            codes = np.empty((len(vecs), m), dtype=np.int32)
            for j in range(m):
                sub = vecs[:, j * dsub : (j + 1) * dsub]
                codes[:, j] = pq_subspace_dists(sub, bk[j]).argmin(axis=1)
            pdf["codes"] = list(codes)
            yield pdf

    return emb.mapInPandas(_run, out_schema)
