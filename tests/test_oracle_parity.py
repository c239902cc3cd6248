"""Emulates the driver's correctness gate: run each queries() entry on
Spark and its oracle_sql() on DuckDB over the same parquet tables,
compare row count + column names + exact values (order-insensitive).

Runs at sf0.001 for speed by default; ``pytest -m slow`` additionally
runs the FULL registry at sf0.01 — the driver's own scale — so every
query has a current-round oracle check even when the driver subsamples
(VERDICT r3 #9). Deselected from plain ``pytest`` runs via pytest.ini.
"""

import duckdb
import pandas as pd
import pytest

from cosmospark import queries as Q

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


ORACLES = Q.oracle_sql(SF_DIR)
NAMES = sorted(ORACLES)


import functools


@functools.lru_cache(maxsize=4)
def _oracles_for(sf_dir):
    # building the registry materializes pure-Python XXH64 side tables
    # (simhash/minhash/ann vocab hashing) — cache it per sf instead of
    # paying that setup once per parameterized test
    return Q.oracle_sql(sf_dir)


def _check_parity(spark, con, name, sf_dir):
    spark_df = Q.queries()[name](spark, sf_dir).toPandas()
    duck_df = con.sql(_oracles_for(sf_dir)[name]).df()
    assert sorted(spark_df.columns) == sorted(duck_df.columns), "column names differ"
    assert len(spark_df) == len(duck_df), "row counts differ"
    a, b = normalize(spark_df), normalize(duck_df)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


@pytest.mark.parametrize("name", NAMES)
def test_parity(spark, con, name):
    _check_parity(spark, con, name, SF_DIR)


SF_DIR_SLOW = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con_slow():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR_SLOW}/{t}.parquet'")
    return c


@pytest.mark.slow
@pytest.mark.parametrize("name", NAMES)
def test_parity_sf001(spark, con_slow, name):
    """Driver-gate scale (sf0.01): run with `pytest -m slow`."""
    _check_parity(spark, con_slow, name, SF_DIR_SLOW)


def test_all_queries_have_entries():
    qs = Q.queries()
    assert len(qs) >= 20
    # every oracle key must exist in queries
    assert set(ORACLES) <= set(qs)


def test_registry_window_math():
    """ADVICE r5 (medium): the rotation policy's window math must not
    silently drift — the documented total is pinned to the real count,
    and the round's changed/new queries must sit INSIDE the driver's
    front-first sample window."""
    qs = Q.queries()
    assert len(qs) == Q.REGISTRY_TOTAL, (
        f"registry has {len(qs)} entries but REGISTRY_TOTAL={Q.REGISTRY_TOTAL}; "
        "update the constant AND rotate changed queries into the window"
    )
    window = list(qs)[: Q.DRIVER_SAMPLE_CAP]
    # r7 changed set (optimization round — implementations changed,
    # results identical) — update each round alongside the rotation
    for name in [
        "ngram_jaccard",
        "dedup_clusters",
        "dataset_split",
        "dedup_keep_best",
        "minhash_lsh_pairs",
        "substring_dedup",
        "gopher_repetition",
        "decontaminate",
        "term_stats_topk",
        "semdedup",
        "geo_s2_bbox_scan",
    ]:
        assert name in window, f"r7-changed query {name} fell outside the sample window"


def test_semdedup_cluster_skew(spark):
    """VERDICT r5 #6: semdedup's n²/K bound is only real if the Lloyd
    centroids yield BOUNDED cluster sizes. Pin K scaling and the
    realized max-cluster fraction (≤ 3× uniform) on the driver table."""
    cents = Q._semdedup_centroids(SF_DIR)
    k = len(cents)
    assert 8 <= k <= Q.SEMDEDUP_K_MAX
    counts = (
        Q.q_semdedup(spark, SF_DIR)
        .groupBy("list_id")
        .count()
        .collect()
    )
    total = sum(r["count"] for r in counts)
    mx = max(r["count"] for r in counts)
    assert len(counts) == k, "every Lloyd cluster must be non-empty"
    assert mx / total <= 3.0 / k, f"max cluster {mx}/{total} breaches 3x uniform at K={k}"
