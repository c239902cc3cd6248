"""Emulates the driver's correctness gate: run each queries() entry on
Spark and its oracle_sql() on DuckDB over the same parquet tables,
compare row count + column names + exact values (order-insensitive).

Runs at sf0.001 for speed; the driver runs the same at sf0.01.
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


@pytest.mark.parametrize("name", NAMES)
def test_parity(spark, con, name):
    spark_df = Q.queries()[name](spark, SF_DIR).toPandas()
    duck_df = con.sql(ORACLES[name]).df()
    assert sorted(spark_df.columns) == sorted(duck_df.columns), "column names differ"
    assert len(spark_df) == len(duck_df), "row counts differ"
    a, b = normalize(spark_df), normalize(duck_df)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_all_queries_have_entries():
    qs = Q.queries()
    assert len(qs) >= 20
    # every oracle key must exist in queries
    assert set(ORACLES) <= set(qs)
