"""Validate the pure-Python XXH64 against Spark's xxhash64 bit-for-bit:
strings (short / 4-byte tail / >32-byte stripes), int-literal seed
chaining (the minhash construction), and long-column chaining (the band
bucket construction)."""

import pytest
from pyspark.sql import functions as F

from cosmospark.xxh import Long, xxhash64

STRINGS = [
    "",
    "a",
    "abc",
    "abcd",
    "word",
    "the quick brown fox",
    "the quick brown fox jumps over the lazy dog again and again",  # > 32 bytes
    "exactly32bytes_0123456789abcdef!",
    "accented: déjà vu — ünïcode ✓",
]


def test_string_hashes_match_spark(spark):
    df = spark.createDataFrame([(s,) for s in STRINGS], "s string")
    got = {
        r["s"]: r["h"]
        for r in df.select("s", F.xxhash64("s").alias("h")).collect()
    }
    for s in STRINGS:
        assert xxhash64(s) == got[s], s


def test_seeded_chain_matches_spark(spark):
    # the minhash construction: xxhash64(shingle, <int literal seed>)
    df = spark.createDataFrame([(s,) for s in STRINGS], "s string")
    for seed in (0, 1, 7, 15):
        got = {
            r["s"]: r["h"]
            for r in df.select("s", F.expr(f"xxhash64(s, {seed})").alias("h")).collect()
        }
        for s in STRINGS:
            assert xxhash64(s, seed) == got[s], (s, seed)


def test_long_chain_matches_spark(spark):
    # the band-bucket construction: xxhash64(mh0, mh1, mh2, mh3) over longs
    rows = [
        (1, 2, 3, 4),
        (-5, 0, 2**40, -(2**50)),
        (7540113804746346429, -123456789012345, 42, 0),
    ]
    df = spark.createDataFrame(rows, "a long, b long, c long, d long")
    got = [r["h"] for r in df.select(F.xxhash64("a", "b", "c", "d").alias("h")).collect()]
    for (a, b, c, d), h in zip(rows, got):
        assert xxhash64(Long(a), Long(b), Long(c), Long(d)) == h


def test_int_vs_long_paths_differ():
    assert xxhash64(7) != xxhash64(Long(7))
