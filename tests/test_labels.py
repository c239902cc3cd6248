"""Golden label tests — expected strings copied verbatim from the
reference's unit tests (src/zone_ext.rs:452-528)."""

import pytest
from pyspark.sql import functions as F, types as T

from cosmospark.labels import (
    compute_labels,
    compute_names,
    parent_chain,
    with_international_names,
    with_zip_codes,
)

SCHEMA = (
    "id long, name string, parent long, zip_codes array<string>, "
    "international_names map<string,string>"
)


def label_of(spark, rows, zone_id=0, filter_langs=None):
    df = spark.createDataFrame(rows, SCHEMA)
    out = compute_labels(df, filter_langs=filter_langs)
    return {r["id"]: r for r in out.collect()}[zone_id]


class TestLabels:
    def test_simple_label(self, spark):
        # simple_label_test (zone_ext.rs:452-459)
        r = label_of(spark, [(0, "toto", None, [], {})])
        assert r["label"] == "toto"

    def test_label_with_zip_and_parent(self, spark):
        # label_with_zip_and_parent (zone_ext.rs:462-472)
        rows = [
            (0, "bob", 1, ["75020", "75021", "75022"], {}),
            (1, "bob sur mer", 2, ["75"], {}),
            (2, "bobette's land", None, [], {}),
        ]
        r = label_of(spark, rows)
        assert r["label"] == "bob (75020-75022), bob sur mer, bobette's land"

    def test_consecutive_dedup(self, spark):
        # label_with_zip_and_double_parent (zone_ext.rs:475-489)
        rows = [
            (0, "bob", 1, ["75020"], {}),
            (1, "bob", 2, [], {}),
            (2, "bob", 3, [], {}),
            (3, "bob sur mer", 4, ["75"], {}),
            (4, "bob sur mer", 5, ["75"], {}),
            (5, "bobette's land", None, [], {}),
        ]
        r = label_of(spark, rows)
        assert r["label"] == "bob (75020), bob sur mer, bobette's land"

    def test_non_consecutive_repeat_survives(self, spark):
        # label_with_zip_and_parent_named_as_zone (zone_ext.rs:492-504)
        rows = [
            (0, "bob", 1, ["75020"], {}),
            (1, "bob sur mer", 2, ["75"], {}),
            (2, "bob", None, [], {}),
        ]
        r = label_of(spark, rows)
        assert r["label"] == "bob (75020), bob sur mer, bob"

    def test_international_labels(self, spark):
        rows = [
            (0, "bob", 1, ["75020"], {"fr": "bobby", "de": "bobisch"}),
            (1, "land", None, [], {"de": "landisch"}),
        ]
        r = label_of(spark, rows)
        assert r["international_labels"] == {
            "fr": "bobby (75020), land",
            "de": "bobisch (75020), landisch",
        }

    def test_filter_langs(self, spark):
        rows = [
            (0, "bob", 1, [], {"fr": "bobby", "de": "bobisch"}),
            (1, "land", None, [], {}),
        ]
        r = label_of(spark, rows, filter_langs=["fr"])
        assert set(r["international_labels"].keys()) == {"fr"}


class TestInternationalNames:
    def test_extraction(self, spark):
        # test_international_names (zone_ext.rs:507-528): values equal to
        # the default name are dropped
        df = spark.createDataFrame(
            [
                (
                    "bob",
                    {
                        "another_tag": "useless",
                        "name:fr": "bob",
                        "name:es": "bobito",
                        "name": "bobito",
                        "name:a_strange_lang_name": "bibi",
                    },
                )
            ],
            "name string, tags map<string,string>",
        )
        got = with_international_names(df).collect()[0]["international_names"]
        assert got == {"es": "bobito", "a_strange_lang_name": "bibi"}


class TestComputeNames:
    SCHEMA = (
        "id long, name string, zone_type string, wikidata string, "
        "tags map<string,string>, center_tags map<string,string>"
    )

    def test_merge_when_wikidata_matches(self, spark):
        df = spark.createDataFrame(
            [(0, "a", "state", "Q1", {"name:fr": "aa"}, {"wikidata": "Q1", "name:de": "ab"})],
            self.SCHEMA,
        )
        tags = compute_names(df).collect()[0]["tags"]
        assert tags == {"name:fr": "aa", "name:de": "ab"}

    def test_no_merge_when_wikidata_differs(self, spark):
        df = spark.createDataFrame(
            [(0, "a", "city", "Q1", {}, {"wikidata": "Q2", "name:de": "ab"})],
            self.SCHEMA,
        )
        tags = compute_names(df).collect()[0]["tags"]
        assert tags == {}

    def test_city_merge_when_wikidata_missing(self, spark):
        df = spark.createDataFrame(
            [(0, "a", "city", None, {"name:fr": "keep"}, {"name:fr": "drop", "name:de": "ab"})],
            self.SCHEMA,
        )
        tags = compute_names(df).collect()[0]["tags"]
        # zone's own tag wins (entry().or_insert semantics)
        assert tags == {"name:fr": "keep", "name:de": "ab"}


class TestZipCodes:
    def test_split_sort(self, spark):
        df = spark.createDataFrame(
            [({"addr:postcode": "75021;75020;75022"},), ({},), ({"postal_code": "10"},)],
            "tags map<string,string>",
        )
        got = [r["zip_codes"] for r in with_zip_codes(df).collect()]
        assert got == [["75020", "75021", "75022"], [], ["10"]]


class TestParentChain:
    def test_depth_and_cycle_guard(self, spark):
        rows = [(0, 1), (1, 2), (2, None), (3, 4), (4, 3)]  # 3<->4 is a cycle
        df = spark.createDataFrame(rows, "id long, parent long")
        chain = parent_chain(df)
        got = {(r["id"], r["anc"], r["depth"]) for r in chain.collect()}
        assert {(0, 0, 0), (0, 1, 1), (0, 2, 2), (1, 1, 0), (1, 2, 1), (2, 2, 0)} <= got
        # the cycle terminates (bounded depth), rather than hanging
        assert max(d for (_, _, d) in got) <= 12
