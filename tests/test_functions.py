"""Unit tests for the scalar function library (functions/)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ed_fi_x_tpdm_data_ingestion_poc_spark import functions as EF


def test_descriptor_uri_literal_map(spark):
    df = spark.createDataFrame([("M",), ("F",), ("X",), (None,)], "code string")
    out = df.select(
        EF.descriptor_uri("code", {"M": "uri://ns", "F": "uri://ns"}).alias("u")
    ).collect()
    assert [r.u for r in out] == ["uri://ns#M", "uri://ns#F", "X", None]


def test_iso_formats(spark):
    df = spark.createDataFrame([("2024-03-05 06:07:08.123",)], "t string").select(
        F.col("t").cast("timestamp").alias("t")
    )
    row = df.select(
        EF.iso_date("t").alias("d"), EF.iso_timestamp("t").alias("ts")
    ).first()
    assert row.d == "2024-03-05"
    assert row.ts.startswith("2024-03-05T06:07:08.123")


def test_null_if_sentinel(spark):
    df = spark.createDataFrame([("[null]",), ("x",), (None,)], "v string")
    out = [r.o for r in df.select(EF.null_if_sentinel("v").alias("o")).collect()]
    assert out == [None, "x", None]


def test_equality_filter_and_paginate(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", None if i == 3 else i * 10) for i in range(10)],
        "id long, grp string, val long",
    )
    assert EF.equality_filter(df, {"grp": "a"}).count() == 5
    assert EF.equality_filter(df, {"grp": "b", "val": None}).count() == 1
    page = EF.paginate(df, ["id"], offset=4, limit=3).select("id").collect()
    assert [r.id for r in page] == [4, 5, 6]


def test_reexported_text_functions(spark):
    df = spark.createDataFrame([("the cat sat on the mat",)], "text string")
    row = df.select(
        EF.token_count("text").alias("n"), EF.lang_id("text").alias("lang")
    ).first()
    assert row.n == 6 and row.lang == "en"
