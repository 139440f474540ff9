"""Batch B: indicator-model queries vs DuckDB oracles + operator unit
tests on hand-built frames (edge cases the sf data may not hit)."""

from __future__ import annotations

import pytest

from dfx_indicators_etl_spark.operators import indicator as ops
from dfx_indicators_etl_spark.plans import ORACLES, QUERIES

from .test_analytics import _normalize

INDICATOR_KEYS = [k for k in QUERIES if k.startswith("ind_")]


@pytest.mark.parametrize("name", INDICATOR_KEYS)
def test_matches_oracle(name, spark, duck, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    spark_rows = [tuple(r) for r in df.collect()]
    if name not in ORACLES:
        assert len(spark_rows) >= 0
        return
    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(df.columns) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows)
    assert _normalize(spark_rows, df.columns) == _normalize(duck_rows, duck_cols)


def test_combine_dimensions_edges(spark):
    df = spark.createDataFrame(
        [
            (1, "Female", "15-24"),   # plain join
            (2, "Total", None),       # Total → All sex; null skipped
            (3, None, None),          # nothing → Total
            (4, "total", "Total"),    # case-insensitive Total
        ],
        ["id", "dimension_sex", "dimension_age_group"],
    )
    out = {
        r["id"]: r["dimension"]
        for r in ops.combine_dimensions(df, prefix="dimension_").collect()
    }
    assert out == {
        1: "Female; 15-24",
        2: "All sex",
        3: "Total",
        4: "All sex; All age group",
    }
    assert "dimension_sex" not in ops.combine_dimensions(df).columns


def test_combine_dimensions_noop_cases(spark):
    already = spark.createDataFrame([(1, "X")], ["id", "dimension"])
    assert ops.combine_dimensions(already).collect()[0]["dimension"] == "X"
    no_dims = spark.createDataFrame([(1,)], ["id"])
    assert ops.combine_dimensions(no_dims).collect()[0]["dimension"] == "Total"


def test_snake_case_columns(spark):
    df = spark.createDataFrame([(1, 2)], ["Time Period", " Obs  Value "])
    assert ops.snake_case_columns(df).columns == ["time_period", "obs_value"]
    assert ops.snake_case_columns(df, prefix="dim").columns[0] == "dim_time_period"


def test_upsert_and_insert_ignore(spark):
    existing = spark.createDataFrame([("a", 1, 10.0), ("b", 1, 20.0)], ["k", "v", "x"])
    incoming = spark.createDataFrame(
        [("b", 2, 99.0), ("b", 3, 98.0), ("c", 1, 30.0)], ["k", "v", "x"]
    )
    from pyspark.sql import functions as F

    up = ops.upsert(existing, incoming, ["k"], [F.col("v").desc()])
    assert {(r["k"], r["v"]) for r in up.collect()} == {("a", 1), ("b", 3), ("c", 1)}
    ig = ops.insert_ignore(existing, incoming, ["k"], [F.col("v").desc()])
    assert {(r["k"], r["v"]) for r in ig.collect()} == {("a", 1), ("b", 1), ("c", 1)}


def test_map_country_metadata_nonmatch_nulls(spark):
    df = spark.createDataFrame([(1, "DZA"), (2, "XXX")], ["id", "code"])
    mapping = spark.createDataFrame([("DZA", "Algeria")], ["iso3", "name"])
    out = {
        r["id"]: r["code"]
        for r in ops.map_country_metadata(df, mapping, "code", "iso3", "name").collect()
    }
    assert out == {1: "Algeria", 2: None}
