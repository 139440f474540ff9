"""Skew-mitigation operators: salting must be semantically invisible."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dfx_indicators_etl_spark.operators.scale import salted_agg, salted_join
from dfx_indicators_etl_spark.sources import read_table


def test_salted_join_equals_plain_join(spark, sf_dir):
    events = read_table(spark, sf_dir, "events")
    nation = read_table(spark, sf_dir, "nation").withColumnRenamed(
        "n_nationkey", "user_mod"
    )
    fact = events.withColumn("user_mod", F.col("user_id") % 25)
    plain = {
        (r.event_id, r.n_name)
        for r in fact.join(nation, "user_mod").select("event_id", "n_name").collect()
    }
    salted = {
        (r.event_id, r.n_name)
        for r in salted_join(fact, nation, "user_mod", salt_buckets=8, salt_on="event_id")
        .select("event_id", "n_name")
        .collect()
    }
    assert salted == plain


def test_salted_agg_rejects_non_decomposable(spark, sf_dir):
    events = read_table(spark, sf_dir, "events")
    with pytest.raises(ValueError, match="non-decomposable"):
        salted_agg(events, ["event_type"], {"m": ("median", "value")})
