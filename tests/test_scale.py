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


def test_scaling_probe_upscale_is_true_kx(spark, tmp_path, monkeypatch):
    """The scaling probe's upscaled tables are true K× instances:
    K× rows, K× distinct keys (no fan-out), and per-replica-perturbed
    document tokens (replicas are not near-dups of each other)."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    monkeypatch.setenv("SPARK_GRAFT_SCALE_BASE", "/root/testdata/sf0.001")
    import importlib

    import scaling_probe

    importlib.reload(scaling_probe)
    scaling_probe.upscale(spark, "documents", 2, str(tmp_path))
    base = read_table(spark, "/root/testdata/sf0.001", "documents")
    up = spark.read.parquet(f"{tmp_path}/documents.parquet")
    assert up.count() == 2 * base.count()
    assert (
        up.select("doc_id").distinct().count()
        == 2 * base.select("doc_id").distinct().count()
    )
    # replica tokens perturbed: no text collisions across replicas
    assert up.select("text").distinct().count() == 2 * base.select(
        "text"
    ).distinct().count()

    scaling_probe.upscale(spark, "orders", 2, str(tmp_path))
    orders = spark.read.parquet(f"{tmp_path}/orders.parquet")
    base_orders = read_table(spark, "/root/testdata/sf0.001", "orders")
    # join keys offset on BOTH columns → distinct custkeys double too
    assert (
        orders.select("o_custkey").distinct().count()
        == 2 * base_orders.select("o_custkey").distinct().count()
    )
