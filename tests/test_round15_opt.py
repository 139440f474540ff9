"""Round-15 optimization pins: env-scalable drain timeouts and the
stream state-partition override path (VERDICT r14 #3/#9)."""

from __future__ import annotations

import os

import pytest

from dfx_indicators_etl_spark.streaming import (
    drain_timeout_sec,
    stream_state_partitions,
)


@pytest.fixture()
def _clean_env(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_DRAIN_TIMEOUT_SCALE", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS", raising=False)


def test_drain_timeout_default_is_base(_clean_env):
    assert drain_timeout_sec(120) == 120
    assert drain_timeout_sec(300) == 300


def test_drain_timeout_env_scales(monkeypatch, _clean_env):
    monkeypatch.setenv("SPARK_GRAFT_DRAIN_TIMEOUT_SCALE", "2.5")
    assert drain_timeout_sec(120) == 300
    # a down-scale can never reach zero — drains always get >= 1 s
    monkeypatch.setenv("SPARK_GRAFT_DRAIN_TIMEOUT_SCALE", "0.0001")
    assert drain_timeout_sec(120) == 1
    # empty string falls back to the base (robust to `VAR=` exports)
    monkeypatch.setenv("SPARK_GRAFT_DRAIN_TIMEOUT_SCALE", "")
    assert drain_timeout_sec(120) == 120


def test_stream_state_partitions_env_override(monkeypatch, spark, _clean_env):
    default = stream_state_partitions(spark)
    assert 2 <= default <= 8  # sized to bench-scale state volume
    monkeypatch.setenv("SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS", "64")
    assert stream_state_partitions(spark) == 64  # production re-shard path
    monkeypatch.setenv("SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS", "0")
    assert stream_state_partitions(spark) == 1  # floor


def test_drain_timeout_applied_at_await(monkeypatch, _clean_env):
    """run_available_now consults the scaled value, not the raw base."""
    import dfx_indicators_etl_spark.streaming.ops as ops

    monkeypatch.setenv("SPARK_GRAFT_DRAIN_TIMEOUT_SCALE", "3")
    assert ops.drain_timeout_sec(120) == 360
