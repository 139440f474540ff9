"""The physical timestamp type of source parquet is a generator detail.

The same logical events table has shipped as TIMESTAMP(NANOS) (scans
as a nano-epoch long under ``nanosAsLong``), as timestamp[us] without
isAdjustedToUTC (scans as TIMESTAMP_NTZ), and could ship as
timestamp[us] adjusted-to-UTC (scans as TIMESTAMP).  A driver-side
regeneration flipping between these broke a whole query family once —
these tests pin that every ingest path gives identical results on all
three physical encodings of the same logical data.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dfx_indicators_etl_spark.plans import QUERIES
from dfx_indicators_etl_spark.sources import read_table
from dfx_indicators_etl_spark.streaming import ops as stream_ops

N_ROWS = 400
N_USERS = 10
BASE_US = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z in µs


def _events_arrays():
    """Deterministic mini event log: per-user bursts with >30-min gaps
    so sessionization has real structure to get wrong."""
    event_id, ts_us, user_id, event_type, value = [], [], [], [], []
    for i in range(N_ROWS):
        u = i % N_USERS
        burst, pos = divmod(i // N_USERS, 4)
        event_id.append(i)
        # bursts 2h apart per user; events 5 min apart inside a burst
        ts_us.append(BASE_US + u * 37_000_000 + burst * 7_200_000_000 + pos * 300_000_000)
        user_id.append(u)
        event_type.append(("view", "click", "purchase", "view")[i % 4])
        value.append(round((i * 7 % 100) / 4.0, 2))
    return event_id, ts_us, user_id, event_type, value


def _write_flavor(path: str, flavor: str) -> None:
    event_id, ts_us, user_id, event_type, value = _events_arrays()
    ts_type = {
        "ns": pa.timestamp("ns"),
        "us_ntz": pa.timestamp("us"),
        "us_utc": pa.timestamp("us", tz="UTC"),
    }[flavor]
    scale = 1000 if flavor == "ns" else 1
    table = pa.table(
        {
            "event_id": pa.array(event_id, pa.int64()),
            "ts": pa.array([t * scale for t in ts_us], pa.int64()).cast(ts_type),
            "user_id": pa.array(user_id, pa.int64()),
            "event_type": pa.array(event_type, pa.string()),
            "value": pa.array(value, pa.float64()),
            "props": pa.array(["{}"] * N_ROWS, pa.string()),
        }
    )
    pq.write_table(table, path)


@pytest.fixture(scope="module")
def flavor_dirs(tmp_path_factory):
    """One sf-dir per physical flavor, identical logical content."""
    dirs = {}
    for flavor in ("ns", "us_ntz", "us_utc"):
        d = tmp_path_factory.mktemp(f"tsrobust_{flavor}")
        _write_flavor(str(d / "events.parquet"), flavor)
        dirs[flavor] = str(d)
    return dirs


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_read_table_normalizes_all_flavors(spark, flavor_dirs):
    results = {}
    for flavor, d in flavor_dirs.items():
        df = read_table(spark, d, "events")
        assert dict(df.dtypes)["ts"] == "timestamp", flavor
        results[flavor] = _canon(df)
    assert results["ns"] == results["us_ntz"] == results["us_utc"]


def test_batch_sessionize_agrees_across_flavors(spark, flavor_dirs):
    results = {
        flavor: _canon(QUERIES["q_events_sessionize"](spark, d))
        for flavor, d in flavor_dirs.items()
    }
    assert results["ns"] == results["us_ntz"] == results["us_utc"]
    # multiple bursts per user → >1 session each; sanity, not tautology
    assert any(r[1] > 1 for r in results["ns"])


def test_asof_nearest_agrees_across_flavors(spark, flavor_dirs):
    results = {
        flavor: _canon(QUERIES["q_asof_nearest"](spark, d))
        for flavor, d in flavor_dirs.items()
    }
    assert results["ns"] == results["us_ntz"] == results["us_utc"]
    assert len(results["ns"]) > 0


def test_streaming_window_counts_agree_across_flavors(spark, flavor_dirs):
    results = {}
    for flavor, d in flavor_dirs.items():
        stream = stream_ops.read_events_stream(spark, d)
        assert dict(stream.dtypes)["ts"] == "timestamp", flavor
        windowed = stream_ops.windowed_event_counts(
            stream, window="1 hour", watermark="2 hours"
        )
        results[flavor] = _canon(
            stream_ops.run_available_now(windowed, output_mode="complete")
        )
    assert results["ns"] == results["us_ntz"] == results["us_utc"]
    # bursts 2h apart → many distinct windows, not one collapsed bucket
    assert len({r[0] for r in results["ns"]}) > 5


def test_round5_ts_queries_agree_across_flavors(spark, flavor_dirs):
    """The round-5 event-time queries (funnel, weekly cohort, native
    session windows) must be flavor-independent like the rest of the
    timestamp family."""
    for key in (
        "q_funnel_conversion",
        "q_retention_cohort",
        "q_session_window_native",
    ):
        results = {
            flavor: _canon(QUERIES[key](spark, d))
            for flavor, d in flavor_dirs.items()
        }
        assert results["ns"] == results["us_ntz"] == results["us_utc"], key
        assert len(results["ns"]) > 0, key
