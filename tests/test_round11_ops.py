"""Round-11 operators: the hot-group bound for per-group cumulative
stages (VERDICT r10 #3) — ``grouped_running_sum`` and its consumers
``weighted_percentiles`` / ``histogram_percentiles`` pinned
bit-identical on the window path and the range-partition offsets path.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F


def _grouped_frame(spark):
    """One HOT group (200 distinct values — straddles many range
    partitions at local[32]), one NULL group key large enough to
    straddle too, and two small single-partition groups, with exact
    decimal weights."""
    rows = []
    for i in range(200):
        rows.append(("hot", i, Decimal(f"{(i * 13) % 97}.{i % 100:02d}")))
    for i in range(80):
        rows.append((None, i, Decimal(f"{(i * 7) % 31}.{i % 100:02d}")))
    for g, n in [("a", 3), ("b", 5)]:
        for i in range(n):
            rows.append((g, i, Decimal(f"{i}.5000")))
    return spark.createDataFrame(
        rows, "g string, v long, d decimal(18,4)"
    )


def test_grouped_running_sum_matches_partitioned_window(spark):
    """Offsets path == partitioned window path for int counts and
    exact decimals, hot + NULL-key straddler groups included."""
    from pyspark.sql import Window

    from dfx_indicators_etl_spark.operators.scale import grouped_running_sum

    df = _grouped_frame(spark)
    order = [F.col("v").asc()]
    w = (
        Window.partitionBy("g")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for col in ["v", "d"]:
        want = {
            (r["g"], r["v"]): r["cum"]
            for r in df.withColumn("cum", F.sum(col).over(w)).collect()
        }
        got = {
            (r["g"], r["v"]): r["cum"]
            for r in grouped_running_sum(
                df.repartition(7),
                ["g"],
                col,
                order,
                "cum",
                small_rows_threshold=0,
            ).collect()
        }
        assert got == want, col
        # and the small path is the window verbatim
        small = {
            (r["g"], r["v"]): r["cum"]
            for r in grouped_running_sum(
                df, ["g"], col, order, "cum"
            ).collect()
        }
        assert small == want, col


def test_grouped_running_sum_empty_groups_delegates_global(spark):
    """group_cols=[] must route through global_running_sum (no
    unpartitioned window on the large path)."""
    from pyspark.sql import Window

    from dfx_indicators_etl_spark.operators.scale import grouped_running_sum

    df = spark.createDataFrame(
        [(i, (i * 3) % 7) for i in range(40)], "id long, v long"
    )
    w = Window.orderBy("id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        r["id"]: r["cum"]
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    got = {
        r["id"]: r["cum"]
        for r in grouped_running_sum(
            df, [], "v", [F.col("id")], "cum", small_rows_threshold=0
        ).collect()
    }
    assert got == want


def test_weighted_percentiles_both_paths_identical(spark):
    """The registered weighted-percentile shape (integer×decimal rank
    conditions) is bit-identical whether the cumulative stage ran the
    partitioned window or the offsets algebra."""
    from dfx_indicators_etl_spark.operators.scale import weighted_percentiles

    df = _grouped_frame(spark).withColumn(
        "wgt", F.col("d") + Decimal("0.0001")
    )
    probs = {"p25": (1, 4), "p50": (1, 2), "p90": (9, 10)}
    small = weighted_percentiles(
        df, ["g"], "v", "wgt", probs, total_col="tot"
    ).collect()
    large = weighted_percentiles(
        df, ["g"], "v", "wgt", probs, total_col="tot",
        hist_window_max_rows=0,
    ).collect()
    key = lambda r: (r["g"] is None, r["g"])  # noqa: E731
    assert sorted(
        [tuple(r) for r in small], key=lambda t: (t[0] is None, t)
    ) == sorted([tuple(r) for r in large], key=lambda t: (t[0] is None, t))
    assert len(small) == 4


def test_histogram_percentiles_both_paths_identical(spark):
    """The interpolated-percentile picker shares the hot-group bound:
    grouped flavor pinned identical on both cumulative paths."""
    from dfx_indicators_etl_spark.operators.scale import (
        histogram_percentiles,
    )

    df = _grouped_frame(spark)
    probs = {"p50": 0.5, "p95": 0.95}
    small = {
        r["g"]: (r["p50"], r["p95"])
        for r in histogram_percentiles(df, ["g"], "v", probs).collect()
    }
    large = {
        r["g"]: (r["p50"], r["p95"])
        for r in histogram_percentiles(
            df, ["g"], "v", probs, hist_window_max_rows=0
        ).collect()
    }
    assert small == large
    assert len(small) == 4


def _palette_png() -> bytes:
    """A REAL, spec-conformant 2×2 palette PNG (color type 3, valid
    CRCs, inflatable IDAT) — decodable by any PNG tool, NOT by the
    engine's truecolor/grayscale-only codec."""
    import struct
    import zlib

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)  # color=3 palette
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    raw = b"\x00\x00\x01" + b"\x00\x02\x00"  # 2 scanlines, filter None
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _mulaw_wav() -> bytes:
    """A REAL µ-law WAV (format code 7) — a conformant RIFF stream any
    audio tool parses, NOT PCM, so the engine's codec must refuse it."""
    import struct

    fmt = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)  # format=7 µ-law
    data = bytes(range(64))
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_unsupported_real_payloads_raise_at_codec_boundary(spark):
    """VERDICT r10 #6: a REAL-but-unsupported payload (palette PNG,
    µ-law WAV) must raise the documented NotImplementedError through
    the decode seam — never mis-decode. Function-level first (exact
    message), then through the mapInPandas seam in a frame that also
    carries a decodable row, proving the boundary fires per-payload
    inside a healthy batch."""
    import pytest as _pytest

    from dfx_indicators_etl_spark.operators import multimodal as M

    with _pytest.raises(NotImplementedError, match="color=3"):
        M.png_decode(_palette_png())
    with _pytest.raises(NotImplementedError, match="format=7"):
        M.wav_decode(_mulaw_wav())

    for payload, mtype in [
        (_palette_png(), "image/png"),
        (_mulaw_wav(), "audio/wav"),
    ]:
        df = spark.createDataFrame(
            [
                (1, bytearray(payload), mtype),
                (2, bytearray(b"0123456789abcdef"), "image/fake"),
            ],
            "doc_id long, payload binary, media_type string",
        )
        with _pytest.raises(Exception, match="NotImplemented|color=3|format=7"):
            M.decode_features(df).collect()


def test_wav_odd_length_pcm_roundtrips_word_aligned(spark):
    """RIFF pad-byte conformance (ADVICE r10): an odd-length PCM
    payload encodes with the word-alignment pad and still round-trips
    — including when data is NOT the last chunk a reader walks."""
    from dfx_indicators_etl_spark.operators import multimodal as M

    pcm = bytes(range(33))  # odd length
    wav = M.wav_encode(pcm, n_channels=1, sample_rate=8000, bits=8)
    assert len(wav) % 2 == 0  # padded stream is word-aligned
    n_ch, rate, n_samples, back = M.wav_decode(wav)
    assert (n_ch, rate, n_samples) == (1, 8000, 33)
    assert back == pcm


def test_grouped_lag_matches_partitioned_window(spark):
    """Boundary-handoff lag == partitioned window lag: hot + NULL-key
    straddler groups, NULL values in the lagged column, and the
    previous-row-exists indicator matching lag(lit(True)) exactly."""
    from pyspark.sql import Window

    from dfx_indicators_etl_spark.operators.scale import grouped_lag

    df = _grouped_frame(spark).withColumn(
        "dn", F.when(F.col("v") % 7 != 0, F.col("d"))  # NULLs sprinkled in
    )
    order = [F.col("v").asc()]
    w = Window.partitionBy("g").orderBy(*order)
    want = {
        (r["g"], r["v"]): (r["prev"], r["has"])
        for r in df.withColumn("prev", F.lag("dn").over(w))
        .withColumn("has", F.lag(F.lit(True)).over(w))
        .collect()
    }
    for thresh in [None, 0]:  # small path, then forced offsets path
        kw = {} if thresh is None else {"small_rows_threshold": 0}
        got = {
            (r["g"], r["v"]): (r["prev"], r["has"])
            for r in grouped_lag(
                df.repartition(7), ["g"], "dn", order, "prev",
                exists_col="has", **kw,
            ).collect()
        }
        assert got == want, thresh


def test_grouped_lag_no_straddlers_and_empty(spark):
    from dfx_indicators_etl_spark.operators.scale import grouped_lag

    # tiny groups: no straddlers on the forced-large path
    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("b", 1, 30)], "g string, v long, x long"
    )
    got = {
        (r["g"], r["v"]): r["p"]
        for r in grouped_lag(
            df, ["g"], "x", [F.col("v")], "p", small_rows_threshold=0
        ).collect()
    }
    assert got == {("a", 1): None, ("a", 2): 10, ("b", 1): None}
    empty = df.filter(F.lit(False))
    assert (
        grouped_lag(
            empty, ["g"], "x", [F.col("v")], "p", small_rows_threshold=0
        ).count()
        == 0
    )


def test_scd2_intervals_both_paths_identical(spark, sf_dir):
    """q_scd2_intervals' registered shape pinned bit-identical whether
    lag/lead ran the per-key window or the boundary-handoff algebra."""
    from pyspark.sql import functions as F2

    from dfx_indicators_etl_spark.operators.indicator import scd2_intervals
    from dfx_indicators_etl_spark.sources import read_table

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    kw = dict(
        key_cols=["user_id"], attr_col="event_type",
        ts_col="ts", tiebreak_col="event_id",
    )
    small = sorted(map(tuple, scd2_intervals(ev, **kw).collect()), key=repr)
    large = sorted(
        map(tuple, scd2_intervals(ev, window_max_rows=0, **kw).collect()),
        key=repr,
    )
    assert small == large and len(small) > 0
    # hot-entity shape: one user carries almost every change
    hot = ev.withColumn(
        "user_id", F2.when(F2.col("event_id") % 20 == 0, F2.col("user_id"))
        .otherwise(F2.lit(7))
    )
    s2 = sorted(map(tuple, scd2_intervals(hot, **kw).collect()), key=repr)
    l2 = sorted(
        map(tuple, scd2_intervals(hot, window_max_rows=0, **kw).collect()),
        key=repr,
    )
    assert s2 == l2


def test_stage_time_slices_contiguous_and_lossless(spark, sf_dir, tmp_path):
    """The SCD2 landing contract: slices are event-time CONTIGUOUS
    (slice k's max ts ≤ slice k+1's min ts) and their union is the
    exact input — the property the per-batch change-capture
    compaction's healing argument rests on (a row's within-batch
    predecessor is its global predecessor except at slice
    boundaries)."""
    from dfx_indicators_etl_spark import streaming
    from dfx_indicators_etl_spark.sources import read_table

    events = read_table(spark, sf_dir, "events")
    landing = str(tmp_path / "landing")
    streaming.stage_time_slices(events, landing, n_batches=6)
    import glob as _glob

    files = sorted(_glob.glob(f"{landing}/slice-*.parquet"))
    assert len(files) == 6
    total, prev_max = 0, None
    for f in files:
        part = spark.read.parquet(f)
        n = part.count()
        total += n
        if n == 0:
            continue
        row = part.agg(
            F.min(F.unix_micros("ts")).alias("lo"),
            F.max(F.unix_micros("ts")).alias("hi"),
        ).collect()[0]
        if prev_max is not None:
            assert row["lo"] >= prev_max, f
        prev_max = row["hi"]
    assert total == events.count()


def test_locf_fill_hand_built(spark):
    """LOCF: filled years carry the PREVIOUS reported value unchanged,
    NULL reports never anchor, nothing extends past the last report."""
    from dfx_indicators_etl_spark.operators.indicator import locf_fill

    rows = [
        ("A", 2000, 1.5), ("A", 2001, None), ("A", 2003, 9.0),
        ("B", 2010, 4.0),
    ]
    df = spark.createDataFrame(rows, "k string, year int, value double")
    got = {
        (r["k"], r["year"]): (r["value"], r["filled"])
        for r in locf_fill(df, ["k"]).collect()
    }
    assert got == {
        ("A", 2000): (1.5, False),
        ("A", 2001): (1.5, True),   # carried over the NULL report
        ("A", 2002): (1.5, True),
        ("A", 2003): (9.0, False),  # no carry past the last report
        ("B", 2010): (4.0, False),
    }


def test_mode_category_deterministic_ties(spark, sf_dir):
    """The struct-arg-min mode breaks count ties to the smallest value
    and its count reconciles with a Python recount."""
    import collections

    from dfx_indicators_etl_spark.plans import QUERIES
    from dfx_indicators_etl_spark.sources import read_table

    got = {
        r["segment"]: (r["mode_priority"], r["mode_count"], r["n_orders"])
        for r in QUERIES["q_mode_category"](spark, sf_dir).collect()
    }
    cust = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in read_table(spark, sf_dir, "customer").collect()
    }
    counts: dict = collections.defaultdict(collections.Counter)
    for r in read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    ).collect():
        seg = cust.get(r["o_custkey"])
        if seg is not None:
            counts[seg][r["o_orderpriority"]] += 1
    for seg, ctr in counts.items():
        best = min(ctr.items(), key=lambda kv: (-kv[1], kv[0]))
        assert got[seg] == (best[0], best[1], sum(ctr.values())), seg


def test_user_stickiness_bounds(spark, sf_dir):
    """avg_dau ≤ mau (a day's actives are a subset of the month's), so
    stickiness ∈ (0, 1]."""
    from dfx_indicators_etl_spark.plans import QUERIES

    rows = QUERIES["q_user_stickiness"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["stickiness"] <= 1.0
        assert r["avg_dau"] <= r["mau"]
