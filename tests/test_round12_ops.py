"""Round-12 pins: first-touch late-arrival crediting (ADVICE r11),
the TTL attribution variant (VERDICT r11 #7), and NaN-aware carry
folds (ADVICE r11)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest


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


EVENTS_SCHEMA = (
    "user_id bigint, event_id bigint, event_type string, "
    "ts timestamp, value double"
)


def _drain(spark, tmp_path, src, build, out, ckpt):
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(src))
    )
    q = (
        build(stream)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / out))
        .option("checkpointLocation", str(tmp_path / ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "drain timed out"
    q.stop()


def test_first_touch_late_arrival_frame_exact(spark, tmp_path):
    """ADVICE r11: a purchase arriving in a LATER micro-batch with
    event time BEFORE the stored touch must credit 'direct' (the batch
    oracle's 1-PRECEDING frame), and an in-watermark late touch that
    is EARLIER in event time than the stored one re-points future
    purchases (the monotone-downward register)."""
    from dfx_indicators_etl_spark import streaming

    src = tmp_path / "src"
    src.mkdir()
    _write_events_file(spark, tmp_path, src, "f1", [
        (1, 30, "view", "2024-01-01 12:00:00", 0.0),   # stored touch
    ])
    _write_events_file(spark, tmp_path, src, "f2", [
        # event time BEFORE the stored 12:00 view → oracle says direct
        (1, 28, "purchase", "2024-01-01 10:30:00", 4.0),
        # late-but-in-watermark touch, earlier than the stored view:
        # folds the register down to (11:00, click)
        (1, 29, "click", "2024-01-01 11:00:00", 0.0),
        # after every touch → credits the (new) earliest touch
        (1, 31, "purchase", "2024-01-01 13:00:00", 6.0),
    ])
    _drain(
        spark, tmp_path, src,
        streaming.stream_first_touch_attribution, "out", "ckpt",
    )
    got = {
        r["event_id"]: r["touch"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert got == {28: "direct", 31: "click"}


def test_first_touch_ttl_restart_and_expiry(spark, tmp_path):
    """The TTL variant: purchases within 7 days of the first touch
    credit it; beyond 7 days they are 'direct'; a mid-backlog restart
    from the same checkpoint changes nothing."""
    from dfx_indicators_etl_spark import streaming

    src = tmp_path / "src"
    src.mkdir()
    _write_events_file(spark, tmp_path, src, "f1", [
        (1, 10, "click", "2024-01-01 10:00:00", 0.0),   # first touch
        (1, 11, "purchase", "2024-01-03 10:00:00", 5.0),  # +2d -> click
        (2, 20, "purchase", "2024-01-02 09:00:00", 7.0),  # no touch -> direct
    ])

    def build(stream):
        return streaming.stream_first_touch_attribution_ttl(stream)

    _drain(spark, tmp_path, src, build, "out", "ckpt")
    _write_events_file(spark, tmp_path, src, "f2", [
        (1, 12, "purchase", "2024-01-07 09:00:00", 3.0),  # +6d -> click
        (1, 13, "purchase", "2024-01-10 11:00:00", 9.0),  # +9d -> direct
        (2, 21, "view", "2024-01-09 08:00:00", 0.0),      # touch for user 2
        (2, 22, "purchase", "2024-01-12 08:30:00", 2.0),  # +3d -> view
    ])
    _drain(spark, tmp_path, src, build, "out", "ckpt")  # SAME checkpoint

    expect = {
        10: None, 11: "click", 20: "direct",
        12: "click", 13: "direct", 22: "view",
    }
    expect = {k: v for k, v in expect.items() if v is not None}
    got = {
        r["event_id"]: r["touch"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert got == expect

    # one-shot drain over the full backlog == the restarted pair
    _drain(spark, tmp_path, src, build, "out2", "ckpt2")
    oneshot = {
        r["event_id"]: r["touch"]
        for r in spark.read.parquet(str(tmp_path / "out2")).collect()
    }
    assert oneshot == expect


@pytest.mark.parametrize("kind", ["max", "min"])
def test_grouped_running_carry_nan_matches_window(spark, kind):
    """ADVICE r11: Spark max/min order float NaN as the LARGEST value;
    the above-threshold driver fold must match (Python max/min with
    NaN operands are order-dependent)."""
    from dfx_indicators_etl_spark.operators import scale as S

    nan = float("nan")
    rows = [
        # group "a": NaN arrives in the middle slice — Spark max
        # carries NaN forever after; Spark min ignores it
        ("a", 1, 5.0), ("a", 2, nan), ("a", 3, 1.0), ("a", 4, 7.0),
        # group "b": NaN first
        ("b", 1, nan), ("b", 2, 3.0), ("b", 3, 2.0),
        # group "c": no NaN
        ("c", 1, 4.0), ("c", 2, 6.0), ("c", 3, 5.0),
    ] * 40  # pad so range partitions actually split the hot groups
    rows = [
        (g, i * 10 + k, v)
        for k, (g, i, v) in enumerate(r for r in rows)
    ]
    df = spark.createDataFrame(rows, "g string, o bigint, v double")

    def run(threshold):
        out = S.grouped_running_carry(
            df, ["g"], "v", [F.col("o")], "carry",
            kind=kind, small_rows_threshold=threshold,
        )
        return sorted(
            (
                (r["g"], r["o"], None if r["carry"] is None
                 else ("nan" if math.isnan(r["carry"]) else r["carry"]))
                for r in out.collect()
            ),
        )

    window_path = run(10**9)   # below threshold → plain window
    scale_path = run(0)        # above threshold → partial fold
    assert scale_path == window_path


# ---------------------------------------------------------------------------
# Runtime-adaptive cosine pair generation (VERDICT r11 #2): the last
# prose-only scale swap, now routed in code. Both paths pinned on the
# demo corpus; the plan guard in test_plan_quality flags any NEW
# unrouted quadratic pair generator.


def _emb(spark):
    from dfx_indicators_etl_spark.sources import read_table

    return read_table(spark, "/root/testdata/sf0.01", "embeddings")


def test_cosine_pairs_banded_identical_on_demo_corpus(spark):
    """Forced banded path == exact path on the demo corpus (L=24,
    auto p=2 at n=500: per-pair miss probability ≈ (1−0.631²)^24 ≈
    5e-6 even at the 0.40 threshold boundary, and the planes are
    formula-deterministic, so this equality is a stable pin, not a
    flaky sample)."""
    from dfx_indicators_etl_spark.operators import similarity as S

    emb = _emb(spark)
    exact = {
        (r.id_a, r.id_b): r.cos_sim
        for r in S.embedding_cosine_pairs_exact(emb, 0.4).collect()
    }
    banded = {
        (r.id_a, r.id_b): r.cos_sim
        for r in S.banded_cosine_pairs(emb, 0.4, n_rows=500).collect()
    }
    assert banded == exact
    assert len(exact) > 0


def test_cosine_pairs_router_both_directions(spark):
    """The router picks exact at demo scale (blocked self-join plan —
    pb_a block columns present) and banded when forced above the
    threshold (bucket plan, no block-pair expansion), with identical
    results either way on the demo corpus."""
    from dfx_indicators_etl_spark.operators import similarity as S

    emb = _emb(spark)
    small = S.embedding_cosine_pairs(emb, 0.4, n_rows=500)
    large = S.embedding_cosine_pairs(
        emb, 0.4, n_rows=500, small_rows_threshold=0
    )
    p_small = small._jdf.queryExecution().executedPlan().toString()
    p_large = large._jdf.queryExecution().executedPlan().toString()
    assert "pb_a" in p_small and "pb_a" not in p_large
    rows = lambda df: sorted((r.id_a, r.id_b, r.cos_sim) for r in df.collect())  # noqa: E731
    assert rows(small) == rows(large)


def test_knn_banded_recall_gate(spark):
    """The banded kNN path recovers ≥ 0.95 of the exact mutual-kNN
    edges on the demo corpus (measured 0.9989 — one low-cosine tail
    edge substituted), and every common edge carries the identical
    rounded cosine."""
    from dfx_indicators_etl_spark.operators import similarity as S

    emb = _emb(spark)
    exact = {
        (r.id_a, r.id_b): r.cos_sim
        for r in S.knn_graph_exact(emb, k=5).collect()
    }
    banded = {
        (r.id_a, r.id_b): r.cos_sim
        for r in S.knn_graph_banded(emb, k=5, n_rows=500).collect()
    }
    common = set(exact) & set(banded)
    assert len(common) / len(exact) >= 0.95
    assert all(exact[e] == banded[e] for e in common)


def test_knn_router_both_directions(spark):
    """knn_graph routes exact below the threshold and banded above."""
    from dfx_indicators_etl_spark.operators import similarity as S

    emb = _emb(spark)
    small = S.knn_graph(emb, k=5, n_rows=500)
    large = S.knn_graph(emb, k=5, n_rows=500, small_rows_threshold=0)
    assert "pb_a" in small._jdf.queryExecution().executedPlan().toString()
    assert "pb_a" not in large._jdf.queryExecution().executedPlan().toString()


def test_fast_row_count_paths(spark, sf_dir):
    """The footer-metadata fast count is exact on unfiltered scans and
    falls back to a real count on anything cardinality-changing
    (VERDICT r11 #5) — routing decisions are identical on both probe
    paths by construction because both return the exact count."""
    from dfx_indicators_etl_spark.operators.scale import fast_row_count
    from dfx_indicators_etl_spark.sources import read_table

    ev = read_table(spark, sf_dir, "events")
    assert fast_row_count(ev) == ev.count()
    filt = ev.filter(F.col("event_type") == "click")
    assert fast_row_count(filt) == filt.count()
    lim = ev.limit(7)
    assert fast_row_count(lim) == 7
    ck = ev.localCheckpoint(eager=False)
    assert fast_row_count(ck) == ev.count()
    agg = ev.groupBy("event_type").count()
    assert fast_row_count(agg) == agg.count()


def test_rank_primitives_randomized_differential(spark):
    """Property-based differential pin for the RANK/INTERPOLATION
    primitives (VERDICT r11 #3, extending the carry-monoid pin): on
    random frames — duplicate values, NULL group keys, hot groups,
    non-monotone value/order relationships — global_ntile must equal
    the window ntile and histogram_percentiles must equal the exact
    F.percentile aggregate, bit for bit, on the forced-large path."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
    from pyspark.sql import Window

    from dfx_indicators_etl_spark.operators.scale import (
        global_ntile,
        histogram_percentiles,
    )

    ntile_rows = st.lists(
        st.integers(min_value=-10_000, max_value=10_000),
        min_size=1,
        max_size=150,
        unique=True,  # global_ntile's contract: a total order
    )

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(orders=ntile_rows, data=st.data())
    def run_ntile(orders, data):
        k = data.draw(st.integers(min_value=1, max_value=12))
        df = spark.createDataFrame([(o,) for o in orders], "o long")
        want = {
            r["o"]: r["t"]
            for r in df.withColumn(
                "t", F.ntile(k).over(Window.orderBy("o"))
            ).collect()
        }
        got = {
            r["o"]: r["t"]
            for r in global_ntile(
                df.repartition(5), k, [F.col("o").asc()], "t",
                small_rows_threshold=0,
            ).collect()
        }
        assert got == want, k

    run_ntile()

    pct_rows = st.lists(
        st.tuples(
            st.sampled_from(["a", "hot", None]),
            # coarse grid forces DUPLICATE values (the histogram's
            # whole point) and interpolation between close ranks
            st.integers(min_value=-20, max_value=20),
        ),
        min_size=1,
        max_size=120,
    )

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(rows=pct_rows, data=st.data())
    def run_pct(rows, data):
        p = data.draw(
            st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.77, 0.9, 1.0])
        )
        df = spark.createDataFrame(
            [(g, float(v) / 4.0) for g, v in rows], "g string, v double"
        )
        want = {
            r["g"]: r["p"]
            for r in df.groupBy("g")
            .agg(F.percentile("v", F.lit(p)).alias("p"))
            .collect()
        }
        got = {
            r["g"]: r["p"]
            for r in histogram_percentiles(
                df.repartition(5), ["g"], "v", {"p": p},
                hist_window_max_rows=0,
            ).collect()
        }
        assert got == want, p

    run_pct()


def test_rolling_reach_stream_restart_and_double_append(spark, sf_dir):
    """The day-grain reach word log inherits the bitmap-OR replay
    algebra: an interrupted-and-resumed drain converges to the batch
    answer, and double-appending one batch's words changes nothing."""
    import glob
    import os

    from dfx_indicators_etl_spark import streaming
    from dfx_indicators_etl_spark.plans import QUERIES
    from dfx_indicators_etl_spark.plans.streaming_queries import _scratch
    from dfx_indicators_etl_spark.sources import read_table

    events = read_table(spark, sf_dir, "events")
    want = {
        (r["report_day"], r["reach"])
        for r in QUERIES["q_rolling_reach_bitmap"](spark, sf_dir).collect()
    }
    root = _scratch("dfx_reach_restart_")
    try:
        landing, state, ckpt = (
            f"{root}/landing", f"{root}/state", f"{root}/ckpt",
        )
        for b in range(6):
            events.filter(F.pmod(F.col("event_id"), F.lit(6)) == b).coalesce(
                1
            ).write.mode("append").parquet(landing)
        files = sorted(glob.glob(f"{landing}/part-*.parquet"))
        for f in files[3:]:
            os.rename(f, f + ".held")
        streaming.incremental_rolling_reach(spark, landing, state, ckpt)
        for f in files[3:]:
            os.rename(f + ".held", f)
        streaming.incremental_rolling_reach(spark, landing, state, ckpt)

        def read():
            return {
                (r["report_day"], r["reach"])
                for r in streaming.read_rolling_reach(
                    spark, state, window_days=14
                ).collect()
            }

        assert read() == want

        # double-append one batch's words: reach must not move
        one = spark.read.parquet(files[0])
        words = (
            one.select(F.col("ts").cast("date").alias("day"), "user_id")
            .groupBy("day", F.shiftright("user_id", 6).alias("bkt"))
            .agg(
                F.expr(
                    "bit_or(shiftleft(1L, CAST(user_id % 64 AS INT)))"
                ).alias("word")
            )
        )
        words.write.mode("append").parquet(state)
        assert read() == want
    finally:
        import shutil as sh

        sh.rmtree(root, ignore_errors=True)


def test_banded_pairs_precision_randomized(spark):
    """Property pin for the banded generator's PRECISION-1.0 claim: on
    random corpora (random dims, sizes, thresholds, forced p/L), every
    banded pair must appear in the exact pair set with the identical
    rounded cosine — banding may only MISS pairs, never invent or
    mis-score one."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from dfx_indicators_etl_spark.operators import similarity as S

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        seed=st.integers(min_value=0, max_value=10_000),
        n=st.integers(min_value=5, max_value=80),
        dim=st.sampled_from([4, 8, 16]),
        threshold=st.sampled_from([0.2, 0.5, 0.8]),
        planes=st.integers(min_value=2, max_value=5),
    )
    def run(seed, n, dim, threshold, planes):
        import numpy as np

        rng = np.random.RandomState(seed)
        rows = [
            (i, [float(x) for x in rng.randn(dim)]) for i in range(n)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        exact = {
            (r.id_a, r.id_b): r.cos_sim
            for r in S.embedding_cosine_pairs_exact(
                df, threshold=threshold
            ).collect()
        }
        banded = {
            (r.id_a, r.id_b): r.cos_sim
            for r in S.banded_cosine_pairs(
                df, threshold=threshold, planes_per_table=planes, n_rows=n
            ).collect()
        }
        assert set(banded) <= set(exact), (seed, n, dim, threshold, planes)
        assert all(exact[k] == banded[k] for k in banded)

    run()


def test_multi_probe_banding_strictly_widens(spark):
    """Multi-probe LSH (extra_probes=k — flip the k least-confident
    sign bits per table): the probe-k candidate pair set must CONTAIN
    the probe-0 set (flips only add buckets, never remove), stay a
    subset of the exact pair set (precision 1.0), and on the demo
    corpus reach full recall like the base banding."""
    from dfx_indicators_etl_spark.operators import similarity as S

    emb = _emb(spark)
    exact = {
        (r.id_a, r.id_b): r.cos_sim
        for r in S.embedding_cosine_pairs_exact(emb, 0.4).collect()
    }
    sets = {}
    for k in (0, 1, 2):
        sets[k] = {
            (r.id_a, r.id_b): r.cos_sim
            for r in S.banded_cosine_pairs(
                emb, 0.4, n_rows=500, extra_probes=k
            ).collect()
        }
    assert set(sets[0]) <= set(sets[1]) <= set(sets[2]) <= set(exact)
    assert sets[2] == exact  # demo corpus: full recall
    assert all(exact[p] == s[p] for s in sets.values() for p in s)


def test_multiprobe_ann_recall_dominates_plain(spark):
    """Query-side multi-probe ANN: recall@10 against brute force at
    sf0.1 must be at least the plain key's (measured 0.85 → 0.91 →
    0.96 for 0/1/2 probes) and the probe-1 gate holds at ≥ 0.85."""
    from dfx_indicators_etl_spark.operators import similarity as S
    from dfx_indicators_etl_spark.sources import read_table

    emb = read_table(spark, "/root/testdata/sf0.1", "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in S.brute_force_topk(emb, q, k=10).collect()
    }

    def recall(probes):
        got = {
            (r.query_id, r.neighbor_id)
            for r in S.hyperplane_lsh_topk(
                emb, q, k=10, query_probes=probes
            ).collect()
        }
        return len(truth & got) / len(truth)

    r0, r1 = recall(0), recall(1)
    assert r1 >= r0
    assert r1 >= 0.85
