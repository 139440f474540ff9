"""Round-5 surface: funnel, retention cohort, TF-IDF top-k, int8
quantization — semantics on hand-built frames (the driver/compare gate
covers the testdata oracles)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from dfx_indicators_etl_spark.operators import similarity, text


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, t, ts) for u, t, ts in rows],
        "user_id long, event_type string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))


def test_funnel_strict_ordering(spark):
    """Only view → click → purchase in strict time order converts."""
    from dfx_indicators_etl_spark.plans.analytics_ext import q_funnel_conversion  # noqa: F401
    from dfx_indicators_etl_spark.plans import QUERIES

    ev = _events(
        spark,
        [
            # user 1: full funnel, correctly ordered
            (1, "view", "2024-01-01 10:00:00"),
            (1, "click", "2024-01-01 10:05:00"),
            (1, "purchase", "2024-01-01 10:10:00"),
            # user 2: view only
            (2, "view", "2024-01-01 11:00:00"),
            # user 3: click BEFORE first view — no conversion
            (3, "click", "2024-01-01 09:00:00"),
            (3, "view", "2024-01-01 09:30:00"),
            # user 4: view + click, purchase before the click — stops at click
            (4, "view", "2024-01-01 08:00:00"),
            (4, "purchase", "2024-01-01 08:10:00"),
            (4, "click", "2024-01-01 08:20:00"),
        ],
    )
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("first_view")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("first_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    assert {r["user_id"] for r in v.collect()} == {1, 2, 3, 4}
    assert {r["user_id"] for r in c.collect()} == {1, 4}  # 3's click precedes its view
    assert {r["user_id"] for r in p.collect()} == {1}  # 4's purchase precedes its click


def test_retention_cohort_weekly_counts(spark):
    ev = _events(
        spark,
        [
            # user 1 first active week 0, returns week 1 and week 2
            (1, "view", "2024-01-01 10:00:00"),
            (1, "view", "2024-01-08 10:00:00"),
            (1, "view", "2024-01-15 10:00:00"),
            # user 2 first active week 0 only (two events, one period)
            (2, "view", "2024-01-02 10:00:00"),
            (2, "view", "2024-01-03 10:00:00"),
            # user 3 first active week 1
            (3, "view", "2024-01-08 10:00:00"),
        ],
    ).select("user_id", "ts")
    epoch = F.lit("1970-01-01").cast("date")
    week_of = lambda c: F.floor(F.datediff(F.to_date(c), epoch) / 7)  # noqa: E731
    first = ev.groupBy("user_id").agg(week_of(F.min("ts")).alias("cohort_week"))
    activity = (
        ev.join(first, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (week_of(F.col("ts")) - F.col("cohort_week")).alias("weeks_since"),
        )
        .distinct()
    )
    got = {
        (r["cohort_week"], r["weeks_since"]): r["n"]
        for r in activity.groupBy("cohort_week", "weeks_since")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # 2024-01-01 is a Monday; epoch weeks split on Thursdays, but the
    # RELATIVE structure is what matters: users 1+2 share a cohort,
    # user 3 is one week later.
    weeks = sorted({w for w, _ in got})
    w0 = weeks[0]
    assert got[(w0, 0)] == 2  # users 1 and 2 in the first cohort
    assert got[(w0, 1)] == 1  # only user 1 returned next week
    assert got[(w0, 2)] == 1
    assert got[(w0 + 1, 0)] == 1  # user 3's own cohort


def test_tfidf_rare_term_wins(spark):
    docs = spark.createDataFrame(
        [
            (1, "common common common zebra"),
            (2, "common words appear here"),
            (3, "common words appear there"),
        ],
        "doc_id long, text string",
    )
    out = text.tfidf_topk(docs, top_k=1).collect()
    top = {r["doc_id"]: r["word"] for r in out}
    # 'zebra' is unique to doc 1 but 'common' appears 3× there — tf wins
    # only if idf doesn't discount it enough: df(common)=3 (all docs) →
    # idf = ln(4/4)+1 = 1 → score 3; zebra: tf 1, idf ln(4/2)+1 ≈ 1.69.
    assert top[1] == "common"
    # docs 2/3: every word tf=1; rare words beat 'common'
    assert top[2] in {"here"}  # df: here=1 < appear/words=2 < common=3
    assert top[3] == "there"


def test_tfidf_matches_numpy_reference(spark, sf_dir):
    from collections import Counter
    import math
    import re

    from dfx_indicators_etl_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    tf = {
        r["doc_id"]: Counter(
            w for w in re.split("[^a-z]+", r["text"].lower()) if w
        )
        for r in docs
    }
    dfreq = Counter(w for c in tf.values() for w in c)
    n = len(docs)
    want = {}
    for did, c in tf.items():
        scored = sorted(
            (
                (-round(t * (math.log((n + 1) / (dfreq[w] + 1)) + 1), 6), w)
                for w, t in c.items()
            ),
        )[:3]
        want[did] = [(w, -s) for s, w in scored]
    got = {}
    out = text.tfidf_topk(read_table(spark, sf_dir, "documents"), top_k=3)
    for r in out.orderBy("doc_id", "rank").collect():
        got.setdefault(r["doc_id"], []).append((r["word"], r["tfidf"]))
    assert got == want


def test_int8_quantize_matches_numpy(spark, sf_dir):
    from dfx_indicators_etl_spark.sources import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    got = {
        r["vec_id"]: (r["q_scale"], r["max_abs_err"], r["mean_abs_err"])
        for r in similarity.int8_quantize_stats(emb).collect()
    }
    for r in emb.select("vec_id", "embedding").limit(50).collect():
        v = np.array(r["embedding"], dtype=np.float64)
        scale = np.abs(v).max() / 127.0
        if scale == 0:
            errs = np.zeros_like(v)
        else:
            # HALF_UP away-from-zero rounding, like SQL round()
            q = np.floor(np.abs(v / scale) + 0.5) * np.sign(v)
            errs = np.abs(q * scale - v)
        s, mx, mean = got[r["vec_id"]]
        assert abs(s - round(scale, 6)) <= 1e-9
        assert abs(mx - round(errs.max(), 6)) <= 1e-9
        assert abs(mean - round(errs.sum() / len(v), 6)) <= 1e-6
    # error bound: quantization error can never exceed scale/2
    # (both sides carry 6dp rounding → up to ~1e-6 slack)
    assert all(mx <= s / 2 + 1e-6 for s, mx, _ in got.values())


def test_chunk_documents_overlap_and_coverage(spark):
    docs = spark.createDataFrame(
        [(1, "a" * 500), (2, "b" * 10), (3, "")],
        "doc_id long, text string",
    )
    rows = text.chunk_documents(docs, chunk_chars=200, stride=150).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: offsets 0,150,300,450 → lens 200,200,200,50
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert [r["chunk_start"] for r in c1] == [0, 150, 300, 450]
    assert [r["chunk_len"] for r in c1] == [200, 200, 200, 50]
    # doc 2 fits in one chunk; empty doc 3 emits nothing
    assert [r["chunk_len"] for r in by_doc[2]] == [10]
    assert 3 not in by_doc


def test_pack_spans_distributed_equals_single_partition(spark, sf_dir):
    """The range-repartition + offset-map branch must be bit-identical
    to the explicitly bounded single-partition window."""
    from dfx_indicators_etl_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents")
    small = {
        tuple(r) for r in text.pack_spans(docs, capacity=512).collect()
    }
    big = {
        tuple(r)
        for r in text.pack_spans(
            docs, capacity=512, small_corpus_rows=0
        ).collect()
    }
    assert small == big and len(small) > 0


def test_pack_spans_bins_are_contiguous(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in [(1, 300), (2, 300), (3, 10), (4, 600)]],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r for r in text.pack_spans(docs, capacity=512).collect()
    }
    # stream: 300 | 300 | 10 | 600 → cum 300, 600, 610, 1210
    assert (rows[1]["start_bin"], rows[1]["n_bins_spanned"]) == (0, 1)
    assert (rows[2]["start_bin"], rows[2]["n_bins_spanned"]) == (0, 2)  # 300..599
    assert (rows[3]["start_bin"], rows[3]["n_bins_spanned"]) == (1, 1)
    assert (rows[4]["start_bin"], rows[4]["n_bins_spanned"]) == (1, 2)  # 610..1209


def test_pq_codes_reconstruction_quality(spark, sf_dir):
    """PQ invariants: deterministic, codes in range, and mean
    reconstruction error strictly below the no-codebook baseline
    (distance to the global mean — what a 1-centroid codebook gives)."""
    from dfx_indicators_etl_spark.sources import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    rows = similarity.pq_codes(emb).collect()
    again = similarity.pq_codes(emb).collect()
    key = lambda r: (r["vec_id"], tuple(r["codes"]), r["recon_err"])  # noqa: E731
    assert sorted(map(key, rows)) == sorted(map(key, again))
    assert all(0 <= c < 16 for r in rows for c in r["codes"])
    assert all(len(r["codes"]) == 8 for r in rows)

    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.select("vec_id", "embedding").collect()}
    mean = np.mean(list(vecs.values()), axis=0)
    baseline = np.mean([np.linalg.norm(v - mean) for v in vecs.values()])
    pq_err = np.mean([r["recon_err"] for r in rows])
    assert pq_err < baseline * 0.9  # real compression, not a constant
