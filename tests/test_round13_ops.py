"""Round-13 pins: the xxhash64 production fast path for the hashing-
trick featurizer (VERDICT r12 #3) — the portable md5 face stays the
oracled registry key; the fast path must match its feature-space
SHAPE (totals, sparsity, load distribution), not its exact buckets.
"""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from dfx_indicators_etl_spark.operators import text
from dfx_indicators_etl_spark.sources.readers import read_table

N_FEATURES = 1024


@pytest.fixture(scope="module")
def fam_stats(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    out = {}
    for fam in ("portable", "xxhash64"):
        feats = text.hashed_ngram_features(
            docs, n_features=N_FEATURES, hash_family=fam
        ).cache()
        hist = (
            feats.groupBy("feature")
            .agg(F.sum("n").alias("load"))
            .agg(
                F.count(F.lit(1)).alias("occupied"),
                F.max("load").alias("max_load"),
                F.sum("load").alias("total"),
            )
            .collect()[0]
        )
        out[fam] = {
            "coo_rows": feats.count(),
            "total_grams": feats.agg(F.sum("n")).collect()[0][0],
            "occupied": hist["occupied"],
            "max_load": hist["max_load"],
        }
        feats.unpersist()
    return out


def test_total_gram_mass_identical(fam_stats):
    # The hash family only relabels grams — the total bigram count
    # (sum of n) must be bit-identical between families.
    assert fam_stats["portable"]["total_grams"] == (
        fam_stats["xxhash64"]["total_grams"]
    )


def test_collision_statistics_match_shape(fam_stats):
    # COO row count = Σ_doc distinct features hit; within-doc
    # collisions differ per family only by hash luck. Both families
    # are uniform 64-bit hashes folded mod 1024, so the sparsity must
    # agree within 2%.
    a = fam_stats["portable"]["coo_rows"]
    b = fam_stats["xxhash64"]["coo_rows"]
    assert abs(a - b) / a < 0.02, (a, b)


def test_feature_space_load_shape_matches(fam_stats):
    # The bigram distribution is Zipfian, so bucket loads are NOT
    # uniform — the shape pin is family-vs-family: both 64-bit hashes
    # folded mod 1024 must occupy the same number of buckets (±3%)
    # and agree on the heaviest bucket's load within 1.5x (the top
    # load is the top-gram count plus hash-luck collisions).
    a, b = fam_stats["portable"], fam_stats["xxhash64"]
    assert abs(a["occupied"] - b["occupied"]) / a["occupied"] < 0.03, (a, b)
    hi, lo = max(a["max_load"], b["max_load"]), min(
        a["max_load"], b["max_load"]
    )
    assert hi / lo < 1.5, (a, b)


def test_unknown_family_raises(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="hash_family"):
        text.hashed_ngram_features(docs, hash_family="fnv1a").collect()


def test_pca_cov_partials_partition_independent(spark, sf_dir):
    # Integer sums are associative — the exact partials must be
    # BIT-identical under any input partitioning (the float64
    # partials emb_pca folds are not, which is why this face exists).
    from dfx_indicators_etl_spark.operators import similarity

    emb = read_table(spark, sf_dir, "embeddings")
    a = {
        (r["i"], r["j"]): r["s"]
        for r in similarity.pca_cov_partials_exact(
            emb.repartition(1)
        ).collect()
    }
    b = {
        (r["i"], r["j"]): r["s"]
        for r in similarity.pca_cov_partials_exact(
            emb.repartition(13)
        ).collect()
    }
    assert a == b
    d = 64
    assert len(a) == d * (d + 1) // 2 + d + 1
    assert a[(-1, -1)] == emb.count()


def test_pca_projection_invariants(spark, sf_dir):
    # Sign/order-immune projection pins (VERDICT r12 #4): explained
    # variance per component matches the numpy eigenvalues, and the
    # out_dim=d projection is an isometry (pairwise distances
    # preserved to 6dp) — true regardless of eigenvector sign flips
    # or within-tie ordering.
    import numpy as np

    from dfx_indicators_etl_spark.operators import similarity

    emb = read_table(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    proj = {
        r["vec_id"]: np.array(r["projected"], dtype=np.float64)
        for r in similarity.pca_project(
            emb, out_dim=mat.shape[1]
        ).collect()
    }
    p = np.array([proj[r["vec_id"]] for r in rows])
    # per-component variance == eigenvalues, descending
    vals = np.sort(np.linalg.eigh(np.cov(mat, rowvar=False))[0])[::-1]
    got_var = p.var(axis=0, ddof=1)
    assert np.allclose(got_var, vals, atol=1e-4)
    assert (np.diff(got_var) <= 1e-9).all()  # decreasing
    # full-rank rotation preserves pairwise distances
    rng = np.random.RandomState(0)
    idx = rng.choice(len(mat), size=(50, 2))
    d_orig = np.linalg.norm(mat[idx[:, 0]] - mat[idx[:, 1]], axis=1)
    d_proj = np.linalg.norm(p[idx[:, 0]] - p[idx[:, 1]], axis=1)
    assert np.allclose(d_orig, d_proj, atol=1e-5)


@pytest.mark.parametrize(
    "key",
    [
        "ind_chained_index",
        "ind_fisher_chained",
        "ind_chained_index_monthly",
    ],
)
def test_chain_fold_paths_bit_identical(spark, sf_dir, key, monkeypatch):
    # Adaptive long-chain swap (VERDICT r12 #5): the driver-side
    # decimal fold (threshold 0) and the recursive CTE (threshold ∞)
    # must agree bit-for-bit on the real links — the fold uses the
    # same IEEE multiply + HALF_UP 6dp round Spark's Round applies.
    from dfx_indicators_etl_spark.plans import QUERIES
    from dfx_indicators_etl_spark.plans import indicator_queries as iq

    monkeypatch.setattr(iq, "CHAIN_CTE_MAX_STEPS", 10**9)
    cte = sorted(map(tuple, QUERIES[key](spark, sf_dir).collect()))
    monkeypatch.setattr(iq, "CHAIN_CTE_MAX_STEPS", 0)
    fold = sorted(map(tuple, QUERIES[key](spark, sf_dir).collect()))
    assert cte == fold
    assert len(cte) >= 2


def test_chain_fold_stops_at_calendar_gap():
    # The CTE's l.comp_year = c.yr + 1 join ends the recursion at a
    # gap year; the driver fold must stop identically, not skip over.
    from dfx_indicators_etl_spark.plans.indicator_queries import (
        _chain_fold_rows,
    )

    rows = [
        {"comp_year": 2001, "link": 1.02},
        {"comp_year": 2002, "link": 0.99},
        {"comp_year": 2004, "link": 1.50},  # 2003 missing — unreachable
    ]
    out = _chain_fold_rows(rows, ["link"])
    assert [r[0] for r in out] == [2000, 2001, 2002]
    assert out[1][1] == 102.0 and out[2][1] == 100.98
    assert _chain_fold_rows([], ["link"]) == [(None, 100.0)]


def test_knn_multiprobe_recall_gate_boundary_shape(spark):
    # VERDICT r12 #6: the kNN banded route's recall at the LOW-cosine
    # tail (random corpus — top-k neighbors sit at the LSH boundary).
    # The probe (tools/knn_multiprobe_probe.py, SCALE.md §round-13)
    # showed one probe at L=24 beats DOUBLING L at the same bucket-
    # state volume; this pins the small deterministic replica of that
    # curve (xxhash64-synth corpus, n=3000, planes=4: measured
    # p0=0.9536, p1=0.9963, p2=0.9995).
    import sys
    from pathlib import Path

    sys.path.insert(
        0, str(Path(__file__).resolve().parents[1] / "tools")
    )
    from pair_crossover_probe import synth

    from dfx_indicators_etl_spark.operators import similarity as S

    n = 3000
    df = synth(spark, n)
    exact = {
        (r["src"], r["dst"])
        for r in S.knn_graph_exact(df, k=5, mutual=False).collect()
    }
    recall = {}
    for p in (0, 1):
        got = {
            (r["src"], r["dst"])
            for r in S.knn_graph_banded(
                df,
                k=5,
                mutual=False,
                n_rows=n,
                planes_per_table=4,
                extra_probes=p,
            ).collect()
        }
        recall[p] = len(got & exact) / len(exact)
    assert recall[0] >= 0.90, recall
    assert recall[1] >= 0.99, recall
    assert recall[1] > recall[0], recall


def test_round6_half_up_matches_spark_round_adversarially(spark):
    # The fold's one risky claim: Decimal(repr(x)).quantize(1e-6,
    # HALF_UP) == Spark Round(x, 6) for every double. Batch-evaluate
    # Spark's round over adversarial inputs — exact 6dp half-way
    # points, near-half ulp neighbors, tiny/huge magnitudes,
    # negatives — and compare bit-for-bit.
    import math

    from dfx_indicators_etl_spark.plans.indicator_queries import (
        _round6_half_up,
    )

    xs = []
    for base in (0.0, 1.0, 123.456789, 99.9999995, 1e-7, 5e-7):
        for sign in (1.0, -1.0):
            xs.append(sign * base)
    # exact decimal halves at scale 7 (the HALF_UP boundary at 6dp)
    xs += [i * 5e-7 for i in range(1, 40, 2)]
    xs += [-i * 5e-7 for i in range(1, 40, 2)]
    # ulp neighbors of a half-way point
    h = 2.5e-6
    xs += [math.nextafter(h, 0.0), h, math.nextafter(h, 1.0)]
    # magnitudes past float 6dp resolution and past the default
    # Decimal context (the prec-400 fix)
    xs += [1e10 + 0.1234565, 1e16, 1e22, 1.5e25, 4.9e-324, 1.7e308]
    # chain-realistic values
    xs += [100.0 * (1.0 + k / 1000.0) ** j for k, j in ((7, 3), (-3, 5))]

    df = spark.createDataFrame([(x,) for x in xs], "x double")
    got = {
        r["x"]: r["r"]
        for r in df.select("x", F.round("x", 6).alias("r")).collect()
    }
    for x in xs:
        assert got[x] == _round6_half_up(x), (
            x,
            got[x],
            _round6_half_up(x),
        )


def test_driver_window_priority_is_sound():
    # A typo or dupe in _DRIVER_WINDOW_PRIORITY silently burns a
    # round of driver evidence (the driver stamps the FIRST 50
    # registry keys in insertion order). Guard: every listed name is
    # registered, no dupes, and the priority fills the whole window.
    import dfx_indicators_etl_spark.plans as plans_init
    from dfx_indicators_etl_spark.plans import QUERIES

    pri = plans_init._DRIVER_WINDOW_PRIORITY
    unknown = [n for n in pri if n not in QUERIES]
    assert unknown == [], f"priority names not registered: {unknown}"
    assert len(pri) == len(set(pri)), "duplicate names in priority"
    assert len(pri) >= 50, "priority must cover the 50-key window"
    # and the registry actually starts with the priority ordering
    assert list(QUERIES)[: len(pri)] == [n for n in pri]


def test_bench_headline_covers_registry():
    # bench.py's HEADLINE tuple is hand-maintained; a key missing
    # from it silently loses its per-round timing evidence. Keep the
    # two sets equal (HEADLINE is ordered, the registry is the truth).
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from bench import HEADLINE

    from dfx_indicators_etl_spark.plans import QUERIES

    assert set(HEADLINE) == set(QUERIES), {
        "missing_from_bench": sorted(set(QUERIES) - set(HEADLINE)),
        "stale_in_bench": sorted(set(HEADLINE) - set(QUERIES)),
    }


def test_portable_face_unchanged_by_default(spark, sf_dir):
    # The registry key runs the default family; pin that the default
    # IS the portable md5 derivation (a silent default flip would
    # break the committed oracle).
    docs = read_table(spark, sf_dir, "documents").limit(50)
    default = text.hashed_ngram_features(docs, n_features=N_FEATURES)
    portable = text.hashed_ngram_features(
        docs, n_features=N_FEATURES, hash_family="portable"
    )
    assert default.exceptAll(portable).count() == 0
    assert portable.exceptAll(default).count() == 0
