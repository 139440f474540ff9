"""Batch C: LLM-data queries vs oracles + semantic checks for the
hash-based (rows-only) operators, including planted-duplicate frames
the sf data can't provide."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dfx_indicators_etl_spark.operators import dedup, multimodal, similarity
from dfx_indicators_etl_spark.plans import ORACLES, QUERIES

from .test_analytics import _normalize

LLM_KEYS = [
    k
    for k in QUERIES
    if k.startswith(("dedup_", "text_", "sim_", "mm_", "sample_", "emb_"))
]


@pytest.mark.parametrize("name", LLM_KEYS)
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


@pytest.fixture(scope="module")
def planted(spark):
    """Corpus with exact dups, a near-dup, and an unrelated doc."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = "the quick brown fox jumps over the lazy dog again and again tomorrow"
    other = "completely different words about spark query engines at scale now"
    return spark.createDataFrame(
        [(1, base), (2, base), (3, near), (4, other)], ["doc_id", "text"]
    )


def test_exact_dedup_groups(planted):
    rows = {r["keep_doc_id"]: r["n_copies"] for r in dedup.exact_dedup(planted).collect()}
    assert rows == {1: 2, 3: 1, 4: 1}


def test_ngram_jaccard_finds_near_dup(planted):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(planted, threshold=0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0          # exact dup pair
    assert 0.5 <= pairs[(1, 3)] < 1.0    # near dup pair
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_minhash_lsh_finds_near_dup(planted):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in dedup.minhash_lsh_pairs(planted, threshold=0.4).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs
    assert (1, 4) not in pairs


def test_simhash_hamming(planted):
    # Hamming tolerance 10 needs > 10 bands for guaranteed recall.
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.simhash_pairs(planted, max_hamming=10, bands=16).collect()
    }
    assert pairs[(1, 2)] == 0            # identical docs → identical simhash
    assert pairs[(1, 3)] <= 10           # near dup within radius
    assert (1, 4) not in pairs


def test_simhash_rejects_unguaranteed_radius(planted):
    # max_hamming >= bands would silently miss qualifying pairs.
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bands"):
        dedup.simhash_pairs(planted, max_hamming=8, bands=8)


def test_connected_components_labels_transitive_closure(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (9, 3)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.connected_components(pairs).collect()
    }
    # {1,2,3,9} chain collapses to min id 1; {5,6} to 5.
    assert got == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5}


def test_scrub_pii_masks_and_counts(spark):
    from dfx_indicators_etl_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@example.org or call +1 (555) 123-4567 now"),
            (2, "no pii here"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in text_ops.scrub_pii(df).collect()}
    assert "[EMAIL]" in rows[1]["scrubbed"] and "[PHONE]" in rows[1]["scrubbed"]
    assert "example.org" not in rows[1]["scrubbed"]
    assert rows[1]["n_emails"] == 1 and rows[1]["n_phones"] == 1
    assert rows[2]["n_emails"] == 0 and rows[2]["scrubbed"] == "no pii here"


def test_repetition_stats_flags_boilerplate(spark):
    from dfx_indicators_etl_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),     # one distinct trigram
            (2, "all words here are fully distinct"),  # no repeats
            (3, "too short"),                          # < 3 tokens: excluded
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in text_ops.repetition_stats(df).collect()}
    assert rows[1]["n_distinct"] == 1 and rows[1]["rep_ratio"] == 0.75
    assert rows[2]["rep_ratio"] == 0.0
    assert 3 not in rows


def test_ngram_jaccard_max_freq_cap(planted):
    # With an aggressive cap every shared shingle is dropped → no pairs.
    capped = dedup.ngram_jaccard_pairs(planted, threshold=0.1, max_shingle_freq=1)
    assert capped.count() == 0


def test_minhash_band_bucket_cap(planted):
    # Bucket cap 1 drops every colliding band bucket → no candidates;
    # a generous cap changes nothing.
    assert (
        dedup.minhash_lsh_pairs(planted, threshold=0.1, max_band_bucket=1).count()
        == 0
    )
    uncapped = dedup.minhash_lsh_pairs(planted, threshold=0.4).collect()
    capped = dedup.minhash_lsh_pairs(
        planted, threshold=0.4, max_band_bucket=1000
    ).collect()
    assert sorted(map(tuple, capped)) == sorted(map(tuple, uncapped))


def test_simhash_band_bucket_cap(planted):
    assert (
        dedup.simhash_pairs(planted, max_hamming=7, max_band_bucket=1).count() == 0
    )


def test_skew_caps_default_on():
    # The scale-safe behavior must be the default (VERDICT r2): a caller
    # who doesn't know the knob gets bounded bucket fan-out. Exact
    # paths opt out with an explicit None.
    import inspect

    assert dedup.DEFAULT_MAX_SHINGLE_FREQ is not None
    assert dedup.DEFAULT_MAX_BAND_BUCKET is not None
    sig = inspect.signature(dedup.ngram_jaccard_pairs)
    assert sig.parameters["max_shingle_freq"].default == dedup.DEFAULT_MAX_SHINGLE_FREQ
    sig = inspect.signature(dedup.minhash_lsh_pairs)
    assert sig.parameters["max_band_bucket"].default == dedup.DEFAULT_MAX_BAND_BUCKET
    sig = inspect.signature(dedup.simhash_pairs)
    assert sig.parameters["max_band_bucket"].default == dedup.DEFAULT_MAX_BAND_BUCKET


def test_hot_shingle_corpus_stays_bounded(spark):
    # 60 docs sharing one boilerplate sentence: uncapped, the shared
    # shingles alone mean every doc pairs with every other through the
    # inverted index join (60·59/2 candidate groups). With a tight cap
    # the boilerplate shingles drop and join fan-out collapses.
    docs = spark.createDataFrame(
        [(i, f"unique token {i} " + "all rights reserved contact us today")
         for i in range(60)],
        "doc_id long, text string",
    )
    capped = dedup.ngram_jaccard_pairs(docs, threshold=0.0, max_shingle_freq=10)
    assert capped.count() == 0
    uncapped = dedup.ngram_jaccard_pairs(docs, threshold=0.0, max_shingle_freq=None)
    assert uncapped.count() == 60 * 59 / 2


def test_connected_components_pointer_jump_beats_diameter(spark):
    # A 64-node path has diameter 63: plain min-propagation needs ~63
    # rounds, pointer jumping converges in O(log d) — 10 rounds must be
    # plenty (this test fails under 1-hop propagation).
    # small_graph_edges=0 forces the distributed loop under test.
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.connected_components(
            pairs, max_iterations=10, small_graph_edges=0
        ).collect()
    }
    assert got == {i: 0 for i in range(64)}


def test_connected_components_raises_when_not_converged(spark):
    # Partial labels are wrong labels — never returned silently.
    import pytest as _pytest

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "doc_a long, doc_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(pairs, max_iterations=1, small_graph_edges=0)


def test_connected_components_small_and_distributed_paths_agree(spark):
    # The runtime strategy pick (driver union-find vs iterative loop)
    # must be invisible in the labels.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (9, 3), (5, 6), (10, 11), (11, 12), (12, 10)],
        "doc_a long, doc_b long",
    )
    small = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.connected_components(pairs).collect()
    }
    dist = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.connected_components(
            pairs, small_graph_edges=0
        ).collect()
    }
    assert small == dist == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5, 10: 10, 11: 10, 12: 10}


def test_brute_force_topk_self_similarity(spark):
    vecs = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0]),   # close to 0
            (2, [0.0, 1.0, 0.0]),   # orthogonal to 0
            (3, [-1.0, 0.0, 0.0]),  # opposite of 0
        ],
        "vec_id bigint, embedding array<double>",
    )
    out = similarity.brute_force_topk(vecs, vecs.filter(F.col("vec_id") == 0), k=3)
    ranked = [r["neighbor_id"] for r in out.orderBy("rank").collect()]
    assert ranked == [1, 2, 3]


def test_lsh_ann_subset_of_bruteforce(spark, sf_dir):
    """LSH results are (query, neighbor) pairs the brute-force ranking
    also knows; recall may drop but precision of membership holds."""
    from dfx_indicators_etl_spark.sources import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(emb, queries, k=50).collect()
    }
    ann = similarity.hyperplane_lsh_topk(emb, queries, k=5).collect()
    assert len(ann) > 0
    hits = sum((r["query_id"], r["neighbor_id"]) in brute for r in ann)
    assert hits / len(ann) > 0.5  # bucketed candidates rank near the top


def test_multimodal_decode_schema_and_batching(planted):
    out = multimodal.decode_features(multimodal.attach_binary_payload(planted))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4}
    r = rows[1]
    n = len("the quick brown fox jumps over the lazy dog again and again today")
    assert r["n_bytes"] == n
    assert r["width"] == n % 640 and r["n_frames"] == n % 30 + 1


def test_multimodal_unknown_media_type_raises(planted, spark):
    bad = multimodal.attach_binary_payload(planted).withColumn(
        "media_type", F.lit("video/real")
    )
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        multimodal.decode_features(bad).collect()


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    """IVF probing 6/16 cells must recover most exact neighbors
    (deterministic codebook → stable recall on fixed data)."""
    bf = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["sim_bruteforce_topk"](spark, sf_dir).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["sim_ivf_ann"](spark, sf_dir).collect()
    }
    assert len(ivf) == len(bf)  # k rows per query either way
    assert len(bf & ivf) / len(bf) >= 0.5


def test_ann_recall_at_10_sf01(spark):
    """The headline ANN accuracy gate: recall@10 ≥ 0.8 against
    brute-force ground truth at sf0.1 for BOTH scale paths, at their
    default dials (LSH 12 tables × 4 planes, IVF 6/16 probes).
    Deterministic hashing/codebook on fixed data → a stable bound."""
    from dfx_indicators_etl_spark.operators import similarity
    from dfx_indicators_etl_spark.sources import read_table

    emb = read_table(spark, "/root/testdata/sf0.1", "embeddings").localCheckpoint()
    queries = emb.filter(F.col("vec_id") < 10)

    def keyset(df):
        return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}

    bf = keyset(similarity.brute_force_topk(emb, queries, k=10))
    lsh = keyset(similarity.hyperplane_lsh_topk(emb, queries, k=10))
    ivf = keyset(similarity.ivf_topk(emb, queries, k=10))
    ivfpq = keyset(similarity.ivfpq_topk(emb, queries, k=10))
    assert len(bf & lsh) / len(bf) >= 0.8
    assert len(bf & ivf) / len(bf) >= 0.8
    assert len(bf & ivfpq) / len(bf) >= 0.8


def test_pca_matches_numpy_reference(spark, sf_dir):
    import numpy as np

    from dfx_indicators_etl_spark.sources import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    got = {
        r["vec_id"]: np.array(r["projected"], dtype=np.float64)
        for r in similarity.pca_project(emb, out_dim=4).collect()
    }
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    ids = [r["vec_id"] for r in rows]
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mean = mat.mean(axis=0)
    cov = np.cov(mat, rowvar=False)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:4]
    comps = vecs[:, order]
    for j in range(4):
        i = int(np.abs(comps[:, j]).argmax())
        if comps[i, j] < 0:
            comps[:, j] = -comps[:, j]
    expect = (mat - mean) @ comps
    worst = max(
        float(np.abs(got[vid] - expect[i]).max()) for i, vid in enumerate(ids)
    )
    assert worst < 1e-3  # float32 output vs float64 reference

    # variance concentrates in leading components
    proj = np.array([got[v] for v in ids])
    variances = proj.var(axis=0)
    assert all(
        variances[i] >= variances[i + 1] - 1e-6
        for i in range(len(variances) - 1)
    )


def test_kmeans_assignments_are_nearest_and_deterministic(spark, sf_dir):
    import numpy as np

    from dfx_indicators_etl_spark.sources import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    got = {
        r["vec_id"]: (r["cluster"], r["dist"])
        for r in similarity.kmeans(emb, k=4, n_iter=5).collect()
    }
    again = {
        r["vec_id"]: (r["cluster"], r["dist"])
        for r in similarity.kmeans(emb, k=4, n_iter=5).collect()
    }
    assert got == again  # deterministic seeds + deterministic means

    # Reference Lloyd's in numpy from the same deterministic seeds must
    # produce the same final assignment. Seeds replicate the production
    # path: uniform hash-ordered sample → driver-side k-means++.
    from pyspark.sql import functions as F

    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    ids = [r["vec_id"] for r in rows]
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    sample_rows = (
        emb.select("embedding", F.xxhash64("vec_id").alias("h"))
        .orderBy("h")
        .limit(max(8 * 4, 64))
        .collect()
    )
    sample = np.array([r["embedding"] for r in sample_rows], dtype=np.float64)
    cents = similarity._kmeanspp_driver(sample, 4)
    for _ in range(5):
        d2 = (
            (mat * mat).sum(axis=1, keepdims=True)
            - 2.0 * (mat @ cents.T)
            + (cents * cents).sum(axis=1)
        )
        assign = d2.argmin(axis=1)
        for c in range(4):
            members = mat[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    d2 = (
        (mat * mat).sum(axis=1, keepdims=True)
        - 2.0 * (mat @ cents.T)
        + (cents * cents).sum(axis=1)
    )
    expect = d2.argmin(axis=1)
    mismatches = sum(
        1 for i, vid in enumerate(ids) if got[vid][0] != expect[i]
    )
    # float sum-order differences may flip ties; require near-total agreement
    assert mismatches <= len(ids) * 0.01


def test_kmeans_scans_source_once(spark, sf_dir):
    """The Lloyd loop reads the checkpointed (id, vec) projection, not
    the source parquet: the returned plan (and hence every iteration,
    which shares the same base) must contain no parquet scan — at
    100 TB the difference between 1 and n_iter+1 full corpus scans."""
    from dfx_indicators_etl_spark.sources import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    result = similarity.kmeans(emb, k=4, n_iter=2)
    plan = result._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in plan and "Scan parquet" not in plan


def test_kmeans_more_iterations_do_not_increase_inertia(spark, sf_dir):
    from dfx_indicators_etl_spark.sources import read_table

    emb = read_table(spark, sf_dir, "embeddings")

    def inertia(n_iter):
        rows = similarity.kmeans(emb, k=4, n_iter=n_iter).collect()
        return sum(r["dist"] ** 2 for r in rows)

    one, five = inertia(1), inertia(5)
    assert five <= one + 1e-6  # Lloyd's is monotone in iterations


def test_random_projection_preserves_geometry(spark, sf_dir):
    """JL property: projected norms concentrate around original norms,
    and projected pairwise distances correlate strongly with the
    originals (deterministic seed → stable bounds)."""
    import numpy as np

    from dfx_indicators_etl_spark.operators import similarity
    from dfx_indicators_etl_spark.sources import read_table

    emb = read_table(spark, sf_dir, "embeddings").filter("vec_id < 60")
    orig = {r["vec_id"]: np.array(r["embedding"], dtype=float) for r in emb.collect()}
    proj = {
        r["vec_id"]: np.array(r["projected"], dtype=float)
        for r in similarity.random_projection(emb, out_dim=16).collect()
    }
    assert set(proj) == set(orig)
    ids = sorted(orig)
    rel_err = [
        abs(np.linalg.norm(proj[i]) - np.linalg.norm(orig[i]))
        / max(np.linalg.norm(orig[i]), 1e-9)
        for i in ids
    ]
    assert np.median(rel_err) < 0.35  # 16 dims → ~1/sqrt(16) typical error
    # Random high-dim vectors are near-equidistant, so distance
    # *correlation* is pure noise — the JL guarantee is per-distance
    # relative error (~1/sqrt(out_dim) typical).
    d_err = [
        abs(np.linalg.norm(proj[a] - proj[b]) - np.linalg.norm(orig[a] - orig[b]))
        / max(np.linalg.norm(orig[a] - orig[b]), 1e-9)
        for a in ids[:20]
        for b in ids[:20]
        if a < b
    ]
    assert np.median(d_err) < 0.35


def test_contamination_flags_planted(spark):
    from dfx_indicators_etl_spark.operators import text as text_ops

    bench = spark.createDataFrame(
        [(100, "the secret eval answer is forty two exactly")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "prefix words then the secret eval answer is forty two exactly copied"),
            (2, "completely unrelated training document with different words"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n_contaminated"]
        for r in text_ops.contamination_flags(train, bench, n=5).collect()
    }
    assert 1 in got and got[1] >= 1  # copied span flagged
    assert 2 not in got              # clean doc untouched


def test_unigram_logprob_orders_quality(spark):
    from dfx_indicators_etl_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [
            (1, "common common common common"),   # high-frequency words
            (2, "common zyxwvut"),                # contains a rare word
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in text_ops.unigram_logprob(df).collect()}
    assert rows[1]["mean_nll"] < rows[2]["mean_nll"]  # rarity raises NLL
    assert rows[1]["n_words"] == 4 and rows[2]["n_words"] == 2


def test_kmeans_inertia_matches_numpy_kmeanspp_reference(spark):
    """Quality gate for the sketch-then-k-means++ seeding (VERDICT r5):
    final inertia on the sf0.01 embeddings must be within 10% of a
    full driver-side numpy k-means++ + Lloyd reference."""
    import numpy as np

    from dfx_indicators_etl_spark.sources import read_table

    emb = read_table(spark, "/root/testdata/sf0.01", "embeddings")
    k, iters = 8, 10
    got = similarity.kmeans(emb, k=k, n_iter=iters).collect()
    engine_inertia = sum(r["dist"] ** 2 for r in got)

    mat = np.array(
        [r["embedding"] for r in emb.select("embedding").collect()],
        dtype=np.float64,
    )
    rng = np.random.default_rng(7)
    # exact k-means++ over the FULL matrix (no sample sketch)
    chosen = [int(rng.integers(len(mat)))]
    d2 = ((mat - mat[chosen[0]]) ** 2).sum(axis=1)
    for _ in range(1, k):
        nxt = int(rng.choice(len(mat), p=d2 / d2.sum()))
        chosen.append(nxt)
        d2 = np.minimum(d2, ((mat - mat[nxt]) ** 2).sum(axis=1))
    cents = mat[chosen].copy()
    for _ in range(iters):
        dd = (
            (mat * mat).sum(axis=1, keepdims=True)
            - 2.0 * (mat @ cents.T)
            + (cents * cents).sum(axis=1)
        )
        assign = dd.argmin(axis=1)
        for c in range(k):
            members = mat[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    dd = (
        (mat * mat).sum(axis=1, keepdims=True)
        - 2.0 * (mat @ cents.T)
        + (cents * cents).sum(axis=1)
    )
    ref_inertia = float(np.maximum(dd.min(axis=1), 0).sum())
    assert engine_inertia <= 1.10 * ref_inertia


def test_lloyd_update_rowcount_independent_of_partitions(spark, sf_dir):
    """The centroid-update combine happens in-plan: the collected row
    count is exactly the non-empty clusters × (d+1), no matter how the
    input is partitioned (VERDICT r5: driver traffic O(k·d), never
    O(k·d·partitions))."""
    import numpy as np

    from dfx_indicators_etl_spark.sources import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    sample = np.array(
        [r["embedding"] for r in emb.limit(4).collect()], dtype=np.float64
    )
    counts = set()
    for parts in (3, 13):
        rows = similarity.lloyd_update_rows(
            emb.repartition(parts), sample, "embedding"
        )
        counts.add(len(rows))
        assert len(rows) <= 4 * (sample.shape[1] + 1)
    assert len(counts) == 1


def test_pca_partials_rowcount_independent_of_partitions(spark, sf_dir):
    from dfx_indicators_etl_spark.sources import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    d = len(emb.select("embedding").first()[0])
    for parts in (3, 13):
        n = similarity.pca_partials_df(
            emb.repartition(parts), "embedding"
        ).count()
        assert n == d * d + d + 1


def test_containment_detects_subsumed_doc(spark):
    """A doc fully embedded in a larger one has containment 1.0 even
    though Jaccard is low — the asymmetric mode containment exists
    for."""
    small = "alpha beta gamma delta epsilon"
    big = small + " " + " ".join(f"filler{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, small), (2, big), (3, "totally unrelated words here now")],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_a"], r["doc_b"]): (r["containment_a"], r["containment_b"])
        for r in dedup.containment_pairs(
            docs, threshold=0.8, max_shingle_freq=None
        ).collect()
    }
    assert set(rows) == {(1, 2)}
    ca, cb = rows[(1, 2)]
    assert ca == 1.0  # every shingle of the small doc is in the big one
    assert cb < 0.2  # while Jaccard-style symmetry would miss the pair
    # symmetric Jaccard on the same corpus indeed misses it
    jac = dedup.ngram_jaccard_pairs(docs, threshold=0.5, max_shingle_freq=None)
    assert (1, 2) not in {(r["doc_a"], r["doc_b"]) for r in jac.collect()}


def test_weighted_sample_deterministic_and_rate_shaped(spark):
    from dfx_indicators_etl_spark.operators import sampling

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "zh") for i in range(2000)],
        "doc_id long, lang string",
    )
    rates = {"en": 1.0, "zh": 0.25}
    kept = sampling.weighted_sample(docs, rates, "lang", "doc_id")
    again = sampling.weighted_sample(docs, rates, "lang", "doc_id")
    a = {(r["doc_id"]) for r in kept.collect()}
    b = {(r["doc_id"]) for r in again.collect()}
    assert a == b  # pure function of ids
    per_lang = {
        r["lang"]: r["n"]
        for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert per_lang["en"] == 1000  # rate 1.0 keeps everything
    assert 150 <= per_lang["zh"] <= 350  # ~25% of 1000
    # independent draws under a different salt
    resalted = sampling.weighted_sample(
        docs, rates, "lang", "doc_id", salt="other"
    )
    assert {(r["doc_id"]) for r in resalted.collect()} != a


def test_doc_frequency_hitters_finds_boilerplate(spark):
    from dfx_indicators_etl_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [(i, f"unique{i} common filler") for i in range(10)]
        + [(10, "common alone")],
        "doc_id long, text string",
    )
    rows = {r["word"]: r for r in text_ops.doc_frequency_hitters(
        docs, min_doc_frac=0.5
    ).collect()}
    assert set(rows) == {"common", "filler"}
    assert rows["common"]["doc_freq"] == 11 and rows["common"]["doc_frac"] == 1.0
    assert rows["filler"]["doc_freq"] == 10
    # repeated-within-one-doc tokens do NOT inflate doc frequency
    assert "unique0" not in rows


def test_sign_projection_preserves_geometry_and_matches_formula(spark, sf_dir):
    """The portable Rademacher projection keeps the JL distortion
    bounds of the Gaussian variant and reproduces the formula matrix
    exactly (numpy reference)."""
    import numpy as np

    from dfx_indicators_etl_spark.sources import read_table

    emb = read_table(spark, sf_dir, "embeddings").filter("vec_id < 60")
    orig = {r["vec_id"]: np.array(r["embedding"], dtype=float) for r in emb.collect()}
    proj = {
        r["vec_id"]: np.array(r["projected"], dtype=float)
        for r in similarity.sign_projection(emb, out_dim=16).collect()
    }
    assert set(proj) == set(orig)
    mat = np.array(
        [[similarity.projection_sign(i, j) for j in range(16)] for i in range(64)]
    )
    for vid in list(orig)[:10]:
        ref = (orig[vid] @ mat) / np.sqrt(16)
        assert np.allclose(proj[vid], ref, rtol=1e-9)
    ids = sorted(orig)
    rel_err = [
        abs(np.linalg.norm(proj[i]) - np.linalg.norm(orig[i]))
        / max(np.linalg.norm(orig[i]), 1e-9)
        for i in ids
    ]
    assert np.median(rel_err) < 0.35


def test_round6_ops_handle_degenerate_inputs(spark):
    """Empty corpora and sub-shingle docs must yield empty results, not
    errors — the guard rails a long-running pipeline relies on."""
    from dfx_indicators_etl_spark.operators import sampling
    from dfx_indicators_etl_spark.operators import text as text_ops

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert dedup.containment_pairs(empty, max_shingle_freq=None).count() == 0
    assert text_ops.doc_frequency_hitters(empty).count() == 0
    short = spark.createDataFrame([(1, "one two")], "doc_id long, text string")
    assert dedup.containment_pairs(short, max_shingle_freq=None).count() == 0
    assert (
        dedup.minhash_lsh_pairs_portable(short, max_band_bucket=None).count()
        == 0
    )
    assert (
        dedup.simhash_pairs_portable(short, max_band_bucket=None).count() == 0
    )
    empty_langs = spark.createDataFrame([], "doc_id long, lang string")
    assert sampling.weighted_sample(
        empty_langs, {"en": 0.5}, "lang", "doc_id"
    ).count() == 0


def test_shingles_null_tokens_yield_empty_array(spark):
    """Public contract: shingles()/shingles_from_tokens on a NULL
    text/token array return [], never NULL (ADVICE r6)."""
    from dfx_indicators_etl_spark.operators import dedup as D

    out = (
        spark.createDataFrame(
            [(1, "alpha beta gamma delta"), (2, None), (3, "x")],
            "doc_id long, text string",
        )
        .select(
            "doc_id",
            D.shingles("text", n=3).alias("sh"),
            D.shingles_from_tokens(F.split(F.col("text"), " "), 3).alias("sht"),
        )
        .orderBy("doc_id")
        .collect()
    )
    assert len(out[0]["sh"]) == 2
    assert out[1]["sh"] == [] and out[1]["sht"] == []  # NULL -> []
    assert out[2]["sh"] == []  # sub-shingle doc -> []


def test_knn_graph_mutual_edges(spark):
    """Mutual-kNN reduction: every surviving edge appears in BOTH
    directed kNN lists; directed mode bounds out-degree by k."""
    import math

    rows = [
        # two tight clusters + one outlier
        (0, [1.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0]),
        (2, [0.98, 0.15, 0.0]),
        (10, [0.0, 1.0, 0.0]),
        (11, [0.05, 0.99, 0.0]),
        (99, [0.0, 0.0, 1.0]),
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    directed = similarity.knn_graph(emb, k=2, mutual=False)
    deg = directed.groupBy("src").count().collect()
    assert all(r["count"] <= 2 for r in deg)
    dset = {(r["src"], r["dst"]) for r in directed.collect()}
    mutual = similarity.knn_graph(emb, k=2, mutual=True).collect()
    assert mutual, "clusters must produce mutual edges"
    for r in mutual:
        assert (r["id_a"], r["id_b"]) in dset and (r["id_b"], r["id_a"]) in dset
        assert r["id_a"] < r["id_b"]
    # cluster-mates are mutual neighbors; outlier never pairs across
    pairs = {(r["id_a"], r["id_b"]) for r in mutual}
    assert (0, 1) in pairs and (10, 11) in pairs
    assert not any(99 in p for p in pairs)
    # exact cosine value on a known pair
    c01 = next(r["cos_sim"] for r in mutual if (r["id_a"], r["id_b"]) == (0, 1))
    v0, v1 = rows[0][1], rows[1][1]
    dot = sum(a * b for a, b in zip(v0, v1))
    expect = dot / (
        math.sqrt(sum(a * a for a in v0)) * math.sqrt(sum(b * b for b in v1))
    )
    assert abs(c01 - round(expect, 6)) < 1e-9


def test_knn_graph_matches_bruteforce_directed(spark, sf_dir):
    """Blocked local-top-k + global rank == brute-force top-k for
    every node (exactness of the candidate bound)."""
    from dfx_indicators_etl_spark.sources import read_table

    emb = read_table(spark, sf_dir, "embeddings").limit(60).localCheckpoint()
    directed = {
        (r["src"], r["rank"]): r["dst"]
        for r in similarity.knn_graph(emb, k=3, mutual=False).collect()
    }
    brute = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in similarity.brute_force_topk(emb, emb, k=3).collect()
    }
    assert directed == brute


def test_pmi_bigrams_known_corpus(spark):
    import math

    docs = spark.createDataFrame(
        [(i, "new york " * 5 + "hello world") for i in range(3)],
        "doc_id long, text string",
    )
    from dfx_indicators_etl_spark.operators import text as T

    out = {
        (r["w1"], r["w2"]): r
        for r in T.pmi_bigrams(docs, min_count=3, top_k=10).collect()
    }
    assert ("new", "york") in out
    # counts: "new york" bigram 15×; unigrams new=15, york=15;
    # N1 = 3*12 = 36 tokens, N2 = 3*11 = 33 bigrams
    r = out[("new", "york")]
    assert r["n"] == 15
    expect = (
        math.log(15.0) + 2.0 * math.log(36.0) - math.log(33.0)
        - math.log(15.0) - math.log(15.0)
    )
    assert abs(r["pmi"] - round(expect, 6)) < 1e-9
    # min_count guard: "world hello" never repeats across docs... but
    # "york new" occurs 4× per doc = 12 ≥ 3 — present; "hello world"
    # occurs 3 times total — exactly at min_count
    assert ("hello", "world") in out


def test_char_entropy_closed_forms(spark):
    from dfx_indicators_etl_spark.operators import text as T

    docs = spark.createDataFrame(
        [(1, "aaaaaaaa"), (2, "abababab"), (3, "abcdabcd")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in T.char_entropy(docs).collect()}
    assert out[1]["entropy_bits"] == 0.0 and out[1]["n_distinct"] == 1
    assert abs(out[2]["entropy_bits"] - 1.0) < 1e-6
    assert abs(out[3]["entropy_bits"] - 2.0) < 1e-6
    assert out[3]["n_chars"] == 8 and out[3]["n_distinct"] == 4


def test_temperature_sample_rates_and_determinism(spark):
    from dfx_indicators_etl_spark.operators import sampling

    rows = [(i, "en") for i in range(400)] + [(1000 + i, "fr") for i in range(100)] + [
        (2000 + i, "de") for i in range(25)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sampling.temperature_sample(docs, "lang", "doc_id", temperature=2.0)
    got = out.collect()
    rates = {r["lang"]: r["rate"] for r in got}
    # rarest group keeps everything (rate 1.0); rates follow sqrt(c_min/c)
    assert rates["de"] == 1.0
    assert abs(rates["fr"] - round((25 / 100) ** 0.5, 6)) < 1e-9
    assert abs(rates["en"] - round((25 / 400) ** 0.5, 6)) < 1e-9
    kept = {lang: sum(1 for r in got if r["lang"] == lang) for lang in rates}
    assert kept["de"] == 25  # rate 1.0 keeps all

    # determinism: identical survivor set across runs
    again = {r["doc_id"] for r in sampling.temperature_sample(
        docs, "lang", "doc_id", temperature=2.0).collect()}
    assert again == {r["doc_id"] for r in got}
    # T→1 degenerates to keep-everything (exponent 0 → rate 1)
    all_kept = sampling.temperature_sample(docs, "lang", "doc_id", temperature=1.0)
    assert all_kept.count() == len(rows)


def test_temperature_sample_null_group_reachable(spark):
    """A NULL group is priced by the counts aggregate, so its rows must
    reach that rate through the null-safe join instead of vanishing
    (ADVICE r7). NULL here is the RAREST group → rate 1.0, all kept."""
    from dfx_indicators_etl_spark.operators import sampling

    rows = [(i, "en") for i in range(100)] + [(1000 + i, None) for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sampling.temperature_sample(docs, "lang", "doc_id", temperature=2.0)
    got = out.collect()
    null_rows = [r for r in got if r["lang"] is None]
    assert len(null_rows) == 10  # rate 1.0 keeps the whole NULL group
    assert all(r["rate"] == 1.0 for r in null_rows)
    en_rate = next(r["rate"] for r in got if r["lang"] == "en")
    assert abs(en_rate - round((10 / 100) ** 0.5, 6)) < 1e-9


def test_bigram_logprob_known_value(spark):
    import math

    from dfx_indicators_etl_spark.operators import text as T

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a a"), (3, "c")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in T.bigram_logprob(docs).collect()}
    # doc 3 has no bigrams -> absent
    assert set(out) == {1, 2}
    # corpus: tokens a=4, b=2, c=1, N=7; bigrams: (a,b)=2, (b,a)=1, (a,a)=1
    lam = 0.7
    def p(c12, c1, c2):
        return lam * (c12 / c1) + (1.0 - lam) * (c2 / 7.0)
    expect1 = -(math.log(p(2, 4, 2)) + math.log(p(1, 2, 4)) + math.log(p(2, 4, 2))) / 3
    assert out[1]["n_bigrams"] == 3
    assert abs(out[1]["mean_nll"] - round(expect1, 6)) < 1e-9
    expect2 = -math.log(p(1, 4, 4))
    assert abs(out[2]["mean_nll"] - round(expect2, 6)) < 1e-9


def test_knn_graph_block_count_invariance(spark, sf_dir):
    """Exactness under the blocked plan: the mutual edge set is
    identical whether the corpus fits one block or is split across
    seven (local-top-k-per-pair + global rank loses nothing)."""
    from dfx_indicators_etl_spark.sources import read_table

    emb = read_table(spark, sf_dir, "embeddings").limit(80).localCheckpoint()

    def edges(n_blocks):
        return sorted(
            (r["id_a"], r["id_b"], r["cos_sim"])
            for r in similarity.knn_graph(emb, k=3, n_blocks=n_blocks).collect()
        )

    assert edges(1) == edges(7)


def test_knn_graph_no_self_edges_tiny_corpus(spark):
    """A corpus smaller than k+1 must not leak the diagonal-mask
    sentinel as a self-edge in directed mode (ADVICE r7): every vector
    has fewer than k real candidates, so the masked self entry
    survives the local top-k and must be filtered before the rank."""
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    directed = similarity.knn_graph(emb, k=5, mutual=False).collect()
    assert directed, "tiny corpus still produces directed edges"
    for r in directed:
        assert r["src"] != r["dst"]
        assert r["cos_sim"] > -2.0
    # each vector sees exactly the 2 real candidates, never itself
    from collections import Counter

    deg = Counter(r["src"] for r in directed)
    assert deg == {0: 2, 1: 2, 2: 2}


def test_phash_banded_equals_bruteforce(spark, sf_dir):
    """Pigeonhole exactness: with bands > max_hamming and no bucket
    cap, the banded pair set equals brute-force Hamming-≤k over the
    full signature table — banding loses nothing."""
    from dfx_indicators_etl_spark.operators import multimodal as M
    from dfx_indicators_etl_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents").limit(120)
    corpus = M.attach_binary_payload(docs).localCheckpoint()
    banded = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in M.phash_pairs(corpus, max_hamming=6).collect()
    }
    words = M.phash_words(corpus).collect()
    n_words = M.PHASH_BITS // 32
    brute = set()
    for i, a in enumerate(words):
        for b in words[i + 1:]:
            h = sum(
                bin(a[f"w{m}"] ^ b[f"w{m}"]).count("1")
                for m in range(n_words)
            )
            if h <= 6:
                lo, hi = sorted((a["doc_id"], b["doc_id"]))
                brute.add((lo, hi, h))
    assert banded == brute


def test_phash_reencode_recall_and_brightness_invariance(spark):
    """aHash semantics: a constant brightness shift (+c on every gray
    that stays in range) leaves the hash unchanged (mean shifts
    equally), and tiny per-byte nudges keep Hamming small — the
    re-encode robustness the mm_phash_dedup demo relies on."""
    from dfx_indicators_etl_spark.operators import multimodal as M

    texts = [
        (1, "The quick brown fox jumps over the lazy dog " * 8),
        (2, "Pack my box with five dozen liquor jugs today " * 8),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    # brightness shift: every lowercase letter -> uppercase is -32 on
    # ALL alpha bytes; use a clean +1-on-everything instead via chr map
    shifted = spark.createDataFrame(
        [(i + 10, "".join(chr(ord(c) + 1) for c in t)) for i, t in texts],
        "doc_id long, text string",
    )
    n_words = M.PHASH_BITS // 32
    words = {
        r["doc_id"]: tuple(r[f"w{m}"] for m in range(n_words))
        for r in M.phash_words(
            M.attach_binary_payload(docs.unionByName(shifted))
        ).collect()
    }
    # +1 on every byte shifts every gray and the mean by exactly 1:
    # bit pattern identical
    assert words[1] == words[11] and words[2] == words[12]
    # distinct texts produce far-apart hashes (no trivial collisions)
    h = sum(
        bin(words[1][m] ^ words[2][m]).count("1") for m in range(n_words)
    )
    assert h > 6


def test_phash_bucket_cap_and_guards(spark):
    """max_band_bucket drops hot buckets (candidates shrink), and the
    pigeonhole/band-width guards reject bad configurations."""
    import pytest

    from dfx_indicators_etl_spark.operators import multimodal as M

    same = spark.createDataFrame(
        [(i, "identical payload text") for i in range(12)],
        "doc_id long, text string",
    )
    corpus = M.attach_binary_payload(same)
    uncapped = M.phash_pairs(corpus, max_hamming=6).count()
    assert uncapped == 12 * 11 // 2  # all-identical: every pair
    capped = M.phash_pairs(corpus, max_hamming=6, max_band_bucket=5).count()
    assert capped == 0  # every bucket is hot -> all dropped
    with pytest.raises(ValueError):
        M.phash_pairs(corpus, max_hamming=8, bands=8)
    with pytest.raises(ValueError):
        M.phash_pairs(corpus, bands=3)


def test_char_entropy_partition_invariance(spark):
    """DECIMAL term summation: identical entropy under any input
    partitioning (a double sum would drift in the last ulp)."""
    from dfx_indicators_etl_spark.operators import text as T

    docs = spark.createDataFrame(
        [(i, ("abcdefgh" * (i % 7 + 1))[: i + 3]) for i in range(64)],
        "doc_id long, text string",
    )
    one = {r["doc_id"]: r["entropy_bits"] for r in T.char_entropy(docs.coalesce(1)).collect()}
    many = {r["doc_id"]: r["entropy_bits"] for r in T.char_entropy(docs.repartition(13)).collect()}
    assert one == many


def test_kmeans_portable_quality_and_invariance(spark):
    """The portable (oracle-able) mode: inertia within 10% of the
    k-means++ library path on the sf0.01 embeddings, and — because
    Lloyd partials sum as exact scaled decimals — assignments are
    IDENTICAL under any input partitioning (the float-partials path
    can drift in the last ulp; the portable path cannot)."""
    from dfx_indicators_etl_spark.sources import read_table

    emb = read_table(spark, "/root/testdata/sf0.01", "embeddings")
    portable = similarity.kmeans(emb, k=8, n_iter=10, portable=True).collect()
    classic = similarity.kmeans(emb, k=8, n_iter=10).collect()
    pi = sum(r["dist"] ** 2 for r in portable)
    ci = sum(r["dist"] ** 2 for r in classic)
    assert pi <= ci * 1.10, (pi, ci)

    again = similarity.kmeans(
        emb.repartition(13), k=8, n_iter=10, portable=True
    ).collect()
    key = lambda rows: sorted((r["vec_id"], r["cluster"], r["dist"]) for r in rows)
    assert key(again) == key(portable)


def test_fuzzy_levenshtein_blocking_and_cap(spark):
    base = "the quick brown fox " * 10  # 200 chars, one shared prefix
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base[:150] + " jumped over it!"),        # small edit: pair
            (3, base[:50] + "Z" * 200),                   # same block, far
            (4, "completely different text " * 10),       # other block
        ],
        ["doc_id", "text"],
    )
    out = dedup.fuzzy_levenshtein_pairs(docs, max_dist=10, max_block=None)
    pairs = {(r["doc_a"], r["doc_b"]): r["dist"] for r in out.collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 0  # probes identical @120
    assert all(a != 4 and b != 4 for a, b in pairs)  # blocked out
    assert (1, 3) not in pairs and (2, 3) not in pairs  # over max_dist
    # skew cap: 3 same-block docs capped to 2 -> exactly 1 candidate pair
    capped = dedup.fuzzy_levenshtein_pairs(
        docs, max_dist=1000, max_block=2
    ).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in capped} == {(1, 2)}


def test_priority_sample_invariants(spark, sf_dir):
    from dfx_indicators_etl_spark.operators.sampling import (
        hash_uniform,
        priority_sample,
    )
    from dfx_indicators_etl_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", "n_chars"
    )
    out = priority_sample(
        docs, weight_col="n_chars", key_col="doc_id", n=5, group_cols=["lang"]
    )
    rows = out.collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    sizes = {r[0]: r[1] for r in docs.groupBy("lang").count().collect()}
    for lang, got in by_lang.items():
        assert len(got) == min(5, sizes[lang])
        got.sort(key=lambda r: r["rk"])
        pr = [r["priority"] for r in got]
        assert pr == sorted(pr, reverse=True)  # rank follows priority
    # determinism: a second run selects the identical id set
    again = {r["doc_id"] for r in priority_sample(
        docs, weight_col="n_chars", key_col="doc_id", n=5, group_cols=["lang"]
    ).collect()}
    assert again == {r["doc_id"] for r in rows}
    # priority really is w/u of the portable uniform
    one = docs.limit(1).withColumn("u", hash_uniform("doc_id", "prio")).collect()[0]
    assert any(
        abs(r["priority"] - round(one["n_chars"] / one["u"], 6)) < 1e-6
        for r in rows
    ) or one["doc_id"] not in {r["doc_id"] for r in rows}


def test_phash_256_recall_and_collision_drop(spark):
    """The 256-bit growth step (VERDICT r8 #3): banded search at
    n_bits=256 still equals brute-force Hamming-≤6 (pigeonhole holds
    with 32-bit band keys), and on a random corpus the band-bucket
    collision volume — the candidate-pair driver at large corpora —
    drops versus the 128-bit grid."""
    import random

    from dfx_indicators_etl_spark.operators import multimodal as M

    rng = random.Random(9)
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789 "
    texts = [
        (i, "".join(rng.choice(alpha) for _ in range(rng.randint(40, 200))))
        for i in range(400)
    ]
    # planted near-dups: +1 on every byte is hash-identical (mean
    # shifts equally) -> must be recovered at Hamming 0
    planted = [
        (i + 10_000, "".join(chr(ord(c) + 1) for c in t))
        for i, t in texts[:40]
    ]
    docs = spark.createDataFrame(
        texts + planted, "doc_id long, text string"
    )
    corpus = M.attach_binary_payload(docs).localCheckpoint()

    def collisions_and_words(n_bits):
        words = M.phash_words(corpus, n_bits=n_bits).collect()
        n_bands, width = 8, n_bits // 8
        mask = (1 << width) - 1
        buckets = {}
        for r in words:
            for b in range(n_bands):
                lo = b * width
                key = (r[f"w{lo // 32}"] >> (lo % 32)) & mask
                buckets.setdefault((b, key), []).append(r["doc_id"])
        coll = sum(
            len(v) * (len(v) - 1) // 2 for v in buckets.values()
        )
        return coll, words

    coll_128, _ = collisions_and_words(128)
    coll_256, words_256 = collisions_and_words(256)
    # identical planted pairs always collide in all 8 bands (8 * 40
    # pairs is the floor); random collisions must shrink at 256 bits
    assert coll_256 < coll_128, (coll_128, coll_256)
    assert coll_256 >= 8 * len(planted)

    banded = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in M.phash_pairs(corpus, max_hamming=6, n_bits=256).collect()
    }
    brute = set()
    for i, a in enumerate(words_256):
        for b in words_256[i + 1:]:
            h = sum(
                bin(a[f"w{m}"] ^ b[f"w{m}"]).count("1") for m in range(8)
            )
            if h <= 6:
                lo, hi = sorted((a["doc_id"], b["doc_id"]))
                brute.add((lo, hi, h))
    assert banded == brute
    # every planted identical pair recovered
    for i, _ in texts[:40]:
        assert (i, i + 10_000, 0) in brute
