"""Video delta-shingle dedup (round 8).

Checks the shingle operator against a direct Python model of the fake
codec, then the operator's reason to exist: delta shingles are
invariant under a uniform brightness shift while absolute-value
signatures are not.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from dfx_indicators_etl_spark.operators import multimodal as M

SHIFT_FROM = "".join(chr(c) for c in range(32, 126))
SHIFT_TO = "".join(chr(c + 1) for c in range(32, 126))


def _shingles_model(text: str) -> set[int]:
    b = text.encode()
    n = len(b)
    if n == 0:
        return set()
    n_frames = n % 30 + 1
    step = n // n_frames
    cs = [b[i * step] for i in range(n_frames)]
    d = [cs[i + 1] - cs[i] for i in range(len(cs) - 1)]
    return {
        (d[t] + 256) * 262144 + (d[t + 1] + 256) * 512 + (d[t + 2] + 256)
        for t in range(len(d) - 2)
    }


def _mk(spark, texts):
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    return M.attach_binary_payload(docs)


def test_shingles_match_model(spark):
    """Random payloads of every frame-count class (0, 1, few, many
    frames): operator shingle sets == the Python model's."""
    rng = random.Random(8)
    texts = [(0, ""), (1, "ab"), (2, "abcd")]
    for i in range(3, 40):
        texts.append(
            (i, "".join(chr(rng.randrange(32, 122)) for _ in range(rng.randrange(1, 300))))
        )
    got = {}
    for r in M.video_shingles(_mk(spark, texts)).collect():
        got.setdefault(r["doc_id"], set()).add(r["shingle"])
    for doc_id, text in texts:
        assert got.get(doc_id, set()) == _shingles_model(text), doc_id


def test_brightness_shift_invariance(spark):
    """A uniform +1 byte shift changes every frame checksum but no
    delta shingle — pairs come back at jaccard 1.0; the absolute
    checksums really do differ (the invariance is earned, not
    trivial)."""
    rng = random.Random(88)
    texts = [
        (i, "".join(chr(rng.randrange(32, 121)) for _ in range(124)))
        for i in range(1, 6)
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    variants = docs.select(
        (F.col("doc_id") + 100).alias("doc_id"),
        F.translate(F.col("text"), SHIFT_FROM, SHIFT_TO).alias("text"),
    )
    corpus = M.attach_binary_payload(docs.unionByName(variants))
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in M.video_dedup_pairs(corpus, threshold=0.8).collect()
    }
    for i, _ in texts:
        assert pairs.get((i, i + 100)) == 1.0, i
    # absolute frame checksums differ everywhere between the pair
    fr = {
        (r["doc_id"], r["frame_idx"]): r["frame_checksum"]
        for r in M.frame_checksums(corpus).collect()
    }
    for (doc, idx), cs in fr.items():
        if doc <= 100 and (doc + 100, idx) in fr:
            assert fr[(doc + 100, idx)] == cs + 1


def test_hot_shingle_cap(spark):
    """Identical payloads everywhere: every shingle is hot, the cap
    silences them all; uncapped they all pair at jaccard 1.0."""
    docs = spark.createDataFrame(
        [(i, "static scene payload bytes repeated " * 3) for i in range(8)],
        "doc_id long, text string",
    )
    corpus = M.attach_binary_payload(docs)
    assert M.video_dedup_pairs(corpus, max_shingle_freq=4).count() == 0
    uncapped = M.video_dedup_pairs(corpus, max_shingle_freq=None).collect()
    assert len(uncapped) == 8 * 7 // 2
    assert all(r["jaccard"] == 1.0 for r in uncapped)
