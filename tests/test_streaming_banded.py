"""Band-level (any-of-k) streaming LSH dedup — semantics tests.

The properties that distinguish this operator from full-signature
dedup: any-band collision flags a dup, a kept doc claims all its
buckets atomically (exactly one representative survives per duplicate
cluster), verdicts are deterministic (event-time-ordered claims, not
arrival order), and the claims table persists dedup state across
drains.
"""

from __future__ import annotations

import pytest

from dfx_indicators_etl_spark import streaming

BASE = "the quick brown fox jumps over the lazy dog while carrying a basket "
DOCS = [
    # three exact duplicates — one representative must survive
    (1, BASE + "of fresh fruit to the market square on a sunny morning"),
    (2, BASE + "of fresh fruit to the market square on a sunny morning"),
    (3, BASE + "of fresh fruit to the market square on a sunny morning"),
    # near-duplicate of the group (one word changed)
    (4, BASE + "of fresh fruit to the market square on a rainy morning"),
    # unrelated novel docs
    (5, "completely different text about distributed query engines and shuffles"),
    (6, "yet another unrelated document mentioning watermarks and state stores"),
    # too short to shingle — exact-hash pseudo-band fallback
    (7, "tiny doc"),
    (8, "tiny doc"),
]


def _write_docs(spark, path, docs):
    from pyspark.sql import functions as F

    (
        spark.createDataFrame(docs, "doc_id long, text string")
        .withColumn(
            "ts",
            F.timestamp_micros(
                F.lit(1_600_000_000_000_000) + F.col("doc_id") * 1_000_000
            ),
        )
        .write.mode("overwrite")
        .parquet(path)
    )


def _drain(spark, src, state_dir, out_dir, checkpoint_dir=None):
    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .format("parquet")
        .load(src)
    )
    q = streaming.stream_minhash_dedup_banded(
        stream, state_dir, out_dir, checkpoint_dir=checkpoint_dir
    )
    assert q.awaitTermination(120), "drain timed out"
    q.stop()
    return {
        r["doc_id"]: (r["is_dup"], r["n_bands"])
        for r in spark.read.parquet(out_dir).collect()
    }


@pytest.fixture()
def dirs(tmp_path):
    return (
        str(tmp_path / "src"),
        str(tmp_path / "claims"),
        str(tmp_path / "verdicts"),
    )


def test_banded_dedup_keeps_one_representative(spark, dirs):
    src, state, out = dirs
    _write_docs(spark, src, DOCS)
    verdicts = _drain(spark, src, state, out)
    assert set(verdicts) == {1, 2, 3, 4, 5, 6, 7, 8}
    # exactly one survivor from the exact-dup cluster — the earliest
    assert verdicts[1][0] is False
    assert verdicts[2][0] is True and verdicts[3][0] is True
    # near-dup collides on at least one band with the kept original
    assert verdicts[4][0] is True
    # novel docs survive
    assert verdicts[5][0] is False and verdicts[6][0] is False
    # sub-shingle docs: exact-hash pseudo-band, 1 band each, dedup works
    assert verdicts[7] == (False, 1) and verdicts[8] == (True, 1)
    # shingleable docs carry the full band count
    assert verdicts[1][1] == 16


def test_banded_dedup_is_deterministic(spark, dirs, tmp_path):
    src, _, _ = dirs
    _write_docs(spark, src, DOCS)
    a = _drain(spark, src, str(tmp_path / "c1"), str(tmp_path / "o1"))
    b = _drain(spark, src, str(tmp_path / "c2"), str(tmp_path / "o2"))
    assert a == b


def test_banded_dedup_state_persists_across_drains(spark, dirs, tmp_path):
    src, state, out = dirs
    _write_docs(spark, src, DOCS[:6])
    first = _drain(spark, src, state, out)
    assert first[1][0] is False

    # A later drain (new arrivals, same claims table) must still see
    # the first drain's claims: a re-sent duplicate of doc 1 is a dup.
    src2 = str(tmp_path / "src2")
    out2 = str(tmp_path / "verdicts2")
    _write_docs(spark, src2, [(100, DOCS[0][1]), (101, "something genuinely new here about columnar codecs")])
    second = _drain(
        spark, src2, state, out2, checkpoint_dir=str(tmp_path / "ckpt2")
    )
    assert second[100][0] is True
    assert second[101][0] is False
