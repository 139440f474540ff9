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


def _drain(spark, src, state_dir, out_dir, checkpoint_dir=None, **kwargs):
    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .format("parquet")
        .load(src)
    )
    q = streaming.stream_minhash_dedup_banded(
        stream, state_dir, out_dir, checkpoint_dir=checkpoint_dir, **kwargs
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


def _claims_dirs(state_dir):
    import os

    if not os.path.isdir(state_dir):
        return []
    return sorted(d for d in os.listdir(state_dir) if d.startswith("batch="))


def test_banded_dedup_compaction_bounds_state(spark, dirs, tmp_path):
    """≥3 drains against one claims table with per-batch compaction:
    verdicts are identical to the uncompacted run and the claims
    directory count stays bounded instead of growing per batch."""
    src, state, out = dirs
    _write_docs(spark, src, DOCS)
    resend1 = [(100 + i, t) for i, t in DOCS[:4]]
    resend2 = [(200 + i, t) for i, t in DOCS[:4]] + [
        (299, "an entirely novel paragraph speaking of adaptive query execution")
    ]
    srcs = [src, str(tmp_path / "s1"), str(tmp_path / "s2")]
    _write_docs(spark, srcs[1], resend1)
    _write_docs(spark, srcs[2], resend2)

    def run(state_dir, tag, **kwargs):
        verdicts = {}
        for i, s in enumerate(srcs):
            verdicts.update(
                _drain(
                    spark,
                    s,
                    state_dir,
                    str(tmp_path / f"out-{tag}-{i}"),
                    checkpoint_dir=str(tmp_path / f"ck-{tag}-{i}"),
                    **kwargs,
                )
            )
        return verdicts

    compacted = run(state, "c", compact_every=1)
    plain = run(str(tmp_path / "state2"), "p", compact_every=None)
    assert compacted == plain
    # every re-sent doc is a dup of the first drain's representative
    assert all(compacted[k][0] for k in (101, 102, 103, 104, 201))
    assert compacted[299][0] is False
    # bounded: own batch partition + one compacted partition
    assert len(_claims_dirs(state)) <= 2
    assert len(_claims_dirs(str(tmp_path / "state2"))) == 3


def test_banded_dedup_retry_ignores_own_prior_claims(spark, dirs, tmp_path):
    """A batch retried AFTER its claims write committed (crash between
    the claims and verdicts writes, restart from checkpoint) must not
    see its own prior claims as pre-existing — the regression where
    every doc in the batch flips to duplicate (ADVICE r4). Simulated
    by pre-seeding the claims table under the exact partition name the
    batch will use (token is derived from the checkpoint path, so it
    is predictable and stable across restarts)."""
    import hashlib
    import os

    from pyspark.sql import functions as F

    src, state, out = dirs
    _write_docs(spark, src, DOCS)
    ckpt = str(tmp_path / "ck-retry")
    token = hashlib.sha256(os.path.abspath(ckpt).encode()).hexdigest()[:12]
    # Pre-seed batch 0's own partition with the claims it would write.
    batch = spark.read.parquet(src)
    (
        streaming.ops.banded_minhash_rows(batch)
        .select("band_idx", "band_hash", "ts")
        .write.mode("overwrite")
        .parquet(f"{state}/batch={token}-0")
    )
    verdicts = _drain(spark, src, state, out, checkpoint_dir=ckpt)
    # the representative survives — its own poisoned claims were excluded
    assert verdicts[1][0] is False
    assert verdicts[2][0] is True and verdicts[3][0] is True
    assert verdicts[5][0] is False and verdicts[6][0] is False
    # and the partition was overwritten in place, not duplicated
    assert _claims_dirs(state).count(f"batch={token}-0") == 1


def test_banded_dedup_expiry_reopens_horizon(spark, dirs, tmp_path):
    """Claims older than ``expire_seconds`` age out at compaction: a
    duplicate re-sent past the horizon is kept again (horizon-bounded
    dedup, the same semantics as a streaming watermark dedup)."""
    text = DOCS[0][1]
    src1, state, out1 = dirs
    _write_docs(spark, src1, [(1, text)])  # ts = epoch + 1s
    src2, out2 = str(tmp_path / "s2"), str(tmp_path / "o2")
    _write_docs(spark, src2, [(1000, text)])  # ts = epoch + 1000s
    src3, out3 = str(tmp_path / "s3"), str(tmp_path / "o3")
    _write_docs(spark, src3, [(1001, text)])  # ts = epoch + 1001s

    kw = dict(compact_every=1, expire_seconds=10.0)
    a = _drain(spark, src1, state, out1, checkpoint_dir=str(tmp_path / "k1"), **kw)
    assert a[1][0] is False
    # within drain 2, doc 1's claims are still present → dup
    b = _drain(spark, src2, state, out2, checkpoint_dir=str(tmp_path / "k2"), **kw)
    assert b[1000][0] is True
    # drain 2's compaction expired doc 1's claims (epoch+1 < epoch+990);
    # doc 1000 claimed nothing (it was a dup), so drain 3's re-send
    # finds a clean horizon and is kept.
    c = _drain(spark, src3, state, out3, checkpoint_dir=str(tmp_path / "k3"), **kw)
    assert c[1001][0] is False


def test_banded_rows_single_band_is_not_remapped(spark, tmp_path):
    """``bands=1``: a real minhash band must keep ``band_idx=0`` — the
    exact-text pseudo-band (-1) is only for docs too short to shingle,
    flagged explicitly rather than inferred from the band count
    (ADVICE r4)."""
    src = str(tmp_path / "src")
    _write_docs(spark, src, [DOCS[0], (7, "tiny doc")])
    rows = streaming.ops.banded_minhash_rows(
        spark.read.parquet(src), bands=1
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["band_idx"])
    assert by_doc[DOCS[0][0]] == [0]  # shingleable: real band, idx 0
    assert by_doc[7] == [-1]  # sub-shingle: exact-text pseudo-band


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


def _frame(spark, docs):
    from pyspark.sql import functions as F

    return spark.createDataFrame(docs, "doc_id long, text string").withColumn(
        "ts",
        F.timestamp_micros(
            F.lit(1_600_000_000_000_000) + F.col("doc_id") * 1_000_000
        ),
    )


def test_incremental_batch_dedup_against_history(spark, tmp_path):
    """The batch face of the claims-table state machine: batch 2's
    duplicates of batch-1 docs are flagged without recomputing batch 1,
    and batch-2-internal dups keep exactly one representative."""
    state = str(tmp_path / "claims")
    b1 = _frame(spark, DOCS[:4])  # three exact dups + a near-dup
    v1 = {
        r["doc_id"]: r["is_dup"]
        for r in streaming.incremental_minhash_dedup(b1, state, "b1").collect()
    }
    assert v1[1] is False and v1[2] and v1[3] and v1[4]

    b2 = _frame(
        spark,
        [
            # exact copy of batch-1's representative → dup vs HISTORY
            (10, DOCS[0][1]),
            # two copies of a brand-new doc → one in-batch survivor
            (11, "a genuinely new document about incremental corpus growth"),
            (12, "a genuinely new document about incremental corpus growth"),
        ],
    )
    v2 = {
        r["doc_id"]: r["is_dup"]
        for r in streaming.incremental_minhash_dedup(b2, state, "b2").collect()
    }
    assert v2[10] is True  # caught against history
    assert v2[11] is False and v2[12] is True


def test_incremental_batch_dedup_retry_is_idempotent(spark, tmp_path):
    """Re-running a failed ingest under the SAME batch tag reproduces
    the same verdicts (own-partition exclusion + per-tag overwrite)."""
    state = str(tmp_path / "claims")
    streaming.incremental_minhash_dedup(_frame(spark, DOCS[:4]), state, "b1").collect()
    b2 = _frame(spark, [(10, DOCS[0][1]), (11, "fresh text entirely new")])
    first = {
        r["doc_id"]: r["is_dup"]
        for r in streaming.incremental_minhash_dedup(b2, state, "b2").collect()
    }
    retry = {
        r["doc_id"]: r["is_dup"]
        for r in streaming.incremental_minhash_dedup(b2, state, "b2").collect()
    }
    assert first == retry == {10: True, 11: False}


def test_banded_dedup_stale_lease_is_stolen(spark, dirs, tmp_path):
    """An orphaned ``_compact.lease`` (dead driver) must not block
    compaction forever: a lease younger than the TTL is honored
    (compaction skipped, partitions accumulate), one older than the
    TTL is stolen and compaction proceeds (ADVICE r6)."""
    import os

    src, state, out = dirs
    _write_docs(spark, src, DOCS)
    srcs = [src, str(tmp_path / "s1"), str(tmp_path / "s2")]
    _write_docs(spark, srcs[1], [(100 + i, t) for i, t in DOCS[:4]])
    _write_docs(spark, srcs[2], [(200 + i, t) for i, t in DOCS[:4]])

    def drain(i, **kw):
        return _drain(
            spark,
            srcs[i],
            state,
            str(tmp_path / f"out-{i}"),
            checkpoint_dir=str(tmp_path / f"ck-{i}"),
            compact_every=1,
            **kw,
        )

    drain(0)
    lease = os.path.join(state, "_compact.lease")
    # Fresh orphan: compaction must skip — partitions accumulate.
    open(lease, "w").close()
    before = len(_claims_dirs(state))
    v1 = drain(1)
    assert all(v1[k][0] for k in (101, 102, 103, 104))
    assert len(_claims_dirs(state)) >= before + 1  # nothing merged
    assert os.path.exists(lease)  # loser never deletes a live lease
    # Stale orphan: age it past the TTL — compaction steals and runs.
    os.utime(lease, (1, 1))
    v2 = drain(2)
    assert all(v2[k][0] for k in (201, 202, 203, 204))
    assert len(_claims_dirs(state)) <= 2  # merged: own + compacted
    assert not os.path.exists(lease)  # steal-winner releases it


def test_banded_dedup_portable_family(spark, dirs, tmp_path):
    """The portable md5 band family (the oracle-able registered mode)
    preserves the operator's semantics: one representative per exact
    cluster, near-dup caught, sub-shingle pseudo-band dedup, and the
    claims state persists across drains."""
    src, state, out = dirs
    _write_docs(spark, src, DOCS)
    v = _drain(spark, src, state, out, family="portable")
    assert v[1][0] is False and v[2][0] is True and v[3][0] is True
    assert v[4][0] is True  # near-dup
    assert v[5][0] is False and v[6][0] is False
    assert v[7] == (False, 1) and v[8] == (True, 1)
    assert v[1][1] == 16
    # history: a re-sent copy in a second drain is caught via claims
    src2 = str(tmp_path / "s2")
    _write_docs(spark, src2, [(100, DOCS[0][1])])
    v2 = _drain(
        spark, src2, state, str(tmp_path / "out2"),
        checkpoint_dir=str(tmp_path / "ck2"), family="portable",
    )
    assert v2[100][0] is True
