"""Content-defined chunking (round 8).

The operator is checked against a direct Python model of the same
rolling-hash boundary rule, then the property CDC exists for —
boundary re-synchronization after a prefix insertion — is asserted
both on the chunk level and through ``cdc_chunk_pairs``.
"""

from __future__ import annotations

import hashlib
import random

from dfx_indicators_etl_spark.operators.text import (
    CDC_MOD,
    CDC_POWS,
    CDC_WINDOW,
    cdc_chunk_pairs,
    cdc_chunks,
)

DIVISOR = 32


def _chunks_model(s: str) -> list[tuple[int, int, int, str]]:
    n = len(s)
    if n == 0:
        return []
    ends = []
    for i in range(CDC_WINDOW, n + 1):  # 1-based boundary position
        h = (
            sum(
                ord(s[i - CDC_WINDOW + j]) * CDC_POWS[j]
                for j in range(CDC_WINDOW)
            )
            % CDC_MOD
        )
        if h % DIVISOR == 0:
            ends.append(i)
    if not ends or ends[-1] != n:
        ends.append(n)
    out, start = [], 0
    for k, e in enumerate(ends):
        piece = s[start:e]
        out.append((k, start, e - start, hashlib.sha256(piece.encode()).hexdigest()))
        start = e
    return out


def _collect(spark, texts):
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {}
    for r in cdc_chunks(df, divisor=DIVISOR).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_start"], r["chunk_len"], r["chunk_sha"])
        )
    return {k: sorted(v) for k, v in got.items()}


def test_matches_python_model(spark):
    """Random word-salad docs of every size class (empty, shorter than
    the hash window, typical): operator == model, chunks partition the
    doc exactly."""
    rng = random.Random(8)
    words = ["alpha", "beta", "gamma", "delta", "x", "longword"]
    texts = [(0, ""), (1, "abc"), (2, "exactly8")]
    for i in range(3, 40):
        texts.append(
            (i, " ".join(rng.choice(words) for _ in range(rng.randrange(1, 80))))
        )
    got = _collect(spark, texts)
    for doc_id, s in texts:
        model = _chunks_model(s)
        assert got.get(doc_id, []) == model, doc_id
        assert sum(c[2] for c in model) == len(s)  # exact partition


def test_prefix_insertion_resyncs(spark):
    """The CDC property: prepending a prefix changes at most the
    chunks before the first post-prefix boundary — every chunk of the
    original after its first boundary reappears in the variant.
    (Fixed-offset chunking shares nothing after a 1-char insertion.)"""
    rng = random.Random(88)
    s = " ".join(
        rng.choice(["lorem", "ipsum", "dolor", "sit", "amet", "quia"])
        for _ in range(120)
    )
    shas = {c[3] for c in _chunks_model(s)[1:]}
    variant_shas = {c[3] for c in _chunks_model("zzz " + s)}
    assert shas, "test doc must produce >1 chunk"
    assert shas <= variant_shas


def test_chunk_pairs_find_prefixed_variants(spark):
    """cdc_chunk_pairs recovers original↔variant pairs under per-doc
    prefix insertions at high containment."""
    rng = random.Random(888)
    words = ["quick", "brown", "fox", "jumps", "river", "stone", "owl"]
    originals = [
        (i, " ".join(rng.choice(words) for _ in range(100))) for i in range(1, 9)
    ]
    variants = [(i + 100, "x" * (i % 5 + 2) + " " + t) for i, t in originals]
    df = spark.createDataFrame(originals + variants, "doc_id long, text string")
    rows = cdc_chunk_pairs(df, min_containment=0.4).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["containment"] for r in rows}
    for i, _ in originals:
        assert (i, i + 100) in pairs, i
        assert pairs[(i, i + 100)] >= 0.7


def test_hot_chunk_cap(spark):
    """A chunk shared by every doc is silenced by the frequency cap —
    identical docs then share nothing (all their chunks are hot)."""
    docs = [(i, "same text that chunks identically " * 3) for i in range(10)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    assert cdc_chunk_pairs(df, max_chunk_freq=4).count() == 0
    assert cdc_chunk_pairs(df, max_chunk_freq=None).count() == 10 * 9 // 2


def test_cdc_excise_model(spark):
    """First-occurrence excision against a hand-built corpus: a full
    copy empties out, a prefixed variant keeps ~just the prefix, a
    unique doc is absent from the (patch-sized) output."""
    import random as _random

    from dfx_indicators_etl_spark.operators.text import cdc_excise

    rng = _random.Random(7)
    base = " ".join(
        rng.choice(["alpha", "beta", "gamma", "delta", "omega"])
        for _ in range(150)
    )
    corpus = [
        (1, base),            # first occurrence: untouched, not emitted
        (2, base),            # full copy: every chunk removed, empties
        (3, "zz " + base),    # prefix insert: post-resync chunks removed
        (4, "totally unrelated content here"),  # unique: absent
    ]

    def chunks(s):
        return _chunks_model(s)

    # python model of the first-occurrence rule over (doc_id, start)
    seen, model = set(), {}
    for doc_id, s in corpus:
        kept, removed = [], 0
        for _idx, start, length, sha in chunks(s):
            if sha in seen:
                removed += 1
            else:
                seen.add(sha)
                kept.append(s[start : start + length])
        if removed:
            new = "".join(kept)
            model[doc_id] = (
                removed,
                len(new),
                hashlib.sha256(new.encode()).hexdigest(),
            )

    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_removed"], r["new_len"], r["new_sha"])
        for r in cdc_excise(df, divisor=DIVISOR).collect()
    }
    assert got == model
    assert 1 not in got and 4 not in got
    assert got[2][1] == 0  # full copy emptied out
    assert 0 < got[3][1] < len("zz " + base)  # prefix survivor is partial
