"""Scene-cut segmentation + audio offset matching (round 8).

Every check compares the Spark operators against a direct Python model
of the same deterministic fake codec — the test strategy of SURVEY §5:
small handcrafted inputs with exactly-known answers, plus the real
corpus for cross-implementation identity.
"""

from __future__ import annotations

import random

from dfx_indicators_etl_spark.operators import multimodal as M
from dfx_indicators_etl_spark.sources import read_table

SCENE_THRESHOLD = 64


def _frames_model(text: str) -> list[int]:
    b = text.encode()
    n = len(b)
    if n == 0:
        return []
    n_frames = n % 30 + 1
    step = n // n_frames
    return [b[i * step] for i in range(n_frames)]


def _scenes_model(text: str) -> list[tuple[int, int, int, int]]:
    cs = _frames_model(text)
    scenes, scene_idx = [], -1
    for i, c in enumerate(cs):
        if i == 0 or abs(c - cs[i - 1]) > SCENE_THRESHOLD:
            scene_idx += 1
            scenes.append([scene_idx, i, i, 1])
        else:
            scenes[-1][2] = i
            scenes[-1][3] += 1
    return [tuple(s) for s in scenes]


def _windows_model(text: str) -> list[int]:
    b = text.encode()
    n, w, s = len(b), M.AUDIO_WINDOW_BYTES, M.AUDIO_STRIDE
    if n < w:
        return []
    return [
        sum((b[t * s + j] >> 4) << (4 * j) for j in range(w))
        for t in range((n - w) // s + 1)
    ]


def test_frame_checksums_matches_python_codec(spark, sf_dir):
    """The codegen frame extraction is bit-identical to the
    ``sample_frames`` Python stub at stride 1 on the real corpus."""
    docs = read_table(spark, sf_dir, "documents").limit(100)
    corpus = M.attach_binary_payload(docs).localCheckpoint()
    codegen = {
        (r["doc_id"], r["frame_idx"]): r["frame_checksum"]
        for r in M.frame_checksums(corpus).collect()
    }
    python = {
        (r["doc_id"], r["frame_idx"]): r["frame_checksum"]
        for r in M.sample_frames(corpus, stride=1).collect()
    }
    assert codegen == python and codegen


def test_scene_cuts_matches_model(spark):
    """Random ASCII payloads: operator scenes == the Python model's
    (cut on first frame and on |Δchecksum| > threshold)."""
    rng = random.Random(8)
    texts = [
        (
            i,
            "".join(chr(rng.randrange(32, 127)) for _ in range(rng.randrange(1, 200))),
        )
        for i in range(25)
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {}
    rows = M.scene_cuts(
        M.attach_binary_payload(docs), threshold=SCENE_THRESHOLD
    ).collect()
    for r in rows:
        got.setdefault(r["doc_id"], []).append(
            (r["scene_idx"], r["start_frame"], r["end_frame"], r["n_frames"])
        )
    for doc_id, text in texts:
        assert sorted(got.get(doc_id, [])) == _scenes_model(text), doc_id


def test_scene_cuts_edges(spark):
    """A constant payload is one scene; an empty payload emits no
    scenes; frames partition exactly (Σ n_frames == frame count)."""
    docs = spark.createDataFrame(
        [(1, "a" * 120), (2, "")], "doc_id long, text string"
    )
    rows = M.scene_cuts(M.attach_binary_payload(docs)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 2 not in by_doc
    ones = by_doc[1]
    assert len(ones) == 1 and ones[0]["scene_idx"] == 0
    assert ones[0]["n_frames"] == len(_frames_model("a" * 120))


def test_audio_windows_match_model(spark):
    """Sub-fingerprints equal the Python model, including the
    no-window case for payloads shorter than one window."""
    rng = random.Random(88)
    texts = [(1, "".join(chr(rng.randrange(32, 127)) for _ in range(90))),
             (2, "short"), (3, "")]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {}
    for r in M.audio_windows(M.attach_binary_payload(docs)).collect():
        got.setdefault(r["doc_id"], {})[r["t"]] = r["fp"]
    for doc_id, text in texts:
        model = dict(enumerate(_windows_model(text)))
        assert got.get(doc_id, {}) == model, doc_id


def test_audio_clip_alignment(spark):
    """The Shazam property: a clip missing the first 3 strides matches
    its original on exactly the t_offset = −3 diagonal, with one vote
    per clip window."""
    rng = random.Random(888)
    originals = [
        (i, "".join(chr(rng.randrange(33, 127)) for _ in range(200)))
        for i in range(1, 4)
    ]
    clip_at = 3 * M.AUDIO_STRIDE
    clips = [(i + 100, t[clip_at:]) for i, t in originals]
    docs = spark.createDataFrame(
        originals + clips, "doc_id long, text string"
    )
    rows = M.audio_offset_matches(
        M.attach_binary_payload(docs), min_votes=5, max_fp_freq=None
    ).collect()
    matches = {
        (r["doc_a"], r["doc_b"]): (r["t_offset"], r["votes"])
        for r in rows
    }
    for i, t in originals:
        off, votes = matches[(i, i + 100)]
        assert off == -3
        assert votes == len(_windows_model(t[clip_at:]))
    # random high-entropy originals don't cross-match
    assert all(b - a == 100 for a, b in matches)


def test_audio_freq_cap_drops_hot_fingerprints(spark):
    """Identical payloads everywhere = every fingerprint hot: the cap
    silences them all (digital-silence rule); uncapped they all match
    on the zero diagonal."""
    docs = spark.createDataFrame(
        [(i, "same audio payload bytes " * 4) for i in range(8)],
        "doc_id long, text string",
    )
    corpus = M.attach_binary_payload(docs)
    capped = M.audio_offset_matches(corpus, min_votes=5, max_fp_freq=4)
    assert capped.count() == 0
    uncapped = M.audio_offset_matches(
        corpus, min_votes=5, max_fp_freq=None
    ).collect()
    zero_diag = [r for r in uncapped if r["t_offset"] == 0]
    assert len(zero_diag) == 8 * 7 // 2
