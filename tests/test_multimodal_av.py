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


def _peaks_model(text: str) -> list[tuple[int, int]]:
    fps = _windows_model(text)
    out = []
    for i, fp in enumerate(fps):
        prev2 = fps[max(0, i - 2):i]
        next2 = fps[i + 1:i + 3]
        if (not prev2 or fp > max(prev2)) and (
            not next2 or fp >= max(next2)
        ):
            out.append((i, fp))
    return out


def _landmarks_model(
    text: str, fanout: int = 3, max_dt: int = 20
) -> list[tuple[int, int, int, int]]:
    pk = _peaks_model(text)
    out = []
    for a in range(len(pk)):
        for k in range(1, fanout + 1):
            if a + k < len(pk):
                (ta, fa), (tb, fb) = pk[a], pk[a + k]
                if tb - ta <= max_dt:
                    out.append((ta, fa, fb, tb - ta))
    return out


def test_audio_peaks_and_landmarks_match_model(spark):
    """Peak picking (local-max rule, earlier-window tie break) and
    fan-out landmark pairing equal the direct Python model, including
    flat runs (ties) and the no-peak short-payload case."""
    rng = random.Random(77)
    texts = [
        (1, "".join(chr(rng.randrange(32, 127)) for _ in range(250))),
        (2, "x" * 120),  # all-equal fps: exactly one peak (the first)
        (3, "short"),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    corpus = M.attach_binary_payload(docs)
    got_peaks = {}
    for r in M.audio_peaks(corpus).collect():
        got_peaks.setdefault(r["doc_id"], []).append((r["t"], r["fp"]))
    for doc_id, text in texts:
        assert sorted(got_peaks.get(doc_id, [])) == _peaks_model(text), doc_id
    flat_fps = _windows_model(texts[1][1])
    assert len(set(flat_fps)) == 1 and got_peaks[2] == [(0, flat_fps[0])]
    got_lm = {}
    for r in M.audio_landmarks(corpus).collect():
        got_lm.setdefault(r["doc_id"], []).append(
            (r["t"], r["fp_a"], r["fp_b"], r["dt"])
        )
    for doc_id, text in texts:
        assert sorted(got_lm.get(doc_id, [])) == sorted(
            _landmarks_model(text)
        ), doc_id


def test_audio_landmark_clip_recovery_and_tighter_index(spark):
    """Landmark matching recovers 3-stride clips on the t_offset = −3
    diagonal (same alignment property as the single-fp index), and the
    composite (fp_a, fp_b, Δt) key yields a strictly smaller candidate
    volume than the single-fingerprint inverted index on the same
    corpus — the reason its frequency cap can be 10× tighter."""
    rng = random.Random(7777)
    originals = [
        (i, "".join(chr(rng.randrange(33, 127)) for _ in range(300)))
        for i in range(1, 5)
    ]
    clip_at = 3 * M.AUDIO_STRIDE
    clips = [(i + 100, t[clip_at:]) for i, t in originals]
    docs = spark.createDataFrame(
        originals + clips, "doc_id long, text string"
    )
    corpus = M.attach_binary_payload(docs)
    matches = {
        (r["doc_a"], r["doc_b"]): (r["t_offset"], r["votes"])
        for r in M.audio_landmark_matches(
            corpus, min_votes=3, max_landmark_freq=None
        ).collect()
    }
    for i, t in originals:
        off, votes = matches[(i, i + 100)]
        assert off == -3
        assert votes >= 3
    assert all(b - a == 100 for a, b in matches)

    # candidate-volume bound: sum c*(c-1)/2 over index buckets
    from collections import Counter

    fp_counts = Counter(
        r["fp"] for r in M.audio_windows(corpus).collect()
    )
    lm_counts = Counter(
        (r["fp_a"], r["fp_b"], r["dt"])
        for r in M.audio_landmarks(corpus).collect()
    )
    vol = lambda c: sum(v * (v - 1) // 2 for v in c.values())  # noqa: E731
    assert vol(lm_counts) < vol(fp_counts)


def _scene_sigs_model(text: str) -> list[tuple[int, int, int, int, int]]:
    """(scene_idx, start_frame, n_frames, scene_sum, signature)."""
    cs = _frames_model(text)
    out = []
    for scene_idx, start, end, n in _scenes_model(text):
        vals = cs[start:end + 1]
        ssum = sum(vals)
        sig = sum(
            1 << i for i, v in enumerate(vals) if v * n > ssum
        )
        out.append((scene_idx, start, n, ssum, sig))
    return out


def test_scene_signatures_match_model(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").limit(80)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    got = {}
    for r in M.scene_signatures(M.attach_binary_payload(docs)).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["scene_idx"], r["start_frame"], r["n_frames"],
             r["scene_sum"], r["signature"])
        )
    for doc_id, text in texts.items():
        model = _scene_sigs_model(text or "")
        assert sorted(got.get(doc_id, [])) == model, doc_id


def _frames_to_text(frames: list[int], n: int = 59) -> str:
    """A 59-char payload gives n_frames=30, step=1: the first 30
    bytes ARE the frame stream — full control of the fake codec."""
    assert len(frames) <= 30 and n % 30 + 1 == 30
    pad = [35] * (30 - len(frames))  # '#' continues no-cut filler
    return "".join(map(chr, frames + pad)) + "q" * (n - 30)


def test_scene_signature_position_invariance_and_clip_match(spark):
    """The partial-copy property: a scene's signature depends only on
    its frame contents — two videos sharing scenes at DIFFERENT
    positions match on exactly those scenes."""
    x = [120, 119, 121, 120]   # scene X (internal diffs <= 64)
    y = [40, 41, 39, 40, 42]   # scene Y (boundary jump from X > 64)
    z = [110, 112, 111]        # scene Z (jump from Y > 64)
    w = [40, 42, 41, 40]       # scene W (jump into X's 120 is > 64)
    a = _frames_to_text(x + y + z + [35] * 0)
    # same scenes X and Y at different offsets, preceded by W; the
    # trailing filler '#'(35) cuts from Z/Y ends (|35-111|,|35-40|):
    # keep boundaries explicit instead
    b = _frames_to_text(w + x + y)
    docs = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"
    )
    corpus = M.attach_binary_payload(docs)
    sigs = {}
    for r in M.scene_signatures(corpus).collect():
        sigs.setdefault(r["doc_id"], set()).add(
            (r["signature"], r["n_frames"], r["scene_sum"])
        )
    shared = sigs[1] & sigs[2]
    x_key = next(
        k for k in sigs[1] if k[1] == len(x) and k[2] == sum(x)
    )
    assert x_key in shared  # scene X matches despite different offsets
    [m] = M.scene_copy_matches(corpus, min_shared=1).collect()
    assert (m["doc_a"], m["doc_b"]) == (1, 2)
    assert m["shared_scenes"] >= len(shared & {x_key}) >= 1


def test_scene_copy_matches_cap_and_floor(spark):
    """Hot signature buckets are dropped by the frequency cap, and
    sub-min_scene_frames scenes never enter the index."""
    shared_scene = [120, 119, 121, 120]
    docs = spark.createDataFrame(
        [(i, _frames_to_text(shared_scene)) for i in range(10)],
        "doc_id long, text string",
    )
    corpus = M.attach_binary_payload(docs)
    uncapped = M.scene_copy_matches(
        corpus, min_shared=1, max_sig_freq=None
    )
    assert uncapped.count() == 10 * 9 // 2
    capped = M.scene_copy_matches(corpus, min_shared=1, max_sig_freq=5)
    assert capped.count() == 0
    # single-frame scenes are floored out: videos sharing ONLY
    # 1-frame scenes don't match
    one_frame = spark.createDataFrame(
        [(1, _frames_to_text([120, 32, 120, 32])),
         (2, _frames_to_text([33, 121, 33, 121]))],
        "doc_id long, text string",
    )
    assert (
        M.scene_copy_matches(
            M.attach_binary_payload(one_frame),
            min_shared=1, max_sig_freq=None,
        ).count()
        == 0
    )
