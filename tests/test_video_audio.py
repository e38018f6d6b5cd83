"""Video frame-sampling + audio feature stages: real decodes, per-row
invariants, raw≡png frame parity."""

import numpy as np
import pyarrow as pa

from rust_geo_booleanop_ray.sources.images import _phash64
from rust_geo_booleanop_ray.sources.videos import (
    _video_pixels,
    synth_audio_batch,
    synth_video_batch,
)
from rust_geo_booleanop_ray.stages.video_ops import (
    AudioFeatures,
    FrameSample,
    decode_frames,
)


def test_video_payloads_decode_to_generator_frames():
    t = synth_video_batch(np.arange(16))
    fmts = t["fmt"].to_pylist()
    assert "pngv" in fmts and "rawv" in fmts  # both codec paths present
    for i in range(t.num_rows):
        w, h, nf = (t[c][i].as_py() for c in ("w", "h", "n_frames"))
        frames = decode_frames(t["bytes"][i].as_py(), w, h, nf, fmts[i])
        idx = int(t["video_id"][i].as_py()[4:])
        assert (frames == _video_pixels(idx, w, h, nf)).all()


def test_frame_sample_phash_invariant():
    t = synth_video_batch(np.arange(10))
    out = FrameSample(stride=2)(t)
    # one row per sampled frame
    expected_rows = sum(-(-t["n_frames"][i].as_py() // 2) for i in range(10))
    assert out.num_rows == expected_rows
    # spot-check: recomputed phash of the decoded frame matches
    for r in range(0, out.num_rows, 5):
        vid = out["video_id"][r].as_py()
        f = out["frame_idx"][r].as_py()
        i = int(vid[4:])
        row = next(j for j in range(10) if t["video_id"][j].as_py() == vid)
        w, h, nf = (t[c][row].as_py() for c in ("w", "h", "n_frames"))
        frames = decode_frames(t["bytes"][row].as_py(), w, h, nf, t["fmt"][row].as_py())
        assert out["frame_phash"][r].as_py() == int(_phash64(frames[f]))


def test_audio_features_integer_exact():
    t = synth_audio_batch(np.arange(8))
    out = AudioFeatures()(t)
    for i in range(8):
        pcm = np.frombuffer(t["bytes"][i].as_py(), dtype="<i2").astype(np.int64)
        assert out["peak"][i].as_py() == int(np.abs(pcm).max())
        assert out["abs_sum"][i].as_py() == int(np.abs(pcm).sum())
        s = np.sign(pcm)
        assert out["zero_crossings"][i].as_py() == int((s[1:] * s[:-1] < 0).sum())


def test_sources_deterministic():
    a = synth_video_batch(np.arange(6))
    b = synth_video_batch(np.arange(6))
    assert a.equals(b)
    x = synth_audio_batch(np.arange(6))
    y = synth_audio_batch(np.arange(6))
    assert x.equals(y)


def test_expected_values_oracles_match_stages_and_detect_corruption():
    """The expected-values oracle helpers (generator-side math, no
    codec) must equal the decode stages' output exactly — and the
    position-weighted checksum must be SENSITIVE: corrupting one
    payload byte or swapping two bytes (which a plain sum would miss)
    changes it, so the oracle is not a tautology."""
    from rust_geo_booleanop_ray.sources.images import (
        expected_decode_features,
        pix_checksum,
        synth_image_batch,
    )
    from rust_geo_booleanop_ray.sources.videos import (
        expected_audio_features,
        expected_frame_features,
    )
    from rust_geo_booleanop_ray.stages.image_ops import DecodeFeatures

    # image: stage (encode→decode path) == generator-side expectation
    t = synth_image_batch(np.arange(24))
    feats = DecodeFeatures()(t)
    exp = expected_decode_features(24)
    assert feats["image_id"].to_pylist() == exp["image_id"].to_pylist()
    assert feats["phash_decoded"].to_pylist() == exp["phash"].to_pylist()
    assert feats["pix_checksum"].to_pylist() == exp["pix_checksum"].to_pylist()

    # video: sampled-frame expectation == FrameSample output
    vt = synth_video_batch(np.arange(12))
    vout = FrameSample(stride=2)(vt)
    vexp = expected_frame_features(12, stride=2)
    for col in ("video_id", "frame_idx", "frame_phash", "frame_checksum"):
        assert vout[col].to_pylist() == vexp[col].to_pylist(), col

    # audio: expectation == AudioFeatures output
    at = synth_audio_batch(np.arange(9))
    aout = AudioFeatures()(at)
    aexp = expected_audio_features(9)
    for col in ("audio_id", "peak", "abs_sum", "zero_crossings"):
        assert aout[col].to_pylist() == aexp[col].to_pylist(), col

    # sensitivity: single-byte corruption changes the checksum
    px = np.frombuffer(t["bytes"][1].as_py(), dtype=np.uint8).copy()
    clean = pix_checksum(px.reshape(-1, 1, 1))
    px[7] ^= 0xFF
    assert pix_checksum(px.reshape(-1, 1, 1)) != clean
    # sensitivity: swapping two unequal bytes (plain sum is blind to it)
    px = np.frombuffer(t["bytes"][1].as_py(), dtype=np.uint8).copy()
    i, j = 3, 11
    assert px[i] != px[j]
    px[i], px[j] = px[j], px[i]
    assert pix_checksum(px.reshape(-1, 1, 1)) != clean


def test_scene_stats_matches_generator():
    from rust_geo_booleanop_ray.sources.videos import (
        expected_scene_stats,
        synth_video_batch,
    )
    from rust_geo_booleanop_ray.stages.video_ops import SceneStats

    import numpy as np

    t = synth_video_batch(np.arange(30))
    out = SceneStats()(t)
    want = expected_scene_stats(30)
    got = sorted(zip(*(out[c].to_pylist() for c in out.column_names)))
    exp = sorted(zip(*(want[c].to_pylist() for c in want.column_names)))
    assert got == exp
