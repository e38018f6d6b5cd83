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
