"""End-to-end pipeline smoke on tiny models + real demo wav (if present)."""
import os

import numpy as np
import jax
import pytest

from talkshow_tpu.models.wav2vec import Wav2Vec2Config
from talkshow_tpu.pipeline import Pipeline

TINY_W2V = Wav2Vec2Config(hidden_size=32, num_layers=1, num_heads=4,
                          intermediate_size=64, conv_dim=(16, 16),
                          conv_kernel=(10, 3), conv_stride=(5, 2),
                          num_conv_pos_embeddings=16,
                          num_conv_pos_embedding_groups=4)


@pytest.fixture(scope="module")
def pipe():
    return Pipeline.create(0, wav2vec_cfg=TINY_W2V, num_hiddens=64,
                           pixel_dim=16, pixel_layers=3, code_num=64)


def _write_wav(path, seconds=1.0, sr=16000):
    import wave
    t = np.arange(int(sr * seconds)) / sr
    x = (0.5 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    with wave.open(path, "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(sr)
        w.writeframes((x * 30000).astype("<i2").tobytes())
    return path


def test_generate_full(tmp_path, pipe):
    wav = _write_wav(str(tmp_path / "a.wav"), seconds=1.0)
    out = pipe.generate(wav, speaker="oliver", num_samples=2, seed=1)
    assert out.shape[0] == 2
    assert out.shape[2] == 265
    assert out.shape[1] == 30  # 1 s @ 30 fps
    assert np.all(np.isfinite(out))
    # lower body is the canned pose
    from talkshow_tpu.ops.pose import LOWER_POSE
    np.testing.assert_allclose(out[0, :, 3:18],
                               np.broadcast_to(LOWER_POSE[:15], (30, 15)),
                               atol=1e-5)
    # diversity: two samples differ
    assert np.abs(out[0] - out[1]).max() > 1e-4


def test_generate_face_only(tmp_path, pipe):
    wav = _write_wav(str(tmp_path / "b.wav"), seconds=0.5)
    out = pipe.generate(wav, num_samples=1, only_face=True)
    assert out.shape[2] == 265
    assert np.all(np.isfinite(out))


@pytest.mark.skipif(
    not os.path.isfile("/root/reference/demo_audio/1st-page.wav"),
    reason="demo audio not present")
def test_generate_demo_audio(pipe):
    out = pipe.generate("/root/reference/demo_audio/1st-page.wav",
                        speaker="conan", num_samples=1)
    # 205056 samples -> 384 frames
    assert out.shape[1] == 384
    assert np.all(np.isfinite(out))


def test_norm_stats_denormalize_hook(pipe):
    """normalize->train->generate->denormalize round-trip scale proof: a
    pipeline with norm stats attached returns exactly
    raw_output * std[c_index] + mean[c_index] (demo.py:107-111 parity)."""
    from talkshow_tpu.ops.pose import C_INDEX_3D

    rng = np.random.default_rng(5)
    mfcc = rng.standard_normal((16, 64)).astype(np.float32)
    raw = np.asarray(pipe.generate_body(mfcc, speaker=1, seed=3))

    mean = rng.standard_normal(165).astype(np.float32)
    std = rng.uniform(0.5, 2.0, 165).astype(np.float32)
    pipe_n = pipe.with_norm_stats((mean, std))
    out = np.asarray(pipe_n.generate_body(mfcc, speaker=1, seed=3))
    np.testing.assert_allclose(out, raw * std[C_INDEX_3D] + mean[C_INDEX_3D],
                               rtol=1e-5, atol=1e-5)

    # loading from an .npy path matches the tuple form
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "norm_stats.npy")
        np.save(path, np.stack([mean, std]))
        out2 = np.asarray(pipe.with_norm_stats(path).generate_body(
            mfcc, speaker=1, seed=3))
    np.testing.assert_allclose(out2, out, atol=1e-6)


def test_generate_body_sharded_matches_unsharded_semantics(pipe):
    """Sample-parallel serving: shard num_samples over the dp mesh axis.
    Each shard samples independently (no collectives); results must be
    deterministic per seed, diverse across shards, and actually sharded."""
    from talkshow_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(dp=4, tp=2)
    feat = np.random.default_rng(0).standard_normal((24, 64)).astype(np.float32)
    out = pipe.generate_body_sharded(feat, speaker=1, num_samples=8,
                                     mesh=mesh, seed=3)
    assert out.shape == (8, 24, 129)
    assert np.all(np.isfinite(out))
    # deterministic given the seed
    out2 = pipe.generate_body_sharded(feat, speaker=1, num_samples=8,
                                      mesh=mesh, seed=3)
    np.testing.assert_array_equal(out, out2)
    # diverse across samples (distinct PRNG keys per sample shard)
    assert np.abs(out[0] - out[4]).max() > 1e-6

    with pytest.raises(ValueError):
        pipe.generate_body_sharded(feat, speaker=1, num_samples=6, mesh=mesh)


def test_continuity_featurizes_at_22khz(tmp_path, pipe):
    """Regression for the round-2 continuity bug: generate_body_continuity
    must featurize at 22 kHz like infer_on_audio (smplx_body_pixel.py:232,
    sr=22000 default) — the fps=30 MFCC hop of 734 is tuned for 22 kHz.
    At 16 kHz a 3 s wav yields ~65 feature frames consumed as 30 fps
    (~27% slow motion); at 22 kHz both paths agree on ~90."""
    from talkshow_tpu.ops import audio as audio_ops

    wav = _write_wav(str(tmp_path / "cont.wav"), seconds=3.0)
    feat = audio_ops.get_mfcc(wav, sr=22000, fps=30)
    plain = pipe.generate_body(feat, speaker=0, num_samples=1, seed=0)
    cont = pipe.generate_body_continuity(wav, speaker=0, num_samples=1,
                                         seed=0)
    # same motion length as the non-continuity path on the same audio
    assert cont.shape == plain.shape
    assert cont.shape[1] == 88      # 4 * (90 // 4) conv frames
    assert np.all(np.isfinite(cont))


def test_continuity_gap_is_two_seconds(tmp_path):
    """get_mfcc_sepa splits at exactly 2 s: the first chunk is 60 feature
    frames at 30 fps (data_utils/utils.py:234-263 semantics)."""
    from talkshow_tpu.ops import audio as audio_ops

    wav = _write_wav(str(tmp_path / "sepa.wav"), seconds=3.0)
    feat, gap = audio_ops.get_mfcc_sepa(wav, sr=22000, fps=30)
    assert gap == 60                # 2 s @ 30 fps
    assert feat.shape == (90, 64)   # 60 + 30


def test_continuity_full_generate_and_prefix_carry(tmp_path, pipe):
    """generate(continuity=True) end-to-end: output matches the plain
    path's shape, and the first chunk's motion is identical between a
    plain decode of the first segment and the continuity run (the prefix
    is teacher-forced, so the first gap rows' tokens are shared)."""
    wav = _write_wav(str(tmp_path / "cfull.wav"), seconds=3.0)
    plain = pipe.generate(wav, speaker=1, num_samples=1, seed=2)
    cont = pipe.generate(wav, speaker=1, num_samples=1, seed=2,
                         continuity=True)
    assert cont.shape == plain.shape
    assert np.all(np.isfinite(cont))


def test_decode_tables_none_for_unsupported_prior(monkeypatch, pipe):
    """On a TPU backend, a prior the fused kernel can't lay out (dim 16 is
    not a LANE multiple) must yield _decode_tables=None — the generation
    path then falls back to the XLA sampler — rather than crash in
    pack_decode_tables (which raises for unsupported shapes)."""
    import talkshow_tpu.pipeline as pipeline_mod

    fresh = Pipeline(pipe.face_model, pipe.face_vars, pipe.body)
    monkeypatch.setattr(pipeline_mod.jax, "default_backend", lambda: "tpu")
    assert fresh._decode_tables is None
