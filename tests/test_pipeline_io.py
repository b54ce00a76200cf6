"""Pipeline save/load, normalization stats, full-size wav2vec conversion,
renderer with a synthetic SMPL-X npz, long-audio generation."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from talkshow_tpu.data.dataset import (compute_norm_stats, denormalize_poses,
                                       normalize_poses, synthetic_dataset)
from talkshow_tpu.models.wav2vec import Wav2Vec2Config
from talkshow_tpu.pipeline import Pipeline, load_pipeline, save_pipeline

TINY_W2V = Wav2Vec2Config(hidden_size=32, num_layers=1, num_heads=4,
                          intermediate_size=64, conv_dim=(16, 16),
                          conv_kernel=(10, 3), conv_stride=(5, 2),
                          num_conv_pos_embeddings=16,
                          num_conv_pos_embedding_groups=4)


def _tiny_pipe(seed=0):
    return Pipeline.create(seed, wav2vec_cfg=TINY_W2V, num_hiddens=64,
                           pixel_dim=16, pixel_layers=3, code_num=64)


def test_pipeline_save_load_roundtrip(tmp_path):
    pipe = _tiny_pipe(3)
    path = str(tmp_path / "pipe")
    save_pipeline(pipe, path)
    pipe2 = load_pipeline(path, template=_tiny_pipe(9))  # different init
    a = jax.tree_util.tree_leaves(pipe.face_vars)[0]
    b = jax.tree_util.tree_leaves(pipe2.face_vars)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(pipe.body.vq_body_state.embeddings),
        np.asarray(pipe2.body.vq_body_state.embeddings))
    # loaded pipeline generates
    feat = np.zeros((16, 64), np.float32)
    out = pipe2.generate_body(feat, 0, num_samples=1)
    assert out.shape == (1, 16, 129)


def test_norm_stats_roundtrip():
    ds = synthetic_dataset(num_clips=3, frames=50)
    stats = compute_norm_stats(ds)
    assert stats[0].shape == (165,) and (stats[1] > 0).all()
    x = ds.clips[0].poses
    n = normalize_poses(x, stats)
    assert abs(n.mean()) < 1.0
    back = denormalize_poses(n, stats)
    np.testing.assert_allclose(back, x, atol=1e-4)


@pytest.mark.slow
def test_wav2vec_full_size_conversion_parity():
    """Conversion parity at the real base-960h scale (12 layers, 768 wide)."""
    import torch
    transformers = pytest.importorskip("transformers")
    from transformers import Wav2Vec2Config as HFConfig, Wav2Vec2Model

    from talkshow_tpu.convert.wav2vec import config_from_hf, convert_wav2vec2
    from talkshow_tpu.models.wav2vec import Wav2Vec2Encoder

    hf_cfg = HFConfig(apply_spec_augment=False)  # defaults == base-960h arch
    torch.manual_seed(0)
    hf = Wav2Vec2Model(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg)
    model = Wav2Vec2Encoder(cfg)
    params = convert_wav2vec2(hf.state_dict(), cfg)
    x = torch.randn(1, 16000)
    with torch.no_grad():
        nat = hf.feature_extractor(x).shape[-1]
        ref = hf(x).last_hidden_state.numpy()
    ours = model.apply({"params": params}, jnp.asarray(x.numpy()), nat)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-3)


def test_renderer_with_synthetic_model(tmp_path):
    """Full renderer path using a synthetic SMPL-X npz."""
    rng = np.random.default_rng(0)
    V, J = 120, 55
    npz = str(tmp_path / "model.npz")
    kintree = np.stack([np.concatenate([[0], np.arange(J - 1)]),
                        np.arange(J)])
    faces = rng.integers(0, V, (200, 3)).astype(np.int32)
    np.savez(
        npz,
        v_template=rng.standard_normal((V, 3)).astype(np.float32) * 0.1,
        shapedirs=rng.standard_normal((V, 3, 400)).astype(np.float32) * 0.01,
        posedirs=rng.standard_normal((V, 3, (J - 1) * 9)).astype(np.float32) * 0.001,
        J_regressor=np.abs(rng.standard_normal((J, V)).astype(np.float32)) / V,
        kintree_table=kintree,
        weights=np.abs(rng.standard_normal((V, J)).astype(np.float32)),
        hands_meanl=np.zeros(45, np.float32),
        hands_meanr=np.zeros(45, np.float32),
        f=faces,
    )
    import wave
    wavp = str(tmp_path / "a.wav")
    with wave.open(wavp, "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
        w.writeframes(np.zeros(16000, "<i2").tobytes())

    from talkshow_tpu.render import render_motion_video
    motion = rng.standard_normal((2, 6, 265)).astype(np.float32) * 0.1
    out = str(tmp_path / "video.mp4")
    render_motion_video(motion, wavp, out, smplx_npz=npz, fps=30)
    assert os.path.isfile(out) and os.path.getsize(out) > 0


def test_long_audio_generation(tmp_path):
    """60 s of audio through the tiny pipeline (H=450 decode rows)."""
    pipe = _tiny_pipe()
    feat = np.random.default_rng(0).standard_normal((1800, 64)).astype(np.float32)
    out = pipe.generate_body(feat, 0, num_samples=1)
    assert out.shape == (1, 1800, 129)
    assert np.all(np.isfinite(np.asarray(out)))


def test_bucketed_generation_reuses_compilation():
    pipe = _tiny_pipe()
    rng = np.random.default_rng(1)
    # different lengths land in the same bucket -> same compiled shape
    out1 = pipe.generate_body(rng.standard_normal((50, 64)).astype(np.float32),
                              0, pad_to_bucket=32)
    out2 = pipe.generate_body(rng.standard_normal((61, 64)).astype(np.float32),
                              0, pad_to_bucket=32)
    assert out1.shape == (1, 48, 129)
    assert out2.shape == (1, 60, 129)
    # causality of padding: unpadded prefix identical for same input/seed
    x = rng.standard_normal((64, 64)).astype(np.float32)
    a = np.asarray(pipe.generate_body(x, 0, seed=7))
    b = np.asarray(pipe.generate_body(np.pad(x, [[0, 64], [0, 0]]), 0, seed=7))
    # token sampling for the first 16 rows consumes the same rng stream?
    # rng is split per-row over H which differs -> sequences diverge; only
    # check shapes and finiteness here.
    assert np.isfinite(a).all() and np.isfinite(b).all()
