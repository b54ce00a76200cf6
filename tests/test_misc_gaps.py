"""Coverage for previously-untested small surfaces: the MeshTalk audio
frontend (s2g_face.py:41-104), masked_linear_interpolate,
split_jaw_body_exp, and Pipeline.from_torch_checkpoints routing."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from talkshow_tpu.models.layers import (linear_interpolate,
                                        masked_linear_interpolate)
from talkshow_tpu.ops.pose import split_jaw_body_exp


def test_masked_interp_matches_unmasked_per_example(rng):
    B, T_pad, C, out_len = 3, 20, 5, 16
    in_valid = np.asarray([20, 13, 7])
    out_valid = np.asarray([16, 10, 5])
    x = rng.standard_normal((B, T_pad, C)).astype(np.float32)
    x_masked = x.copy()
    for b in range(B):  # garbage in the padded tail must not matter
        x_masked[b, in_valid[b]:] = 1e6
    got = masked_linear_interpolate(jnp.asarray(x_masked), out_len,
                                    in_valid, out_valid)
    assert got.shape == (B, out_len, C)
    for b in range(B):
        want = linear_interpolate(
            jnp.asarray(x[b:b + 1, :in_valid[b]]), int(out_valid[b]))
        np.testing.assert_allclose(np.asarray(got[b, :out_valid[b]]),
                                   np.asarray(want[0]), rtol=1e-5, atol=1e-5)


def test_masked_interp_full_lengths_equal_plain(rng):
    x = rng.standard_normal((2, 12, 4)).astype(np.float32)
    got = masked_linear_interpolate(jnp.asarray(x), 30, [12, 12], [30, 30])
    want = linear_interpolate(jnp.asarray(x), 30)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_split_jaw_body_exp(rng):
    f = rng.standard_normal((7, 103)).astype(np.float32)
    jaw, exp = split_jaw_body_exp(jnp.asarray(f))
    assert jaw.shape == (7, 3) and exp.shape == (7, 100)
    np.testing.assert_array_equal(np.asarray(jaw), f[:, :3])
    np.testing.assert_array_equal(np.asarray(exp), f[:, 3:])


def test_meshtalk_encoder_shapes(rng):
    from talkshow_tpu.models.face import MeshtalkEncoder

    enc = MeshtalkEncoder(latent_dim=32)
    chunks = jnp.asarray(rng.standard_normal((1, 2, 16000)).astype(np.float32)
                         * 0.1)
    v = enc.init(jax.random.PRNGKey(0), chunks)
    out = enc.apply(v, chunks)
    assert out.shape == (1, 2, 32)
    assert np.isfinite(np.asarray(out)).all()
    # per-frame encoder: each frame's code depends only on its own chunk
    chunks2 = chunks.at[0, 1].set(chunks[0, 1] * 2.0 + 0.01)
    out2 = enc.apply(v, chunks2)
    np.testing.assert_allclose(np.asarray(out2[0, 0]), np.asarray(out[0, 0]),
                               rtol=1e-5, atol=1e-6)
    assert np.abs(np.asarray(out2[0, 1]) - np.asarray(out[0, 1])).max() > 1e-4


def test_face_generator_meshtalk_forward(rng):
    from talkshow_tpu.models.face import FaceGeneratorMeshtalk

    gen = FaceGeneratorMeshtalk()
    chunks = jnp.asarray(rng.standard_normal((1, 2, 16000)).astype(np.float32)
                         * 0.1)
    onehot = jnp.zeros((1, 4)).at[0, 1].set(1.0)
    v = gen.init(jax.random.PRNGKey(0), chunks, onehot)
    out = gen.apply(v, chunks, onehot)
    assert out.shape == (1, 2, 103)  # jaw 3 + expression 100
    assert np.isfinite(np.asarray(out)).all()


def test_from_torch_checkpoints_routing(tmp_path, monkeypatch):
    """Lock the ckpt-routing contract: face goes through the face
    converter; VQ weights come from vq_ckpt when given, else are looked up
    inside body_ckpt (smplx_body_pixel.py:59-62 loads them frozen there);
    prior+audio always come from body_ckpt."""
    from talkshow_tpu import pipeline as P
    from talkshow_tpu.convert import talkshow as tsconv

    calls = []

    class TinyPipe:
        pass

    def fake_create(cls, rng, **kw):
        pipe = P.Pipeline.__new__(P.Pipeline)
        body = type("B", (), {})()

        def _replace(**kw2):
            calls.append(("replace", sorted(kw2)))
            return body
        body._replace = _replace
        object.__setattr__(pipe, "face_model", "FM")
        object.__setattr__(pipe, "face_vars", "FV")
        object.__setattr__(pipe, "body", body)
        return pipe

    monkeypatch.setattr(P.Pipeline, "create", classmethod(fake_create))
    monkeypatch.setattr(tsconv, "convert_face_checkpoint",
                        lambda ckpt, *a, **k: calls.append(("face",)) or "FP")
    monkeypatch.setattr(
        tsconv, "convert_body_vq_checkpoint",
        lambda ckpt, *a, **k: calls.append(("vq",)) or
        {"body": ("vb", "sb"), "hand": ("vh", "sh")})
    monkeypatch.setattr(
        tsconv, "convert_body_pixel_checkpoint",
        lambda ckpt, *a, **k: calls.append(("pixel",)) or
        {"prior": "PR", "audio": "AU"})
    # the final Pipeline(...) constructor call must accept our stubs
    monkeypatch.setattr(
        P, "Pipeline", type("PipelineStub", (P.Pipeline,), {}))
    monkeypatch.setattr(P.Pipeline, "create", classmethod(fake_create))

    vqp = tmp_path / "vq.pth"
    bp = tmp_path / "body.pth"
    fp = tmp_path / "face.pth"
    torch.save({"generator": {"g_body": {"x": torch.zeros(1)}}}, vqp)
    torch.save({"generator": {"g_body": {"x": torch.zeros(1)},
                              "generator": {}}}, bp)
    torch.save({"generator": {}}, fp)

    calls.clear()
    P.Pipeline.from_torch_checkpoints(face_ckpt=str(fp), body_ckpt=str(bp),
                                      vq_ckpt=str(vqp))
    tags = [c[0] for c in calls]
    assert tags.count("face") == 1
    assert tags.count("vq") == 1       # from vq_ckpt
    assert tags.count("pixel") == 1    # from body_ckpt

    calls.clear()
    P.Pipeline.from_torch_checkpoints(body_ckpt=str(bp))  # no vq_ckpt
    tags = [c[0] for c in calls]
    assert tags.count("vq") == 1       # VQ weights found inside body_ckpt
    assert tags.count("pixel") == 1
    assert tags.count("face") == 0


def test_wav2vec_vq_encoder_forward(rng):
    """Surface-parity wav2vec-fronted VQ encoder (vqvae_1d.py:37-63):
    waveform -> (B, frames/4, num_hiddens) at the VQ token rate."""
    from talkshow_tpu.models.vqvae import Wav2VecVQEncoder
    from talkshow_tpu.models.wav2vec import Wav2Vec2Config

    tiny = Wav2Vec2Config(hidden_size=32, num_layers=2, num_heads=4,
                          intermediate_size=64, conv_dim=(16,) * 7,
                          num_conv_pos_embeddings=16,
                          num_conv_pos_embedding_groups=4)
    enc = Wav2VecVQEncoder(num_hiddens=32, wav2vec_cfg=tiny)
    wav = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32))
    v = enc.init(jax.random.PRNGKey(0), wav, 28)
    out = enc.apply(v, wav, 28)
    assert out.shape == (2, 7, 32)  # two stride-2 downsamples: 28 -> 7
    assert np.isfinite(np.asarray(out)).all()
