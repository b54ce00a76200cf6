"""Checkpoint FILE-FORMAT conversion tests against committed .pth fixtures.

The in-memory torch-replica tests (test_convert_talkshow.py) prove tensor
layout conversion; these prove the ON-DISK format: torch.save/.load
round-trip, the Trainer-level {'generator', 'epoch', 'global_steps'}
nesting (trainer/Trainer.py:215-230), per-family wrapper layouts with
optimizer entries present (nets/base.py:29-36, smplx_body_vq.py:77-94),
and DataParallel 'module.' prefixes (smplx_body_pixel.py:104-126).
Fixtures are frozen binaries in tests/fixtures/golden/ (regenerate with
scripts/make_golden_fixtures.py); expected outputs were computed by the
torch replicas at fixture-creation time, so a key/nesting/layout misread
anywhere in the converter chain fails these without network access to the
released Google-Drive checkpoints.
"""
import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from talkshow_tpu.convert import talkshow as conv  # noqa: E402

HERE = os.path.join(os.path.dirname(__file__), "fixtures", "golden")


@pytest.fixture(scope="module")
def golden():
    if not os.path.isdir(HERE):
        pytest.skip("golden fixtures not generated")
    with open(os.path.join(HERE, "meta.json")) as f:
        meta = json.load(f)
    exp = dict(np.load(os.path.join(HERE, "expected.npz")))
    return meta, exp


def _load(name):
    return torch.load(os.path.join(HERE, name), map_location="cpu",
                      weights_only=False)


def test_body_vq_fixture(golden):
    from talkshow_tpu.models.vqvae import VQVAE

    meta, exp = golden
    ckpt = _load("body_vq.pth")
    assert ckpt["epoch"] == 99 and ckpt["global_steps"] == 12345
    # optimizer entries present and populated (real ckpts carry Adam state)
    assert len(ckpt["generator"]["g_body_optim"]["state"]) > 0
    out = conv.convert_body_vq_checkpoint(ckpt)
    hid = meta.get("vq_hid", 64)
    for part, cin in (("body", 39), ("hand", 90)):
        variables, state = out[part]
        model = VQVAE(in_dim=cin, num_hiddens=hid)
        x = jnp.asarray(exp[f"vq_in_{part}"].transpose(0, 2, 1))
        _, idx = model.apply(variables, x, state, method=VQVAE.encode)
        np.testing.assert_array_equal(np.asarray(idx), exp[f"vq_idx_{part}"])
        rec = model.apply(variables, idx, state, method=VQVAE.decode_latents)
        np.testing.assert_allclose(np.asarray(rec).transpose(0, 2, 1),
                                   exp[f"vq_rec_{part}"], atol=2e-4)


def test_body_pixel_fixture_strips_dataparallel_prefixes(golden):
    from talkshow_tpu.models.pixelcnn import GatedPixelCNN
    from talkshow_tpu.models.vqvae import AudioEncoder

    meta, exp = golden
    ckpt = _load("body_pixel.pth")
    # the fixture really is module.-prefixed (as saved under DataParallel)
    assert all(k.startswith("module.") for k in ckpt["generator"]["generator"])
    px = meta["pixel"]
    out = conv.convert_body_pixel_checkpoint(ckpt, n_layers=px["n_layers"])

    aenc = AudioEncoder(num_hiddens=px["aud_ch"])
    a = aenc.apply(out["audio"], jnp.asarray(exp["px_aud"].transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(a).transpose(0, 2, 1),
                               exp["px_audenc"], atol=2e-4)

    prior = GatedPixelCNN(input_dim=px["K"], dim=px["dim"],
                          n_layers=px["n_layers"], n_classes=4,
                          audio=True, bh_model=True,
                          audio_channels=px["aud_ch"])
    lg = prior.apply(out["prior"], jnp.asarray(exp["px_tokens"], jnp.int32),
                     jnp.asarray(exp["px_label"], jnp.int32),
                     jnp.asarray(exp["px_audenc"].transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(lg), exp["px_logits"], atol=3e-4)


def test_body_ae_fixture(golden):
    from talkshow_tpu.models.vqvae import AE

    meta, exp = golden
    ckpt = _load("body_ae.pth")
    variables = conv.convert_body_ae_checkpoint(ckpt)
    model = AE(in_dim=129, num_hiddens=meta.get("vq_hid", 64))
    x = jnp.asarray(exp["ae_in"].transpose(0, 2, 1))
    rec = model.apply(variables, x)
    np.testing.assert_allclose(np.asarray(rec).transpose(0, 2, 1),
                               exp["ae_rec"], atol=2e-4)
    feat = model.apply(variables, x, method=AE.encode)
    np.testing.assert_allclose(np.asarray(feat).transpose(0, 2, 1),
                               exp["ae_feat"], atol=2e-4)


@pytest.mark.slow
def test_face_fixture(golden):
    from transformers import Wav2Vec2Config as HFConfig

    from talkshow_tpu.convert.wav2vec import config_from_hf
    from talkshow_tpu.models.face import FaceGenerator

    meta, exp = golden
    ckpt = _load("face.pth")
    assert ckpt["generator"]["generator_optim"]["param_groups"]
    cfg = config_from_hf(HFConfig(**meta["hf_wav2vec"]))
    variables = conv.convert_face_checkpoint(ckpt, cfg)
    face = FaceGenerator(wav2vec_cfg=cfg)
    wav = jnp.asarray(exp["face_wav"])[None]
    frames = exp["face_out"].shape[1]
    out = face.apply(variables, wav, jnp.zeros((1, 4)), frames)
    np.testing.assert_allclose(np.asarray(out), exp["face_out"], atol=5e-4)
