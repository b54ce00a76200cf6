#!/usr/bin/env python
"""Regenerate the golden checkpoint-format fixtures in tests/fixtures/golden/.

Freezes the reference's ON-DISK checkpoint format (VERDICT r3 next #2):
small torch replicas are saved with torch.save in the EXACT nesting the
reference trainer writes — {'generator': TrainWrapper.state_dict(),
'epoch', 'global_steps'} (trainer/Trainer.py:215-230) with per-family
wrapper layouts (nets/base.py:29-36, nets/smplx_body_vq.py:77-94,
nets/smplx_body_pixel.py:104-126 incl. DataParallel 'module.' prefixes)
and REAL optimizer entries (one training step populates Adam/SGD state) —
together with the torch replicas' forward outputs on fixed inputs.

tests/test_golden_ckpt_fixtures.py loads these .pth files from disk,
converts them through the top-level converter entry points, and checks
output parity: any key/nesting/layout misread of the reference file format
fails the suite without needing network access to released checkpoints.

Deterministic (seeded); rerun after intentional replica changes:
    python scripts/make_golden_fixtures.py
"""
from __future__ import annotations

import json
import os
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

OUT = os.path.join(REPO, "tests", "fixtures", "golden")

HF_KW = dict(
    hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
    intermediate_size=64, conv_dim=[16, 16, 16],
    conv_kernel=[10, 3, 2], conv_stride=[5, 2, 2],
    num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
    do_stable_layer_norm=False, feat_extract_norm="group",
    conv_bias=False, apply_spec_augment=False)

K, DIM, L, AUD_CH = 64, 16, 3, 64


def _module_prefix(sd):
    """DataParallel wrapping as saved by nets/smplx_body_pixel.py:64-69."""
    return {("module." + k): v for k, v in sd.items()}


def _stepped_adam(model, loss):
    import torch.optim as optim
    opt = optim.Adam(model.parameters(), lr=1e-4, betas=[0.9, 0.999])
    loss.backward()
    opt.step()
    return opt


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")   # replicas are torch; keep
    # the (possibly busy) TPU untouched when test_convert_talkshow imports

    import numpy as np
    import torch

    import test_convert_talkshow as R

    os.makedirs(OUT, exist_ok=True)
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    expected = {}

    # ---- body-vq family (nets/smplx_body_vq.py:77-94 composition) -------
    t_vq_b = R.TVQVAE(cin=39, embed=64, K=K, hid=64)
    t_vq_h = R.TVQVAE(cin=90, embed=64, K=K, hid=64)
    R._randomize_bn(t_vq_b), R._randomize_bn(t_vq_h)
    x_b = torch.from_numpy(rng.standard_normal((2, 39, 24)).astype("f4"))
    x_h = torch.from_numpy(rng.standard_normal((2, 90, 24)).astype("f4"))
    opt_b = _stepped_adam(t_vq_b, t_vq_b.decoder(t_vq_b.encoder(x_b)).abs().mean())
    opt_h = _stepped_adam(t_vq_h, t_vq_h.decoder(t_vq_h.encoder(x_h)).abs().mean())
    for m in (t_vq_b, t_vq_h):
        m.eval()

    def torch_vq_roundtrip(tvq, x):
        with torch.no_grad():
            z = tvq.encoder(x)
            flat = z.permute(0, 2, 1).reshape(-1, z.shape[1])
            emb = tvq.vq_layer.embeddings
            d = ((flat ** 2).sum(1, keepdim=True) - 2 * flat @ emb.T
                 + (emb ** 2).sum(1)[None])
            idx = d.argmin(1)
            e = emb[idx].reshape(z.shape[0], -1, z.shape[1]).permute(0, 2, 1)
            rec = tvq.decoder(e)
        return idx.numpy().reshape(z.shape[0], -1), rec.numpy()

    torch.save({
        "generator": {
            "g_body": t_vq_b.state_dict(), "g_body_optim": opt_b.state_dict(),
            "g_hand": t_vq_h.state_dict(), "g_hand_optim": opt_h.state_dict(),
            "discriminator": None, "discriminator_optim": None,
        },
        "epoch": 99, "global_steps": 12345,
    }, os.path.join(OUT, "body_vq.pth"))
    bi, br = torch_vq_roundtrip(t_vq_b, x_b)
    hi, hr = torch_vq_roundtrip(t_vq_h, x_h)
    expected.update(vq_in_body=x_b.numpy(), vq_in_hand=x_h.numpy(),
                    vq_idx_body=bi, vq_rec_body=br,
                    vq_idx_hand=hi, vq_rec_hand=hr)

    # ---- body-pixel family (DataParallel 'module.' prefixes) ------------
    t_prior = R.TPixelCNN(K, DIM, L, 4, AUD_CH)
    t_aud = R.TAudioEnc(cin=64, hid=AUD_CH)
    R._randomize_bn(t_aud)
    tokens = rng.integers(0, K, (2, 6, 2))
    aud_feat = rng.standard_normal((2, 64, 24)).astype("f4")
    label = np.asarray([1, 3])
    with torch.no_grad():   # bake the in-place mask-A zeroing into the sd
        t_prior(torch.zeros(1, 4, 2, dtype=torch.long),
                torch.zeros(1, dtype=torch.long),
                torch.zeros(1, AUD_CH, 4, 2))
    aud_t = torch.from_numpy(aud_feat)
    lg = t_prior(torch.from_numpy(tokens), torch.from_numpy(label),
                 t_aud(aud_t)[:, :, :, None].repeat(1, 1, 1, 2))
    opt_p = _stepped_adam(t_prior, lg.square().mean())
    opt_a = _stepped_adam(t_aud, t_aud(aud_t).abs().mean())
    t_prior.eval(), t_aud.eval()
    with torch.no_grad():
        aud_enc_out = t_aud(aud_t)                         # (2, AUD_CH, 6)
        logits = t_prior(torch.from_numpy(tokens), torch.from_numpy(label),
                         aud_enc_out[:, :, :, None].repeat(1, 1, 1, 2))
    torch.save({
        "generator": {
            "generator": _module_prefix(t_prior.state_dict()),
            "generator_optim": opt_p.state_dict(),
            "audioencoder": _module_prefix(t_aud.state_dict()),
            "audioencoder_optim": opt_a.state_dict(),
            "discriminator": None, "discriminator_optim": None,
        },
        "epoch": 99, "global_steps": 54321,
    }, os.path.join(OUT, "body_pixel.pth"))
    expected.update(px_tokens=tokens, px_label=label, px_aud=aud_feat,
                    px_audenc=aud_enc_out.numpy(),
                    px_logits=logits.permute(0, 2, 3, 1).numpy())

    # ---- body-ae family (nets/smplx_body_vq.py:88-94 'g' branch) --------
    t_ae = R.TBodyAE(cin=129, embed=64, hid=64)
    R._randomize_bn(t_ae)
    x_ae = torch.from_numpy(rng.standard_normal((2, 129, 24)).astype("f4"))
    opt_ae = _stepped_adam(t_ae, t_ae(x_ae).abs().mean())
    t_ae.eval()
    with torch.no_grad():
        rec = t_ae(x_ae).numpy()
        feat = t_ae.encoder(x_ae).numpy()
    torch.save({
        "generator": {"g": t_ae.state_dict(), "g_optim": opt_ae.state_dict(),
                      "discriminator": None, "discriminator_optim": None},
        "epoch": 99, "global_steps": 777,
    }, os.path.join(OUT, "body_ae.pth"))
    expected.update(ae_in=x_ae.numpy(), ae_rec=rec, ae_feat=feat)

    # ---- face family (base-class layout, nets/base.py:29-36) ------------
    from transformers import Wav2Vec2Config as HFConfig
    from transformers import Wav2Vec2Model as HFModel
    import torch.optim as optim

    hf_cfg = HFConfig(**HF_KW)
    t_face = R.TFaceGenerator(HFModel(hf_cfg), hf_cfg.hidden_size)
    wav = (rng.standard_normal(16000) * 0.1).astype("f4")
    frames = len(wav) * 30 // 16000
    out = t_face(torch.from_numpy(wav)[None], torch.zeros(1, 4), frames)
    opt_f = optim.SGD(t_face.parameters(), lr=1e-3, momentum=0.9)
    out.square().mean().backward()
    opt_f.step()
    t_face.eval()
    with torch.no_grad():
        face_out = t_face(torch.from_numpy(wav)[None], torch.zeros(1, 4),
                          frames).numpy()
    torch.save({
        "generator": {
            "generator": t_face.state_dict(),
            "generator_optim": opt_f.state_dict(),
            "discriminator": None, "discriminator_optim": None,
        },
        "epoch": 99, "global_steps": 2468,
    }, os.path.join(OUT, "face.pth"))
    expected.update(face_wav=wav, face_out=face_out)

    np.savez_compressed(os.path.join(OUT, "expected.npz"), **expected)
    with open(os.path.join(OUT, "meta.json"), "w") as f:
        json.dump({"hf_wav2vec": HF_KW,
                   "pixel": {"K": K, "dim": DIM, "n_layers": L,
                             "aud_ch": AUD_CH}, "vq_hid": 64}, f, indent=1)
    sizes = {f: os.path.getsize(os.path.join(OUT, f)) // 1024
             for f in sorted(os.listdir(OUT))}
    print("wrote", OUT, json.dumps(sizes))


if __name__ == "__main__":
    main()
