"""Loss-library parity vs inline torch replicas of losses/losses.py.

Each replica is re-derived from the reference formulas (KeypointLoss
:15-20, KLLoss :23-42, L2RegLoss :63-69, AudioLoss :80-88) — the
reference repo itself is never imported.
"""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

import talkshow_tpu.losses as L


def test_keypoint_loss_plain_matches_mse(rng):
    p = rng.standard_normal((4, 13, 9)).astype(np.float32)
    g = rng.standard_normal((4, 13, 9)).astype(np.float32)
    ours = float(L.keypoint_loss(jnp.asarray(p), jnp.asarray(g)))
    ref = float(F.mse_loss(torch.from_numpy(p), torch.from_numpy(g)))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_keypoint_loss_conf_selects_not_weights(rng):
    # reference: pred[conf >= 0.01] boolean indexing, then mean over the
    # SELECTED elements — not a confidence-weighted mean over all
    p = rng.standard_normal((4, 13, 9)).astype(np.float32)
    g = rng.standard_normal((4, 13, 9)).astype(np.float32)
    conf = rng.uniform(0.0, 1.0, (4, 13, 9)).astype(np.float32)
    conf[conf < 0.5] = 0.0  # make a real subset fall below the 0.01 gate
    ours = float(L.keypoint_loss(jnp.asarray(p), jnp.asarray(g),
                                 jnp.asarray(conf)))
    tp, tg, tc = map(torch.from_numpy, (p, g, conf))
    mask = tc >= 0.01
    ref = float(F.mse_loss(tp[mask], tg[mask], reduction="mean"))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)
    # and it must differ from the weighted-mean formulation on this data
    weighted = float(np.mean((p - g) ** 2 * (conf >= 0.01)))
    assert abs(ours - weighted) > 1e-4


def test_kl_loss_matches_reference_formula(rng):
    mu = rng.standard_normal((6, 32)).astype(np.float32)
    lv = rng.standard_normal((6, 32)).astype(np.float32) * 0.3
    for tol, mul in ((None, 1.0), (0.02, 1.0), (0.02, 3.0), (5.0, 1.0)):
        ours = float(L.kl_loss(jnp.asarray(mu), jnp.asarray(lv),
                               tolerance=tol, mul=mul))
        tmu, tlv = torch.from_numpy(mu), torch.from_numpy(lv)
        kld = -0.5 * torch.sum(1 + tlv - tmu ** 2 - tlv.exp(), dim=1)
        if tol is not None:
            floor = tol * mul * lv.shape[1] / 64.0
            kld = torch.where(kld > floor, kld, torch.tensor(floor))
        ref = float(kld.mean())
        np.testing.assert_allclose(ours, ref, rtol=1e-5,
                                   err_msg=f"tol={tol} mul={mul}")


def test_kl_loss_zero_at_standard_normal():
    z = jnp.zeros((3, 16))
    assert abs(float(L.kl_loss(z, z))) < 1e-6


def test_l2_reg_and_audio_loss(rng):
    leaves = [rng.standard_normal((3, 4)).astype(np.float32),
              rng.standard_normal((7,)).astype(np.float32)]
    ours = float(L.l2_reg_loss([jnp.asarray(x) for x in leaves]))
    ref = float(sum(torch.sum(torch.from_numpy(x) ** 2) for x in leaves))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)

    dyn = rng.standard_normal((2, 9, 30)).astype(np.float32)
    gt = rng.standard_normal((2, 9, 30)).astype(np.float32) + 0.7
    ours = float(L.audio_loss(jnp.asarray(dyn), jnp.asarray(gt)))
    tg = torch.from_numpy(gt)
    centered = tg - tg.mean(dim=-1, keepdim=True)
    ref = float(F.mse_loss(torch.from_numpy(dyn), centered))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)
    # centering matters: plain MSE differs on off-center targets
    assert abs(ours - float(np.mean((dyn - gt) ** 2))) > 1e-3
