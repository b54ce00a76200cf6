"""Loss library (mirror of losses/losses.py:11-91), pure jnp."""
from __future__ import annotations

import jax.numpy as jnp


def keypoint_loss(pred, gt, conf=None):
    """Confidence-masked MSE (losses.py KeypointLoss)."""
    se = (pred - gt) ** 2
    if conf is not None:
        se = se * conf
    return jnp.mean(se)


def kl_loss(mu, logvar, tolerance: float = 0.0):
    """KL(N(mu, sigma) || N(0, 1)) with an optional free-bits floor
    (losses.py KLLoss tolerance)."""
    kl = -0.5 * jnp.mean(1 + logvar - mu ** 2 - jnp.exp(logvar))
    return jnp.maximum(kl, tolerance)


def l2_reg_loss(params_leaves):
    """Sum of squared parameters (losses.py L2RegLoss)."""
    return sum(jnp.sum(p ** 2) for p in params_leaves)


def l1_loss(pred, gt):
    return jnp.mean(jnp.abs(pred - gt))


def audio_loss(pred_audio, gt_audio):
    """MSE on audio features (losses.py AudioLoss)."""
    return jnp.mean((pred_audio - gt_audio) ** 2)


def velocity_loss(pred, gt, axis: int = 1):
    """L1 between first-order temporal differences (the velocity term of
    the VQ losses, smplx_body_vq.py:186-189)."""
    dp = jnp.diff(pred, axis=axis)
    dg = jnp.diff(gt, axis=axis)
    return jnp.mean(jnp.abs(dp - dg))
