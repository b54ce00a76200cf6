"""Loss library (mirror of losses/losses.py:11-91), pure jnp."""
from __future__ import annotations

import jax.numpy as jnp


def keypoint_loss(pred, gt, conf=None):
    """Confidence-masked MSE (losses.py KeypointLoss :15-20).

    With conf, the reference SELECTS elements whose confidence >= 0.01 and
    averages the squared error over the selected subset only (boolean mask
    indexing + reduction='mean'), rather than weighting; replicated here
    as a masked mean. The conf branch is dead at every live reference call
    site (smplx_face.py:139-167, LS3DCG.py:340-353 pass no conf) but the
    formula is kept parity-exact for checkpoint-era configs that used it.
    """
    se = (pred - gt) ** 2
    if conf is not None:
        sel = (conf >= 0.01).astype(se.dtype)
        return jnp.sum(se * sel) / jnp.maximum(jnp.sum(sel), 1.0)
    return jnp.mean(se)


def kl_loss(mu, logvar, tolerance=None, mul: float = 1.0):
    """KL(N(mu, sigma) || N(0, 1)) with the reference's free-bits floor
    (losses.py KLLoss :23-42): per-sample KL is SUMMED over the latent dim,
    floored elementwise at tolerance * mul * D / 64, then batch-meaned.
    Dead upstream (only a commented-out s2glayers.py:333 call) but kept
    formula-exact.
    """
    if mu.ndim != 2:
        raise ValueError(f"kl_loss expects (B, D) inputs (the reference "
                         f"sums over axis 1), got shape {mu.shape}")
    kld = -0.5 * jnp.sum(1 + logvar - mu ** 2 - jnp.exp(logvar), axis=1)
    if tolerance is not None:
        floor = tolerance * mul * mu.shape[1] / 64.0
        kld = jnp.maximum(kld, floor)
    return jnp.mean(kld)


def l2_reg_loss(params_leaves):
    """Sum of squared parameters (losses.py L2RegLoss)."""
    return sum(jnp.sum(p ** 2) for p in params_leaves)


def l1_loss(pred, gt):
    return jnp.mean(jnp.abs(pred - gt))


def audio_loss(dynamics, gt_poses):
    """MSE of predicted dynamics against MEAN-CENTERED target poses
    (losses.py AudioLoss :80-88: the gt is centered along the last axis
    before the MSE — "pay attention, normalized"). Dead upstream (no net
    instantiates AudioLoss) but kept formula-exact.
    """
    gt = gt_poses - jnp.mean(gt_poses, axis=-1, keepdims=True)
    return jnp.mean((dynamics - gt) ** 2)


def velocity_loss(pred, gt, axis: int = 1):
    """L1 between first-order temporal differences (the velocity term of
    the VQ losses, smplx_body_vq.py:186-189)."""
    dp = jnp.diff(pred, axis=axis)
    dg = jnp.diff(gt, axis=axis)
    return jnp.mean(jnp.abs(dp - dg))
