"""Motion metrics: LVD, diversity, beat consistency, MAAC.

JAX/numpy mirrors of evaluation/metrics.py and the joint-space metrics in
evaluation/FGD.py (BC :79-114, MAAC :65-77).  All operate on joint
positions (T, J, 3) produced by ops/smplx_lbs.py.
"""
from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from talkshow_tpu.ops.pose import CHANGE_ANGLE

# LVD joint subset (evaluation/metrics.py rearrange/symmetry, lower_body.py:136-143)
REARRANGE = list(range(22))
SYMMETRY = np.asarray([0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1,
                       1, 1, 1, 1], bool)


def lvd(gt_kps: jnp.ndarray, pr_kps: jnp.ndarray) -> jnp.ndarray:
    """Landmark velocity difference (evaluation/metrics.py:79-94).

    gt_kps (T, J, 3); pr_kps (T, J, 3) -> scalar.
    """
    gt_v = jnp.linalg.norm(gt_kps[1:] - gt_kps[:-1], axis=-1)
    pr_v = jnp.linalg.norm(pr_kps[1:] - pr_kps[:-1], axis=-1)
    return jnp.mean(jnp.sum(jnp.abs(pr_v - gt_v), axis=-1))


def batch_lvd(gt_kps: jnp.ndarray, pr_kps: jnp.ndarray,
              symmetrical: bool = False) -> jnp.ndarray:
    """Batched variant (evaluation/metrics.py:26-76); pr_kps (B, T, J, 3).

    With symmetrical=True, paired left/right joints contribute only the
    side that moves more (evaluated over the whole clip), matching the
    reference's move_side selection.
    """
    T = min(gt_kps.shape[0], pr_kps.shape[1])
    gt_kps, pr_kps = gt_kps[:T], pr_kps[:, :T]
    if not symmetrical:
        gt_v = jnp.linalg.norm(gt_kps[1:] - gt_kps[:-1], axis=-1)
        pr_v = jnp.linalg.norm(pr_kps[:, 1:] - pr_kps[:, :-1], axis=-1)
        w = 1.0 / gt_v.shape[0]
        return jnp.mean(jnp.sum(jnp.sum(jnp.abs(pr_v - gt_v[None]), axis=-1) * w,
                                axis=-1))

    sym = jnp.asarray(SYMMETRY)
    ga = gt_kps[:, REARRANGE]
    pa = pr_kps[:, :, REARRANGE]

    def split_vel(x, batched):
        axis = 1 if batched else 0
        ns = x[..., ~np.asarray(SYMMETRY), :]
        ys = x[..., np.asarray(SYMMETRY), :]
        ys = ys.reshape(ys.shape[:-2] + (-1, 2, 3))
        d = jnp.linalg.norm(jnp.diff(x, axis=axis), axis=-1)
        ns_v = d[..., ~np.asarray(SYMMETRY)]
        ys_v = jnp.linalg.norm(jnp.diff(ys, axis=axis), axis=-1)
        return ns_v, ys_v

    ns_g, ys_g = split_vel(ga, False)
    left = ys_g[..., 0].sum(-1)
    right = ys_g[..., 1].sum(-1)
    side_g = (left > right)[:, None]
    ys_gv = jnp.where(side_g, ys_g[..., 0], ys_g[..., 1])
    gt_v = jnp.concatenate([ns_g, ys_gv], axis=-1)

    ns_p, ys_p = split_vel(pa, True)
    left_p = ys_p[..., 0].sum(-1)
    right_p = ys_p[..., 1].sum(-1)
    side_p = (left_p > right_p)[..., None]
    ys_pv = jnp.where(side_p, ys_p[..., 0], ys_p[..., 1])
    pr_v = jnp.concatenate([ns_p, ys_pv], axis=-1)

    w = 1.0 / gt_v.shape[0]
    return jnp.mean(jnp.sum(jnp.sum(jnp.abs(pr_v - gt_v[None]), axis=-1) * w,
                            axis=-1))


def clip_ci(vals, n_boot: int = 200, seed: int = 0,
            return_draws: bool = False) -> dict:
    """Bootstrap CI of a per-clip scalar metric's mean (clips = independent
    unit, same rationale as FGDEvaluator.bootstrap_fgd).  `return_draws`
    adds the raw bootstrap means under "draws" so downstream statistics
    (paired_clip_gap) consume the exact resamples behind the percentiles
    instead of re-deriving them from a second rng."""
    vals = np.asarray(vals, dtype=float)
    if vals.size < 2:
        raise ValueError("clip_ci needs >= 2 per-clip values")
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, vals.size, size=(n_boot, vals.size))
    draws = vals[idx].mean(axis=1)
    lo, hi = np.percentile(draws, [2.5, 97.5])
    out = {"mean": float(draws.mean()), "std": float(draws.std()),
           "p2_5": float(lo), "p97_5": float(hi),
           "n_boot": n_boot, "n_clips": int(vals.size)}
    if return_draws:
        out["draws"] = draws
    return out


def paired_clip_gap(vals_a, vals_b, n_boot: int = 200, seed: int = 0) -> dict:
    """Paired bootstrap of the gap between two arms' per-clip metric values
    measured on the SAME clips in the same order (e.g. trained vs random
    init over one test split): bootstrap the per-clip differences, so the
    shared clip-difficulty variance cancels — the gap CI can exclude zero
    where the marginal CIs overlap."""
    vals_a, vals_b = np.asarray(vals_a, float), np.asarray(vals_b, float)
    if vals_a.shape != vals_b.shape:
        raise ValueError(f"arms differ in clip count: {vals_a.shape} vs "
                         f"{vals_b.shape} — not the same clip walk")
    diff = vals_a - vals_b
    out = clip_ci(diff, n_boot=n_boot, seed=seed, return_draws=True)
    # fraction of bootstrap resamples with mean gap < 0 (same convention as
    # fgd.paired_fgd_gap) — computed on the SAME draws as the percentiles
    # above, plus the raw per-clip win rate
    draws = out.pop("draws")
    out["frac_a_lt_b"] = float(np.mean(draws < 0))
    out["clip_win_rate_a"] = float(np.mean(diff < 0))
    return out


def diversity(samples: np.ndarray) -> float:
    """Mean pairwise L1 between samples (evaluation/metrics.py:96-109).
    samples: (B, T, D)."""
    b = samples.shape[0]
    dists = []
    for i in range(b):
        for j in range(i + 1, b):
            dists.append(np.mean(np.abs(samples[i] - samples[j])))
    return float(np.mean(dists)) if dists else 0.0


def _wrist_angle_velocity(joints: np.ndarray) -> np.ndarray:
    """Arm-angle angular velocity per the reference's BC/MAAC construction
    (FGD.py:84-95): uses joint triplets around elbows/wrists."""
    j = np.array(joints, copy=True)
    j[:, 15:21] = j[:, 16:22]
    vec = j[:, 15:21] - j[:, 13:19]
    inner = np.einsum("kij,kij->ki", vec[:, 2:], vec[:, :-2])
    inner = np.clip(inner, -1.0, 1.0)
    angle = np.arccos(inner) / math.pi
    return np.abs(angle[1:] - angle[:-1])        # (T-1, 4)


def maac(joints_list: list[np.ndarray]) -> np.ndarray:
    """Mean absolute angle change (FGD.py:65-77)."""
    vels = [np.mean(_wrist_angle_velocity(j), axis=0) for j in joints_list]
    return np.mean(np.stack(vels), axis=0)


def beat_consistency(joints_list: list[np.ndarray],
                     audio_beats_list: list[np.ndarray],
                     thres: float = 0.01, sigma: float = 0.1) -> float:
    """Beat consistency score (FGD.py:79-114): motion beats = local minima
    of normalized arm angular velocity; score = mean gaussian proximity of
    audio onsets to the nearest motion beat."""
    sum_1 = 0.0
    total_beat = 0
    for joints, audio_beats in zip(joints_list, audio_beats_list):
        if joints.ndim == 4:
            joints = joints[0]
        ang_vel = _wrist_angle_velocity(joints) / CHANGE_ANGLE / len(CHANGE_ANGLE)
        angle_diff = np.concatenate([np.zeros((1, 4)), ang_vel], axis=0)
        T = joints.shape[0]
        for i in range(angle_diff.shape[1]):
            motion_beats = []
            for t in range(1, T - 1):
                if (angle_diff[t, i] < angle_diff[t - 1, i]
                        and angle_diff[t, i] < angle_diff[t + 1, i]
                        and (angle_diff[t - 1, i] - angle_diff[t, i] >= thres
                             or angle_diff[t + 1, i] - angle_diff[t, i] >= thres)):
                    motion_beats.append(t / 30.0)
            if not motion_beats:
                continue
            mb = np.asarray(motion_beats)
            for a in np.asarray(audio_beats).reshape(-1):
                sum_1 += math.exp(-np.min((a - mb) ** 2) / (2 * sigma * sigma))
            total_beat += len(np.asarray(audio_beats).reshape(-1))
    return sum_1 / total_beat if total_beat else 0.0
