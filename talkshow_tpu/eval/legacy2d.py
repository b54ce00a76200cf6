"""Legacy 2D-keypoint metrics (Freeform-era evaluation suite).

Mirrors the math of evaluation/diversity_LVD.py, peak_velocity.py and
mode_transition.py, which operate on OpenPose-style 2D keypoints
(T, K, 2).  These scripts evaluate older 2D-keypoint models; the functions
here accept keypoint arrays directly so they work on any source.
"""
from __future__ import annotations

import numpy as np


def lvd_2d(gt_kps: np.ndarray, pr_kps: np.ndarray) -> float:
    """Velocity-difference on 2D keypoints (diversity_LVD.py semantics)."""
    T = min(gt_kps.shape[0], pr_kps.shape[0])
    gt_v = np.linalg.norm(np.diff(gt_kps[:T], axis=0), axis=-1)
    pr_v = np.linalg.norm(np.diff(pr_kps[:T], axis=0), axis=-1)
    return float(np.mean(np.abs(gt_v - pr_v).sum(-1)))


def diversity_2d(samples: np.ndarray) -> float:
    """Pairwise L1 over generated 2D-keypoint samples (B, T, K, 2)."""
    b = samples.shape[0]
    vals = [np.mean(np.abs(samples[i] - samples[j]))
            for i in range(b) for j in range(i + 1, b)]
    return float(np.mean(vals)) if vals else 0.0


def peak_velocity(kps: np.ndarray, order: int = 2) -> np.ndarray:
    """Per-joint local velocity maxima (peak_velocity.py): returns the mean
    of velocity peaks — a measure of gesture sharpness."""
    vel = np.linalg.norm(np.diff(kps, axis=0), axis=-1)   # (T-1, K)
    peaks = []
    for t in range(order, vel.shape[0] - order):
        window = vel[t - order:t + order + 1]
        is_peak = (vel[t] == window.max(axis=0)) & (vel[t] > 0)
        if is_peak.any():
            peaks.append(vel[t][is_peak].mean())
    return np.asarray(peaks)


def mode_transition_ratio(kps: np.ndarray, threshold: float | None = None) -> float:
    """Fraction of frames where motion switches between 'hold' and 'move'
    modes (mode_transition.py): velocity thresholded at its median by
    default; transitions = sign changes of the binarized velocity."""
    vel = np.linalg.norm(np.diff(kps, axis=0), axis=-1).mean(-1)  # (T-1,)
    thr = threshold if threshold is not None else float(np.median(vel))
    modes = vel > thr
    transitions = np.sum(modes[1:] != modes[:-1])
    return float(transitions) / max(len(modes) - 1, 1)


def select_quality_samples(kps: np.ndarray, window: int = 60,
                           vel_lo: float = 20.0, vel_hi: float = 80.0,
                           stride: int = 30) -> list[tuple[int, int]]:
    """Extract 'quality' sample windows (get_quality_samples.py semantics):
    windows whose mean keypoint velocity falls between the lo/hi
    percentiles of the clip — i.e. neither frozen nor erratic.

    kps: (T, K, D). Returns [(start, end)] window indices."""
    vel = np.linalg.norm(np.diff(kps, axis=0), axis=-1).mean(-1)  # (T-1,)
    out = []
    if len(vel) < window:
        return out
    means = np.asarray([vel[s:s + window].mean()
                        for s in range(0, len(vel) - window + 1, stride)])
    lo, hi = np.percentile(means, vel_lo), np.percentile(means, vel_hi)
    for i, s in enumerate(range(0, len(vel) - window + 1, stride)):
        if lo <= means[i] <= hi:
            out.append((s, s + window))
    return out
