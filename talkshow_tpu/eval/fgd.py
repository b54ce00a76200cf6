"""Fréchet Gesture Distance evaluator (on-device capable).

Mirror of evaluation/FGD.py:15-199: motion clips are embedded with the
body-AE feature extractor (nets/body_ae.py), then FGD = Fréchet distance
between gaussians fit to real vs generated features, plus a feature-space
MAE.

The matrix square root uses the identity
    tr sqrtm(S1 S2) = sum_i sqrt(lambda_i(S1^(1/2) S2 S1^(1/2)))
so everything reduces to two symmetric eigendecompositions — jittable on
TPU, no scipy.linalg.sqrtm host roundtrip.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from talkshow_tpu.models.vqvae import AE
from talkshow_tpu.ops.pose import C_INDEX_3D, C_INDEX_6D


def frechet_distance(feats_a: jnp.ndarray, feats_b: jnp.ndarray,
                     eps: float = 1e-6) -> jnp.ndarray:
    """FGD between two feature sets (N, D), (M, D)."""
    mu1, mu2 = jnp.mean(feats_a, 0), jnp.mean(feats_b, 0)
    s1 = jnp.cov(feats_a, rowvar=False)
    s2 = jnp.cov(feats_b, rowvar=False)
    s1 = s1 + jnp.eye(s1.shape[0]) * eps
    s2 = s2 + jnp.eye(s2.shape[0]) * eps

    # sqrt of s1 via eigh
    w1, v1 = jnp.linalg.eigh(s1)
    sq1 = (v1 * jnp.sqrt(jnp.maximum(w1, 0.0))) @ v1.T
    m = sq1 @ s2 @ sq1
    wm = jnp.linalg.eigvalsh(m)
    tr_covmean = jnp.sum(jnp.sqrt(jnp.maximum(wm, 0.0)))

    diff = mu1 - mu2
    return diff @ diff + jnp.trace(s1) + jnp.trace(s2) - 2.0 * tr_covmean


def frechet_distance_np(feats_a: np.ndarray, feats_b: np.ndarray,
                        eps: float = 1e-6) -> float:
    """Pure-numpy mirror of `frechet_distance` (same eigh identity).

    Used by the bootstrap, where resampled feature counts vary per draw —
    recomputing on host avoids one XLA recompile per distinct shape (fatal
    over the axon tunnel at ~30 s per remote compile).
    """
    mu1, mu2 = feats_a.mean(0), feats_b.mean(0)
    s1 = np.cov(feats_a, rowvar=False) + np.eye(feats_a.shape[1]) * eps
    s2 = np.cov(feats_b, rowvar=False) + np.eye(feats_b.shape[1]) * eps
    w1, v1 = np.linalg.eigh(s1)
    sq1 = (v1 * np.sqrt(np.maximum(w1, 0.0))) @ v1.T
    wm = np.linalg.eigvalsh(sq1 @ s2 @ sq1)
    tr_covmean = np.sum(np.sqrt(np.maximum(wm, 0.0)))
    diff = mu1 - mu2
    return float(diff @ diff + np.trace(s1) + np.trace(s2) - 2.0 * tr_covmean)


def paired_fgd_gap(ci_a: dict, ci_b: dict) -> dict:
    """Paired bootstrap distribution of the FGD gap (arm a − arm b).

    Valid when both arms' `bootstrap_fgd(return_draws=True)` ran with the
    SAME seed/n_boot over the SAME number of clips walked in the same order
    (e.g. trained vs random-init prior over one test split): the resample
    index sequence drawn from `np.random.default_rng(seed)` is then
    identical draw-for-draw, so `draws_a[k] - draws_b[k]` is the paired
    bootstrap of the gap on resample k. Pairing cancels the shared
    which-clips-were-drawn variance, so the gap CI can cleanly exclude zero
    even when the two marginal CIs overlap (exactly the r5 situation:
    trained 98.9 [13.8, 213.9] vs random 138.5 [38.0, 259.3]).
    """
    for ci in (ci_a, ci_b):
        if "draws" not in ci:
            raise ValueError("paired_fgd_gap needs bootstrap_fgd("
                             "return_draws=True) outputs")
    if any(ci_a[k] != ci_b[k] for k in ("n_boot", "n_clips", "seed")):
        raise ValueError(
            "paired_fgd_gap arms are not paired: n_boot/n_clips/seed differ "
            f"({ci_a['n_boot']}/{ci_a['n_clips']}/{ci_a['seed']} vs "
            f"{ci_b['n_boot']}/{ci_b['n_clips']}/{ci_b['seed']})")
    gap = np.asarray(ci_a["draws"]) - np.asarray(ci_b["draws"])
    lo, hi = np.percentile(gap, [2.5, 97.5])
    return {"mean": float(gap.mean()), "std": float(gap.std()),
            "p2_5": float(lo), "p97_5": float(hi),
            "frac_a_lt_b": float(np.mean(gap < 0)),
            "n_boot": int(ci_a["n_boot"]), "n_clips": int(ci_a["n_clips"])}


class FGDEvaluator:
    """Accumulates real/generated features, joints and audio beats per clip
    (push_* mirror EmbeddingSpaceEvaluator :38-63)."""

    def __init__(self, ae: AE, ae_vars):
        self.ae = ae
        self.ae_vars = ae_vars
        self.reset()

    def reset(self):
        self.real_feats = []
        self.gen_feats = []
        self.real_joints = []
        self.gen_joints = []
        self.audio_beats = []

    def extract(self, poses: jnp.ndarray) -> jnp.ndarray:
        """Poses (B, T, C) -> features (B, T/4, embed).

        Accepts either full-width poses (165 for the 3d layout, 330 for
        6d) — sliced down to the conv channels here — or already-sliced
        conv-channel poses (129 / 258).  Widths are matched exactly: the
        old `>129 -> C_INDEX_3D` heuristic silently mis-sliced 258-wide
        6d conv poses with 3d indices."""
        c = poses.shape[-1]
        if c == 330:
            poses = poses[..., C_INDEX_6D]
        elif c == 165:
            poses = poses[..., C_INDEX_3D]
        # any other width is taken as already conv-channel / feature input
        # (129 / 258 / synthetic test widths); a genuine mismatch surfaces
        # as a shape error in the AE rather than silently wrong features.
        return self.ae.apply(self.ae_vars, poses, method=AE.encode)

    def push_samples(self, generated: jnp.ndarray, real: jnp.ndarray):
        rf = self.extract(real)
        gf = self.extract(generated)
        self.real_feats.append(np.asarray(rf).reshape(-1, rf.shape[-1]))
        self.gen_feats.append(np.asarray(gf).reshape(-1, gf.shape[-1]))

    def push_joints(self, generated: np.ndarray, real: np.ndarray):
        self.real_joints.append(np.asarray(real))
        self.gen_joints.append(np.asarray(generated).squeeze())

    def push_aud(self, beats: np.ndarray):
        self.audio_beats.append(np.asarray(beats))

    def get_scores(self):
        """-> (fgd, feature MAE) (reference get_scores :117-144)."""
        gen = np.vstack(self.gen_feats)
        real = np.vstack(self.real_feats)
        fgd = float(frechet_distance(jnp.asarray(gen), jnp.asarray(real)))
        n = min(len(gen), len(real))
        feat_mae = float(np.mean(np.sum(np.abs(real[:n] - gen[:n]), axis=1)))
        return fgd, feat_mae

    def bootstrap_fgd(self, n_boot: int = 200, seed: int = 0,
                      return_draws: bool = False) -> dict:
        """Clip-level bootstrap CI for the FGD point estimate.

        Each push_samples call is one clip, so `gen_feats[i]`/`real_feats[i]`
        are paired per-clip feature groups: resampling clip INDICES with
        replacement (paired, so gen and real stay matched) respects the real
        dependence structure — frames within a clip are correlated, clips are
        the independent unit. The reference publishes FGD as a bare point
        estimate (evaluation/FGD.py get_scores); the spread here is what a
        reviewer needs to judge the trained-vs-random margin.

        `return_draws` includes the raw per-draw values, which
        `paired_fgd_gap` needs to compare two arms draw-by-draw.
        """
        n_clips = len(self.gen_feats)
        if n_clips < 2:
            raise ValueError("bootstrap_fgd needs >= 2 pushed clips")
        rng = np.random.default_rng(seed)
        draws = np.empty(n_boot)
        for b in range(n_boot):
            idx = rng.integers(0, n_clips, size=n_clips)
            gen = np.vstack([self.gen_feats[i] for i in idx])
            real = np.vstack([self.real_feats[i] for i in idx])
            draws[b] = frechet_distance_np(gen, real)
        lo, hi = np.percentile(draws, [2.5, 97.5])
        out = {"mean": float(draws.mean()), "std": float(draws.std()),
               "p2_5": float(lo), "p97_5": float(hi),
               "n_boot": n_boot, "n_clips": n_clips, "seed": seed}
        if return_draws:
            out["draws"] = draws.tolist()
        return out

    def get_bc_score(self) -> float:
        from talkshow_tpu.eval.metrics import beat_consistency
        return beat_consistency(self.gen_joints, self.audio_beats)

    def get_maac(self):
        from talkshow_tpu.eval.metrics import maac
        return maac(self.real_joints)
