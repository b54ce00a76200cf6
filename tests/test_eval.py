"""Eval suite: FGD math, metrics, and the runner plumbing on tiny models."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from talkshow_tpu.data.dataset import synthetic_dataset
from talkshow_tpu.eval import metrics as M
from talkshow_tpu.eval.fgd import (FGDEvaluator, frechet_distance,
                                   frechet_distance_np)
from talkshow_tpu.models.body import create_body_models
from talkshow_tpu.models.vqvae import AE
from talkshow_tpu.eval.runners import eval_body, eval_vq_capacity


def test_frechet_distance_identical_zero(rng):
    x = rng.standard_normal((500, 16)).astype(np.float32)
    d = float(frechet_distance(jnp.asarray(x), jnp.asarray(x)))
    assert abs(d) < 1e-2


def test_frechet_distance_mean_shift(rng):
    x = rng.standard_normal((2000, 8)).astype(np.float32)
    y = x + 3.0
    d = float(frechet_distance(jnp.asarray(x), jnp.asarray(y)))
    # FGD ~= ||mu1-mu2||^2 = 8 * 9 = 72 for identical covs
    assert 65 < d < 80


def test_frechet_matches_scipy_sqrtm(rng):
    from scipy import linalg
    a = rng.standard_normal((300, 6)).astype(np.float64)
    b = rng.standard_normal((300, 6)).astype(np.float64) * 1.5 + 0.3
    d_ours = float(frechet_distance(jnp.asarray(a), jnp.asarray(b), eps=0.0))
    mu1, mu2 = a.mean(0), b.mean(0)
    s1, s2 = np.cov(a, rowvar=False), np.cov(b, rowvar=False)
    covmean, _ = linalg.sqrtm(s1 @ s2, disp=False)
    d_ref = ((mu1 - mu2) @ (mu1 - mu2) + np.trace(s1) + np.trace(s2)
             - 2 * np.trace(covmean.real))
    np.testing.assert_allclose(d_ours, d_ref, rtol=1e-3)


def test_frechet_np_matches_jnp(rng):
    a = rng.standard_normal((300, 12)).astype(np.float32)
    b = (rng.standard_normal((250, 12)) * 1.4 + 0.5).astype(np.float32)
    d_np = frechet_distance_np(a, b)
    d_jnp = float(frechet_distance(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(d_np, d_jnp, rtol=1e-4, atol=1e-4)


def test_bootstrap_fgd_ci(rng):
    """Clip-level bootstrap: deterministic under seed, CI brackets the
    point estimate, and a large mean shift keeps the CI well above zero."""
    class _Id:
        def apply(self, vars_, x, method=None):
            return x[..., None, :]   # (B,T,C) -> (B,T,1,C) identity embed
    ev = FGDEvaluator(_Id(), {})
    for _ in range(12):
        real = rng.standard_normal((1, 40, 16)).astype(np.float32)
        gen = (real + 3.0 + 0.1 * rng.standard_normal((1, 40, 16))
               ).astype(np.float32)
        ev.push_samples(jnp.asarray(gen), jnp.asarray(real))
    point, _ = ev.get_scores()
    ci = ev.bootstrap_fgd(n_boot=64, seed=1)
    ci2 = ev.bootstrap_fgd(n_boot=64, seed=1)
    assert ci == ci2                      # seeded -> reproducible
    assert ci["n_clips"] == 12 and ci["n_boot"] == 64
    assert ci["p2_5"] <= point <= ci["p97_5"] or \
        abs(ci["mean"] - point) < 3 * ci["std"] + 1e-6
    assert ci["p2_5"] > 50                # ||3||^2*16 = 144 shift dominates
    with pytest.raises(ValueError):
        FGDEvaluator(_Id(), {}).bootstrap_fgd()


def test_paired_fgd_gap(rng):
    """Two arms over the same clips + same bootstrap seed pair draw-for-draw:
    the gap CI separates a close arm from a far arm even when noise makes
    the marginal CIs wide, and unpaired inputs are rejected."""
    from talkshow_tpu.eval.fgd import paired_fgd_gap

    class _Id:
        def apply(self, vars_, x, method=None):
            return x[..., None, :]
    ev_close, ev_far = FGDEvaluator(_Id(), {}), FGDEvaluator(_Id(), {})
    for _ in range(12):
        real = rng.standard_normal((1, 40, 16)).astype(np.float32)
        noise = 0.1 * rng.standard_normal((1, 40, 16))
        ev_close.push_samples(jnp.asarray(real + noise).astype(jnp.float32),
                              jnp.asarray(real))
        ev_far.push_samples(jnp.asarray(real + 3.0 + noise
                                        ).astype(jnp.float32),
                            jnp.asarray(real))
    ci_close = ev_close.bootstrap_fgd(n_boot=64, seed=1, return_draws=True)
    ci_far = ev_far.bootstrap_fgd(n_boot=64, seed=1, return_draws=True)
    gap = paired_fgd_gap(ci_close, ci_far)
    assert gap["p97_5"] < 0                 # close − far strictly negative
    assert gap["frac_a_lt_b"] == 1.0
    assert gap["n_boot"] == 64 and gap["n_clips"] == 12

    with pytest.raises(ValueError):         # draws missing
        paired_fgd_gap(ev_close.bootstrap_fgd(n_boot=64, seed=1), ci_far)
    with pytest.raises(ValueError):         # different seed -> not paired
        paired_fgd_gap(
            ev_close.bootstrap_fgd(n_boot=64, seed=2, return_draws=True),
            ci_far)


def test_clip_ci_and_paired_gap(rng):
    """Scalar per-clip bootstrap: CI brackets the sample mean; the paired
    gap separates arms whose shared clip-difficulty noise swamps the
    marginal CIs; mismatched clip walks are rejected."""
    difficulty = rng.standard_normal(16) * 5.0       # shared per-clip noise
    arm_a = difficulty + 1.0 + 0.05 * rng.standard_normal(16)
    arm_b = difficulty + 1.3 + 0.05 * rng.standard_normal(16)

    ci = M.clip_ci(arm_a, n_boot=128, seed=3)
    assert ci["p2_5"] <= float(np.mean(arm_a)) <= ci["p97_5"]
    assert ci == M.clip_ci(arm_a, n_boot=128, seed=3)   # deterministic

    # marginal CIs overlap (shared 5-sigma difficulty) ...
    ci_b = M.clip_ci(arm_b, n_boot=128, seed=3)
    assert ci["p97_5"] > ci_b["p2_5"]
    # ... but the paired gap cleanly excludes zero
    gap = M.paired_clip_gap(arm_a, arm_b, n_boot=128, seed=3)
    assert gap["p97_5"] < 0 and gap["frac_a_lt_b"] == 1.0
    assert gap["clip_win_rate_a"] == 1.0

    with pytest.raises(ValueError):
        M.paired_clip_gap(arm_a, arm_b[:-1])
    with pytest.raises(ValueError):
        M.clip_ci([1.0])


def test_lvd_zero_for_identical(rng):
    j = rng.standard_normal((30, 22, 3)).astype(np.float32)
    assert float(M.lvd(jnp.asarray(j), jnp.asarray(j))) == 0.0
    assert float(M.batch_lvd(jnp.asarray(j), jnp.asarray(j)[None])) < 1e-6


def test_diversity(rng):
    same = np.stack([np.ones((10, 4))] * 3)
    assert M.diversity(same) == 0.0
    diff = rng.standard_normal((3, 10, 4))
    assert M.diversity(diff) > 0


def test_beat_consistency_perfect_beats():
    """Motion with sharp arm-angle velocity minima at audio beat times
    should score near 1."""
    T = 90
    joints = np.zeros((T, 25, 3), np.float32)
    # oscillating arm with slowdowns at t=30,60
    phase = np.cumsum(0.2 + 0.19 * np.cos(2 * np.pi * np.arange(T) / 30))
    joints[:, 15, 0] = np.sin(phase)
    joints[:, 17, 0] = np.sin(phase) * 0.5
    joints[:, 13, 1] = 1.0
    beats = np.asarray([1.0, 2.0])
    score = M.beat_consistency([joints], [beats])
    assert 0.0 < score <= 1.0


def test_eval_runners_on_synthetic():
    ds = synthetic_dataset(num_clips=2, frames=64)
    body = create_body_models(jax.random.PRNGKey(0), code_num=64,
                              num_hiddens=64, pixel_dim=16, pixel_layers=3)
    cap = eval_vq_capacity(body.vq_body, body.vq_hand,
                           {"body": body.vq_body_vars, "hand": body.vq_hand_vars},
                           {"body": body.vq_body_state, "hand": body.vq_hand_state},
                           ds)
    assert np.isfinite(cap["capacity_l1"]) and cap["num_clips"] == 2

    ae = AE(in_dim=129, num_hiddens=64)
    ae_vars = ae.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 129)))
    res = eval_body(body, ae, ae_vars, ds, num_samples=2)
    for k in ("fgd", "feat_mae", "l2", "diversity"):
        assert np.isfinite(res[k]), k


def _load_synthetic_smplx(tmp_path):
    """Generate the synthetic SMPL-X npz and load it through the REAL
    loader (scripts/make_synthetic_smplx.py round trip)."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                    "..", "scripts"))
    import make_synthetic_smplx as mss
    from talkshow_tpu.ops.smplx_lbs import load_smplx_npz
    path = str(tmp_path / "smplx.npz")
    np.savez(path, **mss.build_synthetic_smplx_arrays(verts_per_joint=4))
    return load_smplx_npz(path)


def test_eval_body_smplx_metrics(tmp_path):
    """With an SMPL-X model the battery publishes LVD through the real
    LBS path (reference scripts/test_body.py:157-174)."""
    model = _load_synthetic_smplx(tmp_path)
    ds = synthetic_dataset(num_clips=2, frames=64)
    body = create_body_models(jax.random.PRNGKey(0), code_num=64,
                              num_hiddens=64, pixel_dim=16, pixel_layers=3)
    ae = AE(in_dim=129, num_hiddens=64)
    ae_vars = ae.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 129)))
    res = eval_body(body, ae, ae_vars, ds, num_samples=2, smplx_model=model)
    assert "lvd" in res and np.isfinite(res["lvd"]) and res["lvd"] > 0


def test_eval_face_smplx_metrics(tmp_path):
    """Vertex-space face LVD (reference scripts/test_face.py:148-160)."""
    from talkshow_tpu.data.dataset import Clip, ShowDataset
    from talkshow_tpu.eval.runners import eval_face
    from talkshow_tpu.models.face import FaceGenerator
    from talkshow_tpu.models.wav2vec import Wav2Vec2Config

    model = _load_synthetic_smplx(tmp_path)
    r = np.random.default_rng(0)
    t = 30
    clips = [Clip(speaker="oliver",
                  poses=r.standard_normal((t, 165)).astype(np.float32) * 0.2,
                  expression=r.standard_normal((t, 100)).astype(np.float32) * 0.3,
                  aud_feat=r.standard_normal((t * 533, 1)).astype(np.float32) * 0.1,
                  betas=np.zeros(300, np.float32))]
    ds = ShowDataset(clips)
    face = FaceGenerator(wav2vec_cfg=Wav2Vec2Config(num_layers=1))
    fvars = face.init(jax.random.PRNGKey(0), jnp.zeros((1, t * 533)),
                      jnp.zeros((1, 4)), t)
    res = eval_face(face, fvars, ds, smplx_model=model)
    assert "face_lvd" in res and np.isfinite(res["face_lvd"])
    assert np.isfinite(res["jaw_l1"]) and np.isfinite(res["exp_mse"])


def test_eval_ls3dcg_runner():
    from talkshow_tpu.eval.runners import eval_ls3dcg
    from talkshow_tpu.models.ls3dcg import LS3DCGGenerator

    ds = synthetic_dataset(num_clips=2, frames=64)
    gen = LS3DCGGenerator()
    gvars = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64)))
    ae = AE(in_dim=129, num_hiddens=64)
    ae_vars = ae.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 129)))
    res = eval_ls3dcg(gen, gvars, ae, ae_vars, ds)
    for k in ("jaw_l1", "exp_mse", "body_l1", "hand_l1", "fgd"):
        assert np.isfinite(res[k]), k
    assert res["num_clips"] == 2


def test_fgd_extract_width_dispatch(rng):
    """extract slices full-width poses by the layout-matched index set:
    165 -> C_INDEX_3D, 330 -> C_INDEX_6D (the old >129 heuristic sliced
    6d inputs with 3d indices), and passes conv-channel widths through."""
    from talkshow_tpu.ops.pose import C_INDEX_3D, C_INDEX_6D

    captured = {}

    class _Spy:
        def apply(self, vars_, x, method=None):
            captured["x"] = np.asarray(x)
            return x[..., None, :]

    ev = FGDEvaluator(_Spy(), {})
    full6d = rng.standard_normal((1, 8, 330)).astype(np.float32)
    ev.extract(jnp.asarray(full6d))
    np.testing.assert_array_equal(captured["x"], full6d[..., C_INDEX_6D])

    full3d = rng.standard_normal((1, 8, 165)).astype(np.float32)
    ev.extract(jnp.asarray(full3d))
    np.testing.assert_array_equal(captured["x"], full3d[..., C_INDEX_3D])

    for width in (129, 258):   # already conv-channel: untouched
        conv = rng.standard_normal((1, 8, width)).astype(np.float32)
        ev.extract(jnp.asarray(conv))
        np.testing.assert_array_equal(captured["x"], conv)
