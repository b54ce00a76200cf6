"""Eval suite: FGD math, metrics, and the runner plumbing on tiny models."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from talkshow_tpu.data.dataset import synthetic_dataset
from talkshow_tpu.eval import metrics as M
from talkshow_tpu.eval.fgd import FGDEvaluator, frechet_distance
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
