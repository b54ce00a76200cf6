import numpy as np
import jax
import jax.numpy as jnp

from talkshow_tpu.ops import vq


def test_nearest_code_pallas_matches_xla(rng):
    x = jnp.asarray(rng.standard_normal((300, 64)).astype(np.float32))
    emb = jnp.asarray(rng.standard_normal((2048, 64)).astype(np.float32))
    ref = vq.nearest_code_xla(x, emb)
    # interpret-compatible: pallas kernels run in interpret mode on CPU
    try:
        out = vq.nearest_code_pallas(x, emb)
    except Exception:
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            out = vq.nearest_code_pallas(x, emb)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_quantize_roundtrip(rng):
    state = vq.init_vq_state(jax.random.PRNGKey(0), 16, 4)
    # inputs exactly on codebook entries quantize to themselves
    idx = jnp.asarray([0, 5, 15, 7])
    z = vq.lookup(state, idx)
    quant, got_idx = vq.quantize(state, z)
    np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(idx))
    np.testing.assert_allclose(np.asarray(quant), np.asarray(z), atol=1e-6)


def test_quantize_train_ema_update_math(rng):
    """Verify one EMA step against the reference equations
    (vqvae_modules.py:215-299) computed by hand in numpy."""
    K, D, N = 8, 4, 32
    decay, eps = 0.99, 1e-5
    state = vq.init_vq_state(jax.random.PRNGKey(1), K, D)
    z = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))

    quant, commit, new_state, idx = vq.quantize_train(state, z, 0.25, decay, eps)

    # numpy reference
    emb = np.asarray(state.embeddings)
    dist = ((np.asarray(z)[:, None] - emb[None]) ** 2).sum(-1)
    idx_np = dist.argmin(1)
    np.testing.assert_array_equal(np.asarray(idx), idx_np)

    onehot = np.eye(K)[idx_np]
    counts = onehot.sum(0)
    dw = onehot.T @ np.asarray(z)
    hidden_c = 0 - (0 - counts) * (1 - decay)
    hidden_w = 0 - (0 - dw) * (1 - decay)
    debias = 1 - decay ** 1
    ema_c = hidden_c / debias        # == counts at step 1
    ema_w = hidden_w / debias
    n = ema_c.sum()
    smoothed = (ema_c + eps) / (n + K * eps) * n
    expect_emb = ema_w / smoothed[:, None]
    np.testing.assert_allclose(np.asarray(new_state.embeddings), expect_emb,
                               rtol=1e-5, atol=1e-5)

    # commitment loss
    q = emb[idx_np]
    expect_commit = 0.25 * np.mean((np.asarray(z) - q) ** 2)
    np.testing.assert_allclose(float(commit), expect_commit, rtol=1e-5)


def test_straight_through_gradient():
    state = vq.init_vq_state(jax.random.PRNGKey(2), 8, 4)

    def loss_fn(z):
        quant, commit, _, _ = vq.quantize_train(state, z)
        return jnp.sum(quant * 2.0) + commit

    z = jnp.ones((5, 4)) * 0.3
    g = jax.grad(loss_fn)(z)
    # straight-through: d(quant)/dz = I, so the first term contributes 2.0
    # everywhere; commit adds 0.25 * 2 (z - q) / N
    quant, _, _, _ = vq.quantize_train(state, z)
    q = jax.lax.stop_gradient(z - (quant - z))  # not meaningful; just check finite
    assert np.all(np.isfinite(np.asarray(g)))
    np.testing.assert_allclose(np.asarray(g).mean(), 2.0, atol=0.1)


def test_ema_debias_counter_progression(rng):
    state = vq.init_vq_state(jax.random.PRNGKey(3), 8, 4)
    z = jnp.asarray(rng.standard_normal((16, 4)).astype(np.float32))
    for i in range(3):
        _, _, state, _ = vq.quantize_train(state, z)
    assert int(state.counter) == 3
    assert np.all(np.isfinite(np.asarray(state.embeddings)))
