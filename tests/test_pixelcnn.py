"""Causality + incremental-decode equivalence for the Gated PixelCNN."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from talkshow_tpu.models.pixelcnn import (GatedPixelCNN, sample_tokens,
                                          sample_tokens_reference)

K, DIM, LAYERS, CLASSES, AUDC = 32, 16, 4, 4, 8


@pytest.fixture(scope="module")
def model_and_vars():
    model = GatedPixelCNN(input_dim=K, dim=DIM, n_layers=LAYERS,
                          n_classes=CLASSES, audio=True, bh_model=True,
                          audio_channels=AUDC)
    B, H, W = 2, 9, 2
    tokens = jnp.zeros((B, H, W), jnp.int32)
    label = jnp.zeros((B,), jnp.int32)
    audio = jnp.zeros((B, H, AUDC))
    variables = model.init(jax.random.PRNGKey(0), tokens, label, audio)
    return model, variables


def _logits(model, variables, tokens, label, audio):
    return model.apply(variables, tokens, label, audio)


def test_output_shape(model_and_vars):
    model, variables = model_and_vars
    B, H, W = 2, 9, 2
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, K, (B, H, W)), jnp.int32)
    label = jnp.asarray([0, 3], jnp.int32)
    audio = jnp.asarray(rng.standard_normal((B, H, AUDC)), jnp.float32)
    out = _logits(model, variables, tokens, label, audio)
    assert out.shape == (B, H, W, K)


def test_causality(model_and_vars):
    """logits[(i,j)] must be invariant to tokens at positions >= (i,j) in
    raster order, and sensitive to at least one earlier token."""
    model, variables = model_and_vars
    B, H, W = 1, 6, 2
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, K, (B, H, W)), jnp.int32)
    label = jnp.zeros((B,), jnp.int32)
    audio = jnp.asarray(rng.standard_normal((B, H, AUDC)), jnp.float32)
    base = np.asarray(_logits(model, variables, tokens, label, audio))

    for (i, j) in [(2, 0), (2, 1), (5, 1)]:
        # perturb the token AT (i, j): logits at (i, j) must not change
        t2 = tokens.at[0, i, j].set((int(tokens[0, i, j]) + 7) % K)
        out2 = np.asarray(_logits(model, variables, t2, label, audio))
        np.testing.assert_allclose(out2[0, i, j], base[0, i, j], atol=1e-5)
        # ... and positions strictly after (i,j) in raster order MAY change,
        # positions before must not be affected either
        for (pi, pj) in [(0, 0), (1, 1), (i, j - 1) if j > 0 else (i - 1, 1)]:
            np.testing.assert_allclose(out2[0, pi, pj], base[0, pi, pj], atol=1e-5)

    # sensitivity: changing token (0,0) must change logits somewhere later
    t3 = tokens.at[0, 0, 0].set((int(tokens[0, 0, 0]) + 3) % K)
    out3 = np.asarray(_logits(model, variables, t3, label, audio))
    assert np.abs(out3[0, 1:] - base[0, 1:]).max() > 1e-6


def test_incremental_logits_match_full_forward(model_and_vars):
    """Teacher-force a fixed grid through the incremental row machinery and
    compare each position's logits with the full conv forward."""
    model, variables = model_and_vars
    B, H, W = 2, 7, 2
    rng = np.random.default_rng(2)
    tokens = jnp.asarray(rng.integers(0, K, (B, H, W)), jnp.int32)
    label = jnp.asarray([1, 2], jnp.int32)
    audio = jnp.asarray(rng.standard_normal((B, H, AUDC)), jnp.float32)
    full = np.asarray(_logits(model, variables, tokens, label, audio))

    apply = lambda method, *a: model.apply(variables, *a, method=method)
    emb_hist = jnp.zeros((B, 3, W, DIM))
    v_prev = jnp.zeros((LAYERS - 1, B, W, DIM))
    emb_all = apply(GatedPixelCNN.embed_tokens, tokens)  # (B,H,W,DIM)

    for i in range(H):
        h_vert_rows, v_prev = apply(GatedPixelCNN.row_step, emb_hist, v_prev,
                                    label, audio[:, i])
        # col 0: row embedding irrelevant at col 0
        row_emb = jnp.zeros((B, W, DIM))
        lg0 = np.asarray(apply(GatedPixelCNN.horiz_logits_row, h_vert_rows,
                               row_emb, label, audio[:, i]))
        np.testing.assert_allclose(lg0[:, 0], full[:, i, 0], atol=1e-4)
        # col 1: with true token embedding at col 0
        row_emb = row_emb.at[:, 0].set(emb_all[:, i, 0])
        lg1 = np.asarray(apply(GatedPixelCNN.horiz_logits_row, h_vert_rows,
                               row_emb, label, audio[:, i]))
        np.testing.assert_allclose(lg1[:, 1], full[:, i, 1], atol=1e-4)
        emb_hist = jnp.concatenate([emb_hist[:, 1:], emb_all[:, i][:, None]], axis=1)


def test_sample_tokens_shapes_and_determinism(model_and_vars):
    model, variables = model_and_vars
    B, H = 2, 8
    audio = jnp.asarray(np.random.default_rng(3).standard_normal((B, H, AUDC)),
                        jnp.float32)
    label = jnp.zeros((B,), jnp.int32)
    t1 = sample_tokens(model, variables, label, audio, jax.random.PRNGKey(7))
    t2 = sample_tokens(model, variables, label, audio, jax.random.PRNGKey(7))
    t3 = sample_tokens(model, variables, label, audio, jax.random.PRNGKey(8))
    assert t1.shape == (B, H, 2)
    assert t1.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    assert np.any(np.asarray(t1) != np.asarray(t3))
    assert np.all(np.asarray(t1) >= 0) and np.all(np.asarray(t1) < K)


def test_optimized_sampler_equals_reference(model_and_vars):
    """The per-column optimized sampler must produce the SAME tokens as the
    straightforward full-row sampler for the same rng."""
    model, variables = model_and_vars
    B, H = 2, 9
    rng = np.random.default_rng(11)
    audio = jnp.asarray(rng.standard_normal((B, H, AUDC)), jnp.float32)
    label = jnp.asarray([1, 3], jnp.int32)
    for seed in (0, 1, 2):
        k = jax.random.PRNGKey(seed)
        t_ref = sample_tokens_reference(model, variables, label, audio, k)
        t_opt = sample_tokens(model, variables, label, audio, k)
        np.testing.assert_array_equal(np.asarray(t_opt), np.asarray(t_ref))
    # with prefix continuation too
    prefix = jnp.asarray(rng.integers(0, K, (B, H, 2)), jnp.int32)
    k = jax.random.PRNGKey(5)
    t_ref = sample_tokens_reference(model, variables, label, audio, k,
                                    prefix_tokens=prefix, prefix_len=4)
    t_opt = sample_tokens(model, variables, label, audio, k,
                          prefix_tokens=prefix, prefix_len=4)
    np.testing.assert_array_equal(np.asarray(t_opt), np.asarray(t_ref))


def test_sample_tokens_prefix_teacher_forcing(model_and_vars):
    model, variables = model_and_vars
    B, H, h0 = 1, 8, 3
    audio = jnp.asarray(np.random.default_rng(4).standard_normal((B, H, AUDC)),
                        jnp.float32)
    label = jnp.zeros((B,), jnp.int32)
    prefix = jnp.asarray(np.random.default_rng(5).integers(0, K, (B, H, 2)),
                         jnp.int32)
    out = sample_tokens(model, variables, label, audio, jax.random.PRNGKey(0),
                        prefix_tokens=prefix, prefix_len=h0)
    np.testing.assert_array_equal(np.asarray(out[:, :h0]), np.asarray(prefix[:, :h0]))


def test_precomputed_noise_matches_inscan_categorical(model_and_vars,
                                                      monkeypatch):
    """The batched upfront gumbel (one threefry program) must produce
    BITWISE the tokens of per-row in-scan `jax.random.categorical` calls:
    categorical(k, logits) IS argmax(logits + gumbel(k, logits.shape)),
    and both paths use the identical key tree (split(rng, H) then
    split(row_key)).  Forcing the budget to 0 selects the in-scan path."""
    import talkshow_tpu.models.pixelcnn as pc

    model, variables = model_and_vars
    B, H = 3, 7
    rng = np.random.default_rng(23)
    audio = jnp.asarray(rng.standard_normal((B, H, AUDC)), jnp.float32)
    label = jnp.asarray([0, 2, 1], jnp.int32)
    prefix = jnp.asarray(rng.integers(0, K, (B, H, 2)), jnp.int32)
    for seed, plen in ((0, 0), (4, 0), (9, 3)):
        k = jax.random.PRNGKey(seed)
        t_pre = sample_tokens_reference(model, variables, label, audio, k,
                                        prefix_tokens=prefix, prefix_len=plen)
        monkeypatch.setattr(pc, "NOISE_PRECOMPUTE_BUDGET", 0)
        t_scan = sample_tokens_reference(model, variables, label, audio, k,
                                         prefix_tokens=prefix,
                                         prefix_len=plen)
        monkeypatch.undo()
        np.testing.assert_array_equal(np.asarray(t_pre), np.asarray(t_scan))
