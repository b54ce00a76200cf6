"""Column-folded training forward == canonical GatedPixelCNN forward."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from talkshow_tpu.models.pixelcnn import GatedPixelCNN
from talkshow_tpu.models.pixelcnn_folded import folded_logits


@pytest.mark.parametrize("dim,n_layers", [(32, 3), (64, 4)])
def test_folded_matches_canonical(dim, n_layers):
    model = GatedPixelCNN(input_dim=64, dim=dim, n_layers=n_layers,
                          n_classes=4, audio=True, audio_channels=16)
    B, H = 3, 11
    rng = jax.random.PRNGKey(0)
    tokens = jax.random.randint(rng, (B, H, 2), 0, 64)
    label = jnp.asarray([0, 2, 3], jnp.int32)
    audio = jax.random.normal(jax.random.fold_in(rng, 1), (B, H, 16))
    variables = model.init(jax.random.fold_in(rng, 2), tokens, label, audio)

    ref = model.apply(variables, tokens, label, audio, False)
    out = folded_logits(model, variables["params"], tokens, label, audio)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_folded_full_size_single_layer_cheap():
    """Reference widths (dim 256, K 2048) but few layers — checks the
    512-boundary head slicing at real channel counts."""
    model = GatedPixelCNN(input_dim=2048, dim=256, n_layers=2, n_classes=4)
    B, H = 2, 22
    rng = jax.random.PRNGKey(3)
    tokens = jax.random.randint(rng, (B, H, 2), 0, 2048)
    label = jnp.asarray([1, 0], jnp.int32)
    audio = jax.random.normal(jax.random.fold_in(rng, 1), (B, H, 256))
    variables = model.init(jax.random.fold_in(rng, 2), tokens, label, audio)
    ref = model.apply(variables, tokens, label, audio, False)
    out = folded_logits(model, variables["params"], tokens, label, audio)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=1e-5)


def test_folded_train_mode_runs_and_grads_flow():
    model = GatedPixelCNN(input_dim=32, dim=16, n_layers=3, n_classes=4,
                          audio_channels=8)
    B, H = 2, 6
    rng = jax.random.PRNGKey(0)
    tokens = jax.random.randint(rng, (B, H, 2), 0, 32)
    label = jnp.zeros((B,), jnp.int32)
    audio = jax.random.normal(rng, (B, H, 8))
    variables = model.init(jax.random.fold_in(rng, 2), tokens, label, audio)

    def loss(p):
        lg = folded_logits(model, p, tokens, label, audio, train=True,
                           dropout_rng=jax.random.PRNGKey(7))
        return jnp.mean(lg ** 2)

    g = jax.grad(loss)(variables["params"])
    norms = [float(jnp.linalg.norm(x)) for x in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(n) for n in norms)
    assert sum(n > 0 for n in norms) > len(norms) * 0.8
