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


def test_folded_pixel_step_trains():
    """make_body_pixel_step(folded=True): one step runs, loss finite, and
    the eval-mode logits of the updated params still match canonical."""
    from talkshow_tpu.models.vqvae import VQVAE, AudioEncoder
    from talkshow_tpu.ops import vq as vq_ops
    from talkshow_tpu.train import steps as tsteps

    T = 16
    vq_body, vq_hand = VQVAE(in_dim=39, num_hiddens=32), VQVAE(in_dim=90,
                                                               num_hiddens=32)
    r = jax.random.split(jax.random.PRNGKey(0), 4)
    st_b = vq_ops.init_vq_state(r[0], 2048, vq_body.embedding_dim)
    st_h = vq_ops.init_vq_state(r[1], 2048, vq_hand.embedding_dim)
    frozen = {"body": vq_body.init(r[2], jnp.zeros((1, T, 39)), st_b),
              "hand": vq_hand.init(r[3], jnp.zeros((1, T, 90)), st_h)}
    prior = GatedPixelCNN(input_dim=2048, dim=32, n_layers=3, n_classes=4)
    audio_enc = AudioEncoder(num_hiddens=32)
    init_s, step = tsteps.make_body_pixel_step(
        prior, audio_enc, vq_body, vq_hand, frozen,
        {"body": st_b, "hand": st_h}, folded=True)
    state = init_s(jax.random.PRNGKey(1), window=T)
    rng = np.random.default_rng(0)
    batch = {"poses": jnp.asarray(rng.standard_normal((4, T, 129)) * 0.2,
                                  jnp.float32),
             "aud_feat": jnp.asarray(rng.standard_normal((4, T, 64)),
                                     jnp.float32),
             "speaker": jnp.asarray([0, 1, 2, 3], jnp.int32)}
    state2, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["ce_loss"]))
    assert float(metrics["grad"]) > 0
    # updated params stay layout-compatible with the canonical forward
    toks = jnp.zeros((2, T // 4, 2), jnp.int32)
    aud = jnp.zeros((2, T // 4, 32))
    lab = jnp.zeros((2,), jnp.int32)
    ref = prior.apply({"params": state2.params["prior"]}, toks, lab, aud, False)
    out = folded_logits(prior, state2.params["prior"], toks, lab, aud)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=1e-5)


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
