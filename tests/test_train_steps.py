"""Smoke + convergence sanity for the jitted train steps (tiny models)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from talkshow_tpu.models.pixelcnn import GatedPixelCNN
from talkshow_tpu.models.vqvae import VQVAE, AudioEncoder
from talkshow_tpu.ops import vq as vq_ops
from talkshow_tpu.train import steps as tsteps

W = 8  # tiny window (2 token rows)


@pytest.fixture(scope="module")
def tiny_vq():
    return (VQVAE(in_dim=39, num_hiddens=64),
            VQVAE(in_dim=90, num_hiddens=64))


def test_body_vq_step_decreases_loss(tiny_vq):
    vq_body, vq_hand = tiny_vq
    init_state, step = tsteps.make_body_vq_step(vq_body, vq_hand,
                                                learning_rate=1e-3)
    state = init_state(jax.random.PRNGKey(0), window=W)
    rng = np.random.default_rng(0)
    batch = {"poses": jnp.asarray(rng.standard_normal((4, W, 129)) * 0.1,
                                  jnp.float32)}
    state, m0 = step(state, batch)
    for _ in range(10):
        state, m = step(state, batch)
    assert float(m["body_rec"]) < float(m0["body_rec"])
    assert np.isfinite(float(m["hand_commit"]))
    assert int(state.step) == 11


def test_body_pixel_step_runs_and_learns(tiny_vq):
    vq_body, vq_hand = tiny_vq
    r = jax.random.split(jax.random.PRNGKey(1), 4)
    st_b = vq_ops.init_vq_state(r[0], 64, 64)
    st_h = vq_ops.init_vq_state(r[1], 64, 64)
    vb = vq_body.init(r[2], jnp.zeros((1, W, 39)), st_b)
    vh = vq_hand.init(r[3], jnp.zeros((1, W, 90)), st_h)

    audio_enc = AudioEncoder(num_hiddens=32)
    prior = GatedPixelCNN(input_dim=64, dim=16, n_layers=3, audio=True,
                          audio_channels=32)
    init_state, step = tsteps.make_body_pixel_step(
        prior, audio_enc, vq_body, vq_hand,
        {"body": vb, "hand": vh}, {"body": st_b, "hand": st_h},
        learning_rate=1e-3)
    state = init_state(jax.random.PRNGKey(2), window=W)
    rng = np.random.default_rng(1)
    batch = {
        "poses": jnp.asarray(rng.standard_normal((4, W, 129)) * 0.1, jnp.float32),
        "aud_feat": jnp.asarray(rng.standard_normal((4, W, 64)), jnp.float32),
        "speaker": jnp.asarray([0, 1, 2, 3], jnp.int32),
    }
    key = jax.random.PRNGKey(3)
    state, m0 = step(state, batch, key)
    for i in range(15):
        state, m = step(state, batch, jax.random.fold_in(key, i))
    assert float(m["ce_loss"]) < float(m0["ce_loss"])
    assert np.isfinite(float(m["grad"]))


def test_pixel_step_precomputed_tokens_equivalent(tiny_vq):
    """batch['tokens'] (the trainer's frozen-VQ token cache) must make the
    step numerically identical to the in-step encode — the encoder is
    frozen and deterministic."""
    vq_body, vq_hand = tiny_vq
    r = jax.random.split(jax.random.PRNGKey(11), 4)
    st_b = vq_ops.init_vq_state(r[0], 64, 64)
    st_h = vq_ops.init_vq_state(r[1], 64, 64)
    vb = vq_body.init(r[2], jnp.zeros((1, W, 39)), st_b)
    vh = vq_hand.init(r[3], jnp.zeros((1, W, 90)), st_h)
    frozen_v = {"body": vb, "hand": vh}
    frozen_s = {"body": st_b, "hand": st_h}

    audio_enc = AudioEncoder(num_hiddens=32)
    prior = GatedPixelCNN(input_dim=64, dim=16, n_layers=3, audio=True,
                          audio_channels=32)
    init_state, step = tsteps.make_body_pixel_step(
        prior, audio_enc, vq_body, vq_hand, frozen_v, frozen_s)
    state = init_state(jax.random.PRNGKey(2), window=W)
    rng = np.random.default_rng(12)
    batch = {
        "poses": jnp.asarray(rng.standard_normal((4, W, 129)) * 0.1, jnp.float32),
        "aud_feat": jnp.asarray(rng.standard_normal((4, W, 64)), jnp.float32),
        "speaker": jnp.asarray([0, 1, 2, 3], jnp.int32),
    }
    enc = tsteps.make_token_encoder(vq_body, vq_hand, frozen_v, frozen_s)
    key = jax.random.PRNGKey(13)
    s1, m1 = step(state, batch, key)
    s2, m2 = step(state, dict(batch, tokens=enc(batch["poses"])), key)
    np.testing.assert_allclose(float(m1["ce_loss"]), float(m2["ce_loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_trainer_token_cache_matches_uncached(tmp_path):
    """Trainer.token_encoder: 2 epochs with the per-window token cache end
    in the same params as the uncached run (same seeds), and the cache is
    actually populated."""
    from talkshow_tpu.config import body_vq_config
    from talkshow_tpu.data.dataset import synthetic_dataset
    from talkshow_tpu.train.trainer import Trainer

    cfg = body_vq_config()
    cfg.train.batch_size = 4
    cfg.train.epochs = 2
    cfg.log.print_every = 50
    cfg.log.save_every = 99
    cfg.data.pose.generate_length = 16

    vq_body = VQVAE(in_dim=39, num_hiddens=64)
    vq_hand = VQVAE(in_dim=90, num_hiddens=64)
    r = jax.random.split(jax.random.PRNGKey(21), 4)
    st_b = vq_ops.init_vq_state(r[0], 64, 64)
    st_h = vq_ops.init_vq_state(r[1], 64, 64)
    vb = vq_body.init(r[2], jnp.zeros((1, 16, 39)), st_b)
    vh = vq_hand.init(r[3], jnp.zeros((1, 16, 90)), st_h)
    frozen_v = {"body": vb, "hand": vh}
    frozen_s = {"body": st_b, "hand": st_h}
    audio_enc = AudioEncoder(num_hiddens=32)
    prior = GatedPixelCNN(input_dim=64, dim=16, n_layers=3, audio=True,
                          audio_channels=32)

    def run(use_cache, run_dir):
        ds = synthetic_dataset(num_clips=2, frames=60)
        ds.generate_length = 16
        init_state, step = tsteps.make_body_pixel_step(
            prior, audio_enc, vq_body, vq_hand, frozen_v, frozen_s)
        enc = tsteps.make_token_encoder(vq_body, vq_hand, frozen_v, frozen_s) \
            if use_cache else None
        tr = Trainer(cfg, ds, init_state, step, needs_rng=True,
                     run_dir=run_dir, token_encoder=enc).setup()
        tr.train()
        return tr

    tr_c = run(True, str(tmp_path / "cached"))
    tr_u = run(False, str(tmp_path / "uncached"))
    assert len(tr_c._token_cache) > 0
    for a, b in zip(jax.tree_util.tree_leaves(tr_c.state.params),
                    jax.tree_util.tree_leaves(tr_u.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_pixel_step_bf16_mixed_precision(tiny_vq):
    """GatedPixelCNN(dtype=bf16): teacher-forced logits track the f32
    program on the SAME params, and the train step keeps f32 master params
    with a finite loss — the opt-in mixed-precision training path."""
    vq_body, vq_hand = tiny_vq
    r = jax.random.split(jax.random.PRNGKey(7), 4)
    st_b = vq_ops.init_vq_state(r[0], 64, 64)
    st_h = vq_ops.init_vq_state(r[1], 64, 64)
    vb = vq_body.init(r[2], jnp.zeros((1, W, 39)), st_b)
    vh = vq_hand.init(r[3], jnp.zeros((1, W, 90)), st_h)

    kw = dict(input_dim=64, dim=16, n_layers=3, audio=True, audio_channels=32)
    prior32 = GatedPixelCNN(**kw)
    prior16 = GatedPixelCNN(dtype=jnp.bfloat16, **kw)
    variables = prior32.init(jax.random.PRNGKey(8),
                             jnp.zeros((1, 2, 2), jnp.int32),
                             jnp.zeros((1,), jnp.int32),
                             jnp.zeros((1, 2, 32)))
    rng = np.random.default_rng(9)
    tokens = jnp.asarray(rng.integers(0, 64, (4, 2, 2)), jnp.int32)
    label = jnp.asarray([0, 1, 2, 3], jnp.int32)
    audio = jnp.asarray(rng.standard_normal((4, 2, 32)), jnp.float32)
    lg32 = prior32.apply(variables, tokens, label, audio)
    lg16 = prior16.apply(variables, tokens, label, audio)
    assert lg16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(lg16, np.float32), np.asarray(lg32),
                               rtol=0, atol=0.05)

    audio_enc = AudioEncoder(num_hiddens=32)
    init_state, step = tsteps.make_body_pixel_step(
        prior16, audio_enc, vq_body, vq_hand,
        {"body": vb, "hand": vh}, {"body": st_b, "hand": st_h},
        learning_rate=1e-3)
    state = init_state(jax.random.PRNGKey(2), window=W)
    assert all(x.dtype == jnp.float32 for x in
               jax.tree_util.tree_leaves(state.params["prior"]))
    batch = {
        "poses": jnp.asarray(rng.standard_normal((4, W, 129)) * 0.1, jnp.float32),
        "aud_feat": jnp.asarray(rng.standard_normal((4, W, 64)), jnp.float32),
        "speaker": label,
    }
    key = jax.random.PRNGKey(3)
    state, m0 = step(state, batch, key)
    for i in range(15):
        state, m = step(state, batch, jax.random.fold_in(key, i))
    assert float(m["ce_loss"]) < float(m0["ce_loss"])
    assert np.isfinite(float(m["grad"]))
    assert all(x.dtype == jnp.float32 for x in
               jax.tree_util.tree_leaves(state.params["prior"]))


def test_face_step_bf16_runs():
    """make_face_step on a Wav2Vec2Config(dtype=bf16) model: loss finite
    and decreasing, master params stay f32."""
    from talkshow_tpu.models.face import FaceGenerator
    from talkshow_tpu.models.wav2vec import Wav2Vec2Config

    cfg = Wav2Vec2Config(hidden_size=32, num_layers=1, num_heads=4,
                         intermediate_size=64, conv_dim=(16, 16),
                         conv_kernel=(10, 3), conv_stride=(5, 2),
                         num_conv_pos_embeddings=16,
                         num_conv_pos_embedding_groups=4,
                         dtype=jnp.bfloat16)
    face = FaceGenerator(wav2vec_cfg=cfg)
    init_state, step = tsteps.make_face_step(face, learning_rate=1e-3, window=6)
    state = init_state(jax.random.PRNGKey(0), samples_per_window=3200)
    rng = np.random.default_rng(4)
    batch = {
        "waveform": jnp.asarray(rng.standard_normal((2, 3200)), jnp.float32),
        "id_onehot": jnp.eye(4)[jnp.asarray([0, 1])],
        "gt": jnp.asarray(rng.standard_normal((2, 6, 265)) * 0.1, jnp.float32),
    }
    key = jax.random.PRNGKey(5)
    state, m0 = step(state, batch, key)
    for i in range(5):
        state, m = step(state, batch, jax.random.fold_in(key, i))
    assert float(m["loss"]) < float(m0["loss"])
    assert all(x.dtype == jnp.float32 for x in
               jax.tree_util.tree_leaves(state.params))


def test_face_step_runs_and_freezes_cnn():
    from talkshow_tpu.models.face import FaceGenerator
    from talkshow_tpu.models.wav2vec import Wav2Vec2Config

    cfg = Wav2Vec2Config(hidden_size=32, num_layers=1, num_heads=4,
                         intermediate_size=64, conv_dim=(16, 16),
                         conv_kernel=(10, 3), conv_stride=(5, 2),
                         num_conv_pos_embeddings=16,
                         num_conv_pos_embedding_groups=4)
    face = FaceGenerator(wav2vec_cfg=cfg)
    init_state, step = tsteps.make_face_step(face, learning_rate=1e-3, window=6)
    state = init_state(jax.random.PRNGKey(0), samples_per_window=3200)
    cnn_before = jax.tree_util.tree_leaves(
        state.params["audio_encoder"]["feature_extractor"])[0].copy()

    rng = np.random.default_rng(2)
    batch = {
        "waveform": jnp.asarray(rng.standard_normal((2, 3200)), jnp.float32),
        "id_onehot": jnp.eye(4)[jnp.asarray([0, 1])],
        "gt": jnp.asarray(rng.standard_normal((2, 6, 265)) * 0.1, jnp.float32),
    }
    key = jax.random.PRNGKey(5)
    state, m0 = step(state, batch, key)
    for i in range(5):
        state, m = step(state, batch, jax.random.fold_in(key, i))
    assert float(m["loss"]) < float(m0["loss"])
    cnn_after = jax.tree_util.tree_leaves(
        state.params["audio_encoder"]["feature_extractor"])[0]
    np.testing.assert_array_equal(np.asarray(cnn_before), np.asarray(cnn_after))


def test_face_freeze_extractor_grads_match_full_backward():
    """stop_gradient at the frozen CNN output (train/steps.py) must leave
    every trainable-param gradient bit-identical to the full backward —
    the skipped extractor backward was dead compute (its grads were zeroed
    by optax.set_to_zero anyway)."""
    from talkshow_tpu.models.face import FaceGenerator
    from talkshow_tpu.models.wav2vec import Wav2Vec2Config

    cfg = Wav2Vec2Config(hidden_size=32, num_layers=1, num_heads=4,
                         intermediate_size=64, conv_dim=(16, 16),
                         conv_kernel=(10, 3), conv_stride=(5, 2),
                         num_conv_pos_embeddings=16,
                         num_conv_pos_embedding_groups=4)
    face = FaceGenerator(wav2vec_cfg=cfg)
    variables = face.init(jax.random.PRNGKey(0), jnp.zeros((1, 3200)),
                          jnp.zeros((1, 4)), 6)
    rng = np.random.default_rng(3)
    wav = jnp.asarray(rng.standard_normal((2, 3200)), jnp.float32)
    ids = jnp.eye(4)[jnp.asarray([0, 1])]
    gt = jnp.asarray(rng.standard_normal((2, 6, 106)) * 0.1, jnp.float32)

    def loss(params, freeze):
        pred = face.apply({"params": params}, wav, ids, 6, False,
                          freeze_extractor=freeze)
        return jnp.mean(jnp.abs(pred[..., :6] - gt[..., :6])) + \
            jnp.mean((pred[..., -100:] - gt[..., -100:]) ** 2)

    g_full = jax.grad(loss)(variables["params"], False)
    g_stop = jax.grad(loss)(variables["params"], True)

    # extractor grads: nonzero in the full backward, exactly zero stopped
    fx_full = jax.tree_util.tree_leaves(
        g_full["audio_encoder"]["feature_extractor"])
    fx_stop = jax.tree_util.tree_leaves(
        g_stop["audio_encoder"]["feature_extractor"])
    assert any(float(jnp.abs(g).max()) > 0 for g in fx_full)
    assert all(float(jnp.abs(g).max()) == 0 for g in fx_stop)

    # every other grad is bit-identical
    def drop_fx(tree):
        t = jax.tree_util.tree_map(lambda x: x, tree)  # shallow-ish copy
        del t["audio_encoder"]["feature_extractor"]
        return t
    a, b = drop_fx(g_full), drop_fx(g_stop)
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_dryrun_multichip_8():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_body_vq_step_6d_variant():
    """convert_to_6d training: poses (B, T, 330) -> conv 258 = 78 + 180."""
    vq_body = VQVAE(in_dim=78, num_hiddens=64)
    vq_hand = VQVAE(in_dim=180, num_hiddens=64)
    init_state, step = tsteps.make_body_vq_step(vq_body, vq_hand,
                                                learning_rate=1e-3, rep6d=True)
    state = init_state(jax.random.PRNGKey(0), window=W)
    rng = np.random.default_rng(5)
    batch = {"poses": jnp.asarray(rng.standard_normal((2, W, 330)) * 0.1,
                                  jnp.float32)}
    state, m0 = step(state, batch)
    for _ in range(4):
        state, m = step(state, batch)
    assert float(m["body_rec"]) < float(m0["body_rec"])
    assert np.isfinite(float(m["hand_rec"]))


def test_nan_batch_skips_update_and_counts(tiny_vq):
    """A NaN batch must leave params AND inner optimizer state untouched,
    and bump the nonfinite counter (VERDICT r1 weak #3)."""
    vq_body, vq_hand = tiny_vq
    init_state, step = tsteps.make_body_vq_step(vq_body, vq_hand,
                                                learning_rate=1e-3)
    state = init_state(jax.random.PRNGKey(0), window=W)
    rng = np.random.default_rng(1)
    good = {"poses": jnp.asarray(rng.standard_normal((2, W, 129)) * 0.1,
                                 jnp.float32)}
    state, m = step(state, good)          # one clean step to warm moments
    assert int(m["nonfinite_skips"]) == 0

    bad = {"poses": good["poses"].at[0, 0, 0].set(jnp.nan)}
    before_params = jax.tree_util.tree_map(np.asarray, state.params)
    before_inner = jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x,
        state.opt_state["inner"])
    state, m = step(state, bad)
    assert int(m["nonfinite_skips"]) == 1
    after_params = jax.tree_util.tree_map(np.asarray, state.params)
    jax.tree_util.tree_map(np.testing.assert_array_equal,
                           before_params, after_params)
    after_inner = jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x,
        state.opt_state["inner"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b)
        if hasattr(a, "shape") else None, before_inner, after_inner)

    # recovery: the next clean step trains normally
    state, m = step(state, good)
    assert int(m["nonfinite_skips"]) == 1
    assert np.isfinite(float(m["body_rec"]))


def test_nan_batch_skips_pixel_and_face_stages(tiny_vq):
    from talkshow_tpu.models.face import FaceGenerator

    vq_body, vq_hand = tiny_vq
    r = jax.random.split(jax.random.PRNGKey(0), 4)
    st_b = vq_ops.init_vq_state(r[0], 64, vq_body.embedding_dim)
    st_h = vq_ops.init_vq_state(r[1], 64, vq_hand.embedding_dim)
    vb = vq_body.init(r[2], jnp.zeros((1, W, 39)), st_b)
    vh = vq_hand.init(r[3], jnp.zeros((1, W, 90)), st_h)
    prior = GatedPixelCNN(input_dim=64, dim=16, n_layers=2, audio=True,
                          audio_channels=32)
    audio_enc = AudioEncoder(num_hiddens=32)
    init_state, step = tsteps.make_body_pixel_step(
        prior, audio_enc, vq_body, vq_hand,
        frozen_vq_vars={"body": vb, "hand": vh},
        frozen_vq_states={"body": st_b, "hand": st_h})
    state = init_state(jax.random.PRNGKey(1), window=W)
    # NaN poses would be laundered into valid int tokens by the VQ argmin,
    # so inject into the audio features (which reach the grads directly)
    batch = {"poses": jnp.zeros((2, W, 129), jnp.float32),
             "aud_feat": jnp.full((2, W, 64), jnp.nan, jnp.float32),
             "speaker": jnp.zeros((2,), jnp.int32)}
    before = jax.tree_util.tree_map(np.asarray, state.params)
    state, m = step(state, batch, jax.random.PRNGKey(2))
    assert int(m["nonfinite_skips"]) == 1
    jax.tree_util.tree_map(
        np.testing.assert_array_equal, before,
        jax.tree_util.tree_map(np.asarray, state.params))

    face = FaceGenerator(num_classes=4)
    finit, fstep = tsteps.make_face_step(face, window=8)
    fstate = finit(jax.random.PRNGKey(3), window=8)
    fbatch = {"waveform": jnp.full((1, 8 * 16000 // 30), jnp.nan),
              "id_onehot": jnp.eye(4)[:1], "gt": jnp.zeros((1, 8, 106))}
    before = jax.tree_util.tree_map(np.asarray, fstate.params)
    fstate, fm = fstep(fstate, fbatch, jax.random.PRNGKey(4))
    assert int(fm["nonfinite_skips"]) == 1
    jax.tree_util.tree_map(
        np.testing.assert_array_equal, before,
        jax.tree_util.tree_map(np.asarray, fstate.params))
