"""Tests for rotation extras, losses, audio variants, causal VQ-VAE,
legacy S2G models, layer zoo, utils."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from talkshow_tpu import losses as L
from talkshow_tpu.models.causal_vqvae import CausalVQVAE
from talkshow_tpu.models.s2g_legacy import (FreeformS2G, S2GDiscriminator)
from talkshow_tpu.models.layers import SeqDecoder1D, SeqEncoder1D, UNet1D
from talkshow_tpu.ops import audio as A
from talkshow_tpu.ops import rotation as R
from talkshow_tpu.ops import vq as vq_ops
from talkshow_tpu import utils as U


# ----------------------------- rotation extras ------------------------------

def test_euler_roundtrip(rng):
    from scipy.spatial.transform import Rotation as S
    aa = rng.standard_normal((40, 3))
    m = S.from_rotvec(aa).as_matrix().astype(np.float64)
    for conv in ("XYZ", "ZYX", "YXZ"):
        e = R.matrix_to_euler_angles(jnp.asarray(m, jnp.float32), conv)
        m2 = np.asarray(R.euler_angles_to_matrix(e, conv))
        np.testing.assert_allclose(m2, m, atol=1e-4)


def test_quaternion_algebra(rng):
    from scipy.spatial.transform import Rotation as S
    aa = rng.standard_normal((30, 3))
    q_xyzw = S.from_rotvec(aa).as_quat()
    q = np.concatenate([q_xyzw[:, 3:], q_xyzw[:, :3]], 1)
    pts = rng.standard_normal((30, 3))
    ours = np.asarray(R.quaternion_apply(jnp.asarray(q), jnp.asarray(pts)))
    np.testing.assert_allclose(ours, S.from_rotvec(aa).apply(pts), atol=1e-5)
    # multiply == compose
    q2 = np.roll(q, 1, axis=0)
    prod = np.asarray(R.quaternion_raw_multiply(jnp.asarray(q), jnp.asarray(q2)))
    m_prod = np.asarray(R.quaternion_to_matrix(jnp.asarray(prod)))
    m_ref = (np.asarray(R.quaternion_to_matrix(jnp.asarray(q)))
             @ np.asarray(R.quaternion_to_matrix(jnp.asarray(q2))))
    np.testing.assert_allclose(m_prod, m_ref, atol=1e-5)
    # invert
    inv = R.quaternion_invert(jnp.asarray(q))
    ident = np.asarray(R.quaternion_raw_multiply(jnp.asarray(q), inv))
    np.testing.assert_allclose(ident[:, 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(ident[:, 1:], 0.0, atol=1e-5)


# ----------------------------- losses ---------------------------------------

def test_losses(rng):
    p = jnp.asarray(rng.standard_normal((2, 5, 4)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((2, 5, 4)), jnp.float32)
    assert float(L.keypoint_loss(p, p)) == 0.0
    assert float(L.l1_loss(p, p)) == 0.0
    assert float(L.velocity_loss(p, p)) == 0.0
    assert float(L.keypoint_loss(p, g)) > 0
    mu = jnp.zeros((3, 4)); lv = jnp.zeros((3, 4))
    assert abs(float(L.kl_loss(mu, lv))) < 1e-6
    assert float(L.kl_loss(mu + 1.0, lv, tolerance=0.1)) >= 0.1


# ----------------------------- audio variants --------------------------------

def test_mel_and_chunking():
    sr = 16000
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    mel = A.mel_spectrogram(jnp.asarray(x), sr, hop=534)
    assert mel.shape[1] == 256 and np.all(np.asarray(mel) >= 0)
    chunks = A.audio_chunking(jnp.asarray(x), frame_rate=30, chunk_size=sr)
    assert chunks.shape[1] == sr
    assert abs(chunks.shape[0] - 30) <= 2


def test_mfcc_psf_shape():
    x = np.random.default_rng(0).standard_normal(16000).astype(np.float32)
    feat = A.mfcc_psf(x, winstep=1.01 / 15)
    assert feat.shape[1] == 64
    assert np.all(np.isfinite(feat))


def test_smooth_geom():
    rng = np.random.default_rng(1)
    g = jnp.asarray(rng.standard_normal((30, 10, 3)), jnp.float32)
    s = A.smooth_geom(g)
    assert s.shape == g.shape
    # smoothing reduces temporal variation
    def tv(x):
        return float(jnp.mean(jnp.abs(jnp.diff(x, axis=0))))
    assert tv(s) < tv(g)
    mask = jnp.zeros(10).at[:5].set(1.0)
    sm = A.smooth_geom(g, mask)
    np.testing.assert_allclose(np.asarray(sm[:, 5:]), np.asarray(g[:, 5:]))


# ----------------------------- causal VQ-VAE ---------------------------------

def test_causal_vqvae_chunked_equals_full():
    model = CausalVQVAE(in_dim=12, num_hiddens=32)
    st = vq_ops.init_vq_state(jax.random.PRNGKey(0), 32, 64)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 12)),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), x, st)

    # full decode
    _, idx_full, _ = model.apply(variables, x, st, None,
                                 method=CausalVQVAE.encode_chunk)
    full, _ = model.apply(variables, idx_full, st, None,
                          method=CausalVQVAE.decode_chunk)
    # chunked decode with carried state
    outs, states = [], None
    for i in range(0, 4):
        chunk, states = model.apply(variables, idx_full[:, i:i + 1], st, states,
                                    method=CausalVQVAE.decode_chunk)
        outs.append(np.asarray(chunk))
    chunked = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(chunked, np.asarray(full), atol=1e-5)


def test_causal_encoder_is_causal():
    model = CausalVQVAE(in_dim=12, num_hiddens=32)
    st = vq_ops.init_vq_state(jax.random.PRNGKey(0), 32, 64)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 16, 12)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), x, st)

    def enc(v):
        z, _ = model.apply(variables, v, None,
                           method=CausalVQVAE.encode_latents)
        return np.asarray(z)

    z0 = enc(x)
    x2 = x.at[0, -1].add(10.0)  # perturb the LAST frame
    z1 = enc(x2)
    # all latent rows except the last must be identical
    np.testing.assert_allclose(z1[0, :-1], z0[0, :-1], atol=1e-5)
    assert np.abs(z1[0, -1] - z0[0, -1]).max() > 1e-4


# ----------------------------- legacy S2G -----------------------------------

def test_freeform_s2g_shapes():
    model = FreeformS2G(pose_dim=275, each_dim=(3, 113, 90, 69),
                        template_length=16, common_dim=64)
    spec = jnp.zeros((1, 32, 64))
    gt = jnp.zeros((1, 32, 275))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(4)},
        spec, gt, True, jax.random.PRNGKey(1))
    (out, template, mu, var), _ = model.apply(
        variables, spec, gt, True, jax.random.PRNGKey(2),
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(9)})
    assert out.shape == (1, 32, 275)
    assert template.shape == (1, 32, 16)
    # inference mode: random template
    out2, _, mu2, _ = model.apply(variables, spec, None, False,
                                  jax.random.PRNGKey(3))
    assert out2.shape == (1, 32, 275) and mu2 is None


def test_s2g_discriminator():
    d = S2GDiscriminator()
    x = jnp.zeros((2, 60, 275))
    v = d.init(jax.random.PRNGKey(0), x)
    y = d.apply(v, x)
    assert y.shape[0] == 2 and y.shape[-1] == 1


# ----------------------------- layer zoo ------------------------------------

def test_unet1d_and_seq_codecs():
    x = jnp.zeros((2, 32, 16))
    u = UNet1D(channels=8, out_channels=5)
    v = u.init(jax.random.PRNGKey(0), x)
    y = u.apply(v, x)
    assert y.shape == (2, 32, 5)

    e = SeqEncoder1D(hidden=16, out_dim=7)
    ve = e.init(jax.random.PRNGKey(1), x)
    z = e.apply(ve, x)
    assert z.shape == (2, 7)

    d = SeqDecoder1D(hidden=16, out_channels=4, length=20)
    vd = d.init(jax.random.PRNGKey(2), z)
    s = d.apply(vd, z)
    assert s.shape == (2, 20, 4)


# ----------------------------- utils -----------------------------------------

def test_skip_nonfinite_updates():
    tx = U.skip_nonfinite_updates(optax.sgd(0.1))
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    good = {"w": jnp.ones(3)}
    bad = {"w": jnp.asarray([1.0, jnp.nan, 1.0])}
    upd, state = tx.update(good, state, params)
    assert abs(float(upd["w"][0]) + 0.1) < 1e-6
    upd, state = tx.update(bad, state, params)
    np.testing.assert_allclose(np.asarray(upd["w"]), 0.0)
    assert int(state["nonfinite_count"]) == 1


def test_seed_everything_deterministic():
    r1, k1 = U.seed_everything(42)
    r2, k2 = U.seed_everything(42)
    assert r1.integers(100) == r2.integers(100)
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))


def test_seq_translator_rnn():
    from talkshow_tpu.models.layers import SeqTranslatorRNN
    m = SeqTranslatorRNN(hidden=16, out_channels=5)
    x = jnp.zeros((2, 12, 8))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (2, 12, 5)
    # recurrence: output at t depends on inputs <= t only
    x2 = x.at[0, -1].add(1.0)
    y2 = m.apply(v, x2)
    np.testing.assert_allclose(np.asarray(y2[0, :-2]), np.asarray(y[0, :-2]),
                               atol=1e-6)


def test_cast_floats_bf16_generation():
    from talkshow_tpu.utils import cast_floats
    from tests.test_pipeline_io import _tiny_pipe
    pipe = _tiny_pipe()
    body = pipe.body._replace(
        prior_vars=cast_floats(pipe.body.prior_vars),
        audio_enc_vars=cast_floats(pipe.body.audio_enc_vars))
    import talkshow_tpu.pipeline as P
    pipe2 = P.Pipeline(pipe.face_model, pipe.face_vars, body)
    feat = np.zeros((16, 64), np.float32)
    out = np.asarray(pipe2.generate_body(feat, 0))
    assert out.shape == (1, 16, 129) and np.isfinite(out).all()


def test_multihost_helpers_single_process():
    from talkshow_tpu.parallel import multihost as mh
    mh.initialize_multihost()  # no-op single process
    mesh = mh.global_mesh(dp=4, tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}
    batch = {"x": np.ones((8, 3), np.float32)}
    g = mh.make_global_batch(mesh, batch)
    assert g["x"].shape == (8, 3)
    from jax.sharding import PartitionSpec as P
    assert g["x"].sharding.spec == P("dp", None)


def test_prefetch_iter_order_and_exceptions():
    """Trainer's background batch prefetch: order-preserving and
    generator exceptions surface at the consuming site."""
    from talkshow_tpu.utils import prefetch_iter

    assert list(prefetch_iter(iter(range(100)), depth=3)) == list(range(100))
    assert list(prefetch_iter(iter([]), depth=2)) == []

    def boom():
        yield 1
        yield 2
        raise ValueError("producer failed")

    got = []
    try:
        for x in prefetch_iter(boom(), depth=2):
            got.append(x)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "producer failed" in str(e)
    assert got == [1, 2]
