"""Parity of the JAX wav2vec2 encoder vs HF transformers (random init)."""
import numpy as np
import jax
import pytest
import torch

from talkshow_tpu.convert.wav2vec import config_from_hf, convert_wav2vec2
from talkshow_tpu.models.wav2vec import Wav2Vec2Encoder

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def small_pair():
    from transformers import Wav2Vec2Config as HFConfig
    from transformers import Wav2Vec2Model as HFModel

    hf_cfg = HFConfig(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        conv_dim=[16, 16, 16],
        conv_kernel=[10, 3, 2],
        conv_stride=[5, 2, 2],
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=False,
        feat_extract_norm="group",
        conv_bias=False,
        apply_spec_augment=False,
    )
    torch.manual_seed(0)
    hf = HFModel(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg)
    model = Wav2Vec2Encoder(cfg)
    params = convert_wav2vec2(hf.state_dict(), cfg)
    return hf, model, params


def test_feature_extractor_parity(small_pair):
    hf, model, params = small_pair
    x = torch.randn(2, 3200)
    with torch.no_grad():
        ref = hf.feature_extractor(x).transpose(1, 2).numpy()  # (B, T', C)
    ours = model.apply({"params": params}, jax.numpy.asarray(x.numpy()),
                       method=Wav2Vec2Encoder.extract_features)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_full_encoder_parity(small_pair):
    """With frame_num == natural length, the mid-stack interpolation is a
    no-op and our forward must equal HF's vanilla forward."""
    hf, model, params = small_pair
    x = torch.randn(2, 3200)
    with torch.no_grad():
        natural_t = hf.feature_extractor(x).shape[-1]
        ref = hf(x).last_hidden_state.numpy()
    ours = model.apply({"params": params}, jax.numpy.asarray(x.numpy()), natural_t)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-4)


def test_interpolated_length(small_pair):
    _, model, params = small_pair
    x = np.random.default_rng(0).standard_normal((1, 3200)).astype(np.float32)
    out = model.apply({"params": params}, jax.numpy.asarray(x), 30)
    assert out.shape[1] == 30


def test_face_bf16_compute_close_to_f32():
    """TPU inference runs the wav2vec/face stage in bf16 (params f32,
    per-op casts; norm stats + softmax stay f32). The outputs must stay
    within bf16 rounding of the f32 path — and must actually differ,
    proving the cast is engaged (VERDICT r2 #1)."""
    import jax.numpy as jnp
    from talkshow_tpu.pipeline import Pipeline
    from talkshow_tpu.models.wav2vec import Wav2Vec2Config

    cfg = Wav2Vec2Config(hidden_size=32, num_layers=2, num_heads=4,
                         intermediate_size=64, conv_dim=(16, 16),
                         conv_kernel=(10, 3), conv_stride=(5, 2),
                         num_conv_pos_embeddings=16,
                         num_conv_pos_embedding_groups=4)
    pipe = Pipeline.create(0, wav2vec_cfg=cfg, num_hiddens=64, pixel_dim=16,
                           pixel_layers=3, code_num=64, face_dtype=None)
    wav = (np.random.default_rng(0).standard_normal(16000) * 0.1
           ).astype(np.float32)
    f32 = np.asarray(pipe.generate_face(wav))
    b16 = np.asarray(pipe.with_face_dtype(jnp.bfloat16).generate_face(wav))
    assert b16.dtype == np.float32          # heads stay f32
    scale = np.abs(f32).std()
    assert np.abs(f32 - b16).max() < 0.08 * max(scale, 1.0)
    assert np.abs(f32 - b16).max() > 0     # bf16 actually engaged
    # round-trip back to f32 restores bit-parity
    back = np.asarray(pipe.with_face_dtype(jnp.bfloat16)
                      .with_face_dtype(None).generate_face(wav))
    np.testing.assert_array_equal(back, f32)


def test_fused_encoder_layers_match_flax(small_pair):
    """The fused Pallas transformer-layer kernel (interpret mode, f32)
    must reproduce the flax layer stack, unmasked and masked."""
    import jax.numpy as jnp
    from talkshow_tpu.models.wav2vec_pallas import encoder_layers_fused
    from talkshow_tpu.models.wav2vec import Wav2Vec2Encoder

    _, model, params = small_pair
    x = torch.randn(2, 3200).numpy()
    frames = 6

    ref = model.apply({"params": params}, jnp.asarray(x), frames)
    pre = model.apply({"params": params}, jnp.asarray(x), frames,
                      method=Wav2Vec2Encoder.pre_layers)
    out = encoder_layers_fused(model.cfg, params, pre,
                               dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # masked/bucketed variant: padded batch, per-sample valid lengths
    vs = np.array([3200, 2400], np.int32)
    vf = np.array([6, 4], np.int32)
    xp = x.copy()
    xp[1, 2400:] = 0.0
    ref_m = model.apply({"params": params}, jnp.asarray(xp), frames,
                        valid_samples=jnp.asarray(vs),
                        valid_frames=jnp.asarray(vf))
    pre_m = model.apply({"params": params}, jnp.asarray(xp), frames,
                        valid_samples=jnp.asarray(vs),
                        valid_frames=jnp.asarray(vf),
                        method=Wav2Vec2Encoder.pre_layers)
    out_m = encoder_layers_fused(model.cfg, params, pre_m,
                                 valid_frames=jnp.asarray(vf),
                                 dtype=jnp.float32, interpret=True)
    # real frames equal; padded frames are don't-care
    np.testing.assert_allclose(np.asarray(out_m)[0, :6],
                               np.asarray(ref_m)[0, :6], atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_m)[1, :4],
                               np.asarray(ref_m)[1, :4], atol=2e-5)


def test_face_apply_fused_matches_flax():
    """face_apply_fused (fused transformer path) == FaceGenerator.apply."""
    import jax
    import jax.numpy as jnp
    from talkshow_tpu.models.face import FaceGenerator
    from talkshow_tpu.models.wav2vec import Wav2Vec2Config
    from talkshow_tpu.models.wav2vec_pallas import face_apply_fused

    cfg = Wav2Vec2Config(hidden_size=32, num_layers=2, num_heads=4,
                         intermediate_size=64, conv_dim=(16, 16),
                         conv_kernel=(10, 3), conv_stride=(5, 2),
                         num_conv_pos_embeddings=16,
                         num_conv_pos_embedding_groups=4)
    face = FaceGenerator(wav2vec_cfg=cfg)
    fv = face.init(jax.random.PRNGKey(0), jnp.zeros((1, 3200)),
                   jnp.zeros((1, 4)), 6)
    wav = jnp.asarray((np.random.default_rng(1).standard_normal((1, 16000))
                       * 0.1).astype(np.float32))
    onehot = jnp.zeros((1, 4))
    ref = face.apply(fv, wav, onehot, 30)
    out = face_apply_fused(face, fv, wav, onehot, 30,
                           dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # masked/bucketed variant (B=2, second request padded): real frames
    # must equal the flax masked program.  Regression: from_features once
    # dropped the frame mask, so padded frames leaked into real frames
    # through the conv middle/heads receptive field.
    wavp = jnp.concatenate([wav, wav], 0).at[1, 9600:].set(0.0)
    oh2 = jnp.zeros((2, 4))
    vs = jnp.asarray([16000, 9600], jnp.int32)
    vf = jnp.asarray([30, 18], jnp.int32)
    ref_m = face.apply(fv, wavp, oh2, 30, valid_samples=vs, valid_frames=vf)
    out_m = face_apply_fused(face, fv, wavp, oh2, 30,
                             valid_samples=vs, valid_frames=vf,
                             dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out_m)[0, :30],
                               np.asarray(ref_m)[0, :30], atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_m)[1, :18],
                               np.asarray(ref_m)[1, :18], atol=2e-5)


@pytest.mark.parametrize("ks,ss,dims", [
    ((10, 3), (5, 2), (16, 16)),              # tiny: G=2
    ((10, 3, 2), (5, 2, 2), (24, 24, 24)),    # k2 tail: G=4
    ((10, 3, 3, 2), (5, 2, 2, 2), (16,) * 4),  # G=8
])
def test_fused_extractor_matches_flax(ks, ss, dims):
    """Polyphase fused conv extractor == flax FeatureExtractor (f32,
    interpret mode), across kernel/stride families."""
    import jax
    import jax.numpy as jnp
    from talkshow_tpu.models.wav2vec import Wav2Vec2Config, Wav2Vec2Encoder
    from talkshow_tpu.models.wav2vec_pallas import extractor_fused

    cfg = Wav2Vec2Config(hidden_size=32, num_layers=1, num_heads=4,
                         intermediate_size=64, conv_dim=dims,
                         conv_kernel=ks, conv_stride=ss,
                         num_conv_pos_embeddings=16,
                         num_conv_pos_embedding_groups=4)
    model = Wav2Vec2Encoder(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3200)), 6)
    x = jnp.asarray((np.random.default_rng(0).standard_normal((2, 7000))
                     * 0.5).astype(np.float32))
    ref = model.apply(v, x, method=Wav2Vec2Encoder.extract_features)
    out = extractor_fused(cfg, v["params"], x, dtype=jnp.float32,
                          interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_extractor_base_config_shapes():
    """Full base-960h conv family (G=64) at a short waveform: shape and
    value agreement (f32 interpret)."""
    import jax
    import jax.numpy as jnp
    from talkshow_tpu.models.wav2vec import Wav2Vec2Config, Wav2Vec2Encoder
    from talkshow_tpu.models.wav2vec_pallas import extractor_fused

    cfg = Wav2Vec2Config(num_layers=1)        # conv stack is full-size
    model = Wav2Vec2Encoder(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3200)), 6)
    x = jnp.asarray((np.random.default_rng(1).standard_normal((1, 16000))
                     * 0.3).astype(np.float32))
    ref = model.apply(v, x, method=Wav2Vec2Encoder.extract_features)
    out = extractor_fused(cfg, v["params"], x, dtype=jnp.float32,
                          interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)
