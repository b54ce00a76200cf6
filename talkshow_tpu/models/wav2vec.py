"""wav2vec 2.0 encoder in flax (base architecture, HF-weight compatible).

JAX re-implementation of the customized Wav2Vec2Model the reference face
generator uses (nets/spg/wav2vec.py:73-143): CNN feature extractor ->
**linear interpolation 50 Hz -> 30 fps** (:64-70, applied between the
extractor and the feature projection) -> feature projection -> transformer
encoder with convolutional relative positional embeddings.

Architecture constants follow facebook/wav2vec2-base-960h
(feat_extract_norm='group', do_stable_layer_norm=False, conv_bias=False).
Weights convert from the HF state dict via convert/wav2vec (tested for
parity against `transformers` on a random-init model, so no downloads are
needed to validate numerics).

The whole thing is one jitted XLA program: the feature extractor is 7
VALID convs (MXU), attention over <=600 frames of width 768 is tiny, and
the 50->30 fps interpolation is a static gather+lerp inside the graph.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
from flax import linen as nn

import jax

from talkshow_tpu.models.layers import linear_interpolate, masked_linear_interpolate


@dataclass(frozen=True)
class Wav2Vec2Config:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: tuple = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: tuple = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: tuple = (5, 2, 2, 2, 2, 2, 2)
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5
    #: compute dtype for the conv/matmul-heavy ops (None = float32).
    #: Set jnp.bfloat16 for TPU inference: params stay f32, flax casts at
    #: each op; LayerNorm/GroupNorm statistics and attention softmax are
    #: kept in f32 regardless (force_fp32_for_softmax).
    dtype: type | None = None


class ChannelGroupNorm(nn.Module):
    """GroupNorm with one group per channel (= InstanceNorm over time),
    with optional per-example time masking for length-bucketed batches.

    The time axis enters the statistics, so appending padded frames would
    shift every real frame's normalization; masked statistics keep real
    frames bit-equal to the unpadded program (padded positions contribute
    exact zeros to the sums)."""
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mask=None):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        dtype_in = x.dtype
        x = x.astype(jnp.float32)   # stats in f32 under bf16 compute
        if mask is not None:
            mask = mask.astype(jnp.float32)
        if mask is None:
            mean = jnp.mean(x, axis=1, keepdims=True)
            var = jnp.mean((x - mean) ** 2, axis=1, keepdims=True)
        else:
            n = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
            mean = jnp.sum(x * mask, axis=1, keepdims=True) / n
            var = jnp.sum(((x - mean) ** 2) * mask, axis=1, keepdims=True) / n
        h = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        # back to the compute dtype: this is the LARGEST tensor in the
        # network (the extractor L0 output, (B, 31999, 512)); returning it
        # f32 under bf16 compute costs an extra f32 HBM round trip before
        # layer 1 (~2x the whole-extractor traffic at B=8)
        return (h * scale + bias).astype(dtype_in)


def conv_valid_length(num_samples, cfg: Wav2Vec2Config):
    """Valid (unpadded) feature length after the VALID conv stack; works on
    python ints and traced int arrays alike."""
    n = num_samples
    for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
        n = (n - k) // s + 1
    return n


class FeatureExtractor(nn.Module):
    """Raw waveform (B, T) -> (B, T', conv_dim[-1]); VALID convs, no bias.
    First layer followed by channel-wise GroupNorm (group per channel).

    valid_samples (B,) enables length-masked normalization: because the
    convs are VALID, feature frame j < valid_len depends only on real
    samples, so masking the norm statistics is sufficient for real-frame
    parity with the unpadded program."""
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x, valid_samples=None):
        h = x[:, :, None]  # (B, T, 1)
        n_valid = valid_samples
        for i, (dim, k, s) in enumerate(
                zip(self.cfg.conv_dim, self.cfg.conv_kernel, self.cfg.conv_stride)):
            h = nn.Conv(dim, (k,), (s,), padding="VALID", use_bias=False,
                        dtype=self.cfg.dtype, name=f"conv_{i}")(h)
            if n_valid is not None:
                n_valid = (n_valid - k) // s + 1
            if i == 0:
                mask = None
                if n_valid is not None:
                    mask = (jnp.arange(h.shape[1])[None, :, None]
                            < n_valid[:, None, None]).astype(h.dtype)
                h = ChannelGroupNorm(epsilon=self.cfg.layer_norm_eps,
                                     name="group_norm")(h, mask)
            h = nn.gelu(h, approximate=False)
        return h


class FeatureProjection(nn.Module):
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm(epsilon=self.cfg.layer_norm_eps, name="layer_norm")(x)
        return nn.Dense(self.cfg.hidden_size, dtype=self.cfg.dtype,
                        name="projection")(x)


class PositionalConvEmbedding(nn.Module):
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x):
        k = self.cfg.num_conv_pos_embeddings
        pad = k // 2
        h = nn.Conv(self.cfg.hidden_size, (k,), padding=[(pad, pad)],
                    feature_group_count=self.cfg.num_conv_pos_embedding_groups,
                    dtype=self.cfg.dtype, name="conv")(x)
        if k % 2 == 0:
            h = h[:, :-1]  # SamePad crop for even kernels
        return nn.gelu(h, approximate=False)


class EncoderLayer(nn.Module):
    """Post-norm transformer layer (do_stable_layer_norm=False)."""
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x, attn_mask=None):
        attn_out = nn.MultiHeadDotProductAttention(
            num_heads=self.cfg.num_heads,
            qkv_features=self.cfg.hidden_size,
            out_features=self.cfg.hidden_size,
            use_bias=True,
            dtype=self.cfg.dtype,
            force_fp32_for_softmax=True,
            name="attention",
        )(x, x, mask=attn_mask)
        x = nn.LayerNorm(epsilon=self.cfg.layer_norm_eps, name="layer_norm")(x + attn_out)
        h = nn.Dense(self.cfg.intermediate_size, dtype=self.cfg.dtype,
                     name="ffn_intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.cfg.hidden_size, dtype=self.cfg.dtype,
                     name="ffn_output")(h)
        return nn.LayerNorm(epsilon=self.cfg.layer_norm_eps, name="final_layer_norm")(x + h)


class Wav2Vec2Encoder(nn.Module):
    """Full stack with the reference's mid-stack 50->30 fps interpolation.

    __call__(waveform (B, T_samples), frame_num) -> (B, frame_num, hidden).
    frame_num must be static under jit (reference computes it as
    len(audio)*30//16000, nets/smplx_face.py:203).
    """
    cfg: Wav2Vec2Config = field(default_factory=Wav2Vec2Config)

    mask_time_prob: float = 0.05
    mask_time_length: int = 10

    def setup(self):
        self.feature_extractor = FeatureExtractor(self.cfg)
        self.feature_projection = FeatureProjection(self.cfg)
        self.pos_conv_embed = PositionalConvEmbedding(self.cfg)
        self.encoder_layer_norm = nn.LayerNorm(epsilon=self.cfg.layer_norm_eps)
        self.encoder_layers = [EncoderLayer(self.cfg, name=f"layers_{i}")
                               for i in range(self.cfg.num_layers)]
        self.masked_spec_embed = self.param(
            "masked_spec_embed",
            nn.initializers.uniform(scale=1.0), (self.cfg.hidden_size,))

    def _spec_augment(self, x):
        """SpecAugment-style time masking (train only): random spans of
        `mask_time_length` frames are replaced by the learned mask vector
        (reference nets/spg/wav2vec.py:109-119 / HF _compute_mask_indices,
        re-expressed with jax PRNG)."""
        import jax

        b, t, _ = x.shape
        num_masks = max(int(self.mask_time_prob * t / self.mask_time_length), 2)
        rng = self.make_rng("spec_augment")
        starts = jax.random.randint(
            rng, (b, num_masks), 0, max(t - self.mask_time_length, 1))
        pos = jnp.arange(t)[None, None, :]                       # (1,1,T)
        span = (pos >= starts[..., None]) & (pos < starts[..., None]
                                             + self.mask_time_length)
        mask = jnp.any(span, axis=1)                             # (B, T)
        return jnp.where(mask[..., None], self.masked_spec_embed, x)

    def mid_stack(self, feats, frame_num: int):
        """Extractor features (B, T50, C) -> pre-transformer hidden
        states: interpolation -> projection -> pos-conv -> LayerNorm.
        Unmasked inference path; lets the fused Pallas extractor
        (models/wav2vec_pallas.py) hand back into flax."""
        feats = linear_interpolate(feats, frame_num)
        x = self.feature_projection(feats)
        x = x + self.pos_conv_embed(x)
        return self.encoder_layer_norm(x)

    def pre_layers(self, waveform, frame_num: int, train: bool = False,
                   valid_samples=None, valid_frames=None,
                   freeze_extractor: bool = False):
        """Everything before the transformer layer stack: extractor ->
        50->30 fps interpolation -> projection -> [spec augment] ->
        pos-conv -> encoder LayerNorm.  Split out so the fused Pallas
        layer path (models/wav2vec_pallas.py) can take over from here.

        freeze_extractor=True stops gradients at the extractor output so
        the backward pass never differentiates the 7-conv cascade over the
        raw waveform — torch autograd skips it entirely when the CNN params
        have requires_grad=False (reference nets/smplx_face.py freezes the
        feature extractor), whereas optimizer-side masking alone would
        still pay the conv backward."""
        masked = valid_samples is not None
        feats = self.feature_extractor(
            waveform, valid_samples if masked else None)    # (B, T50, 512)
        if freeze_extractor:
            feats = jax.lax.stop_gradient(feats)
        if masked:
            in_valid = conv_valid_length(valid_samples, self.cfg)
            feat_mask = (jnp.arange(feats.shape[1])[None, :, None]
                         < in_valid[:, None, None]).astype(feats.dtype)
            feats = feats * feat_mask
            feats = masked_linear_interpolate(feats, frame_num, in_valid,
                                              valid_frames)
            frame_mask = (jnp.arange(frame_num)[None, :, None]
                          < valid_frames[:, None, None]).astype(feats.dtype)
        else:
            feats = linear_interpolate(feats, frame_num)    # 50 Hz -> 30 fps
            frame_mask = None
        x = self.feature_projection(feats)
        if train and self.mask_time_prob > 0 and self.has_rng("spec_augment"):
            x = self._spec_augment(x)
        if masked:
            # zero padded frames so the pos-conv's reach into the pad region
            # sees exactly the zeros the unpadded program's SAME padding has
            x = x * frame_mask
        x = x + self.pos_conv_embed(x)
        return self.encoder_layer_norm(x)

    def __call__(self, waveform, frame_num: int, train: bool = False,
                 valid_samples=None, valid_frames=None,
                 freeze_extractor: bool = False):
        """valid_samples/valid_frames (B,) int arrays enable the
        length-bucketed path: waveform/frame axes are padded to a bucket
        size and real frames stay numerically equal to the unpadded
        program (VALID convs + masked GroupNorm stats + masked pos-conv
        input + masked attention; see FeatureExtractor docstring)."""
        x = self.pre_layers(waveform, frame_num, train, valid_samples,
                            valid_frames, freeze_extractor)
        attn_mask = None
        if valid_frames is not None:
            key_valid = (jnp.arange(x.shape[1])[None, None, None, :]
                         < valid_frames[:, None, None, None])    # (B,1,1,T)
            attn_mask = jnp.broadcast_to(
                key_valid, (x.shape[0], 1, x.shape[1], x.shape[1]))
        for layer in self.encoder_layers:
            x = layer(x, attn_mask)
        return x

    def extract_features(self, waveform):
        return self.feature_extractor(waveform)
