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

from talkshow_tpu.models.layers import linear_interpolate


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


class FeatureExtractor(nn.Module):
    """Raw waveform (B, T) -> (B, T', conv_dim[-1]); VALID convs, no bias.
    First layer followed by channel-wise GroupNorm (group per channel)."""
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x):
        h = x[:, :, None]  # (B, T, 1)
        for i, (dim, k, s) in enumerate(
                zip(self.cfg.conv_dim, self.cfg.conv_kernel, self.cfg.conv_stride)):
            h = nn.Conv(dim, (k,), (s,), padding="VALID", use_bias=False,
                        name=f"conv_{i}")(h)
            if i == 0:
                h = nn.GroupNorm(num_groups=dim, epsilon=self.cfg.layer_norm_eps,
                                 name="group_norm")(h)
            h = nn.gelu(h, approximate=False)
        return h


class FeatureProjection(nn.Module):
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm(epsilon=self.cfg.layer_norm_eps, name="layer_norm")(x)
        return nn.Dense(self.cfg.hidden_size, name="projection")(x)


class PositionalConvEmbedding(nn.Module):
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x):
        k = self.cfg.num_conv_pos_embeddings
        pad = k // 2
        h = nn.Conv(self.cfg.hidden_size, (k,), padding=[(pad, pad)],
                    feature_group_count=self.cfg.num_conv_pos_embedding_groups,
                    name="conv")(x)
        if k % 2 == 0:
            h = h[:, :-1]  # SamePad crop for even kernels
        return nn.gelu(h, approximate=False)


class EncoderLayer(nn.Module):
    """Post-norm transformer layer (do_stable_layer_norm=False)."""
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x):
        attn_out = nn.MultiHeadDotProductAttention(
            num_heads=self.cfg.num_heads,
            qkv_features=self.cfg.hidden_size,
            out_features=self.cfg.hidden_size,
            use_bias=True,
            name="attention",
        )(x, x)
        x = nn.LayerNorm(epsilon=self.cfg.layer_norm_eps, name="layer_norm")(x + attn_out)
        h = nn.Dense(self.cfg.intermediate_size, name="ffn_intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.cfg.hidden_size, name="ffn_output")(h)
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

    def __call__(self, waveform, frame_num: int, train: bool = False):
        feats = self.feature_extractor(waveform)            # (B, T50, 512)
        feats = linear_interpolate(feats, frame_num)        # 50 Hz -> 30 fps
        x = self.feature_projection(feats)
        if train and self.mask_time_prob > 0 and self.has_rng("spec_augment"):
            x = self._spec_augment(x)
        x = x + self.pos_conv_embed(x)
        x = self.encoder_layer_norm(x)
        for layer in self.encoder_layers:
            x = layer(x)
        return x

    def extract_features(self, waveform):
        return self.feature_extractor(waveform)
