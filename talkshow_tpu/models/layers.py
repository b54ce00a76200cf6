"""Shared conv building blocks (flax.linen, channels-last NWC layout).

TPU-first re-expressions of the reference layer zoo:
  * `ConvNormRelu` / `ResCNRStack` — the VQ-VAE building blocks
    (nets/spg/vqvae_modules.py:87-212): conv(+BN)(+leaky-relu) with
    optional strided down/up sampling and pre-activation residual add.
  * `CNR1d` / `SeqTranslator1D` — the generic variant from nets/layers.py
    (ConvNormRelu :25-152, SeqTranslator1D :799-841) with bn/ln/gn norms,
    used by the face generator's conv middle/heads.

Activations are (B, T, C): the channel dim maps to TPU lanes so 1-D convs
lower to MXU matmuls of shape (B*T, K*C_in) x (K*C_in, C_out).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


def leaky_relu02(x):
    return nn.leaky_relu(x, negative_slope=0.2)


class TorchBatchNorm(nn.Module):
    """BatchNorm matching torch defaults (eps 1e-5, momentum 0.1)."""

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            axis_name=None,
        )(x)


class ConvNormRelu(nn.Module):
    """conv-(dropout)-norm-(+residual)-relu; vqvae_modules.py:87-172.

    sample: 'none' k3 s1 p1 | 'one' k1 s1 | 'down' k4 s2 p1 |
            'up' transposed k4 s2 p1 (exact torch ConvTranspose1d mapping).
    """
    out_channels: int
    leaky: bool = False
    sample: str = "none"
    residual: bool = False
    norm: str = "bn"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.sample == "none":
            kernel, stride, pad = 3, 1, [(1, 1)]
            main = nn.Conv(self.out_channels, (kernel,), (stride,), padding=pad)
        elif self.sample == "one":
            kernel, stride, pad = 1, 1, [(0, 0)]
            main = nn.Conv(self.out_channels, (kernel,), (stride,), padding=pad)
        elif self.sample == "down":
            kernel, stride, pad = 4, 2, [(1, 1)]
            main = nn.Conv(self.out_channels, (kernel,), (stride,), padding=pad)
        elif self.sample == "up":
            # torch ConvTranspose1d(k=4, s=2, p=1): out = 2T
            kernel, stride, pad = 4, 2, [(2, 2)]
            main = nn.ConvTranspose(self.out_channels, (kernel,), (stride,),
                                    padding=pad, transpose_kernel=True)
        else:
            raise ValueError(self.sample)

        out = main(x)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
        if self.norm == "bn":
            out = TorchBatchNorm()(out, train)
        elif self.norm == "ln":
            out = nn.LayerNorm(epsilon=1e-5)(out)
        elif self.norm == "gn":
            out = nn.GroupNorm(num_groups=2, epsilon=1e-5)(out)

        if self.residual:
            if self.sample == "up":
                res = nn.ConvTranspose(self.out_channels, (kernel,), (stride,),
                                       padding=pad, transpose_kernel=True,
                                       name="residual_layer")(x)
            elif self.sample == "down" or x.shape[-1] != self.out_channels:
                res = nn.Conv(self.out_channels, (kernel,), (stride,), padding=pad,
                              name="residual_layer")(x)
            else:
                res = x
            out = out + res
        return leaky_relu02(out) if self.leaky else nn.relu(out)


class ResCNRStack(nn.Module):
    """N ConvNormRelu layers + conv-bn, with a full-stack residual
    (vqvae_modules.py:175-212)."""
    channels: int
    layers: int
    leaky: bool = False
    sample: str = "none"

    @nn.compact
    def __call__(self, x, train: bool = False):
        kernel = 1 if self.sample == "one" else 3
        pad = [(0, 0)] if self.sample == "one" else [(1, 1)]
        h = x
        for i in range(self.layers):
            h = ConvNormRelu(self.channels, leaky=self.leaky, sample=self.sample,
                             name=f"layer_{i}")(h, train)
        h = nn.Conv(self.channels, (kernel,), padding=pad, name="conv")(h)
        h = TorchBatchNorm(name="norm")(h, train)
        return nn.relu(h + x)


class CNR1d(nn.Module):
    """Generic ConvNormRelu (nets/layers.py:25-152): default k3 s1 SAME,
    norm bn/ln/gn, optional pre-relu residual (identity or projected)."""
    out_channels: int
    kernel: int = 3
    stride: int = 1
    leaky: bool = False
    residual: bool = False
    norm: str = "bn"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False, frame_mask=None):
        # frame_mask (B, T, 1): zero padded frames at conv entry so the
        # SAME padding a real boundary frame reads matches the unpadded
        # program's explicit zeros (length-bucketed batches).
        if frame_mask is not None:
            x = x * frame_mask
        pad = (self.kernel - self.stride) // 2
        out = nn.Conv(self.out_channels, (self.kernel,), (self.stride,),
                      padding=[(pad, pad)])(x)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
        if self.norm == "bn":
            out = TorchBatchNorm()(out, train)
        elif self.norm == "ln":
            out = nn.LayerNorm(epsilon=1e-5)(out)
        elif self.norm == "gn":
            out = nn.GroupNorm(num_groups=2, epsilon=1e-5)(out)
        if self.residual:
            if x.shape[-1] == self.out_channels and self.stride == 1:
                res = x
            else:
                res = nn.Conv(self.out_channels, (self.kernel,), (self.stride,),
                              padding=[(pad, pad)], name="residual_layer")(x)
            out = out + res
        return leaky_relu02(out) if self.leaky else nn.relu(out)


class SeqTranslator1D(nn.Module):
    """Stack of >=min_layers CNR1d blocks (nets/layers.py:799-841)."""
    out_channels: int
    min_layers_num: int = 1
    residual: bool = True
    norm: str = "bn"

    @nn.compact
    def __call__(self, x, train: bool = False, frame_mask=None):
        h = x
        for i in range(max(1, self.min_layers_num)):
            h = CNR1d(self.out_channels, residual=self.residual, norm=self.norm,
                      name=f"conv_{i}")(h, train, frame_mask)
        return h


def masked_linear_interpolate(x: jnp.ndarray, out_len: int,
                              in_valid, out_valid) -> jnp.ndarray:
    """linear_interpolate with DYNAMIC per-example valid lengths.

    x: (B, T_pad, C) where only the first in_valid[b] frames are real;
    returns (B, out_len, C) whose first out_valid[b] frames equal
    linear_interpolate(x[b, :in_valid[b]], out_valid[b]) — the grid uses
    the true ratio, so length-bucketed padding does not perturb real
    frames. One compiled program serves every (in_valid, out_valid)."""
    in_len = x.shape[1]
    in_v = jnp.asarray(in_valid, jnp.float32)[:, None]      # (B, 1)
    out_v = jnp.asarray(out_valid, jnp.float32)[:, None]
    scale = in_v / out_v
    pos = (jnp.arange(out_len, dtype=jnp.float32)[None, :] + 0.5) * scale - 0.5
    pos = jnp.clip(pos, 0.0, in_v - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_v.astype(jnp.int32) - 1)
    hi = jnp.minimum(hi, in_len - 1)
    w = (pos - lo)[..., None]
    x_lo = jnp.take_along_axis(x, lo[..., None], axis=1)
    x_hi = jnp.take_along_axis(x, hi[..., None], axis=1)
    return x_lo * (1 - w) + x_hi * w


def linear_interpolate(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """F.interpolate(mode='linear', align_corners=False) on axis 1 of (B,T,C).

    Used for the wav2vec 50 Hz -> 30 fps alignment (nets/spg/wav2vec.py:64-70)
    and the audio-encoder length adaptation (s2g_face.py:133).
    """
    in_len = x.shape[1]
    if in_len == out_len:
        return x
    scale = in_len / out_len
    pos = (jnp.arange(out_len) + 0.5) * scale - 0.5
    pos = jnp.clip(pos, 0.0, in_len - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_len - 1)
    w = (pos - lo)[None, :, None]
    return x[:, lo, :] * (1 - w) + x[:, hi, :] * w


class UNet1D(nn.Module):
    """5-down/5-up conv U-Net over time (nets/layers.py:154-208 family):
    stride-2 downsamples, nearest upsample + skip concat."""
    channels: int
    out_channels: int
    depth: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        skips = []
        h = x
        for i in range(self.depth):
            h = CNR1d(self.channels * min(2 ** i, 8), leaky=True,
                      name=f"down_{i}")(h, train)
            skips.append(h)
            h = nn.max_pool(h, (2,), (2,))
        h = CNR1d(self.channels * min(2 ** self.depth, 8), leaky=True,
                  name="bottleneck")(h, train)
        for i in reversed(range(self.depth)):
            h = jnp.repeat(h, 2, axis=1)
            skip = skips[i]
            if h.shape[1] != skip.shape[1]:
                h = linear_interpolate(h, skip.shape[1])
            h = jnp.concatenate([h, skip], axis=-1)
            h = CNR1d(self.channels * min(2 ** i, 8), leaky=True,
                      name=f"up_{i}")(h, train)
        return nn.Conv(self.out_channels, (1,), name="out")(h)


class SeqEncoder1D(nn.Module):
    """Sequence -> single latent vector via strided convs + global pooling
    (nets/layers.py:454-510 family)."""
    hidden: int
    out_dim: int
    num_layers: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x
        for i in range(self.num_layers):
            h = CNR1d(self.hidden, leaky=True, name=f"conv_{i}")(h, train)
            h = nn.max_pool(h, (2,), (2,))
        h = jnp.mean(h, axis=1)
        return nn.Dense(self.out_dim, name="out")(h)


class SeqDecoder1D(nn.Module):
    """Latent vector -> sequence via broadcast + conv stack
    (nets/layers.py SeqDecoder1D family)."""
    hidden: int
    out_channels: int
    length: int
    num_layers: int = 4

    @nn.compact
    def __call__(self, z, train: bool = False):
        h = nn.Dense(self.hidden, name="in")(z)
        h = jnp.broadcast_to(h[:, None, :], (z.shape[0], self.length, self.hidden))
        for i in range(self.num_layers):
            h = CNR1d(self.hidden, leaky=True, residual=True,
                      name=f"conv_{i}")(h, train)
        return nn.Conv(self.out_channels, (1,), name="out")(h)


class SeqTranslatorRNN(nn.Module):
    """GRU-based sequence translator (nets/layers.py SeqTranslatorRNN
    family): conv front-end + unidirectional GRU + linear head."""
    hidden: int
    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = CNR1d(self.hidden, leaky=True, name="front")(x, train)
        gru = nn.RNN(nn.GRUCell(features=self.hidden), name="gru")
        h = gru(h)
        return nn.Dense(self.out_channels, name="out")(h)
