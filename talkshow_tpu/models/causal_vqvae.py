"""Streaming (causal) VQ-VAE encoder/decoder with explicit carried state.

The reference ships causal variants (CasualConv/CasualCT, Casual_Encoder/
Casual_Decoder — nets/spg/vqvae_modules.py:12-84, 327-380) intended for
chunked decoding with a carried last-frame state, but that code path is
inconsistent (Res_CNR_Stack(casual=True) passes a `sample` kwarg CasualConv
does not accept, and return arities differ), i.e. dead code.  This module
provides a WORKING equivalent design:

  * every temporal conv is kernel-2 "look-back" (out[t] = f(x[t-1], x[t]))
    with the one-frame left context carried explicitly between chunks;
  * stride-2 up/down blocks are kernel-2 aligned so chunk boundaries never
    straddle a stride window (chunks must be multiples of 4 frames, the VQ
    stride — same constraint as the reference's 60-frame chunks,
    smplx_body_vq.py:257-271);
  * `decode_chunk(tokens, state)` is exactly equal to slicing a full-clip
    decode (asserted in tests), enabling infinite-length streaming with
    O(chunk) latency.

State is a flat list of (B, 1, C) arrays, one per causal conv, making the
whole thing a clean lax.scan carry for on-device streaming.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from talkshow_tpu.models.layers import TorchBatchNorm, leaky_relu02
from talkshow_tpu.ops import vq as vq_ops


class CausalConvBlock(nn.Module):
    """k2 look-back conv + BN + leaky relu (CasualConv semantics,
    vqvae_modules.py:44-84). State: previous chunk's last frame."""
    out_channels: int

    @nn.compact
    def __call__(self, x, state=None, train: bool = False):
        if state is None:
            state = jnp.zeros((x.shape[0], 1, x.shape[-1]), x.dtype)
        xc = jnp.concatenate([state, x], axis=1)
        h = nn.Conv(self.out_channels, (2,), padding="VALID", name="conv")(xc)
        h = TorchBatchNorm(name="norm")(h, train)
        return leaky_relu02(h), x[:, -1:]


class CausalDownBlock(nn.Module):
    """k2 s2 downsample (no cross-chunk context needed when chunk % 2 == 0)."""
    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.out_channels, (2,), (2,), padding="VALID", name="conv")(x)
        h = TorchBatchNorm(name="norm")(h, train)
        return leaky_relu02(h)


class CausalUpBlock(nn.Module):
    """k2 s2 transposed upsample (CasualCT, vqvae_modules.py:12-41)."""
    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.ConvTranspose(self.out_channels, (2,), (2,), padding="VALID",
                             transpose_kernel=True, name="conv")(x)
        h = TorchBatchNorm(name="norm")(h, train)
        return leaky_relu02(h)


class CausalResStack(nn.Module):
    """N causal conv blocks + 1x1 conv-bn with a full-stack residual
    (causal mirror of ResCNRStack)."""
    channels: int
    layers: int = 2

    @nn.compact
    def __call__(self, x, states=None, train: bool = False):
        if states is None:
            states = [None] * self.layers
        new_states = []
        h = x
        for i in range(self.layers):
            h, s = CausalConvBlock(self.channels, name=f"layer_{i}")(
                h, states[i], train)
            new_states.append(s)
        h = nn.Conv(self.channels, (1,), name="conv")(h)
        h = TorchBatchNorm(name="norm")(h, train)
        return nn.relu(h + x), new_states


class CausalEncoder(nn.Module):
    """Poses (B, T, C) -> latents (B, T/4, embed); strictly causal."""
    embedding_dim: int = 64
    num_hiddens: int = 1024
    num_residual_layers: int = 2

    @nn.compact
    def __call__(self, x, states=None, train: bool = False):
        if states is None:
            states = [None] * 3
        h = nn.Conv(self.num_hiddens // 4, (1,), name="project")(x)
        h, s1 = CausalResStack(self.num_hiddens // 4, self.num_residual_layers,
                               name="enc_1")(h, states[0], train)
        h = CausalDownBlock(self.num_hiddens // 2, name="down_1")(h, train)
        h, s2 = CausalResStack(self.num_hiddens // 2, self.num_residual_layers,
                               name="enc_2")(h, states[1], train)
        h = CausalDownBlock(self.num_hiddens, name="down_2")(h, train)
        h, s3 = CausalResStack(self.num_hiddens, self.num_residual_layers,
                               name="enc_3")(h, states[2], train)
        h = nn.Conv(self.embedding_dim, (1,), name="pre_vq_conv")(h)
        return h, [s1, s2, s3]


class CausalDecoder(nn.Module):
    """Latents (B, W, embed) -> poses (B, 4W, C); strictly causal, so
    chunked decoding with carried state equals full decoding."""
    out_dim: int
    num_hiddens: int = 1024
    num_residual_layers: int = 2

    @nn.compact
    def __call__(self, e, states=None, train: bool = False):
        if states is None:
            states = [None] * 3
        h = nn.Conv(self.num_hiddens, (1,), name="aft_vq_conv")(e)
        h, s1 = CausalResStack(self.num_hiddens, self.num_residual_layers,
                               name="dec_1")(h, states[0], train)
        h = CausalUpBlock(self.num_hiddens // 2, name="up_2")(h, train)
        h, s2 = CausalResStack(self.num_hiddens // 2, self.num_residual_layers,
                               name="dec_2")(h, states[1], train)
        h = CausalUpBlock(self.num_hiddens // 4, name="up_3")(h, train)
        h, s3 = CausalResStack(self.num_hiddens // 4, self.num_residual_layers,
                               name="dec_3")(h, states[2], train)
        return nn.Conv(self.out_dim, (1,), name="project")(h), [s1, s2, s3]


class CausalVQVAE(nn.Module):
    """Streaming VQ-VAE: same quantizer state as the batch model."""
    in_dim: int
    embedding_dim: int = 64
    num_hiddens: int = 1024
    num_residual_layers: int = 2

    def setup(self):
        self.encoder = CausalEncoder(self.embedding_dim, self.num_hiddens,
                                     self.num_residual_layers)
        self.decoder = CausalDecoder(self.in_dim, self.num_hiddens,
                                     self.num_residual_layers)

    def encode_latents(self, poses, enc_states=None):
        """Raw (pre-quantization) causal latents; exposed for tests."""
        return self.encoder(poses, enc_states)

    def encode_chunk(self, poses, vq_state: vq_ops.VQState, enc_states=None):
        z, new_states = self.encoder(poses, enc_states)
        quant, idx = vq_ops.quantize(vq_state, z)
        return quant, idx, new_states

    def decode_chunk(self, indices, vq_state: vq_ops.VQState, dec_states=None):
        e = vq_ops.lookup(vq_state, indices)
        return self.decoder(e, dec_states)

    def __call__(self, poses, vq_state: vq_ops.VQState, train: bool = False):
        z, _ = self.encoder(poses, None, train)
        if train:
            quant, commit, new_state, idx = vq_ops.quantize_train(vq_state, z)
        else:
            quant, idx = vq_ops.quantize(vq_state, z)
            commit, new_state = jnp.float32(0.0), vq_state
        recon, _ = self.decoder(quant, None, train)
        return recon, commit, new_state, idx
