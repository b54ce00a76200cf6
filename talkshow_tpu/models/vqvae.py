"""1-D conv VQ-VAE for body/hand motion tokens (flax, NWC).

Architecture mirror of nets/spg/vqvae_1d.py:
  * Encoder (:66-92): project -> [res-stack, stride-2 down] x2 -> res-stack
    -> 1x1 to the 64-d embedding space; T -> T/4.
  * Decoder (:116-149): 1x1 up-projection -> mirrored res/up stacks -> 1x1
    to the pose channels; T/4 -> T.
  * VQVAE (:168-208): encoder -> EMA vector quantizer -> decoder, with
    `encode`/`decode` halves used by the PixelCNN prior.
  * AE (:211-235): same trunk without quantization — the FGD feature
    extractor (nets/body_ae.py).
  * AudioEncoder (:11-34): MFCC (B,T,64) -> (B,T/4,num_hiddens) conditioning
    features for the prior.

The quantizer state (codebook + EMA stats) is NOT a flax param: it lives in
a separate `VQState` pytree (ops/vq.py) threaded through the train step, so
codebook updates happen inside the jitted program without mutable buffers.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from talkshow_tpu.models.layers import ConvNormRelu, ResCNRStack
from talkshow_tpu.ops import vq as vq_ops


class Encoder(nn.Module):
    embedding_dim: int = 64
    num_hiddens: int = 1024
    num_residual_layers: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ConvNormRelu(self.num_hiddens // 4, leaky=True, name="project")(x, train)
        h = ResCNRStack(self.num_hiddens // 4, self.num_residual_layers, leaky=True,
                        name="enc_1")(h, train)
        h = ConvNormRelu(self.num_hiddens // 2, leaky=True, residual=True,
                         sample="down", name="down_1")(h, train)
        h = ResCNRStack(self.num_hiddens // 2, self.num_residual_layers, leaky=True,
                        name="enc_2")(h, train)
        h = ConvNormRelu(self.num_hiddens, leaky=True, residual=True,
                         sample="down", name="down_2")(h, train)
        h = ResCNRStack(self.num_hiddens, self.num_residual_layers, leaky=True,
                        name="enc_3")(h, train)
        return nn.Conv(self.embedding_dim, (1,), name="pre_vq_conv")(h)


class Decoder(nn.Module):
    out_dim: int
    num_hiddens: int = 1024
    num_residual_layers: int = 2

    @nn.compact
    def __call__(self, e, train: bool = False):
        h = nn.Conv(self.num_hiddens, (1,), name="aft_vq_conv")(e)
        h = ResCNRStack(self.num_hiddens, self.num_residual_layers, leaky=True,
                        name="dec_1")(h, train)
        h = ConvNormRelu(self.num_hiddens // 2, leaky=True, residual=True,
                         sample="up", name="up_2")(h, train)
        h = ResCNRStack(self.num_hiddens // 2, self.num_residual_layers, leaky=True,
                        name="dec_2")(h, train)
        h = ConvNormRelu(self.num_hiddens // 4, leaky=True, residual=True,
                         sample="up", name="up_3")(h, train)
        h = ResCNRStack(self.num_hiddens // 4, self.num_residual_layers, leaky=True,
                        name="dec_3")(h, train)
        return nn.Conv(self.out_dim, (1,), name="project")(h)


class VQVAE(nn.Module):
    """Poses (B, T, in_dim) <-> codebook indices (B, T/4).

    The quantizer is applied through functional `vq_state` arguments; train
    forward returns everything needed by the loss plus the updated state.
    """
    in_dim: int
    embedding_dim: int = 64
    num_hiddens: int = 1024
    num_residual_layers: int = 2

    def setup(self):
        self.encoder = Encoder(self.embedding_dim, self.num_hiddens,
                               self.num_residual_layers)
        self.decoder = Decoder(self.in_dim, self.num_hiddens,
                               self.num_residual_layers)

    def __call__(self, poses, vq_state: vq_ops.VQState, train: bool = False):
        """Train forward: returns (recon, commit_loss, new_vq_state, indices)."""
        z = self.encoder(poses, train)
        if train:
            quant, commit, new_state, idx = vq_ops.quantize_train(vq_state, z)
        else:
            quant, idx = vq_ops.quantize(vq_state, z)
            commit, new_state = jnp.float32(0.0), vq_state
        recon = self.decoder(quant, train)
        return recon, commit, new_state, idx

    def encode(self, poses, vq_state: vq_ops.VQState, train: bool = False):
        """(B, T, C) -> (quantized (B, T/4, D), indices (B, T/4))."""
        z = self.encoder(poses, train)
        return vq_ops.quantize(vq_state, z)

    def decode_latents(self, indices, vq_state: vq_ops.VQState, train: bool = False):
        """(B, W) int tokens -> (B, W*4, C) poses."""
        e = vq_ops.lookup(vq_state, indices)
        return self.decoder(e, train)


class AE(nn.Module):
    """Plain autoencoder over conv channels; FGD feature net
    (vqvae_1d.py:211-235, nets/body_ae.py)."""
    in_dim: int
    embedding_dim: int = 64
    num_hiddens: int = 1024
    num_residual_layers: int = 2

    def setup(self):
        self.encoder = Encoder(self.embedding_dim, self.num_hiddens,
                               self.num_residual_layers)
        self.decoder = Decoder(self.in_dim, self.num_hiddens,
                               self.num_residual_layers)

    def __call__(self, poses, train: bool = False):
        z = self.encoder(poses, train)
        return self.decoder(z, train)

    def encode(self, poses, train: bool = False):
        return self.encoder(poses, train)


class AudioEncoder(nn.Module):
    """MFCC (B, T, in_dim) -> (B, T/4, num_hiddens) (vqvae_1d.py:11-34)."""
    num_hiddens: int = 256
    num_residual_layers: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ConvNormRelu(self.num_hiddens // 4, leaky=True, name="project")(x, train)
        h = ResCNRStack(self.num_hiddens // 4, self.num_residual_layers, leaky=True,
                        name="enc_1")(h, train)
        h = ConvNormRelu(self.num_hiddens // 2, leaky=True, residual=True,
                         sample="down", name="down_1")(h, train)
        h = ResCNRStack(self.num_hiddens // 2, self.num_residual_layers, leaky=True,
                        name="enc_2")(h, train)
        h = ConvNormRelu(self.num_hiddens, leaky=True, residual=True,
                         sample="down", name="down_2")(h, train)
        h = ResCNRStack(self.num_hiddens, self.num_residual_layers, leaky=True,
                        name="enc_3")(h, train)
        return h


class Wav2VecVQEncoder(nn.Module):
    """Wav2vec-fronted VQ encoder variant (vqvae_1d.py:37-63): wav2vec 2.0
    features -> project -> res/down stacks -> (B, T/4, num_hiddens).
    Kept for surface parity; the released models use the MFCC encoder.

    wav2vec_cfg=None uses the base-960h config; tests pass a tiny one."""
    num_hiddens: int = 1024
    num_residual_layers: int = 2
    wav2vec_cfg: object = None

    @nn.compact
    def __call__(self, waveform, frame_num: int, train: bool = False):
        from talkshow_tpu.models.wav2vec import (Wav2Vec2Config,
                                                 Wav2Vec2Encoder)
        cfg = self.wav2vec_cfg or Wav2Vec2Config()
        h = Wav2Vec2Encoder(cfg, name="audio_encoder")(waveform, frame_num,
                                                       train)
        h = ConvNormRelu(self.num_hiddens, leaky=True, name="project")(h, train)
        h = ResCNRStack(self.num_hiddens, self.num_residual_layers, leaky=True,
                        name="enc_1")(h, train)
        h = ConvNormRelu(self.num_hiddens, leaky=True, residual=True,
                         sample="down", name="down_1")(h, train)
        h = ResCNRStack(self.num_hiddens, self.num_residual_layers, leaky=True,
                        name="enc_2")(h, train)
        h = ConvNormRelu(self.num_hiddens, leaky=True, residual=True,
                         sample="down", name="down_2")(h, train)
        return ResCNRStack(self.num_hiddens, self.num_residual_layers,
                           leaky=True, name="enc_3")(h, train)
