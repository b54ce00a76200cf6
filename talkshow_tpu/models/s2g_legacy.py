"""Legacy freeform S2G generator family (flax, NWC).

Mirror of nets/spg/s2glayers.py: the pre-VQ "Freeform"-style body generator
the reference keeps around (template-VAE + dual UNet audio encoders +
separate per-part conv decoders, :303-494) and its patch discriminator
(:497-512).  Not on the released TalkSHOW main path (smplx models use the
VQ/PixelCNN stack), but part of the framework surface.

TF-SAME 1-D convs (Conv1d_tf, :19-69) map to flax padding='SAME'.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from talkshow_tpu.models.layers import (CNR1d, SeqTranslator1D, leaky_relu02,
                                        linear_interpolate)


class S2GUNet(nn.Module):
    """5-down/5-up additive-skip UNet over time (s2glayers.py:169-212):
    downs are stride-2 CNRs, ups linearly resize + add skip + conv."""
    dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = CNR1d(x.shape[-1], name="down1_0")(x, train)
        h = CNR1d(self.dim, name="down1_1")(h, train)
        x2 = CNR1d(self.dim, name="down1_2")(h, train)
        skips = [x2]
        h = x2
        for i in range(5):
            h = CNR1d(self.dim, kernel=4, stride=2, name=f"down{i + 2}")(h, train)
            skips.append(h)
        h = skips[-1]
        for i in range(5):
            target = skips[-2 - i]
            h = linear_interpolate(h, target.shape[1]) + target
            h = CNR1d(self.dim, name=f"up{i + 1}")(h, train)
        return h, x2


class S2GAudioEncoder(nn.Module):
    """Dual-mode audio encoder (s2glayers.py:215-300): 'pose' mode is a
    VAE over audio features fused with the template noise; plain mode is a
    conv+UNet feature extractor."""
    pose: bool
    template_length: int = 0
    common_dim: int = 256

    @nn.compact
    def __call__(self, spec, template=None, train: bool = False, rng=None):
        h = SeqTranslator1D(256, min_layers_num=4, residual=True,
                            name="first_net")(spec, train)
        h = nn.Dropout(0.1, deterministic=not train)(h)
        if self.pose:
            mu = nn.Conv(128, (1,), name="mu_fc")(h)
            log_var = nn.Conv(128, (1,), name="var_fc")(h)
            if train and rng is not None:
                eps = jax.random.normal(rng, mu.shape)
                audio = eps * jnp.exp(0.5 * log_var) + mu
            else:
                audio = mu
            x1 = jnp.concatenate([audio, template], axis=-1)
            x1, x2_0 = S2GUNet(self.common_dim, name="unet")(x1, train)
            return x1, (mu, log_var), x2_0
        x1, x2_0 = S2GUNet(256, name="unet")(h, train)
        return x1, (None, None), x2_0


class FreeformS2G(nn.Module):
    """Template-VAE S2G generator (s2glayers.py:303-494, separate=True).

    Train: template sampled from a posterior over GT poses (pose_encoder ->
    mu/var).  Inference: template ~ N(0, I).  Decoders: jaw + expression
    branches read the speech encoder; body/hand branches read the
    audio+template encoder.
    Returns (out (B, T, sum(each_dim)), template, mu, var).
    """
    pose_dim: int
    each_dim: tuple
    template_length: int = 64
    common_dim: int = 256
    expression: bool = True

    def setup(self):
        self.pose_encoder = SeqTranslator1D(self.common_dim, min_layers_num=3,
                                            residual=True)
        self.mu_fc = nn.Conv(self.template_length, (1,))
        self.var_fc = nn.Conv(self.template_length, (1,))
        self.audio_encoder = S2GAudioEncoder(True, self.template_length,
                                             self.common_dim)
        self.speech_encoder = S2GAudioEncoder(False)
        n_branches = 4 if self.expression else 3
        self.decoders = [
            [CNR1d(64 if b == 0 else self.common_dim, name=f"dec{b}_{i}")
             for i in range(3)] for b in range(n_branches)]
        self.final_outs = [nn.Conv(self.each_dim[b], (1,), name=f"out{b}")
                           for b in range(n_branches)]

    def __call__(self, spec, gt_poses=None, train: bool = False, rngs_key=None):
        B, T = spec.shape[0], spec.shape[1]
        if train and gt_poses is not None:
            enc = self.pose_encoder(gt_poses[..., :-50], train)
            mu, log_var = self.mu_fc(enc), self.var_fc(enc)
            eps = jax.random.normal(rngs_key, mu.shape)
            template = eps * jnp.exp(0.5 * log_var) + mu
        else:
            mu = log_var = None
            template = (jax.random.normal(rngs_key, (B, T, self.template_length))
                        if rngs_key is not None
                        else jnp.zeros((B, T, self.template_length)))
        r = jax.random.fold_in(rngs_key, 1) if rngs_key is not None else None
        a_t_f, (mu2, var2), _ = self.audio_encoder(spec, template, train, r)
        s_f, _, _ = self.speech_encoder(spec, None, train)

        outs = []
        for b, (stack, head) in enumerate(zip(self.decoders, self.final_outs)):
            h = s_f if b in (0, 3) else a_t_f
            for layer in stack:
                h = layer(h, train)
            outs.append(head(h))
        out = jnp.concatenate(outs, axis=-1)
        return out, template, mu, log_var


class S2GDiscriminator(nn.Module):
    """Patch discriminator on pose sequences (s2glayers.py:497-512)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(64, (4,), (2,), padding="SAME")(x)
        h = leaky_relu02(h)
        h = CNR1d(128, kernel=4, stride=2, name="c1")(h, train)
        h = CNR1d(256, kernel=4, stride=1, name="c2")(h, train)
        return nn.Conv(1, (4,), (1,), padding="SAME")(h)
