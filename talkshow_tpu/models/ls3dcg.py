"""LS3DCG baseline: joint face+body+hand GAN from speech (flax, NWC).

Mirror of nets/LS3DCG.py (the reference's reimplementation of Habibie et
al.): a shared 1-D conv U-Net-ish encoder over MFCC with MaxPool
downsampling and nearest-neighbour upsampling, three skip-connected
decoder branches (face = jaw3+exp100, body 39, hands 90 — :131-177), and
an LSGAN conv discriminator on [poses | audio] (:204-225).

Output layout: (B, T, 232) = [jaw3 | exp100 | body39 | hand90]
(note: face first — demo.py:221-222 reorders it for SMPL-X).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from talkshow_tpu.models.layers import TorchBatchNorm, leaky_relu02


def nearest_resize(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') on axis 1 of (B, T, C)."""
    in_len = x.shape[1]
    if in_len == out_len:
        return x
    idx = (jnp.arange(out_len) * in_len) // out_len
    return x[:, idx]


class TFConvNormRelu(nn.Module):
    """Conv1d (TF SAME padding) + BN + LeakyReLU(0.2)
    (nets/spg/s2glayers.py:116-154 as used by LS3DCG)."""
    out_channels: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.out_channels, (self.kernel,), (self.stride,),
                    padding="SAME")(x)
        h = TorchBatchNorm()(h, train)
        return leaky_relu02(h)


class LSDecoder(nn.Module):
    """Skip-connected upsampling branch (nets/LS3DCG.py:99-128)."""
    in_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x, x1, x2, x3, train: bool = False):
        c = self.in_ch
        x = nearest_resize(x, x3.shape[1])
        x = jnp.concatenate([x, x3], axis=-1)
        x = TFConvNormRelu(c // 2, name="up1_0")(x, train)
        x = TFConvNormRelu(c // 2, name="up1_1")(x, train)
        x = jnp.repeat(x, 2, axis=1)
        x = nearest_resize(x, x2.shape[1])
        x = jnp.concatenate([x, x2], axis=-1)
        x = TFConvNormRelu(c // 4, name="up2_0")(x, train)
        x = TFConvNormRelu(c // 4, name="up2_1")(x, train)
        x = jnp.repeat(x, 2, axis=1)
        x = nearest_resize(x, x1.shape[1])
        x = jnp.concatenate([x, x1], axis=-1)
        x = TFConvNormRelu(c // 8, name="up3_0")(x, train)
        x = TFConvNormRelu(c // 8, name="up3_1")(x, train)
        return nn.Conv(self.out_ch, (1,), name="up3_out")(x)


class LS3DCGGenerator(nn.Module):
    """MFCC (B, T, 64) -> (B, T, 232) [jaw3|exp100|body39|hand90]
    (nets/LS3DCG.py:131-201)."""
    jaw_dim: int = 3
    exp_dim: int = 100
    body_dim: int = 39
    hand_dim: int = 90

    @nn.compact
    def __call__(self, aud, train: bool = False):
        def pool(h):
            return nn.max_pool(h, (2,), (2,))

        x1 = TFConvNormRelu(64, name="down1_0")(aud, train)
        x1 = TFConvNormRelu(128, name="down1_1")(x1, train)
        x = pool(x1)
        x2 = TFConvNormRelu(128, name="down2_0")(x, train)
        x2 = TFConvNormRelu(256, name="down2_1")(x2, train)
        x = pool(x2)
        x3 = TFConvNormRelu(256, name="down3_0")(x, train)
        x3 = TFConvNormRelu(512, name="down3_1")(x3, train)
        x = pool(x3)
        x = TFConvNormRelu(512, name="down4_0")(x, train)
        x = TFConvNormRelu(1024, name="down4_1")(x, train)
        x = jnp.repeat(x, 2, axis=1)

        face = LSDecoder(1024, self.jaw_dim + self.exp_dim, name="face_decoder")(
            x, x1, x2, x3, train)
        body = LSDecoder(1024, self.body_dim, name="body_decoder")(
            x, x1, x2, x3, train)
        hand = LSDecoder(1024, self.hand_dim, name="hand_decoder")(
            x, x1, x2, x3, train)
        return jnp.concatenate([face, body, hand], axis=-1)


class LS3DCGDiscriminator(nn.Module):
    """[poses129 | aud64] (B, T, 193) -> (B, T/8, 1) LSGAN scores
    (nets/LS3DCG.py:204-225)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        def pool(h):
            return nn.max_pool(h, (2,), (2,))

        h = TFConvNormRelu(128, name="c0")(x, train)
        h = TFConvNormRelu(256, name="c1")(h, train)
        h = pool(h)
        h = TFConvNormRelu(256, name="c2")(h, train)
        h = TFConvNormRelu(512, name="c3")(h, train)
        h = pool(h)
        h = TFConvNormRelu(512, name="c4")(h, train)
        h = TFConvNormRelu(1024, name="c5")(h, train)
        h = pool(h)
        h = nn.Conv(1, (1,), name="out")(h)
        return nn.sigmoid(h)


# ---------------------------------------------------------------------------
# Inference (nets/LS3DCG.py:365-391 infer_on_audio)
# ---------------------------------------------------------------------------

def infer_on_audio(gen: LS3DCGGenerator, gen_vars: dict, wav_file: str,
                   num_samples: int = 1, sr: int = 22000, fps: int = 30,
                   stand: bool = False, norm_stats=None):
    """Speech wav -> (num_samples, T, 265) full SMPL-X motion.

    Mirrors the reference chain: MFCC featurize (LS3DCG.py:381) ->
    generator forward -> [jaw | body+hand | exp] channel reorder
    (scripts/demo.py:221-222) -> part2full lower-body re-insertion.
    The generator is deterministic given audio, so all samples are
    identical (the reference repeats the same output B times too).
    """

    import jax
    import numpy as np

    from talkshow_tpu.ops import audio as audio_ops
    from talkshow_tpu.ops import pose as pose_ops

    feat = audio_ops.get_mfcc(wav_file, sr=sr, fps=fps)       # (T, 64)
    x = jnp.asarray(feat, jnp.float32)[None]

    @jax.jit
    def run(gen_vars, x):
        pred = gen.apply(gen_vars, x)                          # (1, T, 232)
        # face-first layout -> [jaw3 | conv129 | exp100]
        pred = jnp.concatenate(
            [pred[..., :3], pred[..., 103:], pred[..., 3:103]], axis=-1)
        return pred

    pred = np.asarray(run(gen_vars, x))
    if norm_stats is not None:
        mean, std = (np.asarray(a, np.float32) for a in norm_stats)
        if mean.shape[-1] != pred.shape[-1]:                   # stats over 165
            idx = np.concatenate([np.arange(3), pose_ops.C_INDEX_3D])
            mean = np.concatenate([mean[idx], np.zeros(100, np.float32)])
            std = np.concatenate([std[idx], np.ones(100, np.float32)])
        pred = pred * std + mean
    T = pred.shape[1]
    full = pose_ops.part2full(jnp.asarray(pred[0]), stand)     # (T, 265)
    return np.broadcast_to(np.asarray(full)[None], (num_samples, T, 265)).copy()
