"""Face generator: speech -> jaw pose (3) + expression (100), deterministic.

Mirror of nets/spg/s2g_face.py:107-224 with encoder_choice='faceformer':
  raw 16 kHz waveform -> wav2vec 2.0 (CNN frozen; 50 Hz -> 30 fps linear
  interpolation mid-stack) -> Linear 768->256 -> identity-conditioned conv
  middle (`AudioEncoder` :107-139: one-hot speaker -> 1x1 conv to 64ch,
  concatenated, SeqTranslator1D with 3 residual LN conv blocks) -> two conv
  decoder branches (jaw: 3x CNR(256->64, ln) + 1x1 -> 3;
  expression: 3x CNR(256->256, ln) + 1x1 -> 100).

Output: (B, T, 103) = [jaw3 | exp100] at 30 fps.
"""
from __future__ import annotations

from dataclasses import field

import jax.numpy as jnp
from flax import linen as nn

from talkshow_tpu.models.layers import CNR1d, SeqTranslator1D
from talkshow_tpu.models.wav2vec import Wav2Vec2Config, Wav2Vec2Encoder


class FaceAudioMiddle(nn.Module):
    """Identity-conditioned conv middle (s2g_face.py:107-139)."""
    out_dim: int = 256
    num_classes: int = 4
    identity: bool = True

    @nn.compact
    def __call__(self, x, id_onehot=None, train: bool = False,
                 frame_mask=None):
        # x: (B, T, 256); id_onehot: (B, num_classes)
        h = nn.Dropout(0.1, deterministic=not train)(x)
        if self.identity:
            idf = jnp.broadcast_to(id_onehot[:, None, :].astype(jnp.float32),
                                   (x.shape[0], x.shape[1], self.num_classes))
            idf = nn.Conv(64, (1,), name="id_mlp")(idf)
            h = jnp.concatenate([h, idf], axis=-1)
        h = SeqTranslator1D(self.out_dim, min_layers_num=3, residual=True,
                            norm="ln", name="first_net")(h, train, frame_mask)
        return h


class FaceDecoderHeads(nn.Module):
    """Two conv branches -> concat [jaw | expression] (s2g_face.py:179-194)."""
    jaw_dim: int = 3
    exp_dim: int = 100
    hidden: int = 256

    @nn.compact
    def __call__(self, feature, train: bool = False, frame_mask=None):
        h = feature
        for i in range(3):
            h = CNR1d(64, norm="ln", name=f"jaw_cnr_{i}")(h, train, frame_mask)
        jaw = nn.Conv(self.jaw_dim, (1,), name="jaw_out")(h)

        g = feature
        for i in range(3):
            g = CNR1d(self.hidden, norm="ln", name=f"exp_cnr_{i}")(g, train,
                                                                   frame_mask)
        exp = nn.Conv(self.exp_dim, (1,), name="exp_out")(g)
        return jnp.concatenate([jaw, exp], axis=-1)


class FaceGenerator(nn.Module):
    """waveform (B, T_samples) + speaker one-hot -> (B, T_frames, 103)."""
    wav2vec_cfg: Wav2Vec2Config = field(default_factory=Wav2Vec2Config)
    num_classes: int = 4
    identity: bool = True
    jaw_dim: int = 3
    exp_dim: int = 100

    def setup(self):
        # wav2vec_cfg.dtype (e.g. bf16 for TPU inference) also drives the
        # 768->256 feature map; the small conv middle/heads stay f32
        self.audio_encoder = Wav2Vec2Encoder(self.wav2vec_cfg)
        self.audio_feature_map = nn.Dense(256, dtype=self.wav2vec_cfg.dtype)
        self.audio_middle = FaceAudioMiddle(256, self.num_classes, self.identity)
        self.heads = FaceDecoderHeads(self.jaw_dim, self.exp_dim)

    def __call__(self, waveform, id_onehot, time_steps: int,
                 train: bool = False, valid_samples=None, valid_frames=None,
                 freeze_extractor: bool = False):
        """valid_samples/valid_frames (B,) enable length-bucketed batches:
        waveform/time axes padded to a bucket, real frames numerically
        equal to the unpadded program (see Wav2Vec2Encoder.__call__).
        freeze_extractor stops gradients at the wav2vec CNN output (the
        training path — the CNN is frozen, so its backward is pure waste)."""
        hidden = self.audio_encoder(waveform, time_steps, train,
                                    valid_samples, valid_frames,
                                    freeze_extractor)
        feature = self.audio_feature_map(hidden)            # (B, T, 256)
        frame_mask = None
        if valid_frames is not None:
            frame_mask = (jnp.arange(time_steps)[None, :, None]
                          < valid_frames[:, None, None]).astype(feature.dtype)
        feature = self.audio_middle(feature, id_onehot, train, frame_mask)
        return self.heads(feature, train, frame_mask)

    def from_features(self, hidden, id_onehot, train: bool = False,
                      valid_frames=None):
        """Head-only path for precomputed wav2vec features (B, T, 768).
        valid_frames mirrors __call__'s bucketed masking: padded frames are
        zeroed through the conv middle/heads so real frames stay numerically
        equal to the unpadded program (required by fused callers —
        wav2vec_pallas.face_apply_fused)."""
        feature = self.audio_feature_map(hidden)
        frame_mask = None
        if valid_frames is not None:
            frame_mask = (jnp.arange(hidden.shape[1])[None, :, None]
                          < valid_frames[:, None, None]).astype(feature.dtype)
        feature = self.audio_middle(feature, id_onehot, train, frame_mask)
        return self.heads(feature, train, frame_mask)


def face_loss(pred, gt):
    """L1 on the first 6 channels + MSE on the last 100
    (nets/smplx_face.py:139-167). gt: (B, T, 265-layout first 6 + exp last)."""
    l1 = jnp.mean(jnp.abs(pred[..., :6] - gt[..., :6]))
    mse = jnp.mean((pred[..., -100:] - gt[..., -100:]) ** 2)
    return l1 + mse, {"MSELoss": l1, "exp_loss": mse}


class MeshtalkEncoder(nn.Module):
    """Per-frame audio encoder from MeshTalk (s2g_face.py:41-104): one
    second of 16 kHz audio per video frame -> log-mel (80 mels, hop 160,
    win 800) -> conv(k5) + 6 dilated conv blocks with averaged residuals ->
    temporal mean -> linear to the latent code."""
    latent_dim: int = 128

    @nn.compact
    def __call__(self, chunks, train: bool = False):
        """chunks: (B, T, 16000) -> (B, T, latent_dim)."""
        from talkshow_tpu.ops import audio as audio_ops
        import jax

        B, T, N = chunks.shape
        flat = chunks.reshape(B * T, N)

        def melspec(x):
            frames = audio_ops.frame_signal(x, 2048, 160)
            w = jnp.zeros(2048).at[(2048 - 800) // 2:(2048 - 800) // 2 + 800].set(
                jnp.asarray(audio_ops._hann_window(800)))
            spec = jnp.fft.rfft(frames * w, axis=-1)
            power = spec.real ** 2 + spec.imag ** 2
            mel = power @ jnp.asarray(audio_ops.mel_filterbank(16000, 2048, 80))
            return jnp.log(jnp.clip(mel, 1e-10, None))          # (frames, 80)

        x = jax.vmap(melspec)(flat)                              # (BT, F, 80)
        x = nn.Conv(128, (5,), padding="VALID", name="convert_dimensions")(x)
        x = nn.leaky_relu(x, 0.2)
        for i in range(6):
            dilation = 2 * (i % 3 + 1)
            h = nn.Conv(128, (5,), padding="VALID", kernel_dilation=(dilation,),
                        name=f"conv_{i}")(x)
            h = nn.leaky_relu(h, 0.2)
            if train:
                h = nn.Dropout(0.2, deterministic=False)(h)
            crop = (x.shape[1] - h.shape[1]) // 2
            x = (x[:, crop:x.shape[1] - crop][:, :h.shape[1]] + h) / 2.0
        x = jnp.mean(x, axis=1)                                  # (BT, 128)
        code = nn.Dense(self.latent_dim, name="code")(x)
        return code.reshape(B, T, self.latent_dim)


class FaceGeneratorMeshtalk(nn.Module):
    """Face generator with the MeshTalk audio frontend
    (encoder_choice='meshtalk', s2g_face.py:165-166, 201-203)."""
    num_classes: int = 4
    jaw_dim: int = 3
    exp_dim: int = 100

    def setup(self):
        self.audio_encoder = MeshtalkEncoder(latent_dim=256)
        self.audio_middle = FaceAudioMiddle(256, self.num_classes, True)
        self.heads = FaceDecoderHeads(self.jaw_dim, self.exp_dim)

    def __call__(self, chunks, id_onehot, train: bool = False):
        feature = self.audio_encoder(chunks, train)
        feature = self.audio_middle(feature, id_onehot, train)
        return self.heads(feature, train)
