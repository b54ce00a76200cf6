"""End-to-end speech -> SMPL-X motion pipeline (the public API).

Mirror of scripts/demo.py:158-247: the face generator produces jaw +
expression for every frame; the body stage samples `num_samples` diverse
body+hand sequences from the PixelCNN prior and decodes them with the
frozen VQ-VAEs; `part2full` re-inserts the canned lower body.

TPU-first differences from the reference:
  * diversity sampling is one batched program (B = num_samples), not a
    python loop over samples (demo.py:195);
  * every stage is jitted once per audio-length bucket and cached;
  * audio featurization (MFCC / resample) is jnp too.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from talkshow_tpu.models.body import BodyModels, create_body_models, generate_conv_poses
from talkshow_tpu.models.face import FaceGenerator
from talkshow_tpu.ops import audio as audio_ops
from talkshow_tpu.ops import pose as pose_ops
from talkshow_tpu.ops.pose import SPEAKER_ID, SPEAKER_OFFSET


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


#: BodyModels fields holding weight/state pytrees.  These are passed as jit
#: ARGUMENTS, never closed over: closed-over arrays become HLO constants,
#: which hit the remote-compile upload limit and run ~2.7x slower
#: (CLAUDE.md "TPU / axon gotchas").
_BODY_VAR_KEYS = ("vq_body_vars", "vq_hand_vars", "vq_body_state",
                  "vq_hand_state", "audio_enc_vars", "prior_vars")


@dataclass
class Pipeline:
    face_model: FaceGenerator
    face_vars: Any
    body: BodyModels
    num_classes: int = 4
    #: optional (mean, std) over the full pose channels (norm_stats.npy);
    #: body outputs are denormalized with the conv-channel slice, mirroring
    #: the reference inference hook (scripts/demo.py:107-111,
    #: nets/utils.py:11-25, smplx_body_vq.py:281-282).
    norm_stats: Any = None

    # ------------------------------------------------------------------
    @classmethod
    def create(cls, rng: jax.Array | int = 0, wav2vec_cfg=None,
               face_dtype="auto", **body_kwargs) -> "Pipeline":
        """Random-init pipeline (for tests/benchmarks; use
        `from_torch_checkpoints` for reference weights).

        face_dtype: compute dtype for the wav2vec/face stage. "auto"
        (default) selects bf16 on TPU: params stay f32 and norm/softmax
        math is kept f32 (see Wav2Vec2Config.dtype).  Measured v5e note:
        at B=1 the stage is op-overhead/bandwidth-bound, not MXU-bound,
        so bf16 is ~neutral on latency there (2.5 ms either way) — it
        halves activation traffic and matters at serving batch sizes.
        Pass None to force full f32 (bit-parity with the torch
        reference)."""
        if isinstance(rng, int):
            rng = jax.random.PRNGKey(rng)
        r_face, r_body = jax.random.split(rng)
        from talkshow_tpu.models.wav2vec import Wav2Vec2Config
        cfg = wav2vec_cfg or Wav2Vec2Config()
        face = FaceGenerator(wav2vec_cfg=cfg)
        face_vars = face.init(r_face, jnp.zeros((1, 3200)),
                              jnp.zeros((1, 4)), 6)
        body = create_body_models(r_body, **body_kwargs)
        pipe = cls(face, face_vars, body)
        if face_dtype == "auto":
            face_dtype = (jnp.bfloat16 if jax.default_backend() == "tpu"
                          else None)
        if face_dtype is not None:
            pipe = pipe.with_face_dtype(face_dtype)
        return pipe

    def with_face_dtype(self, dtype) -> "Pipeline":
        """Rebuild the face stage with compute dtype `dtype` (None = f32).
        Weights are untouched (flax casts per-op); only the module
        definition changes, so jit caches rebuild on first use."""
        import dataclasses

        fm = self.face_model
        cfg = dataclasses.replace(fm.wav2vec_cfg, dtype=dtype)
        face = FaceGenerator(wav2vec_cfg=cfg, num_classes=fm.num_classes,
                             identity=fm.identity, jaw_dim=fm.jaw_dim,
                             exp_dim=fm.exp_dim)
        return Pipeline(face, self.face_vars, self.body, self.num_classes,
                        self.norm_stats)

    @classmethod
    def from_torch_checkpoints(cls, face_ckpt: str | None = None,
                               body_ckpt: str | None = None,
                               vq_ckpt: str | None = None) -> "Pipeline":
        """Build from reference TalkSHOW .pth checkpoints (converted on
        load via talkshow_tpu.convert.talkshow).

        body_ckpt: the s2g_body_pixel ckpt (contains the frozen-VQ-decoded
        prior + audio encoder). vq_ckpt: the s2g_body_vq ckpt for codebooks
        + decoders; when omitted, the VQ weights are also looked up inside
        body_ckpt (they were loaded frozen there, smplx_body_pixel.py:59-62).
        """
        import torch

        from talkshow_tpu.convert import talkshow as tsconv

        pipe = cls.create(0)
        if face_ckpt:
            ckpt = torch.load(face_ckpt, map_location="cpu", weights_only=False)
            face_params = tsconv.convert_face_checkpoint(ckpt)
            pipe = Pipeline(pipe.face_model, face_params, pipe.body)
        body = pipe.body
        if vq_ckpt or body_ckpt:
            src = vq_ckpt or body_ckpt
            ckpt = torch.load(src, map_location="cpu", weights_only=False)
            gen = ckpt.get("generator", ckpt)
            if "g_body" in gen:
                conv = tsconv.convert_body_vq_checkpoint(ckpt)
                (vb, st_b), (vh, st_h) = conv["body"], conv["hand"]
                body = body._replace(vq_body_vars=vb, vq_hand_vars=vh,
                                     vq_body_state=st_b, vq_hand_state=st_h)
        if body_ckpt:
            ckpt = torch.load(body_ckpt, map_location="cpu", weights_only=False)
            conv = tsconv.convert_body_pixel_checkpoint(ckpt)
            body = body._replace(prior_vars=conv["prior"],
                                 audio_enc_vars=conv["audio"])
        return cls(pipe.face_model, pipe.face_vars, body)

    def with_norm_stats(self, stats) -> "Pipeline":
        """Attach normalization stats: a (mean, std) tuple over the full
        pose channels or a path to a norm_stats.npy (saved by the Trainer
        when Data.pose.normalization is on)."""
        if isinstance(stats, str):
            arr = np.load(stats, allow_pickle=True)
            stats = (np.asarray(arr[0], np.float32),
                     np.asarray(arr[1], np.float32))
        return Pipeline(self.face_model, self.face_vars, self.body,
                        self.num_classes, stats)

    def _denorm_conv(self, conv):
        """Denormalize generated conv-channel poses when stats are set."""
        if self.norm_stats is None:
            return conv
        mean, std = (np.asarray(a, np.float32) for a in self.norm_stats)
        if mean.shape[-1] != conv.shape[-1]:
            from talkshow_tpu.ops.pose import C_INDEX_3D, C_INDEX_6D
            idx = C_INDEX_6D if mean.shape[-1] == 330 else C_INDEX_3D
            mean, std = mean[idx], std[idx]
        return conv * std + mean

    # ------------------------------------------------------------------
    # jitted stage functions, cached per shape bucket
    # ------------------------------------------------------------------
    @functools.cached_property
    def _face_fn(self):
        @functools.partial(jax.jit, static_argnames=("time_steps",))
        def run(face_vars, waveform, id_onehot, time_steps):
            return self.face_model.apply(face_vars, waveform, id_onehot,
                                         time_steps)
        return run

    @property
    def _body_arrays(self):
        return {k: getattr(self.body, k) for k in _BODY_VAR_KEYS}

    @functools.cached_property
    def _decode_tables(self):
        """Packed fused-decoder weights, built ONCE per pipeline: packing
        transposes ~60 MB of prior weights (~3 ms device) and must not be
        re-paid inside every generation program.  None off-TPU (the fused
        kernel is only auto-selected there)."""
        from talkshow_tpu.models.pixelcnn_pallas import (pack_decode_tables,
                                                         supports_fused)
        # supports_fused (not just bh_model): pack_decode_tables raises for
        # shapes the kernel can't lay out (dim not a LANE multiple — e.g.
        # tiny test models), where generate_conv_poses correctly falls back
        # to the XLA sampler and needs no tables.
        if jax.default_backend() != "tpu" or not supports_fused(
                self.body.prior):
            return None
        return jax.jit(
            lambda v: pack_decode_tables(self.body.prior, v))(
                self.body.prior_vars)

    @functools.cached_property
    def _body_fn(self):
        body = self.body  # module structure is static; weights are args

        @jax.jit
        def run(bvars, tables, mfcc_feat, speaker_id, rng):
            conv, tokens = generate_conv_poses(body._replace(**bvars),
                                               mfcc_feat, speaker_id, rng,
                                               tables=tables)
            return conv, tokens
        return run

    @functools.cached_property
    def _body_prefix_fn(self):
        body = self.body

        @functools.partial(jax.jit, static_argnames=("prefix_len",))
        def run(bvars, tables, mfcc_feat, speaker_id, rng, prefix_tokens,
                prefix_len):
            conv, tokens = generate_conv_poses(
                body._replace(**bvars), mfcc_feat, speaker_id, rng,
                prefix_tokens=prefix_tokens, prefix_len=prefix_len,
                tables=tables)
            return conv, tokens
        return run

    def generate_body_continuity(self, wav_file: str, speaker: int,
                                 num_samples: int = 1, seed: int = 0,
                                 sr_body: int = 22000):
        """Chunked long-audio generation (smplx_body_pixel.infer_on_audio
        continuity=True, :245-269): featurize the first 2 s and the rest
        separately (get_mfcc_sepa), sample the first chunk's tokens, then
        continue sampling the full grid with the first chunk teacher-forced
        as an autoregressive prefix (generate :158-165).

        sr_body defaults to 22 kHz like infer_on_audio (:232, sr=22000):
        the fps=30 MFCC hop of 734 samples is tuned for 22 kHz, so a
        16 kHz stream would yield ~21.8 feature frames/s consumed as
        30 fps (~27% slow motion)."""
        feat, gap = audio_ops.get_mfcc_sepa(wav_file, sr=sr_body, fps=30)
        S = num_samples
        ids = jnp.full((S,), speaker, jnp.int32)
        rng = jax.random.PRNGKey(seed)
        r0, r1 = jax.random.split(rng)

        feat0 = jnp.asarray(feat[:gap], jnp.float32)[None].repeat(S, 0)
        conv0, tokens0 = self._body_fn(self._body_arrays, self._decode_tables,
                                       feat0, ids, r0)
        h0 = tokens0.shape[1]

        feat_all = jnp.asarray(feat, jnp.float32)[None].repeat(S, 0)
        H = feat_all.shape[1] // 4
        prefix = jnp.zeros((S, H, 2), jnp.int32)
        prefix = prefix.at[:, :h0].set(tokens0)
        conv_all, _ = self._body_prefix_fn(self._body_arrays,
                                           self._decode_tables, feat_all,
                                           ids, r1, prefix, h0)
        return self._denorm_conv(np.asarray(conv_all))

    # ------------------------------------------------------------------
    def generate_face(self, wav16k: np.ndarray, frame: int | None = None):
        """Raw 16 kHz waveform (T,) -> (T_frames, 103) jaw+expression."""
        wav16k = np.asarray(wav16k, np.float32).reshape(-1)
        if frame is None:
            frame = int(len(wav16k) * 30 // 16000)
        # demo path uses a zero one-hot id (smplx_face.py:205-206)
        id_onehot = jnp.zeros((1, self.num_classes))
        out = self._face_fn(self.face_vars, jnp.asarray(wav16k)[None], id_onehot,
                            frame)
        return out[0]

    def generate_body(self, mfcc_feat: np.ndarray, speaker: int,
                      num_samples: int = 1, seed: int = 0,
                      pad_to_bucket: int | None = None):
        """MFCC (T, 64) -> conv poses (num_samples, 4*(T//4), 129).

        pad_to_bucket: serving mode — pad the frame axis up to a multiple
        of this bucket so arbitrary audio lengths reuse ONE compiled
        program.  The AR decode is causal, so padded tail rows cannot
        affect real frames; only the VQ decoder's local conv receptive
        field sees the boundary, and the padded tail is cropped off.
        """
        T = mfcc_feat.shape[0]
        if pad_to_bucket:
            Tp = _round_up(max(T, 4), pad_to_bucket * 4)
            mfcc_feat = np.pad(np.asarray(mfcc_feat), [[0, Tp - T], [0, 0]])
        feat = jnp.asarray(mfcc_feat, jnp.float32)[None].repeat(num_samples, 0)
        ids = jnp.full((num_samples,), speaker, jnp.int32)
        rng = jax.random.PRNGKey(seed)
        conv, _ = self._body_fn(self._body_arrays, self._decode_tables,
                                feat, ids, rng)
        if pad_to_bucket:
            conv = conv[:, : (T // 4) * 4]
        return self._denorm_conv(np.asarray(conv))

    def generate_body_sharded(self, mfcc_feat: np.ndarray, speaker: int,
                              num_samples: int, mesh, seed: int = 0,
                              axis: str = "dp"):
        """Diversity sampling sharded over a device mesh.

        The reference demo loops the body stage per sample
        (scripts/demo.py:195); here the sample batch is split over the
        mesh's `axis` and each device decodes its shard independently (no
        collectives needed — sampling is embarrassingly parallel).  With
        one sample per TPU device the per-shard batch is 1, so each device
        auto-selects the fused Pallas decoder: N chips produce N diverse
        samples in the device time of one.
        """
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        n = mesh.shape[axis]
        if num_samples % n:
            raise ValueError(f"num_samples={num_samples} not divisible by "
                             f"mesh axis '{axis}' size {n}")
        feat = jnp.asarray(mfcc_feat, jnp.float32)[None].repeat(num_samples, 0)
        ids = jnp.full((num_samples,), speaker, jnp.int32)
        # One key PER SHARD (not per sample): each shard's batched sampler
        # draws a (B_local, ...) gumbel block from its key, so rows within
        # a shard are already iid — per-sample keys would go unused.
        keys = jax.random.split(jax.random.PRNGKey(seed), n)
        body = self.body

        # check_vma off: the sampler's scan carry starts from constant
        # zeros (unvarying over dp), which trips the varying-manual-axes
        # analysis; there are no collectives here, each shard is
        # independent, so the check adds nothing.
        @functools.partial(shard_map, mesh=mesh,
                           in_specs=(P(), P(), P(axis), P(axis), P(axis)),
                           out_specs=P(axis), check_vma=False)
        def run(bvars, tables, feat_l, ids_l, keys_l):
            conv, _ = generate_conv_poses(body._replace(**bvars), feat_l,
                                          ids_l, keys_l[0], tables=tables)
            return conv

        conv = jax.jit(run)(self._body_arrays, self._decode_tables, feat,
                            ids, keys)
        return self._denorm_conv(np.asarray(conv))

    def generate(self, wav_file: str, speaker: int | str = 0,
                 num_samples: int = 1, only_face: bool = False,
                 stand: bool = False, seed: int = 0,
                 sr_body: int = 22000, continuity: bool = False) -> np.ndarray:
        """wav file -> (num_samples, T, 265) SMPL-X parameters @30fps.

        speaker: dataset id int (0-3) or name ('oliver', ...).
        Mirrors scripts/demo.py infer() assembly (:185-236).
        """
        if isinstance(speaker, str):
            speaker = SPEAKER_ID[speaker] - SPEAKER_OFFSET

        wav16, sr0 = audio_ops.load_wav(wav_file)
        if sr0 != 16000:
            wav16 = np.asarray(audio_ops.resample(jnp.asarray(wav16), sr0, 16000))
        face_out = np.asarray(self.generate_face(wav16))      # (T, 103)
        jaw, exp = face_out[:, :3], face_out[:, 3:]
        T = face_out.shape[0]

        if only_face:
            # static body (orient only) + predicted jaw/expression
            # (demo.py:167-169, 229)
            base = np.zeros((T, 232), np.float32)
            base[:, :3] = jaw
            base[:, -100:] = exp
            full = np.array(pose_ops.part2full(jnp.asarray(base), stand=True))
            return full[None]

        if continuity:
            conv = self.generate_body_continuity(wav_file, speaker,
                                                 num_samples, seed,
                                                 sr_body=sr_body)
        else:
            feat = audio_ops.get_mfcc(wav_file, sr=sr_body, fps=30)  # (Tm, 64)
            conv = np.asarray(self.generate_body(feat, speaker, num_samples, seed))
        return self.assemble_full(face_out, conv, stand)

    @staticmethod
    def assemble_full(face_out: np.ndarray, conv: np.ndarray,
                      stand: bool = False) -> np.ndarray:
        """Face (T, 103) + conv poses (S, Tb, 129) -> (S, T, 265) SMPL-X
        params: length-match the body to the face (demo.py:207-211), splice
        jaw+conv+expression, and part2full the lower body back in."""
        face_out = np.asarray(face_out, np.float32)
        jaw, exp = face_out[:, :3], face_out[:, 3:]
        T = face_out.shape[0]
        S, Tb, _ = conv.shape
        if Tb < T:
            pad = np.repeat(conv[:, -1:], T - Tb, axis=1)
            conv = np.concatenate([conv, pad], axis=1)
        else:
            conv = conv[:, :T]

        jaw_b = np.broadcast_to(jaw[None], (S, T, 3))
        exp_b = np.broadcast_to(exp[None], (S, T, 100))
        pred = jnp.asarray(np.concatenate([jaw_b, conv, exp_b], axis=-1))
        full = pose_ops.part2full(pred.reshape(S * T, -1), stand)
        return np.asarray(full).reshape(S, T, 265)


# ---------------------------------------------------------------------------
# Own checkpoint format (orbax)
# ---------------------------------------------------------------------------

def save_pipeline(pipe: Pipeline, path: str) -> None:
    """Persist all pipeline weights (face + body stages) as one orbax tree."""
    from talkshow_tpu.train.trainer import save_checkpoint

    body = pipe.body
    save_checkpoint(path, {
        "face_vars": pipe.face_vars,
        "vq_body_vars": body.vq_body_vars,
        "vq_hand_vars": body.vq_hand_vars,
        "vq_body_state": body.vq_body_state._asdict(),
        "vq_hand_state": body.vq_hand_state._asdict(),
        "audio_enc_vars": body.audio_enc_vars,
        "prior_vars": body.prior_vars,
    })


def load_pipeline(path: str, template: Pipeline | None = None) -> Pipeline:
    """Restore a pipeline saved by save_pipeline. `template` provides the
    module definitions (defaults to the full-size Pipeline.create)."""
    from talkshow_tpu.ops.vq import VQState
    from talkshow_tpu.train.trainer import load_checkpoint

    pipe = template if template is not None else Pipeline.create(0)
    body = pipe.body
    like = {
        "face_vars": pipe.face_vars,
        "vq_body_vars": body.vq_body_vars,
        "vq_hand_vars": body.vq_hand_vars,
        "vq_body_state": body.vq_body_state._asdict(),
        "vq_hand_state": body.vq_hand_state._asdict(),
        "audio_enc_vars": body.audio_enc_vars,
        "prior_vars": body.prior_vars,
    }
    t = load_checkpoint(path, like)
    body = body._replace(
        vq_body_vars=t["vq_body_vars"], vq_hand_vars=t["vq_hand_vars"],
        vq_body_state=VQState(**t["vq_body_state"]),
        vq_hand_state=VQState(**t["vq_hand_state"]),
        audio_enc_vars=t["audio_enc_vars"], prior_vars=t["prior_vars"])
    return Pipeline(pipe.face_model, t["face_vars"], body)
