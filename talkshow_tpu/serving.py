"""Production serving front-end: bucketed, batched, compile-once.

The reference has no serving story (scripts/demo.py is a one-shot CLI).
This module turns the pipeline into a request server shaped for TPU
serving economics:

* **Compile-once buckets.** XLA compiles per shape; arbitrary audio
  lengths would compile O(#lengths) programs (30+ s each over a remote
  attach).  Requests are padded to `bucket_frames` multiples, so traffic
  is served by O(#buckets) programs, all compiled up front by
  `warmup()` — no compile stall on the serving path.  The face stage uses
  the masked wav2vec path (valid_samples/valid_frames) so padded clips
  produce the same values as unpadded ones; the body stage relies on the
  AR decode's causality (padded tail rows cannot influence real frames —
  same argument as `Pipeline.generate_body(pad_to_bucket=...)`).
* **Batched flushes.** Queued requests are grouped by bucket and served
  as one program execution per (bucket, batch) — one dispatch amortizes
  the host<->device round trip across the whole group (the tunnel RTT,
  ~30 ms on a remote attach, dominates single-request latency).
* **Determinism note.** A flush samples the whole group with one PRNG
  key; a request's tokens depend on its position in the batch (standard
  for batched samplers).  For bitwise per-request reproducibility submit
  alone and use a fixed seed.

Usage:
    server = MotionServer(pipe, bucket_frames=32, max_batch=8)
    server.warmup(max_clip_seconds=12)
    rid = server.submit(wav16k, speaker=0)
    motions = server.flush()         # {rid: (T, 265) float32}
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from talkshow_tpu.ops import audio as audio_ops
from talkshow_tpu.ops import pose as pose_ops

#: 16 kHz samples per 30 fps frame, rounded up (buffer always fits)
_SPF = -(-16000 // 30)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclass
class _Request:
    rid: int
    wav16: np.ndarray       # (N,) float32 @ 16 kHz
    speaker: int
    frames: int             # true output frames (N * 30 // 16000)
    bucket: int             # padded frame count


@dataclass
class MotionServer:
    """Bucketed batch server over a `Pipeline` (speech -> (T, 265)).

    mesh: optional `jax.sharding.Mesh` — each group's batch is sharded
    over `mesh_axis` (requests are independent; no collectives), so N
    chips serve a group in the device time of max_batch/N requests.
    `max_batch` must be a multiple of the axis size.

    Bandwidth note: requests carry 16 kHz audio, and the body MFCCs are
    computed from a 16->22 kHz sinc upsample, so spectral content above
    8 kHz is absent.  `Pipeline.generate` loads the wav natively at
    22 kHz; the same clip therefore yields slightly different body
    features on the serving path.  Parity-critical callers should use
    the offline path (or submit audio captured at >=22 kHz downsampled
    to 16 kHz, where the difference is only the 8-11 kHz band — far
    above the speech energy that drives the MFCC features).
    """
    pipe: Any
    bucket_frames: int = 32
    max_batch: int = 8
    stand: bool = False
    mesh: Any = None
    mesh_axis: str = "dp"
    #: host->device waveform dtype.  "int16" (default) transfers PCM
    #: samples and dequantizes ON DEVICE — half the bytes of f32 on a
    #: bandwidth-bound link (serve_bench: the remote tunnel dominates
    #: wall-clock).  Lossless for wav-file audio (16-bit PCM native);
    #: float-sourced audio is rounded to the int16 grid (<=1/65536 per
    #: sample).  "float32" keeps the exact submitted samples.
    transfer_dtype: str = "int16"
    _queue: list = field(default_factory=list)
    _next_id: int = 0
    _flush_count: int = 0
    _group_fn: Any = None

    # ------------------------------------------------------------------
    def __post_init__(self):
        from talkshow_tpu.models.body import generate_conv_poses

        pipe = self.pipe
        face = pipe.face_model
        body = pipe.body          # module structure static; weights are args
        if self.mesh is not None and self.max_batch % \
                self.mesh.shape[self.mesh_axis]:
            raise ValueError(
                f"max_batch={self.max_batch} not divisible by mesh axis "
                f"'{self.mesh_axis}' size {self.mesh.shape[self.mesh_axis]}")

        def core(face_vars, bvars, tables, norm, wav, onehot, ids, vs, vf,
                 keys, *, time_steps, stand):
            """The WHOLE group in one program — face, featurize, AR body
            decode, denorm, assembly — so a flush pays exactly one
            dispatch + readback per (bucket, batch) group."""
            if wav.dtype == jnp.int16:      # PCM transfer: dequantize here
                wav = wav.astype(jnp.float32) * (1.0 / 32768.0)
            face_out = face.apply(face_vars, wav, onehot, time_steps,
                                  valid_samples=vs, valid_frames=vf)
            wav22 = jax.vmap(lambda w: audio_ops.resample(w, 16000, 22000))(
                wav)
            feat = jax.vmap(lambda w: audio_ops.mfcc(w, 22000, fps=30))(
                wav22)
            Tp = _round_up(max(feat.shape[1], 4), 4)
            feat = jnp.pad(feat, ((0, 0), (0, Tp - feat.shape[1]), (0, 0)))
            # ONE batched AR decode for the whole group: the fused Pallas
            # kernel carries the request batch in its sublane axis, so B
            # requests decode in ~the device time of one (vs the round-2
            # per-request unroll at B sequential decodes).  keys[0] seeds
            # the batch; rows draw iid noise from the batched gumbel
            # blocks, so per-request motion is deterministic per
            # (seed, group composition) rather than per-request key.
            b = body._replace(**bvars)
            conv, _ = generate_conv_poses(b, feat, ids, keys[0],
                                          tables=tables)
            if norm is not None:
                conv = conv * norm[1] + norm[0]
            # length-match the body to the face bucket (demo.py:207-211)
            B, Tb = conv.shape[:2]
            if Tb < time_steps:
                pad = jnp.repeat(conv[:, -1:], time_steps - Tb, axis=1)
                conv = jnp.concatenate([conv, pad], axis=1)
            else:
                conv = conv[:, :time_steps]
            pred = jnp.concatenate(
                [face_out[..., :3], conv, face_out[..., 3:]], axis=-1)
            full = pose_ops.part2full(
                pred.reshape(B * time_steps, -1), stand)
            return full.reshape(B, time_steps, 265)

        @functools.partial(jax.jit,
                           static_argnames=("time_steps", "stand"))
        def group_fn(face_vars, bvars, tables, norm, wav, onehot, ids, vs,
                     vf, keys, time_steps, stand):
            bound = functools.partial(core, time_steps=time_steps,
                                      stand=stand)
            if self.mesh is None:
                return bound(face_vars, bvars, tables, norm, wav, onehot,
                             ids, vs, vf, keys)
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            ax = self.mesh_axis
            return shard_map(
                bound, mesh=self.mesh,
                in_specs=(P(), P(), P(), P(), P(ax), P(ax), P(ax), P(ax),
                          P(ax), P(ax)),
                out_specs=P(ax), check_vma=False)(
                    face_vars, bvars, tables, norm, wav, onehot, ids, vs,
                    vf, keys)

        self._group_fn = group_fn

    # ------------------------------------------------------------------
    def submit(self, wav16: np.ndarray, speaker: int = 0) -> int:
        """Queue one request; returns its id (resolved by `flush`).

        Accepts float32 samples in [-1, 1] or int16 PCM.  With
        transfer_dtype="int16" the audio is held and transferred as PCM
        (float input is rounded to the int16 grid — exact for audio that
        was ever 16-bit PCM)."""
        wav16 = np.asarray(wav16).reshape(-1)
        if self.transfer_dtype == "int16":
            if wav16.dtype != np.int16:
                wav16 = np.clip(np.round(wav16.astype(np.float32) * 32768.0),
                                -32768, 32767).astype(np.int16)
        else:
            wav16 = (wav16.astype(np.float32) / 32768.0
                     if wav16.dtype == np.int16
                     else wav16.astype(np.float32))
        frames = int(len(wav16) * 30 // 16000)
        if frames < 1:
            raise ValueError("audio shorter than one frame")
        bucket = _round_up(frames, self.bucket_frames)
        rid = self._next_id
        self._next_id += 1
        self._queue.append(_Request(rid, wav16, speaker, frames, bucket))
        return rid

    def pending(self) -> int:
        return len(self._queue)

    # ------------------------------------------------------------------
    def warmup(self, max_clip_seconds: float = 12.0) -> int:
        """Pre-compile the group program for every bucket a clip of up to
        `max_clip_seconds` can land in (a clip near the limit rounds UP to
        the next bucket).  Returns the number of programs traced."""
        top = _round_up(int(max_clip_seconds * 30) + 1, self.bucket_frames)
        n = 0
        frames = self.bucket_frames
        while frames <= top:
            np.asarray(self._run_group(frames, self.max_batch,
                                       requests=None))
            n += 1
            frames += self.bucket_frames
        return n

    # ------------------------------------------------------------------
    @functools.cached_property
    def _norm_arrays(self):
        """(mean, std) over the 129 conv channels, sliced exactly like
        Pipeline._denorm_conv (incl. the 6D-rep case), or None."""
        if self.pipe.norm_stats is None:
            return None
        mean, std = (np.asarray(a, np.float32) for a in self.pipe.norm_stats)
        if mean.shape[-1] not in (129, 258):
            from talkshow_tpu.ops.pose import C_INDEX_3D, C_INDEX_6D
            idx = C_INDEX_6D if mean.shape[-1] == 330 else C_INDEX_3D
            mean, std = mean[idx], std[idx]
        return (jnp.asarray(mean), jnp.asarray(std))

    def _run_group(self, bucket: int, B: int, requests, key=None):
        """DISPATCH one program execution for a (bucket, batch-size)
        group; returns the un-materialized device array (jax dispatch is
        async, so the caller can overlap the next group's host work and
        transfer with this group's compute).  With requests=None runs
        zero-filled dummies (warmup trace)."""
        pipe = self.pipe
        # +1 frame of slack: a wav whose floor(len*30/16000) == bucket can
        # still hold up to ~_SPF more samples than bucket*_SPF
        nb = (bucket + 1) * _SPF
        wdtype = np.int16 if self.transfer_dtype == "int16" else np.float32
        wav = np.zeros((B, nb), wdtype)
        ids1 = np.zeros((B,), np.int32)
        onehot = np.zeros((B, pipe.num_classes), np.float32)
        vs = np.full((B,), nb, np.int32)
        vf = np.full((B,), bucket, np.int32)
        if requests:
            for j, r in enumerate(requests):
                n = len(r.wav16)
                wav[j, :n] = r.wav16
                ids1[j] = r.speaker
                vs[j], vf[j] = n, r.frames
                # demo face path uses a zero one-hot id (smplx_face.py:205)

        if key is None:
            key = jax.random.PRNGKey(0)
        keys = jax.random.split(key, B)          # one key per shard row
        return self._group_fn(pipe.face_vars, pipe._body_arrays,
                              pipe._decode_tables, self._norm_arrays,
                              jnp.asarray(wav), jnp.asarray(onehot),
                              jnp.asarray(ids1), jnp.asarray(vs),
                              jnp.asarray(vf), keys, bucket, self.stand)

    # ------------------------------------------------------------------
    def flush(self, seed: int | None = None) -> dict[int, np.ndarray]:
        """Serve every queued request; returns {rid: (T, 265)}.

        seed=None (default) mixes an internal flush counter into the PRNG
        so repeated flushes sample fresh noise; pass a seed for
        reproducible sampling (same seed + same queue -> same motion).

        Two-phase: every group is DISPATCHED first (async — host->device
        transfer and compute of group N overlap the host packing of
        group N+1), then all results are read back.  Requests leave the
        queue only after their group's readback succeeds, so a failure
        mid-flush keeps the unserved remainder queued for retry.
        """
        groups: dict[int, list] = {}
        for r in self._queue:
            groups.setdefault(r.bucket, []).append(r)

        base = jax.random.PRNGKey(self._flush_count if seed is None
                                  else seed)
        self._flush_count += 1
        dispatched: list = []
        err: Exception | None = None
        for bucket in sorted(groups):
            reqs = groups[bucket]
            for i in range(0, len(reqs), self.max_batch):
                chunk = reqs[i:i + self.max_batch]
                # partial groups run at max_batch with zero-filled rows so
                # traffic never compiles a new batch shape (compile-once);
                # key is distinct per (bucket, group) to avoid cross-group
                # noise reuse
                key = jax.random.fold_in(jax.random.fold_in(base, bucket), i)
                try:
                    fut = self._run_group(bucket, self.max_batch, chunk,
                                          key=key)
                except Exception as e:         # keep earlier groups alive
                    err = e
                    break
                dispatched.append((chunk, fut))
            if err is not None:
                break

        out: dict[int, np.ndarray] = {}
        for chunk, fut in dispatched:
            full = np.asarray(fut)             # readback (synchronizes)
            served = set()
            for j, r in enumerate(chunk):
                out[r.rid] = full[j, :r.frames]
                served.add(r.rid)
            self._queue = [q for q in self._queue if q.rid not in served]
        if err is not None:
            raise err
        return out
