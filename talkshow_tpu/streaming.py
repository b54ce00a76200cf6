"""Real-time streaming generation: audio chunks in, motion frames out.

The reference's long-audio story is a ONE-time 2-segment continuation
(smplx_body_pixel.infer_on_audio continuity=True: sample the first 2 s,
then re-sample the whole grid with that prefix teacher-forced —
gated_pixelcnn_v2.py:158-165).  That recomputes a growing grid every
segment: O(N^2) work over a stream and one XLA compile per length.

`StreamingSession` is the production streaming formulation: a sliding
window over the token grid.  Each step generates `chunk_rows` new token
rows conditioned on the last `context_rows` rows (teacher-forced prefix)
and the window's audio — after a short ramp-up the window shape is
fixed, so an arbitrary-length stream is served by
ceil(context_rows/chunk_rows)+1 compiled programs with O(1) work per
chunk.  The AR prior is causal in rows, so a `context_rows` prefix
approximates full-history conditioning the way any finite-context
decoder does; the VQ decoder's receptive field sits well inside the
context, so emitted frames are boundary-free.

The face stage streams the same way: wav2vec runs on the window's audio
and only the new frames are emitted (its attention is bidirectional
within the window, mirroring how the reference also recomputes face
features per segment).

Usage:
    sess = StreamingSession(pipe, speaker=0)
    for wav_chunk in audio_source:          # (chunk_rows*4/30 s of 16 kHz)
        motion = sess.feed(wav_chunk)       # (chunk_rows*4, 265) or None
    motion = sess.finish()                  # flush the remainder
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from talkshow_tpu.models.body import generate_conv_poses
from talkshow_tpu.ops import audio as audio_ops


#: 16 kHz samples per 30 fps output frame (exact: 16000/30 not integral;
#: chunks are counted in frames and sliced from a sample ring buffer)
_SR = 16000
_FPS = 30


def _samples_for(frames: int) -> int:
    """Smallest sample count whose frame count (len * FPS // SR, the
    wav2vec convention) is exactly `frames` — i.e. ceil(frames*SR/FPS)."""
    return -(-frames * _SR // _FPS)


@dataclass
class StreamingSession:
    """Chunked speech -> SMPL-X motion with bounded compiles and state."""
    pipe: Any
    speaker: int = 0
    chunk_rows: int = 8        # token rows emitted per step (x4 frames)
    context_rows: int = 16     # teacher-forced history rows
    stand: bool = False
    seed: int = 0
    #: tail of the audio stream: absolute sample index of _wav[0] is
    #: _wav_start; older samples are dropped (bounded memory — a session
    #: can run indefinitely)
    _wav: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float32))
    _wav_start: int = 0
    _tokens: np.ndarray | None = None      # last <= context_rows rows
    _rows_done: int = 0
    _emitted_frames: int = 0
    _step_fn: Any = None
    _finished: bool = False

    def __post_init__(self):
        pipe = self.pipe
        body = pipe.body
        face = pipe.face_model

        @functools.partial(jax.jit, static_argnames=("prefix_rows",))
        def step_fn(face_vars, bvars, tables, wav_win, prefix, key, sid,
                    prefix_rows):
            """One streaming step over the window: face + prefix-forced AR
            decode + VQ decode, one dispatch."""
            frames = wav_win.shape[0] * _FPS // _SR
            rows = frames // 4
            f = face.apply(face_vars, wav_win[None],
                           jnp.zeros((1, pipe.num_classes)), frames)
            wav22 = audio_ops.resample(wav_win, 16000, 22000)
            feat = audio_ops.mfcc(wav22, 22000, fps=_FPS)[:rows * 4]
            pref = jnp.zeros((1, rows, 2), jnp.int32)
            if prefix_rows:
                pref = pref.at[:, :prefix_rows].set(prefix[None])
            conv, tokens = generate_conv_poses(
                body._replace(**bvars), feat[None], sid[None], key,
                prefix_tokens=pref, prefix_len=prefix_rows, tables=tables)
            return f[0], conv[0], tokens[0]

        self._step_fn = step_fn

    # ------------------------------------------------------------------
    @property
    def _chunk_frames(self) -> int:
        return self.chunk_rows * 4

    def feed(self, wav16: np.ndarray):
        """Append audio; returns every newly completed (chunk_rows*4, 265)
        motion block concatenated, or None if a chunk hasn't filled yet."""
        if self._finished:
            raise RuntimeError("StreamingSession.feed() after finish(): "
                               "finish() pads the ring buffer with zeros, "
                               "so further audio would misalign frame "
                               "accounting. Start a new session.")
        wav16 = np.asarray(wav16, np.float32).reshape(-1)
        self._wav = np.concatenate([self._wav, wav16])
        out = []
        while self._wav_start + len(self._wav) >= _samples_for(
                self._emitted_frames + self._chunk_frames):
            out.append(self._step())
        return np.concatenate(out) if out else None

    def finish(self):
        """Zero-pad the tail to a full chunk and emit it (or None if no
        un-emitted frames remain).  Closes the session: later feed()
        raises (the pad zeros are in the ring buffer)."""
        self._finished = True
        total = self._wav_start + len(self._wav)
        rem_frames = total * _FPS // _SR - self._emitted_frames
        if rem_frames <= 0:
            return None
        pad = _samples_for(self._emitted_frames + self._chunk_frames) - total
        if pad > 0:
            self._wav = np.concatenate(
                [self._wav, np.zeros(pad, np.float32)])
        out = self._step()
        return out[:rem_frames]

    # ------------------------------------------------------------------
    def _step(self):
        pipe = self.pipe
        # ramp-up: until context_rows of history exist, teacher-force all
        # of it; afterwards the window shape is fixed (steady state), so a
        # stream compiles ceil(context/chunk)+1 programs total
        prefix_rows = min(self._rows_done, self.context_rows)
        rows = prefix_rows + self.chunk_rows
        frames = rows * 4

        end = _samples_for(self._emitted_frames + self._chunk_frames)
        n_win = _samples_for(frames)
        wav_win = np.zeros(n_win, np.float32)
        lo = max(0, end - n_win)
        seg = self._wav[max(0, lo - self._wav_start):end - self._wav_start]
        wav_win[n_win - len(seg):] = seg

        prefix = (np.zeros((0, 2), np.int32) if prefix_rows == 0
                  else self._tokens[-prefix_rows:])

        key = jax.random.fold_in(jax.random.PRNGKey(self.seed),
                                 self._rows_done)
        f, conv, tokens = self._step_fn(
            pipe.face_vars, pipe._body_arrays, pipe._decode_tables,
            jnp.asarray(wav_win), jnp.asarray(prefix), key,
            jnp.asarray(self.speaker, jnp.int32), prefix_rows)
        f, conv, tokens = (np.asarray(f), np.asarray(conv),
                           np.asarray(tokens))
        conv = pipe._denorm_conv(conv)

        new_tok = tokens[prefix_rows:]
        hist = (new_tok if self._tokens is None
                else np.concatenate([self._tokens, new_tok]))
        self._tokens = hist[-self.context_rows:]   # bounded history
        self._rows_done += self.chunk_rows

        # drop audio the next window can no longer reach (bounded memory)
        steady_win = _samples_for((self.context_rows + self.chunk_rows) * 4)
        keep_from = max(0, end - steady_win)
        if keep_from > self._wav_start:
            self._wav = self._wav[keep_from - self._wav_start:]
            self._wav_start = keep_from

        # emit only the NEW frames (tail of the window)
        f_new = f[-self._chunk_frames:]
        conv_new = conv[-self._chunk_frames:]
        self._emitted_frames += self._chunk_frames
        full = pipe.assemble_full(f_new, conv_new[None], self.stand)
        return full[0]
