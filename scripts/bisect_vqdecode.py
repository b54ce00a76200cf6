#!/usr/bin/env python
"""One-off: explain the r2->r3 vq_decode/device_ms drift (VERDICT weak #1).

Measures the vq_decode stage and the full pipeline with BOTH chain
reducers — round 2's `reshape(-1)[-1]` (single-element read; invites DCE)
and round 3's `jnp.sum` (consumes every element) — on the SAME code.  If
the old reducer reproduces the old (smaller) numbers, the drift is a
harness correction, not a model regression.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from talkshow_tpu.models.body import create_body_models, generate_conv_poses
    from talkshow_tpu.models.face import FaceGenerator
    from talkshow_tpu.models.pixelcnn_pallas import pack_decode_tables
    from talkshow_tpu.models.vqvae import VQVAE
    from talkshow_tpu.models.wav2vec import Wav2Vec2Config
    from talkshow_tpu.ops import audio as audio_ops

    rng = jax.random.PRNGKey(0)
    r_face, r_body, r_sample = jax.random.split(rng, 3)
    body = create_body_models(r_body)
    face_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else None
    face = FaceGenerator(wav2vec_cfg=Wav2Vec2Config(dtype=face_dtype))
    face_vars = face.init(r_face, jnp.zeros((1, 1600)), jnp.zeros((1, 4)), 3)

    n = int(16000 * 10)
    frames = n * 30 // 16000
    t = np.arange(n) / 16000.0
    wav16 = (0.3 * np.sin(2 * np.pi * 220 * t) *
             (1 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
    wav_dev = jax.device_put(jnp.asarray(wav16))
    wav22 = audio_ops.resample(wav_dev, 16000, 22000)
    feat = jax.jit(lambda w: audio_ops.mfcc(w, 22000, fps=30))(wav22)
    audio_cond = body.audio_enc.apply(body.audio_enc_vars, feat[None])
    tok_fixed = jnp.zeros((1, audio_cond.shape[1], 2), jnp.int32)
    tables = (jax.jit(lambda v: pack_decode_tables(body.prior, v))(
        body.prior_vars) if jax.default_backend() == "tpu" else None)
    body_vars = {k: getattr(body, k) for k in (
        "vq_body_vars", "vq_hand_vars", "vq_body_state", "vq_hand_state",
        "audio_enc_vars", "prior_vars")}

    def chain_ms(fn, *fn_args, K=64, reducer="sum"):
        @jax.jit
        def run_k(key, *args):
            def step(c, k):
                out = fn(k, *args)
                if reducer == "sum":
                    red = lambda x: jnp.sum(x, dtype=jnp.float32)
                else:  # round-2 reducer
                    red = lambda x: x.reshape(-1)[-1].astype(jnp.float32)
                return c, jax.tree_util.tree_map(red, out)
            _, outs = jax.lax.scan(step, 0, jax.random.split(key, K))
            return outs
        r = run_k(r_sample, *fn_args)
        jax.tree_util.tree_map(np.asarray, r)
        best = np.inf
        for i in range(3):
            t0 = time.perf_counter()
            r = run_k(jax.random.fold_in(r_sample, 1 + i), *fn_args)
            jax.tree_util.tree_map(np.asarray, r)
            best = min(best, (time.perf_counter() - t0) * 1000.0 / K)
        return best

    vq_stage = (lambda k, vv, vs, tk: body.vq_body.apply(
        vv, tk[..., 0].at[0, 0].set((k[0] % 64).astype(jnp.int32)), vs,
        method=VQVAE.decode_latents),
        body.vq_body_vars, body.vq_body_state, tok_fixed)

    def full(k, fv, bv, tb, w):
        b = body._replace(**bv)
        w = w.at[0].add(1e-9 * k[0].astype(w.dtype))
        wav22 = audio_ops.resample(w, 16000, 22000)
        feat = audio_ops.mfcc(wav22, 22000, fps=30)
        f = face.apply(fv, w[None], jnp.zeros((1, 4)), frames)
        conv, _ = generate_conv_poses(b, feat[None],
                                      jnp.zeros((1,), jnp.int32), k,
                                      tables=tb)
        return f, conv

    for red in ("sum", "last"):
        fn, *fargs = vq_stage
        ms = chain_ms(fn, *fargs, K=64, reducer=red)
        print(f"vq_decode reducer={red}: {ms:.3f} ms", flush=True)
    for red in ("sum", "last"):
        ms = chain_ms(full, face_vars, body_vars, tables, wav_dev,
                      K=64, reducer=red)
        print(f"full_pipeline reducer={red}: {ms:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
