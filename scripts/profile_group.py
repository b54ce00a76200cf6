"""Per-stage device time of the BATCHED serving group (B clips in one
program) — where bench.py's `batched` number goes.

At B=1 the pipeline stages cost (r3): mfcc 0.5, face 2.56, audio-enc
0.45, fused AR decode 2.12, vq 0.56 ms.  The fused decoder batches over
sublanes (B<=32 ~ one decode), but the other stages scale with B; this
script measures each at the group batch so the next optimization target
is the measured, not the assumed, bottleneck.

Usage: python scripts/profile_group.py [B]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from talkshow_tpu.models.body import create_body_models
    from talkshow_tpu.models.face import FaceGenerator
    from talkshow_tpu.models.pixelcnn_pallas import (pack_decode_tables,
                                                     sample_tokens_fused)
    from talkshow_tpu.models.vqvae import VQVAE
    from talkshow_tpu.models.wav2vec import Wav2Vec2Config
    from talkshow_tpu.ops import audio as audio_ops

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rng = jax.random.PRNGKey(0)
    r_face, r_body, r_sample = jax.random.split(rng, 3)

    on_tpu = jax.default_backend() == "tpu"
    face_dtype = jnp.bfloat16 if on_tpu else None
    face = FaceGenerator(wav2vec_cfg=Wav2Vec2Config(dtype=face_dtype))
    face32 = FaceGenerator()
    n = 160000
    frames = 300
    face_vars = face.init(r_face, jnp.zeros((1, 1600)), jnp.zeros((1, 4)), 3)
    body = create_body_models(r_body)
    tables = (jax.jit(lambda v: pack_decode_tables(body.prior, v))(
        body.prior_vars) if on_tpu else None)

    t = np.arange(n) / 16000.0
    wav = (0.3 * np.sin(2 * np.pi * 220 * t) *
           (1 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
    wavB = jnp.tile(jnp.asarray(wav)[None], (B, 1))
    onehotB = jnp.zeros((B, 4))
    idsB = jnp.zeros((B,), jnp.int32)

    def chain_ms(fn, *fn_args, K=64):
        @jax.jit
        def run_k(key, *args):
            def step(c, k):
                out = fn(k, *args)
                return c, jax.tree_util.tree_map(
                    lambda x: jnp.sum(x, dtype=jnp.float32), out)
            _, outs = jax.lax.scan(step, 0, jax.random.split(key, K))
            return outs
        r = run_k(r_sample, *fn_args)
        jax.tree_util.tree_map(np.asarray, r)
        t0 = time.perf_counter()
        r = run_k(jax.random.fold_in(r_sample, 1), *fn_args)
        jax.tree_util.tree_map(np.asarray, r)
        return (time.perf_counter() - t0) * 1000.0 / K

    def jit_wav(w, k):
        return w.at[0, 0].add(1e-9 * k[0].astype(w.dtype))

    wav22B = jax.jit(jax.vmap(
        lambda x: audio_ops.resample(x, 16000, 22000)))(wavB)
    featB = jax.jit(jax.vmap(
        lambda w: audio_ops.mfcc(w, 22000, fps=30)))(wav22B)
    audioB = body.audio_enc.apply(body.audio_enc_vars, featB)

    out = {"batch": B, "backend": jax.default_backend()}
    stages = {
        "mfcc+resample": (lambda k, w: jax.vmap(
            lambda x: audio_ops.mfcc(audio_ops.resample(x, 16000, 22000),
                                     22000, fps=30))(jit_wav(w, k)), wavB),
        "face_bf16": (lambda k, fv, w: face.apply(
            fv, jit_wav(w, k), jnp.zeros((B, 4)), frames), face_vars, wavB),
        "face_f32": (lambda k, fv, w: face32.apply(
            fv, jit_wav(w, k), jnp.zeros((B, 4)), frames), face_vars, wavB),
        "audio_encoder": (lambda k, av, f: body.audio_enc.apply(
            av, jit_wav(f, k)), body.audio_enc_vars, featB),
        "vq_decode": (lambda k, vv, vs, a: body.vq_body.apply(
            vv, jnp.zeros((B, a.shape[1]), jnp.int32
                          ).at[0, 0].set((k[0] % 64).astype(jnp.int32)), vs,
            method=VQVAE.decode_latents),
            body.vq_body_vars, body.vq_body_state, audioB),
    }
    if on_tpu:
        stages["ar_decode_fused"] = (
            lambda k, tb, pv, i0, ac: sample_tokens_fused(
                body.prior, pv, i0, jit_wav(ac, k), k, tables=tb),
            tables, body.prior_vars, idsB, audioB)
    for name, (fn, *fargs) in stages.items():
        out[name + "_ms"] = round(chain_ms(fn, *fargs), 3)
        print(f"[group B={B}] {name}: {out[name + '_ms']} ms",
              file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
