"""Split the wav2vec face stage into extractor / pre-layers / transformer
/ heads and time each at a given batch, f32 vs bf16 compute dtype.

Rationale: the conv extractor is ~50 GFLOP per 10 s clip and the 12-layer
transformer at 300 frames ~51 GFLOP; at B=8 the whole stage measured
12.6 ms (bf16 ~= f32) = ~65 TFLOPS.  On v5e the DEFAULT matmul precision
already multiplies f32 operands in bf16 passes, so dtype=bf16 buys only
bandwidth — this script shows which piece is below the roofline.

Usage: python scripts/profile_face_stage.py [B]
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

    from talkshow_tpu.models.face import FaceGenerator
    from talkshow_tpu.models.wav2vec import (FeatureExtractor,
                                             Wav2Vec2Config,
                                             Wav2Vec2Encoder)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n, frames = 160000, 300
    rng = jax.random.PRNGKey(0)

    t = np.arange(n) / 16000.0
    wav = (0.3 * np.sin(2 * np.pi * 220 * t) *
           (1 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
    wavB = jnp.tile(jnp.asarray(wav)[None], (B, 1))
    onehotB = jnp.zeros((B, 4))

    face32 = FaceGenerator()
    face_vars = face32.init(rng, jnp.zeros((1, 1600)), jnp.zeros((1, 4)), 3)
    w2v_params = {"params": face_vars["params"]["audio_encoder"]}
    ext_params = {"params":
                  face_vars["params"]["audio_encoder"]["feature_extractor"]}

    def chain_ms(fn, *fn_args, K=64):
        @jax.jit
        def run_k(key, *args):
            def step(c, k):
                out = fn(k, *args)
                return c, jax.tree_util.tree_map(
                    lambda x: jnp.sum(x, dtype=jnp.float32), out)
            _, outs = jax.lax.scan(step, 0, jax.random.split(key, K))
            return outs
        r = run_k(jax.random.PRNGKey(1), *fn_args)
        jax.tree_util.tree_map(np.asarray, r)
        t0 = time.perf_counter()
        r = run_k(jax.random.PRNGKey(2), *fn_args)
        jax.tree_util.tree_map(np.asarray, r)
        return (time.perf_counter() - t0) * 1000.0 / K

    def jit_in(w, k):
        return w.at[0, 0].add(1e-9 * k[0].astype(w.dtype))

    out = {"batch": B, "backend": jax.default_backend()}
    for tag, dt in (("f32", None), ("bf16", jnp.bfloat16)):
        cfg = Wav2Vec2Config(dtype=dt)
        ext = FeatureExtractor(cfg)
        w2v = Wav2Vec2Encoder(cfg)
        faced = FaceGenerator(wav2vec_cfg=cfg)

        def stage(name, fn, *args):
            ms = chain_ms(fn, *args)
            out[f"{name}_{tag}_ms"] = round(ms, 3)
            print(f"[face B={B}] {name} {tag}: {ms:.3f} ms",
                  file=sys.stderr, flush=True)

        stage("extractor",
              lambda k, p, w: ext.apply(p, jit_in(w, k)), ext_params, wavB)
        stage("pre_layers",
              lambda k, p, w: w2v.apply(p, jit_in(w, k), frames,
                                        method=Wav2Vec2Encoder.pre_layers),
              w2v_params, wavB)
        stage("wav2vec_full",
              lambda k, p, w: w2v.apply(p, jit_in(w, k), frames),
              w2v_params, wavB)
        hidden = w2v.apply(w2v_params, wavB, frames).astype(jnp.float32)
        stage("heads",
              lambda k, fv, h: faced.apply(
                  fv, jit_in(h, k), onehotB,
                  method=FaceGenerator.from_features),
              face_vars, hidden)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
