"""Benchmark: 10 s of audio -> whole-body SMPL-X motion, p50 latency.

Prints ONE JSON line:
  {"metric": "p50_latency_10s_clip_ms", "value": N, "unit": "ms",
   "vs_baseline": N, ...}

Baseline = the rebuild target from BASELINE.md: < 250 ms p50 per 10 s clip
on one chip.  vs_baseline > 1 means faster than target.  Also reports
motion-seconds generated per wall-second per chip as a secondary metric.
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_P50_MS = 250.0
CLIP_SECONDS = 10.0


def main():
    import jax
    import jax.numpy as jnp

    from talkshow_tpu.models.body import create_body_models, generate_conv_poses
    from talkshow_tpu.models.face import FaceGenerator
    from talkshow_tpu.ops import audio as audio_ops

    rng = jax.random.PRNGKey(0)
    r_face, r_body, r_sample = jax.random.split(rng, 3)

    # ---- build models (random weights; compute cost identical to trained)
    face = FaceGenerator()
    n_samples_wav = int(16000 * CLIP_SECONDS)
    frames = int(n_samples_wav * 30 // 16000)          # 300
    face_vars = face.init(r_face, jnp.zeros((1, 1600)), jnp.zeros((1, 4)), 3)
    body = create_body_models(r_body)

    # ---- inputs: 10 s synthetic speech-like audio
    t = np.arange(n_samples_wav) / 16000.0
    wav16 = (0.3 * np.sin(2 * np.pi * 220 * t) *
             (1 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
    wav22 = audio_ops.resample(jnp.asarray(wav16), 16000, 22000)

    @jax.jit
    def featurize(wav22):
        return audio_ops.mfcc(wav22, 22000, fps=30)

    @jax.jit
    def run_face(face_vars, wav):
        return face.apply(face_vars, wav, jnp.zeros((1, 4)), frames)

    @jax.jit
    def run_body(feat, rng):
        conv, tokens = generate_conv_poses(
            body, feat[None], jnp.zeros((1,), jnp.int32), rng)
        return conv

    def pipeline_once(key):
        feat = featurize(wav22)
        f = run_face(face_vars, jnp.asarray(wav16)[None])
        b = run_body(feat, key)
        jax.block_until_ready((f, b))
        return f, b

    # ---- warmup (compile)
    pipeline_once(r_sample)

    # ---- timed runs
    lat = []
    for i in range(10):
        k = jax.random.fold_in(r_sample, i)
        t0 = time.perf_counter()
        pipeline_once(k)
        lat.append((time.perf_counter() - t0) * 1000.0)
    p50 = float(np.percentile(lat, 50))
    motion_sec_per_sec = CLIP_SECONDS / (p50 / 1000.0)

    print(json.dumps({
        "metric": "p50_latency_10s_clip_ms",
        "value": round(p50, 2),
        "unit": "ms",
        "vs_baseline": round(BASELINE_P50_MS / p50, 3),
        "extra": {
            "motion_sec_per_sec_per_chip": round(motion_sec_per_sec, 2),
            "baseline_p50_ms": BASELINE_P50_MS,
            "latencies_ms": [round(x, 1) for x in lat],
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
