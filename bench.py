"""Benchmark: 10 s of audio -> whole-body SMPL-X motion.

Prints ONE JSON line:
  {"metric": "p50_latency_10s_clip_ms", "value": N, "unit": "ms",
   "vs_baseline": N, ...}

Baseline = the rebuild target from BASELINE.md: < 250 ms p50 per 10 s clip
on one chip.  vs_baseline > 1 means faster than target.

The whole pipeline (MFCC featurization + wav2vec face generator + cached
AR PixelCNN decode + VQ decode) is ONE jitted XLA program, so a clip costs
a single dispatch + readback.  Because the chip may be remote-attached
(RTT-dominated single calls), we also report amortized throughput over a
batch of pipelined dispatches — the number that matters for serving.
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

    @jax.jit
    def run_clip_impl(face_vars, body_vars, wav16, key):
        """Full pipeline, one dispatch: wav -> (face (1,T,103), conv poses).
        Model variables are jit arguments (NOT closed over) so weights are
        inputs rather than giant embedded HLO constants (the remote-compile
        path rejects multi-hundred-MB programs)."""
        b = body._replace(**body_vars)
        wav22 = audio_ops.resample(wav16, 16000, 22000)
        feat = audio_ops.mfcc(wav22, 22000, fps=30)
        f = face.apply(face_vars, wav16[None], jnp.zeros((1, 4)), frames)
        conv, _ = generate_conv_poses(b, feat[None],
                                      jnp.zeros((1,), jnp.int32), key)
        return f, conv

    body_vars = {k: getattr(body, k) for k in (
        "vq_body_vars", "vq_hand_vars", "vq_body_state", "vq_hand_state",
        "audio_enc_vars", "prior_vars")}

    def run_clip(wav16, key):
        return run_clip_impl(face_vars, body_vars, wav16, key)

    wav_dev = jax.device_put(jnp.asarray(wav16))

    def once(key):
        f, b = run_clip(wav_dev, key)
        return np.asarray(f), np.asarray(b)   # forced readback

    once(r_sample)  # warmup/compile

    # ---- single-clip latency (includes one host<->device round trip)
    lat = []
    for i in range(10):
        k = jax.random.fold_in(r_sample, i)
        t0 = time.perf_counter()
        once(k)
        lat.append((time.perf_counter() - t0) * 1000.0)
    p50 = float(np.percentile(lat, 50))

    # ---- amortized throughput: pipeline N dispatches, one readback wave
    N = 16
    keys = [jax.random.fold_in(r_sample, 100 + i) for i in range(N)]
    t0 = time.perf_counter()
    outs = [run_clip(wav_dev, k) for k in keys]
    for f, b in outs:
        np.asarray(f), np.asarray(b)
    amortized_ms = (time.perf_counter() - t0) * 1000.0 / N

    # ---- pure device time: K clips chained inside ONE dispatch (lax.scan),
    # so host<->device RTT is paid once
    K = 8

    @jax.jit
    def run_k(face_vars, body_vars, wav16, key):
        def step(carry, k):
            f, c = run_clip_impl.__wrapped__(face_vars, body_vars, wav16, k)
            return carry, (f[:, -1, -1], c[:, -1, -1])
        _, outs = jax.lax.scan(step, 0, jax.random.split(key, K))
        return outs

    r = run_k(face_vars, body_vars, wav_dev, r_sample)
    jax.tree_util.tree_map(np.asarray, r)
    t0 = time.perf_counter()
    r = run_k(face_vars, body_vars, wav_dev, r_sample)
    jax.tree_util.tree_map(np.asarray, r)
    device_ms = (time.perf_counter() - t0) * 1000.0 / K
    motion_sec_per_sec = CLIP_SECONDS / (device_ms / 1000.0)

    print(json.dumps({
        "metric": "p50_latency_10s_clip_ms",
        "value": round(p50, 2),
        "unit": "ms",
        "vs_baseline": round(BASELINE_P50_MS / p50, 3),
        "extra": {
            "amortized_ms_per_clip": round(amortized_ms, 2),
            "device_ms_per_clip": round(device_ms, 2),
            "motion_sec_per_sec_per_chip": round(motion_sec_per_sec, 2),
            "baseline_p50_ms": BASELINE_P50_MS,
            "latencies_ms": [round(x, 1) for x in lat],
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
