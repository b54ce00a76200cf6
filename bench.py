"""Benchmark: 10 s of audio -> whole-body SMPL-X motion.

Prints ONE JSON line:
  {"metric": "p50_latency_10s_clip_ms", "value": N, "unit": "ms",
   "vs_baseline": N, ...}

Baseline = the rebuild target from BASELINE.md: < 250 ms p50 per 10 s clip
on one chip.  vs_baseline > 1 means faster than target.

Reported numbers (extra):
  * device_ms_per_clip — the number the builder can move: K clips chained
    in one lax.scan dispatch (K=64), so the ~30 ms axon tunnel RTT
    contributes < 0.5 ms.  p50 single-dispatch latency is RTT-dominated
    (~70 ms of the value is the tunnel, not the chip).
  * stage_ms — per-stage device times, same K-chaining.
  * mfu — XLA cost-analysis FLOPs (+ analytic FLOPs for the Pallas decode,
    which XLA cannot see into) over device time against the v5e bf16 peak.
    The AR decode is latency-bound, so MFU is intrinsically low; it is
    tracked to catch compute regressions, not as a target.
Weights are random-init and audio synthetic — compute cost identical to
trained weights ("synthetic": true in the JSON).
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_P50_MS = 250.0
CLIP_SECONDS = 10.0
V5E_BF16_PEAK_FLOPS = 197e12


def main():
    import jax
    import jax.numpy as jnp

    from talkshow_tpu.models.body import (create_body_models,
                                          generate_conv_poses)
    from talkshow_tpu.models.face import FaceGenerator
    from talkshow_tpu.models.pixelcnn_pallas import (pack_decode_tables,
                                                     sample_tokens_fused)
    from talkshow_tpu.models.vqvae import VQVAE
    from talkshow_tpu.ops import audio as audio_ops

    rng = jax.random.PRNGKey(0)
    r_face, r_body, r_sample = jax.random.split(rng, 3)

    # ---- build models (random weights; compute cost identical to trained)
    # bf16 compute for the wav2vec/face stage on TPU (the production
    # default — Pipeline.create(face_dtype="auto")); params stay f32
    from talkshow_tpu.models.wav2vec import Wav2Vec2Config
    face_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else None
    face = FaceGenerator(wav2vec_cfg=Wav2Vec2Config(dtype=face_dtype))
    n_samples_wav = int(16000 * CLIP_SECONDS)
    frames = int(n_samples_wav * 30 // 16000)          # 300
    face_vars = face.init(r_face, jnp.zeros((1, 1600)), jnp.zeros((1, 4)), 3)
    body = create_body_models(r_body)

    # ---- inputs: 10 s synthetic speech-like audio
    t = np.arange(n_samples_wav) / 16000.0
    wav16 = (0.3 * np.sin(2 * np.pi * 220 * t) *
             (1 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)

    @jax.jit
    def run_clip_impl(face_vars, body_vars, tables, wav16, key):
        """Full pipeline, one dispatch: wav -> (face (1,T,103), conv poses).
        Model variables are jit arguments (NOT closed over) so weights are
        inputs rather than giant embedded HLO constants (the remote-compile
        path rejects multi-hundred-MB programs).  Decode tables are packed
        once outside (packing ~60 MB of prior weights costs ~3 ms device —
        serving pays it per weight set, not per clip)."""
        b = body._replace(**body_vars)
        wav22 = audio_ops.resample(wav16, 16000, 22000)
        feat = audio_ops.mfcc(wav22, 22000, fps=30)
        f = face.apply(face_vars, wav16[None], jnp.zeros((1, 4)), frames)
        conv, _ = generate_conv_poses(b, feat[None],
                                      jnp.zeros((1,), jnp.int32), key,
                                      tables=tables)
        return f, conv

    body_vars = {k: getattr(body, k) for k in (
        "vq_body_vars", "vq_hand_vars", "vq_body_state", "vq_hand_state",
        "audio_enc_vars", "prior_vars")}
    tables = (jax.jit(lambda v: pack_decode_tables(body.prior, v))(
        body.prior_vars) if jax.default_backend() == "tpu" else None)

    def run_clip(wav16, key):
        return run_clip_impl(face_vars, body_vars, tables, wav16, key)

    wav_dev = jax.device_put(jnp.asarray(wav16))

    def once(key):
        f, b = run_clip(wav_dev, key)
        return np.asarray(f), np.asarray(b)   # forced readback

    import sys as _sys
    print("[bench] compiling full pipeline...", file=_sys.stderr, flush=True)
    once(r_sample)  # warmup/compile

    print("[bench] pipeline compiled; measuring latency",
          file=_sys.stderr, flush=True)
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

    # ---- pure device time: K iterations chained inside ONE dispatch so
    # the tunnel RTT (~30 ms) divides by K
    import sys

    t_start = time.perf_counter()

    def progress(msg):
        print(f"[bench +{time.perf_counter() - t_start:6.1f}s] {msg}",
              file=sys.stderr, flush=True)

    def chain_ms(fn, *fn_args, K=64, repeats=3):
        """fn(key, *fn_args); fn_args are jit ARGUMENTS.  Weights AND input
        arrays must not be closed over: closed-over arrays become HLO
        constants, which besides the remote-compile upload limit also run
        ~2.7x slower inside the scan (measured: body pipeline 6.9 ms with
        closed-over weights vs 2.5 ms with weights as args; see CLAUDE.md).

        Best of `repeats` chained runs: single chained runs on the remote
        attach drift run-to-run (r3's published 5.19 ms device/0.91 ms
        vq_decode re-measured at 4.89/0.42 with the identical program —
        chip slow-phases, not code)."""
        @jax.jit
        def run_k(key, *args):
            def step(c, k):
                out = fn(k, *args)
                # Sum reducer: consumes EVERY output element (a single-element
                # index invites DCE — e.g. the mfcc stage would collapse to
                # its last frame) and fuses into the producer, unlike
                # reshape(-1)[-1] which linearizes the tiled output at copy
                # bandwidth each iteration.  See CLAUDE.md "microbenchmark
                # TRAPS".
                return c, jax.tree_util.tree_map(
                    lambda x: jnp.sum(x, dtype=jnp.float32), out)
            _, outs = jax.lax.scan(step, 0, jax.random.split(key, K))
            return outs
        r = run_k(r_sample, *fn_args)
        jax.tree_util.tree_map(np.asarray, r)
        best = float("inf")
        for i in range(repeats):
            t0 = time.perf_counter()
            r = run_k(jax.random.fold_in(r_sample, 1 + i), *fn_args)
            jax.tree_util.tree_map(np.asarray, r)
            best = min(best, (time.perf_counter() - t0) * 1000.0 / K)
        return best

    progress("latency + amortized done; chaining device_ms (K=64)")
    # Jitter the wav per iteration: with a loop-invariant input XLA hoists
    # the whole audio front half out of the scan and the number stops
    # representing per-fresh-clip serving cost (measured 2.5 ms hoisted vs
    # 7.0 ms honest for the body pipeline before the framing fix).
    device_ms = chain_ms(
        lambda k, fv, bv, tb, w: run_clip_impl.__wrapped__(
            fv, bv, tb, w.at[0].add(1e-9 * k[0].astype(w.dtype)), k),
        face_vars, body_vars, tables, wav_dev, K=64)
    motion_sec_per_sec = CLIP_SECONDS / (device_ms / 1000.0)
    progress(f"device_ms={device_ms:.2f}")

    # ---- per-stage breakdown (same chaining) ---------------------------
    wav22 = audio_ops.resample(wav_dev, 16000, 22000)
    feat = jax.jit(lambda w: audio_ops.mfcc(w, 22000, fps=30))(wav22)
    audio_cond = body.audio_enc.apply(body.audio_enc_vars, feat[None])
    ids0 = jnp.zeros((1,), jnp.int32)
    tok_fixed = jnp.zeros((1, audio_cond.shape[1], 2), jnp.int32)

    def jitter(x, k):
        """Negligible key-derived perturbation: keeps per-iteration inputs
        distinct so XLA cannot hoist the stage out of the scan as
        loop-invariant."""
        return x.at[(0,) * x.ndim].add(1e-9 * k[0].astype(x.dtype))

    stages = {
        "mfcc": (lambda k, w: audio_ops.mfcc(jitter(w, k), 22000, fps=30),
                 wav22),
        "face_wav2vec": (lambda k, fv, w: face.apply(
            fv, jitter(w, k)[None], jnp.zeros((1, 4)), frames),
            face_vars, wav_dev),
        "audio_encoder": (lambda k, av, f: body.audio_enc.apply(
            av, jitter(f, k)[None]), body.audio_enc_vars, feat),
        "vq_decode": (lambda k, vv, vs, tk: body.vq_body.apply(
            vv, tk[..., 0].at[0, 0].set((k[0] % 64).astype(jnp.int32)), vs,
            method=VQVAE.decode_latents),
            body.vq_body_vars, body.vq_body_state, tok_fixed),
    }
    if jax.default_backend() == "tpu":
        # Mosaic kernel: TPU only (interpret mode is not a timing proxy);
        # on other backends the full pipeline above used the XLA sampler.
        stages["ar_decode_fused"] = (
            lambda k, tb, pv, i0, ac: sample_tokens_fused(
                body.prior, pv, i0, ac, k, tables=tb, interpret=False),
            tables, body.prior_vars, ids0, audio_cond)
    stage_ms = {}
    for name, (fn, *fargs) in stages.items():
        stage_ms[name] = chain_ms(fn, *fargs, K=64)
        progress(f"stage {name}: {stage_ms[name]:.2f} ms")

    # ---- analytic FLOPs of the Pallas decode (XLA cannot see into it) ---
    m = body.prior
    dim, L, K_cb = m.dim, m.n_layers, m.input_dim
    H = audio_cond.shape[1]
    macs_row = (2 * 6 * dim * 2 * dim + (L - 1) * 2 * 4 * dim * 2 * dim
                + L * 2 * 2 * dim * 2 * dim          # vert + v2h
                + 2 * L * (2 * dim * 4 * dim + 2 * dim * 2 * dim)  # horiz
                + 3 * 2 * dim * 2 * dim              # fusions
                + 2 * (dim * 2 * dim + 2 * dim * K_cb + K_cb * dim))  # head+emb
    decode_flops = 2.0 * macs_row * H  # per clip

    def xla_flops_of(jitted, *args):
        try:
            ca = jitted.lower(*args).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            return float(ca.get("flops", 0.0))
        except Exception:
            return 0.0

    # ---- batched throughput: B clips in ONE program (the serving shape).
    # The fused AR decoder carries the batch in its sublane axis (B<=32
    # decodes cost ~one) and the wav2vec/audio stages amortize their
    # per-op overhead over B, so per-clip device time drops well below
    # the B=1 number.  This is the throughput a co-located server sees.
    def run_group(k, fv, bv, tb, w, onehot, ids):
        b = body._replace(**bv)
        w = w * (1 + 1e-9 * k[0].astype(w.dtype))   # hoist-proof, fused
        f = face.apply(fv, w, onehot, frames)
        wav22 = jax.vmap(lambda x: audio_ops.resample(x, 16000, 22000))(w)
        featB = jax.vmap(lambda x: audio_ops.mfcc(x, 22000, fps=30))(wav22)
        conv, _ = generate_conv_poses(b, featB, ids, k, tables=tb)
        return f, conv

    batched = []
    for Bb in ((8, 16, 32) if jax.default_backend() == "tpu" else (8,)):
        wavB = jnp.tile(wav_dev[None], (Bb, 1))
        onehotB = jnp.zeros((Bb, 4))
        idsB = jnp.zeros((Bb,), jnp.int32)
        progress(f"compiling + chaining batched group (B={Bb})")
        try:
            group_ms = chain_ms(run_group, face_vars, body_vars, tables,
                                wavB, onehotB, idsB, K=32, repeats=2)
        except Exception as e:  # a batch size that fails to compile
            progress(f"batched B={Bb} failed: {type(e).__name__}")
            continue
        gflops = (xla_flops_of(
            jax.jit(run_group), r_sample, face_vars, body_vars, tables,
            wavB, onehotB, idsB) + decode_flops * Bb)
        batched.append({
            "batch": Bb,
            "device_ms_per_clip": round(group_ms / Bb, 3),
            "device_ms_per_group": round(group_ms, 2),
            "motion_sec_per_sec_per_chip": round(
                CLIP_SECONDS * Bb / (group_ms / 1000.0), 1),
            "mfu": round(gflops / (group_ms / 1e3) / V5E_BF16_PEAK_FLOPS, 5),
        })
        progress(f"batched: {group_ms:.2f} ms/group, "
                 f"{group_ms / Bb:.3f} ms/clip, mfu={batched[-1]['mfu']:.3f}")

    # ---- MFU: XLA-visible FLOPs + analytic FLOPs of the Pallas decode ---
    xla_flops = xla_flops_of(run_clip_impl, face_vars, body_vars, tables,
                             wav_dev, r_sample)
    total_flops = xla_flops + decode_flops
    mfu = total_flops / (device_ms / 1e3) / V5E_BF16_PEAK_FLOPS

    print(json.dumps({
        "metric": "p50_latency_10s_clip_ms",
        "value": round(p50, 2),
        "unit": "ms",
        "vs_baseline": round(BASELINE_P50_MS / p50, 3),
        "extra": {
            "device_ms_per_clip": round(device_ms, 2),
            "motion_sec_per_sec_per_chip": round(motion_sec_per_sec, 2),
            "stage_ms": {k: round(v, 3) for k, v in stage_ms.items()},
            "batched": batched[0] if batched else None,
            "batched_sweep": batched,
            "mfu": round(mfu, 5),
            "flops_per_clip": round(total_flops / 1e9, 2),
            "amortized_ms_per_clip": round(amortized_ms, 2),
            "rtt_note": "p50 includes ~70 ms tunnel RTT; device_ms uses "
                        "K=64 chaining with per-iteration input jitter "
                        "(residual RTT < 0.5 ms; no loop-invariant "
                        "hoisting)",
            "baseline_p50_ms": BASELINE_P50_MS,
            "latencies_ms": [round(x, 1) for x in lat],
            "backend": jax.default_backend(),
            "synthetic": True,
        },
    }))


if __name__ == "__main__":
    main()
