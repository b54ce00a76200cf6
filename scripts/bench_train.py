#!/usr/bin/env python
"""Training-step throughput at the reference config (batch 128, window 88).

Prints one JSON line per stage: step time (device, amortized over K chained
steps in one dispatch) and windows/sec.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


V5E_BF16_PEAK_FLOPS = 197e12


def timed_steps(step, state, batch, rng=None, K: int = 64,
                jitter_key="poses"):
    """Device ms per training step, K steps CHAINED in one lax.scan
    dispatch (per-dispatch launch overhead on the remote-attached chip is
    ~2 ms — unchained loops overstate the step time; see CLAUDE.md).
    Chained numbers still carry ~30/K ms of tunnel RTT each, so K >= 64
    for fast steps; the ~60 ms face step uses K=32 (~1 ms bias).

    State threads through the scan (params change every iteration) and the
    batch's `jitter_key` array(s) are perturbed per iteration so
    loop-invariant stages (e.g. the frozen-VQ encode of a fixed batch)
    cannot hoist out. Float arrays get an eps add; integer arrays (token
    grids) get a batch-axis roll — a valid-value permutation.
    """
    inner = getattr(step, "__wrapped__", step)
    jkeys = [jitter_key] if isinstance(jitter_key, str) else list(jitter_key)

    @jax.jit
    def run_k(state, batch, key):
        def body(s, k):
            b = dict(batch)
            for jk in jkeys:
                x = b[jk]
                if jnp.issubdtype(x.dtype, jnp.integer):
                    b[jk] = jnp.roll(x, k[0] % x.shape[0], axis=0)
                else:
                    b[jk] = x.at[(0,) * x.ndim].add(
                        1e-9 * k[0].astype(x.dtype))
            if rng is None:
                s2, m = inner(s, b)
            else:
                s2, m = inner(s, b, k)
            return s2, m[list(m)[0]]
        _, ms = jax.lax.scan(body, state, jax.random.split(key, K))
        return ms

    r = run_k(state, batch, jax.random.PRNGKey(11))
    np.asarray(r)
    t0 = time.perf_counter()
    r = run_k(state, batch, jax.random.PRNGKey(12))
    np.asarray(r)
    return (time.perf_counter() - t0) * 1000 / K


def step_flops(step, *args):
    """XLA cost-analysis FLOPs of one jitted training step (0 if the
    backend does not report them)."""
    try:
        ca = step.lower(*args).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def main():
    from talkshow_tpu.models.pixelcnn import GatedPixelCNN
    from talkshow_tpu.models.vqvae import VQVAE, AudioEncoder
    from talkshow_tpu.train import steps as tsteps

    B, T = 128, 88
    rng = np.random.default_rng(0)
    batch = {
        "poses": jnp.asarray(rng.standard_normal((B, T, 129)) * 0.2, jnp.float32),
        "aud_feat": jnp.asarray(rng.standard_normal((B, T, 64)), jnp.float32),
        "speaker": jnp.asarray(rng.integers(0, 4, B), jnp.int32),
    }

    out = {}

    # stage 1: body VQ (full size: hidden 1024, codebook 2048)
    vq_body = VQVAE(in_dim=39)
    vq_hand = VQVAE(in_dim=90)
    init1, step1 = tsteps.make_body_vq_step(vq_body, vq_hand)
    st1 = init1(jax.random.PRNGKey(0), window=T)
    ms = timed_steps(step1, st1, batch)
    out["body_vq_step_ms"] = round(ms, 1)
    out["body_vq_windows_per_sec"] = round(B / (ms / 1000), 1)
    fl = step_flops(step1, st1, batch)
    if fl:
        out["body_vq_mfu"] = round(fl / (ms / 1e3) / V5E_BF16_PEAK_FLOPS, 4)

    # stage 2: PixelCNN prior (dim 256, 15 layers) with frozen VQs
    prior = GatedPixelCNN()
    audio_enc = AudioEncoder(num_hiddens=256)
    frozen_vars = {"body": {"params": st1.params["body"],
                            "batch_stats": st1.batch_stats["body"]},
                   "hand": {"params": st1.params["hand"],
                            "batch_stats": st1.batch_stats["hand"]}}
    init2, step2 = tsteps.make_body_pixel_step(
        prior, audio_enc, vq_body, vq_hand, frozen_vars, st1.vq)
    st2 = init2(jax.random.PRNGKey(1), window=T)
    ms = timed_steps(step2, st2, batch, rng=jax.random.PRNGKey(2))
    out["body_pixel_step_ms"] = round(ms, 1)
    out["body_pixel_windows_per_sec"] = round(B / (ms / 1000), 1)
    fl = step_flops(step2, st2, batch, jax.random.PRNGKey(2))
    if fl:
        out["body_pixel_mfu"] = round(fl / (ms / 1e3) / V5E_BF16_PEAK_FLOPS, 4)

    # stage 2 with cached frozen-VQ tokens (Trainer.token_encoder: epochs
    # 2+ skip the frozen encode; numerically identical)
    enc = tsteps.make_token_encoder(vq_body, vq_hand, frozen_vars, st1.vq)
    batch_tok = dict(batch, tokens=enc(batch["poses"]))
    ms = timed_steps(step2, st2, batch_tok, rng=jax.random.PRNGKey(2),
                     jitter_key=["aud_feat", "tokens"])
    out["body_pixel_cached_step_ms"] = round(ms, 1)
    out["body_pixel_cached_windows_per_sec"] = round(B / (ms / 1000), 1)

    # stage 2, mixed precision: prior computes in bf16 (f32 master params,
    # f32 softmax/CE) — the opt-in GatedPixelCNN(dtype=bf16) path.
    prior16 = GatedPixelCNN(dtype=jnp.bfloat16)
    init2b, step2b = tsteps.make_body_pixel_step(
        prior16, audio_enc, vq_body, vq_hand, frozen_vars, st1.vq)
    st2b = init2b(jax.random.PRNGKey(1), window=T)
    ms = timed_steps(step2b, st2b, batch, rng=jax.random.PRNGKey(2))
    out["body_pixel_bf16_step_ms"] = round(ms, 1)
    out["body_pixel_bf16_windows_per_sec"] = round(B / (ms / 1000), 1)
    if fl:  # same flop count as the f32 program
        out["body_pixel_bf16_mfu"] = round(
            fl / (ms / 1e3) / V5E_BF16_PEAK_FLOPS, 4)

    # stage 3: face generator (full-size wav2vec base; heaviest training
    # compute in the system).  Reference trains batch 1 whole clips
    # (config/face.json); we bench the bucketed batch recommended for the
    # TPU trainer (--face_bucket 512 --face_batch_size 8): throughput
    # scales ~2x from B=4 to B=8 and regresses at B=16 (measured r3:
    # 1356 / 2368 / 2195 motion-sec/s f32).
    from talkshow_tpu.models.face import FaceGenerator

    face = FaceGenerator()
    Bf, Tf = 8, 512
    n = Tf * 16000 // 30
    init3, step3 = tsteps.make_face_step(face)
    st3 = init3(jax.random.PRNGKey(3), samples_per_window=n, window=Tf)
    batch_f = {
        "waveform": jnp.asarray(rng.standard_normal((Bf, n)) * 0.1,
                                jnp.float32),
        "id_onehot": jax.nn.one_hot(jnp.asarray(rng.integers(0, 4, Bf)), 4),
        "gt": jnp.asarray(rng.standard_normal((Bf, Tf, 106)) * 0.2,
                          jnp.float32),
        "valid_samples": jnp.full((Bf,), n, jnp.int32),
        "valid_frames": jnp.full((Bf,), Tf, jnp.int32),
    }
    ms = timed_steps(step3, st3, batch_f, rng=jax.random.PRNGKey(4), K=32,
                     jitter_key="waveform")
    out["face_step_ms"] = round(ms, 1)
    out["face_clips_per_sec"] = round(Bf / (ms / 1000), 2)
    out["face_motion_sec_per_sec"] = round(Bf * Tf / 30 / (ms / 1000), 1)
    fl = step_flops(step3, st3, batch_f, jax.random.PRNGKey(4))
    if fl:
        out["face_mfu"] = round(fl / (ms / 1e3) / V5E_BF16_PEAK_FLOPS, 4)

    # stage 3, mixed precision: wav2vec + heads compute in bf16 via
    # Wav2Vec2Config.dtype (LayerNorm/softmax accumulate f32 inside flax).
    from talkshow_tpu.models.wav2vec import Wav2Vec2Config

    face16 = FaceGenerator(wav2vec_cfg=Wav2Vec2Config(dtype=jnp.bfloat16))
    init3b, step3b = tsteps.make_face_step(face16)
    st3b = init3b(jax.random.PRNGKey(3), samples_per_window=n, window=Tf)
    ms = timed_steps(step3b, st3b, batch_f, rng=jax.random.PRNGKey(4), K=32,
                     jitter_key="waveform")
    out["face_bf16_step_ms"] = round(ms, 1)
    out["face_bf16_motion_sec_per_sec"] = round(Bf * Tf / 30 / (ms / 1000), 1)
    if fl:
        out["face_bf16_mfu"] = round(fl / (ms / 1e3) / V5E_BF16_PEAK_FLOPS, 4)

    out["batch"] = B
    out["window"] = T
    out["face_batch"] = [Bf, Tf]
    out["backend"] = jax.default_backend()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
