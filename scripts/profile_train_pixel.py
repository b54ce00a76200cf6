#!/usr/bin/env python
"""Component breakdown of the body-pixel training step on the TPU.

Measures, via K-chained lax.scan dispatches with per-iteration input
jitter (CLAUDE.md benchmark rules):

  * full step (f32 and bf16 prior)            — what bench_train reports
  * full step with PREcomputed tokens         — subtraction isolates the
                                                frozen VQ encode
  * forward-only CE (tokens precomputed)      — isolates prior+audio fwd;
                                                bwd cost = step - fwd - opt

plus the XLA cost-analysis flop split per component, so the MFU ceiling
analysis in PARITY.md is grounded in numbers rather than guesses.

NOTE: forward-only chains keep params loop-INVARIANT in the carry — safe
here because the varying batch feeds every measured op; never do this for
grad chains (see CLAUDE.md: 199 ms/iter pathology).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def chain_ms(fn, args, jitter_idx=(0,), K: int = 128):
    """Device ms/iter of fn(*args) with args[jitter_idx] perturbed per
    iteration, K iterations in ONE dispatch.  EVERY array the measured
    compute reads must be jittered (float: eps add; int: batch-axis roll)
    or XLA hoists its dependent ops out of the scan as loop-invariant —
    e.g. with only aud_feat jittered, the token embedding + pre-audio
    layer-0 work of a fixed token grid hoists and fwd_ce reads low.
    K=128 keeps the ~30 ms dispatch RTT under 0.25 ms/iter on these
    ~2-3 ms components."""
    if isinstance(jitter_idx, int):
        jitter_idx = (jitter_idx,)

    @jax.jit
    def run_k(*args):
        def body(c, k):
            a = list(args)
            for ji in jitter_idx:
                x = a[ji]
                if jnp.issubdtype(x.dtype, jnp.integer):
                    a[ji] = jnp.roll(x, k[0] % x.shape[0], axis=0)
                else:
                    a[ji] = x.at[(0,) * x.ndim].add(
                        1e-9 * k[0].astype(x.dtype))
            out = fn(*a)
            s = sum(jnp.sum(jnp.asarray(o, jnp.float32))
                    for o in jax.tree_util.tree_leaves(out))
            return c + s * 0, s
        _, ss = jax.lax.scan(body, jnp.zeros(()),
                             jax.random.split(jax.random.PRNGKey(7), K))
        return ss

    np.asarray(run_k(*args))
    t0 = time.perf_counter()
    np.asarray(run_k(*args))
    return (time.perf_counter() - t0) * 1000 / K


def flops_of(fn, *args):
    try:
        c = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return float(c.get("flops", 0.0))
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
    vq_body, vq_hand = VQVAE(in_dim=39), VQVAE(in_dim=90)
    audio_enc = AudioEncoder(num_hiddens=256)
    out = {}

    def build(prior, folded=False):
        init_s, step = tsteps.make_body_pixel_step(
            prior, audio_enc, vq_body, vq_hand, frozen_vars, frozen_states,
            folded=folded)
        return init_s(jax.random.PRNGKey(1), window=T), step

    # frozen stage-1 VQs (random init — cost is shape-determined)
    from talkshow_tpu.ops import vq as vq_ops
    r = jax.random.split(jax.random.PRNGKey(0), 4)
    st_b = vq_ops.init_vq_state(r[0], 2048, vq_body.embedding_dim)
    st_h = vq_ops.init_vq_state(r[1], 2048, vq_hand.embedding_dim)
    vb = vq_body.init(r[2], jnp.zeros((1, T, 39)), st_b)
    vh = vq_hand.init(r[3], jnp.zeros((1, T, 90)), st_h)
    frozen_vars = {"body": vb, "hand": vh}
    frozen_states = {"body": st_b, "hand": st_h}

    prior32 = GatedPixelCNN()
    prior16 = GatedPixelCNN(dtype=jnp.bfloat16)
    st32, step32 = build(prior32)
    _, step16 = build(prior16)
    _, step32f = build(prior32, folded=True)
    _, step16f = build(prior16, folded=True)

    # ---- component callables --------------------------------------------
    def encode_tokens(poses):
        from talkshow_tpu.ops.pose import C_INDEX_3D
        conv = poses[..., C_INDEX_3D]
        _, tb = vq_body.apply(frozen_vars["body"], conv[..., :39],
                              frozen_states["body"], method=VQVAE.encode)
        _, th = vq_hand.apply(frozen_vars["hand"], conv[..., 39:],
                              frozen_states["hand"], method=VQVAE.encode)
        return jnp.stack([tb, th], axis=-1)

    tokens = encode_tokens(batch["poses"])

    def fwd_ce(prior):
        # every array (speaker, dropout key incl.) is an ARGUMENT — closed
        # -over arrays become HLO constants (CLAUDE.md)
        def f(aud, params, stats, toks, speaker, key):
            af, _ = audio_enc.apply({"params": params["audio"],
                                     "batch_stats": stats["audio"]},
                                    aud, True, mutable=["batch_stats"])
            import optax
            lg = prior.apply({"params": params["prior"]}, toks,
                             speaker, af, True,
                             rngs={"dropout": key})
            return optax.softmax_cross_entropy_with_integer_labels(
                lg.reshape(-1, lg.shape[-1]).astype(jnp.float32),
                toks.reshape(-1)).mean()
        return f

    key = jax.random.PRNGKey(3)

    # ---- timings ---------------------------------------------------------
    # full steps: state THREADED through the scan (discarding the new state
    # would let XLA dead-code-eliminate the whole backward + optimizer);
    # identical methodology to bench_train.timed_steps.
    sys.path.insert(0, os.path.dirname(__file__))
    from bench_train import timed_steps
    out["full_step_f32_ms"] = round(
        timed_steps(step32, st32, batch, rng=key, K=64), 2)
    out["full_step_bf16_ms"] = round(
        timed_steps(step16, st32, batch, rng=key, K=64), 2)
    # column-folded forward (models/pixelcnn_folded.py): W=2 folded into
    # lanes — the layout alternative for the 39%-MFU bandwidth analysis
    out["full_step_f32_folded_ms"] = round(
        timed_steps(step32f, st32, batch, rng=key, K=64), 2)
    out["full_step_bf16_folded_ms"] = round(
        timed_steps(step16f, st32, batch, rng=key, K=64), 2)
    # components: every array (params incl.) is a jit ARG — closed-over
    # arrays become HLO constants and run ~2.7x slower (CLAUDE.md).
    out["vq_encode_ms"] = round(chain_ms(
        lambda p: encode_tokens(p), (batch["poses"],)), 2)
    # jitter aud_feat AND the token grid (roll): tokens feed the embedding
    # and all pre-audio layer-0 work, which would otherwise hoist
    fwd_args = (batch["aud_feat"], st32.params, st32.batch_stats, tokens,
                batch["speaker"], key)
    out["fwd_ce_f32_ms"] = round(
        chain_ms(fwd_ce(prior32), fwd_args, jitter_idx=(0, 3)), 2)
    out["fwd_ce_bf16_ms"] = round(
        chain_ms(fwd_ce(prior16), fwd_args, jitter_idx=(0, 3)), 2)

    from talkshow_tpu.models.pixelcnn_folded import folded_logits

    def fwd_ce_folded(prior):
        def f(aud, params, stats, toks, speaker, key):
            af, _ = audio_enc.apply({"params": params["audio"],
                                     "batch_stats": stats["audio"]},
                                    aud, True, mutable=["batch_stats"])
            import optax
            lg = folded_logits(prior, params["prior"], toks, speaker, af,
                               train=True, dropout_rng=key)
            return optax.softmax_cross_entropy_with_integer_labels(
                lg.reshape(-1, lg.shape[-1]).astype(jnp.float32),
                toks.reshape(-1)).mean()
        return f

    out["fwd_ce_f32_folded_ms"] = round(
        chain_ms(fwd_ce_folded(prior32), fwd_args, jitter_idx=(0, 3)), 2)
    out["fwd_ce_bf16_folded_ms"] = round(
        chain_ms(fwd_ce_folded(prior16), fwd_args, jitter_idx=(0, 3)), 2)

    # ---- flop split ------------------------------------------------------
    # return the WHOLE (state, metrics) so the backward+optimizer are not
    # dead-code-eliminated out of the costed program
    fl_step = flops_of(lambda s, b_, k: step32(s, b_, k), st32, batch, key)
    fl_vq = flops_of(encode_tokens, batch["poses"])
    fl_fwd = flops_of(fwd_ce(prior32), *fwd_args)
    out["gflops"] = {"full_step": round(fl_step / 1e9, 1),
                     "vq_encode": round(fl_vq / 1e9, 1),
                     "prior_audio_fwd": round(fl_fwd / 1e9, 1),
                     "bwd_plus_opt": round((fl_step - fl_vq - fl_fwd) / 1e9, 1)}
    out["derived_ms"] = {
        "prior_audio_bwd_opt_f32":
            round(out["full_step_f32_ms"] - out["vq_encode_ms"]
                  - out["fwd_ce_f32_ms"], 2)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
