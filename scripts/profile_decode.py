#!/usr/bin/env python
"""Isolate the AR decode's on-device cost (chained inside one dispatch).

Measurement note (axon remote attach): every dispatch+readback pays ~30 ms
of tunnel RTT, which divides by the chain length K.  K=64 leaves < 0.5 ms of
RTT per clip in the numbers below; treat them as device time + ~0.5 ms.

Weights and inputs are jit ARGUMENTS and the audio is jittered per
iteration — closed-over arrays become HLO constants (~2.7x slower, upload
limit) and loop-invariant inputs let XLA hoist work out of the chain
(CLAUDE.md "TPU / axon gotchas").
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def chain(fn, K, key, *fn_args):
    """fn(k, *fn_args) -> tokens; fn_args are passed as jit arguments."""
    @jax.jit
    def run_k(key, *args):
        def step(c, k):
            t = fn(k, *args)
            return c, t[:, -1, -1]
        _, outs = jax.lax.scan(step, 0, jax.random.split(key, K))
        return outs
    r = run_k(key, *fn_args)
    np.asarray(r)
    t0 = time.perf_counter()
    r = run_k(jax.random.fold_in(key, 1), *fn_args)
    np.asarray(r)
    return (time.perf_counter() - t0) * 1000 / K


def _jitter(audio, k):
    return audio.at[0, 0, 0].add(1e-9 * k[0].astype(audio.dtype))


def main():
    from talkshow_tpu.models.body import create_body_models
    from talkshow_tpu.models.pixelcnn import sample_tokens
    from talkshow_tpu.models.pixelcnn_pallas import (pack_decode_tables,
                                                     sample_tokens_fused)

    body = create_body_models(jax.random.PRNGKey(0))
    prior = body.prior  # module is static; weights go through jit args
    B, H, K = 1, 75, 64
    audio = jnp.zeros((B, H, 256))
    ids = jnp.zeros((B,), jnp.int32)
    key = jax.random.PRNGKey(1)

    ms = chain(lambda k, pv, a: sample_tokens(prior, pv, ids, _jitter(a, k),
                                              k),
               K, key, body.prior_vars, audio)
    print(f"xla scan decode   (B=1, H={H}): {ms:6.2f} ms/clip")

    if jax.default_backend() == "tpu":
        tables = jax.jit(lambda v: pack_decode_tables(prior, v))(
            body.prior_vars)
        for B_f in (1, 4, 8, 16):
            audio_b = jnp.zeros((B_f, H, 256))
            ids_b = jnp.zeros((B_f,), jnp.int32)
            ms = chain(lambda k, tb, pv, a: sample_tokens_fused(
                prior, pv, ids_b, _jitter(a, k), k, tables=tb,
                interpret=False),
                K, key, tables, body.prior_vars, audio_b)
            print(f"fused pallas decode (B={B_f}, H={H}): {ms:6.2f} "
                  f"ms/batch = {ms / B_f:5.2f} ms/clip")
    else:
        print("fused pallas decode: skipped (TPU only; interpret mode is "
              "not a timing proxy)")

    # B=4 batched diversity on the XLA path (fused comparison above)
    audio4 = jnp.zeros((4, H, 256))
    ids4 = jnp.zeros((4,), jnp.int32)
    ms = chain(lambda k, pv, a: sample_tokens(prior, pv, ids4, _jitter(a, k),
                                              k),
               16, key, body.prior_vars, audio4)
    print(f"xla scan decode   (B=4, H={H}): {ms:6.2f} ms/clip-batch")


if __name__ == "__main__":
    main()
