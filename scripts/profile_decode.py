#!/usr/bin/env python
"""Isolate the AR decode's on-device cost (chained inside one dispatch).

Measurement note (axon remote attach): every dispatch+readback pays ~30 ms
of tunnel RTT, which divides by the chain length K.  K=64 leaves < 0.5 ms of
RTT per clip in the numbers below; treat them as device time + ~0.5 ms.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def chain(fn, K, key):
    @jax.jit
    def run_k(key):
        def step(c, k):
            t = fn(k)
            return c, t[:, -1, -1]
        _, outs = jax.lax.scan(step, 0, jax.random.split(key, K))
        return outs
    r = run_k(key)
    np.asarray(r)
    t0 = time.perf_counter()
    r = run_k(jax.random.fold_in(key, 1))
    np.asarray(r)
    return (time.perf_counter() - t0) * 1000 / K


def main():
    from talkshow_tpu.models.body import create_body_models
    from talkshow_tpu.models.pixelcnn import sample_tokens
    from talkshow_tpu.models.pixelcnn_pallas import (pack_decode_tables,
                                                     sample_tokens_fused)

    body = create_body_models(jax.random.PRNGKey(0))
    B, H, K = 1, 75, 64
    audio = jnp.zeros((B, H, 256))
    ids = jnp.zeros((B,), jnp.int32)
    key = jax.random.PRNGKey(1)

    ms = chain(lambda k: sample_tokens(body.prior, body.prior_vars, ids,
                                       audio, k), K, key)
    print(f"xla scan decode   (B=1, H={H}): {ms:6.2f} ms/clip")

    tables = jax.jit(lambda v: pack_decode_tables(body.prior, v))(
        body.prior_vars)
    ms = chain(lambda k: sample_tokens_fused(
        body.prior, body.prior_vars, ids, audio, k, tables=tables,
        interpret=False), K, key)
    print(f"fused pallas decode (B=1, H={H}): {ms:6.2f} ms/clip")

    # B=4 batched diversity (XLA path; fused kernel is B=1)
    audio4 = jnp.zeros((4, H, 256))
    ids4 = jnp.zeros((4,), jnp.int32)
    ms = chain(lambda k: sample_tokens(body.prior, body.prior_vars, ids4,
                                       audio4, k), 16, key)
    print(f"xla scan decode   (B=4, H={H}): {ms:6.2f} ms/clip-batch")


if __name__ == "__main__":
    main()
