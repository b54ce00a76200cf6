#!/usr/bin/env python
"""Isolate the AR decode's on-device cost (chained inside one dispatch)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from talkshow_tpu.models.body import create_body_models
    from talkshow_tpu.models.pixelcnn import sample_tokens

    body = create_body_models(jax.random.PRNGKey(0))
    B, H = 1, 75
    audio = jnp.zeros((B, H, 256))
    ids = jnp.zeros((B,), jnp.int32)
    K = 8

    @jax.jit
    def run_k(prior_vars, audio, key):
        def step(c, k):
            t = sample_tokens(body.prior, prior_vars, ids, audio, k)
            return c, t[:, -1, -1]
        _, outs = jax.lax.scan(step, 0, jax.random.split(key, K))
        return outs

    pv = body.prior_vars
    r = run_k(pv, audio, jax.random.PRNGKey(1))
    np.asarray(r)
    t0 = time.perf_counter()
    r = run_k(pv, audio, jax.random.PRNGKey(2))
    np.asarray(r)
    ms = (time.perf_counter() - t0) * 1000 / K
    print(f"ar_decode_device_ms per clip (H={H}): {ms:.2f}")

    # B=4 batched diversity
    audio4 = jnp.zeros((4, H, 256))
    ids4 = jnp.zeros((4,), jnp.int32)

    @jax.jit
    def run_k4(prior_vars, audio, key):
        def step(c, k):
            t = sample_tokens(body.prior, prior_vars, ids4, audio, k)
            return c, t[:, -1, -1]
        _, outs = jax.lax.scan(step, 0, jax.random.split(key, K))
        return outs

    r = run_k4(pv, audio4, jax.random.PRNGKey(1)); np.asarray(r)
    t0 = time.perf_counter()
    r = run_k4(pv, audio4, jax.random.PRNGKey(2)); np.asarray(r)
    ms = (time.perf_counter() - t0) * 1000 / K
    print(f"ar_decode_device_ms per clip (B=4): {ms:.2f}")


if __name__ == "__main__":
    main()
