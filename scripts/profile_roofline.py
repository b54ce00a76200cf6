"""Calibrate the chip: pure-GEMM TFLOPS, pure-copy HBM bandwidth, and the
cost of the `.at[0,0].add` jitter copy used by the chained benchmarks.

The standalone extractor-layer numbers (profile_extractor.py) include a
full input copy per iteration (functional `.at[].add` on a jit arg), so
they overstate each op by input_bytes/BW; this script measures that tax
directly, plus the achievable ceilings the layer numbers should be read
against.

Usage: python scripts/profile_roofline.py
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

    rng = jax.random.PRNGKey(0)
    out = {"backend": jax.default_backend(),
           "device": jax.devices()[0].device_kind}

    # ---- pure GEMM ceiling: 4096^3 bf16 and f32, key folded into one cell
    for tag, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        a = jax.random.normal(rng, (4096, 4096), dt)
        b = jax.random.normal(rng, (4096, 4096), dt)
        ms = chain_ms(lambda k, a, b: (
            a.at[0, 0].add(1e-3 * k[0].astype(a.dtype)) @ b), a, b)
        tf = 2 * 4096**3 / (ms / 1e3) / 1e12
        out[f"gemm4k_{tag}_ms"] = round(ms, 3)
        out[f"gemm4k_{tag}_tflops"] = round(tf, 1)
        print(f"gemm 4k {tag}: {ms:.3f} ms = {tf:.1f} TFLOPS",
              file=sys.stderr, flush=True)

    # ---- skinny GEMM at the L1 shape: (128k, 1536) @ (1536, 512) bf16
    for tag, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        a = jax.random.normal(rng, (128 * 1024, 1536), dt)
        b = jax.random.normal(rng, (1536, 512), dt)
        ms = chain_ms(lambda k, a, b: (
            a.at[0, 0].add(1e-3 * k[0].astype(a.dtype)) @ b), a, b)
        tf = 2 * a.shape[0] * 1536 * 512 / (ms / 1e3) / 1e12
        out[f"gemmL1_{tag}_ms"] = round(ms, 3)
        out[f"gemmL1_{tag}_tflops"] = round(tf, 1)
        print(f"gemm L1-shape {tag}: {ms:.3f} ms = {tf:.1f} TFLOPS",
              file=sys.stderr, flush=True)

    # ---- copy bandwidth: the jitter tax itself (copy of a 512 MB arg)
    x = jax.random.normal(rng, (8, 31999, 512), jnp.float32)
    nbytes = x.size * 4
    ms = chain_ms(lambda k, x: x.at[0, 0, 0].add(
        1e-9 * k[0].astype(x.dtype)), x, K=32)
    bw = 2 * nbytes / (ms / 1e3) / 1e9
    out["copy512MB_ms"] = round(ms, 3)
    out["copy_gbps_rw"] = round(bw, 1)
    print(f"copy 512MB (at.add): {ms:.3f} ms = {bw:.1f} GB/s r+w",
          file=sys.stderr, flush=True)

    # ---- gelu WITHOUT the jitter copy (key-dependent scalar multiply
    # fused into the read): isolates the elementwise op
    import flax.linen as nn
    ms = chain_ms(lambda k, x: nn.gelu(
        x * (1 + 1e-9 * k[0].astype(x.dtype)), approximate=False), x, K=32)
    out["gelu_nocopy_ms"] = round(ms, 3)
    print(f"gelu fused-jitter: {ms:.3f} ms", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
