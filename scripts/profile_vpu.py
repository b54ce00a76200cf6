"""Clean elementwise/BW/conv calibration with FUSED jitter.

profile_extractor.py's `.at[0,0].add` jitter copies the whole input every
iteration (big-buffer tax at copy BW); here the jitter is a scalar
multiply fused into the consumer's read, so each op is measured at its
true traffic.  Pins down: effective HBM BW (add1), VPU transcendental
cost (tanh/exp/erf/gelu), strided-slice relayout cost, and the L1
extractor conv without copy tax.

Usage: python scripts/profile_vpu.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    def chain_ms(fn, *fn_args, K=32):
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

    def eps(k, dt):
        return (1 + 1e-9 * k[0].astype(jnp.float32)).astype(dt)

    shape = (8, 31999, 512)        # L0 output of the wav2vec extractor
    nel = int(np.prod(shape))
    for tag, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        x = jax.random.normal(rng, shape, dt)
        nbytes = nel * x.dtype.itemsize
        ops = {
            "add1": lambda k, x: x * eps(k, x.dtype) + 1,
            "tanh": lambda k, x: jnp.tanh(x * eps(k, x.dtype)),
            "exp": lambda k, x: jnp.exp(x * eps(k, x.dtype)),
            "erf": lambda k, x: jax.scipy.special.erf(x * eps(k, x.dtype)),
            "gelu_exact": lambda k, x: nn.gelu(x * eps(k, x.dtype),
                                               approximate=False),
            "gelu_tanh": lambda k, x: nn.gelu(x * eps(k, x.dtype),
                                              approximate=True),
            "slice_even": lambda k, x: x[:, ::2] * eps(k, x.dtype),
        }
        for name, fn in ops.items():
            ms = chain_ms(fn, x)
            gbps = (2 * nbytes if name != "slice_even" else
                    1.5 * nbytes) / (ms / 1e3) / 1e9
            out[f"{name}_{tag}_ms"] = round(ms, 3)
            out[f"{name}_{tag}_gbps"] = round(gbps, 1)
            print(f"{name} {tag}: {ms:.3f} ms ({gbps:.0f} GB/s)",
                  file=sys.stderr, flush=True)

    # L1 conv without copy tax (jitter fused into the conv read)
    for tag, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        x = jax.random.normal(rng, (8, 31998, 512), dt)
        w = jax.random.normal(rng, (3, 512, 512), dt) * 0.02
        ms = chain_ms(lambda k, x, w: jax.lax.conv_general_dilated(
            x * eps(k, x.dtype), w, (2,), "VALID",
            dimension_numbers=("NWC", "WIO", "NWC")), x, w)
        tf = 2 * 8 * 15998 * 512 * 3 * 512 / (ms / 1e3) / 1e12
        out[f"convL1_{tag}_ms"] = round(ms, 3)
        out[f"convL1_{tag}_tflops"] = round(tf, 1)
        print(f"conv L1 {tag} (fused jitter): {ms:.3f} ms = {tf:.1f} TF",
              file=sys.stderr, flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
