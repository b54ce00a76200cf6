"""Layer-by-layer timing of the wav2vec conv extractor at batch B, plus
exact GEMM reformulations of the strided convs.

The extractor measured ~29% MFU at B=8 (6.7 ms bf16) where the
transformer hits ~44%.  Hypothesis: XLA's strided-conv lowering is the
gap.  A stride-2 conv is exactly a dense GEMM over a ZERO-COPY pair
reshape (T, C) -> (T/2, 2C):
  k=2, s=2:  y[i] = W0 x[2i] + W1 x[2i+1]            = p[i] @ [W0; W1]
  k=3, s=2:  y[i] = (above) + W2 x[2i+2]             = ... + p[i+1, :C] @ W2
(unlike the round-3 phase-split attempt, there is NO im2col concat —
the pair view is a reshape of the same buffer, and the second GEMM input
is a contiguous slice, so extra traffic is ~0.5x the input, not 3x).

Usage: python scripts/profile_extractor.py [B]
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

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rng = jax.random.PRNGKey(0)

    def chain_ms(fn, *fn_args, K=64):
        @jax.jit
        def run_k(key, *args):
            def step(c, k):
                out = fn(k, *args)
                return c, jax.tree_util.tree_map(
                    lambda x: x.reshape(-1)[-1].astype(jnp.float32), out)
            _, outs = jax.lax.scan(step, 0, jax.random.split(key, K))
            return outs
        r = run_k(jax.random.PRNGKey(1), *fn_args)
        jax.tree_util.tree_map(np.asarray, r)
        t0 = time.perf_counter()
        r = run_k(jax.random.PRNGKey(2), *fn_args)
        jax.tree_util.tree_map(np.asarray, r)
        return (time.perf_counter() - t0) * 1000.0 / K

    def jit_in(w, k):
        return w.at[(0,) * w.ndim].add(1e-9 * k[0].astype(w.dtype))

    out = {"batch": B, "backend": jax.default_backend()}

    # layer specs of the wav2vec extractor after L0: (T_in, k, s)
    layers = [(32000 - 1, 3, 2), (16000 - 1, 3, 2), (8000 - 1, 3, 2),
              (4000 - 1, 3, 2), (2000 - 1, 2, 2), (1000, 2, 2)]
    C = 512

    for dt_tag, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        for li, (T, k, s) in enumerate(layers, start=1):
            Te = (T // s) * s                      # even length for pairs
            x = jax.random.normal(rng, (B, Te, C), dt)
            w = jax.random.normal(rng, (k, C, C), dt) * 0.02
            Tout = (Te - k) // s + 1

            conv = lambda kk, xx, ww: jax.lax.conv_general_dilated(
                jit_in(xx, kk), ww, (s,), "VALID",
                dimension_numbers=("NWC", "WIO", "NWC"))
            ms_conv = chain_ms(conv, x, w)

            if k == 2:
                def gemm(kk, xx, ww):
                    p = jit_in(xx, kk).reshape(B, Te // s, s * C)
                    return p @ ww.reshape(s * C, C)
                ms_gemm = chain_ms(gemm, x, w)
            else:
                def gemm(kk, xx, ww):
                    p = jit_in(xx, kk).reshape(B, Te // s, s * C)
                    y = p @ ww[:2].reshape(2 * C, C)
                    y = y.at[:, :-1].add(p[:, 1:, :C] @ ww[2])
                    return y[:, :Tout]
                ms_gemm = chain_ms(gemm, x, w)

            out[f"L{li}_{dt_tag}_conv_ms"] = round(ms_conv, 3)
            out[f"L{li}_{dt_tag}_gemm_ms"] = round(ms_gemm, 3)
            print(f"[B={B} {dt_tag}] L{li} T={Te} k={k}: conv {ms_conv:.3f}"
                  f"  pair-gemm {ms_gemm:.3f} ms", file=sys.stderr, flush=True)

    # elementwise costs at the L0 output shape
    x0 = jax.random.normal(rng, (B, 31999, C), jnp.float32)
    out["gelu_exact_L0_ms"] = round(chain_ms(
        lambda k, x: nn.gelu(jit_in(x, k), approximate=False), x0), 3)
    out["gelu_tanh_L0_ms"] = round(chain_ms(
        lambda k, x: nn.gelu(jit_in(x, k), approximate=True), x0), 3)
    print(f"[B={B}] gelu L0 exact {out['gelu_exact_L0_ms']} "
          f"tanh {out['gelu_tanh_L0_ms']} ms", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
