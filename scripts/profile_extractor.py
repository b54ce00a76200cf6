"""Layer-by-layer timing of the wav2vec conv extractor at batch B, vs an
exact GEMM reformulation of the strided convs.

Methodology matters here (see CLAUDE.md "component-microbenchmark trap"):
inputs are jittered with a FUSED scalar multiply (not `.at[].add`, which
copies the whole buffer), and the scan reducer is `jnp.sum` (a single
element invites DCE — a conv collapses to its last receptive field; a
full `reshape(-1)[-1]` linearizes the tiled output at copy bandwidth).

Verdict (B=8, clean harness): XLA's stride-2 conv runs L1 at ~138
effective TF — about 80% of the chip's net GEMM ceiling — and the
shift-GEMM formulation below loses ~2x to its pair relayout.  The conv
extractor is at the XLA floor; kept as the measurement receipt:

  k=2, s=2:  y[i] = W0 x[2i] + W1 x[2i+1]        = p[i] @ [W0; W1]
  k=3, s=2:  y[i] = (above) + W2 x[2i+2]
           = (p @ [W0; W1])[:-1] + p[1:, :C] @ W2
with p = x.reshape(B, T/2, 2C) (one relayout the GEMM can fold into its
operand fetch; no im2col concat, no .at[].add materialization).

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
                    lambda x: jnp.sum(x, dtype=jnp.float32), out)
            _, outs = jax.lax.scan(step, 0, jax.random.split(key, K))
            return outs
        r = run_k(jax.random.PRNGKey(1), *fn_args)
        jax.tree_util.tree_map(np.asarray, r)
        t0 = time.perf_counter()
        r = run_k(jax.random.PRNGKey(2), *fn_args)
        jax.tree_util.tree_map(np.asarray, r)
        return (time.perf_counter() - t0) * 1000.0 / K

    def eps(k, dt):
        return (1 + 1e-9 * k[0].astype(jnp.float32)).astype(dt)

    out = {"batch": B, "backend": jax.default_backend()}

    # layer specs of the wav2vec extractor after L0: (T_in, k, s)
    layers = [(31999, 3, 2), (15999, 3, 2), (7999, 3, 2),
              (3999, 3, 2), (1999, 2, 2), (999, 2, 2)]
    C = 512

    for dt_tag, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        for li, (T, k, s) in enumerate(layers, start=1):
            Te = (T // s) * s                      # even length for pairs
            x = jax.random.normal(rng, (B, Te, C), dt)
            w = jax.random.normal(rng, (k, C, C), dt) * 0.02
            Tout = (Te - k) // s + 1

            conv = lambda kk, xx, ww: jax.lax.conv_general_dilated(
                xx * eps(kk, xx.dtype), ww, (s,), "VALID",
                dimension_numbers=("NWC", "WIO", "NWC"))
            ms_conv = chain_ms(conv, x, w)

            if k == 2:
                def gemm(kk, xx, ww):
                    p = (xx * eps(kk, xx.dtype)).reshape(B, Te // s, s * C)
                    return p @ ww.reshape(s * C, C)
            else:
                def gemm(kk, xx, ww):
                    p = (xx * eps(kk, xx.dtype)).reshape(B, Te // 2, 2 * C)
                    y01 = p @ ww[:2].reshape(2 * C, C)          # (B,T/2,C)
                    y2 = p[:, 1:Tout + 1, :C] @ ww[2]
                    return y01[:, :Tout] + y2
            ms_gemm = chain_ms(gemm, x, w)

            # numeric check (float-assoc tolerance)
            k0 = jnp.zeros(2, jnp.uint32)
            yc = np.asarray(conv(k0, x, w), np.float32)
            yg = np.asarray(gemm(k0, x, w), np.float32)
            err = float(np.max(np.abs(yc - yg))
                        / max(np.max(np.abs(yc)), 1e-6))
            out[f"L{li}_{dt_tag}_conv_ms"] = round(ms_conv, 3)
            out[f"L{li}_{dt_tag}_gemm_ms"] = round(ms_gemm, 3)
            print(f"[B={B} {dt_tag}] L{li} T={Te} k={k}: conv {ms_conv:.3f}"
                  f"  shift-gemm {ms_gemm:.3f} ms  (rel err {err:.1e})",
                  file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
