#!/usr/bin/env python
"""Prototype: fused Pallas kernel for the AR decode's serial core.

Measures whether fusing the per-row 15-layer gated vertical chain into ONE
kernel (fori_loop over rows inside a single pallas_call) beats the XLA
lax.scan formulation, which is ~78% fixed per-op overhead (see CLAUDE.md).

This is a TIMING prototype: it runs the real dataflow shape (15 gated
conv layers, (B=1, W=2, 256) activations, 75 rows, carried row state) with
weights resident as kernel inputs, but without token sampling/embedding
feedback — enough to bound the achievable speedup before investing in the
full sampling kernel.
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DIM = 256
L = 15
H = 75
# per mask-B layer: vertical conv kernel (2 rows, 3 cols) -> for W=2 the two
# output columns read [prev_row, cur_row] x [colpad| c0 c1 |colpad].
# Express per column as one (4*DIM, 2*DIM) matmul over
# [prev_c0, prev_c1, cur_c0, cur_c1] with zeros folded into the weights.


def make_weights(rng):
    # single (L, 2, DIM, 2*DIM) bf16 table (~8 MB) shared between columns
    # and tap pairs — VMEM is hard-limited to 16 MB (measured), so the
    # prototype keeps the OP COUNT representative while halving storage.
    k1, _ = jax.random.split(rng)
    w = jax.random.normal(k1, (L, 2, DIM, 2 * DIM), jnp.bfloat16) * 0.05
    return w


def pallas_vert_chain(w):
    """One kernel: H rows x L layers of gated vertical convs."""

    def kernel(w_ref, out_ref, prev_ref, cur_ref):
        # prev_ref / cur_ref: (L+1, 2, DIM) carried activations per layer
        prev_ref[...] = jnp.zeros_like(prev_ref)
        cur_ref[...] = jnp.zeros_like(cur_ref)

        def row_body(r, _):
            def layer_body(l, _):
                taps = (prev_ref[l, 0, :], prev_ref[l, 1, :],
                        cur_ref[l, 0, :], cur_ref[l, 1, :])
                h0 = jnp.zeros((1, 2 * DIM), jnp.float32)
                h1 = jnp.zeros((1, 2 * DIM), jnp.float32)
                for i, t in enumerate(taps):
                    xb = t[None, :].astype(jnp.bfloat16)
                    h0 = h0 + jnp.dot(xb, w_ref[l, i % 2],
                                      preferred_element_type=jnp.float32)
                    h1 = h1 + jnp.dot(xb, w_ref[l, (i + 1) % 2],
                                      preferred_element_type=jnp.float32)
                g0 = jnp.tanh(h0[0, :DIM]) * jax.nn.sigmoid(h0[0, DIM:])
                g1 = jnp.tanh(h1[0, :DIM]) * jax.nn.sigmoid(h1[0, DIM:])
                # carry: this layer's input row becomes prev; gated out is
                # next layer's current-row input
                prev_ref[l, 0, :] = taps[2]
                prev_ref[l, 1, :] = taps[3]
                cur_ref[l + 1, 0, :] = g0
                cur_ref[l + 1, 1, :] = g1
                return 0

            jax.lax.fori_loop(0, L, layer_body, 0)
            return 0

        jax.lax.fori_loop(0, H, row_body, 0)
        out_ref[...] = cur_ref[L]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2, DIM), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((L + 1, 2, DIM), jnp.float32),
                        pltpu.VMEM((L + 1, 2, DIM), jnp.float32)],
    )(w)


def xla_vert_chain(w):
    """Same dataflow under lax.scan + per-layer XLA ops (the status quo)."""

    def row(carry, _):
        prev, cur = carry

        def layer(l, pc):
            prev, cur = pc
            x = jnp.stack([prev[l, 0], prev[l, 1], cur[l, 0], cur[l, 1]])  # (4, DIM)
            xb = x.astype(jnp.bfloat16)
            h0 = sum(jnp.dot(xb[i][None], w[l, i % 2],
                             preferred_element_type=jnp.float32)
                     for i in range(4))
            h1 = sum(jnp.dot(xb[i][None], w[l, (i + 1) % 2],
                             preferred_element_type=jnp.float32)
                     for i in range(4))
            g0 = jnp.tanh(h0[0, :DIM]) * jax.nn.sigmoid(h0[0, DIM:])
            g1 = jnp.tanh(h1[0, :DIM]) * jax.nn.sigmoid(h1[0, DIM:])
            prev = prev.at[l].set(cur[l])
            cur = cur.at[l + 1, 0].set(g0).at[l + 1, 1].set(g1)
            return prev, cur

        prev, cur = jax.lax.fori_loop(0, L, layer, (prev, cur))
        return (prev, cur), None

    init = (jnp.zeros((L + 1, 2, DIM)), jnp.zeros((L + 1, 2, DIM)))
    (prev, cur), _ = jax.lax.scan(row, init, None, length=H)
    return cur[L]


def bench(fn, *args, n=10):
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    np.asarray(r)
    return (time.perf_counter() - t0) * 1000 / n


def main():
    w = make_weights(jax.random.PRNGKey(0))
    f_pl = jax.jit(pallas_vert_chain)
    f_xla = jax.jit(xla_vert_chain)
    a = np.asarray(f_pl(w))
    b = np.asarray(f_xla(w))
    print("outputs close:", np.allclose(a, b, atol=1e-3))
    print(f"pallas fused: {bench(f_pl, w):.2f} ms")
    print(f"xla scan:     {bench(f_xla, w):.2f} ms")


if __name__ == "__main__":
    main()
