#!/usr/bin/env python
"""Fused-decoder frontier map: where does the single-kernel Pallas AR
decode stop fitting VMEM, and what does the XLA fallback cost there?

Sweeps (B, H) over serving-realistic shapes (H = T/4 rows; H=75 is a 10 s
clip), reporting for each cell the analytic VMEM footprint
(pixelcnn_pallas.fused_vmem_bytes — the gate generate_conv_poses
consults), whether the fused kernel is admitted, and the measured device
ms of the admitted path (K-chained, input-jittered; CLAUDE.md rules).
Cells past the frontier measure the lax.scan XLA sampler instead, so the
fallback cost is a published number rather than a silent cliff.

Output: one JSON dict -> paste into PARITY.md's frontier table.
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


def chain_ms(fn, args, K=32):
    """Device ms/iter; args[0] (audio) jittered per iteration via a fused
    scalar multiply (large-buffer .at[] jitter copies the buffer —
    CLAUDE.md trap #1); the PRNG key varies per iteration."""
    @jax.jit
    def run_k(key, *a):
        def body(c, k):
            aud = a[0] * (1 + 1e-9 * c)
            out = fn(k, aud, *a[1:])
            s = sum(jnp.sum(jnp.asarray(o, jnp.float32))
                    for o in jax.tree_util.tree_leaves(out))
            return c + 1 + s * 0, s
        _, ss = jax.lax.scan(body, jnp.zeros(()), jax.random.split(key, K))
        return ss

    key = jax.random.PRNGKey(11)
    np.asarray(run_k(key, *args))
    best = float("inf")
    for i in range(2):
        t0 = time.perf_counter()
        np.asarray(run_k(jax.random.fold_in(key, i), *args))
        best = min(best, (time.perf_counter() - t0) * 1000 / K)
    return best


def main():
    from talkshow_tpu.models.body import (_fused_chunk_size,
                                          create_body_models,
                                          sample_tokens_fused_chunked)
    from talkshow_tpu.models.pixelcnn import sample_tokens
    from talkshow_tpu.models.pixelcnn_pallas import (
        FUSED_VMEM_BUDGET, MAX_FUSED_BATCH, fused_vmem_bytes,
        pack_decode_tables, sample_tokens_fused)

    models = create_body_models(jax.random.PRNGKey(0))
    tables = pack_decode_tables(models.prior, models.prior_vars)
    out = {"budget_mb": FUSED_VMEM_BUDGET / 2**20,
           "max_fused_batch": MAX_FUSED_BATCH, "cells": []}

    for B in (1, 8, 16, 32, 64):
        for H in (75, 150, 300):
            vmem = fused_vmem_bytes(models.prior, H, B)
            admitted = (B <= MAX_FUSED_BATCH and vmem <= FUSED_VMEM_BUDGET)
            audio = jnp.asarray(
                np.random.default_rng(0).standard_normal((B, H, 256)),
                jnp.float32)
            ids = jnp.zeros((B,), jnp.int32)

            # weights/tables MUST be jit args, never closures: closed-over
            # arrays become HLO constants (~2.7x slower + HTTP 413 risk on
            # axon remote compile — CLAUDE.md).
            if admitted:
                def fn(key, aud, pv, ids_, tb):
                    return sample_tokens_fused(models.prior, pv, ids_, aud,
                                               key, tables=tb)
                extra = (models.prior_vars, ids, tables)
            else:
                def fn(key, aud, pv, ids_):
                    return sample_tokens(models.prior, pv, ids_, aud, key)
                extra = (models.prior_vars, ids)
            try:
                ms = chain_ms(fn, (audio,) + extra,
                              K=16 if H > 150 or not admitted else 32)
                cell = {"B": B, "H": H, "vmem_mb": round(vmem / 2**20, 1),
                        "fused": admitted, "ms": round(ms, 2),
                        "ms_per_clip": round(ms / B, 3)}
            except Exception as e:   # publish the failure, not a crash
                cell = {"B": B, "H": H, "vmem_mb": round(vmem / 2**20, 1),
                        "fused": admitted, "error": str(e)[:200]}

            if not admitted:
                # past the single-launch frontier generate_conv_poses now
                # CHUNKS the batch over sequential fused launches — measure
                # that path too so the win over the XLA fallback is a
                # published number
                chunk = _fused_chunk_size(models.prior, H, B)
                if chunk is not None:
                    def fnc(key, aud, pv, ids_, tb, chunk=chunk):
                        return sample_tokens_fused_chunked(
                            models.prior, pv, ids_, aud, key, chunk,
                            tables=tb)
                    try:
                        msc = chain_ms(fnc, (audio, models.prior_vars, ids,
                                             tables), K=16)
                        cell.update(chunk=chunk, chunked_ms=round(msc, 2),
                                    chunked_ms_per_clip=round(msc / B, 3))
                    except Exception as e:
                        cell.update(chunk=chunk,
                                    chunked_error=str(e)[:200])
            out["cells"].append(cell)
            print(cell, flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
