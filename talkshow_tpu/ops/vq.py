"""EMA vector quantization — functional state + Pallas nearest-code kernel.

Semantics match the reference VectorQuantizerEMA
(nets/spg/vqvae_modules.py:244-323): L2 nearest-code lookup, straight-through
estimator, commitment loss (beta=0.25), and debiased EMA codebook updates
with Laplace-smoothed cluster sizes.  Unlike the reference (mutable torch
buffers), the codebook state is an explicit pytree threaded through the
train step, so the whole update runs inside one jitted program.

The hot op — nearest-code search, an (N, D) x (D, K) distance matmul +
argmin — is a Pallas TPU kernel (`nearest_code_pallas`); a pure-jnp
reference (`nearest_code_xla`) backs it for CPU tests and serves as the
ground truth in kernel unit tests.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU too, but guard for safety
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None


class VQState(NamedTuple):
    """EMA codebook state (one per quantizer)."""
    embeddings: jnp.ndarray       # (K, D)
    ema_dw_hidden: jnp.ndarray    # (K, D)  biased EMA accumulator
    ema_count_hidden: jnp.ndarray  # (K,)   biased EMA accumulator
    counter: jnp.ndarray          # ()      int32 update count


def init_vq_state(rng, num_embeddings: int, embedding_dim: int) -> VQState:
    # xavier-uniform init, as the reference (vqvae_modules.py:266-267)
    limit = (6.0 / (num_embeddings + embedding_dim)) ** 0.5
    emb = jax.random.uniform(rng, (num_embeddings, embedding_dim),
                             minval=-limit, maxval=limit, dtype=jnp.float32)
    return VQState(
        embeddings=emb,
        ema_dw_hidden=jnp.zeros_like(emb),
        ema_count_hidden=jnp.zeros((num_embeddings,), jnp.float32),
        counter=jnp.zeros((), jnp.int32),
    )


# ---------------------------------------------------------------------------
# Nearest-code search
# ---------------------------------------------------------------------------

def nearest_code_xla(flat_x: jnp.ndarray, embeddings: jnp.ndarray) -> jnp.ndarray:
    """argmin_k ||x - e_k||^2 over (N, D) x (K, D) -> (N,) int32."""
    # ||x||^2 is constant per row; drop it from the argmin.
    dist = -2.0 * flat_x @ embeddings.T + jnp.sum(embeddings**2, axis=1)[None, :]
    return jnp.argmin(dist, axis=1).astype(jnp.int32)


def _nearest_code_kernel(x_ref, emb_t_ref, e2_ref, out_ref):
    # x_ref: (TILE_N, D); emb_t_ref: (D, K); e2_ref: (1, K); out_ref: (TILE_N, 1)
    dist = (
        jnp.dot(x_ref[:], emb_t_ref[:], preferred_element_type=jnp.float32) * -2.0
        + e2_ref[:]
    )
    out_ref[:] = jnp.argmin(dist, axis=1, keepdims=True).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("tile_n",))
def nearest_code_pallas(flat_x: jnp.ndarray, embeddings: jnp.ndarray,
                        tile_n: int = 512) -> jnp.ndarray:
    """Pallas TPU nearest-code: tiles rows of x; codebook kept in VMEM.

    codebook (2048 x 64 f32 = 512 KiB) + a 512-row x tile fit comfortably in
    VMEM; the distance matmul runs on the MXU.
    """
    n, d = flat_x.shape
    k = embeddings.shape[0]
    n_pad = -(-n // tile_n) * tile_n
    x = jnp.pad(flat_x, ((0, n_pad - n), (0, 0)))
    emb_t = embeddings.T                      # (D, K)
    e2 = jnp.sum(embeddings**2, axis=1)[None, :]  # (1, K)

    grid = (n_pad // tile_n,)
    out = pl.pallas_call(
        _nearest_code_kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, d), lambda i: (i, 0)),
            pl.BlockSpec((d, k), lambda i: (0, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile_n, 1), lambda i: (i, 0)),
    )(x, emb_t, e2)
    return out[:n, 0]


def nearest_code(flat_x: jnp.ndarray, embeddings: jnp.ndarray) -> jnp.ndarray:
    """Dispatch: Pallas kernel on TPU, XLA fallback elsewhere."""
    platform = jax.default_backend()
    if platform == "tpu":
        return nearest_code_pallas(flat_x, embeddings)
    return nearest_code_xla(flat_x, embeddings)


# ---------------------------------------------------------------------------
# Quantize forward (eval) and train-step update
# ---------------------------------------------------------------------------

def quantize(state: VQState, z: jnp.ndarray):
    """Eval-mode quantization. z: (..., D) -> (quantized, indices)."""
    d = z.shape[-1]
    flat = z.reshape(-1, d)
    idx = nearest_code(flat, state.embeddings)
    quant = jnp.take(state.embeddings, idx, axis=0).reshape(z.shape)
    return quant, idx.reshape(z.shape[:-1])


def lookup(state: VQState, indices: jnp.ndarray) -> jnp.ndarray:
    """Codebook lookup: (...,) int -> (..., D)."""
    return jnp.take(state.embeddings, indices, axis=0)


def quantize_train(state: VQState, z: jnp.ndarray,
                   commitment_cost: float = 0.25, decay: float = 0.99,
                   epsilon: float = 1e-5):
    """Training-mode quantization with straight-through + EMA update.

    z: (..., D) encoder output.
    Returns (quantized_st, commit_loss, new_state, indices).
    The EMA update is computed on stop-gradient values, mirroring the
    torch.no_grad block in the reference (vqvae_modules.py:288-299).
    """
    d = z.shape[-1]
    flat = jax.lax.stop_gradient(z.reshape(-1, d))
    k = state.embeddings.shape[0]

    idx = nearest_code(flat, state.embeddings)
    quant = jnp.take(state.embeddings, idx, axis=0).reshape(z.shape)

    # --- EMA codebook update (debiased, Laplace-smoothed) ---
    onehot = jax.nn.one_hot(idx, k, dtype=jnp.float32)       # (N, K)
    counts = jnp.sum(onehot, axis=0)                         # (K,)
    dw = onehot.T @ flat                                     # (K, D) MXU

    counter = state.counter + 1
    ema_count_hidden = state.ema_count_hidden - (state.ema_count_hidden - counts) * (1 - decay)
    ema_dw_hidden = state.ema_dw_hidden - (state.ema_dw_hidden - dw) * (1 - decay)
    debias = 1.0 - decay ** counter.astype(jnp.float32)
    ema_count = ema_count_hidden / debias
    ema_dw = ema_dw_hidden / debias

    n_total = jnp.sum(ema_count)
    smoothed = (ema_count + epsilon) / (n_total + k * epsilon) * n_total
    new_embeddings = ema_dw / smoothed[:, None]

    new_state = VQState(new_embeddings, ema_dw_hidden, ema_count_hidden, counter)

    # --- losses & straight-through ---
    commit = commitment_cost * jnp.mean((z - jax.lax.stop_gradient(quant)) ** 2)
    quant_st = z + jax.lax.stop_gradient(quant - z)
    return quant_st, commit, new_state, idx.reshape(z.shape[:-1])
