"""Column-folded teacher-forced forward for the Gated PixelCNN prior.

Layout experiment for the TRAINING forward (VERDICT r3 weak #4): the
canonical forward (models/pixelcnn.py, mirroring
nets/spg/gated_pixelcnn_v2.py:90-150) carries NHWC activations of shape
(B, H=T/4, W=2, dim).  On TPU the W=2 axis lands on the sublane dimension
of the (8, 128) tile, so every activation tensor occupies 4x its logical
bytes and every conv/elementwise op pays ~4x HBM traffic — the measured
39% MFU of the pixel-prior forward is bandwidth-bound on exactly this
(scripts/profile_train_pixel.py, CLAUDE.md).

Here the [body, hand] column axis is folded into the channel (lane) axis:
activations are (B, H, 2*C) with layout [col0-block | col1-block], fully
tiling the lanes.  Everything is expressed over the CANONICAL parameter
pytree of models/pixelcnn.GatedPixelCNN — folding is a compute-layout
choice, not a new checkpoint format:

  * masked vertical convs  -> per-tap shifted-row GEMMs with a folded
    (2C -> 2*Cout) weight that drops the W zero-padding taps entirely;
  * masked horizontal convs -> one folded GEMM with the causal column
    structure baked into zero blocks;
  * shared-weight 1x1 convs -> two lane-aligned slice-GEMMs reusing the
    same weight (no blockdiag flop waste);
  * gates/class-embeddings  -> lane-aligned slice/concat elementwise.

Numerically equal (up to f32 reassociation) to model.apply(...) in eval
mode; asserted in tests/test_pixelcnn_folded.py.  Training dropout draws
its own (B, H, 1) keep mask — same distribution, different bits than the
flax Dropout call.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from talkshow_tpu.models.pixelcnn import GatedPixelCNN


def _shift_down(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """Rows shifted down by s (row h becomes row h-s), zero-filled top."""
    if s == 0:
        return x
    return jnp.pad(x, ((0, 0), (s, 0), (0, 0)))[:, : x.shape[1]]


def _gate2(v: jnp.ndarray, g: int) -> jnp.ndarray:
    """Folded gate: v is (B, H, 2*(2g)) = [col0 a|b, col1 a|b] ->
    (B, H, 2g) = [col0 tanh(a)*sig(b), col1 ...]."""
    a = jnp.concatenate([v[..., :g], v[..., 2 * g:3 * g]], axis=-1)
    b = jnp.concatenate([v[..., g:2 * g], v[..., 3 * g:]], axis=-1)
    return jnp.tanh(a) * jax.nn.sigmoid(b)


def _shared_1x1(x: jnp.ndarray, p: dict, cin: int, dtype) -> jnp.ndarray:
    """Shared-weight 1x1 conv over both folded columns: x (B, H, 2*cin),
    weight applied per column block via two lane-aligned slice-GEMMs."""
    w = p["kernel"].reshape(cin, -1).astype(dtype)
    b = p["bias"].astype(dtype)
    y0 = x[..., :cin] @ w
    y1 = x[..., cin:] @ w
    return jnp.concatenate([y0 + b, y1 + b], axis=-1)


def _fold_vert(kernel: jnp.ndarray):
    """(vrows, 3, C, O) vertical kernel (W padded by 1 both sides in the
    canonical conv) -> per-tap folded (2C, 2O) weights.  Output col0 reads
    input cols [pad,0,1] -> taps w=1,2; col1 reads [0,1,pad] -> w=0,1.
    The pad taps vanish (they multiplied zeros)."""
    taps = []
    for t in range(kernel.shape[0]):
        k = kernel[t]                       # (3, C, O)
        col0 = jnp.concatenate([k[1], k[2]], axis=0)   # (2C, O)
        col1 = jnp.concatenate([k[0], k[1]], axis=0)
        taps.append(jnp.concatenate([col0, col1], axis=1))  # (2C, 2O)
    return taps


def _fold_horiz(kernel: jnp.ndarray, mask_type: str):
    """Horizontal masked kernel -> folded (2C, 2O).
    mask B: (1, 2, C, O), taps [w-1, w]: col0 = c0@K1; col1 = c0@K0 + c1@K1.
    mask A: (1, 1, C, O), tap  [w-1]   : col0 = 0;     col1 = c0@K0."""
    if mask_type == "B":
        k0, k1 = kernel[0, 0], kernel[0, 1]
        z = jnp.zeros_like(k0)
        return jnp.concatenate([
            jnp.concatenate([k1, z], axis=0),        # -> col0
            jnp.concatenate([k0, k1], axis=0),       # -> col1
        ], axis=1)
    k0 = kernel[0, 0]
    z = jnp.zeros_like(k0)
    return jnp.concatenate([
        jnp.concatenate([z, z], axis=0),
        jnp.concatenate([k0, z], axis=0),
    ], axis=1)


def folded_logits(model: GatedPixelCNN, params: dict, tokens: jnp.ndarray,
                  label: jnp.ndarray, audio: jnp.ndarray,
                  train: bool = False, dropout_rng: Any = None) -> jnp.ndarray:
    """Teacher-forced logits, column-folded.  params = variables['params']
    of the canonical GatedPixelCNN.  tokens (B, H, 2) int32 -> logits
    (B, H, 2, input_dim)."""
    if not model.bh_model:
        raise NotImplementedError("folded path assumes bh_model=True")
    D = model.dim
    dt = model.dtype or jnp.float32
    B, H, _ = tokens.shape

    emb = params["embedding"]["embedding"].astype(dt)
    e0 = jnp.take(emb, tokens[:, :, 0], axis=0)        # (B, H, D)
    e1 = jnp.take(emb, tokens[:, :, 1], axis=0)
    x = jnp.concatenate([e0, e1], axis=-1)             # (B, H, 2D)
    x_v = x_h = x

    aud_term = None
    if model.audio:
        ka = params["embedding_aud"]["kernel"].reshape(-1, D).astype(dt)
        ba = params["embedding_aud"]["bias"].astype(dt)
        aud_e = audio.astype(dt) @ ka + ba             # (B, H, D)
        if train:
            keep = jax.random.bernoulli(dropout_rng, 0.9, (B, H, 1))
            aud_e = aud_e * (keep.astype(dt) / jnp.asarray(0.9, dt))

    for i in range(model.n_layers):
        lp = params[f"layer_{i}"]
        mask_type = "A" if i == 0 else "B"
        if i == 1 and model.audio:
            # fusion_{v,h}: per-column 1x1 on concat([x, aud_e]) — the
            # audio half is column-independent, so it is computed ONCE
            # and added to both column blocks
            for which, src in (("fusion_v", "v"), ("fusion_h", "h")):
                k = params[which]["kernel"].reshape(2 * D, D).astype(dt)
                b = params[which]["bias"].astype(dt)
                wx, wa = k[:D], k[D:]
                t = aud_e @ wa + b
                xx = x_v if src == "v" else x_h
                y = jnp.concatenate([xx[..., :D] @ wx + t,
                                     xx[..., D:] @ wx + t], axis=-1)
                if src == "v":
                    x_v = y
                else:
                    x_h = y

        cls = jnp.take(lp["class_embed"]["embedding"].astype(dt), label,
                       axis=0)                          # (B, 2D)
        cls2 = jnp.concatenate([cls, cls], axis=-1)[:, None, :]  # (B,1,4D)

        # vertical stack: shifted-row GEMMs. mask A reads rows h-3..h-1
        # (shifts 3,2,1); mask B reads rows h-1..h (shifts 1,0)
        vk = lp["vert_stack"]["kernel"].astype(dt)
        vb = lp["vert_stack"]["bias"].astype(dt)
        taps = _fold_vert(vk)
        shifts = (3, 2, 1) if mask_type == "A" else (1, 0)
        terms = [_shift_down(x_v, s) @ w for s, w in zip(shifts, taps)]
        h_vert = sum(terms[1:], start=terms[0]) + jnp.concatenate([vb, vb])
        out_v = _gate2(h_vert + cls2, D)                # (B, H, 2D)

        # horizontal stack
        v2h = _shared_1x1(h_vert, lp["vert_to_horiz"], 2 * D, dt)
        hk = _fold_horiz(lp["horiz_stack"]["kernel"].astype(dt), mask_type)
        hb = lp["horiz_stack"]["bias"].astype(dt)
        h_horiz = x_h @ hk + jnp.concatenate([hb, hb])
        out = _gate2(v2h + h_horiz + cls2, D)
        out_h = _shared_1x1(out, lp["horiz_resid"], D, dt)
        if i > 0:
            out_h = out_h + x_h
        x_v, x_h = out_v, out_h

    hid = _shared_1x1(x_h, params["out_hidden"], D, dt)   # (B, H, 2*512)
    hid = jax.nn.relu(hid)
    wl = params["out_logits"]["kernel"].reshape(512, -1).astype(dt)
    bl = params["out_logits"]["bias"].astype(dt)
    l0 = hid[..., :512] @ wl + bl
    l1 = hid[..., 512:] @ wl + bl
    return jnp.stack([l0, l1], axis=2)                  # (B, H, 2, K)
