"""Audio- and speaker-conditioned Gated PixelCNN prior over VQ token grids.

Behavioural mirror of nets/spg/gated_pixelcnn_v2.py: a stack of gated masked
2-D convolutions over the (H = T/4, W = 2 = [body, hand]) token grid with a
per-layer class-conditional embedding, audio features fused at layer 1, and
a 1x1 output head (:90-150).

TPU-first redesign of inference: the reference samples tokens by re-running
the FULL 15-layer network once per token — O(H*W) full forwards
(generate, :152-177).  Here `sample_tokens` runs a cached incremental decode
under `lax.scan`:

  * the vertical stack is strictly row-causal (mask-A layer sees embedding
    rows i-3..i-1; mask-B layers see their input at rows i-1..i, and that
    input never contains row-i tokens), so each layer's new vertical row is
    computed from a 1-2 row cache;
  * the horizontal stack only looks left within the current row, so for
    W == 2 it is re-evaluated twice per row (once per column) on (B, 2, C)
    tensors — a handful of tiny matmuls.

Per-token cost drops from O(H * layers) conv work to O(layers) on a few
rows, i.e. the whole decode is O(H) instead of O(H^2).  Equivalence with
the full teacher-forced forward is asserted in tests/test_pixelcnn.py.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

xavier = nn.initializers.xavier_uniform


def gate(x: jnp.ndarray) -> jnp.ndarray:
    """Split channels in half -> tanh(a) * sigmoid(b) (reference :16-22)."""
    a, b = jnp.split(x, 2, axis=-1)
    return jnp.tanh(a) * jax.nn.sigmoid(b)


class GatedMaskedLayer(nn.Module):
    """One gated masked conv layer (reference :25-87), NHWC.

    Masking is structural: instead of zeroing kernel rows/cols in-place each
    forward (make_causal, :57-59), the causal taps are simply not part of
    the kernel and causality comes from explicit asymmetric padding.
    """
    dim: int
    mask_type: str            # 'A' (first layer) or 'B'
    kernel: int               # 7 for A, 3 for B
    residual: bool
    n_classes: int
    bh_model: bool = True
    dtype: Any = None         # flax compute dtype (params stay f32)

    def setup(self):
        kh = self.kernel // 2 + 1
        # mask A drops the last kernel row -> kh - 1 effective rows
        self.vrows = kh - 1 if self.mask_type == "A" else kh
        wcols = 3 if self.bh_model else 1
        self.class_embed = nn.Embed(self.n_classes, 2 * self.dim,
                                    embedding_init=nn.initializers.normal(1.0),
                                    dtype=self.dtype)
        self.vert_stack = nn.Conv(2 * self.dim, (self.vrows, wcols),
                                  padding="VALID", kernel_init=xavier(),
                                  dtype=self.dtype, name="vert_stack")
        if self.bh_model:
            self.vert_to_horiz = nn.Conv(2 * self.dim, (1, 1), kernel_init=xavier(),
                                         dtype=self.dtype)
            # mask A drops the last kernel col -> 1 effective col
            self.hcols = 1 if self.mask_type == "A" else 2
            self.horiz_stack = nn.Conv(2 * self.dim, (1, self.hcols),
                                       padding="VALID", kernel_init=xavier(),
                                       dtype=self.dtype)
        self.horiz_resid = nn.Conv(self.dim, (1, 1), kernel_init=xavier(),
                                   dtype=self.dtype)

    # -- full-grid (teacher-forced) path ---------------------------------
    def vert_conv_full(self, x_v):
        """(B, H, W, dim) -> pre-gate vertical features (B, H, W, 2dim)."""
        pad_top = self.kernel // 2  # 3 for A, 1 for B
        wpad = (1, 1) if self.bh_model else (0, 0)
        xp = jnp.pad(x_v, ((0, 0), (pad_top, 0), wpad, (0, 0)))
        h = self.vert_stack(xp)
        return h[:, : x_v.shape[1]]

    def horiz_conv_full(self, x_h):
        """(B, H, W, dim) -> pre-gate horizontal features (B, H, W, 2dim)."""
        xp = jnp.pad(x_h, ((0, 0), (0, 0), (1, 0), (0, 0)))
        h = self.horiz_stack(xp)
        return h[:, :, : x_h.shape[2]]

    def __call__(self, x_v, x_h, label):
        cls = self.class_embed(label)[:, None, None, :]      # (B,1,1,2dim)
        h_vert = self.vert_conv_full(x_v)
        out_v = gate(h_vert + cls)
        if self.bh_model:
            h_horiz = self.horiz_conv_full(x_h)
            v2h = self.vert_to_horiz(h_vert)
            out = gate(v2h + h_horiz + cls)
            out_h = self.horiz_resid(out)
            if self.residual:
                out_h = out_h + x_h
        else:
            out_h = self.horiz_resid(out_v)
            if self.residual:
                out_h = out_h + x_v
            out_v = out_h
        return out_v, out_h

    # -- incremental (one-row) path ---------------------------------------
    def vert_conv_row(self, window):
        """window: (B, vrows, W, dim) = exactly the rows this layer's
        vertical conv consumes -> (B, W, 2dim) pre-gate features."""
        wpad = (1, 1) if self.bh_model else (0, 0)
        xp = jnp.pad(window, ((0, 0), (0, 0), wpad, (0, 0)))
        return self.vert_stack(xp)[:, 0]

    def horiz_row(self, h_vert_row, x_h_row, label):
        """One-row horizontal pass. h_vert_row: (B, W, 2dim) pre-gate
        vertical features; x_h_row: (B, W, dim). Returns (out_v_row, out_h_row)."""
        cls = self.class_embed(label)[:, None, :]
        out_v = gate(h_vert_row + cls)
        if not self.bh_model:
            out_h = self.horiz_resid(out_v[:, None])[:, 0]
            if self.residual:
                out_h = out_h + x_h_row
            return out_h, out_h
        xp = jnp.pad(x_h_row[:, None], ((0, 0), (0, 0), (1, 0), (0, 0)))
        h_horiz = self.horiz_stack(xp)[:, 0, : x_h_row.shape[1]]
        v2h = self.vert_to_horiz(h_vert_row[:, None])[:, 0]
        out = gate(v2h + h_horiz + cls)
        out_h = self.horiz_resid(out[:, None])[:, 0]
        if self.residual:
            out_h = out_h + x_h_row
        return out_v, out_h


class GatedPixelCNN(nn.Module):
    """Reference :90-150. tokens (B, H, W) int -> logits (B, H, W, input_dim)."""
    input_dim: int = 2048      # codebook size
    dim: int = 256
    n_layers: int = 15
    n_classes: int = 4
    audio: bool = True
    bh_model: bool = True
    audio_channels: int = 256
    #: flax compute dtype for the conv stack (params stay f32). bf16 here
    #: is the mixed-precision training path; the f32 default matches the
    #: reference exactly. Incremental decode assumes the f32 default (its
    #: scan carries are f32) — use dtype only for teacher-forced training.
    dtype: Any = None

    def setup(self):
        self.embedding = nn.Embed(self.input_dim, self.dim,
                                  embedding_init=nn.initializers.normal(1.0),
                                  dtype=self.dtype)
        if self.audio:
            self.embedding_aud = nn.Conv(self.dim, (1, 1), kernel_init=xavier(),
                                         dtype=self.dtype)
            self.fusion_v = nn.Conv(self.dim, (1, 1), kernel_init=xavier(),
                                    dtype=self.dtype)
            self.fusion_h = nn.Conv(self.dim, (1, 1), kernel_init=xavier(),
                                    dtype=self.dtype)
            self.aud_dropout = nn.Dropout(0.1)
        self.layers = [
            GatedMaskedLayer(
                dim=self.dim,
                mask_type="A" if i == 0 else "B",
                kernel=7 if i == 0 else 3,
                residual=i > 0,
                n_classes=self.n_classes,
                bh_model=self.bh_model,
                dtype=self.dtype,
                name=f"layer_{i}",
            )
            for i in range(self.n_layers)
        ]
        self.out_hidden = nn.Conv(512, (1, 1), kernel_init=xavier(),
                                  dtype=self.dtype)
        self.out_logits = nn.Conv(self.input_dim, (1, 1), kernel_init=xavier(),
                                  dtype=self.dtype)

    def head(self, x):
        return self.out_logits(nn.relu(self.out_hidden(x)))

    def __call__(self, tokens, label, audio=None, train: bool = False):
        """Teacher-forced forward.

        tokens: (B, H, W) int32; label: (B,) int32;
        audio: (B, H, audio_channels) conditioning features (broadcast over W).
        """
        x = self.embedding(tokens)                      # (B, H, W, dim)
        x_v, x_h = x, x
        for i, layer in enumerate(self.layers):
            if i == 1 and self.audio:
                aud = jnp.broadcast_to(
                    audio[:, :, None, :],
                    audio.shape[:2] + (tokens.shape[2], audio.shape[-1]),
                )
                aud_e = self.embedding_aud(aud)
                if train:
                    # per-timestep dropout of the audio condition (ref :138-141)
                    keep = self.aud_dropout(
                        jnp.ones((aud_e.shape[0], aud_e.shape[1], 1, 1)),
                        deterministic=False)
                    aud_e = aud_e * keep
                x_v = self.fusion_v(jnp.concatenate([x_v, aud_e], axis=-1))
                if self.bh_model:
                    x_h = self.fusion_h(jnp.concatenate([x_h, aud_e], axis=-1))
            x_v, x_h = layer(x_v, x_h, label)
        return self.head(x_h if self.bh_model else x_v)

    # ------------------------------------------------------------------
    # Incremental decode building blocks (called under lax.scan via apply)
    # ------------------------------------------------------------------
    def embed_tokens(self, tokens):
        return self.embedding(tokens)

    def embed_audio_row(self, aud_row, W: int):
        """(B, audio_channels) -> (B, W, dim)."""
        a = jnp.broadcast_to(aud_row[:, None, :], aud_row.shape[:1] + (W, aud_row.shape[-1]))
        return self.embedding_aud(a[:, None])[:, 0]

    def row_step(self, emb_hist, v_prev, label, aud_row):
        """Advance the vertical stack one row.

        emb_hist: (B, 3, W, dim) token embeddings of rows i-3..i-1.
        v_prev:   (n_layers-1, B, W, dim) — input x_v of layers 1..n-1 at row i-1.
        aud_row:  (B, audio_channels) or None.
        Returns (h_vert_rows: list of (B, W, 2dim), new_v_prev).
        """
        h_vert_rows = []
        new_v_prev = []
        # layer 0: mask A over embedding rows i-3..i-1
        hv = self.layers[0].vert_conv_row(emb_hist)
        h_vert_rows.append(hv)
        cls0 = self.layers[0].class_embed(label)[:, None, :]
        x_v = gate(hv + cls0)                     # out_v of layer 0 at row i
        for l in range(1, self.n_layers):
            if l == 1 and self.audio:
                aud_e = self.embed_audio_row(aud_row, x_v.shape[1])
                x_v = self.fusion_v(
                    jnp.concatenate([x_v, aud_e], axis=-1)[:, None])[:, 0]
            window = jnp.stack([v_prev[l - 1], x_v], axis=1)  # (B, 2, W, dim)
            new_v_prev.append(x_v)
            hv = self.layers[l].vert_conv_row(window)
            h_vert_rows.append(hv)
            cls = self.layers[l].class_embed(label)[:, None, :]
            x_v = gate(hv + cls)
        return h_vert_rows, jnp.stack(new_v_prev, axis=0)

    def horiz_logits_row(self, h_vert_rows, row_emb, label, aud_row):
        """Full horizontal pass for one row given cached vertical features.

        row_emb: (B, W, dim) embeddings of the current row's tokens (only
        columns left of the position being predicted are ever consumed).
        Returns logits (B, W, input_dim).
        """
        x_h = row_emb
        for l in range(self.n_layers):
            if l == 1 and self.audio:
                aud_e = self.embed_audio_row(aud_row, x_h.shape[1])
                x_h = self.fusion_h(
                    jnp.concatenate([x_h, aud_e], axis=-1)[:, None])[:, 0]
            _, x_h = self.layers[l].horiz_row(h_vert_rows[l], x_h, label)
        return self.head(x_h[:, None])[:, 0]


#: precomputed-gumbel buffer cap for the sampler (bytes).  Below it, all
#: 2H categorical draws are batched into ONE upfront threefry program; the
#: in-scan draws they replace cost per-iteration kernel overhead (~10 ms
#: of the ~16 ms B=1 decode on the remote-attached chip).  Above it (very
#: long clips x big batches: the (H, 2, B, K) f32 block), fall back to the
#: O(1)-memory per-row draws.
NOISE_PRECOMPUTE_BUDGET = 256 * 1024 * 1024


def sample_tokens_reference(model: GatedPixelCNN, variables: Any,
                            label: jnp.ndarray, audio: jnp.ndarray,
                            rng: jax.Array,
                            prefix_tokens: jnp.ndarray | None = None,
                            prefix_len: int = 0) -> jnp.ndarray:
    """Cached sampler (full-row horizontal passes); the XLA fallback for
    shapes the fused Pallas decoder rejects, and the CPU/test baseline.

    Sampling noise: `jax.random.categorical(k, logits)` IS
    `argmax(logits + gumbel(k, logits.shape))`, so the per-row draws are
    precomputed in one batched gumbel over the SAME key splits — tokens
    are bitwise identical to in-scan categorical calls (asserted in
    tests/test_pixelcnn.py), but the ~2H tiny sequential threefry kernels
    (~60 us launch overhead each inside the scan) collapse into one
    program that runs before the scan."""
    B, H, _ = audio.shape
    W = 2
    dim = model.dim
    n_layers = model.n_layers
    K = model.input_dim
    if prefix_tokens is None:
        prefix_tokens = jnp.zeros((B, H, W), jnp.int32)

    def apply(method, *args):
        return model.apply(variables, *args, method=method)

    emb_hist0 = jnp.zeros((B, 3, W, dim), jnp.float32)
    v_prev0 = jnp.zeros((n_layers - 1, B, W, dim), jnp.float32)
    rngs = jax.random.split(rng, H)
    precompute = H * W * B * K * 4 <= NOISE_PRECOMPUTE_BUDGET
    if precompute:
        # identical key tree to the in-scan path: row key -> split -> (r0,
        # r1) -> gumbel of the full (B, K) logits shape
        keys01 = jax.vmap(jax.random.split)(rngs)            # (H, 2, 2)
        noise = jax.vmap(jax.vmap(
            lambda k: jax.random.gumbel(k, (B, K))))(keys01)  # (H, 2, B, K)
    else:
        noise = jnp.zeros((H, W, 1, 1), jnp.float32)          # placeholder

    def step(carry, xs):
        emb_hist, v_prev = carry
        aud_row, given_row, step_rng, noise_row, row_idx = xs
        h_vert_rows, v_prev = apply(GatedPixelCNN.row_step, emb_hist, v_prev,
                                    label, aud_row)
        teacher = row_idx < prefix_len

        r0, r1 = jax.random.split(step_rng)

        def pick(r, g, logits):
            if precompute:
                return jnp.argmax(logits + g, axis=-1).astype(jnp.int32)
            return jax.random.categorical(r, logits).astype(jnp.int32)

        # column 0: placeholder row embedding (never read at col 0)
        row_emb = jnp.zeros((B, W, dim), jnp.float32)
        logits = apply(GatedPixelCNN.horiz_logits_row, h_vert_rows, row_emb,
                       label, aud_row)
        t0 = jnp.where(teacher, given_row[:, 0],
                       pick(r0, noise_row[0], logits[:, 0]))
        # column 1: re-run with column 0's sampled embedding in place
        e0 = apply(GatedPixelCNN.embed_tokens, t0)
        row_emb = row_emb.at[:, 0].set(e0)
        logits = apply(GatedPixelCNN.horiz_logits_row, h_vert_rows, row_emb,
                       label, aud_row)
        t1 = jnp.where(teacher, given_row[:, 1],
                       pick(r1, noise_row[1], logits[:, 1]))

        row_tokens = jnp.stack([t0, t1], axis=-1)           # (B, W)
        row_full_emb = apply(GatedPixelCNN.embed_tokens, row_tokens)
        emb_hist = jnp.concatenate([emb_hist[:, 1:], row_full_emb[:, None]], axis=1)
        return (emb_hist, v_prev), row_tokens

    xs = (
        jnp.swapaxes(audio, 0, 1),                 # (H, B, C)
        jnp.swapaxes(prefix_tokens, 0, 1),         # (H, B, W)
        rngs,
        noise,                                     # (H, W, B, K) | placeholder
        jnp.arange(H),
    )
    _, rows = jax.lax.scan(step, (emb_hist0, v_prev0), xs)
    return jnp.swapaxes(rows, 0, 1)                # (B, H, W)


# The straightforward full-row sampler above IS the fast path: experiments
# with per-column horizontal chains and hoisted v2h/class/audio embeddings
# (see git history) were 30-40% SLOWER on TPU — width-2 ops cost the same
# as width-1, so splitting work raises op count, and manually materialized
# caches defeat XLA fusion. Keep the simple formulation.
sample_tokens = sample_tokens_reference
