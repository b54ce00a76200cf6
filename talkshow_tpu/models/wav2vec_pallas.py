"""Fused Pallas TPU kernels for the wav2vec 2.0 transformer stack.

Why: the face stage (reference nets/spg/wav2vec.py:73-143 semantics,
flax mirror in models/wav2vec.py) is the largest inference cost and is
NOT FLOP-bound — at B=1 the 12-layer encoder lowers to ~150 small fused
XLA kernels whose per-launch overhead dominates (measured 1.24 ms for
~50 GFLOP that is ~0.3 ms of MXU time; bf16 compute measured neutral,
see CLAUDE.md).  This module fuses EACH ENCODER LAYER into one
`pallas_call` — qkv projection, all-head attention, output projection,
both LayerNorms and the gelu FFN — so the stack is 12 launches with all
layer weights VMEM-resident (~14 MB bf16 per layer).

Numerics: matmuls run in `dtype` (bf16 in production, f32 for the
interpret-mode parity tests) with f32 accumulation; softmax and
LayerNorm statistics are f32.  `erf` is not implemented by Mosaic, so
gelu(exact) uses the Abramowitz-Stegun 7.1.26 rational approximation
(|err| <= 1.5e-7, far below bf16 resolution).

The batch rides the grid (one program instance per sample, weights
re-used across instances); per-sample `valid_frames` masks padded key
lanes exactly like the masked flax path (models/wav2vec.py:227-231).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _erf_f32(x):
    """Abramowitz-Stegun 7.1.26 (f32, |abs err| <= 1.5e-7)."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    y = 1.0 - (((((a5 * t + a4) * t) + a3) * t + a2) * t + a1) * t \
        * jnp.exp(-ax * ax)
    return s * y


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf_f32(x * 0.7071067811865476))


# ---------------------------------------------------------------------------
# Weight packing
# ---------------------------------------------------------------------------

def pack_encoder_tables(cfg, params, dtype=jnp.bfloat16):
    """flax Wav2Vec2Encoder layer params -> per-layer MXU-friendly tables.

    params: variables["params"] of Wav2Vec2Encoder (or the face model's
    ["audio_encoder"] subtree).  Returns a list of per-layer dicts; pure
    function of params (jittable).
    """
    H = cfg.hidden_size
    layers = []
    for i in range(cfg.num_layers):
        lp = params[f"layers_{i}"]
        at = lp["attention"]

        def proj(w):                     # (H, heads, hd) -> (H, H)
            return w.reshape(H, H)

        wqkv = jnp.concatenate(
            [proj(at["query"]["kernel"]), proj(at["key"]["kernel"]),
             proj(at["value"]["kernel"])], axis=1).astype(dtype)   # (H, 3H)
        bqkv = jnp.concatenate(
            [at["query"]["bias"].reshape(-1), at["key"]["bias"].reshape(-1),
             at["value"]["bias"].reshape(-1)]).astype(jnp.float32)[None]
        wo = at["out"]["kernel"].reshape(H, H).astype(dtype)
        bo = at["out"]["bias"].reshape(-1).astype(jnp.float32)[None]
        w1 = lp["ffn_intermediate"]["kernel"].astype(dtype)        # (H, F)
        b1 = lp["ffn_intermediate"]["bias"].astype(jnp.float32)[None]
        w2 = lp["ffn_output"]["kernel"].astype(dtype)              # (F, H)
        b2 = lp["ffn_output"]["bias"].astype(jnp.float32)[None]
        ln1 = jnp.stack([lp["layer_norm"]["scale"],
                         lp["layer_norm"]["bias"]]).astype(jnp.float32)
        ln2 = jnp.stack([lp["final_layer_norm"]["scale"],
                         lp["final_layer_norm"]["bias"]]).astype(jnp.float32)
        layers.append(dict(wqkv=wqkv, bqkv=bqkv, wo=wo, bo=bo, w1=w1, b1=b1,
                           w2=w2, b2=b2, ln1=ln1, ln2=ln2))
    return layers


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _make_layer_kernel(Tp: int, H: int, F: int, nheads: int, eps: float,
                       dtype):
    hd = H // nheads
    scale = 1.0 / (hd ** 0.5)

    def dot(a, b):
        return jax.lax.dot_general(
            a.astype(dtype), b.astype(dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def ln(x, ln_ref):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        xn = (x - mu) * jax.lax.rsqrt(var + eps)
        return xn * ln_ref[0:1, :] + ln_ref[1:2, :]

    def kernel(tv_ref,                                           # SMEM (B,)
               x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
               w1_ref, b1_ref, w2_ref, b2_ref, ln1_ref, ln2_ref,
               o_ref,
               qkv, kT, ctx):                                    # scratch
        b = pl.program_id(0)
        tv = tv_ref[b]
        x = x_ref[0]                                             # (Tp, H)
        qkv[...] = dot(x, wqkv_ref[...]) + bqkv_ref[0:1, :]
        kT[...] = jnp.transpose(qkv[:, H:2 * H])                 # (H, Tp)
        lane_t = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 1)
        for h in range(nheads):
            q_h = qkv[:, h * hd:(h + 1) * hd] * scale
            s = dot(q_h, kT[h * hd:(h + 1) * hd, :])             # (Tp, Tp)
            s = jnp.where(lane_t < tv, s, -1e30)
            p = jax.nn.softmax(s, axis=-1)
            v_h = qkv[:, 2 * H + h * hd:2 * H + (h + 1) * hd]
            ctx[:, h * hd:(h + 1) * hd] = dot(p, v_h)
        x1 = x + dot(ctx[...], wo_ref[...]) + bo_ref[0:1, :]
        xn = ln(x1, ln1_ref)
        hb = _gelu_exact(dot(xn, w1_ref[...]) + b1_ref[0:1, :])  # (Tp, F)
        x2 = xn + dot(hb, w2_ref[...]) + b2_ref[0:1, :]
        o_ref[0] = ln(x2, ln2_ref)

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "dtype", "interpret"))
def _run_layers(cfg, tables, x, valid, dtype, interpret):
    B, T, H = x.shape
    F = cfg.intermediate_size
    Tp = _ceil_to(T, 8)
    x = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, Tp - T), (0, 0)))

    kernel = _make_layer_kernel(Tp, H, F, cfg.num_heads,
                                cfg.layer_norm_eps, dtype)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    row = lambda b: (b, 0, 0)  # noqa: E731
    batch_spec = pl.BlockSpec((1, Tp, H), row)
    # weights: same block for every grid step -> fetched once, resident
    rep = lambda shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape))  # noqa: E731

    call = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[smem,
                  batch_spec,
                  rep((H, 3 * H)), rep((1, 3 * H)), rep((H, H)), rep((1, H)),
                  rep((H, F)), rep((1, F)), rep((F, H)), rep((1, H)),
                  rep((2, H)), rep((2, H))],
        out_specs=batch_spec,
        out_shape=jax.ShapeDtypeStruct((B, Tp, H), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((Tp, 3 * H), jnp.float32),   # qkv
            pltpu.VMEM((H, Tp), jnp.float32),       # k^T
            pltpu.VMEM((Tp, H), jnp.float32),       # attention context
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    for t in tables:
        x = call(valid, x, t["wqkv"], t["bqkv"], t["wo"], t["bo"],
                 t["w1"], t["b1"], t["w2"], t["b2"], t["ln1"], t["ln2"])
    return x[:, :T]


def encoder_layers_fused(cfg, params, x, valid_frames=None, *,
                         tables=None, dtype=jnp.bfloat16,
                         interpret: bool | None = None):
    """Run the transformer layer stack on (B, T, H) hidden states.

    Drop-in for the `for layer in encoder_layers: x = layer(x, mask)`
    loop of models/wav2vec.py:232-233 (post-norm, masked keys).  `tables`
    from `pack_encoder_tables` (pass to avoid re-packing per call)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if tables is None:
        tables = pack_encoder_tables(cfg, params, dtype=dtype)
    B, T, _ = x.shape
    if valid_frames is None:
        valid = jnp.full((B,), T, jnp.int32)
    else:
        valid = valid_frames.astype(jnp.int32)
    return _run_layers(cfg, tables, x, valid, dtype, bool(interpret))


# ---------------------------------------------------------------------------
# Face-stage fused apply (pipeline hot path)
# ---------------------------------------------------------------------------

def face_apply_fused(face_model, face_vars, waveform, id_onehot,
                     time_steps: int, valid_samples=None, valid_frames=None,
                     *, tables=None, dtype=jnp.bfloat16,
                     interpret: bool | None = None):
    """FaceGenerator.apply with the transformer stack routed through the
    fused layer kernels (conv frontend + interpolation + projection +
    pos-conv + heads stay flax/XLA — they are a small share of the
    stage).  Inference only (no dropout/SpecAugment)."""
    from talkshow_tpu.models.wav2vec import Wav2Vec2Encoder

    cfg = face_model.wav2vec_cfg
    enc = Wav2Vec2Encoder(cfg)
    w2v_vars = {"params": face_vars["params"]["audio_encoder"]}
    x = enc.apply(w2v_vars, waveform, time_steps,
                  valid_samples=valid_samples, valid_frames=valid_frames,
                  method=Wav2Vec2Encoder.pre_layers)
    hidden = encoder_layers_fused(cfg, w2v_vars["params"], x, valid_frames,
                                  tables=tables, dtype=dtype,
                                  interpret=interpret)
    from talkshow_tpu.models.face import FaceGenerator
    return face_model.apply(face_vars, hidden, id_onehot,
                            method=FaceGenerator.from_features)
