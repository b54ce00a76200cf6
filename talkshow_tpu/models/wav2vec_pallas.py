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

def pack_face_tables(face_model, face_vars, dtype=jnp.bfloat16):
    """All fused-kernel weight tables for the face stage (pack once per
    weight set): {'enc': encoder layer list, 'ext': extractor tables}."""
    cfg = face_model.wav2vec_cfg
    p = face_vars["params"]["audio_encoder"]
    out = {"enc": pack_encoder_tables(cfg, p, dtype=dtype)}
    try:
        out["ext"] = pack_extractor_tables(cfg, p, dtype=dtype)
    except NotImplementedError:
        out["ext"] = None
    return out


def face_apply_fused(face_model, face_vars, waveform, id_onehot,
                     time_steps: int, valid_samples=None, valid_frames=None,
                     *, tables=None, dtype=jnp.bfloat16,
                     interpret: bool | None = None):
    """FaceGenerator.apply with the conv extractor AND the transformer
    stack routed through the fused Pallas kernels (interpolation,
    projection, pos-conv and the conv heads stay flax/XLA — they are a
    small share of the stage).  Inference only (no dropout/SpecAugment);
    the masked/bucketed path falls back to the flax extractor (masked
    GroupNorm statistics are not fused yet)."""
    from talkshow_tpu.models.face import FaceGenerator
    from talkshow_tpu.models.wav2vec import Wav2Vec2Encoder

    cfg = face_model.wav2vec_cfg
    enc = Wav2Vec2Encoder(cfg)
    w2v_params = face_vars["params"]["audio_encoder"]
    w2v_vars = {"params": w2v_params}
    if tables is None:
        tables = pack_face_tables(face_model, face_vars, dtype=dtype)
    if valid_samples is None and tables.get("ext") is not None:
        feats = extractor_fused(cfg, w2v_params, waveform,
                                tables=tables["ext"], dtype=dtype,
                                interpret=interpret)
        x = enc.apply(w2v_vars, feats, time_steps,
                      method=Wav2Vec2Encoder.mid_stack)
    else:
        x = enc.apply(w2v_vars, waveform, time_steps,
                      valid_samples=valid_samples,
                      valid_frames=valid_frames,
                      method=Wav2Vec2Encoder.pre_layers)
    hidden = encoder_layers_fused(cfg, w2v_params, x, valid_frames,
                                  tables=tables["enc"], dtype=dtype,
                                  interpret=interpret)
    return face_model.apply(face_vars, hidden, id_onehot,
                            method=FaceGenerator.from_features)


# ---------------------------------------------------------------------------
# Fused conv feature extractor (polyphase formulation)
# ---------------------------------------------------------------------------
#
# The raw-waveform conv stack (k10/s5 then six k3|k2/s2 VALID convs with
# GroupNorm+gelu after layer 0 and gelu after the rest — FeatureExtractor
# in models/wav2vec.py) measures 1.31 ms at 10 s/B=1 on v5e: the math is
# ~48 GFLOP (~250 us of bf16 MXU) and the rest is HBM traffic for the
# ~65 MB of intermediate activations.  This kernel keeps EVERYTHING in
# VMEM by a polyphase decomposition: a sequence x stored as m phase
# arrays P_i[j] = x[j*m + i] turns every stride-2 conv into per-phase
# matmuls with NO strided memory access —
#
#   out_phase_i[j] = P_{2i}[j] @ W0 + P_{2i+1}[j] @ W1 + P_{2i+2}[j] @ W2
#
# (the 2i+2 == m wrap reads phase 0 shifted one row; that row only feeds
# the final, always-invalid output frame of the tile).  Phase count
# halves per layer — layer-0 output starts at G = 2^(#stride-2 layers)
# phases, the last layer emits one contiguous array.  All matmuls are
# (R, C) @ (C, C) with R = ceil(T_out); GroupNorm statistics come from a
# cheap first pass over the layer-0 conv (zero-padded frames contribute
# exact zeros — the convs have no bias — so sums divide by the true
# frame count).


def _extractor_dims(cfg):
    """(k0, s0, C, n_s2, kernels_s2) after validating the conv family."""
    ks, ss, ds = cfg.conv_kernel, cfg.conv_stride, cfg.conv_dim
    if len(set(ds)) != 1:
        raise NotImplementedError("fused extractor needs uniform conv_dim")
    if any(s != 2 for s in ss[1:]) or any(k not in (2, 3) for k in ks[1:]):
        raise NotImplementedError(
            "fused extractor supports k10/s5 + (k3|k2)/s2 stacks")
    return ks[0], ss[0], ds[0], len(ks) - 1, tuple(ks[1:])


def pack_extractor_tables(cfg, params, dtype=jnp.bfloat16):
    """FeatureExtractor params -> tap-major matmul tables.

    Returns dict with w0 (k0, C) dtype, ws (n_s2, 3, C, C) dtype (k=2
    layers carry a zero third tap — the wrap read it multiplies lands on
    an always-invalid frame), gn (2, C) f32 scale/bias."""
    k0, s0, C, n_s2, ks2 = _extractor_dims(cfg)
    fe = params["feature_extractor"]
    w0 = fe["conv_0"]["kernel"].reshape(k0, C).astype(dtype)
    ws = []
    for l in range(n_s2):
        w = fe[f"conv_{l + 1}"]["kernel"]          # (k, C, C)
        if w.shape[0] == 2:
            w = jnp.concatenate([w, jnp.zeros((1, C, C), w.dtype)], axis=0)
        ws.append(w)
    ws = jnp.stack(ws).astype(dtype)               # (n_s2, 3, C, C)
    gn = jnp.stack([fe["group_norm"]["scale"],
                    fe["group_norm"]["bias"]]).astype(jnp.float32)
    return dict(w0=w0, ws=ws, gn=gn)


def _make_extractor_kernels(R: int, C: int, G: int, k0: int,
                            n_s2: int, T0: int, eps: float, dtype):
    """(stats_kernel, main_kernel) for one batch row per grid step.

    The layer-0 im2col slab (G*R, k0) is built OUTSIDE the kernel with
    static XLA slices, and the per-phase loops are lax.fori_loops with
    dynamic SUBLANE slices — a fully unrolled variant (64 unaligned lane
    slices + 186 distinct dots) was a Mosaic compile bomb (>9 min)."""

    def dot(a, b):
        return jax.lax.dot_general(
            a.astype(dtype), b.astype(dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def stats_kernel(slab_ref, w0_ref, o_ref):
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)

        def body(i, carry):
            s, sq = carry
            p = dot(slab_ref[0, pl.ds(i * R, R), :], w0_ref[...])  # (R, C)
            # frames >= T0 whose window STRADDLES the wave end see real
            # samples + pad zeros -> nonzero conv output; mask them out
            # of the statistics (frame index of row j is j*G + i)
            p = jnp.where(row_iota * G + i < T0, p, 0.0)
            return (s + jnp.sum(p, axis=0, keepdims=True),
                    sq + jnp.sum(p * p, axis=0, keepdims=True))

        s, sq = jax.lax.fori_loop(
            0, G, body, (jnp.zeros((1, C), jnp.float32),
                         jnp.zeros((1, C), jnp.float32)))
        mean = s / T0
        var = sq / T0 - mean * mean
        o_ref[0, 0:1, :] = mean
        o_ref[0, 1:2, :] = var

    def main_kernel(slab_ref, w0_ref, ws_ref, gn_ref, mv_ref, o_ref,
                    buf0, buf1):
        mean = mv_ref[0][0:1, :]
        rstd = jax.lax.rsqrt(mv_ref[0][1:2, :] + eps)
        scale = gn_ref[0:1, :]
        bias = gn_ref[1:2, :]

        # ---- layer 0 + GroupNorm + gelu -> buf0 phases -------------------
        def l0_body(i, _):
            p = dot(slab_ref[0, pl.ds(i * R, R), :], w0_ref[...])
            p = (p - mean) * rstd * scale + bias
            buf0[pl.ds(i * R, R), :] = _gelu_exact(p).astype(buf0.dtype)
            return 0

        jax.lax.fori_loop(0, G, l0_body, 0)

        # ---- stride-2 layers: phase-halving matmul cascade ---------------
        src, dst = buf0, buf1
        m = G
        for l in range(n_s2):
            w0l, w1l, w2l = ws_ref[l, 0], ws_ref[l, 1], ws_ref[l, 2]

            def phase_body(i, _, src=src, dst=dst, w0l=w0l, w1l=w1l,
                           w2l=w2l):
                acc = dot(src[pl.ds(2 * i * R, R), :], w0l)
                acc = acc + dot(src[pl.ds((2 * i + 1) * R, R), :], w1l)
                acc = acc + dot(src[pl.ds((2 * i + 2) * R, R), :], w2l)
                dst[pl.ds(i * R, R), :] = _gelu_exact(acc).astype(dst.dtype)
                return 0

            if m > 2:
                jax.lax.fori_loop(0, m // 2 - 1, phase_body, 0)
            # wrap phase (2i+2 == m): third tap is phase 0 shifted one
            # row; the read spills one row into phase 1's first row,
            # which only feeds the final, always-invalid output frame
            i_w = m // 2 - 1
            acc = dot(src[(m - 2) * R:(m - 1) * R, :], w0l)
            acc = acc + dot(src[(m - 1) * R:m * R, :], w1l)
            acc = acc + dot(src[1:R + 1, :], w2l)
            dst[i_w * R:(i_w + 1) * R, :] = _gelu_exact(acc).astype(dst.dtype)
            src, dst = dst, src
            m //= 2
        o_ref[0] = src[0:R, :].astype(jnp.float32)

    return stats_kernel, main_kernel


@functools.partial(jax.jit, static_argnames=("cfg", "T0", "R", "dtype",
                                             "interpret"))
def _run_extractor(cfg, tables, slab0, T0, R, dtype, interpret):
    k0, s0, C, n_s2, _ = _extractor_dims(cfg)
    G = 2 ** n_s2
    B = slab0.shape[0]
    stats_k, main_k = _make_extractor_kernels(
        R, C, G, k0, n_s2, T0, cfg.layer_norm_eps, dtype)

    row3 = lambda b: (b, 0, 0)  # noqa: E731
    slab_spec = pl.BlockSpec((1, G * R, slab0.shape[2]), row3)
    rep = lambda shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape))  # noqa: E731

    mv = pl.pallas_call(
        stats_k, grid=(B,),
        in_specs=[slab_spec, rep((k0, C))],
        out_specs=pl.BlockSpec((1, 2, C), row3),
        out_shape=jax.ShapeDtypeStruct((B, 2, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(slab0, tables["w0"])

    out = pl.pallas_call(
        main_k, grid=(B,),
        in_specs=[slab_spec, rep((k0, C)), rep((n_s2, 3, C, C)),
                  rep((2, C)), pl.BlockSpec((1, 2, C), row3)],
        out_specs=pl.BlockSpec((1, R, C), row3),
        out_shape=jax.ShapeDtypeStruct((B, R, C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((G * R, C), dtype),
            pltpu.VMEM((max(G // 2, 1) * R, C), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(slab0, tables["w0"], tables["ws"], tables["gn"], mv)
    return out


def extractor_fused(cfg, params, waveform, *, tables=None,
                    dtype=jnp.bfloat16, interpret: bool | None = None):
    """Fused replacement for FeatureExtractor.__call__ (unmasked path):
    waveform (B, N) f32 -> (B, T_out, C) f32.

    The whole conv stack runs in VMEM (two pallas_calls: GroupNorm
    statistics, then the polyphase cascade).  Activations are held in
    `dtype` (bf16 in production, f32 for interpret-mode tests)."""
    from talkshow_tpu.models.wav2vec import conv_valid_length

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if tables is None:
        tables = pack_extractor_tables(cfg, params, dtype=dtype)
    k0, s0, C, n_s2, _ = _extractor_dims(cfg)
    G = 2 ** n_s2
    B, N = waveform.shape
    T0 = (N - k0) // s0 + 1
    R = _ceil_to(-(-T0 // G), 8)
    need = R * s0 * G + (k0 - s0)
    wave = jnp.pad(waveform.astype(jnp.float32), ((0, 0), (0, need - N)))
    w2d = wave[:, :R * s0 * G].reshape(B, R, s0 * G)
    # extend each row with the next row's first (k0 - s0) samples
    ext = jnp.concatenate(
        [w2d[:, 1:, :k0 - s0],
         wave[:, R * s0 * G:][:, None, :]], axis=1)       # (B, R, k0-s0)
    wave_ext = jnp.concatenate([w2d, ext], axis=2)        # (B, R, s0*G+k0-s0)
    # layer-0 im2col slab, PHASE-MAJOR: row i*R + j holds the k0 samples
    # of frame j*G + i (static XLA slices; ~1.3 MB — no gathers)
    slab0 = jnp.stack([wave_ext[:, :, s0 * i:s0 * i + k0]
                       for i in range(G)], axis=1)        # (B, G, R, k0)
    slab0 = slab0.reshape(B, G * R, k0)
    out = _run_extractor(cfg, tables, slab0, T0, R, dtype,
                         bool(interpret))
    T_out = conv_valid_length(N, cfg)
    return out[:, :T_out]
