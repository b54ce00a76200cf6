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
                            valid_frames=valid_frames,
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


def _ef_positions(m: int):
    """Even-first storage order for m phases: position -> phase.
    Positions 0..m/2-1 hold phases 0,2,..,m-2; the rest hold 1,3,..,m-1
    (identity for m == 1)."""
    if m == 1:
        return [0]
    return list(range(0, m, 2)) + list(range(1, m, 2))


def _make_extractor_kernel(R: int, C: int, G: int, k0: int,
                           n_s2: int, T0: int, eps: float, dtype):
    """One kernel: layer-0 conv + GroupNorm + gelu, then the stride-2
    cascade.  ALL memory accesses are STATIC slices — the input slab is
    pre-arranged in even-first phase order, which makes each layer's
    tap-0/tap-1 contributions single contiguous matmuls over the even /
    odd half of the buffer and tap-2 a per-block static-offset matmul;
    outputs are written block-permuted into the NEXT layer's even-first
    order.  (A fori_loop + dynamic-slice variant measured 37 ms — Mosaic
    lowers big dynamic sublane windows poorly; static slices are free.)
    """
    CHUNKS = 8 if (G * R) % 8 == 0 else 1
    ch = G * R // CHUNKS

    def dot(a, b):
        return jax.lax.dot_general(
            a.astype(dtype), b.astype(dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def frame_mask(chunk_idx):
        """(ch, 1) bool: true where the layer-0 frame is < T0.  Frame of
        slab row r (even-first order) = (r % R) * G + phase(r // R) with
        the closed form phase(b) = 2b if b < G/2 else 2b - G + 1."""
        r = (jax.lax.broadcasted_iota(jnp.int32, (ch, 1), 0)
             + chunk_idx * ch)
        b, j = r // R, r % R
        phase = jnp.where(b < G // 2, 2 * b, 2 * b - G + 1) if G > 1 else b * 0
        return j * G + phase < T0

    def kernel(slab_ref, w0_ref, ws_ref, gn_ref, o_ref, buf0, buf1):
        # ---- pass 1: GroupNorm statistics over the layer-0 conv ----------
        # chunked so only (ch, C) f32 is live at once; straddle frames at
        # the wave end (real samples + pad zeros -> nonzero conv) are
        # masked out and the sums divide by the TRUE frame count
        s = jnp.zeros((1, C), jnp.float32)
        sq = jnp.zeros((1, C), jnp.float32)
        for c in range(CHUNKS):
            pch = dot(slab_ref[c * ch:(c + 1) * ch, :], w0_ref[...])
            pch = jnp.where(frame_mask(c), pch, 0.0)
            s = s + jnp.sum(pch, axis=0, keepdims=True)
            sq = sq + jnp.sum(pch * pch, axis=0, keepdims=True)
        mean = s / T0
        rstd = jax.lax.rsqrt(sq / T0 - mean * mean + eps)
        scale = gn_ref[0:1, :]
        bias = gn_ref[1:2, :]

        # ---- pass 2: layer-0 conv (recomputed) + GN + gelu -> buf0 -------
        for c in range(CHUNKS):
            pch = dot(slab_ref[c * ch:(c + 1) * ch, :], w0_ref[...])
            pch = (pch - mean) * rstd * scale + bias
            buf0[c * ch:(c + 1) * ch, :] = _gelu_exact(pch).astype(buf0.dtype)

        # ---- stride-2 cascade --------------------------------------------
        src, dst = buf0, buf1
        m = G
        for l in range(n_s2):
            w0l, w1l, w2l = ws_ref[l, 0], ws_ref[l, 1], ws_ref[l, 2]
            mp = m // 2
            half = mp * R
            # tap 0 (even half) and tap 1 (odd half): single big matmuls
            acc = dot(src[0:half, :], w0l) + dot(src[half:2 * half, :], w1l)
            pos = _ef_positions(mp)
            wpos = [pos.index(i) for i in range(mp)]   # phase -> position
            for i in range(mp):
                if i < mp - 1:
                    t2 = dot(src[(i + 1) * R:(i + 2) * R, :], w2l)
                else:
                    # wrap: phase 0 shifted one row (its one-row spill
                    # into position 1 only feeds the final, always-
                    # invalid output frame)
                    t2 = dot(src[1:R + 1, :], w2l)
                v = _gelu_exact(acc[i * R:(i + 1) * R] + t2)
                dst[wpos[i] * R:(wpos[i] + 1) * R, :] = v.astype(dst.dtype)
            src, dst = dst, src
            m = mp
        o_ref[...] = src[0:R, :].astype(jnp.float32)

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "T0", "R", "dtype",
                                             "interpret"))
def _run_extractor(cfg, tables, slab0, T0, R, dtype, interpret):
    k0, s0, C, n_s2, _ = _extractor_dims(cfg)
    G = 2 ** n_s2
    B = slab0.shape[0]
    kernel = _make_extractor_kernel(
        R, C, G, k0, n_s2, T0, cfg.layer_norm_eps, dtype)

    rep = lambda shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape))  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((None, G * R, slab0.shape[2]),
                               lambda b: (b, 0, 0)),
                  rep((k0, C)), rep((n_s2, 3, C, C)), rep((2, C))],
        out_specs=pl.BlockSpec((None, R, C), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, R, C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((G * R, C), dtype),
            pltpu.VMEM((max(G // 2, 1) * R, C), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(slab0, tables["w0"], tables["ws"], tables["gn"])
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
    # layer-0 im2col slab in EVEN-FIRST phase order (the cascade's
    # layer-1 input layout): row b*R + j holds the k0 samples of frame
    # j*G + ef(G)[b].  Built as reshape + one-row shift + transpose —
    # regular data movement only.  (64 per-phase lane slices + stack
    # measured 15.2 ms on TPU; this form is 0.62 ms.)
    assert k0 <= 2 * s0, "slab windows span at most two stride-5 rows"
    need = (R * G + 1) * s0
    wave = jnp.pad(waveform.astype(jnp.float32), ((0, 0), (0, need - N)))
    w5 = wave.reshape(B, R * G + 1, s0)
    slab_nat = jnp.concatenate(
        [w5[:, :-1], w5[:, 1:]], axis=2)[..., :k0]        # (B, R*G, k0)
    slab0 = slab_nat.reshape(B, R, G, k0).transpose(0, 2, 1, 3)
    slab0 = slab0[:, jnp.asarray(_ef_positions(G))]       # (B, G, R, k0)
    slab0 = slab0.reshape(B, G * R, k0)
    out = _run_extractor(cfg, tables, slab0, T0, R, dtype,
                         bool(interpret))
    T_out = conv_valid_length(N, cfg)
    return out[:, :T_out]
