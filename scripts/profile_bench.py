#!/usr/bin/env python
"""Break down the 10s-clip pipeline latency by stage (run on TPU)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def _force(x):
    """Force completion via host readback (block_until_ready is not
    reliable on remote-attached devices)."""
    return jax.tree_util.tree_map(np.asarray, x)


def timeit(fn, *args, n=8):
    _force(fn(*args))  # warmup/compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _force(fn(*args))
        ts.append((time.perf_counter() - t0) * 1000)
    return float(np.median(ts))


def main():
    from talkshow_tpu.models.body import create_body_models
    from talkshow_tpu.models.face import FaceGenerator
    from talkshow_tpu.models.pixelcnn import sample_tokens
    from talkshow_tpu.models.vqvae import VQVAE
    from talkshow_tpu.ops import audio as audio_ops

    rng = jax.random.PRNGKey(0)
    body = create_body_models(rng)
    face = FaceGenerator()
    n = 160000
    frames = 300
    face_vars = face.init(rng, jnp.zeros((1, 1600)), jnp.zeros((1, 4)), 3)
    wav16 = jnp.asarray(np.random.randn(n).astype(np.float32) * 0.1)
    wav22 = audio_ops.resample(wav16, 16000, 22000)

    feat_fn = jax.jit(lambda w: audio_ops.mfcc(w, 22000, fps=30))
    feat = feat_fn(wav22)
    print("mfcc_ms", timeit(feat_fn, wav22))

    face_fn = jax.jit(lambda v, w: face.apply(v, w, jnp.zeros((1, 4)), frames))
    print("face_ms", timeit(face_fn, face_vars, wav16[None]))

    audio_fn = jax.jit(lambda f: body.audio_enc.apply(body.audio_enc_vars, f))
    af = audio_fn(feat[None])
    print("audioenc_ms", timeit(audio_fn, feat[None]), "H:", af.shape)

    ids = jnp.zeros((1,), jnp.int32)
    samp_fn = jax.jit(lambda a, k: sample_tokens(body.prior, body.prior_vars,
                                                 ids, a, k))
    k = jax.random.PRNGKey(1)
    toks = samp_fn(af, k)
    print("ar_decode_ms", timeit(samp_fn, af, k), "tokens:", toks.shape)

    dec_fn = jax.jit(lambda t: (
        body.vq_body.apply(body.vq_body_vars, t[..., 0], body.vq_body_state,
                           method=VQVAE.decode_latents),
        body.vq_hand.apply(body.vq_hand_vars, t[..., 1], body.vq_hand_state,
                           method=VQVAE.decode_latents)))
    print("vq_decode_ms", timeit(dec_fn, toks))

    # batched diversity: 4 samples at once
    af4 = jnp.repeat(af, 4, 0)
    ids4 = jnp.zeros((4,), jnp.int32)
    samp4 = jax.jit(lambda a, k: sample_tokens(body.prior, body.prior_vars,
                                               ids4, a, k))
    print("ar_decode_B4_ms", timeit(samp4, af4, k))


if __name__ == "__main__":
    main()
