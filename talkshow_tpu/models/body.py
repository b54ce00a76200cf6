"""Body/hand generator: compositional VQ-VAEs + audio-conditioned PixelCNN.

Functional assembly of the reference's `s2g_body_pixel` stage
(nets/smplx_body_pixel.py:25-77): two frozen VQ-VAEs (body 39ch, hand 90ch,
codebook 2048x64), an MFCC AudioEncoder (64 -> 256ch, T -> T/4) and a
15-layer gated PixelCNN over the (T/4, 2) token grid.

`BodyModels` is a plain pytree-of-params container; generation is a pure
function so it jits/vmaps cleanly and the PixelCNN decode runs as a cached
lax.scan (models/pixelcnn.py).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from talkshow_tpu.models.pixelcnn import GatedPixelCNN, sample_tokens
from talkshow_tpu.models.vqvae import VQVAE, AudioEncoder
from talkshow_tpu.ops import vq as vq_ops
from talkshow_tpu.ops.pose import BODY_DIM, HAND_DIM


class BodyModels(NamedTuple):
    """Model defs + variables for the complete body stage."""
    vq_body: VQVAE
    vq_hand: VQVAE
    vq_body_vars: Any          # {'params', 'batch_stats'}
    vq_hand_vars: Any
    vq_body_state: vq_ops.VQState
    vq_hand_state: vq_ops.VQState
    audio_enc: AudioEncoder
    audio_enc_vars: Any
    prior: GatedPixelCNN
    prior_vars: Any


def create_body_models(rng, code_num: int = 2048, embedding_dim: int = 64,
                       num_hiddens: int = 1024, pixel_dim: int = 256,
                       pixel_layers: int = 15, num_classes: int = 4,
                       bh_model: bool = True, window: int = 88) -> BodyModels:
    """Random-init all body-stage modules (shapes per config/body_pixel.json)."""
    r = jax.random.split(rng, 6)
    vq_body = VQVAE(in_dim=BODY_DIM, embedding_dim=embedding_dim,
                    num_hiddens=num_hiddens)
    vq_hand = VQVAE(in_dim=HAND_DIM, embedding_dim=embedding_dim,
                    num_hiddens=num_hiddens)
    dummy_b = jnp.zeros((1, window, BODY_DIM))
    dummy_h = jnp.zeros((1, window, HAND_DIM))
    st_b = vq_ops.init_vq_state(r[0], code_num, embedding_dim)
    st_h = vq_ops.init_vq_state(r[1], code_num, embedding_dim)
    vb_vars = vq_body.init(r[2], dummy_b, st_b)
    vh_vars = vq_hand.init(r[3], dummy_h, st_h)

    audio_enc = AudioEncoder(num_hiddens=256)
    ae_vars = audio_enc.init(r[4], jnp.zeros((1, window, 64)))

    prior = GatedPixelCNN(input_dim=code_num, dim=pixel_dim,
                          n_layers=pixel_layers, n_classes=num_classes,
                          audio=True, bh_model=bh_model)
    pr_vars = prior.init(
        r[5], jnp.zeros((1, window // 4, 2), jnp.int32),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, window // 4, 256)),
    )
    return BodyModels(vq_body, vq_hand, vb_vars, vh_vars, st_b, st_h,
                      audio_enc, ae_vars, prior, pr_vars)


def encode_audio(models: BodyModels, mfcc_feat: jnp.ndarray) -> jnp.ndarray:
    """(B, T, 64) -> (B, T//4, 256) conditioning features."""
    return models.audio_enc.apply(models.audio_enc_vars, mfcc_feat)


def sample_tokens_fused_chunked(prior, prior_vars, speaker_id, audio, rng,
                                chunk: int, *, tables=None, **fused_kw):
    """Fused AR decode of a batch LARGER than one kernel launch admits,
    as ceil(B/chunk) sequential launches (each key-independent).

    Past the single-launch VMEM frontier this still beats the XLA sampler
    ~2x (docs/frontier_r05.json: B=32 x H=300 fallback 30.7 ms vs 2 fused
    B=16 launches ~16.9 ms), and it gives B > MAX_FUSED_BATCH serving
    groups a fused path at all.  Tokens match per-chunk direct fused calls
    exactly; the noise stream differs from a single-launch decode (one key
    per chunk), which only matters for bitwise reproduction, not
    distribution.
    """
    from talkshow_tpu.models.pixelcnn_pallas import sample_tokens_fused
    B = audio.shape[0]
    keys = jax.random.split(rng, -(-B // chunk))
    parts = [sample_tokens_fused(
        prior, prior_vars, speaker_id[i:i + chunk], audio[i:i + chunk],
        keys[i // chunk], tables=tables, **fused_kw)
        for i in range(0, B, chunk)]
    return jnp.concatenate(parts, axis=0)


def _fused_chunk_size(prior, H: int, B: int) -> int | None:
    """Largest admissible per-launch batch for a CHUNKED fused decode.

    Returns the biggest sublane-aligned chunk (multiple of 8, capped at
    MAX_FUSED_BATCH) whose analytic VMEM footprint fits the budget, or
    None when even an 8-row launch would not fit (extreme H) — callers
    then use the XLA sampler.  Chunking costs one kernel launch per chunk
    (~flat in batch, linear in H: docs/frontier_r05.json) and, when B is
    not a multiple of the chunk, one extra compile for the tail shape.
    """
    from talkshow_tpu.models.pixelcnn_pallas import (FUSED_VMEM_BUDGET,
                                                     MAX_FUSED_BATCH,
                                                     fused_vmem_bytes)
    for bc in range(min(B - B % 8, MAX_FUSED_BATCH), 0, -8):
        if fused_vmem_bytes(prior, H, bc) <= FUSED_VMEM_BUDGET:
            return bc
    return None


def generate_conv_poses(models: BodyModels, mfcc_feat: jnp.ndarray,
                        speaker_id: jnp.ndarray, rng: jax.Array,
                        prefix_tokens=None, prefix_len: int = 0,
                        use_fused: bool | None = None, tables=None):
    """MFCC (B, T, 64) + speaker ids (B,) -> conv poses (B, 4*(T//4), 129).

    The inference mirror of smplx_body_pixel.infer_on_audio (:232-289):
    audio encode -> AR token sampling -> VQ decode -> [body | hand] concat.

    use_fused: route the AR decode through the single-kernel Pallas decoder
    (models/pixelcnn_pallas.py, ~3.5x faster; the sample batch rides the
    kernel's sublane axis so B samples decode in ~the time of one).
    Default (None) auto-selects on TPU: one fused launch when (B, H) fits
    the VMEM budget; otherwise the batch is CHUNKED over sequential fused
    launches (fresh-generation path only — still ~2x the XLA sampler past
    the single-launch frontier, docs/frontier_r05.json); the XLA lax.scan
    sampler handles everything else (other backends, prefix continuation
    past the frontier, extreme H).

    tables: pre-packed decode weights (pixelcnn_pallas.pack_decode_tables).
    Packing transposes ~60 MB of prior weights (~3 ms device); serving
    paths should pack ONCE per weight set and pass the result here rather
    than repay it every clip.
    """
    audio = encode_audio(models, mfcc_feat)                  # (B, H, 256)
    B, H = audio.shape[0], audio.shape[1]
    chunk = None
    if use_fused is None:
        from talkshow_tpu.models.pixelcnn_pallas import (FUSED_VMEM_BUDGET,
                                                         MAX_FUSED_BATCH,
                                                         fused_vmem_bytes,
                                                         supports_fused)
        if jax.default_backend() == "tpu" and supports_fused(models.prior):
            # everything but the ~60 MB of weights scales with H*Bp; the
            # whole batch must fit VMEM in one kernel launch
            use_fused = (B <= MAX_FUSED_BATCH
                         and fused_vmem_bytes(models.prior, H, B)
                         <= FUSED_VMEM_BUDGET)
            if not use_fused and prefix_tokens is None:
                # past the single-launch frontier, CHUNK the batch over
                # sequential fused launches instead of falling off the
                # perf cliff: the measured frontier (docs/frontier_r05
                # .json) has the XLA sampler at 30.7 ms for B=32 x H=300
                # where 2 fused B=16 launches cost ~2 x 8.4 ms, and B >
                # MAX_FUSED_BATCH groups (e.g. 64 x H=75: 2 x 2.7 ms)
                # never had a fused path at all
                chunk = _fused_chunk_size(models.prior, H, B)
                use_fused = chunk is not None
        else:
            use_fused = False
    if use_fused:
        from talkshow_tpu.models.pixelcnn_pallas import sample_tokens_fused
        if chunk is not None:
            tokens = sample_tokens_fused_chunked(
                models.prior, models.prior_vars, speaker_id, audio, rng,
                chunk, tables=tables)
        else:
            tokens = sample_tokens_fused(
                models.prior, models.prior_vars, speaker_id, audio, rng,
                prefix_tokens=prefix_tokens, prefix_len=prefix_len,
                tables=tables)
    else:
        tokens = sample_tokens(models.prior, models.prior_vars, speaker_id,
                               audio, rng, prefix_tokens=prefix_tokens,
                               prefix_len=prefix_len)        # (B, H, 2)
    body = models.vq_body.apply(models.vq_body_vars, tokens[..., 0],
                                models.vq_body_state,
                                method=VQVAE.decode_latents)  # (B, 4H, 39)
    hand = models.vq_hand.apply(models.vq_hand_vars, tokens[..., 1],
                                models.vq_hand_state,
                                method=VQVAE.decode_latents)  # (B, 4H, 90)
    return jnp.concatenate([body, hand], axis=-1), tokens


def encode_gt_tokens(models: BodyModels, conv_poses: jnp.ndarray):
    """GT conv poses (B, T, 129) -> token grid (B, T/4, 2); the frozen-VQ
    encode used in prior training (smplx_body_pixel.py:193-203)."""
    _, tb = models.vq_body.apply(models.vq_body_vars, conv_poses[..., :BODY_DIM],
                                 models.vq_body_state, method=VQVAE.encode)
    _, th = models.vq_hand.apply(models.vq_hand_vars, conv_poses[..., BODY_DIM:],
                                 models.vq_hand_state, method=VQVAE.encode)
    return jnp.stack([tb, th], axis=-1)
