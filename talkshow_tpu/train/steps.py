"""Jitted train steps for every TalkSHOW-TPU stage.

Unlike the reference — where each TrainWrapper owns its optimizers and
calls .backward() internally (nets/base.py:9-21, SURVEY §1) — optimization
here is owned by the train loop: each stage is a pure
`step(state, batch, rng) -> (state, metrics)` function, jitted once, with
BatchNorm statistics and VQ codebook EMA state threaded explicitly.

Loss definitions follow the reference exactly:
  * body VQ:   L1 rec + L1 velocity + commitment  (smplx_body_vq.py:177-206)
  * prior:     cross-entropy over codebook logits  (smplx_body_pixel.py:216)
  * face:      L1(first 6 ch) + MSE(last 100 ch)   (smplx_face.py:139-167)
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from talkshow_tpu.models.face import FaceGenerator
from talkshow_tpu.models.ls3dcg import LS3DCGDiscriminator, LS3DCGGenerator
from talkshow_tpu.models.pixelcnn import GatedPixelCNN
from talkshow_tpu.models.vqvae import VQVAE, AudioEncoder
from talkshow_tpu.ops import vq as vq_ops
from talkshow_tpu.ops.pose import BODY_DIM, C_INDEX_3D, C_INDEX_6D, HAND_DIM
from talkshow_tpu.utils import all_finite, skip_nonfinite_updates, tree_select


# ---------------------------------------------------------------------------
# Stage 1: compositional body/hand VQ-VAEs
# ---------------------------------------------------------------------------

class BodyVQState(NamedTuple):
    params: Any          # {'body': ..., 'hand': ...}
    batch_stats: Any
    vq: Any              # {'body': VQState, 'hand': VQState}
    opt_state: Any
    step: jnp.ndarray


def make_body_vq_step(vq_body: VQVAE, vq_hand: VQVAE, learning_rate: float = 1e-4,
                      rep6d: bool = False):
    """rep6d: the convert_to_6d variant (poses (T, 330), conv channels 258,
    body 78 / hand 180 — smplx_body_vq.py:50-53 with c_index_6d)."""
    tx = skip_nonfinite_updates(optax.adam(learning_rate, b1=0.9, b2=0.999))
    body_dim = BODY_DIM * (2 if rep6d else 1)
    hand_dim = HAND_DIM * (2 if rep6d else 1)
    c_index = C_INDEX_6D if rep6d else C_INDEX_3D
    full_dim = 330 if rep6d else 165

    def init_state(rng, window: int = 88) -> BodyVQState:
        r = jax.random.split(rng, 4)
        st_b = vq_ops.init_vq_state(r[0], 2048, vq_body.embedding_dim)
        st_h = vq_ops.init_vq_state(r[1], 2048, vq_hand.embedding_dim)
        vb = vq_body.init(r[2], jnp.zeros((1, window, body_dim)), st_b)
        vh = vq_hand.init(r[3], jnp.zeros((1, window, hand_dim)), st_h)
        params = {"body": vb["params"], "hand": vh["params"]}
        stats = {"body": vb["batch_stats"], "hand": vh["batch_stats"]}
        return BodyVQState(params, stats, {"body": st_b, "hand": st_h},
                           tx.init(params), jnp.zeros((), jnp.int32))

    def rec_loss(pred, gt):
        rec = jnp.mean(jnp.abs(pred - gt))
        vel = jnp.mean(jnp.abs((pred[:, 1:] - pred[:, :-1])
                               - (gt[:, 1:] - gt[:, :-1])))
        return rec, vel

    def loss_fn(params, batch_stats, vq_states, conv_poses):
        out = {}
        new_stats, new_vq = {}, {}
        total = 0.0
        for name, model, sl in (
            ("body", vq_body, slice(0, body_dim)),
            ("hand", vq_hand, slice(body_dim, body_dim + hand_dim)),
        ):
            gt = conv_poses[..., sl]
            (recon, commit, nvq, _), updates = model.apply(
                {"params": params[name], "batch_stats": batch_stats[name]},
                gt, vq_states[name], True, mutable=["batch_stats"],
            )
            rec, vel = rec_loss(recon, gt)
            total = total + rec + vel + commit
            out[f"{name}_rec"] = rec
            out[f"{name}_vel"] = vel
            out[f"{name}_commit"] = commit
            new_stats[name] = updates["batch_stats"]
            new_vq[name] = nvq
        return total, (out, new_stats, new_vq)

    def step(state: BodyVQState, batch) -> tuple[BodyVQState, dict]:
        """batch: {'poses': (B, T, full_dim)} (or pre-sliced conv channels)."""
        poses = batch["poses"]
        conv = poses[..., c_index] if poses.shape[-1] == full_dim else poses
        grads, (metrics, new_stats, new_vq) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, state.vq, conv)
        finite = all_finite(grads)
        new_stats = tree_select(finite, new_stats, state.batch_stats)
        new_vq = tree_select(finite, new_vq, state.vq)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics, nonfinite_skips=opt_state["nonfinite_count"])
        return BodyVQState(params, new_stats, new_vq, opt_state,
                           state.step + 1), metrics

    return init_state, jax.jit(step)


# ---------------------------------------------------------------------------
# Stage 2: PixelCNN prior + audio encoder (VQs frozen)
# ---------------------------------------------------------------------------

class PixelState(NamedTuple):
    params: Any          # {'prior': ..., 'audio': ...}
    batch_stats: Any     # {'audio': ...}
    opt_state: Any
    step: jnp.ndarray


def make_token_encoder(vq_body: VQVAE, vq_hand: VQVAE,
                       frozen_vq_vars: dict, frozen_vq_states: dict,
                       rep6d: bool = False):
    """Jitted poses -> (B, T/4, 2) token grid through the FROZEN stage-1
    VQs. Deterministic given poses, so the trainer can cache it per
    training window (Trainer.cache_tokens) instead of recomputing it every
    step — the encode is ~22% of the pixel step's device time and its
    output never changes across epochs."""
    body_dim = BODY_DIM * (2 if rep6d else 1)
    c_index = C_INDEX_6D if rep6d else C_INDEX_3D
    full_dim = 330 if rep6d else 165

    @jax.jit
    def encode(poses):
        conv = poses[..., c_index] if poses.shape[-1] == full_dim else poses
        _, tb = vq_body.apply(frozen_vq_vars["body"], conv[..., :body_dim],
                              frozen_vq_states["body"], method=VQVAE.encode)
        _, th = vq_hand.apply(frozen_vq_vars["hand"], conv[..., body_dim:],
                              frozen_vq_states["hand"], method=VQVAE.encode)
        return jnp.stack([tb, th], axis=-1)        # (B, T/4, 2)

    return encode


def make_body_pixel_step(prior: GatedPixelCNN, audio_enc: AudioEncoder,
                         vq_body: VQVAE, vq_hand: VQVAE,
                         frozen_vq_vars: dict, frozen_vq_states: dict,
                         learning_rate: float = 1e-4,
                         max_grad_norm: float = 5.0,
                         rep6d: bool = False,
                         folded: bool = False):
    """frozen_vq_vars: {'body': vars, 'hand': vars} of the stage-1 VQs.
    rep6d: the 6d variant (the reference then uses pixelcnn dim 512 /
    10 layers — smplx_body_pixel.py:49-53; pass such a `prior`).
    folded: compute the teacher-forced forward with the column-folded
    layout (models/pixelcnn_folded.py) — same canonical params, W=2 axis
    folded into lanes; numerically equal logits in eval mode, dropout
    draws a different (same-distribution) mask."""
    tx = skip_nonfinite_updates(optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adam(learning_rate, b1=0.9, b2=0.999),
    ))
    body_dim = BODY_DIM * (2 if rep6d else 1)
    c_index = C_INDEX_6D if rep6d else C_INDEX_3D
    full_dim = 330 if rep6d else 165

    def init_state(rng, window: int = 88) -> PixelState:
        r = jax.random.split(rng, 2)
        av = audio_enc.init(r[0], jnp.zeros((1, window, 64)))
        pv = prior.init(r[1], jnp.zeros((1, window // 4, 2), jnp.int32),
                        jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1, window // 4, audio_enc.num_hiddens)))
        params = {"prior": pv["params"], "audio": av["params"]}
        stats = {"audio": av["batch_stats"]}
        return PixelState(params, stats, tx.init(params), jnp.zeros((), jnp.int32))

    def encode_tokens(conv_poses):
        _, tb = vq_body.apply(frozen_vq_vars["body"], conv_poses[..., :body_dim],
                              frozen_vq_states["body"], method=VQVAE.encode)
        _, th = vq_hand.apply(frozen_vq_vars["hand"], conv_poses[..., body_dim:],
                              frozen_vq_states["hand"], method=VQVAE.encode)
        return jnp.stack([tb, th], axis=-1)        # (B, T/4, 2)

    def loss_fn(params, batch_stats, tokens, aud, speaker, rng):
        audio_feat, updates = audio_enc.apply(
            {"params": params["audio"], "batch_stats": batch_stats["audio"]},
            aud, True, mutable=["batch_stats"])
        if folded:
            from talkshow_tpu.models.pixelcnn_folded import folded_logits
            logits = folded_logits(prior, params["prior"], tokens, speaker,
                                   audio_feat, train=True, dropout_rng=rng)
        else:
            logits = prior.apply({"params": params["prior"]}, tokens, speaker,
                                 audio_feat, True, rngs={"dropout": rng})
        # f32 softmax/CE even when the prior computes in bf16 (prior.dtype)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits.reshape(-1, logits.shape[-1]).astype(jnp.float32),
            tokens.reshape(-1)).mean()
        return ce, updates["batch_stats"]

    def step(state: PixelState, batch, rng):
        """batch: poses (B, T, full|conv), aud_feat (B, T, 64), speaker (B,);
        optional precomputed 'tokens' (B, T/4, 2) skips the frozen-VQ encode
        (see make_token_encoder — bit-identical, the encoder is frozen)."""
        if "tokens" in batch:
            tokens = batch["tokens"]
        else:
            poses = batch["poses"]
            conv = poses[..., c_index] if poses.shape[-1] == full_dim else poses
            tokens = jax.lax.stop_gradient(encode_tokens(conv))
        (ce, new_audio_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, tokens, batch["aud_feat"],
            batch["speaker"], rng)
        gnorm = optax.global_norm(grads)
        new_audio_stats = tree_select(all_finite(grads), new_audio_stats,
                                      state.batch_stats["audio"])
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = PixelState(params, {"audio": new_audio_stats}, opt_state,
                               state.step + 1)
        return new_state, {"ce_loss": ce, "grad": gnorm,
                           "nonfinite_skips": opt_state["nonfinite_count"]}

    return init_state, jax.jit(step)


# ---------------------------------------------------------------------------
# Stage 3: face generator (SGD, wav2vec CNN frozen)
# ---------------------------------------------------------------------------

class FaceState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def _face_param_labels(params):
    def label(path, _):
        keys = [str(getattr(k, "key", k)) for k in path]
        return "frozen" if "feature_extractor" in keys else "train"
    return jax.tree_util.tree_map_with_path(label, params)


def make_face_step(face: FaceGenerator, learning_rate: float = 1e-3,
                   momentum: float = 0.9, max_grad_norm: float = 5.0,
                   window: int = 88, stochastic: bool = True):
    """stochastic=False disables dropout/SpecAugment (their random masks are
    shape-dependent, so padded-bucket and unpadded programs cannot draw the
    same pattern; the deterministic path is bit-comparable across both)."""
    def make_tx(params):
        return skip_nonfinite_updates(optax.multi_transform(
            {"train": optax.chain(optax.clip_by_global_norm(max_grad_norm),
                                  optax.sgd(learning_rate, momentum=momentum)),
             "frozen": optax.set_to_zero()},
            _face_param_labels(params),
        ))

    def init_state(rng, samples_per_window: int | None = None,
                   window: int = window) -> FaceState:
        n = samples_per_window or window * 16000 // 30
        v = face.init(rng, jnp.zeros((1, n)), jnp.zeros((1, face.num_classes)),
                      window)
        tx = make_tx(v["params"])
        return FaceState(v["params"], tx.init(v["params"]), jnp.zeros((), jnp.int32))

    def loss_fn(params, waveform, id_onehot, gt, rng, valid_samples,
                valid_frames):
        frames = gt.shape[1]
        r_drop, r_mask = jax.random.split(rng)
        pred = face.apply({"params": params}, waveform, id_onehot, frames,
                          stochastic,
                          rngs={"dropout": r_drop, "spec_augment": r_mask}
                          if stochastic else {},
                          valid_samples=valid_samples,
                          valid_frames=valid_frames,
                          # CNN is frozen (set_to_zero below): stop the
                          # gradient at its output so the conv backward
                          # never runs, as torch does for requires_grad=False
                          freeze_extractor=True)
        if valid_frames is None:
            l1 = jnp.mean(jnp.abs(pred[..., :6] - gt[..., :6]))
            mse = jnp.mean((pred[..., -100:] - gt[..., -100:]) ** 2)
        else:
            # mean over real frames only (padded tail excluded exactly)
            m = (jnp.arange(frames)[None, :, None]
                 < valid_frames[:, None, None]).astype(pred.dtype)
            n = jnp.sum(m)
            l1 = jnp.sum(jnp.abs(pred[..., :6] - gt[..., :6]) * m) / (n * 6)
            mse = jnp.sum(((pred[..., -100:] - gt[..., -100:]) ** 2) * m) / (n * 100)
        return l1 + mse, {"MSELoss": l1, "exp_loss": mse}

    def step(state: FaceState, batch, rng) -> tuple[FaceState, dict]:
        """batch: waveform (B, N), id_onehot (B, 4), gt (B, T, >=106);
        optionally valid_samples/valid_frames (B,) for bucketed batches."""
        tx = make_tx(state.params)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch["waveform"], batch["id_onehot"], batch["gt"], rng,
            batch.get("valid_samples"), batch.get("valid_frames"))
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics, loss=loss, grad=optax.global_norm(grads),
                       nonfinite_skips=opt_state["nonfinite_count"])
        return FaceState(params, opt_state, state.step + 1), metrics

    return init_state, jax.jit(step)


# ---------------------------------------------------------------------------
# LS3DCG baseline: two-optimizer adversarial loop under one jit
# ---------------------------------------------------------------------------

class LS3DCGState(NamedTuple):
    g_params: Any
    g_stats: Any
    d_params: Any
    d_stats: Any
    g_opt: Any
    d_opt: Any
    step: jnp.ndarray


def make_ls3dcg_step(gen: LS3DCGGenerator, disc: LS3DCGDiscriminator,
                     learning_rate: float = 1e-4,
                     keypoint_w: float = 1.0, gan_w: float = 1.0,
                     window: int = 88):
    """LSGAN train step (nets/LS3DCG.py:280-363): D sees [poses|aud]; G loss
    = L1(jaw)+MSE(exp)+L1(body)+L1(hand) + LSGAN generator term."""
    g_tx = skip_nonfinite_updates(optax.adam(learning_rate, b1=0.9, b2=0.999))
    d_tx = skip_nonfinite_updates(optax.adam(learning_rate, b1=0.9, b2=0.999))

    def init_state(rng, window: int = window) -> LS3DCGState:
        r1, r2 = jax.random.split(rng)
        gv = gen.init(r1, jnp.zeros((1, window, 64)))
        dv = disc.init(r2, jnp.zeros((1, window, 129 + 64)))
        return LS3DCGState(gv["params"], gv["batch_stats"],
                           dv["params"], dv["batch_stats"],
                           g_tx.init(gv["params"]), d_tx.init(dv["params"]),
                           jnp.zeros((), jnp.int32))

    def d_loss_fn(d_params, d_stats, pred, gt_conv, aud):
        gt_in = jnp.concatenate([gt_conv, aud], axis=-1)
        pr_in = jnp.concatenate([pred[..., 103:], aud], axis=-1)
        real, upd = disc.apply({"params": d_params, "batch_stats": d_stats},
                               gt_in, True, mutable=["batch_stats"])
        fake, upd = disc.apply({"params": d_params, "batch_stats": upd["batch_stats"]},
                               pr_in, True, mutable=["batch_stats"])
        loss = jnp.mean((real - 1.0) ** 2) + jnp.mean(fake ** 2)
        return loss, upd["batch_stats"]

    def g_loss_fn(g_params, g_stats, d_params, d_stats, batch):
        aud = batch["aud_feat"]
        pred, upd = gen.apply({"params": g_params, "batch_stats": g_stats},
                              aud, True, mutable=["batch_stats"])
        poses = batch["poses"]
        conv = poses[..., C_INDEX_3D] if poses.shape[-1] == 165 else poses
        jaw = poses[..., :3]
        exp = batch["expression"]
        jaw_loss = jnp.mean(jnp.abs(pred[..., :3] - jaw))
        face_loss = jnp.mean((pred[..., 3:103] - exp) ** 2)
        body_loss = jnp.mean(jnp.abs(pred[..., 103:142] - conv[..., :39]))
        hand_loss = jnp.mean(jnp.abs(pred[..., 142:] - conv[..., 39:]))
        l1 = jaw_loss + face_loss + body_loss + hand_loss
        pr_in = jnp.concatenate([pred[..., 103:], aud], axis=-1)
        fake = disc.apply({"params": d_params, "batch_stats": d_stats}, pr_in)
        gen_err = jnp.mean((fake - 1.0) ** 2)
        total = keypoint_w * l1 + gan_w * gen_err
        metrics = {"jaw_loss": jaw_loss, "face_loss": face_loss,
                   "body_loss": body_loss, "hand_loss": hand_loss,
                   "gen": gen_err}
        return total, (metrics, upd["batch_stats"], pred)

    def step(state: LS3DCGState, batch):
        poses = batch["poses"]
        conv = poses[..., C_INDEX_3D] if poses.shape[-1] == 165 else poses
        # --- G forward for D update (detached pred) ---
        pred = gen.apply({"params": state.g_params,
                          "batch_stats": state.g_stats}, batch["aud_feat"])
        (d_loss, new_d_stats), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_params, state.d_stats,
                                     jax.lax.stop_gradient(pred), conv,
                                     batch["aud_feat"])
        new_d_stats = tree_select(all_finite(d_grads), new_d_stats,
                                  state.d_stats)
        d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)
        # --- G update against the refreshed D ---
        (g_loss, (metrics, new_g_stats, _)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g_params, state.g_stats,
                                     d_params, new_d_stats, batch)
        new_g_stats = tree_select(all_finite(g_grads), new_g_stats,
                                  state.g_stats)
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        metrics = dict(metrics, dis=d_loss,
                       nonfinite_skips=(g_opt["nonfinite_count"]
                                        + d_opt["nonfinite_count"]))
        return LS3DCGState(g_params, new_g_stats, d_params, new_d_stats,
                           g_opt, d_opt, state.step + 1), metrics

    return init_state, jax.jit(step)


# ---------------------------------------------------------------------------
# Body-AE (FGD feature extractor; nets/body_ae.py)
# ---------------------------------------------------------------------------

class BodyAEState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def make_body_ae_step(ae, learning_rate: float = 1e-4):
    """Plain autoencoder over the 129 conv channels; loss = L1 rec +
    L1 velocity (body_ae.py:112-140)."""
    tx = skip_nonfinite_updates(optax.adam(learning_rate, b1=0.9, b2=0.999))

    def init_state(rng, window: int = 88) -> BodyAEState:
        v = ae.init(rng, jnp.zeros((1, window, ae.in_dim)))
        return BodyAEState(v["params"], v["batch_stats"], tx.init(v["params"]),
                           jnp.zeros((), jnp.int32))

    def loss_fn(params, batch_stats, gt):
        recon, updates = ae.apply({"params": params, "batch_stats": batch_stats},
                                  gt, True, mutable=["batch_stats"])
        rec = jnp.mean(jnp.abs(recon - gt))
        vel = jnp.mean(jnp.abs((recon[:, 1:] - recon[:, :-1])
                               - (gt[:, 1:] - gt[:, :-1])))
        return rec + vel, ({"rec_loss": rec, "velocity_loss": vel},
                           updates["batch_stats"])

    def step(state: BodyAEState, batch):
        poses = batch["poses"]
        conv = poses[..., C_INDEX_3D] if poses.shape[-1] == 165 else poses
        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, conv)
        new_stats = tree_select(all_finite(grads), new_stats, state.batch_stats)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics, nonfinite_skips=opt_state["nonfinite_count"])
        return BodyAEState(params, new_stats, opt_state, state.step + 1), metrics

    return init_state, jax.jit(step)
