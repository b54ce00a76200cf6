"""Quantitative evaluation runners — mirrors of the reference's metric
scripts (scripts/test_vq.py, test_body.py, test_face.py).

Each runner walks whole clips of a ShowDataset and aggregates metrics:

  * `eval_vq_capacity`: VQ round-trip L1 ("capacity", test_vq.py:54)
  * `eval_body`: FGD + feature MAE (via FGDEvaluator), LVD, L2 error,
    sample diversity, beat consistency (test_body.py:98-194)
  * `eval_face`: jaw L1 + expression MSE + (with an SMPL-X model)
    landmark L1 / face LVD in vertex space (test_face.py:93-111)

SMPL-X-dependent metrics activate only when a loaded SmplxModel is passed
(the npz asset is licensed and not bundled).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from talkshow_tpu.eval.fgd import FGDEvaluator
from talkshow_tpu.eval.metrics import clip_ci, diversity, lvd
from talkshow_tpu.models.body import BodyModels, generate_conv_poses
from talkshow_tpu.models.vqvae import VQVAE
from talkshow_tpu.ops import audio as audio_ops
from talkshow_tpu.ops import pose as pose_ops
from talkshow_tpu.ops import smplx_lbs
from talkshow_tpu.ops.pose import BODY_DIM, C_INDEX_3D, C_INDEX_6D


def _conv_channels(poses: np.ndarray) -> np.ndarray:
    if poses.shape[-1] >= 330:          # convert_to_6d layout
        return poses[..., C_INDEX_6D]
    return poses[..., C_INDEX_3D] if poses.shape[-1] >= 165 else poses


def eval_vq_capacity(vq_body: VQVAE, vq_hand: VQVAE, vq_vars: dict,
                     vq_states: dict, dataset) -> dict:
    """Reconstruction round-trip over whole clips (scripts/test_vq.py:28-64)."""
    losses = []
    body_dim = vq_body.in_dim   # 39 (3d) or 78 (6d)
    for clip in dataset.whole_clips():
        conv = _conv_channels(clip["poses"])[None]
        t = conv.shape[1] - conv.shape[1] % 4
        conv = jnp.asarray(conv[:, :t])
        rb, _, _, _ = vq_body.apply(vq_vars["body"], conv[..., :body_dim],
                                    vq_states["body"], False)
        rh, _, _, _ = vq_hand.apply(vq_vars["hand"], conv[..., body_dim:],
                                    vq_states["hand"], False)
        recon = jnp.concatenate([rb, rh], axis=-1)
        losses.append(float(jnp.mean(jnp.abs(recon - conv))))
    return {"capacity_l1": float(np.mean(losses)), "num_clips": len(losses)}


def eval_body(body: BodyModels, ae, ae_vars, dataset, num_samples: int = 2,
              seed: int = 0, smplx_model: smplx_lbs.SmplxModel | None = None) -> dict:
    """Generation quality over whole clips (scripts/test_body.py:113-194)."""
    fgd_eval = FGDEvaluator(ae, ae_vars)
    lvd_vals, l2_vals, div_vals = [], [], []
    rng = jax.random.PRNGKey(seed)

    for ci, clip in enumerate(dataset.whole_clips()):
        conv_gt = _conv_channels(clip["poses"])
        aud = clip["aud_feat"]
        t = min(conv_gt.shape[0], aud.shape[0])
        t -= t % 4
        conv_gt, aud = conv_gt[:t], aud[:t]
        rng, sub = jax.random.split(rng)
        feat = jnp.asarray(aud)[None].repeat(num_samples, 0)
        ids = jnp.full((num_samples,), int(clip["speaker"]), jnp.int32)
        pred, _ = generate_conv_poses(body, feat, ids, sub)
        pred = np.asarray(pred)[:, :t]

        fgd_eval.push_samples(jnp.asarray(pred), jnp.asarray(conv_gt)[None])
        l2_vals.append(float(np.mean(np.linalg.norm(pred[0] - conv_gt, axis=-1))))
        div_vals.append(diversity(pred))

        if smplx_model is not None:
            betas = jnp.asarray(clip["betas"][:smplx_model.num_betas])
            gt_full = pose_ops.part2full(
                jnp.asarray(np.concatenate(
                    [clip["poses"][:t, :3], conv_gt,
                     clip["expression"][:t]], axis=-1)))
            pr_full = pose_ops.part2full(
                jnp.asarray(np.concatenate(
                    [clip["poses"][:t, :3], pred[0],
                     clip["expression"][:t]], axis=-1)))
            _, gt_j = smplx_lbs.smplx_forward_talkshow(
                smplx_model, betas, gt_full, return_verts=False)
            _, pr_j = smplx_lbs.smplx_forward_talkshow(
                smplx_model, betas, pr_full, return_verts=False)
            lvd_vals.append(float(lvd(gt_j[:, :22], pr_j[:, :22])))
            fgd_eval.push_joints(np.asarray(pr_j), np.asarray(gt_j))
            if clip.get("audio_path"):
                fgd_eval.push_aud(audio_ops.onset_times(clip["audio_path"]))

    fgd, feat_mae = fgd_eval.get_scores()
    out = {
        "fgd": fgd,
        "feat_mae": feat_mae,
        "l2": float(np.mean(l2_vals)),
        "diversity": float(np.mean(div_vals)),
        "num_clips": len(l2_vals),
    }
    # per-clip values let callers compute paired trained-vs-random gaps
    # (metrics.paired_clip_gap) — clips are the independent unit
    out["per_clip"] = {"l2": l2_vals, "diversity": div_vals}
    if len(l2_vals) >= 2:
        # draws kept so callers can pair two arms (paired_fgd_gap);
        # eval_full_schedule strips them before publishing.
        out["fgd_ci"] = fgd_eval.bootstrap_fgd(return_draws=True)
        out["l2_ci"] = clip_ci(l2_vals)
    if lvd_vals:
        out["lvd"] = float(np.mean(lvd_vals))
        out["per_clip"]["lvd"] = lvd_vals
        if len(lvd_vals) >= 2:
            out["lvd_ci"] = clip_ci(lvd_vals)
        if fgd_eval.audio_beats:
            out["bc"] = fgd_eval.get_bc_score()
    return out


def eval_ls3dcg(gen, gen_vars, ae, ae_vars, dataset) -> dict:
    """LS3DCG baseline metrics over whole clips.

    Mirrors the reference's LS3DCG test path (nets/LS3DCG.py:365-391
    infer_on_audio + the shared FGD harness scripts/test_body.py:98-144):
    per-part L1/MSE of the deterministic generation against GT, plus FGD of
    the generated conv channels through the shared body-AE extractor.
    """
    fgd_eval = FGDEvaluator(ae, ae_vars)
    jaw_l1, exp_mse, body_l1, hand_l1 = [], [], [], []
    for clip in dataset.whole_clips():
        aud = clip["aud_feat"]
        poses, exp = clip["poses"], clip["expression"]
        t = min(poses.shape[0], aud.shape[0])
        t -= t % 8  # generator pools /8 along time
        if t == 0:
            continue
        pred = gen.apply(gen_vars, jnp.asarray(aud[None, :t]))
        pred = np.asarray(pred[0])
        conv_gt = _conv_channels(poses[:t])
        jaw_l1.append(float(np.mean(np.abs(pred[:, :3] - poses[:t, :3]))))
        exp_mse.append(float(np.mean((pred[:, 3:103] - exp[:t, :100]) ** 2)))
        body_l1.append(float(np.mean(np.abs(pred[:, 103:142]
                                            - conv_gt[:, :BODY_DIM]))))
        hand_l1.append(float(np.mean(np.abs(pred[:, 142:]
                                            - conv_gt[:, BODY_DIM:]))))
        fgd_eval.push_samples(jnp.asarray(pred[None, :, 103:]),
                              jnp.asarray(conv_gt)[None])
    if not jaw_l1:
        raise ValueError(
            "eval_ls3dcg: no usable clips — every clip had <8 aligned "
            "audio/pose frames (generator pools /8 along time)")
    fgd, feat_mae = fgd_eval.get_scores()
    out = {"jaw_l1": float(np.mean(jaw_l1)), "exp_mse": float(np.mean(exp_mse)),
           "body_l1": float(np.mean(body_l1)),
           "hand_l1": float(np.mean(hand_l1)),
           "fgd": fgd, "feat_mae": feat_mae, "num_clips": len(jaw_l1),
           "per_clip": {"jaw_l1": jaw_l1, "body_l1": body_l1,
                        "hand_l1": hand_l1}}
    if len(jaw_l1) >= 2:
        out["fgd_ci"] = fgd_eval.bootstrap_fgd(return_draws=True)
        out["body_l1_ci"] = clip_ci(body_l1)
    return out


def eval_face(face_model, face_vars, dataset,
              smplx_model: smplx_lbs.SmplxModel | None = None,
              num_classes: int = 4) -> dict:
    """Face metrics over whole clips (scripts/test_face.py:114-160)."""
    jaw_l1, exp_mse, lvd_vals = [], [], []
    for clip in dataset.whole_clips():
        gt_poses, exp = clip["poses"], clip["expression"]
        t = gt_poses.shape[0]
        if clip["aud_feat"].shape[-1] != 1:
            continue  # face eval needs the raw-waveform feature
        wav = jnp.asarray(clip["aud_feat"].reshape(1, -1))
        pred = face_model.apply(face_vars, wav, jnp.zeros((1, num_classes)), t)
        pred = np.asarray(pred[0])
        jaw_l1.append(float(np.mean(np.abs(pred[:, :3] - gt_poses[:, :3]))))
        exp_mse.append(float(np.mean((pred[:, 3:103] - exp[:, :100]) ** 2)))

        if smplx_model is not None:
            betas = jnp.asarray(clip["betas"][:smplx_model.num_betas])
            gt_full = np.concatenate([gt_poses, exp], axis=-1)
            pr_full = gt_full.copy()
            pr_full[:, 0:3] = pred[:, :3]
            pr_full[:, 165:265] = pred[:, 3:103]
            gt_v, _ = smplx_lbs.smplx_forward_talkshow(
                smplx_model, betas, jnp.asarray(gt_full))
            pr_v, _ = smplx_lbs.smplx_forward_talkshow(
                smplx_model, betas, jnp.asarray(pr_full))
            lvd_vals.append(float(lvd(gt_v, pr_v)))

    if not jaw_l1:
        raise ValueError(
            "eval_face saw no raw-waveform clips — load the dataset with "
            "feat='raw' (every clip's aud_feat was mfcc-like)")
    out = {"jaw_l1": float(np.mean(jaw_l1)), "exp_mse": float(np.mean(exp_mse)),
           "num_clips": len(jaw_l1),
           "per_clip": {"jaw_l1": jaw_l1, "exp_mse": exp_mse}}
    if len(jaw_l1) >= 2:
        out["jaw_l1_ci"] = clip_ci(jaw_l1)
    if lvd_vals:
        out["face_lvd"] = float(np.mean(lvd_vals))
        out["per_clip"]["face_lvd"] = lvd_vals
        if len(lvd_vals) >= 2:
            out["face_lvd_ci"] = clip_ci(lvd_vals)
    return out
