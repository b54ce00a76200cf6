"""Beat-consistency + MAAC parity vs an inline torch replica of
evaluation/FGD.py (get_BCscore :79-114, get_MAAC :65-77), plus the
FGDEvaluator push_joints/push_aud plumbing.

The replica is re-derived from the reference semantics: arm angles from
the joint triplets around elbows/wrists (after the 15:21 <- 16:22 shift),
normalized angular velocity, strict-local-minima beat picking with a
0.01 prominence gate, and a gaussian (sigma=0.1) proximity score of audio
onsets to the nearest motion beat.
"""
import math

import numpy as np
import torch

from talkshow_tpu.eval.metrics import beat_consistency, maac
from talkshow_tpu.ops.pose import CHANGE_ANGLE


def _torch_maac(joints_list):
    ang_vel_list = []
    for real_joints in joints_list:
        j = torch.from_numpy(np.array(real_joints, copy=True))
        j[:, 15:21] = j[:, 16:22]
        vec = j[:, 15:21] - j[:, 13:19]
        inner = torch.einsum("kij,kij->ki", vec[:, 2:], vec[:, :-2])
        inner = torch.clamp(inner, -1, 1)
        angle = torch.acos(inner) / math.pi
        ang_vel_list.append((angle[1:] - angle[:-1]).abs().mean(dim=0)[None])
    return torch.cat(ang_vel_list, 0).mean(dim=0).numpy()


def _torch_bc(joints_list, beats_list, thres=0.01, sigma=0.1):
    change_angle = torch.from_numpy(np.asarray(CHANGE_ANGLE))
    sum_1, total_beat = 0.0, 0
    for joints, audio_beat_time in zip(joints_list, beats_list):
        j = torch.from_numpy(np.array(joints, copy=True))
        if j.dim() == 4:
            j = j[0]
        j[:, 15:21] = j[:, 16:22]
        vec = j[:, 15:21] - j[:, 13:19]
        inner = torch.clamp(
            torch.einsum("kij,kij->ki", vec[:, 2:], vec[:, :-2]), -1, 1)
        angle = torch.acos(inner) / math.pi
        ang_vel = ((angle[1:] - angle[:-1]).abs()
                   / change_angle / len(change_angle))
        angle_diff = torch.cat((torch.zeros(1, 4), ang_vel), dim=0)
        for i in range(angle_diff.shape[1]):
            motion_beat_time = []
            for t in range(1, j.shape[0] - 1):
                if (angle_diff[t][i] < angle_diff[t - 1][i]
                        and angle_diff[t][i] < angle_diff[t + 1][i]
                        and (angle_diff[t - 1][i] - angle_diff[t][i] >= thres
                             or angle_diff[t + 1][i] - angle_diff[t][i]
                             >= thres)):
                    motion_beat_time.append(float(t) / 30.0)
            if not motion_beat_time:
                continue
            mb = torch.tensor(motion_beat_time)
            for audio in np.asarray(audio_beat_time).reshape(-1):
                sum_1 += math.exp(
                    -float(((audio - mb) ** 2).min()) / (2 * sigma * sigma))
            total_beat += len(np.asarray(audio_beat_time).reshape(-1))
    return sum_1 / total_beat


def _random_joints(rng, T=50, J=24):
    # smooth-ish trajectories so local minima / beats actually occur
    base = rng.standard_normal((1, J, 3))
    walk = np.cumsum(0.05 * rng.standard_normal((T, J, 3)), axis=0)
    return (base + walk).astype(np.float32)


def test_maac_matches_torch_replica(rng):
    joints = [_random_joints(rng, T=40 + 10 * i) for i in range(3)]
    ours = maac(joints)
    ref = _torch_maac(joints)
    assert ours.shape == (4,)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-7)


def test_beat_consistency_matches_torch_replica(rng):
    joints = [_random_joints(rng, T=60), _random_joints(rng, T=45)]
    beats = [np.sort(rng.uniform(0.0, 2.0, 5)).astype(np.float32),
             np.sort(rng.uniform(0.0, 1.5, 3)).astype(np.float32)]
    ours = beat_consistency(joints, beats)
    ref = _torch_bc(joints, beats)
    assert 0.0 < ours <= 1.0
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_beat_consistency_4d_squeeze_and_empty(rng):
    # the reference squeezes a leading sample axis (joints.dim() == 4)
    j3 = _random_joints(rng, T=50)
    j4 = j3[None]
    beats = [np.asarray([0.3, 0.9], np.float32)]
    np.testing.assert_allclose(beat_consistency([j4], beats),
                               beat_consistency([j3], beats))
    # constant joints -> no motion beats anywhere -> defined 0.0 (the
    # reference would divide by zero; we return 0.0 by choice)
    flat = np.zeros((30, 24, 3), np.float32)
    assert beat_consistency([flat], beats) == 0.0


def test_maac_does_not_mutate_input(rng):
    j = _random_joints(rng)
    before = j.copy()
    maac([j])
    np.testing.assert_array_equal(j, before)  # reference mutates; we copy


def test_fgd_evaluator_bc_maac_plumbing(rng):
    import jax
    from talkshow_tpu.eval.fgd import FGDEvaluator
    from talkshow_tpu.models.vqvae import AE

    ae = AE(in_dim=129, embedding_dim=16, num_hiddens=32)
    av = ae.init(jax.random.PRNGKey(0), np.zeros((1, 8, 129), np.float32))
    ev = FGDEvaluator(ae, av)
    joints = [_random_joints(rng, T=48) for _ in range(2)]
    gt_joints = [_random_joints(rng, T=48) for _ in range(2)]
    beats = [np.asarray([0.2, 0.8], np.float32),
             np.asarray([0.5], np.float32)]
    for g, r, b in zip(joints, gt_joints, beats):
        ev.push_joints(g[None], r)  # generated carries a sample axis
        ev.push_aud(b)
    np.testing.assert_allclose(ev.get_bc_score(), _torch_bc(joints, beats),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ev.get_maac()),
                               _torch_maac(gt_joints), rtol=1e-5, atol=1e-7)
    ev.reset()
    assert ev.gen_joints == [] and ev.audio_beats == []
