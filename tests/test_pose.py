import numpy as np
import jax.numpy as jnp
import pytest

from talkshow_tpu.ops import pose


def test_c_index_shapes():
    assert pose.C_INDEX_3D.shape == (129,)
    assert pose.C_INDEX_6D.shape == (258,)
    # exact values per the reference's mask construction (lower_body.py:44-65)
    assert pose.C_INDEX_3D[0] == 18
    assert pose.C_INDEX_3D[-1] == 164
    assert 45 not in pose.C_INDEX_3D and 50 not in pose.C_INDEX_3D
    assert 39 in pose.C_INDEX_3D  # reference quirk: feet channels kept


def test_c_index_matches_reference_construction():
    fix = (list(range(0, 18)) + list(range(21, 27)) + list(range(30, 36))
           + list(range(45, 51)))
    all_idx = np.ones(165)
    all_idx[fix] = 0
    expect = np.nonzero(all_idx)[0]
    np.testing.assert_array_equal(pose.C_INDEX_3D, expect)
    expect6 = np.asarray([2 * i + k for i in expect for k in (0, 1)])
    np.testing.assert_array_equal(pose.C_INDEX_6D, expect6)


def test_part2full_layout():
    T = 7
    jaw = np.full((T, 3), 1.0)
    conv = np.arange(T * 129, dtype=np.float32).reshape(T, 129) + 100.0
    exp = np.full((T, 100), 3.0)
    pred = jnp.asarray(np.concatenate([jaw, conv, exp], axis=1))
    full = np.asarray(pose.part2full(pred))
    assert full.shape == (T, 265)
    # jaw passes through
    np.testing.assert_array_equal(full[:, :3], jaw)
    # canned lower pose inserted at 3:18, 21:27, 30:36, 39:45
    np.testing.assert_allclose(full[:, 3:18], np.broadcast_to(pose.LOWER_POSE[:15], (T, 15)))
    np.testing.assert_allclose(full[:, 21:27], np.broadcast_to(pose.LOWER_POSE[15:21], (T, 6)))
    np.testing.assert_allclose(full[:, 30:36], np.broadcast_to(pose.LOWER_POSE[21:27], (T, 6)))
    np.testing.assert_allclose(full[:, 39:45], np.broadcast_to(pose.LOWER_POSE[27:33], (T, 6)))
    # conv channels land where the reference's cat order puts them
    np.testing.assert_array_equal(full[:, 18:21], conv[:, 0:3])
    np.testing.assert_array_equal(full[:, 27:30], conv[:, 3:6])
    np.testing.assert_array_equal(full[:, 36:39], conv[:, 6:9])
    np.testing.assert_array_equal(full[:, 45:165], conv[:, 9:])
    np.testing.assert_array_equal(full[:, 165:], exp)


def test_part2full_stand_zeroes_lower():
    pred = jnp.zeros((2, 232))
    full = np.asarray(pose.part2full(pred, stand=True))
    np.testing.assert_allclose(full[:, 9:12], [[3.0747, -0.0158, -0.0152]] * 2, atol=1e-5)
    np.testing.assert_allclose(full[:, 3:9], 0.0)


def test_full_to_conv_inverse_of_part2full_on_kept_channels():
    rng = np.random.default_rng(1)
    pred = rng.standard_normal((5, 232)).astype(np.float32)
    full = pose.part2full(jnp.asarray(pred))
    conv = np.asarray(pose.full_to_conv(full[:, :165]))
    # kept channels = [18:21, 27:30, 36:45, 51:165]; part2full placed
    # pred[12:18] at 45:51 (dropped) and the tail shifted — exact relation:
    # conv[0:9] == pred[3:12]; conv[9:15] == LOWER_POSE[27:33] (canned feet);
    # conv[15:] == pred[18:132] (tail shifted up by one joint, the
    # reference quirk documented in ops/pose.py)
    np.testing.assert_allclose(conv[:, 0:9], pred[:, 3:12], atol=1e-6)
    np.testing.assert_allclose(conv[:, 9:15], np.broadcast_to(pose.LOWER_POSE[27:33], (5, 6)), atol=1e-6)
    np.testing.assert_allclose(conv[:, 15:], pred[:, 18:132], atol=1e-6)


def test_hand_pca_expansion():
    rng = np.random.default_rng(2)
    packed = rng.standard_normal((4, 99))
    full = pose.hand_pca_to_full(packed)
    assert full.shape == (4, 165)
    left_c, right_c = pose.load_hand_components()
    np.testing.assert_allclose(full[:, 75:120], packed[:, 75:87] @ left_c[:12], atol=1e-8)
    np.testing.assert_allclose(full[:, 120:165], packed[:, 87:99] @ right_c[:12], atol=1e-8)
    np.testing.assert_allclose(full[:, :75], packed[:, :75])


def test_pose_blend_helpers_torch_parity():
    """pred2poses / poses2poses / poses2pred vs an inline torch-style
    numpy re-derivation of lower_body.py:90-133 (concat slicing)."""
    from talkshow_tpu.ops.pose import (LOWER_POSE, poses2poses, poses2pred,
                                       pred2poses)

    rng = np.random.default_rng(3)
    gt = rng.standard_normal((5, 265)).astype(np.float32)
    pred = rng.standard_normal((7, 232)).astype(np.float32)
    full = rng.standard_normal((7, 265)).astype(np.float32)

    def rep(s, e, n):
        return np.repeat(gt[0:1, s:e], n, axis=0)

    # pred2poses (lower_body.py:90-101): pred channels interleaved with gt
    ref = np.concatenate([pred[:, :3], rep(3, 18, 7), pred[:, 3:6],
                          rep(21, 27, 7), pred[:, 6:9], rep(30, 36, 7),
                          pred[:, 9:12], rep(39, 45, 7), pred[:, 12:]], 1)
    np.testing.assert_allclose(np.asarray(pred2poses(jnp.asarray(pred),
                                                     jnp.asarray(gt))), ref)

    # poses2poses (lower_body.py:104-116): FULL pose, gt lower body
    ref = np.concatenate([full[:, :3], rep(3, 18, 7), full[:, 18:21],
                          rep(21, 27, 7), full[:, 27:30], rep(30, 36, 7),
                          full[:, 36:39], rep(39, 45, 7), full[:, 45:]], 1)
    np.testing.assert_allclose(np.asarray(poses2poses(jnp.asarray(full),
                                                      jnp.asarray(gt))), ref)

    # poses2pred (lower_body.py:117-133): FULL pose, canned lower body
    lp = np.asarray(LOWER_POSE, np.float32)
    ref = np.concatenate(
        [full[:, :3], np.repeat(lp[None, 0:15], 7, 0), full[:, 18:21],
         np.repeat(lp[None, 15:21], 7, 0), full[:, 27:30],
         np.repeat(lp[None, 21:27], 7, 0), full[:, 36:39],
         np.repeat(lp[None, 27:33], 7, 0), full[:, 45:]], 1)
    np.testing.assert_allclose(np.asarray(poses2pred(jnp.asarray(full))), ref)
