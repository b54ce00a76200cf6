"""OpenPose-json ingestion + legacy 2D eval CLI (reference evaluation/
util.py get_gts/get_full_path/cvt25/hand_points/valid_points/smooth and
the diversity_LVD.py / mode_transition.py script flows)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from talkshow_tpu.eval import legacy2d as l2d

REPO = os.path.join(os.path.dirname(__file__), "..")


def _write_clip(clip_dir, T=30, seed=0):
    """Synthetic OpenPose person_1 jsons: 25 pose + 21+21 hand + 70 face."""
    rng = np.random.default_rng(seed)
    kdir = os.path.join(clip_dir, "keypoints_new", "person_1")
    os.makedirs(kdir, exist_ok=True)
    base = rng.uniform(100, 500, (137, 2))
    base[0] = [320, 100]                       # nose
    base[1] = [320, 160]                       # neck: offset 60 px
    frames = []
    for t in range(T):
        kp = base + rng.normal(0, 2, base.shape) + [0.5 * t, 0]
        frames.append(kp)
        person = {
            "pose_keypoints_2d":
                np.concatenate([kp[:25], np.ones((25, 1))], 1)
                .reshape(-1).tolist(),
            "hand_left_keypoints_2d":
                np.concatenate([kp[25:46], np.ones((21, 1))], 1)
                .reshape(-1).tolist(),
            "hand_right_keypoints_2d":
                np.concatenate([kp[46:67], np.ones((21, 1))], 1)
                .reshape(-1).tolist(),
            "face_keypoints_2d":
                np.concatenate([kp[67:], np.ones((70, 1))], 1)
                .reshape(-1).tolist(),
        }
        with open(os.path.join(kdir, f"{t:06d}_keypoints.json"), "w") as f:
            json.dump({"people": [person]}, f)
    return np.asarray(frames)


def test_load_openpose_clip_localization(tmp_path):
    truth = _write_clip(str(tmp_path), T=12)
    unloc, loc, (scale, mean_pos) = l2d.load_openpose_clip(str(tmp_path))
    assert unloc.shape == (12, 137, 2) and loc.shape == (12, 274)
    np.testing.assert_allclose(unloc, truth, atol=1e-9)
    # scale = mean |neck_y - nose_y|; localized neck is exactly 0
    assert abs(scale - np.abs(truth[:, 1, 1] - truth[:, 0, 1]).mean()) < 1e-9
    loc2 = loc.reshape(12, 137, 2)
    np.testing.assert_allclose(loc2[:, 1], 0, atol=1e-12)
    np.testing.assert_allclose(
        loc2[:, 0], (truth[:, 0] - truth[:, 1]) / scale, atol=1e-9)
    assert mean_pos.shape == (2,)


def test_clip_path_for_wav(tmp_path):
    root = str(tmp_path)
    clip = os.path.join(root, "sp", "clips", "vidA", "images", "half",
                        "val", "0000000001")
    os.makedirs(clip)
    wav = "/any/where/0000000001_vidA.wav"
    assert l2d.clip_path_for_wav(wav, "sp", "val", root) == clip
    with pytest.raises(FileNotFoundError):
        l2d.clip_path_for_wav("/x/0000000002_vidA.wav", "sp", "val", root)


def test_cvt25_splices_pred_into_gt_layout():
    rng = np.random.default_rng(1)
    gt = rng.standard_normal((1, 10, 270))
    pred = rng.standard_normal((3, 8, 108))
    out = l2d.cvt25(pred, gt)
    assert out.shape == (3, 8, 270)
    o = out.reshape(3, 8, 135, 2)
    p = pred.reshape(3, 8, 54, 2)
    g = np.repeat(gt, 3, 0)[:, :8].reshape(3, 8, 135, 2)
    np.testing.assert_allclose(o[:, :, 1:8], p[:, :, 1:8])
    np.testing.assert_allclose(o[:, :, 25:67], p[:, :, 12:])
    np.testing.assert_allclose(o[:, :, 0], g[:, :, 0])      # untouched
    np.testing.assert_allclose(o[:, :, 67:], g[:, :, 67:])


def test_point_selectors():
    seq = np.arange(2 * 5 * 270, dtype=np.float64).reshape(2, 5, 270)
    hp = l2d.hand_points(seq)
    vp = l2d.valid_points(seq)
    assert hp.shape == (2, 5, 98) and vp.shape == (2, 5, 108)
    s = seq.reshape(2, 5, 135, 2)
    np.testing.assert_allclose(hp.reshape(2, 5, 49, 2)[:, :, 7:], s[:, :, 25:67])
    np.testing.assert_allclose(vp.reshape(2, 5, 54, 2)[:, :, :12], s[:, :, :12])


def test_smooth_chunk_boundaries_only_touches_seams():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 60, 4))
    y = l2d.smooth_chunk_boundaries(x)
    changed = np.where(np.abs(y - x).sum((0, 2)) > 1e-12)[0]
    assert all(t % 25 in {22, 23, 24, 0, 1, 2, 3} for t in changed)
    assert 25 in changed and 12 not in changed
    # first seam frame's window is untouched: centered 7-frame mean
    np.testing.assert_allclose(y[:, 22], x[:, 19:26].mean(1))


def test_consistency_metrics():
    a = np.array([10.0, 20.0])
    c = l2d.velocity_consistency(a, a)
    np.testing.assert_allclose(c, 0.0)
    assert (l2d.velocity_consistency(a, np.zeros(0)) == 100.0).all()

    seq = np.zeros((1, 101, 4))
    seq[0, 50:] = np.cumsum(np.ones((51, 4)), 0)    # still then moving
    m = l2d.mode_transition_seq(seq, window=10)
    assert m.shape == (1, 10) and m[0, :4].sum() == 0 and m[0, 6:].sum() == 4
    p, r, acc = l2d.mode_transition_consistency(m, m)
    assert p == 1.0 and r == 1.0 and acc == 1.0


def _make_pose_dataset(root, speaker="sp", n_clips=2):
    for i in range(n_clips):
        clip = f"{i:010d}"
        cdir = os.path.join(root, speaker, "clips", "vidA", "images",
                            "half", "val", clip)
        _write_clip(cdir, T=60, seed=i)
        adir = os.path.join(root, "test_audios", speaker)
        os.makedirs(adir, exist_ok=True)
        open(os.path.join(adir, f"{clip}_vidA.wav"), "wb").close()
        rng = np.random.default_rng(100 + i)
        pred = rng.standard_normal((2, 60, 108)).cumsum(1) * 0.05
        with open(os.path.join(adir, f"{clip}_vidA_base.json"), "w") as f:
            json.dump(pred.tolist(), f)


@pytest.mark.parametrize("mode", ["diversity_lvd", "peak_velocity",
                                  "mode_transition", "quality_samples"])
def test_legacy_eval_cli(tmp_path, mode):
    root = str(tmp_path / "pose_dataset")
    _make_pose_dataset(root)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "legacy_eval.py"),
         "--mode", mode, "--speaker", "sp", "--root", root,
         "--post_fix", "base", "--out_dir", str(tmp_path / "out")],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert all(np.isfinite(v) for v in out.values()
               if isinstance(v, (int, float)))
    if mode == "quality_samples":
        assert os.path.isfile(out["saved"])
