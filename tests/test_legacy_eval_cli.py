"""End-to-end smoke of scripts/legacy_eval.py — the one-CLI mirror of the
reference's four legacy 2D eval scripts (evaluation/diversity_LVD.py,
peak_velocity.py, mode_transition.py, get_quality_samples.py) — over a
synthetic pose_dataset/ tree, all four modes."""
import json
import os
import runpy
import sys
import wave

import numpy as np
import pytest

from tests.test_legacy2d_ingest import _write_clip

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts",
                      "legacy_eval.py")


@pytest.fixture(scope="module")
def pose_root(tmp_path_factory):
    """pose_dataset layout: one speaker, one vid, one 60-frame val clip,
    wav + two prediction jsons (post_fix base/other)."""
    root = tmp_path_factory.mktemp("pose_dataset")
    speaker, vid, clipname = "oliver", "vidA", "0000000001"
    clip_dir = root / speaker / "clips" / vid / "images" / "half" / "val" / clipname
    T = 60
    _write_clip(str(clip_dir), T=T, seed=1)

    aud_dir = root / "test_audios" / speaker
    os.makedirs(aud_dir)
    wav_path = aud_dir / f"{clipname}_{vid}.wav"
    with wave.open(str(wav_path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(np.zeros(1600, "<i2").tobytes())

    rng = np.random.default_rng(7)
    for pf, seed in (("base", 2), ("other", 3)):
        pred = rng.normal(0, 1, (2, T, 108))  # B=2 samples, 54 pts x 2
        with open(str(aud_dir / f"{clipname}_{vid}_{pf}.json"), "w") as f:
            json.dump(pred.tolist(), f)
    return str(root)


def _run_cli(capsys, pose_root, mode, out_dir, post_fix=("base", "other")):
    argv = ["legacy_eval.py", "--mode", mode, "--speaker", "oliver",
            "--root", pose_root, "--split", "val", "--out_dir", out_dir,
            "--post_fix", *post_fix]
    old = sys.argv
    sys.argv = argv
    try:
        runpy.run_path(SCRIPT, run_name="__main__")
    finally:
        sys.argv = old
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_diversity_lvd_mode(capsys, pose_root, tmp_path):
    out = _run_cli(capsys, pose_root, "diversity_lvd", str(tmp_path))
    assert out["n"] == 4  # 2 post_fixes x B=2 samples
    assert np.isfinite(out["LVD"]) and out["LVD"] > 0


def test_peak_velocity_mode(capsys, pose_root, tmp_path):
    out = _run_cli(capsys, pose_root, "peak_velocity", str(tmp_path))
    for k in ("gt_consistency_mean", "pred_consistency_mean"):
        assert np.isfinite(out[k])
    assert os.path.exists(os.path.join(str(tmp_path), "oliver_gt.npy"))
    assert os.path.exists(os.path.join(str(tmp_path), "oliver_pred.npy"))


def test_mode_transition_mode(capsys, pose_root, tmp_path):
    out = _run_cli(capsys, pose_root, "mode_transition", str(tmp_path))
    assert out["n"] == 2
    for k in ("precision", "recall", "accuracy"):
        assert 0.0 <= out[k] <= 1.0


def test_quality_samples_mode(capsys, pose_root, tmp_path):
    out = _run_cli(capsys, pose_root, "quality_samples", str(tmp_path))
    saved = out["saved"]
    assert os.path.exists(saved)
    with open(saved) as f:
        data = json.load(f)
    assert set(data) == {"gt", "base", "other"}
    # valid-point tracks all share the frame axis length
    lens = {np.asarray(v).shape[1] for v in data.values()}
    assert len(lens) == 1
