import json
import os
import pickle

import numpy as np
import pytest

from talkshow_tpu.config import Config, body_pixel_config
from talkshow_tpu.data import preprocess as pp
from talkshow_tpu.data.dataset import ShowDataset, synthetic_dataset
from talkshow_tpu.eval import legacy2d


def test_synthetic_dataset_windows():
    ds = synthetic_dataset(num_clips=2, frames=120)
    ds.generate_length = 16
    rng = np.random.default_rng(0)
    batches = list(ds.batches(4, rng))
    assert len(batches) > 0
    b = batches[0]
    assert b["poses"].shape == (4, 16, 165)
    assert b["aud_feat"].shape == (4, 16, 64)
    assert b["speaker"].dtype == np.int32
    assert set(np.unique(b["speaker"])) <= {0, 1, 2, 3}


def test_whole_clips():
    ds = synthetic_dataset(num_clips=3, frames=100)
    clips = list(ds.whole_clips())
    assert len(clips) == 3
    assert clips[0]["poses"].shape[1] == 165


def _write_clip(root, speaker, vid, split, name, frames=100, bad=False):
    d = os.path.join(root, speaker, vid, split, name)
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    data = {
        "jaw_pose": rng.standard_normal((frames, 3)),
        "leye_pose": rng.standard_normal((frames, 3)),
        "reye_pose": rng.standard_normal((frames, 3)),
        "global_orient": rng.standard_normal((frames, 3)),
        "body_pose_axis": rng.standard_normal((frames, 63)),
        "left_hand_pose": rng.standard_normal((frames, 45)),
        "right_hand_pose": rng.standard_normal((frames, 45)),
        "expression": rng.standard_normal((frames, 100)),
        "betas": rng.standard_normal(300),
    }
    if bad:
        data["body_pose_axis"][0, 0] = np.nan
    with open(os.path.join(d, name + ".pkl"), "wb") as f:
        pickle.dump(data, f)
    # tiny wav
    import wave
    with wave.open(os.path.join(d, name + ".wav"), "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
        t = np.arange(int(16000 * frames / 30)) / 16000
        w.writeframes((np.sin(2 * np.pi * 200 * t) * 20000).astype("<i2").tobytes())
    return d


def test_show_dataset_from_root(tmp_path, monkeypatch):
    root = str(tmp_path)
    _write_clip(root, "oliver", "vid1", "train", "clip1")
    _write_clip(root, "conan", "vid2", "train", "clip2", frames=120)
    ds = ShowDataset.from_root(root, ["oliver", "conan"], "train",
                               cache_pkl=str(tmp_path / "cache.pkl"))
    assert len(ds.clips) == 2
    assert ds.clips[0].poses.shape[1] == 165
    # cache reload path: same tree + args -> served from the pickle
    # (load_clip poisoned to prove no re-featurization happens)
    real_load = ShowDataset.load_clip
    monkeypatch.setattr(ShowDataset, "load_clip",
                        lambda *a, **k: (_ for _ in ()).throw(
                            AssertionError("cache miss")))
    ds2 = ShowDataset.from_root(root, ["oliver", "conan"], "train",
                                cache_pkl=str(tmp_path / "cache.pkl"))
    assert len(ds2.clips) == 2  # loaded from cache
    # stale-cache detection: a different clip tree (fewer speakers) must
    # REBUILD instead of silently serving the old 2-clip split
    monkeypatch.setattr(ShowDataset, "load_clip", real_load)
    ds3 = ShowDataset.from_root(root, ["oliver"], "train",
                                cache_pkl=str(tmp_path / "cache.pkl"))
    assert len(ds3.clips) == 1


def test_preprocess_filter_and_split(tmp_path):
    root = str(tmp_path)
    _write_clip(root, "oliver", "v", "all", "good1")
    _write_clip(root, "oliver", "v", "all", "good2", frames=110)
    _write_clip(root, "oliver", "v", "all", "short", frames=30)
    _write_clip(root, "oliver", "v", "all", "nan1", bad=True)
    clips = pp.scan_clips(root, ["oliver"])
    assert len(clips) == 4
    ok = [c for c in clips if pp.check_clip(c[1], c[2])]
    assert len(ok) == 2
    splits = pp.random_split(ok * 5, seed=1)
    assert len(splits["train"]) == 8
    assert len(splits["val"]) == 1
    assert len(splits["test"]) == 1


def test_apply_split():
    clips = [("s", "/a/clipA/m.pkl", "/a/clipA/a.wav"),
             ("s", "/a/clipB/m.pkl", "/a/clipB/a.wav")]
    sm = {"clipA": "train", "clipB": "test"}
    out = pp.apply_split(clips, sm)
    assert len(out["train"]) == 1 and len(out["test"]) == 1


def test_load_published_split(tmp_path):
    """Flattens the reference's nested split pkl ({speaker:{vid:{split:
    [seq,...]}}} with Windows-style paths) into apply_split's flat map."""
    import pickle
    nested = {
        "oliver": {"vid1": {
            "train": ["exp\\oliver\\vid1\\clipA"],
            "test": ["exp/oliver/vid1/clipB"],
        }},
        "seth": {"vid9": {"val": ["exp/seth/vid9/clipC"]}},
    }
    path = tmp_path / "split.pkl"
    path.write_bytes(pickle.dumps(nested))
    sm = pp.load_published_split(str(path))
    assert sm == {"clipA": "train", "clipB": "test", "clipC": "val"}
    clips = [("oliver", "/r/oliver/vid1/clipA/m.pkl", "a.wav"),
             ("oliver", "/r/oliver/vid1/clipB/m.pkl", "a.wav"),
             ("seth", "/r/seth/vid9/clipD/m.pkl", "a.wav")]  # D: not in pkl
    out = pp.apply_split(clips, sm)
    assert len(out["train"]) == 1 and len(out["test"]) == 1
    assert len(out["val"]) == 0   # clipC never scanned, clipD unmapped


def test_config_from_reference_json(tmp_path):
    if os.path.isfile("/root/reference/config/body_pixel.json"):
        cfg = Config.from_reference_json("/root/reference/config/body_pixel.json")
        assert cfg.model.model_name == "s2g_body_pixel"
        assert cfg.model.code_num == 2048
        assert cfg.train.batch_size == 128
        assert cfg.data.pose.generate_length == 88
    cfg2 = body_pixel_config()
    assert "body" in cfg2.log.name


def test_config_validation():
    with pytest.raises(ValueError):
        Config.from_reference_dict({"Model": {"model_name": "nope"}})


def test_legacy2d_metrics(rng):
    kps = rng.standard_normal((60, 25, 2)).astype(np.float32)
    assert legacy2d.lvd_2d(kps, kps) == 0.0
    assert legacy2d.diversity_2d(np.stack([kps, kps])) == 0.0
    pv = legacy2d.peak_velocity(kps)
    assert len(pv) > 0 and np.all(np.isfinite(pv))
    r = legacy2d.mode_transition_ratio(kps)
    assert 0.0 <= r <= 1.0


def test_select_quality_samples(rng):
    kps = rng.standard_normal((300, 25, 2)).astype(np.float32).cumsum(0) * 0.01
    wins = legacy2d.select_quality_samples(kps, window=60, stride=30)
    assert all(e - s == 60 for s, e in wins)
    assert len(wins) >= 1


def test_trainer_normalization(tmp_path):
    import jax
    from talkshow_tpu.config import body_vq_config
    from talkshow_tpu.data.dataset import synthetic_dataset
    from talkshow_tpu.models.vqvae import VQVAE
    from talkshow_tpu.train import steps as tsteps
    from talkshow_tpu.train.trainer import Trainer

    cfg = body_vq_config()
    cfg.data.pose.normalization = True
    cfg.train.batch_size = 4
    cfg.train.epochs = 1
    cfg.log.save_every = 10
    cfg.data.pose.generate_length = 16
    ds = synthetic_dataset(num_clips=2, frames=60)
    ds.generate_length = 16
    vq_b, vq_h = VQVAE(in_dim=39, num_hiddens=64), VQVAE(in_dim=90, num_hiddens=64)
    init_state, step = tsteps.make_body_vq_step(vq_b, vq_h)
    tr = Trainer(cfg, ds, init_state, lambda s, b: step(s, b), needs_rng=False,
                 run_dir=str(tmp_path / "r")).setup()
    tr.train()
    assert os.path.isfile(str(tmp_path / "r" / "norm_stats.npy"))
    stats = np.load(str(tmp_path / "r" / "norm_stats.npy"))
    assert stats.shape == (2, 165)
