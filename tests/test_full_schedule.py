"""Pure-logic coverage for the full-schedule orchestrator + eval scripts
(the training itself runs on the chip; see docs/r04_schedule/)."""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def test_derived_config_overrides_model(tmp_path):
    from train_full_schedule import derived_config
    src = tmp_path / "src.json"
    json.dump({"Model": {"model_name": "s2g_body_vq", "code_num": 2048},
               "Log": {"name": "body-vq"}}, open(src, "w"))
    dst = derived_config(str(src), str(tmp_path / "dst.json"),
                         model_name="s2g_body_ae")
    cfg = json.load(open(dst))
    assert cfg["Model"]["model_name"] == "s2g_body_ae"
    assert cfg["Model"]["code_num"] == 2048        # untouched fields kept
    assert cfg["Log"]["name"] == "s2g_body_ae"


def test_summarize_history_convergence(tmp_path):
    from eval_full_schedule import summarize_history
    d = tmp_path / "body_vq"
    d.mkdir()
    hist = [{"epoch": i, "body_rec": 1.0 / (i + 1), "epoch_seconds": 2.0,
             "nonfinite_skips": 0.0} for i in range(8)]
    json.dump(hist, open(d / "history.json", "w"))
    s = summarize_history(str(tmp_path))
    assert set(s) == {"body_vq"}
    sv = s["body_vq"]
    assert sv["improved"] and sv["late_over_early"] < 1.0
    assert sv["epochs"] == 8 and sv["total_wall_s"] == 16.0
    assert sv["nonfinite_skips_final"] == 0


def test_curve_keys_cover_all_trainables():
    from train_full_schedule import CURVE_KEYS
    assert set(CURVE_KEYS) == {"body_vq", "body_pixel", "face", "body_ae",
                               "ls3dcg"}
    assert all(isinstance(v, str) and v for v in CURVE_KEYS.values())
