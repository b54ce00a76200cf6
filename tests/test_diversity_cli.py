"""Smoke scripts/diversity.py --tiny: the 4-speaker x N-sample diversity
CLI (mirror of reference scripts/diversity.py) end-to-end on tiny
random-init models."""
import json
import os
import runpy
import sys
import wave

import numpy as np

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts",
                      "diversity.py")


def test_diversity_cli_tiny(tmp_path, capsys):
    wav_path = str(tmp_path / "clip.wav")
    sr = 16000
    t = np.arange(int(sr * 1.2)) / sr
    x = 0.3 * np.sin(2 * np.pi * 220 * t) * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))
    with wave.open(wav_path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((x * 32767).astype("<i2").tobytes())

    out_dir = str(tmp_path / "out")
    argv = ["diversity.py", "--audio_file", wav_path, "--num_sample", "2",
            "--out_dir", out_dir, "--tiny"]
    old = sys.argv
    sys.argv = argv
    try:
        runpy.run_path(SCRIPT, run_name="__main__")
    finally:
        sys.argv = old

    scores = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(scores) == {f"diversity_speaker{s}" for s in range(4)}
    # random-init logits can dwarf the gumbel noise for SOME speaker on a
    # pure tone (deterministic argmax -> diversity exactly 0), so require
    # stochasticity to show up somewhere rather than everywhere
    assert all(np.isfinite(v) and v >= 0 for v in scores.values())
    assert any(v > 0 for v in scores.values())

    motion = np.load(os.path.join(out_dir, "clip_diversity.npy"))
    assert motion.shape[:2] == (4, 2) and motion.shape[-1] == 129
    assert np.isfinite(motion).all()
    # different speakers condition the prior differently
    assert np.abs(motion[0] - motion[1]).max() > 1e-4
