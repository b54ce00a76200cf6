"""Smoke scripts/convert_checkpoints.py over the on-disk golden .pth
fixtures: the CLI must convert reference-format checkpoints and write an
orbax tree that loads back with the same leaves as direct conversion.
Also locks the n_layers inference that lets one CLI call handle both the
15-layer 3d prior and the 10-layer 6d prior (smplx_body_pixel.py:49-53).
"""
import os
import subprocess
import sys

import numpy as np
import pytest
import torch

REPO = os.path.join(os.path.dirname(__file__), "..")
GOLD = os.path.join(os.path.dirname(__file__), "fixtures", "golden")
SCRIPT = os.path.join(REPO, "scripts", "convert_checkpoints.py")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(GOLD, "body_vq.pth")),
    reason="golden fixtures absent")


def _run(kind, src, out):
    r = subprocess.run([sys.executable, SCRIPT, kind, "--src", src,
                        "--out", out], capture_output=True, text=True,
                       cwd=REPO, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


def _load_tree(path):
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer().restore(os.path.abspath(path))


def test_convert_cli_body_vq_roundtrip(tmp_path):
    out = str(tmp_path / "vq")
    _run("body_vq", os.path.join(GOLD, "body_vq.pth"), out)
    tree = _load_tree(out)
    assert set(tree) == {"body", "hand"}
    from talkshow_tpu.convert import talkshow as ts
    ckpt = torch.load(os.path.join(GOLD, "body_vq.pth"),
                      map_location="cpu", weights_only=False)
    direct = ts.convert_body_vq_checkpoint(ckpt)
    np.testing.assert_array_equal(
        np.asarray(tree["body"]["vq_state"]["embeddings"]),
        np.asarray(direct["body"][1].embeddings))


def test_convert_cli_body_pixel_infers_layers(tmp_path):
    # the golden prior is 3 layers, not the 3d default 15 — the CLI must
    # infer the depth from the state dict
    out = str(tmp_path / "pixel")
    _run("body_pixel", os.path.join(GOLD, "body_pixel.pth"), out)
    tree = _load_tree(out)
    assert set(tree) == {"prior", "audio"}
    layer_keys = [k for k in tree["prior"]["params"] if k.startswith("layer")]
    assert len(layer_keys) == 3, sorted(tree["prior"]["params"])


def test_convert_infers_6d_style_depth():
    # drop the golden prior to 2 layers by deleting the deepest layer's
    # keys: inference must follow the keys, not a hardcoded constant
    from talkshow_tpu.convert import talkshow as ts
    ckpt = torch.load(os.path.join(GOLD, "body_pixel.pth"),
                      map_location="cpu", weights_only=False)
    gen = ckpt["generator"]["generator"]
    trimmed = {k: v for k, v in gen.items() if "layers.2." not in k}
    params = ts.convert_pixelcnn(trimmed)
    assert sum(k.startswith("layer") for k in params["params"]) == 2
