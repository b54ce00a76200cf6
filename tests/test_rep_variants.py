"""6d/5d pose representation variants + Meshtalk face variant + CLI smoke."""
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from talkshow_tpu.ops import pose as P
from talkshow_tpu.ops.rotation import axis_angle_to_matrix


def test_6d_roundtrip(rng):
    aa = (rng.standard_normal((7, 165)) * 0.4).astype(np.float32)
    d6 = P.axis_angle_poses_to_6d(jnp.asarray(aa))
    assert d6.shape == (7, 330)
    back = np.asarray(P.pose6d_to_axis_angle(d6))
    # axis-angle is not unique; compare rotation matrices
    m1 = np.asarray(axis_angle_to_matrix(jnp.asarray(aa.reshape(7, 55, 3))))
    m2 = np.asarray(axis_angle_to_matrix(jnp.asarray(back.reshape(7, 55, 3))))
    np.testing.assert_allclose(m1, m2, atol=1e-4)


def test_5d_to_axis_angle(rng):
    # construct 5d = [axis(3), sin, cos] from known axis-angles
    aa = (rng.standard_normal((4, 55, 3)) * 0.5).astype(np.float32)
    angle = np.linalg.norm(aa, axis=-1, keepdims=True)
    axis = aa / np.maximum(angle, 1e-8)
    p5 = np.concatenate([axis, np.sin(angle), np.cos(angle)], -1).reshape(4, 275)
    exp = rng.standard_normal((4, 100)).astype(np.float32)
    full = np.concatenate([p5, exp], -1)
    out = np.asarray(P.pose5d_to_axis_angle(jnp.asarray(full)))
    np.testing.assert_allclose(out[:, :165], aa.reshape(4, 165), atol=1e-4)
    np.testing.assert_allclose(out[:, 165:], exp, atol=1e-6)


def test_dataset_convert_to_6d(tmp_path):
    from tests.test_data_and_misc import _write_clip
    from talkshow_tpu.data.dataset import ShowDataset
    _write_clip(str(tmp_path), "oliver", "v", "train", "c1")
    ds = ShowDataset.from_root(str(tmp_path), ["oliver"], "train",
                               convert_to_6d=True)
    assert ds.clips[0].poses.shape[1] == 330


def test_meshtalk_face_variant():
    from talkshow_tpu.models.face import FaceGeneratorMeshtalk
    from talkshow_tpu.ops.audio import audio_chunking
    model = FaceGeneratorMeshtalk()
    wav = jnp.asarray(np.random.default_rng(0).standard_normal(16000 * 2),
                      jnp.float32)
    chunks = audio_chunking(wav, frame_rate=30, chunk_size=16000)[None, :8]
    v = model.init(jax.random.PRNGKey(0), chunks, jnp.zeros((1, 4)))
    out = model.apply(v, chunks, jnp.zeros((1, 4)))
    assert out.shape == (1, 8, 103)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("script,flags", [
    ("scripts/test_vq.py", ["--synthetic"]),
])
def test_cli_eval_smoke(script, flags):
    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"}
    import os
    env.update({k: v for k, v in os.environ.items()
                if k not in ("JAX_PLATFORMS",)})
    env["JAX_PLATFORMS"] = "cpu"
    # Share the suite's persistent compile cache (see test_cli_train._run).
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1.0"
    r = subprocess.run([sys.executable, script] + flags, capture_output=True,
                       text=True, timeout=1200, env=env, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "capacity_l1" in r.stdout
