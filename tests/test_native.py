"""Native C++ audio library: parity vs the JAX frontend."""
import numpy as np
import jax.numpy as jnp
import pytest

from talkshow_tpu import native
from talkshow_tpu.ops import audio as A

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library could not be built")


def test_native_resample_matches_jax(rng):
    x = rng.standard_normal(16000).astype(np.float32)
    ours = native.native_resample(x, 16000, 22000)
    ref = np.asarray(A.resample(jnp.asarray(x), 16000, 22000))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_native_mfcc_matches_jax(rng):
    sr = 22000
    t = np.arange(sr * 2) / sr
    x = (np.sin(2 * np.pi * 330 * t) + 0.1 * rng.standard_normal(sr * 2)
         ).astype(np.float32)
    ours = native.native_mfcc(x, sr, fps=30)
    ref = np.asarray(A.mfcc(jnp.asarray(x), sr, fps=30))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-4)


def test_native_end_to_end(tmp_path, rng):
    import wave
    sr = 16000
    x = (np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32)
    path = str(tmp_path / "t.wav")
    with wave.open(path, "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(sr)
        w.writeframes((x * 30000).astype("<i2").tobytes())
    ours = native.get_mfcc_native(path, sr=22000, fps=30)
    ref = A.get_mfcc(path, sr=22000, fps=30)
    np.testing.assert_allclose(ours, ref, atol=5e-3, rtol=1e-3)


def test_threads_reported():
    lib = native.load_library()
    assert lib.ts_num_threads() >= 1
