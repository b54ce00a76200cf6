import numpy as np
import jax.numpy as jnp
import pytest
import torch

from talkshow_tpu.ops import audio


def test_stft_matches_torch():
    """Our frame+hann+rfft pipeline must equal torch.stft with the settings
    torchaudio.Spectrogram uses (center=True, reflect pad, periodic hann)."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal(22000 * 3).astype(np.float32)
    hop = 734
    ours = np.asarray(audio.power_spectrogram(jnp.asarray(x), 2048, hop))
    spec = torch.stft(
        torch.from_numpy(x), n_fft=2048, hop_length=hop,
        window=torch.hann_window(2048), center=True, pad_mode="reflect",
        normalized=False, onesided=True, return_complex=True,
    )
    theirs = (spec.abs() ** 2).numpy().T  # (frames, freqs)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-3)


def test_mfcc_shape_and_rate():
    # 10 s at 22 kHz, 30 fps hop 734 -> ~300 frames
    sr = 22000
    t = np.arange(sr * 10) / sr
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    feat = np.asarray(audio.mfcc(jnp.asarray(x), sr, fps=30))
    assert feat.shape[1] == 64
    assert abs(feat.shape[0] - sr * 10 // 734 - 1) <= 1
    assert np.all(np.isfinite(feat))


def test_mel_filterbank_properties():
    fb = audio.mel_filterbank(22000)
    assert fb.shape == (1025, 256)
    assert fb.min() >= 0
    # every filter has support
    assert (fb.sum(axis=0) > 0).all()


def test_dct_orthonormal():
    d = audio.dct_matrix(64, 256)
    # columns of the (n_mels, n_mfcc) DCT matrix are orthonormal
    gram = d.T @ d
    np.testing.assert_allclose(gram, np.eye(64), atol=1e-5)


def test_resample_preserves_tone():
    sr0, sr1, f = 16000, 22000, 440.0
    t = np.arange(sr0) / sr0
    x = np.sin(2 * np.pi * f * t).astype(np.float32)
    y = np.asarray(audio.resample(jnp.asarray(x), sr0, sr1))
    assert abs(y.shape[0] - int(np.ceil(sr1 / sr0 * x.shape[0]))) == 0
    # dominant frequency must still be f
    spec = np.abs(np.fft.rfft(y[1000:-1000] * np.hanning(y.shape[0] - 2000)))
    freqs = np.fft.rfftfreq(y.shape[0] - 2000, 1 / sr1)
    assert abs(freqs[spec.argmax()] - f) < 2.0
    # amplitude preserved
    assert abs(y[2000:-2000].max() - 1.0) < 0.02


def test_resample_identity():
    x = jnp.asarray(np.random.default_rng(0).standard_normal(1000).astype(np.float32))
    y = audio.resample(x, 16000, 16000)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_amplitude_to_db_topdb():
    p = jnp.asarray([1.0, 1e-12])
    db = np.asarray(audio.amplitude_to_db(p))
    assert db[0] == 0.0
    assert db[1] == -80.0  # clamped by top_db


@pytest.mark.skipif(
    not __import__("os").path.isfile("/root/reference/demo_audio/1st-page.wav"),
    reason="demo audio not present",
)
def test_load_and_featurize_demo_wav():
    feat = audio.get_mfcc("/root/reference/demo_audio/1st-page.wav", sr=22000, fps=30)
    assert feat.shape[1] == 64
    # 205056 samples @16k = 12.816 s -> ~384 frames after 22k resample
    assert 380 <= feat.shape[0] <= 390
    raw = audio.get_raw_16k("/root/reference/demo_audio/1st-page.wav")
    assert raw.shape == (205056, 1)


def test_onset_detection_clicks():
    """Clicks at known times must produce onsets near those times."""
    sr = 16000
    x = np.zeros(sr * 4, dtype=np.float32)
    for t0 in (0.5, 1.5, 2.5, 3.5):
        i = int(t0 * sr)
        x[i:i + 200] = np.random.default_rng(3).standard_normal(200).astype(np.float32)
    import tempfile, wave as wavmod
    with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
        path = f.name
    with wavmod.open(path, "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(sr)
        w.writeframes((x * 20000).astype("<i2").tobytes())
    times = audio.onset_times(path)
    assert len(times) >= 4
    for t0 in (0.5, 1.5, 2.5, 3.5):
        assert np.min(np.abs(times - t0)) < 0.08


def test_dft_matmul_matches_fft():
    """The MXU real-DFT matmul path (used on TPU, where XLA's FFT is the
    pipeline bottleneck) must match jnp.fft.rfft: near-exact on the power
    spectrogram and to well under the 80 dB top_db floor resolution on the
    final MFCC."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal(22000 * 2).astype(np.float32)
    p_fft = np.asarray(audio.power_spectrogram(jnp.asarray(x), 2048, 734,
                                               method="fft"))
    p_dft = np.asarray(audio.power_spectrogram(jnp.asarray(x), 2048, 734,
                                               method="dft_matmul"))
    assert p_fft.shape == p_dft.shape
    scale = p_fft.max()
    np.testing.assert_allclose(p_dft / scale, p_fft / scale, atol=2e-6)

    # end-to-end MFCC difference in feature units (dB-derived)
    def mfcc_with(method):
        power = audio.power_spectrogram(jnp.asarray(x), 2048, 734, method)
        mel = power @ jnp.asarray(audio.mel_filterbank(22000, 2048, 256))
        mel_db = audio.amplitude_to_db(mel)
        return np.asarray(mel_db @ jnp.asarray(audio.dct_matrix(64, 256)))

    assert np.max(np.abs(mfcc_with("fft") - mfcc_with("dft_matmul"))) < 0.02
