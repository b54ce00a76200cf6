"""Parity tests for the less-traveled audio frontends: type='mel'
(get_mel), type='mel_mul' (audio_chunking + get_mel_chunked) and the
python_speech_features-style MFCC (get_mfcc_psf) — mirrors of
data_utils/utils.py:133-145, 179-192 and :86-107.

Replicas are built inline from torch.stft + independently re-derived
HTK mel formulas (torchaudio itself is not in the image).
"""
import math
import wave

import numpy as np
import pytest
import torch

from talkshow_tpu.ops import audio as A


def _write_wav(path, x, sr=16000):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(x, -1, 1) * 32767).astype("<i2").tobytes())


def _speechy(sr, secs, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * secs)) / sr
    x = (0.4 * np.sin(2 * np.pi * 180 * t) * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))
         + 0.2 * np.sin(2 * np.pi * 510 * t) + 0.02 * rng.standard_normal(t.size))
    return x.astype(np.float32)


def _htk_mel_fb(sr, n_fft, n_mels):
    # independent torchaudio-style HTK filterbank (norm=None)
    def hz2mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)

    def mel2hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    pts = mel2hz(np.linspace(hz2mel(0.0), hz2mel(sr / 2), n_mels + 2))
    fb = np.zeros((freqs.size, n_mels))
    for m in range(n_mels):
        lo, c, hi = pts[m], pts[m + 1], pts[m + 2]
        up = (freqs - lo) / (c - lo)
        down = (hi - freqs) / (hi - c)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    return fb.astype(np.float32)


def _torch_melspec(x, sr, n_fft, hop, win_length, n_mels):
    # torchaudio.transforms.MelSpectrogram semantics: power-2 centered
    # reflect-padded STFT with a periodic hann window (padded to n_fft),
    # times the HTK fb
    win = torch.zeros(n_fft, dtype=torch.float64)
    off = (n_fft - win_length) // 2
    win[off:off + win_length] = torch.hann_window(
        win_length, periodic=True, dtype=torch.float64)
    spec = torch.stft(torch.from_numpy(np.asarray(x, np.float64)), n_fft,
                      hop_length=hop, window=win, center=True,
                      pad_mode="reflect", return_complex=True)
    power = spec.abs() ** 2  # (freq, frames)
    fb = torch.from_numpy(_htk_mel_fb(sr, n_fft, n_mels).astype(np.float64))
    return (power.T @ fb).numpy()  # (frames, n_mels)


def test_get_mel_matches_torch_stft_replica(tmp_path):
    sr = 16000
    x = _speechy(sr, 1.0)
    p = tmp_path / "a.wav"
    _write_wav(p, x, sr)
    ours = A.get_mel(str(p), sr=sr, fps=30)  # hop 734, win = n_fft = 2048
    x16 = A.load_wav(str(p))[0]
    ref = _torch_melspec(x16, sr, 2048, 734, 2048, A.N_MELS)
    assert ours.shape == ref.shape == (1 + len(x16) // 734, A.N_MELS)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-5)


def test_audio_chunking_matches_torch_replica():
    sr, fps = 16000, 30
    x = _speechy(sr, 0.7, seed=3)
    ours = np.asarray(A.audio_chunking(np.asarray(x), fps, sr))
    # reference audio_chunking (utils.py:133-145), verbatim semantics
    spf = sr // fps
    pad = (sr - spf) // 2
    a = torch.nn.functional.pad(torch.from_numpy(x)[None][None],
                                [pad, pad]).squeeze(0)
    anchors = list(range(sr // 2, a.shape[-1] - sr // 2, spf))
    ref = torch.cat([a[:, i - sr // 2:i + sr // 2] for i in anchors], 0)
    assert ours.shape == tuple(ref.shape)
    np.testing.assert_allclose(ours, ref.numpy(), atol=1e-7)


def test_get_mel_chunked_matches_replica(tmp_path):
    sr = 16000
    x = _speechy(sr, 0.5, seed=5)
    p = tmp_path / "c.wav"
    _write_wav(p, x, sr)
    ours = A.get_mel_chunked(str(p), sr=sr, fps=30)
    x0 = A.load_wav(str(p))[0]
    xn = 0.01 * x0 / np.mean(np.abs(x0))
    chunks = np.asarray(A.audio_chunking(np.asarray(xn), 30, sr))
    assert ours.shape == (chunks.shape[0], 1 + sr // (sr // 100), A.N_MELS)
    for row in (0, chunks.shape[0] - 1):  # spot-check first/last frame chunk
        ref = _torch_melspec(chunks[row], sr, 2048, sr // 100, sr // 20,
                             A.N_MELS)
        ref = np.log(np.clip(ref, 1e-10, None))
        np.testing.assert_allclose(ours[row], ref, rtol=5e-3, atol=1e-4)


def test_mfcc_psf_properties(tmp_path):
    sr = 16000
    x = _speechy(sr, 1.0, seed=7)
    p = tmp_path / "d.wav"
    _write_wav(p, x, sr)
    feat = A.get_mfcc_psf(str(p), sr=sr, smlpx=True)
    x0 = A.load_wav(str(p))[0].astype(np.float64)
    # psf frame count: ceil past the first full 25 ms window at winstep
    step, flen = int(round(1.01 / 15 * sr)), int(round(0.025 * sr))
    n_frames = 1 + int(math.ceil((len(x0) - flen) / step))
    assert feat.shape == (n_frames, 64)
    # appendEnergy: c0 is the log TOTAL energy of the pre-emphasized frame,
    # replacing the lifted DCT coefficient
    pre = np.append(x0[0], x0[1:] - 0.97 * x0[:-1])
    f0 = pre[:flen]
    np.testing.assert_allclose(feat[0, 0], np.log(np.sum(f0 ** 2)), rtol=1e-5)
    f1 = pre[step:step + flen]
    np.testing.assert_allclose(feat[1, 0], np.log(np.sum(f1 ** 2)), rtol=1e-5)
    # deterministic + finite
    feat2 = A.get_mfcc_psf(str(p), sr=sr, smlpx=True)
    np.testing.assert_array_equal(feat, feat2)
    assert np.isfinite(feat).all()


def test_mfcc_psf_winstep_variants(tmp_path):
    sr = 16000
    p = tmp_path / "e.wav"
    _write_wav(p, _speechy(sr, 0.8, seed=9), sr)
    a = A.get_mfcc_psf(str(p), sr=sr, smlpx=True)    # winstep 1.01/15 ~ 67 ms
    b = A.get_mfcc_psf(str(p), sr=sr, smlpx=False)   # winstep 0.04 = 40 ms
    assert a.shape[0] < b.shape[0]  # coarser hop -> fewer frames
    assert a.shape[1] == b.shape[1] == 64
