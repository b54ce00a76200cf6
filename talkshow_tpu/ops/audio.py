"""Audio frontend: loading, resampling, MFCC — TPU-native.

Reimplements the behaviour of the reference audio pipeline
(data_utils/utils.py:148-263) without torchaudio/librosa:

  * `get_mfcc_ta(..., type='mfcc')` == `mfcc(resample(load(wav)))` here.
    The reference uses torchaudio.transforms.MFCC with n_fft=2048,
    n_mels=256, n_mfcc=64, hop 734 (30 fps) / 1467 (15 fps), HTK mel scale,
    log-compression via amplitude_to_DB(power, top_db=80) and an
    orthonormal DCT-II (utils.py:157-176).
  * the face path passes the raw 16 kHz waveform through
    (encoder_choice='faceformer', utils.py:196-198).

Everything after `load_wav` is pure jnp: the STFT is an explicit
frame+window+rfft, and the mel projection / DCT are matmuls, so the whole
frontend fuses into a handful of MXU ops under jit.
"""
from __future__ import annotations

import math
import wave
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

N_FFT = 2048
N_MELS = 256
N_MFCC = 64
TOP_DB = 80.0
AMIN = 1e-10


# ---------------------------------------------------------------------------
# IO (host side)
# ---------------------------------------------------------------------------

def load_wav(path: str) -> tuple[np.ndarray, int]:
    """Read a PCM wav file -> (mono float32 in [-1, 1], sample_rate)."""
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        sw = w.getsampwidth()
        nch = w.getnchannels()
        raw = w.readframes(n)
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif sw == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {sw}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, sr


# ---------------------------------------------------------------------------
# Sinc resampling (torchaudio 'sinc_interp_hann' polyphase algorithm)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=8)
def _resample_kernel(orig_freq: int, new_freq: int,
                     lowpass_filter_width: int = 6, rolloff: float = 0.99):
    """Polyphase windowed-sinc kernel, (new_freq_g, 1, kernel_width), + width."""
    g = math.gcd(orig_freq, new_freq)
    orig, new = orig_freq // g, new_freq // g
    base_freq = min(orig, new) * rolloff
    width = math.ceil(lowpass_filter_width * orig / base_freq)
    idx = np.arange(-width, width + orig, dtype=np.float64)[None] / orig
    t = np.arange(0, -new, -1, dtype=np.float64)[:, None] / new + idx
    t = np.clip(t * base_freq, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * math.pi / lowpass_filter_width / 2.0) ** 2
    t = t * math.pi
    kernel = np.where(t == 0.0, 1.0, np.sin(t) / np.where(t == 0.0, 1.0, t))
    kernel = kernel * window * (base_freq / orig)
    return kernel.astype(np.float32)[:, None, :], width, orig, new


def resample(x: jnp.ndarray, orig_freq: int, new_freq: int) -> jnp.ndarray:
    """Resample a 1-D waveform; matches torchaudio.transforms.Resample defaults."""
    if orig_freq == new_freq:
        return x
    kernel, width, orig, new = _resample_kernel(orig_freq, new_freq)
    length = x.shape[-1]
    xp = jnp.pad(x.reshape(1, 1, -1), ((0, 0), (0, 0), (width, width + orig)))
    y = jax.lax.conv_general_dilated(
        xp, jnp.asarray(kernel), window_strides=(orig,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # (1, new, T//orig ceil-ish)
    y = y[0].T.reshape(-1)  # interleave polyphase outputs
    target_len = int(math.ceil(new * length / orig))
    return y[:target_len]


# ---------------------------------------------------------------------------
# STFT / mel / MFCC
# ---------------------------------------------------------------------------

@lru_cache(maxsize=8)
def _hann_window(win_length: int) -> np.ndarray:
    # periodic Hann, as torch.hann_window default
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * math.pi * n / win_length))).astype(np.float32)


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + f / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


@lru_cache(maxsize=8)
def mel_filterbank(sr: int, n_fft: int = N_FFT, n_mels: int = N_MELS,
                   f_min: float = 0.0, f_max: float | None = None) -> np.ndarray:
    """HTK-scale triangular mel filterbank, (n_freqs, n_mels), norm=None."""
    f_max = f_max if f_max is not None else sr / 2.0
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0.0, sr / 2.0, n_freqs)
    m_pts = np.linspace(_hz_to_mel_htk(f_min), _hz_to_mel_htk(f_max), n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]          # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


@lru_cache(maxsize=4)
def dct_matrix(n_mfcc: int = N_MFCC, n_mels: int = N_MELS) -> np.ndarray:
    """Orthonormal DCT-II matrix (n_mels, n_mfcc), as torchaudio create_dct."""
    n = np.arange(n_mels, dtype=np.float64)
    k = np.arange(n_mfcc, dtype=np.float64)[None, :]
    dct = np.cos(math.pi / n_mels * (n[:, None] + 0.5) * k) * math.sqrt(2.0 / n_mels)
    dct[:, 0] *= 1.0 / math.sqrt(2.0)
    return dct.astype(np.float32)


def frame_signal(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Center-pad (reflect) and frame: (T,) -> (num_frames, n_fft).

    Implemented with reshape + shifted slices instead of an index gather:
    the signal is cut into hop-sized blocks and each frame is the
    concatenation of the blocks covering its window.  Bitwise-identical to
    the gather formulation, but pure layout ops — on TPU the (300, 2048)
    gather for a 10 s clip cost ~4.9 ms (it dominated the whole inference
    pipeline); this runs in ~0.2 ms.
    """
    pad = n_fft // 2
    xp = jnp.pad(x, (pad, pad), mode="reflect")
    num_frames = 1 + (xp.shape[-1] - n_fft) // hop
    rows = n_fft // hop + 2                  # hop-blocks spanning one frame
    nblocks = num_frames + rows - 1
    need = nblocks * hop
    xb = jnp.pad(xp, (0, max(0, need - xp.shape[-1])))[:need]
    blocks = xb.reshape(nblocks, hop)
    wide = jnp.concatenate([blocks[i:i + num_frames] for i in range(rows)],
                           axis=1)           # (num_frames, rows*hop)
    return wide[:, :n_fft]


def _dft_power(frames: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """|rfft(frames)|^2 as ONE real matmul on the MXU.

    Alternative to jnp.fft.rfft kept for backends/shapes where the XLA FFT
    underperforms.  On v5e with the 10 s clip shape (300, 2048) the rfft
    itself is fast (~0.5 ms; the old framing *gather* was the real
    bottleneck — see `frame_signal`), and slightly beats this matmul
    (~0.8 ms with HIGHEST precision), so the default stays 'fft'.

    The twiddle matrix is built ON DEVICE (no multi-MB HLO constant, which
    would also hit the remote-compile upload limit): exponents n*k are
    reduced mod n_fft in exact int32 before the cos/sin, so fp32 angle
    error stays ~1e-7 instead of growing with n*k (~4e-4 at k*n ~ 2e6).
    """
    nf = n_fft // 2 + 1
    n = jnp.arange(n_fft, dtype=jnp.int32)
    k = jnp.arange(nf, dtype=jnp.int32)
    m = (n[:, None] * k[None, :]) % n_fft
    ang = (2.0 * jnp.pi / n_fft) * m.astype(jnp.float32)
    w = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=1)  # (n_fft, 2nf)
    z = jax.lax.dot_general(frames, w, (((1,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST)
    return z[:, :nf] ** 2 + z[:, nf:] ** 2


def power_spectrogram(x: jnp.ndarray, n_fft: int = N_FFT, hop: int = 734,
                      method: str = "auto") -> jnp.ndarray:
    """(T,) -> (num_frames, n_fft//2+1) power spectrogram (hann, center,
    reflect).

    method: 'fft' (jnp.fft.rfft; fastest measured on both CPU and TPU once
    framing is gather-free) or 'dft_matmul' (MXU real-DFT matmul; see
    `_dft_power`).  'auto' == 'fft'.
    """
    if method == "auto":
        method = "fft"
    frames = frame_signal(x, n_fft, hop)
    frames = frames * jnp.asarray(_hann_window(n_fft))
    if method == "dft_matmul":
        return _dft_power(frames, n_fft)
    spec = jnp.fft.rfft(frames, axis=-1)
    return (spec.real ** 2 + spec.imag ** 2)


def amplitude_to_db(power: jnp.ndarray, top_db: float = TOP_DB) -> jnp.ndarray:
    """10*log10(clamp(x)) with global top_db floor (torchaudio semantics)."""
    x_db = 10.0 * jnp.log10(jnp.maximum(power, AMIN))
    return jnp.maximum(x_db, jnp.max(x_db) - top_db)


def mfcc(x: jnp.ndarray, sr: int, fps: int = 30,
         n_mfcc: int = N_MFCC, n_mels: int = N_MELS, n_fft: int = N_FFT) -> jnp.ndarray:
    """Waveform -> MFCC (num_frames, n_mfcc), matching the reference transform.

    Reference hop choice (utils.py:157-160): 734 @30fps, 1467 @15fps
    (tuned for its 22 kHz default sample rate).
    """
    if fps == 30:
        hop = 734
    elif fps == 15:
        hop = 1467
    else:
        hop = int(round(sr / fps))
    power = power_spectrogram(x, n_fft, hop)                     # (F, n_freq)
    mel = power @ jnp.asarray(mel_filterbank(sr, n_fft, n_mels))  # (F, n_mels)
    mel_db = amplitude_to_db(mel)
    return mel_db @ jnp.asarray(dct_matrix(n_mfcc, n_mels))       # (F, n_mfcc)


# ---------------------------------------------------------------------------
# Reference-equivalent feature entry points
# ---------------------------------------------------------------------------

def get_mfcc(audio_fn: str, sr: int = 22000, fps: int = 30) -> np.ndarray:
    """wav path -> (T_frames, 64) float32; == get_mfcc_ta(type='mfcc')."""
    x, sr0 = load_wav(audio_fn)
    x = resample(jnp.asarray(x), sr0, sr) if sr0 != sr else jnp.asarray(x)
    return np.asarray(mfcc(x, sr, fps=fps))


def get_mfcc_sepa(audio_fn: str, sr: int = 16000, fps: int = 30):
    """Two-segment MFCC for continuity tests (utils.py:234-263).

    Splits the waveform at 2 s and computes MFCC per segment.
    Returns (features (T0+T1, 64), gap=T0).
    """
    x, sr0 = load_wav(audio_fn)
    x = resample(jnp.asarray(x), sr0, sr) if sr0 != sr else jnp.asarray(x)
    a = mfcc(x[: sr * 2], sr, fps=fps)
    b = mfcc(x[sr * 2:], sr, fps=fps)
    return np.concatenate([np.asarray(a), np.asarray(b)], axis=0), a.shape[0]


def get_raw_16k(audio_fn: str) -> np.ndarray:
    """wav path -> raw 16 kHz waveform (T, 1); the 'faceformer' feature
    (utils.py:196-198)."""
    x, sr0 = load_wav(audio_fn)
    if sr0 != 16000:
        x = np.asarray(resample(jnp.asarray(x), sr0, 16000))
    return x.reshape(-1, 1)


def onset_times(audio_fn: str, sr: int = 16000) -> np.ndarray:
    """Spectral-flux onset detection (librosa.onset.onset_detect equivalent,
    units='time'); used for the beat-consistency metric (utils.py:202).

    Pipeline: mel spectrogram (librosa defaults: n_fft 2048, hop 512,
    128 mels, slaney scale) -> log -> positive first-order difference
    averaged over bands (spectral flux) -> peak picking with librosa's
    default windows.
    """
    x, sr0 = load_wav(audio_fn)
    if sr0 != sr:
        x = np.asarray(resample(jnp.asarray(x), sr0, sr))
    hop = 512
    power = np.asarray(power_spectrogram(jnp.asarray(x), 2048, hop))
    fb = _slaney_mel_fb(sr, 2048, 128)
    mel = power @ fb
    S = 10.0 * np.log10(np.maximum(mel, 1e-10))
    S = np.maximum(S, S.max() - 80.0)
    flux = np.maximum(0.0, S[1:] - S[:-1]).mean(axis=1)
    env = np.concatenate([[0.0], flux])
    peaks = _peak_pick(env, sr=sr, hop=hop)
    return peaks * hop / sr


@lru_cache(maxsize=4)
def _slaney_mel_fb(sr: int, n_fft: int, n_mels: int) -> np.ndarray:
    """Slaney-scale, area-normalised mel filterbank (librosa default)."""
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0.0, sr / 2.0, n_freqs)

    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        mel = 3.0 * f / 200.0
        log_region = f >= 1000.0
        mel = np.where(log_region, 15.0 + np.log(np.maximum(f, 1e-12) / 1000.0) / (np.log(6.4) / 27.0), mel)
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        f = 200.0 * m / 3.0
        log_region = m >= 15.0
        f = np.where(log_region, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)), f)
        return f

    m_pts = np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2.0), n_mels + 2)
    f_pts = mel_to_hz(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    enorm = 2.0 / (f_pts[2: n_mels + 2] - f_pts[:n_mels])
    return (fb * enorm[None, :]).astype(np.float32)


def _peak_pick(env: np.ndarray, sr: int, hop: int) -> np.ndarray:
    """librosa.util.peak_pick with onset_detect's default parameters."""
    # defaults (librosa.onset.onset_detect): pre_max=0.03*sr//hop, post_max=
    # 0.00*sr//hop+1, pre_avg=0.10*sr//hop, post_avg=0.10*sr//hop+1,
    # wait=0.03*sr//hop, delta=0.07
    pre_max = int(0.03 * sr // hop)
    post_max = int(0.00 * sr // hop) + 1
    pre_avg = int(0.10 * sr // hop)
    post_avg = int(0.10 * sr // hop) + 1
    wait = int(0.03 * sr // hop)
    delta = 0.07
    n = len(env)
    peaks = []
    last = -1 - wait
    for i in range(n):
        lo_m, hi_m = max(0, i - pre_max), min(n, i + post_max)
        if env[i] != env[lo_m:hi_m].max():
            continue
        lo_a, hi_a = max(0, i - pre_avg), min(n, i + post_avg)
        if env[i] < env[lo_a:hi_a].mean() + delta:
            continue
        if i - last <= wait:
            continue
        last = i
        peaks.append(i)
    return np.asarray(peaks, dtype=np.int64)


# ---------------------------------------------------------------------------
# Additional feature types of the reference frontend
# ---------------------------------------------------------------------------

def mel_spectrogram(x: jnp.ndarray, sr: int, hop: int, n_fft: int = N_FFT,
                    n_mels: int = N_MELS) -> jnp.ndarray:
    """Raw power mel spectrogram (num_frames, n_mels); the reference's
    type='mel' feature (utils.py:179-184, no log compression)."""
    power = power_spectrogram(x, n_fft, hop)
    return power @ jnp.asarray(mel_filterbank(sr, n_fft, n_mels))


def get_mel(audio_fn: str, sr: int = 22000, fps: int = 30) -> np.ndarray:
    x, sr0 = load_wav(audio_fn)
    x = resample(jnp.asarray(x), sr0, sr) if sr0 != sr else jnp.asarray(x)
    hop = 734 if fps == 30 else 1467
    return np.asarray(mel_spectrogram(x, sr, hop))


def audio_chunking(x: jnp.ndarray, frame_rate: int = 30,
                   chunk_size: int = 16000) -> jnp.ndarray:
    """Slice one chunk of audio per video frame, centered on the frame
    (utils.py:133-145; the meshtalk frontend)."""
    samples_per_frame = chunk_size // frame_rate
    padding = (chunk_size - samples_per_frame) // 2
    xp = jnp.pad(x, (padding, padding))
    anchors = np.arange(chunk_size // 2, xp.shape[-1] - chunk_size // 2,
                        samples_per_frame)
    idx = anchors[:, None] + np.arange(-chunk_size // 2, chunk_size // 2)[None]
    return xp[jnp.asarray(idx)]


def get_mel_chunked(audio_fn: str, sr: int = 16000, fps: int = 30) -> np.ndarray:
    """type='mel_mul' (utils.py:185-192): loudness-normalize, chunk one
    second per frame, log-mel per chunk."""
    x, sr0 = load_wav(audio_fn)
    x = resample(jnp.asarray(x), sr0, sr) if sr0 != sr else jnp.asarray(x)
    x = 0.01 * x / jnp.mean(jnp.abs(x))
    chunks = audio_chunking(x, frame_rate=fps, chunk_size=sr)
    hop = sr // 100
    win = sr // 20

    def one(chunk):
        frames = frame_signal(chunk, 2048, hop)
        w = np.zeros(2048, np.float32)
        w[(2048 - win) // 2:(2048 - win) // 2 + win] = _hann_window(win)
        spec = jnp.fft.rfft(frames * jnp.asarray(w), axis=-1)
        power = spec.real ** 2 + spec.imag ** 2
        mel = power @ jnp.asarray(mel_filterbank(sr, 2048, N_MELS))
        return jnp.log(jnp.clip(mel, 1e-10, None))

    return np.asarray(jax.vmap(one)(chunks))


def mfcc_psf(x: np.ndarray, sr: int = 16000, n_mfcc: int = 64,
             winstep: float = 1.01 / 15, winlen: float = 0.025,
             n_fft: int = 2048, preemph: float = 0.97) -> np.ndarray:
    """python_speech_features-style MFCC (utils.py:86-107): preemphasis,
    25 ms frames at `winstep`, rectangular window, slaney-less HTK mels with
    nfilt=numcep, log, DCT-II ortho with ceplifter=22, c0 replaced by log
    frame energy (appendEnergy)."""
    x = np.asarray(x, np.float64)
    x = np.append(x[0], x[1:] - preemph * x[:-1])
    frame_len = int(round(winlen * sr))
    step = int(round(winstep * sr))
    num_frames = 1 + max(0, int(np.ceil((len(x) - frame_len) / step)))
    pad_len = (num_frames - 1) * step + frame_len
    x = np.pad(x, (0, max(0, pad_len - len(x))))
    idx = np.arange(frame_len)[None] + step * np.arange(num_frames)[:, None]
    frames = x[idx]
    energy = np.sum(frames ** 2, axis=1)
    energy = np.where(energy == 0, np.finfo(np.float64).eps, energy)
    spec = np.abs(np.fft.rfft(frames, n_fft, axis=1)) ** 2 / n_fft
    fb = np.asarray(mel_filterbank(sr, n_fft, n_mfcc), np.float64)
    feat = spec @ fb
    feat = np.where(feat == 0, np.finfo(np.float64).eps, feat)
    feat = np.log(feat)
    d = np.asarray(dct_matrix(n_mfcc, n_mfcc), np.float64)
    ceps = feat @ d
    # ceplifter
    L = 22
    n = np.arange(n_mfcc)
    lift = 1 + (L / 2.0) * np.sin(np.pi * n / L)
    ceps = ceps * lift
    ceps[:, 0] = np.log(energy)
    return ceps.astype(np.float32)


def get_mfcc_psf(audio_fn: str, sr: int = 16000, smlpx: bool = True,
                 fps: int = 25) -> np.ndarray:
    x, sr0 = load_wav(audio_fn)
    if sr0 != sr:
        x = np.asarray(resample(jnp.asarray(x), sr0, sr))
    winstep = 1.01 / 15 if smlpx else 0.04
    return mfcc_psf(x, sr=sr, winstep=winstep)


def smooth_geom(geom: jnp.ndarray, mask: jnp.ndarray | None = None,
                filter_size: int = 9, sigma: float = 2.0) -> jnp.ndarray:
    """Gaussian temporal smoothing of vertex geometry (T, V, 3), optionally
    blended through a per-vertex mask (utils.py:272-298)."""
    assert filter_size % 2 == 1
    r = filter_size // 2
    k = np.exp(-0.5 * np.arange(-r, r + 1) ** 2 / sigma ** 2)
    k = jnp.asarray((k / k.sum()).astype(np.float32))
    gp = jnp.pad(geom, ((r, r), (0, 0), (0, 0)), mode="edge")
    idx = jnp.arange(geom.shape[0])[:, None] + jnp.arange(filter_size)[None]
    smoothed = jnp.einsum("tkvc,k->tvc", gp[idx], k)
    if mask is None:
        return smoothed
    m = mask[None, :, None]
    return smoothed * m + geom * (1 - m)
