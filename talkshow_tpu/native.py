"""ctypes bindings for the native (C++/OpenMP) audio preprocessing library.

Auto-builds `native/libtalkshow_native.so` with make on first use (g++ is
part of the toolchain); every entry point has a pure-Python/JAX fallback in
ops/audio.py, so the package works without a compiler too.

Used by the data pipeline for clip featurization: `native_mfcc` matches
ops/audio.mfcc (same mel/DCT matrices are passed in), parity-tested in
tests/test_native.py.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")


@lru_cache(maxsize=1)
def load_library():
    """Build (if needed) and load the shared library; None on failure."""
    so = os.path.abspath(os.path.join(_NATIVE_DIR, "libtalkshow_native.so"))
    if not os.path.isfile(so):
        try:
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.ts_resample_sinc.restype = ctypes.c_int64
    lib.ts_resample_sinc.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_float, f32p, ctypes.c_int64]
    lib.ts_mfcc.restype = ctypes.c_int64
    lib.ts_mfcc.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, f32p, f32p,
        ctypes.c_int32, f32p, ctypes.c_int32, ctypes.c_float, f32p,
        ctypes.c_int64]
    lib.ts_num_threads.restype = ctypes.c_int32
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.ts_rasterize.restype = ctypes.c_int32
    lib.ts_rasterize.argtypes = [
        f32p, ctypes.c_int64, i32p, ctypes.c_int64,     # verts, faces
        ctypes.c_float, ctypes.c_float,                 # xmag, ymag
        ctypes.c_float, ctypes.c_float,                 # cam_y, cam_z
        f32p, ctypes.c_int32, ctypes.c_float,           # lights, n, ambient
        f32p, ctypes.c_int32, ctypes.c_int32, u8p]      # color, w, h, out
    return lib


def available() -> bool:
    return load_library() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def native_resample(x: np.ndarray, orig: int, new: int) -> np.ndarray:
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    x = np.ascontiguousarray(x, np.float32)
    cap = int(np.ceil(new * len(x) / orig)) + 8
    out = np.empty(cap, np.float32)
    n = lib.ts_resample_sinc(_ptr(x), len(x), orig, new, 6, 0.99, _ptr(out), cap)
    return out[:n]


def native_mfcc(x: np.ndarray, sr: int, fps: int = 30,
                n_mfcc: int = 64, n_mels: int = 256,
                n_fft: int = 2048) -> np.ndarray:
    """Threaded MFCC identical to ops/audio.mfcc (same constant matrices)."""
    from talkshow_tpu.ops.audio import _hann_window, dct_matrix, mel_filterbank

    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    hop = 734 if fps == 30 else 1467 if fps == 15 else int(round(sr / fps))
    x = np.ascontiguousarray(x, np.float32)
    window = np.ascontiguousarray(_hann_window(n_fft), np.float32)
    fb = np.ascontiguousarray(mel_filterbank(sr, n_fft, n_mels), np.float32)
    dct = np.ascontiguousarray(dct_matrix(n_mfcc, n_mels), np.float32)
    num_frames = 1 + (len(x) + 2 * (n_fft // 2) - n_fft) // hop
    out = np.empty((num_frames, n_mfcc), np.float32)
    got = lib.ts_mfcc(_ptr(x), len(x), n_fft, hop, _ptr(window), _ptr(fb),
                      n_mels, _ptr(dct), n_mfcc, 80.0, _ptr(out), num_frames)
    if got < 0:
        raise RuntimeError("ts_mfcc capacity error")
    return out[:got]


def native_rasterize(verts: np.ndarray, faces: np.ndarray, xmag: float,
                     ymag: float, cam_y: float, cam_z: float,
                     lights: np.ndarray, ambient: float,
                     base_color: np.ndarray, width: int,
                     height: int) -> np.ndarray:
    """Z-buffered lambert rasterization -> (height, width, 3) uint8 RGB."""
    import ctypes as ct

    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    lights = np.ascontiguousarray(lights, np.float32)
    base_color = np.ascontiguousarray(base_color, np.float32)
    out = np.empty((height, width, 3), np.uint8)
    rc = lib.ts_rasterize(
        _ptr(verts), len(verts), faces.ctypes.data_as(ct.POINTER(ct.c_int32)),
        len(faces), xmag, ymag, cam_y, cam_z, _ptr(lights), len(lights),
        ambient, _ptr(base_color), width, height,
        out.ctypes.data_as(ct.POINTER(ct.c_uint8)))
    if rc != 0:
        raise RuntimeError(f"ts_rasterize failed rc={rc}")
    return out


def get_mfcc_native(audio_fn: str, sr: int = 22000, fps: int = 30) -> np.ndarray:
    """Native end-to-end wav -> MFCC; drop-in for ops/audio.get_mfcc."""
    from talkshow_tpu.ops.audio import load_wav

    x, sr0 = load_wav(audio_fn)
    if sr0 != sr:
        x = native_resample(x, sr0, sr)
    return native_mfcc(x, sr, fps)
