"""Host-side visualisation (optional extra; kept off the TPU path).

Equivalent of the reference RenderTool (visualise/rendering.py:94-243),
which uses pyrender/OpenGL + ffmpeg.  This implementation renders SMPL-X
vertices (computed with ops/smplx_lbs on device) as an orthographic point
cloud per frame with OpenCV, supporting side-by-side grids for multiple
samples, and writes an .mp4 with cv2.VideoWriter (audio is saved alongside
when no ffmpeg binary is available to mux).

Requires the licensed SMPLX_NEUTRAL_2020.npz (pass `smplx_npz`).
"""
from __future__ import annotations

import os
import shutil
import subprocess

import numpy as np


def _project_ortho(verts: np.ndarray, size: int) -> np.ndarray:
    """(V, 3) -> pixel coords (V, 2), y-up orthographic, like the
    reference's ortho camera (voca/rendering.py scene setup)."""
    v = verts - verts.mean(0)
    scale = (size * 0.45) / max(np.abs(v[:, :2]).max(), 1e-6)
    x = (v[:, 0] * scale + size / 2).astype(np.int32)
    y = (size / 2 - v[:, 1] * scale).astype(np.int32)
    return np.stack([x, y], 1)


def render_motion_video(motion: np.ndarray, audio_file: str, out_path: str,
                        smplx_npz: str | None = None, fps: int = 30,
                        size: int = 512, betas: np.ndarray | None = None):
    """motion: (S, T, 265) SMPL-X params -> grid video at `out_path`."""
    import cv2
    import jax.numpy as jnp

    from talkshow_tpu.ops import smplx_lbs

    if smplx_npz is None or not os.path.isfile(smplx_npz):
        raise FileNotFoundError(
            "rendering needs the SMPL-X model npz (SMPLX_NEUTRAL_2020.npz); "
            "pass smplx_npz=... — it is licensed and not bundled")
    model = smplx_lbs.load_smplx_npz(smplx_npz)
    if betas is None:
        betas = np.zeros(model.num_betas, np.float32)

    S, T, _ = motion.shape
    cols = min(S, 4)
    rows = -(-S // cols)
    writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                             (size * cols, size * rows))
    verts_all = []
    for s in range(S):
        v, _ = smplx_lbs.smplx_forward_talkshow(
            model, jnp.asarray(betas), jnp.asarray(motion[s]))
        verts_all.append(np.asarray(v))

    for t in range(T):
        canvas = np.full((size * rows, size * cols, 3), 255, np.uint8)
        for s in range(S):
            r, c = divmod(s, cols)
            pts = _project_ortho(verts_all[s][t], size)
            sub = canvas[r * size:(r + 1) * size, c * size:(c + 1) * size]
            valid = ((pts[:, 0] >= 0) & (pts[:, 0] < size)
                     & (pts[:, 1] >= 0) & (pts[:, 1] < size))
            sub[pts[valid, 1], pts[valid, 0]] = (80, 80, 80)
        writer.write(canvas)
    writer.release()

    if shutil.which("ffmpeg"):
        muxed = out_path.replace(".mp4", "_audio.mp4")
        subprocess.run(["ffmpeg", "-y", "-i", out_path, "-i", audio_file,
                        "-c:v", "copy", "-c:a", "aac", muxed], check=False)
    return out_path
