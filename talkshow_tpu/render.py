"""Host-side mesh visualisation (kept off the TPU compute path).

Equivalent of the reference RenderTool (visualise/rendering.py:94-243 +
voca/rendering.py:41-177), which renders lit SMPL-X meshes with pyrender/
OpenGL.  This implementation rasterizes the same scenes in software — the
C++/OpenMP rasterizer in native/talkshow_native.cpp (ts_rasterize), with a
pure-numpy fallback — reproducing the reference setup:

* vertices y/z-flipped before rendering (rendering.py:136-139);
* 800x800 orthographic tiles, camera at (0, 0.7, 1), xmag 0.5,
  ymag = xmag * z_offset; `whole_body` mode switches to 800x1440 tiles and
  z_offset 1.8, `face` mode to xmag 0.15 and camera y=1
  (rendering.py:143-163, voca/rendering.py:42-119, scripts/demo.py:247);
* grid layouts keyed on the number of sequences:
  1/2/3 side-by-side, 9 -> 3x3, 12 -> 4x3, 16 -> 4x4, 18 -> 6x3
  (rendering.py:208-232).  Extension: the reference only ever combines
  `whole_body` with a single 800x1440 canvas (rendering.py:158-161 has
  no multi-video whole-body path); here the 800x1440 tile applies to
  any grid size, so multi-sample whole-body renders are a superset of
  what the reference can produce (cosmetic only);
* GT side-by-side (pass `gt_motion`; 2-video labels GT/result like
  rendering.py get_sen:31-64);
* smooth vertex-normal shading of base color (0.3, 0.5, 0.55) with a
  point-light rig + 0.2 ambient on a white background, two-sided
  (SKIP_CULL_FACES), approximating the pyrender material
  (voca/rendering.py:85-152);
* ffmpeg audio mux when the binary exists (rendering.py:236-241); the raw
  video plus the wav are kept otherwise.

Requires the licensed SMPLX_NEUTRAL_2020.npz (pass `smplx_npz`).
"""
from __future__ import annotations

import os
import shutil
import subprocess

import numpy as np

#: (cols, rows) per sequence count, reference rendering.py:143-163,208-232
GRID_LAYOUTS = {1: (1, 1), 2: (2, 1), 3: (3, 1), 9: (3, 3), 12: (4, 3),
                16: (4, 4), 18: (6, 3)}

#: point-light rig: rows [x, y, z, intensity] (voca/rendering.py:134-152,
#: folded to lambert point lights; spots approximated as points)
LIGHT_RIG = np.array([
    [0.0, -1.0, 1.0, 0.6],
    [0.0, 1.0, 1.0, 0.6],
    [-1.0, 1.0, 2.0, 0.6],
    [-1.0, 2.0, 2.0, 2.0],
    [1.0, 2.0, 2.0, 2.0],
], np.float32)
AMBIENT = 0.2
BASE_COLOR = np.array([0.3, 0.5, 0.55], np.float32)


def camera_for_mode(mode: str):
    """-> (tile_w, tile_h, xmag, ymag, cam_y, cam_z) per reference modes."""
    if mode == "whole_body":           # rendering.py:158-161
        z_off = 1.8
        return 800, 1440, 0.5, 0.5 * z_off, 0.7, 1.0
    if mode == "face":                 # rendering.py:196-198
        return 800, 800, 0.15, 0.15, 1.0, 1.0
    return 800, 800, 0.5, 0.5, 0.7, 1.0


def _rasterize_numpy(verts, faces, xmag, ymag, cam_y, cam_z, lights, ambient,
                     base_color, width, height):
    """Pure-numpy fallback mirroring native ts_rasterize (slow; tests and
    environments without a compiler)."""
    V = len(verts)
    vn = np.zeros((V, 3), np.float32)
    tri = verts[faces]                                     # (F, 3, 3)
    fn = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    for k in range(3):
        np.add.at(vn, faces[:, k], fn)
    vn /= np.linalg.norm(vn, axis=1, keepdims=True) + 1e-12

    shade = np.full(V, ambient, np.float32)
    for lx, ly, lz, inten in lights:
        d = np.array([lx, ly, lz], np.float32) - verts
        d2 = (d * d).sum(1) + 1e-9
        ndotl = np.abs((vn * d).sum(1)) / np.sqrt(d2)
        shade += inten * ndotl / np.maximum(d2, 1.0)
    shade = np.minimum(shade, 1.0)

    px = (verts[:, 0] / xmag * 0.5 + 0.5) * width
    py = (0.5 - (verts[:, 1] - cam_y) / ymag * 0.5) * height
    pz = cam_z - verts[:, 2]

    img = np.full((height, width, 3), 255, np.uint8)
    zbuf = np.full((height, width), np.inf, np.float32)
    for a, b, c in faces:
        ax, ay, bx, by, cx, cy = px[a], py[a], px[b], py[b], px[c], py[c]
        area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
        if abs(area) < 1e-9:
            continue
        x0 = max(0, int(np.floor(min(ax, bx, cx))))
        x1 = min(width - 1, int(np.ceil(max(ax, bx, cx))))
        y0 = max(0, int(np.floor(min(ay, by, cy))))
        y1 = min(height - 1, int(np.ceil(max(ay, by, cy))))
        if x1 < x0 or y1 < y0:
            continue
        xs, ys = np.meshgrid(np.arange(x0, x1 + 1) + 0.5,
                             np.arange(y0, y1 + 1) + 0.5)
        w0 = ((bx - xs) * (cy - ys) - (by - ys) * (cx - xs)) / area
        w1 = ((cx - xs) * (ay - ys) - (cy - ys) * (ax - xs)) / area
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        z = w0 * pz[a] + w1 * pz[b] + w2 * pz[c]
        sub_z = zbuf[y0:y1 + 1, x0:x1 + 1]
        upd = inside & (z > 0.01) & (z < sub_z)
        sub_z[upd] = z[upd]
        s = (w0 * shade[a] + w1 * shade[b] + w2 * shade[c])[upd]
        col = np.clip(s[:, None] * base_color[None], 0, 1) * 255 + 0.5
        img[y0:y1 + 1, x0:x1 + 1][upd] = col.astype(np.uint8)
    return img


def render_mesh_frame(verts: np.ndarray, faces: np.ndarray,
                      mode: str = "default") -> np.ndarray:
    """One SMPL-X frame (V, 3) -> shaded RGB uint8 tile.

    Vertices are expected in SMPL-X model space; the reference's y/z flip
    (rendering.py:136-139) is applied here.
    """
    v = np.asarray(verts, np.float32).copy()
    v[:, 1] = -v[:, 1]
    v[:, 2] = -v[:, 2]
    w, h, xmag, ymag, cam_y, cam_z = camera_for_mode(mode)
    from talkshow_tpu import native
    if native.available():
        # real rasterizer failures (bad face indices etc.) must surface,
        # not silently fall back to the ~100x slower numpy path
        return native.native_rasterize(v, np.asarray(faces, np.int32), xmag,
                                       ymag, cam_y, cam_z, LIGHT_RIG,
                                       AMBIENT, BASE_COLOR, w, h)
    return _rasterize_numpy(v, np.asarray(faces, np.int32), xmag, ymag,
                            cam_y, cam_z, LIGHT_RIG, AMBIENT, BASE_COLOR,
                            w, h)


def _labels(n: int, has_gt: bool):
    """Tile captions, reference get_sen (rendering.py:31-64)."""
    if n == 1:
        return ["GT"] if has_gt else ["result"]
    if n == 2 and has_gt:
        return ["GT", "result"]
    out = []
    for i in range(n):
        if i == 0 and has_gt:
            out.append("GT")
        else:
            out.append(f"sample{i}")
    return out


def render_motion_video(motion: np.ndarray, audio_file: str | None,
                        out_path: str, smplx_npz: str | None = None,
                        fps: int = 30, mode: str = "default",
                        gt_motion: np.ndarray | None = None,
                        betas: np.ndarray | None = None,
                        add_labels: bool = True) -> str:
    """motion: (S, T, 265) SMPL-X params -> shaded-mesh grid video.

    gt_motion: optional (T, 265) ground truth rendered side-by-side as the
    first tile (reference test mode, rendering.py:254-263).
    Mirrors RenderTool._render_sequences_helper: per-tile ortho render,
    layout by sequence count, cv2 video write, ffmpeg audio mux.
    """
    import cv2
    import jax.numpy as jnp

    from talkshow_tpu.ops import smplx_lbs

    if smplx_npz is None or not os.path.isfile(smplx_npz):
        raise FileNotFoundError(
            "rendering needs the SMPL-X model npz (SMPLX_NEUTRAL_2020.npz); "
            "pass smplx_npz=... — it is licensed and not bundled")
    model = smplx_lbs.load_smplx_npz(smplx_npz)
    if model.faces is None:
        raise ValueError("SMPL-X npz has no face ('f') array")
    faces = np.asarray(model.faces, np.int32)
    if betas is None:
        betas = np.zeros(model.num_betas, np.float32)

    motion = np.asarray(motion, np.float32)
    if gt_motion is not None:
        motion = np.concatenate([np.asarray(gt_motion, np.float32)[None],
                                 motion], axis=0)
    S, T, _ = motion.shape
    cols = (GRID_LAYOUTS[S] if S in GRID_LAYOUTS
            else (int(np.ceil(np.sqrt(S))),))[0]
    rows = -(-S // cols)
    tw, th, *_ = camera_for_mode(mode)

    verts_all = []
    for s in range(S):
        v, _ = smplx_lbs.smplx_forward_talkshow(
            model, jnp.asarray(betas), jnp.asarray(motion[s]))
        verts_all.append(np.asarray(v))
    labels = _labels(S, gt_motion is not None)

    tmp_video = out_path + ".noaudio.mp4"
    writer = cv2.VideoWriter(tmp_video, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                             (tw * cols, th * rows))
    try:
        for t in range(T):
            canvas = np.full((th * rows, tw * cols, 3), 255, np.uint8)
            for s in range(S):
                r, c = divmod(s, cols)
                tile = render_mesh_frame(verts_all[s][t], faces, mode)
                if add_labels:
                    tile = np.ascontiguousarray(tile)
                    cv2.putText(tile, labels[s], (100, 100),
                                cv2.FONT_HERSHEY_SIMPLEX, 2, (0, 0, 255), 2,
                                cv2.LINE_AA)
                # cv2 writes BGR; reference returns color[..., ::-1] too
                canvas[r * th:(r + 1) * th, c * tw:(c + 1) * tw] = \
                    tile[..., ::-1]
            writer.write(canvas)
    finally:
        writer.release()

    # mux audio like rendering.py:236-241 when ffmpeg is present
    if audio_file and shutil.which("ffmpeg"):
        cmd = ["ffmpeg", "-y", "-i", audio_file, "-i", tmp_video,
               "-c:v", "copy", "-c:a", "aac", "-shortest", out_path]
        rc = subprocess.run(cmd, capture_output=True).returncode
        if rc == 0:
            os.remove(tmp_video)
            return out_path
    os.replace(tmp_video, out_path)
    return out_path
