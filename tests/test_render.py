"""Software mesh rasterizer: shading, native/numpy parity, layouts.

Mirrors the reference renderer's geometry (visualise/rendering.py,
voca/rendering.py): orthographic tiles, y/z flip, grid layouts, captions.
"""
import numpy as np
import pytest

from talkshow_tpu.render import (AMBIENT, BASE_COLOR, GRID_LAYOUTS,
                                 LIGHT_RIG, _labels, _rasterize_numpy,
                                 camera_for_mode, render_mesh_frame)


def _sphere_mesh(n_lat=16, n_lon=24, radius=0.3, center=(0.0, 0.7, 0.0)):
    """UV sphere roughly filling the default camera's view."""
    verts, faces = [], []
    for i in range(n_lat + 1):
        th = np.pi * i / n_lat
        for j in range(n_lon):
            ph = 2 * np.pi * j / n_lon
            verts.append([radius * np.sin(th) * np.cos(ph) + center[0],
                          radius * np.cos(th) + center[1],
                          radius * np.sin(th) * np.sin(ph) + center[2]])
    for i in range(n_lat):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            d = (i + 1) * n_lon + (j + 1) % n_lon
            faces.append([a, b, c])
            faces.append([b, d, c])
    return (np.asarray(verts, np.float32),
            np.asarray(faces, np.int32))


def test_shaded_sphere_nontrivial():
    """A lit sphere must produce spatially-varying, non-background shading."""
    verts, faces = _sphere_mesh()
    # render_mesh_frame applies the reference y/z flip; pre-flip so the
    # sphere lands where we put it
    v = verts.copy()
    v[:, 1] = -v[:, 1]
    v[:, 2] = -v[:, 2]
    img = render_mesh_frame(v, faces)
    assert img.shape == (800, 800, 3) and img.dtype == np.uint8
    interior = img[300:500, 300:500]
    assert (interior < 250).any(), "sphere must cover the image center"
    covered = img[(img < 250).any(-1)]
    assert covered.std(axis=0).mean() > 3.0, "shading must vary (lambert)"
    # base color ordering preserved: B channel brightest, R darkest
    mean = covered.mean(axis=0)
    assert mean[2] > mean[1] > mean[0]


def test_native_and_numpy_rasterizers_agree():
    from talkshow_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    verts, faces = _sphere_mesh(n_lat=8, n_lon=12)
    v = verts.copy()
    v[:, 1] = -v[:, 1]
    args = (faces, 0.5, 0.5, 0.7, 1.0, LIGHT_RIG, AMBIENT, BASE_COLOR,
            160, 160)
    a = native.native_rasterize(v, *args)
    b = _rasterize_numpy(v, *args)
    # identical geometry; allow few-pixel differences on triangle edges
    frac_equal = (np.abs(a.astype(int) - b.astype(int)) <= 2).mean()
    assert frac_equal > 0.995


def test_camera_modes():
    assert camera_for_mode("default") == (800, 800, 0.5, 0.5, 0.7, 1.0)
    assert camera_for_mode("whole_body") == (800, 1440, 0.5, 0.9, 0.7, 1.0)
    assert camera_for_mode("face") == (800, 800, 0.15, 0.15, 1.0, 1.0)


def test_grid_layouts_match_reference():
    # rendering.py:143-163: width x height per count, 800px tiles
    expected_px = {1: (800, 800), 2: (1600, 800), 3: (2400, 800),
                   9: (2400, 2400), 12: (3200, 2400), 16: (3200, 3200),
                   18: (4800, 2400)}
    for n, (cols, rows) in GRID_LAYOUTS.items():
        assert expected_px[n] == (800 * cols, 800 * rows)


def test_labels_gt_side_by_side():
    assert _labels(2, has_gt=True) == ["GT", "result"]
    assert _labels(1, has_gt=True) == ["GT"]
    assert _labels(3, has_gt=False) == ["sample0", "sample1", "sample2"]


def test_video_with_gt_side_by_side(tmp_path):
    """2-tile (GT | result) grid video end-to-end with a synthetic npz."""
    rng = np.random.default_rng(0)
    V, J = 120, 55
    npz = str(tmp_path / "model.npz")
    kintree = np.stack([np.concatenate([[0], np.arange(J - 1)]),
                        np.arange(J)])
    np.savez(
        npz,
        v_template=rng.standard_normal((V, 3)).astype(np.float32) * 0.1,
        shapedirs=rng.standard_normal((V, 3, 400)).astype(np.float32) * 0.01,
        posedirs=rng.standard_normal(
            (V, 3, (J - 1) * 9)).astype(np.float32) * 0.001,
        J_regressor=np.abs(rng.standard_normal((J, V)).astype(np.float32)) / V,
        kintree_table=kintree,
        weights=np.abs(rng.standard_normal((V, J)).astype(np.float32)),
        hands_meanl=np.zeros(45, np.float32),
        hands_meanr=np.zeros(45, np.float32),
        f=rng.integers(0, V, (200, 3)).astype(np.int32),
    )
    from talkshow_tpu.render import render_motion_video
    motion = rng.standard_normal((1, 4, 265)).astype(np.float32) * 0.1
    gt = rng.standard_normal((4, 265)).astype(np.float32) * 0.1
    out = str(tmp_path / "sbs.mp4")
    import os
    render_motion_video(motion, None, out, smplx_npz=npz, fps=30,
                        gt_motion=gt, mode="whole_body")
    assert os.path.isfile(out) and os.path.getsize(out) > 0
