import os

import numpy as np

from cfnerf_tpu.utils.pointcloud import (
    depth_uncertainty_pointcloud,
    read_pointcloud,
    write_pointcloud,
)
from cfnerf_tpu.utils.visualization import (
    save_sparsification_figure,
    save_uncertainty_figure,
)


def test_ply_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    xyz = rng.randn(100, 3).astype(np.float32)
    rgb = (rng.rand(100, 3) * 255).astype(np.uint8)
    path = str(tmp_path / "cloud.ply")
    write_pointcloud(path, xyz, rgb)
    xyz2, rgb2 = read_pointcloud(path)
    np.testing.assert_allclose(xyz2, xyz, rtol=1e-6)
    np.testing.assert_array_equal(rgb2, rgb)


def test_ply_header(tmp_path):
    path = str(tmp_path / "c.ply")
    write_pointcloud(path, np.zeros((3, 3), np.float32))
    head = open(path, "rb").read(200)
    assert head.startswith(b"ply\nformat binary_little_endian 1.0\nelement vertex 3\n")


def test_depth_uncertainty_pointcloud(tmp_path):
    H, W = 8, 8
    depth = np.full((H, W), 2.0, np.float32)
    unc = np.random.RandomState(1).rand(H, W).astype(np.float32)
    c2w = np.eye(4, dtype=np.float32)[:3]
    path = str(tmp_path / "unc.ply")
    depth_uncertainty_pointcloud(path, depth, unc, c2w, focal=10.0)
    xyz, rgb = read_pointcloud(path)
    assert xyz.shape == (64, 3)
    # camera at origin looking down -z, depth 2 => all z = -2
    np.testing.assert_allclose(xyz[:, 2], -2.0, atol=1e-5)


def test_uncertainty_figure(tmp_path):
    rng = np.random.RandomState(2)
    p = str(tmp_path / "fig.png")
    save_uncertainty_figure(
        p, gt=rng.rand(8, 8, 3), rgb_mean=rng.rand(8, 8, 3),
        rgb_std=rng.rand(8, 8, 3), disp=rng.rand(8, 8),
    )
    assert os.path.getsize(p) > 1000


def test_sparsification_figure(tmp_path):
    p = str(tmp_path / "ause.png")
    oracle = np.linspace(1.0, 0.1, 100)
    by_var = oracle + 0.05
    save_sparsification_figure(p, oracle, by_var)
    assert os.path.getsize(p) > 1000


def test_save_video_produces_readable_mp4(tmp_path):
    # VERDICT r02 task 7: the reference's video deliverable
    # (run_nerf_uncertainty_NF.py:1102-1109) must actually produce an mp4
    # in this environment (no ffmpeg binary -> OpenCV mp4v encoder).
    from cfnerf_tpu.train.loop import _save_video

    rng = np.random.RandomState(3)
    frames = rng.rand(6, 32, 48, 3).astype(np.float32)
    path = str(tmp_path / "video.mp4")
    _save_video(frames, path, fps=12)
    assert os.path.exists(path) and os.path.getsize(path) > 500
    import cv2

    cap = cv2.VideoCapture(path)
    ok, frame = cap.read()
    cap.release()
    assert ok and frame.shape == (32, 48, 3)

    # grayscale stack (the disp video path)
    path2 = str(tmp_path / "disp.mp4")
    _save_video(rng.rand(4, 32, 48).astype(np.float32), path2, fps=12)
    assert os.path.getsize(path2) > 500
