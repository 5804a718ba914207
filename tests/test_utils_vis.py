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
