import numpy as np
import pytest

from tests.datagen import make_blender_dataset, make_llff_dataset

from cfnerf_tpu.data.blender import load_blender_data, pose_spherical
from cfnerf_tpu.data.llff import load_llff_data, _minify
from cfnerf_tpu.data.sampler import (
    DepthRayBatcher,
    RayBatcher,
    lf_scene_splits,
    precompute_depth_rays,
    precompute_rays,
)


def test_blender_loader(tmp_path):
    root = make_blender_dataset(str(tmp_path / "lego"), H=16, W=16)
    imgs, poses, render_poses, hwf, i_split = load_blender_data(root, testskip=1)
    assert imgs.shape == (7, 16, 16, 4)  # RGBA kept
    assert poses.shape == (7, 4, 4)
    assert render_poses.shape[0] == 50 + 40 + 30 + 30 + 20 + 10  # six-ring
    H, W, focal = hwf
    assert (H, W) == (16, 16)
    np.testing.assert_allclose(focal, 0.5 * 16 / np.tan(0.5 * 0.6911112070083618), rtol=1e-6)
    assert [len(s) for s in i_split] == [3, 2, 2]


def test_blender_half_res(tmp_path):
    root = make_blender_dataset(str(tmp_path / "lego"), H=16, W=16)
    imgs, poses, rp, hwf, _ = load_blender_data(root, half_res=True, testskip=1)
    assert imgs.shape[1:3] == (8, 8)
    assert hwf[0] == 8 and hwf[1] == 8


def test_pose_spherical_is_rigid():
    c2w = pose_spherical(30.0, -45.0, 4.0)
    R = c2w[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(c2w[:3, 3]), 4.0, rtol=1e-5)


def test_llff_loader(tmp_path):
    root = make_llff_dataset(str(tmp_path / "scene"), H=16, W=16, n_images=6)
    images, poses, bds, render_poses, i_test = load_llff_data(root, factor=1)
    assert images.shape == (6, 16, 16, 3)
    assert poses.shape == (6, 3, 5)
    assert bds.shape == (6, 2)
    assert render_poses.shape[1:] == (3, 5)
    assert 0 <= i_test < 6
    # world rescale: bds.min() * 0.75 scaling => min bound becomes 1/0.75
    np.testing.assert_allclose(bds.min(), 1.0 / 0.75, rtol=1e-5)


def test_llff_minify(tmp_path):
    import os
    root = make_llff_dataset(str(tmp_path / "scene"), H=16, W=16, n_images=3)
    images, poses, bds, rp, i_test = load_llff_data(root, factor=2)
    assert images.shape[1:3] == (8, 8)
    assert os.path.isdir(os.path.join(root, "images_2"))
    # hwf updated for the factor
    assert poses[0, 0, 4] == 8 and poses[0, 1, 4] == 8


def test_minify_matches_imagemagick_golden(tmp_path):
    """Resampler divergence, measured (VERDICT r01 task 6): the reference
    downsamples with an ImageMagick subprocess (load_llff.py:12-61) whose
    pixels feed the loss directly; our in-process Pillow-Lanczos _minify
    must be pixel-close.  The checked-in goldens were produced by a
    clean-room NumPy implementation of ImageMagick's resize algorithm
    (tests/minify_golden.py: Lanczos-3, separable, edge renormalization,
    Q16 intermediates) on a checked-in photo-like fixture."""
    import os

    import imageio.v2 as imageio

    from tests.minify_golden import (
        imagemagick_resize,
        photo_like_test_image,
    )

    here = os.path.join(os.path.dirname(__file__), "fixtures")
    src = imageio.imread(os.path.join(here, "minify_src.png"))

    # (a) fixture + golden provenance are pinned: regenerating from the
    # deterministic generator reproduces the checked-in files exactly
    np.testing.assert_array_equal(src, photo_like_test_image())
    for f in (2, 4):
        golden = imageio.imread(os.path.join(here, f"minify_golden_f{f}.png"))
        regen = imagemagick_resize(src, 96 // f, 128 // f)
        np.testing.assert_array_equal(golden, regen)

    # (b) the production path (_minify factor + resolution modes) is within
    # 1 LSB of the ImageMagick-algorithm golden everywhere (measured max=1)
    scene = tmp_path / "scene"
    (scene / "images").mkdir(parents=True)
    imageio.imwrite(str(scene / "images" / "img.png"), src)
    _minify(str(scene), factors=[2, 4], resolutions=[(24, 32)])
    for f in (2, 4):
        golden = imageio.imread(os.path.join(here, f"minify_golden_f{f}.png"))
        ours = imageio.imread(str(scene / f"images_{f}" / "img.png"))
        diff = np.abs(ours.astype(np.int32) - golden.astype(np.int32))
        assert diff.max() <= 1, f"factor {f}: max LSB diff {diff.max()}"
        assert diff.mean() < 0.25, f"factor {f}: mean LSB diff {diff.mean()}"
        # loss-level impact: MSE between the two resamplers' [0,1] images
        # is ~2e-6 (-57 dB) — orders of magnitude below any training signal
        mse = (((ours.astype(np.float64) - golden) / 255.0) ** 2).mean()
        assert mse < 1e-5, f"factor {f}: loss-scale mse {mse}"
    ours_res = imageio.imread(str(scene / "images_32x24" / "img.png"))
    golden4 = imageio.imread(os.path.join(here, "minify_golden_f4.png"))
    assert np.abs(ours_res.astype(np.int32) - golden4.astype(np.int32)).max() <= 1

    # (c) ImageMagick's pass-order heuristic is image-dependent; even
    # against the OTHER pass order (vertical-first) the divergence stays
    # bounded at a few LSB confined to ringing edges (measured max 9,
    # 99%+ of pixels within 1 LSB)
    alt = imagemagick_resize(src, 24, 32, horizontal_first=False)
    ours4 = imageio.imread(str(scene / "images_4" / "img.png"))
    d = np.abs(ours4.astype(np.int32) - alt.astype(np.int32))
    assert d.max() <= 12 and (d > 1).mean() < 0.02


def test_lf_scene_splits():
    i_train, i_val, i_vi = lf_scene_splits("africa", 20)
    assert i_train == [5, 7, 9, 11, 13]
    assert i_val == [6, 8, 10, 12]
    i_train, i_val, i_vi = lf_scene_splits("basket", 60)
    assert i_train == [43, 45, 47, 49]
    # generic: every-8th holdout
    i_train, i_val, i_vi = lf_scene_splits("fern", 20, llffhold=8)
    assert i_val == [0, 8, 16]
    assert all(i not in i_val for i in i_train)
    assert i_vi == i_val  # intended-behavior default (reference crashes)


def test_precompute_and_batcher():
    rng = np.random.RandomState(0)
    images = rng.rand(3, 4, 5, 3).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32)[:3], (3, 1, 1))
    rays = precompute_rays(images, poses, 10.0, [0, 2])
    assert rays.shape == (2 * 4 * 5, 3, 3)

    b = RayBatcher(rays.copy(), 8, mesh_divisor=4)
    seen = 0
    for _ in range(10):
        batch = b.next()
        assert batch["rays_o"].shape == (8, 3)
        assert batch["target"].shape == (8, 3)
        seen += 8
    assert b.epoch >= 1  # wrapped at least once (40 rays total)

    with pytest.raises(ValueError):
        RayBatcher(rays, 10, mesh_divisor=4)


def test_depth_ray_batcher():
    rng = np.random.RandomState(1)
    poses = np.tile(np.eye(4, dtype=np.float32)[:3], (2, 1, 1))
    depth_gts = [
        {"depth": rng.rand(7), "coord": rng.rand(7, 2) * 4, "weight": rng.rand(7)},
        {"depth": rng.rand(5), "coord": rng.rand(5, 2) * 4, "weight": rng.rand(5)},
    ]
    rays_depth = precompute_depth_rays(depth_gts, poses, 4, 4, 10.0, [0, 1])
    assert rays_depth.shape == (12, 4, 3)
    db = DepthRayBatcher(rays_depth, 5)
    batch = db.next()
    assert batch["depth_rays_o"].shape == (5, 3)
    assert batch["target_depth"].shape == (5,)
    assert batch["ray_weights"].shape == (5,)


def test_ray_batcher_returned_batches_are_stable():
    """Epoch-boundary reshuffles must never mutate batches already handed
    out: the scan trainer stacks several next() results before uploading,
    and the old in-place data shuffle corrupted them (and the epoch-final
    batch) whenever the boundary fell inside the block."""
    import numpy as np

    from cfnerf_tpu.data.sampler import DepthRayBatcher, RayBatcher

    rng = np.random.RandomState(0)
    data = rng.randn(16, 3, 3).astype(np.float32)  # 4 batches of 4/epoch
    b = RayBatcher(data.copy(), 4, seed=0)
    batches = [b.next() for _ in range(6)]  # crosses the epoch boundary
    snapshot = [{k: v.copy() for k, v in s.items()} for s in batches]
    _ = [b.next() for _ in range(6)]  # more boundary crossings
    for got, want in zip(batches, snapshot):
        for k in want:
            np.testing.assert_array_equal(got[k], want[k], err_msg=k)
    # every epoch covers every ray exactly once (index-permutation epochs)
    first_epoch = np.concatenate(
        [np.concatenate([s["rays_o"], s["rays_d"], s["target"]], -1)
         for s in snapshot[:4]])
    all_rows = data.reshape(16, 9)
    assert {tuple(r) for r in first_epoch} == {tuple(r) for r in all_rows}

    d = DepthRayBatcher(rng.randn(8, 4, 3).astype(np.float32), 4, seed=0)
    dd = [d.next() for _ in range(3)]
    snap = [{k: v.copy() for k, v in s.items()} for s in dd]
    _ = [d.next() for _ in range(3)]
    for got, want in zip(dd, snap):
        for k in want:
            np.testing.assert_array_equal(got[k], want[k], err_msg=k)
