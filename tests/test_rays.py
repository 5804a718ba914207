import jax.numpy as jnp
import numpy as np

from cfnerf_tpu.ops.rays import (
    get_rays,
    get_rays_np,
    get_rays_by_coord_np,
    ndc_rays,
)


def test_identity_camera_center_pixel():
    H, W, focal = 4, 6, 10.0
    c2w = np.eye(4, dtype=np.float32)[:3]
    ro, rd = get_rays_np(H, W, focal, c2w)
    assert ro.shape == (H, W, 3) and rd.shape == (H, W, 3)
    # pixel (i=3, j=2) => i - W/2 = 0, j - H/2 = 0 => direction (0, 0, -1)
    np.testing.assert_allclose(rd[2, 3], [0.0, 0.0, -1.0], atol=1e-6)
    np.testing.assert_allclose(ro, 0.0)
    # pixel (i=0, j=0): x = (0-3)/10, y = -(0-2)/10
    np.testing.assert_allclose(rd[0, 0], [-0.3, 0.2, -1.0], atol=1e-6)


def test_jax_matches_numpy():
    rng = np.random.RandomState(1)
    c2w = np.concatenate([np.linalg.qr(rng.randn(3, 3))[0], rng.randn(3, 1)], -1).astype(
        np.float32
    )
    H, W, focal = 5, 7, 12.0
    ro_np, rd_np = get_rays_np(H, W, focal, c2w)
    ro_j, rd_j = get_rays(H, W, focal, jnp.asarray(c2w))
    np.testing.assert_allclose(np.asarray(ro_j), ro_np, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rd_j), rd_np, atol=1e-5)


def test_rays_by_coord_matches_grid():
    rng = np.random.RandomState(2)
    c2w = np.concatenate([np.linalg.qr(rng.randn(3, 3))[0], rng.randn(3, 1)], -1).astype(
        np.float32
    )
    H, W, focal = 8, 9, 20.0
    ro, rd = get_rays_np(H, W, focal, c2w)
    coords = np.array([[3.0, 5.0], [0.0, 0.0], [8.0, 7.0]])  # (x, y)
    ro_c, rd_c = get_rays_by_coord_np(H, W, focal, c2w, coords)
    for k, (x, y) in enumerate(coords.astype(int)):
        np.testing.assert_allclose(rd_c[k], rd[y, x], atol=1e-5)
        np.testing.assert_allclose(ro_c[k], ro[y, x], atol=1e-5)


def test_ndc_near_plane_maps_to_minus_one():
    # A ray through the image center starting on the near plane must map to
    # o2 = 1 + 2*near/o_z = 1 + 2*1/(-1) = -1 (z in [-1, 1] over [near, inf)).
    ro = jnp.array([[0.0, 0.0, -1.0]])
    rd = jnp.array([[0.0, 0.0, -1.0]])
    o, d = ndc_rays(4, 4, 10.0, 1.0, ro, rd)
    np.testing.assert_allclose(np.asarray(o[0, 2]), -1.0, atol=1e-6)
    # o + d must land on z = +1 (the far limit)
    np.testing.assert_allclose(np.asarray(o[0, 2] + d[0, 2]), 1.0, atol=1e-6)


def test_ndc_shifts_origin_to_near_plane():
    ro = jnp.array([[0.3, -0.2, -5.0]])
    rd = jnp.array([[0.1, 0.05, -1.0]])
    near = 1.0
    # after the internal shift, the origin's z should be -near; verify via o2
    o, _ = ndc_rays(6, 8, 15.0, near, ro, rd)
    np.testing.assert_allclose(np.asarray(o[0, 2]), 1.0 + 2.0 * near / (-near), atol=1e-6)
