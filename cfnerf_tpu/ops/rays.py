"""Ray generation and NDC reparameterization.

Parity targets in the reference:
  * get_rays           /root/reference/run_nerf_helpers.py:288-297
  * get_rays_np        /root/reference/run_nerf_helpers.py:350-357
  * get_rays_by_coord  /root/reference/run_nerf_helpers.py:440-445
  * get_ray_directions /root/reference/run_nerf_helpers.py:299-321
  * ndc_rays           /root/reference/run_nerf_helpers.py:360-377

Convention: pinhole camera looking down -z, x right, y up.  A pixel (i, j)
(column i, row j) maps to camera-space direction
[(i - W/2)/f, -(j - H/2)/f, -1], rotated into world space by c2w[:3,:3];
all rays share origin c2w[:3,-1].
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def get_rays(H: int, W: int, focal: float, c2w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full-image rays on device. Returns (rays_o, rays_d), each (H, W, 3)."""
    j, i = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij"
    )
    dirs = jnp.stack(
        [(i - W * 0.5) / focal, -(j - H * 0.5) / focal, -jnp.ones_like(i)], axis=-1
    )  # (H, W, 3)
    rays_d = jnp.einsum("hwc,rc->hwr", dirs, c2w[:3, :3])
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def get_rays_np(H: int, W: int, focal: float, c2w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side (numpy) variant used for the one-time ray precompute."""
    i, j = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32), indexing="xy")
    dirs = np.stack([(i - W * 0.5) / focal, -(j - H * 0.5) / focal, -np.ones_like(i)], -1)
    rays_d = np.einsum("hwc,rc->hwr", dirs, c2w[:3, :3])
    rays_o = np.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def get_rays_by_coord_np(
    H: int, W: int, focal: float, c2w: np.ndarray, coords: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Rays through specific pixel coordinates (N, 2) = (x, y); used for
    COLMAP sparse-depth supervision (DS-NeRF style)."""
    i = (coords[:, 0] - W * 0.5) / focal
    j = -(coords[:, 1] - H * 0.5) / focal
    dirs = np.stack([i, j, -np.ones_like(i)], -1)
    rays_d = np.einsum("nc,rc->nr", dirs, c2w[:3, :3])
    rays_o = np.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def get_ray_directions(H: int, W: int, K: np.ndarray) -> np.ndarray:
    """Camera-space directions from a full 3x3 intrinsics matrix (no +0.5
    pixel centering, matching the reference)."""
    i, j = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32), indexing="xy")
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    return np.stack([(i - cx) / fx, -(j - cy) / fy, -np.ones_like(i)], -1)


def get_rays_phototourism(
    directions: np.ndarray, c2w: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """World-space rays from precomputed camera-space `directions` (from
    get_ray_directions) and a 3x4 c2w — the per-image-intrinsics rig used
    by phototourism-style captures (/root/reference/run_nerf_helpers.py:
    324-347; dead there — no phototourism loader exists in the snapshot).

    Unlike get_rays, the returned directions are UNIT-NORM and both outputs
    are flattened to (H*W, 3), matching the reference contract."""
    rays_d = directions @ c2w[:, :3].T
    rays_d = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = np.broadcast_to(c2w[:, 3], rays_d.shape)
    return (
        rays_o.reshape(-1, 3).astype(np.float32),
        rays_d.reshape(-1, 3).astype(np.float32),
    )


def ndc_rays(
    H: int, W: int, focal: float, near: float, rays_o: jnp.ndarray, rays_d: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reparameterize forward-facing rays into NDC space [-1, 1]^3.

    Shifts origins to the near plane, then applies the projective map so the
    scene's infinite frustum becomes the unit cube (LLFF convention).
    """
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (W / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (W / (2.0 * focal)) * (rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2])
    d1 = -1.0 / (H / (2.0 * focal)) * (rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2])
    d2 = -2.0 * near / rays_o[..., 2]

    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)
