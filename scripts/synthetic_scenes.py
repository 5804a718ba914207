"""Shared synthetic scenes for experiments and tests.

Two analytic scenes with different training characters:
  * blob    — soft volumetric emission-absorption field: robustly learnable
              at the reference-default lr within ~1k steps (used for the
              learning-parity run and the convergence-floor test);
  * spheres — hard lambertian surfaces on white background: bistable
              (learn vs collapse-to-background) at short schedules (used to
              demonstrate trajectory parity, PARITY_r02.json).
"""
from __future__ import annotations

import numpy as np

from cfnerf_tpu.ops.rays import get_rays_np


def _ring_pose(origin: np.ndarray) -> np.ndarray:
    bwd = origin / np.linalg.norm(origin)
    x = np.cross([0.0, 1.0, 0.0], bwd)
    x /= np.linalg.norm(x)
    y = np.cross(bwd, x)
    return np.stack([x, y, bwd, origin], 1).astype(np.float32)


def blob_gt_render(ro, rd, near, far):
    """Volumetric soft blob, white background (numpy quadrature)."""
    d = rd / np.linalg.norm(rd, axis=-1, keepdims=True)
    t = np.linspace(near, far, 192)
    pts = ro[:, None, :] + d[:, None, :] * t[None, :, None]
    sigma = 4.0 * np.exp(-((pts ** 2).sum(-1)) / 0.8)
    color = 0.5 + 0.5 * np.stack(
        [np.sin(pts[..., 0] * 2), np.cos(pts[..., 1] * 2), np.sin(pts[..., 2] * 2)], -1
    )
    dt = t[1] - t[0]
    alpha = 1 - np.exp(-sigma * dt)
    T = np.cumprod(
        np.concatenate([np.ones_like(alpha[:, :1]), 1 - alpha + 1e-10], 1), 1
    )[:, :-1]
    wgt = alpha * T
    rgb = (wgt[..., None] * color).sum(1) + (1 - wgt.sum(1))[..., None]
    return rgb.astype(np.float32)


def blob_scene(n_views: int = 6):
    """Returns (poses, images, geom) with geom = dict(H, W, focal, near, far)."""
    H = W = 24
    focal = 24.0
    near, far = 2.0, 7.0
    poses, images = [], []
    for i in range(n_views):
        th = 2 * np.pi * i / n_views
        c2w = _ring_pose(np.array([4.0 * np.sin(th), 0.5, 4.0 * np.cos(th)]))
        ro, rd = get_rays_np(H, W, focal, c2w)
        poses.append(c2w)
        images.append(
            blob_gt_render(ro.reshape(-1, 3), rd.reshape(-1, 3), near, far)
            .reshape(H, W, 3)
        )
    geom = dict(H=H, W=W, focal=focal, near=near, far=far)
    return np.stack(poses), np.stack(images), geom


def sphere_scene(n_views: int = 8):
    """Two hard lambertian spheres on white bg (ray-traced GT)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from demo_synthetic import ray_trace_scene

    H = W = 32
    focal = 32.0
    near, far = 2.0, 8.0
    poses, images = [], []
    for i in range(n_views):
        th = 2 * np.pi * i / n_views
        c2w = _ring_pose(np.array([4.5 * np.sin(th), 0.8, 4.5 * np.cos(th)]))
        ro, rd = get_rays_np(H, W, focal, c2w)
        poses.append(c2w)
        images.append(
            ray_trace_scene(ro.reshape(-1, 3), rd.reshape(-1, 3)).reshape(H, W, 3)
        )
    geom = dict(H=H, W=W, focal=focal, near=near, far=far)
    return np.stack(poses), np.stack(images), geom
