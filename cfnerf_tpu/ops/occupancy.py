"""Occupancy-grid accelerated sample placement (eval-time).

No counterpart exists in the reference: CF-NeRF renders every ray with the
hardcoded dense 96+32 z-schedule (/root/reference/run_nerf_uncertainty_NF.py:510-516)
— every sample pays a full network query whether it lands in empty space or
not.  This module is the TPU-native speed lever on top of that capability
surface: bake the trained density field into a small voxel grid ONCE, then at
render time place a much smaller static number of samples along each ray by
inverse-CDF over grid-composited visibility weights.  Placement costs a
handful of gathers per ray (no network query), so inference throughput scales
~linearly with the sample-count reduction while samples stay concentrated
where the trained field says the surfaces are.

Design notes (TPU):
  * Everything is static-shape: C candidate bins per ray, N placed samples,
    one `sample_pdf` inverse-CDF (vectorized binary search) — no dynamic
    ray-marching, no early-exit control flow, jit/vmap/lax.map friendly.
  * The grid is a committed device array threaded through closures AFTER
    jnp.asarray — jaxpr consts become runtime buffers, not inline HLO
    constants (the remote-compile payload limit, CLAUDE.md).
  * Lookup is nearest-cell (one gather); conservatism comes from max-over-K
    density at bake time plus a 3x3x3 max-pool dilation, not from trilinear
    blending.
  * A uniform floor mixture keeps every ray renderable (empty grid cells,
    grid staleness, rays that miss the baked volume) and keeps the
    K-sample uncertainty machinery honest in free space.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from cfnerf_tpu.ops.sampling import sample_pdf


def aabb_from_rays(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    near,
    far,
    pad: float = 0.05,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Axis-aligned bounds of everything the given rays can sample: the
    convex hull of segment endpoints o + d*near and o + d*far, padded by
    `pad` of the diagonal on every side.  Feed it rays from the TRAIN
    cameras — held-out views of the same scene land inside (lookups clamp
    at the boundary regardless)."""
    rays_o = jnp.asarray(rays_o, jnp.float32).reshape(-1, 3)
    rays_d = jnp.asarray(rays_d, jnp.float32).reshape(-1, 3)
    near = jnp.broadcast_to(jnp.asarray(near, jnp.float32), rays_o[:, :1].shape)
    far = jnp.broadcast_to(jnp.asarray(far, jnp.float32), rays_o[:, :1].shape)
    p0 = rays_o + rays_d * near
    p1 = rays_o + rays_d * far
    pts = jnp.concatenate([p0, p1], 0)
    lo = pts.min(0)
    hi = pts.max(0)
    margin = pad * (hi - lo)
    return lo - margin, hi + margin


def grid_coords(resolution: int, lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    """(res^3, 3) world-space cell centers, x-major like the grid layout."""
    t = (jnp.arange(resolution, dtype=jnp.float32) + 0.5) / resolution
    xs = lo[0] + t * (hi[0] - lo[0])
    ys = lo[1] + t * (hi[1] - lo[1])
    zs = lo[2] + t * (hi[2] - lo[2])
    gx, gy, gz = jnp.meshgrid(xs, ys, zs, indexing="ij")
    return jnp.stack([gx, gy, gz], -1).reshape(-1, 3)


def bake_density_grid(
    density_fn: Callable[[jnp.ndarray], jnp.ndarray],
    lo: jnp.ndarray,
    hi: jnp.ndarray,
    *,
    resolution: int = 128,
    chunk: int = 65536,
    dilate: int = 1,
) -> jnp.ndarray:
    """Query `density_fn((P,3) pts) -> (P,) sigma >= 0` at every cell center
    and return a (res, res, res) f32 sigma grid, max-pool dilated `dilate`
    times (3x3x3) so thin structures straddling cell boundaries survive
    nearest-cell lookup."""
    pts = grid_coords(resolution, lo, hi)
    n = pts.shape[0]
    n_pad = (-n) % chunk
    pts = jnp.concatenate([pts, jnp.zeros((n_pad, 3), jnp.float32)], 0)
    tiles = pts.reshape(-1, chunk, 3)
    sigma = jax.lax.map(density_fn, tiles).reshape(-1)[:n]
    grid = sigma.astype(jnp.float32).reshape(resolution, resolution, resolution)
    for _ in range(dilate):
        grid = _maxpool3(grid)
    return grid


def _maxpool3(grid: jnp.ndarray) -> jnp.ndarray:
    """3x3x3 max pool, stride 1, edge-replicated."""
    g = grid[None, ..., None]  # NHWDC-style for reduce_window
    g = jax.lax.reduce_window(
        g, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 3, 1),
        window_strides=(1, 1, 1, 1, 1),
        padding=((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)),
    )
    return g[0, ..., 0]


def grid_lookup(
    grid: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray, pts: jnp.ndarray
) -> jnp.ndarray:
    """Nearest-cell sigma at world points (..., 3); out-of-bounds clamps to
    the boundary cell (conservative under the padded aabb)."""
    res = grid.shape[0]
    u = (pts - lo) / (hi - lo)  # (..., 3) in [0, 1] inside the volume
    idx = jnp.clip((u * res).astype(jnp.int32), 0, res - 1)
    flat = (idx[..., 0] * res + idx[..., 1]) * res + idx[..., 2]
    return jnp.take(grid.reshape(-1), flat)


def occ_z_vals(
    grid: jnp.ndarray,
    lo: jnp.ndarray,
    hi: jnp.ndarray,
    rays_o: jnp.ndarray,      # (R, 3)
    rays_d: jnp.ndarray,      # (R, 3)
    near: jnp.ndarray,        # (R, 1) or scalar
    far: jnp.ndarray,
    n_samples: int,
    *,
    n_candidates: int = 192,
    floor: float = 0.01,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Place n_samples depths per ray by inverse-CDF over grid-composited
    visibility weights.

    C candidate bins span [near, far]; sigma is gathered at bin midpoints;
    weights follow the render math itself — alpha_i = 1 - exp(-sigma_i *
    delta_i * ||d||), w_i = T_i * alpha_i — so samples go where the trained
    field says visible surfaces are (first surface, not interior mass).
    A uniform mixture of mass `floor` keeps empty/missed rays renderable.
    det placement when rng is None (eval); stratified u draws otherwise.
    Returns sorted (R, n_samples) z values.
    """
    R = rays_o.shape[0]
    near = jnp.broadcast_to(jnp.asarray(near, jnp.float32), (R, 1))
    far = jnp.broadcast_to(jnp.asarray(far, jnp.float32), (R, 1))
    t_edges = jnp.linspace(0.0, 1.0, n_candidates + 1, dtype=jnp.float32)
    z_edges = near + t_edges[None, :] * (far - near)          # (R, C+1)
    z_mid = 0.5 * (z_edges[:, 1:] + z_edges[:, :-1])          # (R, C)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_mid[..., None]
    sigma = grid_lookup(grid, lo, hi, pts)                    # (R, C)

    delta = (z_edges[:, 1:] - z_edges[:, :-1]) * jnp.linalg.norm(
        rays_d.astype(jnp.float32), axis=-1, keepdims=True
    )
    alpha = 1.0 - jnp.exp(-jnp.maximum(sigma, 0.0) * delta)
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[:, :1]), 1.0 - alpha + 1e-10], -1),
        -1,
    )[:, :-1]
    w = trans * alpha                                         # (R, C), sums <= 1
    w = w + floor / n_candidates
    z = sample_pdf(z_edges, w, n_samples, rng, det=rng is None)
    # inverse-CDF of sorted u is monotone for det; stratified draws are not
    return jnp.sort(z, -1)


def make_occ_render_rays(
    base_render_rays: Callable,
    grid: jnp.ndarray,
    lo: jnp.ndarray,
    hi: jnp.ndarray,
    n_samples: int,
    *,
    n_candidates: int = 192,
    floor: float = 0.01,
) -> Callable:
    """Wrap a renderer (make_render_rays output whose config.n_samples ==
    n_samples) so z placement comes from the occupancy grid.  Same call
    signature as the base renderer -> drops into render_image unchanged.
    The grid is committed to device here so it rides as a runtime buffer."""
    grid = jnp.asarray(grid, jnp.float32)
    lo = jnp.asarray(lo, jnp.float32)
    hi = jnp.asarray(hi, jnp.float32)

    def render_rays(params, rays_o, rays_d, viewdirs, near, far, rng, *, is_test):
        rng_place = None
        if rng is not None and not is_test:
            rng, rng_place = jax.random.split(rng)
        z_vals = occ_z_vals(
            grid, lo, hi, rays_o, rays_d, near, far, n_samples,
            n_candidates=n_candidates, floor=floor, rng=rng_place,
        )
        return base_render_rays(
            params, rays_o, rays_d, viewdirs, near, far, rng,
            is_test=is_test, z_vals=z_vals,
        )

    return render_rays


def make_density_fn(model, params, config) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Density query for baking: embed points (zero viewdirs — h_alpha is a
    pure function of position, models/nerf_flows.py encode), run the model in
    test mode (fixed eps, mean sample last), and take the MAX over the K
    pre-activation density draws (softplus is monotone) — the conservative
    envelope of the learned density distribution, so the grid keeps any cell
    that ANY plausible field draw occupies."""
    import jax.nn as jnn

    embedder, embedder_dirs = config.embedders()

    def density_fn(pts: jnp.ndarray) -> jnp.ndarray:
        emb = embedder(pts)
        if config.use_viewdirs and embedder_dirs is not None:
            zero_dirs = jnp.zeros_like(pts)
            zero_dirs = zero_dirs.at[..., 2].set(1.0)
            emb = jnp.concatenate([emb, embedder_dirs(zero_dirs)], -1)
        raw, _ = model.apply({"params": params}, emb, is_test=True, rng=None)
        return jnn.softplus(raw[..., 3].max(-1))

    return density_fn
