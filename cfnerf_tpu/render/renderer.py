"""Volume renderer: ray batch -> (K-sample rgb, disp, depth, weights).

Parity targets:
  * render_rays      /root/reference/run_nerf_uncertainty_NF.py:457-553
  * render (plumbing) /root/reference/run_nerf_uncertainty_NF.py:103-170
  * batchify_rays / batchify chunk loops (:88-100, :47-64) — intentionally
    NOT reproduced: the whole ray batch renders inside one jit; host-side
    chunking survives only as lax.map tiling for full-image eval renders
    (render_image below), where H*W rays would exceed device memory.

The reference's hardcoded raw-noise behavior (computed but never added,
:432-442) is reproduced via ops.compositing.raw2outputs(apply_noise=False).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from cfnerf_tpu.ops.compositing import LAST_DIST, finalize_k_maps, raw2outputs
from cfnerf_tpu.ops.embed import Embedder
from cfnerf_tpu.ops.rays import get_rays, ndc_rays
from cfnerf_tpu.ops.sampling import sample_pdf, sample_z_vals, stratified_perturb


_WARNED_UNFUSED_SHAPES: set = set()


def _warn_unfused_shape(R: int, S: int) -> None:
    """Warn (once per static shape) that the fused render core fell back.

    The fused Pallas kernel only handles sample counts with a lane-aligned
    tile (ops/pallas/render_core.py:_tile_for); anything else silently takes
    the unfused path at roughly half throughput (EVAL_r12: --occ_eval 20
    measured 644k rays/s vs the fused neighbours N24 973k / N16 1.37M).
    Runs at trace time (R/S are static), so the cost is one warning per
    compiled shape, not per step.
    """
    key = (R, S)
    if key in _WARNED_UNFUSED_SHAPES:
        return
    _WARNED_UNFUSED_SHAPES.add(key)
    import warnings

    from cfnerf_tpu.ops.pallas.render_core import _tile_for

    if _tile_for(S) is None:
        why = (
            f"S={S} has no lane-aligned tile — pick a sample count from the "
            f"supported set (e.g. 16/24/32/48/64/96/128, see "
            f"ops/pallas/render_core.py:_tile_for)"
        )
    else:
        why = (
            f"ray batch R={R} doesn't align to the S={S} tile "
            f"(needs R % 128 == 0 and R*S divisible by the tile)"
        )
    warnings.warn(
        f"fused render core requested but falling back to the unfused path "
        f"at ~half throughput: {why}. Pass --fused_render=off to silence.",
        stacklevel=2,
    )


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static rendering configuration (hashable -> safe to close over jit)."""

    n_samples: int = 128
    n_importance: int = 0  # fine-pass samples (hierarchical, nerf-pytorch style)
    perturb: bool = True
    lindisp: bool = False
    use_viewdirs: bool = True
    white_bkgd: bool = False
    raw_noise_std: float = 0.0
    apply_noise: bool = False  # reference parity: noise is never applied
    uniform: bool = False      # --uniformsample flag surface
    multires: int = 10
    multires_views: int = 4
    i_embed: int = 0
    # fused flow+composite Pallas render core ('off' | 'on' | 'interpret');
    # the factory resolves --fused_render=auto to 'on' on TPU.  Consumed by
    # call sites via models.nerf_flows.make_fused_apply — kept here so one
    # static config object carries the whole render-path choice.
    fused: str = "off"

    def embedders(self) -> Tuple[Embedder, Optional[Embedder]]:
        if self.i_embed == -1:
            emb = Embedder(num_freqs=0)
            emb_dirs = Embedder(num_freqs=0) if self.use_viewdirs else None
        else:
            emb = Embedder(num_freqs=self.multires, max_freq_log2=self.multires - 1)
            emb_dirs = (
                Embedder(num_freqs=self.multires_views, max_freq_log2=self.multires_views - 1)
                if self.use_viewdirs
                else None
            )
        return emb, emb_dirs


def make_render_rays(
    model_apply: Callable[..., Tuple[jnp.ndarray, jnp.ndarray]],
    config: RenderConfig,
    model_apply_fine: Optional[Callable[..., Tuple[jnp.ndarray, jnp.ndarray]]] = None,
    model_apply_fused: Optional[Callable[..., Tuple]] = None,
) -> Callable[..., Dict[str, jnp.ndarray]]:
    """Build the fused per-batch renderer.

    model_apply(params, x, is_test=..., rng=...) -> (raw (B, K, 4), entropy).

    The returned function renders a flat ray batch in one traced pass:
    z-schedule -> stratified jitter -> positional encode -> model (K draws)
    -> composite.  `is_test` is a static python bool (two compiled variants:
    train uses fresh shared-K eps + entropy; test uses fixed eps, no jitter
    handled by the caller passing perturb=False via config).

    With config.n_importance > 0 a hierarchical fine pass runs: inverse-CDF
    resampling (sample_pdf) of n_importance extra depths from the coarse
    weights (mean over K, gradient-stopped), then a second model query —
    the capability the reference declares via its N_importance flag but
    never implemented (SURVEY.md section 2 defects; nerf-pytorch semantics).
    Coarse outputs are returned as rgb0/disp0/depth0/loss_entropy0.
    Without model_apply_fine the SAME model (and the same raw params
    pytree, not a coarse/fine pair) runs both passes — the eval-only
    importance-placement mode (--N_importance_eval).

    model_apply_fused (models.nerf_flows.make_fused_apply): when given and
    the batch shape qualifies, flows + composite run as ONE Pallas kernel
    (ops/pallas/render_core.py) and the (B, K, 4) raw tensor never exists
    in HBM.  Identical math (tests/test_render_core.py); `weights` is not
    produced on that path (nothing consumes it outside the hierarchical
    pass, which stays unfused).
    """
    embedder, embedder_dirs = config.embedders()

    def _embed(z_vals, rays_o, rays_d, viewdirs):
        R, S = z_vals.shape
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
        emb = embedder(pts.reshape(R * S, 3))
        if config.use_viewdirs and viewdirs is not None:
            emb_dirs = embedder_dirs(viewdirs)  # (R, Dv)
            emb_dirs = jnp.broadcast_to(
                emb_dirs[:, None, :], (R, S, emb_dirs.shape[-1])
            ).reshape(R * S, -1)
            emb = jnp.concatenate([emb, emb_dirs], -1)
        return emb

    def _query(apply_fn, params, z_vals, rays_o, rays_d, viewdirs, rng_eps, is_test):
        R, S = z_vals.shape
        emb = _embed(z_vals, rays_o, rays_d, viewdirs)
        raw_flat, loss_entropy = apply_fn(params, emb, is_test=is_test, rng=rng_eps)
        K = raw_flat.shape[-2]
        return raw_flat.reshape(R, S, K, 4), loss_entropy

    def render_rays(
        params: Any,
        rays_o: jnp.ndarray,   # (R, 3)
        rays_d: jnp.ndarray,   # (R, 3)
        viewdirs: Optional[jnp.ndarray],  # (R, 3) unit vectors or None
        near: jnp.ndarray,     # (R, 1) or scalar
        far: jnp.ndarray,
        rng: Optional[jax.Array],
        *,
        is_test: bool,
        z_vals: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        R = rays_o.shape[0]
        S = config.n_samples

        rng_z = rng_eps = rng_noise = rng_pdf = rng_eps_f = None
        if rng is not None:
            rng_z, rng_eps, rng_noise, rng_pdf, rng_eps_f = jax.random.split(rng, 5)

        if z_vals is None:
            z_vals = sample_z_vals(
                near, far, S, lindisp=config.lindisp, uniform=config.uniform
            )
            z_vals = jnp.broadcast_to(z_vals, (R, S))
            if config.perturb and not is_test and rng_z is not None:
                z_vals = stratified_perturb(z_vals, rng_z)
        # else: externally placed depths (ops/occupancy.py occ_z_vals) —
        # sorted (R, S); jitter/schedule are the placer's responsibility.

        from cfnerf_tpu.ops.pallas.render_core import supported as _fused_ok

        fused_wanted = (
            model_apply_fused is not None
            and config.n_importance == 0
            and not (config.apply_noise and config.raw_noise_std > 0)
        )
        if fused_wanted and not _fused_ok(R * S, S):
            # loud, trace-time (static R/S), once per shape: a sample count
            # outside the kernel's lane-aligned tile set silently halves
            # serving throughput otherwise (EVAL_r12: --occ_eval 20 measured
            # 644k vs the 973k-1.37M fused neighbours N24/N16)
            _warn_unfused_shape(R, S)
        if fused_wanted and _fused_ok(R * S, S):
            emb = _embed(z_vals, rays_o, rays_d, viewdirs)
            dists = z_vals[..., 1:] - z_vals[..., :-1]
            dists = jnp.concatenate(
                [dists, jnp.full_like(dists[..., :1], LAST_DIST)], -1
            )
            d_pts = dists * jnp.linalg.norm(
                rays_d.astype(jnp.float32), axis=-1, keepdims=True
            )
            rgb_map, depth_map, acc_map, loss_entropy = model_apply_fused(
                params, emb, z_vals.reshape(-1), d_pts.reshape(-1), S,
                is_test=is_test, rng=rng_eps,
            )
            # disp + white background in XLA on the (R, K) kernel outputs
            rgb_map, disp_map = finalize_k_maps(
                rgb_map, depth_map, acc_map, config.white_bkgd
            )
            return dict(
                rgb_map=rgb_map, disp_map=disp_map, depth_map=depth_map,
                acc_map=acc_map, loss_entropy=loss_entropy,
            )

        # params are a {"coarse","fine"} pair exactly when a separate fine
        # network exists; with n_importance > 0 and NO fine net (eval-only
        # importance placement, --N_importance_eval) the single trained
        # model serves both passes on its own pytree.
        coarse_params = params["coarse"] if model_apply_fine is not None else params
        raw, loss_entropy = _query(
            model_apply, coarse_params, z_vals, rays_o, rays_d, viewdirs,
            rng_eps, is_test,
        )

        rgb_map, disp_map, acc_map, weights, depth_map = raw2outputs(
            raw, z_vals, rays_d,
            raw_noise_std=config.raw_noise_std,
            white_bkgd=config.white_bkgd,
            rng=rng_noise,
            apply_noise=config.apply_noise,
        )

        out: Dict[str, jnp.ndarray] = {}
        if config.n_importance > 0:
            out.update(
                rgb0=rgb_map, disp0=disp_map, depth0=depth_map,
                loss_entropy0=loss_entropy,
            )
            # importance-resample from the coarse density (mean over K)
            w_mean = jax.lax.stop_gradient(weights.mean(-1))  # (R, S)
            z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
            z_samples = sample_pdf(
                z_mid, w_mean[..., 1:-1], config.n_importance,
                rng_pdf, det=(not config.perturb) or is_test or rng_pdf is None,
            )
            z_samples = jax.lax.stop_gradient(z_samples)
            z_vals = jnp.sort(jnp.concatenate([z_vals, z_samples], -1), -1)

            fine_apply = model_apply_fine or model_apply
            fine_params = params["fine"] if model_apply_fine else coarse_params
            raw, loss_entropy = _query(
                fine_apply, fine_params, z_vals, rays_o, rays_d, viewdirs,
                rng_eps_f, is_test,
            )
            rgb_map, disp_map, acc_map, weights, depth_map = raw2outputs(
                raw, z_vals, rays_d,
                raw_noise_std=config.raw_noise_std,
                white_bkgd=config.white_bkgd,
                rng=rng_noise,
                apply_noise=config.apply_noise,
            )

        out.update(
            rgb_map=rgb_map,       # (R, 3, K)
            disp_map=disp_map,     # (R, K)
            depth_map=depth_map,   # (R, K)
            acc_map=acc_map,       # (R, K)
            loss_entropy=loss_entropy,
        )
        if not is_test:
            out["weights"] = weights
        return out

    return render_rays


def prepare_rays(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    *,
    H: int,
    W: int,
    focal: float,
    ndc: bool,
    use_viewdirs: bool,
    near: float,
    far: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray, jnp.ndarray]:
    """Flatten/NDC/viewdirs plumbing (reference render(), :129-158)."""
    if use_viewdirs:
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        viewdirs = viewdirs.reshape(-1, 3)
    else:
        viewdirs = None
    if ndc:
        rays_o, rays_d = ndc_rays(H, W, focal, 1.0, rays_o, rays_d)
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    near_v = near * jnp.ones_like(rays_d[..., :1])
    far_v = far * jnp.ones_like(rays_d[..., :1])
    return rays_o, rays_d, viewdirs, near_v, far_v


def _params_on_mesh(params: Any, mesh) -> Any:
    """Place params on `mesh` for a sharded render: leaves already carrying a
    NamedSharding on this mesh (e.g. tensor-parallel placement from
    parallel.mesh.shard_params_tp) are kept; anything else is replicated.
    Mixing single-device params with mesh-sharded ray tiles would raise a
    committed-device conflict in eager dispatch."""
    from jax.sharding import NamedSharding as _NS

    def place(x):
        sh = getattr(x, "sharding", None)
        if isinstance(sh, _NS) and sh.mesh == mesh:
            return x
        return jax.device_put(x, _NS(mesh, jax.sharding.PartitionSpec()))

    return jax.tree_util.tree_map(place, params)


def render_image(
    render_rays_fn: Callable[..., Dict[str, jnp.ndarray]],
    params: Any,
    c2w: jnp.ndarray,
    *,
    H: int,
    W: int,
    focal: float,
    ndc: bool,
    use_viewdirs: bool,
    near: float,
    far: float,
    tile: int = 4096,
    mesh=None,
) -> Dict[str, jnp.ndarray]:
    """Full-image eval render (reference render_path single-pose path,
    :247-314, with the snapshot's crash bugs fixed).

    Tiles H*W rays with lax.map so device memory stays bounded while the
    per-tile compute is one fused kernel.  Pads the ray count up to a tile
    multiple (static shapes) and strips the padding after.

    With `mesh` (a jax.sharding.Mesh carrying a `data` axis) the rays
    INSIDE each tile are sharded across the data axis, so full-image
    inference throughput scales with chips: per-ray math has no cross-ray
    communication (parallel/mesh.py module docstring), so GSPMD partitions
    every tile with zero collectives — the multi-chip serving path the
    reference's single-process DataParallel eval can't express.  Params are
    replicated onto the mesh unless already placed there (tensor-parallel
    trunks keep their layout).  Equivalence with the single-device path is
    pinned by tests/test_sharding.py.
    """
    if mesh is not None:
        from cfnerf_tpu.parallel.mesh import DATA_AXIS

        n_data = mesh.shape[DATA_AXIS]
        tile = -(-tile // n_data) * n_data  # round up: tile splits evenly
        params = _params_on_mesh(params, mesh)
    rays_o, rays_d = get_rays(H, W, focal, c2w)
    rays_o, rays_d, viewdirs, near_v, far_v = prepare_rays(
        rays_o, rays_d, H=H, W=W, focal=focal, ndc=ndc,
        use_viewdirs=use_viewdirs, near=near, far=far,
    )
    n = rays_o.shape[0]
    n_pad = (-n) % tile
    pad = lambda x: jnp.concatenate([x, jnp.broadcast_to(x[-1:], (n_pad, *x.shape[1:]))], 0)
    rays_o, rays_d, near_v, far_v = map(pad, (rays_o, rays_d, near_v, far_v))
    if viewdirs is not None:
        viewdirs = pad(viewdirs)
    n_tiles = rays_o.shape[0] // tile

    def body(args):
        ro, rd, vd, nv, fv = args
        return render_rays_fn(params, ro, rd, vd, nv, fv, None, is_test=True)

    reshape = lambda x: x.reshape(n_tiles, tile, *x.shape[1:])
    tiles = (
        reshape(rays_o),
        reshape(rays_d),
        reshape(viewdirs) if viewdirs is not None else jnp.zeros((n_tiles, tile, 3)),
        reshape(near_v),
        reshape(far_v),
    )
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from cfnerf_tpu.parallel.mesh import DATA_AXIS

        tile_sharding = NamedSharding(mesh, P(None, DATA_AXIS))
        tiles = tuple(jax.device_put(t, tile_sharding) for t in tiles)
    out = jax.lax.map(body, tiles)
    result = {}
    for k, v in out.items():
        # keep only per-ray outputs: scalars (loss_entropy, and
        # loss_entropy0 from the hierarchical pass) stack to (n_tiles,)
        # and would crash the per-ray reshape
        if v.ndim < 2 or v.shape[1] != tile:
            continue
        v = v.reshape(n_tiles * tile, *v.shape[2:])[:n]
        result[k] = v.reshape(H, W, *v.shape[1:])
    return result
