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


def place_from_sigma(
    sigma_fn: Callable[[jnp.ndarray], jnp.ndarray],
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
    """Place n_samples depths per ray by inverse-CDF over composited
    visibility weights of a cheap density proxy.

    C UNIFORM candidate bins span [near, far]; `sigma_fn((R, C, 3) pts) ->
    (R, C)` queries the proxy at bin midpoints; weights follow the render
    math itself — alpha_i = 1 - exp(-sigma_i * delta_i * ||d||), w_i =
    T_i * alpha_i — so samples go where the trained field says visible
    surfaces are.  A uniform mixture of mass `floor` keeps empty/missed
    rays renderable.  det placement when rng is None (eval); u draws
    stratified in CDF space (one per equal-mass stratum) otherwise.
    Returns sorted (R, n_samples) z values.

    TPU lowering notes: the transmittance prefix sum is one (R, C) @ (C, C)
    triangular-ones matmul (MXU), and because the candidate bins are
    uniform the piecewise-linear inverse CDF reduces to ONE fused
    clamp-and-sum pass, z(u) = near + (far-near)/C * sum_j clamp((u -
    cdf_j) / pdf_j, 0, 1) — no gathers, no searchsorted, no scan.
    """
    R = rays_o.shape[0]
    near = jnp.broadcast_to(jnp.asarray(near, jnp.float32), (R, 1))
    far = jnp.broadcast_to(jnp.asarray(far, jnp.float32), (R, 1))
    t_edges = jnp.linspace(0.0, 1.0, n_candidates + 1, dtype=jnp.float32)
    z_edges = near + t_edges[None, :] * (far - near)          # (R, C+1)
    z_mid = 0.5 * (z_edges[:, 1:] + z_edges[:, :-1])          # (R, C)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_mid[..., None]
    sigma = sigma_fn(pts)                                     # (R, C)

    delta = (z_edges[:, 1:] - z_edges[:, :-1]) * jnp.linalg.norm(
        rays_d.astype(jnp.float32), axis=-1, keepdims=True
    )
    tau = jnp.maximum(sigma, 0.0) * delta                     # optical depth/bin
    # transmittance T_i = exp(-sum_{j<i} tau_j); exactly the cumprod form
    # since (1 - alpha_j) == exp(-tau_j)
    excl = jnp.triu(jnp.ones((n_candidates, n_candidates), jnp.float32), k=1)
    opt_depth = jnp.dot(tau, excl, precision=jax.lax.Precision.HIGHEST)
    alpha = 1.0 - jnp.exp(-tau)
    w = jnp.exp(-opt_depth) * alpha                           # (R, C), sums <= 1
    # the 1e-6 keeps pdf strictly positive even at floor=0 (empty rays)
    w = w + (floor + 1e-6) / n_candidates

    pdf = w / jnp.sum(w, -1, keepdims=True)                   # (R, C), > 0
    incl = jnp.triu(jnp.ones((n_candidates, n_candidates), jnp.float32))
    cdf = jnp.dot(pdf, incl, precision=jax.lax.Precision.HIGHEST)
    cdf_lo = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf[:, :-1]], -1)

    if rng is None:
        u = jnp.broadcast_to(
            jnp.linspace(0.0, 1.0, n_samples, dtype=jnp.float32),
            (R, n_samples),
        )
    else:
        # stratified in CDF space: one draw per equal-mass stratum
        u = (
            jnp.arange(n_samples, dtype=jnp.float32)
            + jax.random.uniform(rng, (R, n_samples), dtype=jnp.float32)
        ) / n_samples
    # piecewise-linear inverse CDF over uniform bins, single fused pass
    seg = (u[:, :, None] - cdf_lo[:, None, :]) / pdf[:, None, :]  # (R, N, C)
    t_inv = jnp.sum(jnp.clip(seg, 0.0, 1.0), -1) / n_candidates  # (R, N) in [0,1]
    z = near + t_inv * (far - near)
    # inverse-CDF of sorted u is monotone for det; stratified draws are not
    return jnp.sort(z, -1)


def occ_z_vals(
    grid: jnp.ndarray,
    lo: jnp.ndarray,
    hi: jnp.ndarray,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    n_samples: int,
    *,
    n_candidates: int = 192,
    floor: float = 0.01,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Grid-backed placement: place_from_sigma with a nearest-cell voxel
    lookup as the density proxy.  The gather is TPU-unfriendly (~1 elem/
    cycle) — on TPU prefer the distilled proposal-MLP proxy
    (make_proposal_sigma_fn), which is pure matmuls; the grid path remains
    the CPU/small-scene and test-oracle implementation."""
    return place_from_sigma(
        lambda pts: grid_lookup(grid, lo, hi, pts),
        rays_o, rays_d, near, far, n_samples,
        n_candidates=n_candidates, floor=floor, rng=rng,
    )


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
    """Grid-backed renderer wrapper: make_placed_render_rays with a
    nearest-cell voxel lookup as the density proxy.  The grid is committed
    to device here so it rides as a runtime buffer, not an inline HLO
    constant (remote-compile payload limit, CLAUDE.md)."""
    grid = jnp.asarray(grid, jnp.float32)
    lo = jnp.asarray(lo, jnp.float32)
    hi = jnp.asarray(hi, jnp.float32)
    return make_placed_render_rays(
        base_render_rays, lambda pts: grid_lookup(grid, lo, hi, pts),
        n_samples, n_candidates=n_candidates, floor=floor,
    )


class ProposalMLP:
    """Tiny density proxy for TPU placement: sigma_hat(x) = softplus(MLP(
    gamma(x_unit))).  Pure matmuls — on TPU this replaces the voxel-grid
    gather (XLA TPU gathers run ~1 element/cycle; the same 6M-point query
    as matmuls rides the MXU ~100x faster).  Functional, no flax: params
    are a plain dict pytree (checkpoint-friendly, shardable).

    The mip-NeRF 360 'proposal network' idea (public technique), applied
    here post-hoc: distilled from the trained CF-NeRF density (mean draw)
    rather than co-trained, so it bolts onto any checkpoint."""

    def __init__(self, width: int = 64, depth: int = 2, multires: int = 4):
        self.width = width
        self.depth = depth
        self.multires = multires
        self.in_dim = 3 + 3 * 2 * multires

    def init(self, rng: jax.Array) -> dict:
        import numpy as np

        keys = jax.random.split(rng, self.depth + 1)
        dims = [self.in_dim] + [self.width] * self.depth + [1]
        params = {}
        for i, (d_in, d_out) in enumerate(zip(dims[:-1], dims[1:])):
            # He-uniform fan-in init, matching flax.linen defaults closely
            bound = float(np.sqrt(6.0 / d_in))
            params[f"w{i}"] = jax.random.uniform(
                keys[i], (d_in, d_out), jnp.float32, -bound, bound
            )
            params[f"b{i}"] = jnp.zeros((d_out,), jnp.float32)
        return params

    def apply(self, params: dict, pts_unit: jnp.ndarray) -> jnp.ndarray:
        """pts_unit (..., 3) in [0, 1] -> sigma_hat (...,) >= 0.

        Compute runs in bf16 (the query is HBM-bandwidth-bound at serving
        shapes — millions of rows through 27->64->64->1; halving activation
        traffic ~halves the wall) with the final head and softplus in f32.
        Placement only consumes relative density, so bf16 proxy error is
        well under the placement floor."""
        from cfnerf_tpu.ops.embed import positional_encoding

        h = positional_encoding(2.0 * pts_unit - 1.0, self.multires)
        h = h.astype(jnp.bfloat16)
        for i in range(self.depth + 1):
            w = params[f"w{i}"]
            b = params[f"b{i}"]
            if i < self.depth:
                h = jax.nn.relu(jnp.dot(h, w.astype(jnp.bfloat16)) + b.astype(jnp.bfloat16))
            else:
                h = jnp.dot(h.astype(jnp.float32), w) + b
        return jax.nn.softplus(h[..., 0])


def distill_proposal(
    density_fn: Callable[[jnp.ndarray], jnp.ndarray],
    lo: jnp.ndarray,
    hi: jnp.ndarray,
    rng: jax.Array,
    *,
    width: int = 64,
    depth: int = 2,
    multires: int = 4,
    n_points: int = 1 << 20,
    batch: int = 1 << 14,
    epochs: int = 4,
    lr: float = 2e-3,
    chunk: int = 65536,
) -> Tuple[ProposalMLP, dict, float]:
    """Distill the trained density field into a ProposalMLP: regress
    log1p(sigma) at uniform points in the aabb (the same target transform
    instant-style occupancy caches use — compresses the dynamic range so
    free space and surfaces weigh comparably).  One-time cost, seconds on
    TPU; the whole optimization runs as `epochs` device-resident lax.scan
    dispatches over a precomputed (points, targets) pool."""
    import optax

    prop = ProposalMLP(width=width, depth=depth, multires=multires)
    k_pts, k_init, k_perm = jax.random.split(rng, 3)
    pts_unit = jax.random.uniform(k_pts, (n_points, 3), jnp.float32)
    pts_world = lo + pts_unit * (hi - lo)
    n_pad = (-n_points) % chunk
    padded = jnp.concatenate([pts_world, jnp.zeros((n_pad, 3))], 0)
    sigma = jax.lax.map(density_fn, padded.reshape(-1, chunk, 3))
    target = jnp.log1p(sigma.reshape(-1)[:n_points])

    params = prop.init(k_init)
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    n_batches = n_points // batch

    def step(carry, xy):
        p, s = carry
        x, y = xy

        def loss_fn(pp):
            pred = jnp.log1p(prop.apply(pp, x))
            return jnp.mean((pred - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        return (optax.apply_updates(p, updates), s), loss

    run_epoch = jax.jit(
        lambda c, xs: jax.lax.scan(step, c, xs)
    )
    n_used = n_batches * batch
    loss = float("inf")
    for ep in range(epochs):
        perm = jax.random.permutation(jax.random.fold_in(k_perm, ep), n_points)
        xs = (
            pts_unit[perm][:n_used].reshape(n_batches, batch, 3),
            target[perm][:n_used].reshape(n_batches, batch),
        )
        (params, opt_state), losses = run_epoch((params, opt_state), xs)
        loss = float(losses[-1])
    return prop, params, loss


def make_proposal_sigma_fn(
    prop: ProposalMLP, params: dict, lo: jnp.ndarray, hi: jnp.ndarray
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """sigma_fn for place_from_sigma: world points -> proposal density."""
    lo = jnp.asarray(lo, jnp.float32)
    hi = jnp.asarray(hi, jnp.float32)
    net = {k: jnp.asarray(v) for k, v in params.items() if not k.startswith("__")}

    def sigma_fn(pts: jnp.ndarray) -> jnp.ndarray:
        unit = jnp.clip((pts - lo) / (hi - lo), 0.0, 1.0)
        return prop.apply(net, unit)

    return sigma_fn


def make_placed_render_rays(
    base_render_rays: Callable,
    sigma_fn: Callable[[jnp.ndarray], jnp.ndarray],
    n_samples: int,
    *,
    n_candidates: int = 192,
    floor: float = 0.01,
) -> Callable:
    """Wrap a renderer (make_render_rays output whose config.n_samples ==
    n_samples) so z placement comes from `sigma_fn` visibility weights.
    Same call signature as the base renderer -> drops into render_image."""

    def render_rays(params, rays_o, rays_d, viewdirs, near, far, rng, *, is_test):
        rng_place = None
        if rng is not None and not is_test:
            rng, rng_place = jax.random.split(rng)
        z_vals = place_from_sigma(
            sigma_fn, rays_o, rays_d, near, far, n_samples,
            n_candidates=n_candidates, floor=floor, rng=rng_place,
        )
        return base_render_rays(
            params, rays_o, rays_d, viewdirs, near, far, rng,
            is_test=is_test, z_vals=z_vals,
        )

    return render_rays


def density_query(model, config, reduce: str = "mean") -> Callable:
    """Returns fn(params, (P, 3) pts) -> (P,) sigma >= 0 — the per-call-
    params form of make_density_fn (the train-time proposal co-training
    target, where params change every step)."""
    import jax.nn as jnn

    embedder, embedder_dirs = config.embedders()
    if reduce not in ("mean", "max"):
        raise ValueError(f"reduce must be 'mean' or 'max', got {reduce!r}")

    def density_fn(params, pts: jnp.ndarray) -> jnp.ndarray:
        emb = embedder(pts)
        if config.use_viewdirs and embedder_dirs is not None:
            zero_dirs = jnp.zeros_like(pts)
            zero_dirs = zero_dirs.at[..., 2].set(1.0)
            emb = jnp.concatenate([emb, embedder_dirs(zero_dirs)], -1)
        raw, _ = model.apply({"params": params}, emb, is_test=True, rng=None)
        sig = raw[..., -1, 3] if reduce == "mean" else raw[..., 3].max(-1)
        return jnn.softplus(sig)

    return density_fn


def aabb_from_scene(scene: dict, args) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scene-level sampling bounds: aabb_from_rays over every 16th prepared
    ray of each TRAIN camera — the same space the renderer samples in
    (NDC-transformed when the run uses NDC)."""
    from cfnerf_tpu.ops.rays import get_rays
    from cfnerf_tpu.render.renderer import prepare_rays

    H, W, focal = scene["H"], scene["W"], scene["focal"]
    ndc = args.dataset_type == "llff" and not args.no_ndc
    ro_all, rd_all, nv_all, fv_all = [], [], [], []
    for view in scene["i_train"]:
        ro, rd = get_rays(H, W, focal, jnp.asarray(scene["poses"][view]))
        ro, rd, _, nv, fv = prepare_rays(
            ro, rd, H=H, W=W, focal=focal, ndc=ndc,
            use_viewdirs=args.use_viewdirs,
            near=scene["near"], far=scene["far"],
        )
        sub = slice(None, None, 16)  # every 16th ray bounds the frustum fine
        ro_all.append(ro[sub]); rd_all.append(rd[sub])
        nv_all.append(nv[sub]); fv_all.append(fv[sub])
    return aabb_from_rays(
        jnp.concatenate(ro_all), jnp.concatenate(rd_all),
        jnp.concatenate(nv_all), jnp.concatenate(fv_all),
    )


def serving_candidates(args) -> int:
    """Serving-side placement-candidate count: EVAL_r17/EVAL_r23 measured
    quality flat across C in {32..192} (max 0.024 dB on the same
    checkpoint; the ~-0.25 dB offset vs dense is the occ-eval shift,
    constant in C) and speed monotonic in 1/C (C=32 1.20x the C=128
    rate) — so --occ_eval_candidates (default 32) governs serving,
    separate from the train-side --occ_candidates (where coarser grids
    DO cost quality, EVAL_r14/r15/r20).  0 falls back to the train-side
    flag."""
    return (int(getattr(args, "occ_eval_candidates", 0) or 0)
            or int(args.occ_candidates))


def wrap_renderer_for_serving(
    render_rays_fn, args, scene, model, params, render_config
):
    """Serving entry shared by cli.eval and the --render_only path: build
    the density proxy from the trained checkpoint (proposal MLP on TPU,
    voxel grid otherwise / --occ_impl) and wrap `render_rays_fn` (already
    built at the PLACED n_samples) so z placement comes from proxy-
    composited visibility weights.  The aabb comes from the TRAIN cameras'
    prepared rays — the same space the renderer samples in (NDC-transformed
    when the run uses NDC)."""
    import time

    lo, hi = aabb_from_scene(scene, args)
    dev_params = jax.tree_util.tree_map(jnp.asarray, params)
    density_fn = make_density_fn(model, dev_params, render_config)

    n_cand = serving_candidates(args)

    impl = args.occ_impl
    if impl == "auto":
        impl = "proposal" if jax.default_backend() == "tpu" else "grid"
    t0 = time.time()
    if impl == "proposal":
        prop, pparams, dloss = distill_proposal(
            density_fn, lo, hi, jax.random.PRNGKey(args.seed or 0)
        )
        print(f"proposal MLP distilled in {time.time() - t0:.1f}s "
              f"(final log1p-sigma MSE {dloss:.4f})")
        return make_placed_render_rays(
            render_rays_fn,
            make_proposal_sigma_fn(prop, pparams, lo, hi),
            render_config.n_samples,
            n_candidates=n_cand, floor=args.occ_floor,
        )

    grid = bake_density_grid(
        density_fn, lo, hi, resolution=args.occ_res, dilate=args.occ_dilate
    )
    grid.block_until_ready()
    occupied = float((grid > 1e-2).mean())
    print(f"occupancy grid baked in {time.time() - t0:.1f}s: "
          f"{args.occ_res}^3, {100 * occupied:.1f}% occupied (sigma > 1e-2)")
    return make_occ_render_rays(
        render_rays_fn, grid, lo, hi, render_config.n_samples,
        n_candidates=n_cand, floor=args.occ_floor,
    )


def make_density_fn(
    model, params, config, reduce: str = "mean"
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Density query for baking: embed points (zero viewdirs — h_alpha is a
    pure function of position, models/nerf_flows.py encode), run the model in
    test mode (fixed eps, mean sample LAST — the deterministic mean draw).

    reduce='mean' (default) bakes the mean-sample density — the same field
    the test-mode composite is dominated by, so the placement CDF tracks the
    rendered transmittance.  reduce='max' bakes the max over the K draws
    (softplus is monotone, so max of raw == max of sigma) — a conservative
    envelope, but flow-draw noise inflates it in free space, which shifts
    the composited placement weights EARLY along the ray (measured -2 dB on
    the EVAL_r05 student vs mean at N=16)."""
    fn = density_query(model, config, reduce)
    return lambda pts: fn(params, pts)
