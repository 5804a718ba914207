"""The jitted training step.

Parity target: one iteration of the reference train loop —
render (/root/reference/run_nerf_uncertainty_NF.py:1014), loss block
(:1026-1054), Adam step (:1065-1067), exponential lr decay
lr = lrate * 0.1^(step / (lrate_decay*1000)) (:1072-1077, continuous, not
staircase) — collapsed into a single jit-compiled, mesh-sharded function.

Differences by design (TPU-native):
  * no chunk loops: 512 (+128 depth) rays render in one traced pass;
  * depth-supervision rays are concatenated to the ray batch before the
    render and split after, exactly like the reference (:1011, :1020-1024),
    but inside the jit;
  * the ray axis carries a sharding constraint over the `data` mesh axis;
    gradients all-reduce over ICI automatically via jit;
  * Adam runs through optax with the same (0.9, 0.999) betas and the same
    continuous exponential schedule.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cfnerf_tpu.ops.metrics import img2mse, mse2psnr
from cfnerf_tpu.parallel.mesh import DATA_AXIS
from cfnerf_tpu.render.renderer import RenderConfig, make_render_rays, prepare_rays
from cfnerf_tpu.train.loss import total_loss


@dataclasses.dataclass(frozen=True)
class OccTrainConfig:
    """Static config for proposal-placed training (the occ stage).

    No reference counterpart (the reference trains every ray on the dense
    hardcoded schedule, run_nerf_uncertainty_NF.py:510-532); this is the
    instant-NGP/mip-NeRF-360-style TPU speed lever applied to TRAINING:
    after a dense warmup, each step places render_config.n_samples depths
    per ray by inverse-CDF over proposal-composited visibility weights
    (stratified u draws — train-mode jitter), and the proposal MLP is
    co-trained in the same jitted step against the CURRENT density field
    (stop-gradient targets at uniform aabb points), so placement tracks
    the field as it trains.  Proposal params/opt-state ride inside the
    optimizer-state tuple — NOT in the model pytree, so checkpoints stay
    layout-compatible (the proposal is re-distilled on resume, matching
    the reference's own optimizer-state-not-restored convention)."""

    lo: Tuple[float, float, float]
    hi: Tuple[float, float, float]
    n_candidates: int = 128
    floor: float = 0.3
    prop_width: int = 64
    prop_depth: int = 2
    prop_multires: int = 4
    prop_lr: float = 2e-3
    cotrain_points: int = 8192


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Static training hyperparameters (hashable, closed over jit)."""

    H: int
    W: int
    focal: float
    ndc: bool
    near: float
    far: float
    k_samples: int
    lrate: float = 5e-4
    lrate_decay: int = 250  # in 1000s of steps
    # global step the run (re)starts from: offsets the lr schedule so a
    # resumed run trains at lrate * 0.1^(global_step/decay) like the
    # reference (:1072-1077), which computes lr from the restored
    # global_step even though optimizer state is not restored (:360-361)
    start_step: int = 0
    beta1: float = 0.0
    colmap_depth: bool = False
    depth_lambda: float = 0.1
    # 'kde' (CF-NeRF sample NLL) or 'mse' (baseline nerf/nerf_dropout models)
    loss_mode: str = "kde"
    # rematerialize the model forward in the backward pass: trades ~30%
    # recompute for O(depth) activation memory, the standard TPU HBM lever
    # for scaling the ray batch (SURVEY.md sec. "HBM bandwidth")
    remat: bool = False


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    # resume offset: a fresh opt_state at count=0 must yield
    # lrate * 0.1^(start_step/decay_steps).  Folded into init_value because
    # optax SILENTLY CLAMPS a negative transition_begin to 0 (verified:
    # transition_begin=-start is a no-op); exponential decay factors, so
    # scaling init_value by the elapsed decay is exact.
    decay_steps = cfg.lrate_decay * 1000
    schedule = optax.exponential_decay(
        init_value=cfg.lrate * (0.1 ** (cfg.start_step / decay_steps)),
        transition_steps=decay_steps,
        decay_rate=0.1,
        staircase=False,
    )
    return optax.adam(schedule, b1=0.9, b2=0.999)


def _make_apply(model, remat: bool):
    def model_apply(params, x, *, is_test, rng):
        return model.apply({"params": params}, x, is_test=is_test, rng=rng)

    if not remat:
        return model_apply

    _ckpt_train_apply = jax.checkpoint(
        lambda params, x, rng: model_apply(params, x, is_test=False, rng=rng)
    )

    def remat_apply(params, x, *, is_test, rng):
        if is_test:
            return model_apply(params, x, is_test=True, rng=rng)
        return _ckpt_train_apply(params, x, rng)

    return remat_apply


def _make_fused(model, render_config: RenderConfig, remat: bool):
    """Fused flow+composite apply (or None), with the same optional
    rematerialization treatment as the regular apply."""
    from cfnerf_tpu.models.nerf_flows import make_fused_apply

    fused = make_fused_apply(model, render_config.fused)
    if fused is None or not remat:
        return fused

    def remat_fused(params, x, z_pts, d_pts, s_per_ray, *, is_test, rng):
        if is_test:
            return fused(params, x, z_pts, d_pts, s_per_ray,
                         is_test=True, rng=rng)
        ckpt = jax.checkpoint(
            lambda p, xx, z, d, r: fused(p, xx, z, d, s_per_ray,
                                         is_test=False, rng=r)
        )
        return ckpt(params, x, z_pts, d_pts, rng)

    return remat_fused


def make_train_step(
    model,
    render_config: RenderConfig,
    cfg: TrainConfig,
    mesh: Optional[Mesh] = None,
    model_fine=None,
    occ: Optional[OccTrainConfig] = None,
) -> Tuple[Callable, optax.GradientTransformation]:
    """Returns (train_step, optimizer).

    train_step(params, opt_state, batch, rng) -> (params, opt_state, metrics)

    batch dict (leading axes sharded over the data mesh axis when a mesh is
    given):
      rays_o, rays_d: (R, 3); target: (R, 3)
      [colmap_depth] depth_rays_o, depth_rays_d: (D, 3); target_depth: (D,)

    With render_config.n_importance > 0, params must be
    {"coarse": ..., "fine": ...} and the loss follows nerf-pytorch
    hierarchical semantics: NLL on the fine render plus NLL on the coarse
    render, entropy regularizer summed over both networks.

    With `occ` (OccTrainConfig), the step trains at render_config.n_samples
    PROPOSAL-PLACED depths per ray and co-trains the proposal in the same
    jit; opt_state is the wrapped tuple (opt_state, prop_params,
    prop_opt_state) — build it with train_step._wrap_state(opt_state,
    prop_params) from distilled proposal params.
    """
    tx = make_optimizer(cfg)

    model_apply = _make_apply(model, cfg.remat)
    fine_apply = _make_apply(model_fine, cfg.remat) if model_fine is not None else None
    fused_apply = _make_fused(model, render_config, cfg.remat)

    render_rays_fn = make_render_rays(
        model_apply, render_config, fine_apply, fused_apply
    )

    shard_rays = None
    if mesh is not None:
        ray_sharding = NamedSharding(mesh, P(DATA_AXIS))
        shard_rays = lambda x: jax.lax.with_sharding_constraint(x, ray_sharding)

    prop = prop_tx = density_fn = occ_lo = occ_hi = None
    if occ is not None:
        from cfnerf_tpu.ops.occupancy import ProposalMLP, density_query

        if render_config.n_importance > 0:
            raise ValueError("occ training is incompatible with a "
                             "hierarchical fine pass (one placement owner)")
        prop = ProposalMLP(
            width=occ.prop_width, depth=occ.prop_depth,
            multires=occ.prop_multires,
        )
        prop_tx = optax.adam(occ.prop_lr)
        density_fn = density_query(model, render_config)
        occ_lo = jnp.asarray(occ.lo, jnp.float32)
        occ_hi = jnp.asarray(occ.hi, jnp.float32)

    def loss_fn(params, batch, rng, prop_params=None):
        rays_o, rays_d = batch["rays_o"], batch["rays_d"]
        n_rgb = rays_o.shape[0]
        if cfg.colmap_depth:
            rays_o = jnp.concatenate([rays_o, batch["depth_rays_o"]], 0)
            rays_d = jnp.concatenate([rays_d, batch["depth_rays_d"]], 0)

        rays_o, rays_d, viewdirs, near_v, far_v = prepare_rays(
            rays_o, rays_d,
            H=cfg.H, W=cfg.W, focal=cfg.focal, ndc=cfg.ndc,
            use_viewdirs=render_config.use_viewdirs,
            near=cfg.near, far=cfg.far,
        )
        if shard_rays is not None:
            rays_o, rays_d, near_v, far_v = map(shard_rays, (rays_o, rays_d, near_v, far_v))
            if viewdirs is not None:
                viewdirs = shard_rays(viewdirs)

        z_vals = None
        if occ is not None:
            from cfnerf_tpu.ops.occupancy import (
                make_proposal_sigma_fn,
                place_from_sigma,
            )

            rng, rng_place = jax.random.split(rng)
            sigma_fn = make_proposal_sigma_fn(prop, prop_params, occ_lo, occ_hi)
            # stratified u draws (train-mode placement jitter); placement is
            # not differentiated — the proposal learns from its own
            # co-training loss, not through the render.  The floor may ride
            # in the batch as a traced per-step scalar (--occ_floor_anneal)
            # so the schedule costs zero recompiles.
            floor = batch.get("occ_floor", occ.floor)
            z_vals = jax.lax.stop_gradient(
                place_from_sigma(
                    sigma_fn, rays_o, rays_d, near_v, far_v,
                    render_config.n_samples,
                    n_candidates=occ.n_candidates, floor=floor,
                    rng=rng_place,
                )
            )

        out = render_rays_fn(
            params, rays_o, rays_d, viewdirs, near_v, far_v, rng,
            is_test=False, z_vals=z_vals,
        )

        rgbs = out["rgb_map"]  # (R+D, 3, K)
        depth = out["depth_map"]  # (R+D, K)
        depth_k = target_depth = None
        if cfg.colmap_depth:
            rgbs, depth_k = rgbs[:n_rgb], depth[n_rgb:]
            target_depth = batch["target_depth"]

        entropy = out["loss_entropy"]
        if "loss_entropy0" in out:
            entropy = entropy + out["loss_entropy0"]

        if cfg.loss_mode == "mse":
            # baseline (nerf / nerf_dropout) training: plain MSE on the
            # mean-over-K render, nerf-pytorch semantics
            loss = img2mse(rgbs.mean(-1), batch["target"])
            metrics = {
                "loss_nll": jnp.zeros(()),
                "loss_entropy": entropy,
            }
            if depth_k is not None and target_depth is not None:
                d = img2mse(depth_k.mean(-1), target_depth)
                loss = loss + cfg.depth_lambda * d
                metrics["depth_loss"] = d
            metrics["loss"] = loss
        else:
            loss, metrics = total_loss(
                rgbs,
                batch["target"],
                entropy,
                k_samples=cfg.k_samples,
                beta1=cfg.beta1,
                depth_k=depth_k,
                target_depth=target_depth,
                depth_lambda=cfg.depth_lambda,
            )
        if "rgb0" in out:
            # hierarchical: add the coarse loss in the SAME family as the
            # fine loss (nerf-pytorch's img_loss0 semantics).  A KDE NLL on
            # a deterministic baseline's identical K draws degenerates
            # (zero bandwidth, zero gradient) — mse mode must use MSE.
            rgbs0 = out["rgb0"][: rgbs.shape[0]]
            if cfg.loss_mode == "mse":
                loss0 = img2mse(rgbs0.mean(-1), batch["target"])
            else:
                from cfnerf_tpu.train.loss import kde_nll

                loss0 = kde_nll(rgbs0, batch["target"], cfg.k_samples)
            loss = loss + loss0
            metrics["loss_nll0"] = loss0
            metrics["loss"] = loss
        mse = img2mse(rgbs.mean(-1), batch["target"])
        metrics["mse"] = mse
        metrics["psnr"] = mse2psnr(mse)
        return loss, metrics

    def _update(params, opt_state, batch, rng):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    def _update_occ(params, wrapped, batch, rng):
        opt_state, prop_params, prop_opt = wrapped
        rng, rng_pts = jax.random.split(rng)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng, prop_params
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        # proposal co-training: regress log1p(sigma) of the JUST-UPDATED
        # field at uniform aabb points (stop-gradient targets)
        pts_unit = jax.random.uniform(
            rng_pts, (occ.cotrain_points, 3), jnp.float32
        )
        pts_world = occ_lo + pts_unit * (occ_hi - occ_lo)
        target = jax.lax.stop_gradient(
            jnp.log1p(density_fn(params, pts_world))
        )

        def prop_loss_fn(pp):
            pred = jnp.log1p(prop.apply(pp, pts_unit))
            return jnp.mean((pred - target) ** 2)

        prop_loss, prop_grads = jax.value_and_grad(prop_loss_fn)(prop_params)
        prop_updates, prop_opt = prop_tx.update(prop_grads, prop_opt, prop_params)
        prop_params = optax.apply_updates(prop_params, prop_updates)
        metrics["prop_loss"] = prop_loss
        return params, (opt_state, prop_params, prop_opt), metrics

    update = _update if occ is None else _update_occ
    train_step = jax.jit(update)
    train_step._update = update  # shared logic for make_train_loop
    if occ is not None:
        train_step._wrap_state = lambda opt_state, prop_params: (
            opt_state, prop_params, prop_tx.init(prop_params)
        )
    return train_step, tx


def make_train_loop(
    model,
    render_config: RenderConfig,
    cfg: TrainConfig,
    mesh: Optional[Mesh] = None,
    n_inner: int = 10,
    model_fine=None,
    occ: Optional[OccTrainConfig] = None,
) -> Tuple[Callable, optax.GradientTransformation]:
    """Device-resident multi-step trainer: lax.scan over n_inner optimizer
    steps in ONE dispatch.

    TPU-native rationale: per-dispatch host<->device latency (especially
    through remote-tunneled runtimes) dominates small steps; scanning the
    step body on device amortizes it to zero.  Batches for all inner steps
    are pre-sampled on host and stacked on the leading axis.

    train_loop(params, opt_state, batches, rng) -> (params, opt_state,
    stacked_metrics); `batches` leaves have shape (n_inner, ...).
    """
    train_step, tx = make_train_step(
        model, render_config, cfg, mesh, model_fine, occ=occ
    )
    update = train_step._update

    @jax.jit
    def train_loop(params, opt_state, batches, rng):
        keys = jax.random.split(rng, n_inner)

        def body(carry, xs):
            params, opt_state = carry
            batch, key = xs
            params, opt_state, metrics = update(params, opt_state, batch, key)
            return (params, opt_state), metrics

        (params, opt_state), metrics = jax.lax.scan(
            body, (params, opt_state), (batches, keys)
        )
        return params, opt_state, metrics

    if occ is not None:
        train_loop._wrap_state = train_step._wrap_state
    return train_loop, tx
