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

    def loss_fn(params, batch, rng):
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

        out = render_rays_fn(
            params, rays_o, rays_d, viewdirs, near_v, far_v, rng, is_test=False
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

    train_step = jax.jit(_update)
    train_step._update = _update  # shared logic for make_train_loop
    return train_step, tx


def make_train_loop(
    model,
    render_config: RenderConfig,
    cfg: TrainConfig,
    mesh: Optional[Mesh] = None,
    n_inner: int = 10,
    model_fine=None,
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
    train_step, tx = make_train_step(model, render_config, cfg, mesh, model_fine)
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

    return train_loop, tx
