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
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

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
    beta1: float = 0.0
    colmap_depth: bool = False
    depth_lambda: float = 0.1
    # rematerialize the model forward in the backward pass: trades ~30%
    # recompute for O(depth) activation memory, the standard TPU HBM lever
    # for scaling the ray batch (SURVEY.md sec. "HBM bandwidth")
    remat: bool = False


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    schedule = optax.exponential_decay(
        init_value=cfg.lrate,
        transition_steps=cfg.lrate_decay * 1000,
        decay_rate=0.1,
        staircase=False,
    )
    return optax.adam(schedule, b1=0.9, b2=0.999)


def make_train_step(
    model,
    render_config: RenderConfig,
    cfg: TrainConfig,
    mesh: Optional[Mesh] = None,
) -> Tuple[Callable, optax.GradientTransformation]:
    """Returns (train_step, optimizer).

    train_step(params, opt_state, batch, rng) -> (params, opt_state, metrics)

    batch dict (leading axes sharded over the data mesh axis when a mesh is
    given):
      rays_o, rays_d: (R, 3); target: (R, 3)
      [colmap_depth] depth_rays_o, depth_rays_d: (D, 3); target_depth: (D,)
    """
    tx = make_optimizer(cfg)

    def model_apply(params, x, *, is_test, rng):
        return model.apply({"params": params}, x, is_test=is_test, rng=rng)

    if cfg.remat:
        _base_apply = model_apply
        _ckpt_train_apply = jax.checkpoint(
            lambda params, x, rng: _base_apply(params, x, is_test=False, rng=rng)
        )

        def model_apply(params, x, *, is_test, rng):  # noqa: F811
            if is_test:
                return _base_apply(params, x, is_test=True, rng=rng)
            return _ckpt_train_apply(params, x, rng)

    render_rays_fn = make_render_rays(model_apply, render_config)

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

        loss, metrics = total_loss(
            rgbs,
            batch["target"],
            out["loss_entropy"],
            k_samples=cfg.k_samples,
            beta1=cfg.beta1,
            depth_k=depth_k,
            target_depth=target_depth,
            depth_lambda=cfg.depth_lambda,
        )
        mse = img2mse(rgbs.mean(-1), batch["target"])
        metrics["mse"] = mse
        metrics["psnr"] = mse2psnr(mse)
        return loss, metrics

    @jax.jit
    def train_step(params, opt_state, batch, rng):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return train_step, tx
