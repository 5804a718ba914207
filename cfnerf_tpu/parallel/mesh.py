"""Device mesh + sharding layout.

The reference's ONLY parallelism is single-process nn.DataParallel over the
point batch (/root/reference/run_nerf_uncertainty_NF.py:330) — replicate,
scatter, gather every forward over NCCL.  The TPU-native equivalent: rays
are embarrassingly parallel (no cross-ray communication exists anywhere in
the CF-NeRF math), so we lay a 1-D `data` mesh over ICI, shard the ray axis
of every batch array, replicate the ~10-50M-param model, and let jit insert
one gradient all-reduce (psum over ICI) per step.  A 2-D mesh (data x
model) is accepted for pod-scale runs; the model axis is currently used
with fully-replicated parameters (the model is small) but the layout keeps
the door open for sharding the trunk width.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    n_devices: Optional[int] = None,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
    model_parallel: int = 1,
) -> Mesh:
    """1-D (or 2-D) mesh over the available devices.

    n_devices defaults to all of jax.devices().  With model_parallel > 1 the
    mesh is (data, model) shaped (n/mp, mp) so model-axis collectives ride
    the fastest ICI links (innermost axis).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    dev_array = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place every array in a batch pytree with its ray axis sharded.
    Rank-0 leaves (per-step scalars, e.g. the annealed occ floor) are
    replicated."""
    sharding = ray_sharding(mesh)
    rep = replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding if np.ndim(x) >= 1 else rep),
        batch,
    )


def shard_stacked_batch(mesh: Mesh, batch: Any) -> Any:
    """For scan-trainer batches (n_inner, R, ...): replicate the inner-step
    axis, shard the ray axis (axis 1) across the data mesh axis.  Leaves
    with only the inner-step axis (per-step scalars) are replicated."""
    sharding = NamedSharding(mesh, P(None, DATA_AXIS))
    rep = NamedSharding(mesh, P(None))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding if np.ndim(x) >= 2 else rep),
        batch,
    )


def replicate(mesh: Mesh, tree: Any) -> Any:
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def shard_params_tp(mesh: Mesh, params: Any) -> Any:
    """Tensor-parallel placement: split every trunk/head kernel's OUTPUT
    (width) axis across the model mesh axis; biases likewise; everything
    else (flow base-dist scalars, amortization heads — tiny) replicated.

    The CF-NeRF model is small enough to replicate (SURVEY.md section
    5.8), so this is the pod-scale door-opener, not a single-host win:
    with params placed this way, GSPMD propagates the width sharding
    through the matmul chain and inserts the all-gathers/reduce-scatters
    itself — no model code changes.  Numerical equivalence with the
    replicated layout is pinned by tests/test_sharding.py."""
    if mesh.shape.get(MODEL_AXIS, 1) == 1:
        return replicate(mesh, params)

    width_kernel = NamedSharding(mesh, P(None, MODEL_AXIS))
    width_bias = NamedSharding(mesh, P(MODEL_AXIS))
    repl = replicated_sharding(mesh)

    def place(path, x):
        names = [getattr(p, "key", str(p)) for p in path]
        leaf = names[-1] if names else ""
        # match the wide modules at ANY depth: hierarchical param trees
        # nest them under "coarse"/"fine" (factory.create_nerf)
        # h_alpha/h_rgb are included so the encode fan-out fusion
        # (models/nerf_flows.py encode: fanout_concat of feature_linear +
        # h_alpha_linear) concatenates two kernels sharded the same way on
        # the output axis instead of forcing GSPMD to reshard the fused
        # matmul every step (ADVICE r01)
        wide = any(
            n.startswith("pts_linear")
            or n in ("feature_linear", "views_linear",
                     "h_alpha_linear", "h_rgb_linear")
            for n in names[:-1]
        )
        if wide and x.ndim >= 1:
            sh = width_kernel if leaf == "kernel" else width_bias
            return jax.device_put(x, sh)
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map_with_path(place, params)
