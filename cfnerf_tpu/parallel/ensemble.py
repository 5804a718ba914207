"""Ensemble-parallel training: every member in ONE jit over an
(ensemble, data) mesh.

Reference counterpart: CF-NeRF ensembles exist only as checkpoint-name
indices (--index_ensembles, /root/reference/run_nerf_uncertainty_NF.py:713-716,
:1086); training M members means launching the script M times, serially or
on M separate GPUs.  Our cli.ensemble `train` reproduces that serial
workflow.

TPU-native design: ensemble members are INDEPENDENT until eval-time mixture
aggregation — there is no cross-member math in training at all — so the
member axis is pure SPMD.  We stack the member axis onto params / optimizer
state / batches / rng keys, `jax.vmap` the existing train step over it, and
lay the axis onto the mesh with `ensemble` outermost:

    mesh: (ensemble=E, data=D)   params leaf:  (M, ...)  -> P('ensemble')
                                 batch leaf:   (M, R, .) -> P('ensemble','data')

GSPMD then runs each member's forward/backward on its own device slice with
ZERO inter-member collectives (the gradient all-reduce is per-member, over
the data axis only).  M members train in ~the wall-time of one — the
embarrassing parallelism the reference leaves to a cluster scheduler rides
ICI instead.  When M exceeds the mesh's ensemble axis, members stack
(gcd placement) and XLA simply batches them — the same code covers
1 chip (vmap = batched matmuls) through a pod slice (1 member per chip).

No reference file is mirrored here; the step semantics being vmapped are
pinned by train/step.py's own parity suite, and tests/test_ensemble_parallel.py
pins vmapped-step == per-member-serial-step equivalence.
"""
from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cfnerf_tpu.parallel.mesh import DATA_AXIS
from cfnerf_tpu.train.step import OccTrainConfig, TrainConfig, make_train_step

ENSEMBLE_AXIS = "ensemble"


def create_ensemble_mesh(
    n_members: int,
    n_devices: Optional[int] = None,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """(ensemble, data) mesh sized for M members over the available devices.

    The ensemble axis gets gcd(M, n_devices) devices — every member axis of
    size M shards evenly over it (members stack per device when M > axis),
    and the remaining devices form the per-member data axis.  M=1 degrades
    to the plain 1-D data mesh layout (ensemble axis of size 1).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    e = math.gcd(max(1, n_members), n)
    dev_array = np.asarray(devices).reshape(e, n // e)
    return Mesh(dev_array, (ENSEMBLE_AXIS, DATA_AXIS))


def stack_members(trees: List[Any]) -> Any:
    """Stack per-member pytrees on a new leading member axis (host-side)."""
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *trees)


def unstack_member(tree: Any, m: int) -> Any:
    """Slice member m's pytree back out of the stacked tree."""
    return jax.tree_util.tree_map(lambda x: np.asarray(x)[m], tree)


def shard_members(mesh: Mesh, tree: Any) -> Any:
    """Place a stacked (M, ...) pytree: member axis over the ensemble mesh
    axis, everything else replicated within the member's device slice.
    Rank-0 leaves (per-member-invariant scalars) are replicated."""
    member = NamedSharding(mesh, P(ENSEMBLE_AXIS))
    rep = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, member if np.ndim(x) >= 1 else rep), tree
    )


def shard_member_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a stacked batch: (M, R, ...) leaves shard member axis over
    `ensemble` and the ray axis over `data`; (M,) leaves (per-member
    scalars, e.g. an annealed occ floor) over `ensemble` only."""
    ray = NamedSharding(mesh, P(ENSEMBLE_AXIS, DATA_AXIS))
    member = NamedSharding(mesh, P(ENSEMBLE_AXIS))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, ray if np.ndim(x) >= 2 else member), batch
    )


def shard_member_stacked_batch(mesh: Mesh, batches: Any) -> Any:
    """Scan-trainer variant: leaves are (n_inner, M, R, ...) — replicate the
    inner-step axis, shard member/ray axes as in shard_member_batch."""
    ray = NamedSharding(mesh, P(None, ENSEMBLE_AXIS, DATA_AXIS))
    member = NamedSharding(mesh, P(None, ENSEMBLE_AXIS))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, ray if np.ndim(x) >= 3 else member),
        batches,
    )


def member_keys(seed_keys: Sequence[Any]) -> jnp.ndarray:
    """Stack per-member PRNG keys into the (M, ...) key array the vmapped
    step consumes."""
    return jnp.stack([jnp.asarray(k) for k in seed_keys])


def make_ensemble_train_step(
    model,
    render_config,
    cfg: TrainConfig,
    mesh: Optional[Mesh] = None,
    model_fine=None,
    occ: Optional[OccTrainConfig] = None,
) -> Tuple[Any, optax.GradientTransformation]:
    """vmap the single-run train step over a leading member axis.

    Returns (step, tx):
      step(params_M, opt_state_M, batch_M, keys_M)
        -> (params_M, opt_state_M, metrics_M)
    where every input/output pytree leaf carries a leading member axis
    (including optimizer-state scalars: build opt_state with
    `jax.vmap(tx.init)(params_M)`, NOT `tx.init(params_M)` — the latter
    leaves Adam's step count unstacked and the vmap in_axes=0 contract
    broken).

    The base step is built WITHOUT an inner mesh constraint; the sharding
    comes entirely from input placement (shard_members /
    shard_member_batch) and GSPMD propagation — `with_sharding_constraint`
    inside vmap would bind the wrong rank.
    """
    base_step, tx = make_train_step(
        model, render_config, cfg, mesh=None, model_fine=model_fine, occ=occ
    )
    vupdate = jax.vmap(base_step._update)
    step = jax.jit(vupdate)
    step._vupdate = vupdate
    if occ is not None:
        # stacked analogue of base_step._wrap_state: prop opt-state must be
        # per-member-stacked the same way (vmapped init)
        _prop_tx = optax.adam(occ.prop_lr)
        step._wrap_state = lambda opt_state_M, prop_params_M: (
            opt_state_M, prop_params_M, jax.vmap(_prop_tx.init)(prop_params_M)
        )
    return step, tx


def make_ensemble_train_loop(
    model,
    render_config,
    cfg: TrainConfig,
    mesh: Optional[Mesh] = None,
    n_inner: int = 10,
    model_fine=None,
    occ: Optional[OccTrainConfig] = None,
) -> Tuple[Any, optax.GradientTransformation]:
    """Device-resident scan over n_inner vmapped member steps — the
    ensemble analogue of train/step.py:make_train_loop.

    loop(params_M, opt_state_M, batches, keys_M) -> (params_M, opt_state_M,
    metrics); `batches` leaves are (n_inner, M, ...), keys_M is the (M,)
    per-member key stack.  Each member's key splits upfront into n_inner
    per-step keys (the same scheme make_train_loop uses for one run), so
    each member consumes its own independent RNG stream; the caller
    advances keys_M between dispatches (e.g. fold_in the dispatch index).
    """
    step, tx = make_ensemble_train_step(
        model, render_config, cfg, mesh, model_fine, occ=occ
    )
    vupdate = step._vupdate

    @jax.jit
    def train_loop(params, opt_state, batches, keys):
        # (M, n_inner, key) -> scan axis first
        step_keys = jax.vmap(lambda k: jax.random.split(k, n_inner))(keys)
        step_keys = jnp.swapaxes(step_keys, 0, 1)

        def body(carry, xs):
            params, opt_state = carry
            batch, kk = xs
            params, opt_state, metrics = vupdate(params, opt_state, batch, kk)
            return (params, opt_state), metrics

        (params, opt_state), metrics = jax.lax.scan(
            body, (params, opt_state), (batches, step_keys)
        )
        return params, opt_state, metrics

    if occ is not None:
        train_loop._wrap_state = step._wrap_state
    return train_loop, tx
