"""Proposal-placed training (train/step.py OccTrainConfig — the occ stage).

No reference counterpart (the reference trains every ray on the dense
hardcoded schedule, run_nerf_uncertainty_NF.py:510-532).  Pins:
  * the occ step runs and optimizes BOTH the field and the proposal
    (prop_loss falls) with finite metrics,
  * the e2e CLI path: dense warmup -> occ stage boundary (distill + state
    wrap) -> checkpoint save with the wrapped opt_state -> resume
    (re-distill) — the full staging machinery,
  * quality: on the drive-recipe blob scene, a dense-warmup + occ-placed
    run keeps learning after the switch (loss keeps falling, final PSNR in
    the healthy band).
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.datagen import make_blender_dataset

from cfnerf_tpu.models.nerf_flows import NeRFFlows
from cfnerf_tpu.ops.occupancy import ProposalMLP
from cfnerf_tpu.render.renderer import RenderConfig
from cfnerf_tpu.train.loop import train
from cfnerf_tpu.train.step import OccTrainConfig, TrainConfig, make_train_step
from cfnerf_tpu.utils.config import parse_args


def _setup(occ, n_samples=8, k=4):
    model = NeRFFlows(
        net_depth=2, net_width=16, input_ch=63, input_ch_views=27,
        skips=(1,), h_alpha_size=8, h_rgb_size=8, n_flows=2, k_samples=k,
        use_viewdirs=True, type_flows="triangular",
    )
    rc = RenderConfig(n_samples=n_samples, perturb=True, use_viewdirs=True)
    tc = TrainConfig(H=16, W=16, focal=20.0, ndc=False, near=0.5, far=4.0,
                     k_samples=k, beta1=0.01)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 90)), is_test=True
    )["params"]
    step, tx = make_train_step(model, rc, tc, occ=occ)
    return model, params, step, tx


def _batch(R=64, seed=0):
    rng = np.random.RandomState(seed)
    rd = np.concatenate([rng.randn(R, 2) * 0.05, -np.ones((R, 1))], -1)
    return {
        "rays_o": jnp.asarray(rng.randn(R, 3) * 0.1, jnp.float32),
        "rays_d": jnp.asarray(rd, jnp.float32),
        "target": jnp.asarray(rng.rand(R, 3), jnp.float32),
    }


def test_occ_floor_schedule():
    """occ_floor_for_step: linear anneal indexed by GLOBAL step (resume
    lands mid-schedule correctly), clamped both sides, off -> end floor."""
    from cfnerf_tpu.train.loop import occ_floor_for_step

    assert occ_floor_for_step(0, 100, 0, 1.0, 0.3) == 0.3       # anneal off
    assert occ_floor_for_step(50, 100, 10, 1.0, 0.3) == 1.0     # pre-boundary
    assert occ_floor_for_step(100, 100, 10, 1.0, 0.3) == 1.0    # boundary
    assert occ_floor_for_step(105, 100, 10, 1.0, 0.3) == pytest.approx(0.65)
    assert occ_floor_for_step(110, 100, 10, 1.0, 0.3) == pytest.approx(0.3)
    assert occ_floor_for_step(9999, 100, 10, 1.0, 0.3) == pytest.approx(0.3)


def test_place_floor_traced_and_uniform_limit():
    """The placement floor works as a traced scalar (one compile serves the
    whole anneal schedule) and a dominant floor recovers uniform placement:
    inverse-CDF of a uniform pdf is the identity, so det z == linspace."""
    from cfnerf_tpu.ops.occupancy import place_from_sigma

    R, N = 8, 12
    rng = np.random.RandomState(0)
    rays_o = jnp.asarray(rng.randn(R, 3) * 0.1, jnp.float32)
    rays_d = jnp.asarray(
        np.concatenate([rng.randn(R, 2) * 0.05, -np.ones((R, 1))], -1),
        jnp.float32,
    )
    sigma_fn = lambda pts: jnp.exp(-jnp.sum(pts**2, -1))  # peaked proxy

    traces = []

    @jax.jit
    def place(floor):
        traces.append(1)
        return place_from_sigma(
            sigma_fn, rays_o, rays_d, 0.5, 4.0, N,
            n_candidates=32, floor=floor,
        )

    z_hi = place(jnp.float32(1e6))
    z_lo = place(jnp.float32(0.01))
    assert len(traces) == 1  # floor is traced, not baked
    assert not np.allclose(z_hi, z_lo)
    expect = 0.5 + np.linspace(0.0, 1.0, N, dtype=np.float32) * 3.5
    np.testing.assert_allclose(np.asarray(z_hi), np.tile(expect, (R, 1)),
                               rtol=0, atol=2e-3)


def test_occ_step_reads_floor_from_batch():
    """--occ_floor_anneal rides the floor in the batch: the SAME compiled
    occ step takes different placements (hence losses) per floor value."""
    occ = OccTrainConfig(lo=(-2.0, -2.0, -4.5), hi=(2.0, 2.0, 0.5),
                         n_candidates=32, cotrain_points=256)
    model, params, step, tx = _setup(occ)
    prop = ProposalMLP(width=occ.prop_width, depth=occ.prop_depth,
                       multires=occ.prop_multires)
    wrapped = step._wrap_state(tx.init(params), prop.init(jax.random.PRNGKey(1)))
    b = _batch()
    rng = jax.random.PRNGKey(3)

    def run(floor):
        bb = dict(b)
        bb["occ_floor"] = jnp.float32(floor)
        _, _, m = step(params, wrapped, bb, rng)
        return float(m["loss"])

    l_uniform, l_peaked = run(1.0), run(0.01)
    assert np.isfinite([l_uniform, l_peaked]).all()
    assert l_uniform != l_peaked


def test_shard_batch_scalar_leaves():
    """Per-step scalar leaves (the annealed floor) replicate instead of
    taking the ray sharding; stacked (n_inner,) leaves likewise."""
    from cfnerf_tpu.parallel.mesh import (
        create_mesh, shard_batch, shard_stacked_batch,
    )

    mesh = create_mesh(8)
    b = shard_batch(mesh, {"rays_o": np.zeros((16, 3), np.float32),
                           "occ_floor": np.float32(0.5)})
    assert b["occ_floor"].shape == ()
    assert float(b["occ_floor"]) == 0.5
    s = shard_stacked_batch(
        mesh, {"rays_o": np.zeros((4, 16, 3), np.float32),
               "occ_floor": np.linspace(1.0, 0.3, 4).astype(np.float32)})
    assert s["occ_floor"].shape == (4,)
    np.testing.assert_allclose(np.asarray(s["occ_floor"]),
                               np.linspace(1.0, 0.3, 4), rtol=1e-6)


def test_occ_step_updates_field_and_proposal():
    occ = OccTrainConfig(lo=(-2.0, -2.0, -4.5), hi=(2.0, 2.0, 0.5),
                         n_candidates=32, cotrain_points=512)
    model, params, step, tx = _setup(occ)
    prop = ProposalMLP(width=occ.prop_width, depth=occ.prop_depth,
                       multires=occ.prop_multires)
    wrapped = step._wrap_state(tx.init(params), prop.init(jax.random.PRNGKey(1)))

    losses, plosses = [], []
    rng = jax.random.PRNGKey(2)
    for s in range(8):
        rng, k = jax.random.split(rng)
        params, wrapped, metrics = step(params, wrapped, _batch(seed=s), k)
        losses.append(float(metrics["loss"]))
        plosses.append(float(metrics["prop_loss"]))
    assert np.isfinite(losses).all() and np.isfinite(plosses).all()
    # both optimizations make progress
    assert losses[-1] < losses[0]
    assert plosses[-1] < plosses[0]
    # the wrapped state carries updated proposal params
    _, prop_params, _ = wrapped
    assert all(np.isfinite(np.asarray(v)).all() for v in prop_params.values())


@pytest.mark.slow
def test_occ_train_cli_stage_boundary_ckpt_resume(tmp_path):
    """Dense warmup -> occ boundary (distill+wrap) -> save wrapped opt_state
    -> resume INTO the occ stage (re-distill from the checkpoint)."""
    datadir = make_blender_dataset(str(tmp_path / "lego"), H=8, W=8, n_val=1)
    basedir = str(tmp_path / "logs")

    def argv(n_iters, extra=()):
        return parse_args([
            "--expname", "e", "--dataname", "tiny", "--basedir", basedir,
            "--datadir", datadir, "--dataset_type", "blender",
            "--N_rand", "32", "--N_samples", "16", "--K_samples", "4",
            "--n_flows", "2", "--h_alpha_size", "8", "--h_rgb_size", "8",
            "--netdepth", "2", "--netwidth", "32",
            "--type_flows", "triangular", "--use_viewdirs", "--white_bkgd",
            "--no_ndc", "--testskip", "1",
            "--occ_train", "8", "--occ_train_from", "4",
            "--occ_candidates", "16",
            "--n_iters", str(n_iters), "--i_print", "4", "--i_weights", "6",
            "--i_img", "0", "--chunk", "64", "--is_train", *extra,
        ])

    train(argv(8))  # crosses the occ boundary at step 4, saves at 6
    rundir = os.path.join(basedir, "tiny", "triangular", "e")
    assert any(f.startswith("000006") for f in os.listdir(rundir))
    # resume at 6 INSIDE the occ stage (re-distills), with the floor anneal
    # riding in the batch, through the scan trainer, across the
    # --occ_train_until boundary back into a dense cooldown (state unwrap)
    train(argv(12, ("--occ_floor_anneal", "4", "--occ_train_until", "10",
                    "--n_inner", "2")))
    mfile = os.path.join(basedir, "tiny", "summaries", "e", "metrics.jsonl")
    steps = [int(__import__("json").loads(l)["step"]) for l in open(mfile)]
    assert max(steps) >= 12


if __name__ == "__main__":
    test_occ_step_updates_field_and_proposal()
