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

    def argv(n_iters):
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
            "--i_img", "0", "--chunk", "64", "--is_train",
        ])

    train(argv(8))  # crosses the occ boundary at step 4, saves at 6
    rundir = os.path.join(basedir, "tiny", "triangular", "e")
    assert any(f.startswith("000006") for f in os.listdir(rundir))
    train(argv(12))  # resumes at 6 INSIDE the occ stage -> re-distills
    mfile = os.path.join(basedir, "tiny", "summaries", "e", "metrics.jsonl")
    steps = [int(__import__("json").loads(l)["step"]) for l in open(mfile)]
    assert max(steps) >= 12


if __name__ == "__main__":
    test_occ_step_updates_field_and_proposal()
