"""Ensemble-parallel training (parallel/ensemble.py): the vmapped member
axis must reproduce per-member serial training exactly, shard over the
(ensemble, data) mesh, and drive the CLI workflow end-to-end.

The reference has no counterpart (ensembles are M separate script launches,
run_nerf_uncertainty_NF.py:713-716); the correctness anchor is our own
single-run train step, whose parity is pinned by the golden suite."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfnerf_tpu.models.nerf_flows import NeRFFlows
from cfnerf_tpu.parallel.ensemble import (
    DATA_AXIS,
    ENSEMBLE_AXIS,
    create_ensemble_mesh,
    make_ensemble_train_loop,
    make_ensemble_train_step,
    member_keys,
    shard_member_batch,
    shard_member_stacked_batch,
    shard_members,
    stack_members,
    unstack_member,
)
from cfnerf_tpu.render.renderer import RenderConfig
from cfnerf_tpu.train.step import TrainConfig, make_train_step


def _model_and_cfg(k=4):
    model = NeRFFlows(
        net_depth=2, net_width=32, input_ch=63, input_ch_views=27,
        skips=(1,), h_alpha_size=8, h_rgb_size=8, n_flows=2, k_samples=k,
    )
    rc = RenderConfig(n_samples=16)
    tc = TrainConfig(H=8, W=8, focal=10.0, ndc=False, near=0.5, far=4.0,
                     k_samples=k, beta1=0.01)
    return model, rc, tc


def _batch(R=32, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "rays_o": rng.randn(R, 3).astype(np.float32),
        "rays_d": np.concatenate(
            [rng.randn(R, 2) * 0.05, -np.ones((R, 1))], -1
        ).astype(np.float32),
        "target": rng.rand(R, 3).astype(np.float32),
    }


def _member_params(model, m):
    return jax.device_get(model.init(
        jax.random.PRNGKey(m), jnp.zeros((2, 90)), is_test=True
    )["params"])


def test_ensemble_mesh_shapes():
    # gcd placement: the member axis takes what divides evenly
    m = create_ensemble_mesh(2)
    assert m.shape[ENSEMBLE_AXIS] == 2 and m.shape[DATA_AXIS] == 4
    m = create_ensemble_mesh(3)  # 3 does not divide 8 -> members stack
    assert m.shape[ENSEMBLE_AXIS] == 1 and m.shape[DATA_AXIS] == 8
    m = create_ensemble_mesh(8)
    assert m.shape[ENSEMBLE_AXIS] == 8 and m.shape[DATA_AXIS] == 1
    m = create_ensemble_mesh(4, n_devices=4)
    assert m.shape[ENSEMBLE_AXIS] == 4 and m.shape[DATA_AXIS] == 1


def test_vmapped_step_matches_per_member_serial():
    """Two vmapped steps over the (ensemble=2, data=4) mesh == each member
    trained alone with the plain step, same keys and batches."""
    model, rc, tc = _model_and_cfg()
    M = 2
    mesh = create_ensemble_mesh(M)

    params_list = [_member_params(model, m) for m in range(M)]
    keys0 = [jax.random.PRNGKey(100 + m) for m in range(M)]
    batches = [[_batch(seed=10 * m + s) for s in range(2)] for m in range(M)]

    # --- ensemble arm ---
    estep, tx = make_ensemble_train_step(model, rc, tc, mesh)
    p = shard_members(mesh, stack_members(params_list))
    opt = jax.vmap(tx.init)(p)
    keys = member_keys(keys0)
    for s in range(2):
        b = shard_member_batch(
            mesh, {k: np.stack([batches[m][s][k] for m in range(M)])
                   for k in batches[0][0]},
        )
        kk = jax.vmap(lambda k: jax.random.split(k, 2))(keys)
        keys, step_keys = kk[:, 0], kk[:, 1]
        p, opt, metrics = estep(p, opt, b, step_keys)
    p_host = jax.device_get(p)
    m_host = jax.device_get(metrics)

    # --- serial arm: one member at a time through the plain step ---
    sstep, stx = make_train_step(model, rc, tc, mesh=None)
    for m in range(M):
        pm = params_list[m]
        om = stx.init(pm)
        km = keys0[m]
        for s in range(2):
            kk = jax.random.split(km, 2)
            km, sk = kk[0], kk[1]
            pm, om, mm = sstep(pm, om, {k: jnp.asarray(v) for k, v in
                                        batches[m][s].items()}, sk)
        got = unstack_member(p_host, m)
        for a, b_ in zip(jax.tree_util.tree_leaves(got),
                         jax.tree_util.tree_leaves(jax.device_get(pm))):
            np.testing.assert_allclose(a, b_, rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(
            float(m_host["loss"][m]), float(mm["loss"]), rtol=1e-5
        )


def test_ensemble_scan_loop_matches_unrolled():
    """The n_inner scan trainer == the same steps through the single-step
    vmapped path with the scan's upfront key-split scheme."""
    model, rc, tc = _model_and_cfg()
    M, n_inner = 2, 3
    mesh = create_ensemble_mesh(M)

    params_list = [_member_params(model, m) for m in range(M)]
    keys = member_keys([jax.random.PRNGKey(7 + m) for m in range(M)])
    steps = [{k: np.stack([_batch(seed=100 + 10 * m + s)[k] for m in range(M)])
              for k in _batch()} for s in range(n_inner)]

    loop, tx = make_ensemble_train_loop(model, rc, tc, mesh, n_inner=n_inner)
    p = shard_members(mesh, stack_members(params_list))
    opt = jax.vmap(tx.init)(p)
    stacked = shard_member_stacked_batch(
        mesh, {k: np.stack([s[k] for s in steps]) for k in steps[0]}
    )
    p_loop, _, metrics = loop(p, opt, stacked, keys)

    estep, tx2 = make_ensemble_train_step(model, rc, tc, mesh)
    p2 = shard_members(mesh, stack_members(params_list))
    opt2 = jax.vmap(tx2.init)(p2)
    step_keys = jax.vmap(lambda k: jax.random.split(k, n_inner))(keys)
    for s in range(n_inner):
        b = shard_member_batch(mesh, steps[s])
        p2, opt2, m2 = estep(p2, opt2, b, step_keys[:, s])

    for a, b_ in zip(jax.tree_util.tree_leaves(jax.device_get(p_loop)),
                     jax.tree_util.tree_leaves(jax.device_get(p2))):
        np.testing.assert_allclose(a, b_, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(metrics["loss"][-1]), np.asarray(m2["loss"]), rtol=1e-5
    )


def test_vmapped_occ_step_matches_per_member_serial():
    """The occ-stage (proposal-placed) step under the member vmap ==
    each member occ-trained alone: field params, proposal params, and the
    per-member annealed floor (a (M,) batch leaf) all line up.  This is
    the path cli.ensemble train --parallel runs after --occ_train_from.

    Tolerances are looser than the dense-step test: the placement pipeline
    (proposal MLP + triangular-matmul prefix) runs as batched dot_generals
    under vmap, whose f32 accumulation order differs from the serial
    matmuls on CPU; Adam's second-moment normalization then amplifies the
    ~1e-7 grad deltas to ~6e-5 param deltas in one step.  Losses still
    match to ~1e-6 relative — the semantics are identical."""
    from cfnerf_tpu.ops.occupancy import ProposalMLP
    from cfnerf_tpu.train.step import OccTrainConfig

    model, rc, tc = _model_and_cfg()
    occ = OccTrainConfig(lo=(-2.0, -2.0, -4.5), hi=(2.0, 2.0, 0.5),
                         n_candidates=32, cotrain_points=256)
    M = 2
    mesh = create_ensemble_mesh(M)
    prop = ProposalMLP(width=occ.prop_width, depth=occ.prop_depth,
                       multires=occ.prop_multires)

    params_list = [_member_params(model, m) for m in range(M)]
    prop_list = [jax.device_get(prop.init(jax.random.PRNGKey(50 + m)))
                 for m in range(M)]
    keys0 = [jax.random.PRNGKey(200 + m) for m in range(M)]
    floors = [0.3, 0.6]  # distinct per-member anneal values
    batches = [[_batch(seed=30 * m + s, R=64) for s in range(2)]
               for m in range(M)]

    # --- ensemble arm ---
    estep, tx = make_ensemble_train_step(model, rc, tc, mesh, occ=occ)
    p = shard_members(mesh, stack_members(params_list))
    wrapped = estep._wrap_state(
        jax.vmap(tx.init)(p), shard_members(mesh, stack_members(prop_list))
    )
    keys = member_keys(keys0)
    for s in range(2):
        b = {k: np.stack([batches[m][s][k] for m in range(M)])
             for k in batches[0][0]}
        b["occ_floor"] = np.asarray(floors, np.float32)
        b = shard_member_batch(mesh, b)
        kk = jax.vmap(lambda k: jax.random.split(k, 2))(keys)
        keys, step_keys = kk[:, 0], kk[:, 1]
        p, wrapped, metrics = estep(p, wrapped, b, step_keys)
    p_host = jax.device_get(p)
    prop_host = jax.device_get(wrapped[1])
    m_host = jax.device_get(metrics)

    # --- serial arm ---
    sstep, stx = make_train_step(model, rc, tc, mesh=None, occ=occ)
    for m in range(M):
        pm = params_list[m]
        wm = sstep._wrap_state(stx.init(pm), prop_list[m])
        km = keys0[m]
        for s in range(2):
            kk = jax.random.split(km, 2)
            km, sk = kk[0], kk[1]
            bb = {k: jnp.asarray(v) for k, v in batches[m][s].items()}
            bb["occ_floor"] = jnp.float32(floors[m])
            pm, wm, mm = sstep(pm, wm, bb, sk)
        for a, b_ in zip(jax.tree_util.tree_leaves(unstack_member(p_host, m)),
                         jax.tree_util.tree_leaves(jax.device_get(pm))):
            np.testing.assert_allclose(a, b_, rtol=5e-4, atol=5e-4)
        for a, b_ in zip(
            jax.tree_util.tree_leaves(unstack_member(prop_host, m)),
            jax.tree_util.tree_leaves(jax.device_get(wm[1])),
        ):
            np.testing.assert_allclose(a, b_, rtol=5e-4, atol=5e-4)
        for key in ("loss", "prop_loss"):
            np.testing.assert_allclose(
                float(m_host[key][m]), float(mm[key]), rtol=1e-4
            )


def test_member_axis_actually_sharded():
    """Stacked params/batches must physically span the ensemble axis (not
    silently replicate)."""
    model, rc, tc = _model_and_cfg()
    mesh = create_ensemble_mesh(2)
    p = shard_members(mesh, stack_members(
        [_member_params(model, m) for m in range(2)]
    ))
    leaf = jax.tree_util.tree_leaves(p)[0]
    # member axis sharded in 2: each shard holds one member's slice
    shard_shapes = {s.data.shape for s in leaf.addressable_shards}
    assert all(sh[0] == leaf.shape[0] // 2 for sh in shard_shapes), shard_shapes
    b = shard_member_batch(mesh, {
        "rays_o": np.zeros((2, 32, 3), np.float32)})
    sh = {s.data.shape for s in b["rays_o"].addressable_shards}
    assert sh == {(1, 8, 3)}, sh  # (members/2, rays/4, 3)


@pytest.mark.slow
def test_ensemble_parallel_cli_e2e(tmp_path):
    """CLI: --parallel training writes per-member checkpoints the standard
    eval_ensemble consumes; resuming with mismatched member steps fails
    loudly."""
    from tests.datagen import make_blender_dataset

    from cfnerf_tpu.cli.ensemble import eval_ensemble, train_ensemble_parallel
    from cfnerf_tpu.utils.config import config_parser

    datadir = make_blender_dataset(str(tmp_path / "lego"), H=8, W=8, n_val=1)
    basedir = str(tmp_path / "logs")
    parser = config_parser()
    parser.add_argument("--n_members", type=int, default=2)
    args = parser.parse_args(
        [
            "--expname", "ensp", "--dataname", "tiny", "--basedir", basedir,
            "--datadir", datadir, "--dataset_type", "blender",
            "--N_rand", "16", "--N_samples", "8", "--K_samples", "4",
            "--n_flows", "2", "--h_alpha_size", "8", "--h_rgb_size", "8",
            "--netdepth", "2", "--netwidth", "16",
            "--type_flows", "triangular", "--use_viewdirs", "--white_bkgd",
            "--no_ndc", "--testskip", "1",
            "--n_iters", "4", "--i_print", "2", "--i_weights", "4",
            "--i_img", "0", "--chunk", "64", "--is_train",
        ]
    )
    train_ensemble_parallel(args, 2)
    rundir = os.path.join(basedir, "tiny", "triangular", "ensp")
    names = os.listdir(rundir)
    assert any(n.endswith("000004_01") for n in names), names
    assert any(n.endswith("000004_02") for n in names), names

    summary = eval_ensemble(args, 2)
    assert summary["n_members"] == 2
    for key in ("psnr", "ssim", "nll", "ause"):
        assert np.isfinite(summary[key])

    # per-member held-out val stream (round 5: feeds --gate_metric
    # val_psnr / val_nll): tagged scalars logged at i_print cadence
    mfile = os.path.join(basedir, "tiny", "summaries", "ensp",
                         "metrics.jsonl")
    recs = [json.loads(l) for l in open(mfile)]
    for key in ("val/psnr_m01", "val/psnr_m02",
                "val/nll_m01", "val/nll_m02"):
        assert any(key in r for r in recs), key
        assert all(np.isfinite(r.get(key, 0.0)) for r in recs)

    # scan-trainer flavor + K-schedule stage boundary on resume
    args.n_inner = 2
    args.n_iters = 8
    args.k_schedule = "2:0,4:6"
    train_ensemble_parallel(args, 2)
    names = os.listdir(rundir)
    assert any(n.endswith("000008_01") for n in names), names
