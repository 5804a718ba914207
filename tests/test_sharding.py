"""Mesh/sharding correctness: the data-parallel train step over 8 virtual
devices must produce the same numbers as single-device execution (the DP
all-reduce is inserted by jit — SURVEY.md section 5.8)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfnerf_tpu.models.nerf_flows import NeRFFlows
from cfnerf_tpu.parallel.mesh import (
    DATA_AXIS,
    create_mesh,
    ray_sharding,
    replicate,
    shard_batch,
)
from cfnerf_tpu.render.renderer import RenderConfig
from cfnerf_tpu.train.step import TrainConfig, make_train_step


def _setup(mesh):
    model = NeRFFlows(
        net_depth=2, net_width=32, input_ch=63, input_ch_views=27,
        skips=(1,), h_alpha_size=8, h_rgb_size=8, n_flows=2, k_samples=4,
    )
    rc = RenderConfig(n_samples=16)
    tc = TrainConfig(H=8, W=8, focal=10.0, ndc=False, near=0.5, far=4.0,
                     k_samples=4, beta1=0.01)
    step, tx = make_train_step(model, rc, tc, mesh=mesh)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 90)), is_test=True)["params"]
    return step, tx, params


def _batch(R=64, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "rays_o": jnp.asarray(rng.randn(R, 3).astype(np.float32)),
        "rays_d": jnp.asarray(
            np.concatenate([rng.randn(R, 2) * 0.05, -np.ones((R, 1))], -1).astype(np.float32)
        ),
        "target": jnp.asarray(rng.rand(R, 3).astype(np.float32)),
    }


def test_mesh_shapes():
    mesh = create_mesh()
    assert mesh.shape[DATA_AXIS] == 8
    mesh2 = create_mesh(4)
    assert mesh2.shape[DATA_AXIS] == 4
    mesh3 = create_mesh(model_parallel=2)
    assert mesh3.shape[DATA_AXIS] == 4 and mesh3.shape["model"] == 2


@pytest.mark.slow
def test_dp_matches_single_device():
    batch = _batch()
    key = jax.random.PRNGKey(7)

    mesh8 = create_mesh(8)
    step8, tx8, params = _setup(mesh8)
    p8 = replicate(mesh8, params)
    o8 = tx8.init(p8)
    b8 = shard_batch(mesh8, batch)
    p8_out, _, m8 = step8(p8, o8, b8, key)

    mesh1 = create_mesh(1)
    step1, tx1, _ = _setup(mesh1)
    p1 = replicate(mesh1, params)
    o1 = tx1.init(p1)
    b1 = shard_batch(mesh1, batch)
    p1_out, _, m1 = step1(p1, o1, b1, key)

    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m8["psnr"]), float(m1["psnr"]), rtol=1e-5)
    # updated parameters identical (all-reduced grads == full-batch grads)
    for a, b in zip(jax.tree_util.tree_leaves(p8_out), jax.tree_util.tree_leaves(p1_out)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)


@pytest.mark.slow
def test_dp_matches_single_device_fused():
    """The fused flow+composite Pallas render core (interpret mode) under
    the 8-device DP mesh: GSPMD must still produce single-device numbers
    (the pallas_call is opaque to the partitioner — this pins that the
    surrounding sharded step stays correct)."""
    def setup(mesh):
        model = NeRFFlows(
            net_depth=2, net_width=32, input_ch=63, input_ch_views=27,
            skips=(1,), h_alpha_size=8, h_rgb_size=8, n_flows=2,
            k_samples=8,
        )
        # R=128, S=64 -> B=8192: the fused kernel's supported() shape
        rc = RenderConfig(n_samples=64, fused="interpret")
        tc = TrainConfig(H=8, W=8, focal=10.0, ndc=False, near=0.5,
                         far=4.0, k_samples=8, beta1=0.01)
        step, tx = make_train_step(model, rc, tc, mesh=mesh)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((2, 90)), is_test=True
        )["params"]
        return step, tx, params

    batch = _batch(R=128)
    key = jax.random.PRNGKey(7)

    mesh8 = create_mesh(8)
    step8, tx8, params = setup(mesh8)
    p8 = replicate(mesh8, params)
    p8_out, _, m8 = step8(p8, tx8.init(p8), shard_batch(mesh8, batch), key)

    step1, tx1, _ = setup(None)
    p1_out, _, m1 = step1(params, tx1.init(params), batch, key)

    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p8_out),
                    jax.tree_util.tree_leaves(p1_out)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


@pytest.mark.slow
@pytest.mark.parametrize("fused", ["off", "interpret"])
def test_tp_matches_single_device(fused):
    """2-D (data=4, model=2) mesh with the trunk width tensor-parallel
    (shard_params_tp): GSPMD inserts the collectives; numbers must match
    single-device execution — with and without the fused Pallas render
    core on the hot path."""
    import dataclasses

    from cfnerf_tpu.parallel.mesh import shard_params_tp

    def setup(mesh):
        model = NeRFFlows(
            net_depth=2, net_width=32, input_ch=63, input_ch_views=27,
            skips=(1,), h_alpha_size=8, h_rgb_size=8, n_flows=2, k_samples=4,
        )
        # R=128/S=64 qualifies for the fused kernel's supported() shapes
        rc = RenderConfig(n_samples=64, fused=fused)
        tc = TrainConfig(H=8, W=8, focal=10.0, ndc=False, near=0.5, far=4.0,
                         k_samples=4, beta1=0.01)
        step, tx = make_train_step(model, rc, tc, mesh=mesh)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((2, 90)), is_test=True
        )["params"]
        return step, tx, params

    batch = _batch(R=128)
    key = jax.random.PRNGKey(7)

    mesh = create_mesh(8, model_parallel=2)
    step_tp, tx_tp, params = setup(mesh)
    p_tp = shard_params_tp(mesh, params)
    # placement sanity: a trunk kernel is split over the model axis
    k0 = p_tp["pts_linear_0"]["kernel"]
    shard_cols = {s.data.shape[1] for s in k0.addressable_shards}
    assert shard_cols == {k0.shape[1] // 2}
    p_out, _, m_tp = step_tp(p_tp, tx_tp.init(p_tp), shard_batch(mesh, batch), key)

    step1, tx1, _ = setup(None)
    p1_out, _, m1 = step1(params, tx1.init(params), batch, key)

    np.testing.assert_allclose(float(m_tp["loss"]), float(m1["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_out),
                    jax.tree_util.tree_leaves(p1_out)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


@pytest.mark.slow
def test_tp_matches_single_device_fanout_branch():
    """TP parity through the encode fan-out fusion (ADVICE r01): with
    depth >= 3 and the skip NOT at the last trunk layer, `h` reaches the
    heads as a plain array, so encode takes the fanout_concat branch
    (feature_linear + h_alpha_linear fused into one matmul) — which under
    --model_parallel concatenates two width-sharded kernels.  Numbers must
    match single-device execution."""
    from cfnerf_tpu.parallel.mesh import shard_params_tp

    def setup(mesh):
        model = NeRFFlows(
            net_depth=3, net_width=32, input_ch=63, input_ch_views=27,
            skips=(1,), h_alpha_size=8, h_rgb_size=8, n_flows=2, k_samples=4,
        )
        rc = RenderConfig(n_samples=16)
        tc = TrainConfig(H=8, W=8, focal=10.0, ndc=False, near=0.5, far=4.0,
                         k_samples=4, beta1=0.01)
        step, tx = make_train_step(model, rc, tc, mesh=mesh)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((2, 90)), is_test=True
        )["params"]
        return step, tx, params

    batch = _batch(R=64)
    key = jax.random.PRNGKey(7)

    mesh = create_mesh(8, model_parallel=2)
    step_tp, tx_tp, params = setup(mesh)
    p_tp = shard_params_tp(mesh, params)
    # both fan-out heads are split over the model axis, matching
    # feature_linear, so the fused concat needs no resharding
    for name in ("feature_linear", "h_alpha_linear"):
        k = p_tp[name]["kernel"]
        shard_cols = {s.data.shape[1] for s in k.addressable_shards}
        assert shard_cols == {k.shape[1] // 2}, name
    p_out, _, m_tp = step_tp(p_tp, tx_tp.init(p_tp), shard_batch(mesh, batch), key)

    step1, tx1, _ = setup(None)
    p1_out, _, m1 = step1(params, tx1.init(params), batch, key)

    np.testing.assert_allclose(float(m_tp["loss"]), float(m1["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_out),
                    jax.tree_util.tree_leaves(p1_out)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_tp_places_hierarchical_trees():
    """shard_params_tp must find the wide modules at ANY depth: the
    hierarchical (N_importance > 0) param tree nests them under
    coarse/fine — a top-level-only match silently replicates everything
    while --model_parallel still halves the data axis."""
    from cfnerf_tpu.parallel.mesh import shard_params_tp

    mesh = create_mesh(8, model_parallel=2)
    model = NeRFFlows(
        net_depth=2, net_width=32, input_ch=63, input_ch_views=27,
        skips=(1,), h_alpha_size=8, h_rgb_size=8, n_flows=2, k_samples=4,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 90)), is_test=True
    )["params"]
    tree = {"coarse": params, "fine": params}
    placed = shard_params_tp(mesh, tree)
    for branch in ("coarse", "fine"):
        k = placed[branch]["pts_linear_0"]["kernel"]
        shard_cols = {s.data.shape[1] for s in k.addressable_shards}
        assert shard_cols == {k.shape[1] // 2}, branch


@pytest.mark.slow
def test_dp_trajectory_ksched_ckpt_matches_single_device(tmp_path):
    """Multi-STEP equivalence (VERDICT r01 task 5): a 6-step trajectory —
    crossing a --k_schedule stage boundary (K=4 -> K=8 at step 3, a fresh
    jit per stage exactly like train/loop.py) with an Orbax checkpoint
    save/restore UNDER THE MESH at the boundary — must track single-device
    execution within float tolerance, params and metrics both."""
    from cfnerf_tpu.train.checkpoint import restore_checkpoint, save_checkpoint

    def run(n_dev, rundir):
        mesh = create_mesh(n_dev)

        def stage(k):
            model = NeRFFlows(
                net_depth=2, net_width=32, input_ch=63, input_ch_views=27,
                skips=(1,), h_alpha_size=8, h_rgb_size=8, n_flows=2,
                k_samples=k,
            )
            rc = RenderConfig(n_samples=16)
            tc = TrainConfig(H=8, W=8, focal=10.0, ndc=False, near=0.5,
                             far=4.0, k_samples=k, beta1=0.01)
            step, tx = make_train_step(model, rc, tc, mesh=mesh)
            return model, step, tx

        model4, step4, tx4 = stage(4)
        params = model4.init(
            jax.random.PRNGKey(0), jnp.zeros((2, 90)), is_test=True
        )["params"]
        params = replicate(mesh, params)
        opt_state = tx4.init(params)
        base = jax.random.PRNGKey(11)
        losses = []
        for s in range(3):
            b = shard_batch(mesh, _batch(R=64, seed=s))
            params, opt_state, m = step4(
                params, opt_state, b, jax.random.fold_in(base, s)
            )
            losses.append(float(m["loss"]))

        # checkpoint under the mesh at the stage boundary, restore, and
        # re-init opt state (exactly the trainer's resume semantics —
        # optimizer state intentionally not restored, reference :360-361)
        path = save_checkpoint(rundir, 3, params, opt_state)
        model8, step8, tx8 = stage(8)
        fresh = model8.init(
            jax.random.PRNGKey(5), jnp.zeros((2, 90)), is_test=True
        )["params"]
        restored, start = restore_checkpoint(path, fresh)
        assert start == 3
        params = replicate(mesh, jax.tree_util.tree_map(jnp.asarray, restored))
        opt_state = tx8.init(params)
        for s in range(3, 6):
            b = shard_batch(mesh, _batch(R=64, seed=s))
            params, opt_state, m = step8(
                params, opt_state, b, jax.random.fold_in(base, s)
            )
            losses.append(float(m["loss"]))
        return params, losses

    p8, l8 = run(8, str(tmp_path / "ck8"))
    p1, l1 = run(1, str(tmp_path / "ck1"))

    np.testing.assert_allclose(l8, l1, rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p8), jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def _render_setup(k_samples=4):
    from cfnerf_tpu.render.renderer import make_render_rays

    model = NeRFFlows(
        net_depth=2, net_width=32, input_ch=63, input_ch_views=27,
        skips=(1,), h_alpha_size=8, h_rgb_size=8, n_flows=2,
        k_samples=k_samples,
    )
    rc = RenderConfig(n_samples=16)

    def model_apply(p, x, *, is_test, rng):
        return model.apply({"params": p}, x, is_test=is_test, rng=rng)

    render_rays = make_render_rays(model_apply, rc)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 90)), is_test=True
    )["params"]
    return render_rays, params


def test_render_image_mesh_matches_single_device():
    """Multi-chip serving path: render_image with the rays inside each tile
    sharded over the 8-device data mesh must reproduce the single-device
    image bit-for-bit-ish (per-ray math, zero collectives).  Uses a tile NOT
    divisible by the mesh so the round-up path is exercised too."""
    from cfnerf_tpu.render.renderer import render_image

    render_rays, params = _render_setup()
    kw = dict(H=8, W=8, focal=10.0, ndc=False, use_viewdirs=True,
              near=0.5, far=4.0)
    c2w = jnp.eye(4)[:3]

    out1 = render_image(render_rays, params, c2w, tile=30, **kw)
    mesh = create_mesh(8)
    out8 = render_image(render_rays, params, c2w, tile=30, mesh=mesh, **kw)

    assert set(out1) == set(out8)
    for k in out1:
        np.testing.assert_allclose(
            np.asarray(out8[k]), np.asarray(out1[k]), rtol=1e-5, atol=1e-6
        )


@pytest.mark.slow
def test_render_image_mesh_occ_matches_single_device():
    """Occupancy-grid accelerated serving over the mesh: the grid rides as a
    closure const (replicated by GSPMD) while each tile's ray axis shards —
    must reproduce the single-device occ render exactly."""
    from cfnerf_tpu.ops.occupancy import make_occ_render_rays
    from cfnerf_tpu.render.renderer import render_image

    render_rays, params = _render_setup()
    rng = np.random.RandomState(7)
    grid = jnp.asarray(np.exp(rng.randn(16, 16, 16)), jnp.float32)
    occ = make_occ_render_rays(
        render_rays, grid, jnp.array([-4.0, -4.0, -4.0]),
        jnp.array([4.0, 4.0, 4.0]), 16, n_candidates=32,
    )
    kw = dict(H=8, W=8, focal=10.0, ndc=False, use_viewdirs=True,
              near=0.5, far=4.0)
    c2w = jnp.eye(4)[:3]

    out1 = render_image(occ, params, c2w, tile=30, **kw)
    mesh = create_mesh(8)
    out8 = render_image(occ, params, c2w, tile=30, mesh=mesh, **kw)

    assert set(out1) == set(out8)
    for k in out1:
        np.testing.assert_allclose(
            np.asarray(out8[k]), np.asarray(out1[k]), rtol=1e-5, atol=1e-6
        )


def test_render_image_mesh_keeps_tp_params():
    """render_image on a 2-D (data x model) mesh with tensor-parallel
    params: _params_on_mesh must keep the width-sharded placement (not
    re-replicate), and the image must match single-device numbers."""
    from cfnerf_tpu.parallel.mesh import MODEL_AXIS, shard_params_tp
    from cfnerf_tpu.render.renderer import render_image

    render_rays, params = _render_setup()
    kw = dict(H=8, W=8, focal=10.0, ndc=False, use_viewdirs=True,
              near=0.5, far=4.0)
    c2w = jnp.eye(4)[:3]

    out1 = render_image(render_rays, params, c2w, tile=32, **kw)

    mesh = create_mesh(8, model_parallel=2)
    p_tp = shard_params_tp(mesh, params)
    out_tp = render_image(render_rays, p_tp, c2w, tile=32, mesh=mesh, **kw)
    # placement survived: trunk kernel still split over the model axis
    k0 = p_tp["pts_linear_0"]["kernel"]
    assert {s.data.shape[1] for s in k0.addressable_shards} == {k0.shape[1] // 2}
    for k in out1:
        np.testing.assert_allclose(
            np.asarray(out_tp[k]), np.asarray(out1[k]), rtol=1e-5, atol=1e-6
        )


def test_batch_actually_sharded():
    mesh = create_mesh(8)
    b = shard_batch(mesh, _batch(64))
    sh = b["rays_o"].sharding
    assert sh.is_equivalent_to(ray_sharding(mesh), ndim=2)
    # each device holds 1/8 of the rays
    shard_shapes = {s.data.shape for s in b["rays_o"].addressable_shards}
    assert shard_shapes == {(8, 3)}
