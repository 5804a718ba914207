"""Fused flow+composite render core vs the unfused XLA pipeline.

The kernel (ops/pallas/render_core.py) must reproduce — to f32 accuracy —
the composition of:
  triangular_sylvester_stack (both families)
  + final-activation log-det corrections (models.py:261-278)
  + raw2outputs (run_nerf_uncertainty_NF.py:411-454)
including gradients w.r.t. every differentiable input (z0 shared draws,
amortized r1/r2/b of both families).  Runs through the Pallas interpreter
on the CPU test platform.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cfnerf_tpu.flows.sylvester import triangular_sylvester_stack
from cfnerf_tpu.ops.compositing import LAST_DIST, raw2outputs
from cfnerf_tpu.ops.pallas.render_core import fused_flow_composite, supported

R, S, K, F = 128, 64, 8, 2
B = R * S


def _inputs(seed=0, saturate=False):
    rng = np.random.RandomState(seed)
    sc = 0.5
    args = dict(
        z0_a=rng.randn(K, 1) * sc,
        r1_a=rng.randn(B, 1, 1, F) * sc,
        r2_a=rng.randn(B, 1, 1, F) * sc,
        b_a=rng.randn(B, 1, F) * sc,
        z0_r=rng.randn(K, 3) * sc,
        r1_r=np.triu(rng.randn(B, 3, 3, F).transpose(0, 3, 1, 2) * sc
                     ).transpose(0, 2, 3, 1),
        r2_r=np.triu(rng.randn(B, 3, 3, F).transpose(0, 3, 1, 2) * sc
                     ).transpose(0, 2, 3, 1),
        b_r=rng.randn(B, 3, F) * sc,
    )
    if saturate:
        # drive some densities to alpha == 1 (transmittance kill zone)
        args["b_a"][: B // 7, 0, :] = 8.0
    z_vals = (np.sort(rng.rand(R, S), -1) * 3.5 + 0.5).astype(np.float32)
    rays_d = rng.randn(R, 3).astype(np.float32)
    args = {k: jnp.asarray(v, jnp.float32) for k, v in args.items()}
    return args, jnp.asarray(z_vals), jnp.asarray(rays_d)


def _dists(z_vals, rays_d):
    d = jnp.concatenate(
        [z_vals[..., 1:] - z_vals[..., :-1],
         jnp.full_like(z_vals[..., :1], LAST_DIST)], -1,
    )
    return d * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)


def unfused(args, z_vals, rays_d, compute_log_det=True):
    """The XLA pipeline the kernel replaces (flows + corrections +
    raw2outputs), returning the kernel's output signature."""
    alpha0 = jnp.broadcast_to(args["z0_a"][None], (B, K, 1))
    rgb0 = jnp.broadcast_to(args["z0_r"][None], (B, K, 3))
    z_a, ldj_a = triangular_sylvester_stack(
        alpha0, args["r1_a"], args["r2_a"], args["b_a"],
        compute_log_det=compute_log_det,
    )
    z_r, ldj_r = triangular_sylvester_stack(
        rgb0, args["r1_r"], args["r2_r"], args["b_r"],
        compute_log_det=compute_log_det,
    )
    raw = jnp.concatenate([z_r, z_a], -1).reshape(R, S, K, 4)
    rgb_map, disp, acc, w, depth = raw2outputs(raw, z_vals, rays_d)
    if compute_log_det:
        ldj_a = ldj_a + (z_a - jax.nn.softplus(z_a)).sum(-1)
        ldj_r = ldj_r + (z_r - 2.0 * jax.nn.softplus(z_r)).sum(-1)
        ldj_ray = jnp.stack([
            ldj_a.reshape(R, S, K).sum((1, 2)),
            ldj_r.reshape(R, S, K).sum((1, 2)),
        ])
    else:
        ldj_ray = jnp.zeros((2, R))
    return rgb_map, depth, acc, ldj_ray


def fused(args, z_vals, rays_d, compute_log_det=True):
    return fused_flow_composite(
        args["z0_a"], args["r1_a"], args["r2_a"], args["b_a"],
        args["z0_r"], args["r1_r"], args["r2_r"], args["b_r"],
        z_vals.ravel(), _dists(z_vals, rays_d).ravel(),
        S, compute_log_det, True,
    )


@pytest.mark.parametrize("saturate", [False, True])
def test_forward_parity(saturate):
    args, z_vals, rays_d = _inputs(saturate=saturate)
    ref = unfused(args, z_vals, rays_d)
    out = fused(args, z_vals, rays_d)
    for name, a, b in zip(("rgb", "depth", "acc", "ldj"), out, ref):
        np.testing.assert_allclose(
            a, b, rtol=2e-5, atol=2e-4, err_msg=name
        )


def test_forward_test_mode():
    args, z_vals, rays_d = _inputs(seed=2)
    ref = unfused(args, z_vals, rays_d, compute_log_det=False)
    out = fused(args, z_vals, rays_d, compute_log_det=False)
    for name, a, b in zip(("rgb", "depth", "acc"), out[:3], ref[:3]):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-4, err_msg=name)
    assert float(jnp.abs(out[3]).max()) == 0.0


@pytest.mark.slow
@pytest.mark.parametrize("saturate", [False, True])
def test_grad_parity(saturate):
    args, z_vals, rays_d = _inputs(seed=1, saturate=saturate)
    target = jnp.asarray(np.random.RandomState(5).rand(R, 3), jnp.float32)

    def make_loss(pipeline):
        def loss(args):
            rgb, depth, acc, ldj = pipeline(args, z_vals, rays_d)
            # exercises every output: kde-like rgb term + depth + acc +
            # the entropy-style ldj means
            return (
                ((rgb.mean(-1) - target) ** 2).mean()
                + 0.1 * depth.mean()
                + 0.05 * acc.mean()
                - 0.01 * (ldj[0].sum() + ldj[1].sum()) / (B * K)
            )
        return loss

    g_ref = jax.grad(make_loss(unfused))(args)
    g_fused = jax.grad(make_loss(fused))(args)
    for k in args:
        a, b = np.asarray(g_fused[k]), np.asarray(g_ref[k])
        assert np.all(np.isfinite(a)), k
        np.testing.assert_allclose(
            a, b, rtol=5e-4, atol=5e-6, err_msg=f"grad[{k}]"
        )


def test_flagship_sample_count():
    """S=128 (the flagship z-schedule length): one ray exactly fills a
    128-lane register group — the boundary case of the scan masks."""
    S128, R128 = 128, 128
    B128 = R128 * S128
    rng = np.random.RandomState(11)
    sc = 0.5
    args = {
        "z0_a": rng.randn(K, 1) * sc,
        "r1_a": rng.randn(B128, 1, 1, F) * sc,
        "r2_a": rng.randn(B128, 1, 1, F) * sc,
        "b_a": rng.randn(B128, 1, F) * sc,
        "z0_r": rng.randn(K, 3) * sc,
        "r1_r": np.triu(rng.randn(B128, F, 3, 3) * sc).transpose(0, 2, 3, 1),
        "r2_r": np.triu(rng.randn(B128, F, 3, 3) * sc).transpose(0, 2, 3, 1),
        "b_r": rng.randn(B128, 3, F) * sc,
    }
    args = {k: jnp.asarray(v, jnp.float32) for k, v in args.items()}
    z_vals = jnp.asarray(
        np.sort(rng.rand(R128, S128), -1) * 3.5 + 0.5, jnp.float32
    )
    rays_d = jnp.asarray(rng.randn(R128, 3), jnp.float32)

    alpha0 = jnp.broadcast_to(args["z0_a"][None], (B128, K, 1))
    rgb0 = jnp.broadcast_to(args["z0_r"][None], (B128, K, 3))
    z_a, ldj_a = triangular_sylvester_stack(
        alpha0, args["r1_a"], args["r2_a"], args["b_a"])
    z_r, ldj_r = triangular_sylvester_stack(
        rgb0, args["r1_r"], args["r2_r"], args["b_r"])
    raw = jnp.concatenate([z_r, z_a], -1).reshape(R128, S128, K, 4)
    rgb_ref, _, acc_ref, _, depth_ref = raw2outputs(raw, z_vals, rays_d)

    rgb, depth, acc, _ = fused_flow_composite(
        args["z0_a"], args["r1_a"], args["r2_a"], args["b_a"],
        args["z0_r"], args["r1_r"], args["r2_r"], args["b_r"],
        z_vals.ravel(), _dists(z_vals, rays_d).ravel(), S128, True, True,
    )
    np.testing.assert_allclose(rgb, rgb_ref, rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(depth, depth_ref, rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(acc, acc_ref, rtol=2e-5, atol=2e-4)


def test_extreme_values_finite():
    """Saturated tanh, huge densities (alpha == 1 exactly), tiny log-det
    arguments: outputs and all gradients stay finite (LOGDET_EPS and the
    division-free reverse scan are the guards)."""
    args, z_vals, rays_d = _inputs(seed=13)
    big = {k: (v * 50.0 if k.startswith(("r1", "r2", "b")) else v)
           for k, v in args.items()}

    def loss(a):
        rgb, depth, acc, ldj = fused(a, z_vals, rays_d)
        return rgb.mean() + depth.mean() - 0.01 * ldj.sum() / (B * K)

    val = float(loss(big))
    assert np.isfinite(val)
    g = jax.grad(loss)(big)
    for k, v in g.items():
        assert np.all(np.isfinite(np.asarray(v))), k


def test_supported_gate():
    assert supported(128 * 128, 128)       # flagship eval tile
    assert supported(640 * 128, 128)       # reference train batch
    assert not supported(100 * 128, 128)   # R % 128 != 0
    assert supported(128 * 96, 96)         # ref coarse pass: 384-lane tile
    assert supported(128 * 48, 48)         # EVAL_r04 operating point
    assert not supported(128 * 100, 100)   # no lane-aligned pow2-ray tile
    assert not supported(64 * 48, 48)      # R=64: R % 128 != 0
    assert supported(128 * 24, 24)


@pytest.mark.slow  # ~2 min interpret-mode fwd+bwd on the 1-core box
@pytest.mark.parametrize("S_odd", [48, 96])
def test_nonpow2_sample_counts(S_odd):
    """S=48 (EVAL_r04 operating point, 384-lane tile / 8 rays) and S=96
    (the reference's hardcoded coarse pass, run_nerf_uncertainty_NF.py:510)
    — tile sizes that are NOT the 512-lane default: forward + gradient
    parity vs the XLA pipeline."""
    Rv = 128
    Bv = Rv * S_odd
    rng = np.random.RandomState(17 + S_odd)
    sc = 0.5
    args = {
        "z0_a": rng.randn(K, 1) * sc,
        "r1_a": rng.randn(Bv, 1, 1, F) * sc,
        "r2_a": rng.randn(Bv, 1, 1, F) * sc,
        "b_a": rng.randn(Bv, 1, F) * sc,
        "z0_r": rng.randn(K, 3) * sc,
        "r1_r": np.triu(rng.randn(Bv, F, 3, 3) * sc).transpose(0, 2, 3, 1),
        "r2_r": np.triu(rng.randn(Bv, F, 3, 3) * sc).transpose(0, 2, 3, 1),
        "b_r": rng.randn(Bv, 3, F) * sc,
    }
    args = {k: jnp.asarray(v, jnp.float32) for k, v in args.items()}
    z_vals = jnp.asarray(
        np.sort(rng.rand(Rv, S_odd), -1) * 3.5 + 0.5, jnp.float32
    )
    rays_d = jnp.asarray(rng.randn(Rv, 3), jnp.float32)

    def xla_pipe(a):
        alpha0 = jnp.broadcast_to(a["z0_a"][None], (Bv, K, 1))
        rgb0 = jnp.broadcast_to(a["z0_r"][None], (Bv, K, 3))
        z_a, ldj_a = triangular_sylvester_stack(
            alpha0, a["r1_a"], a["r2_a"], a["b_a"])
        z_r, ldj_r = triangular_sylvester_stack(
            rgb0, a["r1_r"], a["r2_r"], a["b_r"])
        raw = jnp.concatenate([z_r, z_a], -1).reshape(Rv, S_odd, K, 4)
        rgb_map, _, acc, _, depth = raw2outputs(raw, z_vals, rays_d)
        ldj_a = ldj_a + (z_a - jax.nn.softplus(z_a)).sum(-1)
        ldj_r = ldj_r + (z_r - 2.0 * jax.nn.softplus(z_r)).sum(-1)
        ldj_ray = jnp.stack([
            ldj_a.reshape(Rv, S_odd, K).sum((1, 2)),
            ldj_r.reshape(Rv, S_odd, K).sum((1, 2)),
        ])
        return rgb_map, depth, acc, ldj_ray

    def fused_pipe(a):
        return fused_flow_composite(
            a["z0_a"], a["r1_a"], a["r2_a"], a["b_a"],
            a["z0_r"], a["r1_r"], a["r2_r"], a["b_r"],
            z_vals.ravel(), _dists(z_vals, rays_d).ravel(),
            S_odd, True, True,
        )

    ref = xla_pipe(args)
    out = fused_pipe(args)
    for name, a, b in zip(("rgb", "depth", "acc", "ldj"), out, ref):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-4, err_msg=name)

    def make_loss(pipe):
        def loss(a):
            rgb, depth, acc, ldj = pipe(a)
            return (rgb.mean() + 0.1 * depth.mean() + 0.05 * acc.mean()
                    - 0.01 * ldj.sum() / (Bv * K))
        return loss

    g_ref = jax.grad(make_loss(xla_pipe))(args)
    g_fused = jax.grad(make_loss(fused_pipe))(args)
    for k in args:
        a, b = np.asarray(g_fused[k]), np.asarray(g_ref[k])
        assert np.all(np.isfinite(a)), k
        np.testing.assert_allclose(
            a, b, rtol=5e-4, atol=5e-6, err_msg=f"grad[{k}]"
        )


# ------------------------------------------------------------------ #
# end-to-end: full renderer + real NeRFFlows model, fused vs unfused
# ------------------------------------------------------------------ #


def _tiny_model_and_renderers():
    from cfnerf_tpu.models.nerf_flows import NeRFFlows, make_fused_apply
    from cfnerf_tpu.render.renderer import RenderConfig, make_render_rays

    model = NeRFFlows(
        net_depth=2, net_width=32, input_ch=63, input_ch_views=27,
        skips=(1,), h_alpha_size=8, h_rgb_size=8, n_flows=2, k_samples=8,
        use_viewdirs=True, type_flows="triangular",
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 90), jnp.float32), is_test=True
    )["params"]

    def model_apply(p, x, *, is_test, rng):
        return model.apply({"params": p}, x, is_test=is_test, rng=rng)

    rc = RenderConfig(n_samples=64, perturb=True, use_viewdirs=True)
    rr_plain = make_render_rays(model_apply, rc)
    rr_fused = make_render_rays(
        model_apply, rc, None, make_fused_apply(model, "interpret")
    )
    return params, rr_plain, rr_fused


def _ray_batch(n=128, seed=7):
    rng = np.random.RandomState(seed)
    rays_o = jnp.asarray(rng.randn(n, 3), jnp.float32)
    rays_d = jnp.asarray(
        np.concatenate([rng.randn(n, 2) * 0.1, -np.ones((n, 1))], -1),
        jnp.float32,
    )
    vd = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    near = jnp.full((n, 1), 0.5)
    far = jnp.full((n, 1), 4.0)
    return rays_o, rays_d, vd, near, far


@pytest.mark.parametrize("is_test", [False, True])
def test_renderer_end_to_end(is_test):
    params, rr_plain, rr_fused = _tiny_model_and_renderers()
    rays = _ray_batch()
    key = jax.random.PRNGKey(3)
    # identical rng => identical stratified jitter and shared-K eps draws
    a = rr_plain(params, *rays, key, is_test=is_test)
    b = rr_fused(params, *rays, key, is_test=is_test)
    for k in ("rgb_map", "disp_map", "depth_map", "acc_map", "loss_entropy"):
        np.testing.assert_allclose(
            b[k], a[k], rtol=2e-5, atol=2e-4, err_msg=k
        )
    assert "weights" not in b  # fused path does not materialize weights


def test_renderer_warns_on_unfused_fallback_shape():
    """S outside the lane-aligned tile set must warn loudly, once per shape.

    EVAL_r12: --occ_eval 20 silently fell back to the unfused path at 644k
    rays/s (47% of the fused curve); the gate now warns at trace time."""
    from cfnerf_tpu.models.nerf_flows import NeRFFlows, make_fused_apply
    from cfnerf_tpu.render import renderer as renderer_mod
    from cfnerf_tpu.render.renderer import RenderConfig, make_render_rays

    model = NeRFFlows(
        net_depth=2, net_width=32, input_ch=63, input_ch_views=27,
        skips=(1,), h_alpha_size=8, h_rgb_size=8, n_flows=2, k_samples=8,
        use_viewdirs=True, type_flows="triangular",
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 90), jnp.float32), is_test=True
    )["params"]

    def model_apply(p, x, *, is_test, rng):
        return model.apply({"params": p}, x, is_test=is_test, rng=rng)

    rc = RenderConfig(n_samples=20, perturb=False, use_viewdirs=True)
    rr = make_render_rays(
        model_apply, rc, None, make_fused_apply(model, "interpret")
    )
    rays = _ray_batch()
    renderer_mod._WARNED_UNFUSED_SHAPES.clear()
    with pytest.warns(UserWarning, match="no lane-aligned tile"):
        rr(params, *rays, jax.random.PRNGKey(3), is_test=True)
    # once per static shape: a second identical call stays quiet
    import warnings as _warnings

    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        rr(params, *rays, jax.random.PRNGKey(4), is_test=True)


@pytest.mark.slow
def test_renderer_end_to_end_param_grads():
    params, rr_plain, rr_fused = _tiny_model_and_renderers()
    rays = _ray_batch()
    key = jax.random.PRNGKey(4)
    target = jnp.asarray(np.random.RandomState(9).rand(128, 3), jnp.float32)

    def make_loss(rr):
        def loss(params):
            out = rr(params, *rays, key, is_test=False)
            mse = ((out["rgb_map"].mean(-1) - target) ** 2).mean()
            return mse + 0.01 * out["loss_entropy"]
        return loss

    g_a = jax.grad(make_loss(rr_plain))(params)
    g_b = jax.grad(make_loss(rr_fused))(params)
    flat_a = jax.tree_util.tree_leaves_with_path(g_a)
    flat_b = jax.tree_util.tree_leaves(g_b)
    for (path, a), b in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            b, a, rtol=1e-3, atol=1e-6,
            err_msg=jax.tree_util.keystr(path),
        )


def test_renderer_shape_fallback():
    # R=100 is unsupported (R % 128): the fused renderer must silently use
    # the regular path and still produce weights
    params, rr_plain, rr_fused = _tiny_model_and_renderers()
    rays = _ray_batch(n=100)
    out = rr_fused(params, *rays, jax.random.PRNGKey(0), is_test=False)
    assert "weights" in out
    ref = rr_plain(params, *rays, jax.random.PRNGKey(0), is_test=False)
    np.testing.assert_allclose(out["rgb_map"], ref["rgb_map"], rtol=1e-6)


def test_fused_on_requires_tpu():
    from cfnerf_tpu.models.nerf_flows import NeRFFlows as _M, make_fused_apply

    m = _M(net_depth=2, net_width=32, input_ch=63, input_ch_views=27,
           skips=(1,), h_alpha_size=8, h_rgb_size=8, n_flows=2, k_samples=4)
    with pytest.raises(ValueError, match="requires a TPU backend"):
        make_fused_apply(m, "on")  # tests run on the CPU platform
    assert make_fused_apply(m, "interpret") is not None
    assert make_fused_apply(m, "off") is None


def test_fused_explicit_requires_triangular():
    from cfnerf_tpu.models.nerf_flows import NeRFFlows as _M, make_fused_apply

    m = _M(net_depth=2, net_width=32, input_ch=63, input_ch_views=27,
           skips=(1,), h_alpha_size=8, h_rgb_size=8, n_flows=2, k_samples=4,
           type_flows="planar")
    with pytest.raises(ValueError, match="triangular"):
        make_fused_apply(m, "interpret")
    # 'off' stays silent (the factory's 'auto' resolves to 'off' for
    # unsupported families, so auto never reaches the raise)
    assert make_fused_apply(m, "off") is None
