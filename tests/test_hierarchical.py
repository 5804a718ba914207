"""Hierarchical (coarse+fine, N_importance) sampling tests — the capability
the reference declares via flags but never implemented (SURVEY.md sec. 2)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfnerf_tpu.models.nerf_flows import NeRFFlows
from cfnerf_tpu.render.renderer import RenderConfig, make_render_rays
from cfnerf_tpu.train.step import TrainConfig, make_train_step


def _setup(n_importance=8):
    model = NeRFFlows(
        net_depth=2, net_width=32, input_ch=63, input_ch_views=27,
        skips=(1,), h_alpha_size=8, h_rgb_size=8, n_flows=2, k_samples=4,
    )
    model_fine = NeRFFlows(
        net_depth=2, net_width=48, input_ch=63, input_ch_views=27,
        skips=(1,), h_alpha_size=8, h_rgb_size=8, n_flows=2, k_samples=4,
    )
    rc = RenderConfig(n_samples=16, n_importance=n_importance)
    x = jnp.zeros((2, 90))
    params = {
        "coarse": model.init(jax.random.PRNGKey(0), x, is_test=True)["params"],
        "fine": model_fine.init(jax.random.PRNGKey(1), x, is_test=True)["params"],
    }
    return model, model_fine, rc, params


def _rays(R=16):
    rng = np.random.RandomState(0)
    ro = jnp.asarray(rng.randn(R, 3).astype(np.float32))
    rd = jnp.asarray(
        np.concatenate([rng.randn(R, 2) * 0.05, -np.ones((R, 1))], -1).astype(np.float32)
    )
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    return ro, rd, vd, jnp.full((R, 1), 0.5), jnp.full((R, 1), 4.0)


def test_fine_pass_shapes_and_coarse_extras():
    model, model_fine, rc, params = _setup()

    def ap(p, x, *, is_test, rng):
        return model.apply({"params": p}, x, is_test=is_test, rng=rng)

    def apf(p, x, *, is_test, rng):
        return model_fine.apply({"params": p}, x, is_test=is_test, rng=rng)

    rr = make_render_rays(ap, rc, apf)
    ro, rd, vd, near, far = _rays()
    out = rr(params, ro, rd, vd, near, far, jax.random.PRNGKey(2), is_test=False)
    R, K = 16, 4
    assert out["rgb_map"].shape == (R, 3, K)
    assert out["rgb0"].shape == (R, 3, K)
    assert out["disp0"].shape == (R, K)
    assert np.isfinite(np.asarray(out["rgb_map"])).all()
    # fine and coarse renders differ (different nets)
    assert np.abs(np.asarray(out["rgb_map"] - out["rgb0"])).max() > 1e-5
    # test mode works and is deterministic
    o1 = rr(params, ro, rd, vd, near, far, None, is_test=True)
    o2 = rr(params, ro, rd, vd, near, far, None, is_test=True)
    np.testing.assert_allclose(np.asarray(o1["rgb_map"]), np.asarray(o2["rgb_map"]))


@pytest.mark.slow
def test_hierarchical_train_step():
    model, model_fine, rc, params = _setup()
    tc = TrainConfig(
        H=8, W=8, focal=10.0, ndc=False, near=0.5, far=4.0, k_samples=4,
        beta1=0.01,
    )
    step, tx = make_train_step(model, rc, tc, model_fine=model_fine)
    opt = tx.init(params)
    ro, rd, vd, near, far = _rays()
    batch = {"rays_o": ro, "rays_d": rd, "target": jnp.zeros((16, 3))}
    p2, o2, m = step(params, opt, batch, jax.random.PRNGKey(3))
    assert "loss_nll0" in m
    assert np.isfinite(float(m["loss"]))
    # both networks actually received gradients
    for side in ("coarse", "fine"):
        before = jax.tree_util.tree_leaves(params[side])
        after = jax.tree_util.tree_leaves(p2[side])
        diffs = [float(np.abs(np.asarray(a - b)).max()) for a, b in zip(after, before)]
        assert max(diffs) > 0, f"{side} params unchanged"


def test_eval_importance_shared_net_matches_pair():
    """--N_importance_eval semantics: a shared-net hierarchical render on the
    raw params pytree must equal the pair-params render when the 'fine'
    network/params are literally the coarse ones (same apply, same pytree)."""
    model = NeRFFlows(
        net_depth=2, net_width=32, input_ch=63, input_ch_views=27,
        skips=(1,), h_alpha_size=8, h_rgb_size=8, n_flows=2, k_samples=4,
    )
    rc = RenderConfig(n_samples=16, n_importance=8, perturb=False)
    x = jnp.zeros((2, 90))
    params = model.init(jax.random.PRNGKey(0), x, is_test=True)["params"]

    def ap(p, x, *, is_test, rng):
        return model.apply({"params": p}, x, is_test=is_test, rng=rng)

    ro, rd, vd, near, far = _rays()
    shared = make_render_rays(ap, rc)(
        params, ro, rd, vd, near, far, None, is_test=True)
    pair = make_render_rays(ap, rc, ap)(
        {"coarse": params, "fine": params}, ro, rd, vd, near, far, None,
        is_test=True)
    for k in ("rgb_map", "disp_map", "rgb0"):
        np.testing.assert_allclose(
            np.asarray(shared[k]), np.asarray(pair[k]), rtol=1e-6, atol=1e-6)
    # and the fine render actually differs from the coarse one (the extra
    # importance-placed samples changed the composite)
    assert np.abs(np.asarray(shared["rgb_map"] - shared["rgb0"])).max() > 1e-6


def test_render_image_hierarchical():
    """Full-image eval render with N_importance > 0: the coarse pass's
    scalar loss_entropy0 must not crash the per-ray reshape (it did —
    every i_img/i_testset/render_only cadence died on hierarchical runs)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from cfnerf_tpu.models.nerf_flows import NeRFFlows
    from cfnerf_tpu.render.renderer import RenderConfig, make_render_rays, render_image

    model = NeRFFlows(
        net_depth=2, net_width=16, input_ch=63, input_ch_views=27, skips=(1,),
        h_alpha_size=8, h_rgb_size=8, n_flows=2, k_samples=4,
        use_viewdirs=True, type_flows="triangular",
    )
    rc = RenderConfig(n_samples=8, n_importance=4, perturb=False,
                      use_viewdirs=True)
    # shared-net hierarchical: no fine apply -> the renderer runs both
    # passes on the SAME raw params pytree (the --N_importance_eval mode);
    # pair params are reserved for a real coarse/fine net pair.
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 90)),
                        is_test=True)["params"]

    def model_apply(p, x, *, is_test, rng):
        return model.apply({"params": p}, x, is_test=is_test, rng=rng)

    rr = make_render_rays(model_apply, rc)
    c2w = jnp.eye(4)[:3]
    out = render_image(rr, params, c2w, H=6, W=6, focal=6.0, ndc=False,
                       use_viewdirs=True, near=0.5, far=2.0, tile=18)
    assert out["rgb_map"].shape == (6, 6, 3, 4)
    assert out["rgb0"].shape == (6, 6, 3, 4)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()
